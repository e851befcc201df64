#!/bin/bash
# Durability sidecar for the flagship campaign (round 5).
#
# Two round-4 campaign attempts were WIPED by container restarts (/tmp wipe
# at ~step 55k, then the gitignored in-repo workdir at ~6 h in). Only git
# commits survive a restart, so this loop snapshots the campaign's SMALL
# live artifacts (log tail, metrics.jsonl, config, a checkpoint MANIFEST —
# hash/step/size, never the bytes) into artifacts/ and commits every
# INTERVAL_S seconds.
#
# Round-5 changes after the round-4 postmortem (VERDICT Weak #2 + ADVICE):
#   * checkpoint BYTES are never committed (round 4's six ~220 MB
#     resume_state.tgz snapshots grew .git to 1.4 GB); a restart mid-phase-B
#     loses the optimizer state and the campaign restarts — bounded loss,
#     accepted trade;
#   * every git commit's exit status is checked; on failure a heartbeat
#     line goes to the sidecar log so a dead sidecar is detectable (round
#     4's 18:17 campaign died silently with 2>/dev/null suppression);
#   * the pre-commit size guard (tools/precommit_size_guard.sh) backstops
#     this script: it physically cannot commit a blob >5 MB.
#
# Usage: bash tools/campaign_durability.sh WORKDIR [INTERVAL_S] [LIVE_DIR]
set -u
cd "$(dirname "$0")/.."
D=${1:?campaign workdir}
INTERVAL=${2:-300}
LIVE=${3:-artifacts/campaign_r5_live}
SIDELOG="$LIVE/sidecar.log"
mkdir -p "$LIVE"

hb() { echo "$(date -u +%H:%M:%S) $*" >> "$SIDELOG"; }

hb "sidecar started: workdir=$D interval=${INTERVAL}s live=$LIVE"
while true; do
  sleep "$INTERVAL"
  # Stop once the campaign is done (final commit handled by the operator).
  [ -f "$D/campaign_summary.json" ] && { hb "campaign summary present; stopping"; break; }
  # Driver gone and no summary -> crashed; keep the last snapshot, stop.
  if [ -f "$D/driver.pid" ] && ! kill -0 "$(cat "$D/driver.pid")" 2>/dev/null; then
    hb "campaign driver gone without summary; stopping"
    break
  fi
  tail -200 "$D/campaign.log" > "$LIVE/campaign_log_tail.txt" 2>/dev/null
  V=$(ls -d "$D"/runs/flagship/version_* 2>/dev/null | sort -V | tail -1)
  if [ -n "${V:-}" ]; then
    # metrics.jsonl sits at the version root (utils/loggers.py layout).
    cp "$V"/metrics.jsonl "$LIVE/metrics.jsonl" 2>/dev/null
    cp "$D/configuration" "$LIVE/configuration" 2>/dev/null
    if [ -d "$V/checkpoints/resume_state" ]; then
      # Manifest only — hash of the step file + total size; NEVER the bytes.
      step_file=$(ls "$V/checkpoints/resume_state" 2>/dev/null | head -5 | tr '\n' ' ')
      sz=$(du -sb "$V/checkpoints/resume_state" 2>/dev/null | cut -f1)
      step=$(python -c "
import json,sys
try:
    m=[json.loads(l) for l in open('$V/metrics.jsonl')]
    print(max((r.get('step',-1) for r in m), default=-1))
except Exception: print(-1)" 2>/dev/null)
      printf '{"resume_state_bytes": %s, "latest_metric_step": %s, "entries": "%s", "utc": "%s"}\n' \
        "${sz:-0}" "${step:--1}" "$step_file" "$(date -u +%FT%TZ)" \
        > "$LIVE/resume_state.MANIFEST.json"
    fi
  fi
  git add "$LIVE" >/dev/null 2>&1
  if git commit -q -m \
    "Campaign live snapshot $(date -u +%H:%M) (durability sidecar)" \
    -- "$LIVE" >> "$SIDELOG" 2>&1; then
    hb "snapshot committed"
  else
    # nothing-to-commit is fine; anything else must be visible.
    if git diff --cached --quiet -- "$LIVE" 2>/dev/null; then
      hb "no changes to snapshot"
    else
      hb "COMMIT FAILED (see above) — snapshots are NOT persisting"
    fi
  fi
done
hb "sidecar exiting"
