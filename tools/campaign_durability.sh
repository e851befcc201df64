#!/bin/bash
# Durability sidecar for the flagship campaign (round 4, attempt #3).
#
# Two prior campaign attempts were WIPED by container restarts (/tmp wipe
# at ~step 55k, then the gitignored in-repo workdir at ~6 h in). Only git
# commits survive a restart, so this loop snapshots the campaign's small
# live artifacts into artifacts/campaign_r4_live/ and commits every
# INTERVAL_S seconds, and additionally tars the newest resume_state
# checkpoint into git every CKPT_EVERY-th snapshot so a restart can RESUME
# training instead of starting over.
#
# Usage: bash tools/campaign_durability.sh WORKDIR [INTERVAL_S] [CKPT_EVERY]
set -u
cd "$(dirname "$0")/.."
D=${1:?campaign workdir}
INTERVAL=${2:-900}
CKPT_EVERY=${3:-5}
LIVE=artifacts/campaign_r4_live
mkdir -p "$LIVE"
i=0
while true; do
  sleep "$INTERVAL"
  i=$((i + 1))
  # Stop once the campaign is done (final commit handled by the operator).
  [ -f "$D/campaign_summary.json" ] && break
  # Driver gone and no summary -> crashed; keep the last snapshot, stop.
  if [ -f "$D/driver.pid" ] && ! kill -0 "$(cat "$D/driver.pid")" 2>/dev/null; then
    break
  fi
  tail -200 "$D/campaign.log" > "$LIVE/campaign_log_tail.txt" 2>/dev/null
  V=$(ls -d "$D"/runs/flagship/version_* 2>/dev/null | sort -V | tail -1)
  if [ -n "${V:-}" ]; then
    # metrics.jsonl sits at the version root (utils/loggers.py layout).
    cp "$V"/metrics.jsonl "$LIVE/metrics.jsonl" 2>/dev/null
    cp "$D/configuration" "$LIVE/configuration" 2>/dev/null
    if [ $((i % CKPT_EVERY)) -eq 0 ] && [ -d "$V/checkpoints/resume_state" ]; then
      # Snapshot-then-tar: orbax may be mid-write on the live dir.
      rm -rf "$D/.ckpt_snap" && cp -r "$V/checkpoints/resume_state" "$D/.ckpt_snap" \
        && tar -C "$D" -czf "$LIVE/resume_state.tgz.tmp" .ckpt_snap \
        && mv "$LIVE/resume_state.tgz.tmp" "$LIVE/resume_state.tgz"
    fi
  fi
  git add "$LIVE" >/dev/null 2>&1
  git -c user.name="$(git config user.name)" commit -q -m \
    "Campaign live snapshot $(date -u +%H:%M) (durability sidecar)" \
    -- "$LIVE" 2>/dev/null
done
