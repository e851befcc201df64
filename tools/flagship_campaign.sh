#!/bin/bash
# Flagship-dims training campaign (round-4 VERDICT Missing #3 + Next #3/#6).
#
# Runs the entire round-3 training stack as ONE system at reference-flagship
# dimensions (c_s=384, c_p=128, 5 tri-mul pair layers, 8 IPA layers, N=256,
# T=1000 — the 15.7M-param config of /root/reference/runs/try1): packed
# corpus cache, async prefetch, async checkpointing, weight EMA, SIGTERM
# preemption, step-granular resume — then the quality battery at flagship
# dims (DDPM-1000 vs DDIM-50 vs hybrid-eta, eval_designs, SMC motif run).
#
# Phases:
#   0  synthetic corpus (make_synthetic_corpus.py; zero-egress stand-in for
#      a fetch_afdb.py corpus) + flagship configuration
#   A  train for PHASE_A_SECONDS, then SIGTERM -> graceful preemption
#      (saves resume_state at the next step boundary) — the on-chip
#      preemption drill
#   B  --resume for PHASE_B_SECONDS; verify step continuity across the kill
#   P  promote the newest epoch checkpoint (+EMA) to the release layout
#   Q  quality battery: sample DDPM-1000 / DDIM-50 / DDIM-50-hybrid (+EMA
#      variant), eval_designs on each; SMC scaffold run on a motif cut from
#      the corpus; summary JSON
#
# Usage: bash tools/flagship_campaign.sh [workdir]  (default /tmp/campaign_r4)
# Env:   N_STRUCT (4000) PHASE_A_SECONDS (1800) PHASE_B_SECONDS (5400)
#        CAMPAIGN_TINY=1 (CPU-shape validation: tiny dims, seconds-scale)
# One TPU client at a time (CLAUDE.md gotcha #5).
set -x
set -o pipefail
cd "$(dirname "$0")/.."
D=${1:-/tmp/campaign_r4}
# CAMPAIGN_PLATFORM=cpu -> force the CPU backend in every CLI below (tiny
# shape-validation runs; see genie2_tpu/cli/__init__.py).
[ -n "$CAMPAIGN_PLATFORM" ] && export GENIE2_PLATFORM="$CAMPAIGN_PLATFORM"
N_STRUCT=${N_STRUCT:-4000}
PA=${PHASE_A_SECONDS:-1800}
PB=${PHASE_B_SECONDS:-5400}
mkdir -p "$D"

# ---- Phase 0: corpus + config -------------------------------------------
if [ ! -f "$D/corpus/.done" ]; then
  if [ "$CAMPAIGN_TINY" = "1" ]; then
    python tools/make_synthetic_corpus.py "$D/corpus" 48 16 40 0
  else
    python tools/make_synthetic_corpus.py "$D/corpus" "$N_STRUCT" 20 256 0
  fi && touch "$D/corpus/.done"
fi

if [ "$CAMPAIGN_TINY" = "1" ]; then
  cat > "$D/configuration" <<EOF
name flagship
rootDirectory $D/runs
dataDirectory $D/corpus
minimumNumResidues 16
maximumNumResidues 40
numTimesteps 8
singleFeatureDimension 16
pairFeatureDimension 8
positionalEmbeddingDimension 16
chainEmbeddingDimension 8
timestepEmbeddingDimension 16
relativePositionK 4
templateDistanceNumBins 5
numPairTransformLayers 1
numStructureLayers 1
seed 100
numEpoches 1000
batchSize 4
logEverySteps 5
checkpointEveryEpoches 2
saveStateEverySteps 10
emaDecay 0.999
asyncCheckpoint True
learningRate 1e-3
computeDtype fp32
validationSplit 0.05
EOF
else
  cat > "$D/configuration" <<EOF
name flagship
rootDirectory $D/runs
dataDirectory $D/corpus
minimumNumResidues 20
maximumNumResidues 256
numTimesteps 1000
singleFeatureDimension 384
pairFeatureDimension 128
positionalEmbeddingDimension 256
chainEmbeddingDimension 64
timestepEmbeddingDimension 512
relativePositionK 32
templateDistanceNumBins 37
numPairTransformLayers 5
triangularMultiplicativeHiddenDimension 128
numStructureLayers 8
ipaHiddenDimension 16
ipaNumHeads 12
ipaNumQkPoints 4
ipaNumVPoints 8
seed 100
numEpoches 1000
batchSize 1
logEverySteps 50
checkpointEveryEpoches 1
saveStateEverySteps 5000
emaDecay 0.999
asyncCheckpoint True
learningRate 1e-4
computeDtype bf16
remat True
validationSplit 0.02
scanSteps 8
EOF
fi

# ---- Phase A: train, then preempt with SIGTERM --------------------------
# `timeout -s TERM` IS the preemption drill: fit() traps the signal, saves
# resume_state at the next step boundary, drains async writes, returns
# cleanly. --kill-after covers a genuinely wedged backend only.
if [ ! -f "$D/.phase_a_done" ]; then
  timeout -s TERM --kill-after=300 "$PA" \
    python -m genie2_tpu.cli.train -c "$D/configuration" 2>&1 \
    | grep -viE 'warning' | tail -20
  echo "PHASE_A_EXIT=$?"
fi
V=$(ls -d "$D"/runs/flagship/version_* | sort -V | tail -1)
STEP_A=$(python - "$V" <<'EOF'
import sys
sys.path.insert(0, "tools")
from campaign_continuity import load_train_records
recs = load_train_records(sys.argv[1])
print(recs[-1]["step"] if recs else -1)
EOF
)
echo "LAST_STEP_PHASE_A=$STEP_A"
# The phase-A marker is set only once a resume point actually exists —
# a startup crash or dead tunnel must NOT poison every rerun into
# skipping phase A straight to NO_RESUME_STATE.
test -d "$V/checkpoints/resume_state" || { echo "NO_RESUME_STATE"; exit 1; }
touch "$D/.phase_a_done"

# ---- Phase B: resume; verify continuity ----------------------------------
timeout -s TERM --kill-after=300 "$PB" \
  python -m genie2_tpu.cli.train -c "$D/configuration" --resume 2>&1 \
  | grep -viE 'warning' | tail -20
echo "PHASE_B_EXIT=$?"

# Graceful preemptions keep steps strictly increasing; hard kills may
# replay steps that must then reproduce the original loss exactly
# (tools/campaign_continuity.py, unit-tested in tests/test_aux.py).
python tools/campaign_continuity.py "$V" "$STEP_A"
echo "CONTINUITY_EXIT=$?"

# ---- Phase P: promote to release layout ----------------------------------
E=$(ls "$V/checkpoints/" | grep -oE 'epoch=[0-9]+\.ckpt' | grep -oE '[0-9]+' | sort -n | tail -1)
test -n "$E" || { echo "NO_EPOCH_CKPT"; exit 1; }
rm -rf "$D/results" && mkdir -p "$D/results/flagship/checkpoints"
cp -r "$V/checkpoints/epoch=$E.ckpt" "$D/results/flagship/checkpoints/epoch.$E.ckpt"
[ -d "$V/checkpoints/epoch=$E.ema.ckpt" ] && \
  cp -r "$V/checkpoints/epoch=$E.ema.ckpt" "$D/results/flagship/checkpoints/epoch.$E.ema.ckpt"
cp "$D/configuration" "$D/results/flagship/configuration"
echo "PROMOTED_EPOCH=$E"

# ---- Phase Q: quality battery ---------------------------------------------
# CAMPAIGN_QL/CAMPAIGN_NS env overrides let a wall-clock-bounded round
# shrink the battery without touching the training dims (namespaced in
# round 5 — the old bare QL/NS names could be silently inherited from a
# stray exported variable, ADVICE r4). Default NS=32: 4-designs-per-mode
# made the round-4 mode comparison statistically empty (VERDICT r4 Weak #3).
if [ "$CAMPAIGN_TINY" = "1" ]; then QL=24; NS=2; else QL=${CAMPAIGN_QL:-128}; NS=${CAMPAIGN_NS:-32}; fi
echo "QUALITY_BATTERY: QL=$QL NS=$NS"
SAMP="python -m genie2_tpu.cli.sample_unconditional --name flagship --epoch $E \
  --rootdir $D/results --scale 0.6 --num_samples $NS --batch_size $NS \
  --min_length $QL --max_length $QL --length_step 2 --sequential_order"
for MODE in ddpm ddim50 hyb ema_ddim50; do
  OUT="$D/q_$MODE"; rm -rf "$OUT"
  case $MODE in
    ddpm)       EXTRA="";;
    ddim50)     EXTRA="--ddim_steps 50";;
    hyb)        EXTRA="--ddim_steps 50 --ddim_eta 1.0 --ddim_eta_switch_t 100";;
    ema_ddim50) EXTRA="--ddim_steps 50 --ema";;
  esac
  if [ "$CAMPAIGN_TINY" = "1" ]; then
    EXTRA=${EXTRA//--ddim_steps 50/--ddim_steps 4}
    EXTRA=${EXTRA//--ddim_eta_switch_t 100/--ddim_eta_switch_t 4}
  fi
  timeout 900 $SAMP --outdir "$OUT" $EXTRA 2>&1 | tail -2
  echo "SAMPLE_${MODE}_EXIT=$?"
  python tools/eval_designs.py "$OUT/pdbs" --json "$OUT/eval.json" 2>/dev/null \
    || python tools/eval_designs.py "$OUT/pdbs" > "$OUT/eval.txt"
done

# Motif target cut from the first corpus structure -> SMC run.
python - "$D" <<'EOF'
import os, sys
import numpy as np
sys.path.insert(0, ".")
from genie2_tpu.features import features_from_pdb
d = sys.argv[1]
f = features_from_pdb(
    f"{d}/corpus/"
    + sorted(x for x in os.listdir(f"{d}/corpus") if x.endswith(".pdb"))[0]
)
xyz = np.asarray(f["atom_positions"][:8], float)
xyz -= xyz.mean(0)
os.makedirs(f"{d}/motifs", exist_ok=True)
n_total = int(os.environ.get("CAMPAIGN_TINY") == "1" and 24 or 96)
# The MotifBench grammar puts 'NAME : LENGTH' on line 3 (motif_target.py).
lines = ["REMARK motif from corpus structure 0", "REMARK",
         f"REMARK motif : {n_total}"]
for i, (x, y, z) in enumerate(xyz, start=1):
    lines.append(f"ATOM  {i:5d}  CA  ALA A{i:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C")
lines.append("TER")
open(f"{d}/motifs/0_corpus.pdb", "w").write("\n".join(lines) + "\n")
EOF
rm -rf "$D/q_smc"
if [ "$CAMPAIGN_TINY" = "1" ]; then DUMP_EVERY=2; else DUMP_EVERY=50; fi
# 1800 s budget: the flagship SMC compile alone is ~8 min on this tunnel
# (round-4 campaign killed this leg mid-compile at the 900 s budget —
# VERDICT r4 Missing #3).
timeout 1800 python -m genie2_tpu.cli.sample_motif_smc --name flagship --epoch "$E" \
  --rootdir "$D/results" --outdir "$D/q_smc" --motif_index 0 \
  --motif_dir "$D/motifs" --num_particles 4 --scale 1.0 \
  --proposal score --dump_trajectory_every "$DUMP_EVERY" 2>&1 | tail -3
echo "SMC_EXIT=$?"
python tools/eval_designs.py "$D/q_smc/pdbs" --json "$D/q_smc/eval.json" 2>/dev/null \
  || python tools/eval_designs.py "$D/q_smc/pdbs" > "$D/q_smc/eval.txt"
echo "SMC_EVAL_EXIT=$?"

# The SMC dumps are paired x0/xt in the reference writer's exact grammar:
# compare this trained run's trajectory statistics against the REAL
# Genie-2 fixtures at matched steps (tools/compare_trajectories.py;
# tests/test_reference_trajectory.py holds /root/reference/test to the
# same bands).
NT=$(grep -E '^numTimesteps' "$D/configuration" | awk '{print $2}')
python tools/compare_trajectories.py "$D/q_smc/test" "$NT" \
  --json "$D/q_smc/traj_compare.json" | tail -2
echo "TRAJ_COMPARE_EXIT=$?"

# ---- Summary ---------------------------------------------------------------
python - "$D" "$V" "$E" <<'EOF'
import json, os, sys
sys.path.insert(0, "tools")
from campaign_continuity import load_train_records
d, v, e = sys.argv[1], sys.argv[2], sys.argv[3]
out = {"version_dir": v, "promoted_epoch": int(e), "quality": {}}
recs = load_train_records(v)
out["final_step"] = recs[-1]["step"] if recs else None
out["final_loss"] = recs[-1].get("weighted_loss") if recs else None
losses = [(r["step"], round(r.get("weighted_loss", float("nan")), 4)) for r in recs]
out["loss_curve_every_20th_record"] = losses[::20]
for mode in ("ddpm", "ddim50", "hyb", "ema_ddim50"):
    p = f"{d}/q_{mode}/eval.json"
    if os.path.exists(p):
        out["quality"][mode] = json.load(open(p))
if os.path.exists(f"{d}/q_smc/eval.json"):
    out["quality"]["smc_eval"] = json.load(open(f"{d}/q_smc/eval.json"))
ess_log = f"{d}/q_smc/logs/metrics.jsonl"
if os.path.exists(ess_log):
    tds = [json.loads(l) for l in open(ess_log)]
    out["quality"]["smc"] = {"ess_min": min(r["ess"] for r in tds),
                             "ess_mean": sum(r["ess"] for r in tds) / len(tds),
                             "resamples": sum(int(r["resampled"]) for r in tds)}
tc = f"{d}/q_smc/traj_compare.json"
if os.path.exists(tc):
    full = json.load(open(tc))
    out["quality"]["trajectory_vs_reference_fixtures"] = {
        k: full[k] for k in ("z_std_median", "z_std_range", "z_unit_scale_ok",
                             "n_steps_dumped")
    }
json.dump(out, open(f"{d}/campaign_summary.json", "w"), indent=1)
print(json.dumps({k: out[k] for k in ("final_step", "final_loss", "promoted_epoch")}))
EOF
echo "CAMPAIGN_DONE"
