#!/usr/bin/env bash
# TDS benchmark loop — counterpart of /root/reference/bash_run.bash:
# 10 MotifBench motifs x N repeats of the SMC sampler; collects the design
# and the inferred placement per run.
#
# Usage: tools/bench_tds.sh MOTIF_DIR OUTDIR [NAME] [EPOCH] [REPEATS]
set -euo pipefail

MOTIF_DIR=${1:?motif dir}
OUTDIR=${2:?output dir}
NAME=${3:-test002}
EPOCH=${4:-30}
REPEATS=${5:-10}

for motif in $(seq 0 9); do
  for run in $(seq 1 "$REPEATS"); do
    rundir="$OUTDIR/raw/m${motif}_r${run}"
    python -m genie2_tpu.cli.sample_motif_smc \
      --name "$NAME" --epoch "$EPOCH" --scale 1.0 \
      --outdir "$rundir" \
      --motif_index "$motif" --motif_dir "$MOTIF_DIR" \
      --seed "$run"
    mkdir -p "$OUTDIR/$motif"
    cp "$rundir"/pdbs/*_0.pdb "$OUTDIR/$motif/$run.pdb" 2>/dev/null || true
    cp "$rundir"/motif_location.txt "$OUTDIR/$motif/$run.motif_location.txt"
  done
done
