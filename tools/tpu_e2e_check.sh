#!/bin/bash
# On-chip end-to-end drill (the /verify skill recipe, scripted): tiny
# train -> promote -> SMC with --proposal score (+ the row-chunked
# tri-att config) -> unconditional sample, all on the default (tunneled
# TPU) backend. Self-contained: builds its own fixtures under $WORKDIR.
#
# Usage: bash tools/tpu_e2e_check.sh [workdir]   (default /tmp/vfy_r3)
# One TPU client at a time (CLAUDE.md gotcha #5). Each CLI ~1-2 min
# compile on a healthy tunnel; every stage is timeout-bounded so a
# degraded tunnel fails fast instead of wedging.
set -x
set -o pipefail  # the *_EXIT echoes must report the CLI's status, not tail's
cd "$(dirname "$0")/.."
D=${1:-/tmp/vfy_r3}

# 0. Fixtures: 8 random-walk PDBs + a tiny tri-att-chunk configuration.
if [ ! -f "$D/configuration" ]; then
  mkdir -p "$D/data"
  python - "$D" <<'EOF'
import sys, numpy as np
from genie2_tpu.features import create_empty_features, save_features_to_pdb
d = sys.argv[1]
rng = np.random.default_rng(0)
for i in range(8):
    n = int(rng.integers(20, 40))
    f = create_empty_features([n])
    steps = rng.normal(size=(n, 3)); steps /= np.linalg.norm(steps, axis=-1, keepdims=True)
    f["atom_positions"] = np.cumsum(3.8 * steps, axis=0).astype(np.float32)
    f["aatype"][:] = np.eye(f["aatype"].shape[-1])[rng.integers(0, 20, n)]
    save_features_to_pdb(f, f"{d}/data/walk_{i}.pdb")
EOF
  cat > "$D/configuration" <<EOF
name vfy
rootDirectory $D/runs
dataDirectory $D/data
minimumNumResidues 10
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
includeTriangularAttention True
triangleAttentionChunk 8
numStructureLayers 1
seed 100
numEpoches 2
batchSize 4
logEverySteps 1
checkpointEveryEpoches 1
learningRate 1e-3
computeDtype fp32
EOF
fi

# 1. Train (exercises the row-chunked tri-att path end-to-end).
rm -rf "$D"/runs/vfy/version_*
timeout ${STAGE_TIMEOUT:-900} python -m genie2_tpu.cli.train -c "$D/configuration" 2>&1 \
  | grep -vi warning | tail -8
echo "TRAIN_EXIT=$?"

# 2. Promote to the release layout the samplers load from.
V=$(ls -d "$D"/runs/vfy/version_* | sort -V | tail -1)
rm -rf "$D/results" && mkdir -p "$D/results/vfy/checkpoints"
cp -r "$V/checkpoints/epoch=1.ckpt" "$D/results/vfy/checkpoints/epoch.1.ckpt"
cp "$D/configuration" "$D/results/vfy/configuration"

# 3. MotifBench-style target for the SMC CLI.
python - "$D" <<'EOF'
import sys, os, numpy as np
d = sys.argv[1]
os.makedirs(f"{d}/motifs", exist_ok=True)
lines = ["REMARK motif", "REMARK", "REMARK length : 24"]
xyz = np.cumsum(np.full((5, 3), 2.2), axis=0)
for i, (x, y, z) in enumerate(xyz, start=1):
    lines.append(f"ATOM  {i:5d}  CA  ALA A{i:4d}    {x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C")
lines.append("TER")
open(f"{d}/motifs/0_tgt.pdb", "w").write("\n".join(lines) + "\n")
EOF

# 4. SMC CLI with the score-based twisted proposal (the round-3 path).
rm -rf "$D/out_smc"
timeout ${STAGE_TIMEOUT:-900} python -m genie2_tpu.cli.sample_motif_smc --name vfy --epoch 1 \
  --rootdir "$D/results" --outdir "$D/out_smc" --motif_index 0 \
  --motif_dir "$D/motifs" --num_particles 4 --scale 1.0 \
  --proposal score 2>&1 | grep -vi warning | tail -6
echo "SMC_EXIT=$?"
ls "$D/out_smc/" 2>/dev/null

# 5. Unconditional sampler on the same tri-att-chunk model.
rm -rf "$D/out_unc"
timeout ${STAGE_TIMEOUT:-900} python -m genie2_tpu.cli.sample_unconditional --name vfy \
  --epoch 1 --rootdir "$D/results" --scale 0.6 --outdir "$D/out_unc" \
  --num_samples 2 --batch_size 2 --min_length 20 --max_length 20 \
  --length_step 2 2>&1 | grep -vi warning | tail -4
echo "UNC_EXIT=$?"
ls "$D/out_unc/pdbs/" 2>/dev/null
