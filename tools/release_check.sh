#!/usr/bin/env bash
# Release drill (VERDICT round-3 item 9): exercise the packaging from a
# cold environment — a fresh venv, `pip install -e .`, the console entry
# points, and one tiny end-to-end train->sample loop on synthetic data.
#
# Counterpart of the reference's Dockerfile smoke path
# (/root/reference/Dockerfile:1-35). When docker is available, prefer
#   docker build -t genie2-tpu . && docker run genie2-tpu genie2-train --help
# This script is the docker-free equivalent for hermetic environments
# (zero-egress: installs with --no-deps against system site-packages,
# which already provide jax/flax/optax/orbax per pyproject).
#
# Usage: tools/release_check.sh [workdir]   (default: mktemp -d)
set -euo pipefail

REPO_ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
WORKDIR="${1:-$(mktemp -d /tmp/genie2_release.XXXXXX)}"
VENV="$WORKDIR/venv"

echo "== release check in $WORKDIR =="

# 1. Fresh venv. Deps (jax/flax/optax/orbax/numpy, per pyproject) are
#    baked into the image's interpreter environment; link them in via a
#    .pth file — venv-from-venv drops the outer site-packages, and a
#    zero-egress environment cannot pip-install them. A networked
#    environment would use a plain venv + full `pip install -e .`.
python -m venv "$VENV"
BAKED_SITE="$(python -c 'import numpy, os; print(os.path.dirname(os.path.dirname(numpy.__file__)))')"
VENV_SITE="$("$VENV/bin/python" -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
echo "$BAKED_SITE" > "$VENV_SITE/_baked_deps.pth"
# shellcheck disable=SC1091
source "$VENV/bin/activate"

# 2. Editable install of the package only (hermetic: no dep resolution).
pip install -e "$REPO_ROOT" --no-deps --no-build-isolation -q

# 3. Console entry points resolve and print help from a foreign cwd.
cd "$WORKDIR"
for cmd in genie2-train genie2-sample-unconditional genie2-sample-scaffold \
           genie2-sample-motif-smc genie2-sample-sse genie2-convert-checkpoint \
           genie2-fetch-afdb; do
  command -v "$cmd" >/dev/null || { echo "MISSING entry point: $cmd"; exit 1; }
  "$cmd" --help >/dev/null
  echo "ok: $cmd --help"
done

# 4. Tiny end-to-end: 4 synthetic structures, 2-epoch train, 1 sample.
#    Forced onto CPU so the drill never competes for the (single-client)
#    TPU; the CLIs themselves are backend-agnostic.
DATA="$WORKDIR/data"; mkdir -p "$DATA"
python - "$DATA" <<'EOF'
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from genie2_tpu.features import create_empty_features, save_features_to_pdb

rng = np.random.default_rng(0)
for i in range(4):
    n = int(rng.integers(24, 33))
    f = create_empty_features([n])
    steps = rng.normal(size=(n, 3))
    steps = steps / np.linalg.norm(steps, axis=-1, keepdims=True) * 3.8
    f["atom_positions"] = np.cumsum(steps, axis=0)
    f["aatype"] = np.eye(20, dtype=int)[rng.integers(0, 20, n)]
    save_features_to_pdb(f, f"{sys.argv[1]}/s{i}.pdb")
EOF

cat > "$WORKDIR/configuration" <<EOF
name relcheck
rootDirectory $WORKDIR/runs
dataDirectory $DATA
minimumNumResidues 10
maximumNumResidues 40
numTimesteps 8
singleFeatureDimension 16
pairFeatureDimension 8
positionalEmbeddingDimension 8
chainEmbeddingDimension 4
timestepEmbeddingDimension 8
relativePositionK 4
templateDistanceNumBins 9
numPairTransformLayers 1
numStructureLayers 1
numEpoches 2
batchSize 2
logEverySteps 1
checkpointEveryEpoches 1
learningRate 1e-3
EOF

# (This environment's sitecustomize pre-selects a TPU platform, so the
# CPU override must go through jax.config before backend init — hence the
# python -c wrappers rather than the bare console scripts for the e2e.)
python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import sys; sys.argv = ['train', '-c', '$WORKDIR/configuration']
from genie2_tpu.cli.train import cli; cli()"

CKPT_SRC="$WORKDIR/runs/relcheck/version_0/checkpoints/epoch=1.ckpt"
RESULTS="$WORKDIR/results/relcheck/checkpoints"
mkdir -p "$RESULTS"
cp -r "$CKPT_SRC" "$RESULTS/epoch.1.ckpt"
cp "$WORKDIR/configuration" "$WORKDIR/results/relcheck/configuration"

python -c "
import jax; jax.config.update('jax_platforms', 'cpu')
import sys
sys.argv = ['sample', '--name', 'relcheck', '--epoch', '1',
            '--rootdir', '$WORKDIR/results', '--scale', '0.6',
            '--outdir', '$WORKDIR/out', '--num_samples', '1',
            '--batch_size', '1', '--min_length', '24', '--max_length', '24',
            '--length_step', '2']
from genie2_tpu.cli.sample_unconditional import main; main()"

test -s "$WORKDIR/out/pdbs/24_0.pdb" || { echo "FAIL: no sampled PDB"; exit 1; }
head -1 "$WORKDIR/out/pdbs/24_0.pdb" | grep -q '^ATOM' \
  || { echo "FAIL: bad PDB"; exit 1; }

# 5. Forced multi-process (DCN) dryrun: test_multihost's load gate can
#    skip forever on a permanently busy 1-core CI (VERDICT r4 Weak #7),
#    so the release drill forces one real 2-process run every time.
cd "$REPO_ROOT"
MULTIHOST_FORCE=1 python -m pytest tests/test_multihost.py -q -x
echo "ok: forced multihost dryrun"

echo "== release check PASSED (workdir $WORKDIR) =="
