# Container counterpart of /root/reference/Dockerfile:1-35 (which builds on
# pytorch/pytorch CUDA). This framework targets TPU VMs, where the host image
# already provides libtpu; `jax[tpu]` brings the matching jaxlib. For CPU-only
# smoke runs (tests use a virtual 8-device mesh), build with
#   --build-arg JAX_EXTRA=""
ARG PYTHON_VERSION=3.11
FROM python:${PYTHON_VERSION}-slim

ARG JAX_EXTRA="[tpu]"

# g++ compiles the lazy native PDB parser (genie2_tpu/csrc/pdb_parser.cpp);
# git-lfs pulls released reference checkpoints for the torch converter.
RUN apt-get update \
    && apt-get install -y --no-install-recommends g++ git git-lfs \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace
COPY pyproject.toml README.md ./
COPY genie2_tpu ./genie2_tpu
COPY configs ./configs

RUN pip install --no-cache-dir "jax${JAX_EXTRA}" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e .

# Optional extras: torch-checkpoint conversion + parity oracles.
# RUN pip install --no-cache-dir -e ".[torch]"

ENTRYPOINT ["genie2-sample-unconditional"]
CMD ["--help"]
