"""Test configuration.

Forces JAX onto a virtual 8-device CPU platform so sharding/collective tests
run anywhere, and makes the repo root + the read-only torch reference
importable for parity tests.

NOTE: this environment pre-imports jax (sitecustomize) with a TPU plugin
selected via JAX_PLATFORMS, so plain env-var overrides are too late — we must
go through jax.config.update BEFORE any backend is initialized.
"""

import os
import sys

# Harmless when jax reads them fresh; the authoritative override is below.
os.environ["JAX_PLATFORMS"] = "cpu"

# The 8 virtual devices are threads timesharing however few cores the host
# has (CI hosts here have ONE). XLA CPU collectives abort the process when a
# rendezvous isn't joined within ~45 s, and the heavy long-context tests
# (N=1024 chunked triangle attention) legitimately keep a starved thread
# busy longer than that between collectives. Raise the timeouts; real skew
# bugs still surface as test-level timeouts.
# NOTE: this block is duplicated in __graft_entry__.py (both must run
# before any jax backend init, and the dryrun cannot import test code) —
# keep the two in lockstep when tweaking flags or timeouts.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_collective_timeout_seconds" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_collective_timeout_seconds=1200"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# CPU compiles dominate suite runtime (the full train-step graph takes ~90s
# to build); persist them. (The persistent cache is only unsafe under the
# TPU remote-compile tunnel, which tests never use.)
#
# The cache dir is keyed by a HOST CPU fingerprint: XLA:CPU executables are
# AOT-compiled for the build machine's exact feature set, and jax's cache
# key does not fully capture it — loading an entry written on a different
# host generation logs "Target machine feature ... not supported on the
# host machine ... could lead to execution errors such as SIGILL"
# (cpu_aot_loader) and sporadically SEGFAULTS during deserialization
# (observed killing a round-4 full-suite run inside
# compilation_cache.get_executable_and_time). Fingerprinting makes foreign
# entries invisible instead of fatal; each machine type warms its own.
import hashlib
import platform

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_id = next(
            (l for l in _f if l.startswith("flags")), platform.machine()
        )
except OSError:
    _cpu_id = platform.machine() + platform.processor()
_FP = hashlib.sha1(_cpu_id.encode()).hexdigest()[:12]
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_test_cache", _FP
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE_ROOT = "/root/reference"

if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import pytest  # noqa: E402


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "genie"))


@pytest.fixture(scope="session")
def reference_modules():
    """Import the torch reference (namespace package) for parity tests."""
    if not reference_available():
        pytest.skip("torch reference not available")
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import genie.utils.geo_utils as geo_utils
    import genie.utils.affine_utils as affine_utils
    import genie.utils.encoding as encoding
    import genie.diffusion.schedule as schedule

    return {
        "geo_utils": geo_utils,
        "affine_utils": affine_utils,
        "encoding": encoding,
        "schedule": schedule,
    }
