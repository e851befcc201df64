"""Multi-host (DCN) dryrun test (VERDICT Missing #6 / Next #9).

Runs tools/multihost_dryrun.py: the data-parallel training step across
2 coordinated jax.distributed processes x 4 virtual CPU devices each, with
per-host data feeding through parallel.shard_batch, compared against the
identical program in a single 8-device process. The reference's counterpart
is Lightning DDP `--num_nodes` (/root/reference/genie/train.py:54-65).

Subprocess-based (jax.distributed needs separate OS processes), so
slow-marked; the compile cache in tests/.jax_test_cache keeps reruns fast.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dryrun_matches_single_process():
    # Dynamic port: a fixed one collides when two suites run concurrently
    # on the same machine (observed as a spurious failure under load).
    import socket

    # One retry: on a 1-core host under concurrent CPU load, the two
    # processes' distributed rendezvous can starve past its timeout — a
    # scheduler artifact, not a product failure (passes in isolation).
    # A genuine regression fails both attempts.
    for attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "multihost_dryrun.py")],
            capture_output=True,
            text=True,
            timeout=1800,
            cwd=REPO,
            env=dict(os.environ, MULTIHOST_PORT=str(port)),
        )
        if proc.returncode == 0:
            break
        print(f"[multihost] attempt {attempt} failed, retrying", flush=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"] is True
    assert result["n_processes"] == 2
    assert len(result["baseline_losses"]) == 3
