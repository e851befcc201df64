"""Packaging smoke tests (counterpart of /root/reference/setup.py:1-16):
the pyproject metadata must parse, every declared console entry point must
resolve to an importable callable, and the CLIs must print --help without a
repo-root cwd (no sys.path hacks inside the package)."""

import importlib
import os
import subprocess
import sys
import tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_pyproject_metadata():
    meta = _pyproject()
    assert meta["project"]["name"] == "genie2-tpu"
    deps = " ".join(meta["project"]["dependencies"])
    for need in ("jax", "flax", "optax", "orbax", "numpy"):
        assert need in deps, f"{need} missing from dependencies"
    # torch stays optional (conversion/parity only).
    assert "torch" not in deps
    assert "torch" in " ".join(meta["project"]["optional-dependencies"]["torch"])


def test_console_entry_points_resolve():
    for target in _pyproject()["project"]["scripts"].values():
        mod_name, fn_name = target.split(":")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        assert callable(fn), target


def test_cli_help_from_foreign_cwd():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, "-m", "genie2_tpu.cli.sample_unconditional", "--help"],
        capture_output=True, text=True, cwd="/tmp", env=env, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert "--num_devices" in r.stdout
