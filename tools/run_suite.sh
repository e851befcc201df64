#!/bin/bash
# Full-suite runner, split into two pytest processes.
#
# Why: the single-process full suite SEGFAULTS on the 1-core hosts inside
# XLA's persistent-cache executable write (compilation_cache.
# put_executable_and_time) at the first fresh train-step compile late in
# suite order — deterministically in round 5 (three runs, same site:
# test_sigterm_preemption's first fit), while the same module standalone
# passes. CLAUDE.md gotcha #0's mechanism (fresh XLA:CPU compile after
# orbax machinery + cumulative process state); process isolation dodges
# the cumulative-state half. Both halves share the host-fingerprinted
# persistent cache, so the split costs no extra compiles.
#
# Usage: bash tools/run_suite.sh [extra pytest args...]
set -o pipefail
cd "$(dirname "$0")/.."
rc=0
python -m pytest tests/ --ignore=tests/test_train.py -q "$@" || rc=1
python -m pytest tests/test_train.py -q "$@" || rc=1
exit $rc
