#!/bin/sh
# Pre-commit guard: reject any staged blob over MAX_BYTES (default 5 MB).
#
# Round-4 postmortem: the durability sidecar committed six ~220 MB
# resume_state.tgz snapshots, growing .git to 1.4 GB (VERDICT r4 Weak #2).
# Checkpoint bytes never belong in git history — snapshot a MANIFEST
# (hash, step, size) instead.
#
# Install (idempotent; .git/hooks is not tracked, so reinstall after a
# container restore): bash tools/precommit_size_guard.sh --install
MAX_BYTES=${MAX_BYTES:-5242880}

if [ "${1:-}" = "--install" ]; then
  cd "$(dirname "$0")/.."
  cp tools/precommit_size_guard.sh .git/hooks/pre-commit
  chmod +x .git/hooks/pre-commit
  echo "installed .git/hooks/pre-commit (size guard, max $MAX_BYTES bytes)"
  exit 0
fi

fail=0
for f in $(git diff --cached --name-only --diff-filter=AM); do
  sz=$(git cat-file -s ":$f" 2>/dev/null || echo 0)
  if [ "$sz" -gt "$MAX_BYTES" ]; then
    echo "pre-commit: REJECT $f ($sz bytes > $MAX_BYTES). Large binaries do" >&2
    echo "not belong in git history — commit a manifest (hash/step/size)." >&2
    echo "Override for a genuinely needed blob: MAX_BYTES=N git commit ..." >&2
    fail=1
  fi
done
exit $fail
