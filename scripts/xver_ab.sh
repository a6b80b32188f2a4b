#!/usr/bin/env bash
# Same-window cross-version A/B for the refloor protocol's clause (b):
# run graft.tools.FreshConfirm for each named query on the CURRENT
# binaries and on prior rounds' binaries (built in git worktrees under
# target/xver/<tag>), interleaved within one host window, so "the old
# code reads the same cpu" is a measured statement rather than an
# inference. Results (one JSON line per run, tagged with the version)
# append to the file given by $XVER_OUT (default xver_ab.jsonl).
#
# Usage: scripts/xver_ab.sh <sfDir> <query> [query...]
# Env: XVER_DIRS="cur:. r13:target/xver/r13 r14:target/xver/r14"
#      (label:repo-root pairs; "cur" uses this checkout)
set -euo pipefail
cd "$(dirname "$0")/.."
SF="$1"; shift
OUT="${XVER_OUT:-xver_ab.jsonl}"
DIRS=${XVER_DIRS:-"cur:. r13:target/xver/r13 r14:target/xver/r14"}

run_one() { # label root query
  local label="$1" root="$2" q="$3"
  local line
  line=$( cd "$root" && SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" SPARK_GRAFT_NO_CDS=1 \
      scripts/run_main.sh graft.tools.FreshConfirm "$q" "$SF" 2>/dev/null | tail -1 )
  echo "{\"version\":\"$label\",\"ts\":$(date +%s),$(echo "$line" | sed 's/^{//')" >> "$OUT"
  echo "[xver] $label $q -> $line" >&2
}

for q in "$@"; do
  # forward then reverse order per query: window drift cancels
  for pair in $DIRS; do
    run_one "${pair%%:*}" "${pair#*:}" "$q"
  done
  rev=$(echo "$DIRS" | tr ' ' '\n' | tac | tr '\n' ' ')
  for pair in $rev; do
    run_one "${pair%%:*}" "${pair#*:}" "$q"
  done
done
echo "[xver] done -> $OUT" >&2
