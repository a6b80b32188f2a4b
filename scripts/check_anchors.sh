#!/usr/bin/env bash
# Anchor sweep: every `eventstorm/<path>` reference cited in Scaladoc /
# comments under src/ must resolve to a real file or directory in the
# reference checkout at /root/reference. Exits 0 iff all anchors
# resolve; prints each broken anchor with its citing file.
#
# Run from the repo root: scripts/check_anchors.sh
set -u
REF="${REFERENCE_ROOT:-/root/reference}"
SRC="${1:-src}"
status=0
# collect distinct cited paths: eventstorm/<something> up to a
# word-boundary; strip trailing punctuation and :line suffixes
while IFS= read -r anchor; do
  path="${anchor#eventstorm/}"
  path="${path%%:*}"        # drop :line
  if [ ! -e "$REF/$path" ]; then
    status=1
    echo "BROKEN: eventstorm/$path"
    grep -rln "eventstorm/$path" "$SRC" | sed 's/^/    cited in /'
  fi
done < <(grep -rhoE 'eventstorm/[A-Za-z0-9_./-]+' "$SRC" | sed 's/[.,;)]*$//' | sort -u)
if [ "$status" -eq 0 ]; then
  echo "OK: all eventstorm/ anchors resolve against $REF"
fi
exit "$status"
