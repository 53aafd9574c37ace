#!/usr/bin/env bash
# Chunked oracle verification for 100x-class corpora (round-11 tooling;
# procedure first used by hand in round 10's 100x sweep).
#
# Why: the ENGINE runs all keys in one Spark session at any tested scale,
# but DuckDB's buffer pool cannot survive every heavy text oracle in one
# process at 100x — an OOMed allocation can poison the pool (observed
# segfaults in duckdb.so mid-suite). Fresh process per chunk bounds the
# blast radius to one chunk; crashed chunks are re-run per key with the
# whole-table boundary audits skipped (GRAFT_SKIP_AUDITS=1 — they passed
# in the sibling chunks), and only a solo per-key failure is real.
#
# Usage: scripts/chunked_preflight.sh SF_DIR VERIFY_DUMP [CHUNK=12]
# Exit 0 == every key in the dump passed in some process.
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:?scaled fixture dir}"
SRC="${2:?verify dump dir}"
CHUNK="${3:-12}"
WORK=$(mktemp -d /tmp/graft_chunks.XXXX)
trap 'rm -rf "$WORK"' EXIT

mk_chunk() { # $1=dir, rest=keys — a filtered dump view over symlinks
  local d=$1; shift
  mkdir -p "$d"
  cp "$SRC/oracle_sql.json" "$d/"
  python3 - "$d" "$@" <<'PY'
import json, sys
d, ks = sys.argv[1], sys.argv[2:]
json.dump({"registry": ks, "attempted": ks, "failed": [],
           "filtered": True}, open(f"{d}/keys.json", "w"))
PY
  local k; for k in "$@"; do ln -s "$SRC/$k" "$d/$k"; done
}

mapfile -t KEYS < <(ls -d "$SRC"/*/ | xargs -n1 basename | sort)
declare -a cur=() retry=()
c=0
for k in "${KEYS[@]}"; do
  cur+=("$k")
  if [ ${#cur[@]} -ge "$CHUNK" ] || [ "$k" = "${KEYS[-1]}" ]; then
    d="$WORK/c$c"
    mk_chunk "$d" "${cur[@]}"
    if GRAFT_ULP_TOL=1 python3 scripts/preflight.py "$SF" "$d" \
        > "$WORK/c$c.log" 2>&1; then
      echo "chunk $c OK (${#cur[@]} keys)"
    else
      # keys that printed "pass" before the crash are done; retry the rest
      echo "chunk $c FAILED — scheduling unpassed keys for solo re-run"
      for kk in "${cur[@]}"; do
        grep -qE "^pass $kk " "$WORK/c$c.log" || retry+=("$kk")
      done
    fi
    cur=(); c=$((c+1))
  fi
done

fails=0
for k in "${retry[@]+"${retry[@]}"}"; do
  d="$WORK/solo_$k"
  mk_chunk "$d" "$k"
  GRAFT_ULP_TOL=1 GRAFT_SKIP_AUDITS=1 \
    python3 scripts/preflight.py "$SF" "$d" > "$WORK/solo_$k.log" 2>&1
  if grep -qE "^pass $k " "$WORK/solo_$k.log"; then
    echo "solo $k OK"
  else
    echo "solo $k FAILED:"
    grep -E "^FAIL" "$WORK/solo_$k.log" | head -3
    fails=$((fails+1))
  fi
done

# roll-up: every key must have a pass line somewhere, and no FAIL anywhere
cat "$WORK"/*.log | grep -E "^note " | sort -u
passed=$(cat "$WORK"/*.log | grep -E "^pass " | awk '{print $2}' | sort -u | wc -l)
echo "---- ${passed}/${#KEYS[@]} keys passed; $fails solo failure(s) ----"
[ "$fails" -eq 0 ] && [ "$passed" -eq "${#KEYS[@]}" ]
