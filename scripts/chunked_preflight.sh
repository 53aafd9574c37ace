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
# Round-12 hardening (VERDICT r11 task 3 + ADVICE r11):
#  - KEYS come from the dump's keys.json REGISTRY, not from `ls` of the
#    dump dirs: a silent engine-side write failure (registry key with no
#    output dir, or a key recorded in `failed`) hard-fails up front
#    instead of becoming invisible to the roll-up.
#  - ULP tolerance is a parameter, STRICT by default: pass ULP_TOL=1 for
#    grown-fixture sweeps only (the >15-sig-digit decimal→double cast
#    boundary, SURVEY D9). A chunked run at a driver-graded SF can never
#    quietly under-claim "bit-exact" again.
#  - A chunk that exits nonzero with NOTHING left to retry (every key
#    printed pass) is a GRADED non-key failure — boundary audit, schema
#    fingerprint drift, keyset manifest, d9 selftest — and propagates as
#    a hard failure; sibling-chunk passes cover crashes, not graded
#    audit failures. Any AUDIT-FAIL line anywhere is also terminal.
#
# Round-13 hardening (VERDICT r12 task 5 — r11's 100x run crashed chunk
# processes in heavy text oracles; oracle capacity, not engine):
#  - ADAPTIVE chunking. A key is scheduled SOLO (fresh DuckDB process,
#    its own buffer pool) when its oracle is token-explosion-heavy
#    (string_split/unnest/ngram over the corpus — the family that OOMed)
#    or its dump exceeds SOLO_KB. Light keys are greedy-packed into
#    chunks bounded by BOTH key count (CHUNK) and cumulative dump bytes
#    (CHUNK_KB) — dump bytes proxy the oracle's result-frame footprint.
#  - Planned solos skip the whole-table audits only when a light chunk
#    exists to carry them; if every key schedules solo, the first solo
#    keeps audits on, so the graded audit surface never silently drops.
#
# Usage: [ULP_TOL=0|1] [SOLO_KB=..] [CHUNK_KB=..] \
#          scripts/chunked_preflight.sh SF_DIR VERIFY_DUMP [CHUNK=12]
# Exit 0 == manifest clean, every registry key passed in some process,
#           and no graded audit failure anywhere.
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:?scaled fixture dir}"
SRC="${2:?verify dump dir}"
CHUNK="${3:-12}"
ULP_TOL="${ULP_TOL:-0}"
SOLO_KB="${SOLO_KB:-16384}"     # dump ≥ this → solo process
CHUNK_KB="${CHUNK_KB:-65536}"   # cumulative dump budget per light chunk
WORK=$(mktemp -d /tmp/graft_chunks.XXXX)
trap 'rm -rf "$WORK"' EXIT

# ---- source-manifest gate (ADVICE r11): trust the registry, not `ls` ----
# Hard-fail BEFORE chunking if the Verify run itself recorded failures or
# left a registry/attempted key with no output dir — chunking such a dump
# would grade a silent subset with exit 0.
# (mapfile can't see a process substitution's exit status, so gate via a
# temp file + explicit status check)
if ! python3 - "$SRC" "$SOLO_KB" > "$WORK/keys.txt" <<'PY'
import glob, json, os, sys
src, solo_kb = sys.argv[1], int(sys.argv[2])
m = json.load(open(os.path.join(src, "keys.json")))
if m.get("failed"):
    sys.stderr.write("MANIFEST-FAIL: source dump records engine-side "
                     f"failures: {sorted(m['failed'])}\n")
    sys.exit(1)
expected = m["attempted"] if m.get("filtered") else m["registry"]
holes = [k for k in expected if not os.path.isdir(os.path.join(src, k))]
if holes:
    sys.stderr.write("MANIFEST-FAIL: registry key(s) with no output dir "
                     f"(silent write failure?): {sorted(holes)}\n")
    sys.exit(1)
orphans = [d for d in os.listdir(src)
           if os.path.isdir(os.path.join(src, d)) and d not in expected]
if orphans:
    sys.stderr.write("MANIFEST-FAIL: dump dirs not in the manifest "
                     f"(stale dump?): {sorted(orphans)}\n")
    sys.exit(1)
# adaptive schedule: "<kb> <solo|pack> <key>" per line, sorted by key.
# Heavy-text oracles (the token-explosion family that OOMed r11's 100x
# chunks) and outsized dumps go solo; everything else packs.
oracle = json.load(open(os.path.join(src, "oracle_sql.json")))
HEAVY = ("string_split", "unnest", "ngram")
for k in sorted(expected):
    kb = sum(os.path.getsize(f) for f in
             glob.glob(os.path.join(src, k, "*"))) // 1024
    sql = oracle.get(k) or ""
    solo = kb >= solo_kb or any(h in sql for h in HEAVY)
    print(f"{kb} {'solo' if solo else 'pack'} {k}")
PY
then echo "source manifest check FAILED — refusing to chunk"; exit 1; fi
mapfile -t SCHED < "$WORK/keys.txt"
[ ${#SCHED[@]} -gt 0 ] || { echo "MANIFEST-FAIL: empty key set"; exit 1; }
declare -a KEYS=() SOLO_KEYS=() PACK_KEYS=() PACK_KB=()
for line in "${SCHED[@]}"; do
  kb=${line%% *}; rest=${line#* }; mode=${rest%% *}; k=${rest#* }
  KEYS+=("$k")
  if [ "$mode" = solo ]; then SOLO_KEYS+=("$k")
  else PACK_KEYS+=("$k"); PACK_KB+=("$kb"); fi
done
echo "schedule: ${#PACK_KEYS[@]} packed + ${#SOLO_KEYS[@]} solo" \
  "(SOLO_KB=$SOLO_KB CHUNK=$CHUNK CHUNK_KB=$CHUNK_KB)"

mk_chunk() { # $1=dir, rest=keys — a filtered dump view over symlinks
  local d=$1; shift
  mkdir -p "$d"
  cp "$SRC/oracle_sql.json" "$d/"
  python3 - "$d" "$@" <<'PY'
import json, sys
d, ks = sys.argv[1], sys.argv[2:]
# the source manifest was gated clean above (failed=[], no holes), so the
# chunk view carries exactly its keys, marked filtered for preflight
json.dump({"registry": ks, "attempted": ks, "failed": [],
           "filtered": True}, open(f"{d}/keys.json", "w"))
PY
  local k; for k in "$@"; do ln -s "$SRC/$k" "$d/$k"; done
}

declare -a cur=() retry=()
c=0
hard_fail=0
cur_kb=0
run_chunk() { # runs the accumulated $cur chunk, harvests retries
  local d="$WORK/c$c"
  mk_chunk "$d" "${cur[@]}"
  if GRAFT_ULP_TOL="$ULP_TOL" python3 scripts/preflight.py "$SF" "$d" \
      > "$WORK/c$c.log" 2>&1; then
    echo "chunk $c OK (${#cur[@]} keys, ${cur_kb} KB)"
  else
    # keys that printed "pass" before the crash are done; retry the rest.
    # If NOTHING is left to retry, the failure was graded and non-key
    # (audit/drift/manifest/selftest) — terminal, siblings can't cover it.
    echo "chunk $c FAILED — scheduling unpassed keys for solo re-run"
    local before=${#retry[@]}
    local kk; for kk in "${cur[@]}"; do
      grep -qE "^pass $kk " "$WORK/c$c.log" || retry+=("$kk")
    done
    if [ ${#retry[@]} -eq "$before" ]; then
      echo "chunk $c: graded non-key failure (all keys passed, exit != 0):"
      grep -E "AUDIT-FAIL|^FAIL|DRIFT|MANIFEST|selftest" "$WORK/c$c.log" \
        | head -5
      hard_fail=1
    fi
  fi
  cur=(); cur_kb=0; c=$((c+1))
}
i=0
for k in "${PACK_KEYS[@]+"${PACK_KEYS[@]}"}"; do
  kb=${PACK_KB[$i]}; i=$((i+1))
  # byte budget closes the chunk BEFORE adding a key that would bust it
  if [ ${#cur[@]} -gt 0 ] && [ $((cur_kb + kb)) -gt "$CHUNK_KB" ]; then
    run_chunk
  fi
  cur+=("$k"); cur_kb=$((cur_kb + kb))
  [ ${#cur[@]} -ge "$CHUNK" ] && run_chunk
done
[ ${#cur[@]} -gt 0 ] && run_chunk
# planned solos: fresh process each; audits skip only when a light chunk
# already carried them (c > 0), else the first solo keeps them on
first_solo_audits=$([ "$c" -eq 0 ] && echo 1 || echo 0)
for k in "${SOLO_KEYS[@]+"${SOLO_KEYS[@]}"}"; do
  d="$WORK/psolo_$k"
  mk_chunk "$d" "$k"
  skip=1
  if [ "$first_solo_audits" = 1 ]; then skip=""; first_solo_audits=0; fi
  if GRAFT_ULP_TOL="$ULP_TOL" GRAFT_SKIP_AUDITS="$skip" \
      python3 scripts/preflight.py "$SF" "$d" > "$WORK/psolo_$k.log" 2>&1 \
      && grep -qE "^pass $k " "$WORK/psolo_$k.log"; then
    echo "solo(planned) $k OK"
  else
    echo "solo(planned) $k FAILED — scheduling re-run"
    retry+=("$k")
  fi
done

fails=0
for k in "${retry[@]+"${retry[@]}"}"; do
  d="$WORK/solo_$k"
  mk_chunk "$d" "$k"
  GRAFT_ULP_TOL="$ULP_TOL" GRAFT_SKIP_AUDITS=1 \
    python3 scripts/preflight.py "$SF" "$d" > "$WORK/solo_$k.log" 2>&1
  if grep -qE "^pass $k " "$WORK/solo_$k.log"; then
    echo "solo $k OK"
  else
    echo "solo $k FAILED:"
    grep -E "^FAIL" "$WORK/solo_$k.log" | head -3
    fails=$((fails+1))
  fi
done

# roll-up: every registry key must have a pass line somewhere, no solo
# failure, no graded non-key failure, and no AUDIT-FAIL anywhere at all
cat "$WORK"/*.log | grep -E "^note " | sort -u
audit_fails=$(cat "$WORK"/*.log | grep -cE "^AUDIT-FAIL" || true)
# ADVICE r13: the audits must have RUN TO COMPLETION in >=1 process —
# pass-lines don't prove it (a packed chunk can crash after its keys but
# before the audit phase, and every retry runs GRAFT_SKIP_AUDITS=1).
audits_done=$(cat "$WORK"/*.log | grep -cE "^AUDITS-COMPLETED" || true)
passed=$(cat "$WORK"/*.log | grep -E "^pass " | awk '{print $2}' | sort -u \
  | grep -cxF -f <(printf '%s\n' "${KEYS[@]}") || true)
echo "---- ${passed}/${#KEYS[@]} registry keys passed; $fails solo" \
  "failure(s); $audit_fails audit failure(s); audits_done=$audits_done;" \
  "hard_fail=$hard_fail ----"
[ "$fails" -eq 0 ] && [ "$hard_fail" -eq 0 ] && [ "$audit_fails" -eq 0 ] \
  && [ "$audits_done" -ge 1 ] && [ "$passed" -eq "${#KEYS[@]}" ]
