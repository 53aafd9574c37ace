#!/usr/bin/env bash
# Self-test for the round-9 drift guards: prove that preflight.py actually
# HARD-FAILS on (1) a key-set hole like r08's silent 19-key drop and (2) a
# fixture physical-schema drift like the events timestamp[us] regeneration.
# A guard that has never been seen firing is a guard you can't trust.
#
# Usage: scripts/selftest_guards.sh [VERIFY_DUMP_DIR] [SF_DIR]
# Needs a completed full Verify dump (default /tmp/graft_verify at sf0.01).
set -euo pipefail
cd "$(dirname "$0")/.."
SRC="${1:-/tmp/graft_verify}"
SF="${2:-/root/testdata/sf0.01}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

# ---- guard 1: key-set hole (delete one attempted key's output dir) ------
cp -r "$SRC" "$TMP/dump"
VICTIM=$(python3 -c "
import json, sys
print(json.load(open('$TMP/dump/keys.json'))['attempted'][0])")
rm -r "$TMP/dump/$VICTIM"
if python3 scripts/preflight.py "$SF" "$TMP/dump" > "$TMP/out1.log" 2>&1; then
  echo "SELFTEST FAIL: preflight exited 0 despite a key-set hole ($VICTIM)"
  exit 1
fi
grep -q "attempted but no output dir" "$TMP/out1.log" || {
  echo "SELFTEST FAIL: hole not attributed to the manifest check:"
  tail -5 "$TMP/out1.log"; exit 1; }
echo "guard 1 OK: deleting $VICTIM/ made preflight fail with the manifest diagnostic"

# ---- guard 2: schema drift (doctored events physical type) --------------
mkdir "$TMP/sf"
for t in region nation customer supplier part orders lineitem documents embeddings; do
  ln -s "$SF/$t.parquet" "$TMP/sf/$t.parquet"
done
python3 - "$SF" "$TMP/sf" <<'EOF'
import duckdb, sys
src, dst = sys.argv[1], sys.argv[2]
# re-encode ts as INT64 epoch-ns — the pre-r8 physical variant
duckdb.sql(f"""
  COPY (SELECT event_id, epoch_ns(ts)::BIGINT AS ts, user_id, event_type,
               value, props
        FROM read_parquet('{src}/events.parquet'))
  TO '{dst}/events.parquet' (FORMAT PARQUET)""")
EOF
if python3 scripts/preflight.py "$TMP/sf" "$SRC" > "$TMP/out2.log" 2>&1; then
  echo "SELFTEST FAIL: preflight exited 0 despite events schema drift"
  exit 1
fi
grep -q "FIXTURE SCHEMA DRIFT" "$TMP/out2.log" || {
  echo "SELFTEST FAIL: drift not attributed to the fingerprint check:"
  tail -5 "$TMP/out2.log"; exit 1; }
echo "guard 2 OK: re-encoded events.ts made preflight fail with the drift banner"

# ---- guard 3: suite-total tripwire (inflate every key 3x) ---------------
# Proves the bench_budgets.py cross-cutting-regression trip actually fires:
# a uniformly-slower suite (conf change, lost cache, AQE off) must go red
# even though every per-key byte budget still passes.
python3 - <<'EOF'
import json
d = json.load(open("bench_detail.json"))
for k, v in d.items():
    if k != "_meta" and isinstance(v, dict) and "sec" in v:
        v["sec"] *= 3
        if v.get("min_sec", -1) >= 0:
            v["min_sec"] *= 3
json.dump(d, open("/tmp/selftest_bench_inflated.json", "w"))
EOF
if python3 scripts/bench_budgets.py /tmp/selftest_bench_inflated.json \
    > "$TMP/out3.log" 2>&1; then
  echo "SELFTEST FAIL: bench_budgets exited 0 on a 3x-inflated suite"
  exit 1
fi
grep -q "suite min-total" "$TMP/out3.log" || {
  echo "SELFTEST FAIL: inflation not attributed to the suite tripwire:"
  tail -5 "$TMP/out3.log"; exit 1; }
rm -f /tmp/selftest_bench_inflated.json
echo "guard 3 OK: 3x-inflated suite tripped the min-total tripwire"
echo "selftest: all guards fire correctly"
