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

# ---- guard 2b: D9 decimal-emission tripwire (r11) ------------------------
# Proves an oracle-declared key whose dump contains a raw DECIMAL column
# goes red BEFORE any value compare — the r10 failure mode (9 driver
# hash-fails, local preflight green) must now be unreachable locally.
cp -r "$SRC" "$TMP/dump_dec"
DECKEY=$(python3 -c "
import json
print(sorted(json.load(open('$TMP/dump_dec/oracle_sql.json')))[0])")
DECFILE=$(ls "$TMP/dump_dec/$DECKEY"/*.parquet | head -1)
python3 - "$DECFILE" <<'EOF'
import duckdb, sys
f = sys.argv[1]
# inject a decimal column (type-agnostic: no cast of existing data needed;
# the D9 guard inspects the SCHEMA before any value compare runs)
duckdb.sql(f"CREATE TABLE t AS SELECT CAST(1.23 AS DECIMAL(38,2)) "
           f"AS __d9_probe, * FROM read_parquet('{f}')")
duckdb.sql(f"COPY t TO '{f}' (FORMAT PARQUET)")
EOF
if python3 scripts/preflight.py "$SF" "$TMP/dump_dec" > "$TMP/out2b.log" 2>&1; then
  echo "SELFTEST FAIL: preflight exited 0 despite a decimal output column"
  exit 1
fi
grep -q "D9: decimal-typed output column" "$TMP/out2b.log" || {
  echo "SELFTEST FAIL: decimal dump not attributed to the D9 guard:"
  tail -5 "$TMP/out2b.log"; exit 1; }
echo "guard 2b OK: decimal-typed $DECKEY dump made preflight fail with the D9 diagnostic"

# ---- guard 2c: ULP tolerance stays narrow (r11) ---------------------------
# The scale sweeps run preflight with GRAFT_ULP_TOL=1 (1-ulp float slack
# for the >15-sig-digit decimal->double boundary). Prove the slack is
# EXACTLY one ulp: a float cell nudged by ~1e-9 relative must still fail
# even with the tolerance active.
cp -r "$SRC" "$TMP/dump_ulp"
ULPFILE=$(ls "$TMP/dump_ulp/agg_hash_groupby"/*.parquet | head -1)
python3 - "$ULPFILE" <<'EOF'
import duckdb, sys
f = sys.argv[1]
duckdb.sql(f"CREATE TABLE t AS SELECT * FROM read_parquet('{f}')")
duckdb.sql("UPDATE t SET sum_qty = sum_qty * (1 + 1e-9)")
duckdb.sql(f"COPY t TO '{f}' (FORMAT PARQUET)")
EOF
if GRAFT_ULP_TOL=1 python3 scripts/preflight.py "$SF" "$TMP/dump_ulp" \
    > "$TMP/out2c.log" 2>&1; then
  echo "SELFTEST FAIL: GRAFT_ULP_TOL=1 swallowed a 1e-9 relative error"
  exit 1
fi
grep -q "value\[sum_qty\]" "$TMP/out2c.log" || {
  echo "SELFTEST FAIL: nudged sum_qty not attributed to the value compare:"
  tail -5 "$TMP/out2c.log"; exit 1; }
echo "guard 2c OK: a 1e-9-nudged float cell fails even under GRAFT_ULP_TOL=1"

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

# ---- guard 4: grow-mode fixture invariants ------------------------------
# scale_up.py --grow claims replicas are semantically NEW yet structurally
# identical. Check the load-bearing invariants on a 3x grown sf0.01 build:
#   - intra-replica exact-dup structure preserved, ZERO cross-replica
#     exact text dups (else exact-dedup pair counts go quadratic again)
#   - n_chars == length(text) everywhere (fixture invariant)
#   - embedding norms preserved per replica; cross-replica cosine pair
#     rate at the semantic-dedup threshold stays at the intra-corpus
#     baseline (orthogonality actually decorrelates)
#   - events span extends by (REP-1) x 31 days
python3 scripts/scale_up.py "$SF" "$TMP/grow" 3 --grow > /dev/null
python3 - "$SF" "$TMP/grow" <<'EOF'
import sys
import duckdb
import numpy as np
import pyarrow.parquet as pq

src, dst = sys.argv[1], sys.argv[2]
con = duckdb.connect()
one = lambda q: con.sql(q).fetchone()

n0, d0 = one(f"SELECT count(*), count(DISTINCT text) "
             f"FROM read_parquet('{src}/documents.parquet')")
n, d = one(f"SELECT count(*), count(DISTINCT text) "
           f"FROM read_parquet('{dst}/documents.parquet')")
assert n == 3 * n0, (n, n0)
# each replica keeps the original's intra dups and shares nothing across
assert d == 3 * d0, f"cross-replica text collisions: distinct {d} != 3*{d0}"
bad = one(f"SELECT count(*) FROM read_parquet('{dst}/documents.parquet') "
          f"WHERE n_chars != length(text)")[0]
assert bad == 0, f"{bad} rows violate n_chars == length(text)"

t = pq.read_table(f"{dst}/embeddings.parquet")
e = np.array(t["embedding"].combine_chunks().to_pylist(), dtype=np.float32)
nr = len(e) // 3
a, b = e[:nr], e[nr:2 * nr]
na = np.linalg.norm(a, axis=1)
nb = np.linalg.norm(b, axis=1)
assert np.allclose(na, nb, atol=1e-4), "norms not preserved"
an = a / np.maximum(na, 1e-9)[:, None]
bn = b / np.maximum(nb, 1e-9)[:, None]
base_rate = float((an @ an.T >= 0.35).mean())
cross_rate = float((an @ bn.T >= 0.35).mean())
assert cross_rate < max(2 * base_rate, 0.01), (
    f"cross-replica cosine pair rate {cross_rate:.4f} vs base {base_rate:.4f}")

lo0, hi0 = one(f"SELECT min(ts), max(ts) FROM read_parquet('{src}/events.parquet')")
lo, hi = one(f"SELECT min(ts), max(ts) FROM read_parquet('{dst}/events.parquet')")
assert lo == lo0, "replica 0 shifted"
assert (hi - hi0).days == 62, f"expected +62d span, got {(hi - hi0)}"
print(f"grow invariants OK: dups {d}=3x{d0}, n_chars exact, norms exact, "
      f"cross-pair rate {cross_rate:.4f} <= base {base_rate:.4f} bound, "
      f"span +62d")
EOF
echo "guard 4 OK: grow-mode fixture invariants hold on a 3x build"

# ---- guard 5: chunked-preflight registry gate (r12, VERDICT r11 task 3) --
# The chunked path must trust the dump's keys.json registry, not `ls`:
# (a) a registry key whose output dir vanished (silent write failure) and
# (b) a source manifest recording an engine-side failure must BOTH go red
# at the manifest gate, before any chunk is graded.
cp -r "$SRC" "$TMP/dump_hole"
HOLEKEY=$(python3 -c "
import json
print(json.load(open('$TMP/dump_hole/keys.json'))['attempted'][1])")
rm -r "$TMP/dump_hole/$HOLEKEY"
if scripts/chunked_preflight.sh "$SF" "$TMP/dump_hole" > "$TMP/out5a.log" 2>&1; then
  echo "SELFTEST FAIL: chunked_preflight exited 0 despite a dump hole ($HOLEKEY)"
  exit 1
fi
grep -q "MANIFEST-FAIL" "$TMP/out5a.log" || {
  echo "SELFTEST FAIL: dump hole not attributed to the manifest gate:"
  tail -5 "$TMP/out5a.log"; exit 1; }
cp -r "$SRC" "$TMP/dump_failed"
python3 - "$TMP/dump_failed/keys.json" <<'EOF'
import json, sys
p = sys.argv[1]
m = json.load(open(p))
m["failed"] = [m["attempted"][0]]
json.dump(m, open(p, "w"))
EOF
if scripts/chunked_preflight.sh "$SF" "$TMP/dump_failed" > "$TMP/out5b.log" 2>&1; then
  echo "SELFTEST FAIL: chunked_preflight exited 0 despite recorded failures"
  exit 1
fi
grep -q "MANIFEST-FAIL" "$TMP/out5b.log" || {
  echo "SELFTEST FAIL: recorded failure not attributed to the manifest gate:"
  tail -5 "$TMP/out5b.log"; exit 1; }
echo "guard 5 OK: chunked manifest gate rejects dump holes and recorded failures"

# ---- guard 6: sf0.1 training-time budget (r15, VERDICT r14 task 6) ------
# bench_budgets.py pins train_warm_train_sec at the anchor SF; an inflated
# value (a training loop regressing, a memo cache silently dropped) must
# go red even when every per-key budget still passes.
python3 - <<'EOF'
import json
d = json.load(open("bench_detail.json"))
d["_meta"]["train_warm_train_sec"] = 99.0
json.dump(d, open("/tmp/selftest_bench_train.json", "w"))
EOF
if python3 scripts/bench_budgets.py /tmp/selftest_bench_train.json \
    > "$TMP/out6.log" 2>&1; then
  echo "SELFTEST FAIL: bench_budgets exited 0 on 99s train_warm_train_sec"
  exit 1
fi
grep -q "train_warm_train_sec 99.0s" "$TMP/out6.log" || {
  echo "SELFTEST FAIL: inflated training not attributed to the train budget:"
  tail -5 "$TMP/out6.log"; exit 1; }
rm -f /tmp/selftest_bench_train.json
echo "guard 6 OK: inflated train_warm_train_sec tripped the training budget"

# ---- guard 7: scaled training linear-x3 tripwire (r15) -------------------
# scale_compare.py bounds scaled-sweep training at base*REP*3 — the target
# is a quadratic training regression (an iteration loop re-scanning the
# corpus per step). A scaled detail whose _meta training exceeds the bound
# must fail the gate.
python3 - <<'EOF'
import json
d = json.load(open("bench_detail.json"))
base_train = d["_meta"].get("train_warm_train_sec", 5.0)
d["_meta"]["sf"] = "/tmp/sfx"
d["_meta"]["train_warm_train_sec"] = base_train * 10 * 3 + 100
json.dump(d, open("/tmp/selftest_scaled_train.json", "w"))
EOF
if python3 scripts/scale_compare.py bench_detail.json \
    /tmp/selftest_scaled_train.json 10 > "$TMP/out7.log" 2>&1; then
  echo "SELFTEST FAIL: scale_compare exited 0 on super-linear training"
  exit 1
fi
grep -q "train_warm_train_sec" "$TMP/out7.log" || {
  echo "SELFTEST FAIL: training blowup not attributed to the train tripwire:"
  tail -5 "$TMP/out7.log"; exit 1; }
rm -f /tmp/selftest_scaled_train.json
echo "guard 7 OK: super-linear scaled training tripped the linear-x3 bound"

echo "selftest: all guards fire correctly"
