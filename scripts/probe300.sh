#!/usr/bin/env bash
# 300x grown probe (VERDICT r13 task 6): every past scale finding —
# reducer sizing, the AQE initialPartitionNum ceiling, broadcast->SMJ
# flips, sliding-frame cost — appeared only at the NEXT scale decade, so
# run correctness + bench for the heaviest keys at 300x grown (~18M docs
# equivalent / 180M lineitem). text_ngram_jaccard is EXCLUDED by the
# exactness-tier decision (scale_compare.py EXACTNESS_TIER: its 300x
# projection ~193 GB of concurrent shuffle files exceeds this host's
# disk; the banded family is the graded scale path).
#
# Key set = the top of the 100x grown suite by wall, plus the three r14
# DistRank rewires (validating the new shapes one decade further) and
# the two r13 broadcast->SMJ flip keys the verdict named.
#
# Usage: scripts/probe300.sh   (artifacts: bench_detail_grown300_probe.json,
#        /tmp/graft_verify_300 dump, chunked preflight logs)
set -euo pipefail
cd "$(dirname "$0")/.."
REP=300
DST=target/sfx300
OUT=/tmp/graft_verify_300
KEYS="window_time_range,events_inter_arrival,sample_stratified,vec_ann_ivfpq,scalar_map,window_first_last,text_contamination_ngrams,join_asof,join_sort_merge,text_countmin_topk,pipeline_pretokenize,pipeline_dedup_incremental,text_importance_score,text_perplexity_proxy"

rm -rf "$DST" "$OUT"
python3 scripts/scale_up.py /root/testdata/sf0.1 "$DST" "$REP" --grow
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Verify $PWD/$DST $OUT $KEYS"
ULP_TOL=0 bash scripts/chunked_preflight.sh "$PWD/$DST" "$OUT"
GRAFT_BENCH_ONLY="$KEYS" \
  GRAFT_BENCH_DETAIL=bench_detail_grown300_probe.json \
  SPARK_GRAFT_SF_DIR="$PWD/$DST" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  sbt -batch "runMain graft.Bench"
python3 - <<'EOF'
import json
d = json.load(open("bench_detail_grown300_probe.json")); d.pop("_meta")
bad = [(k, v) for k, v in d.items()
       if v["failed_runs"] or v["disk_spill_bytes"]]
for k, v in sorted(d.items(), key=lambda t: -t[1]["sec"]):
    print(f'{k:28s} sec={v["sec"]:8.2f} wr={v["shuffle_write_bytes"]/2**20:9.1f} MB '
          f'spill={v["disk_spill_bytes"]} failed={v["failed_runs"]} retries={v["stall_retries"]}')
assert not bad, f"300x probe invariants FAILED: {bad}"
print("300x probe: zero spill, zero failures")
EOF
echo "300x probe complete"
