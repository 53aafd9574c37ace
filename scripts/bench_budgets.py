#!/usr/bin/env python3
"""Shuffle-byte budget gate over bench_detail.json (VERDICT r6 task 7).

Seconds on this box swing with host scheduling noise, but shuffle BYTES are
a property of the plan: a lost broadcast, an unpushed filter, or a dropped
partial aggregation shows up as a byte jump long before it is visible over
the timing noise. This gate pins the 10 biggest shufflers (plus two global
invariants) so a plan regression fails loudly.

Usage: python3 scripts/bench_budgets.py [bench_detail.json]

Budgets are per-key shuffle_write_bytes upper bounds at sf0.1, set ~1.5-2x
above the round-7 measured values (bytes are stable run-to-run; headroom
covers AQE coalescing variation, not plan changes). Only enforced when the
detail file's _meta.sf is an sf0.1 run — at smaller SFs the bounds would
pass trivially and mean nothing. The two global invariants always run:
zero failed_runs and zero disk spill anywhere.
"""
import json
import os
import sys

# key -> max shuffle_write_bytes at sf0.1 (round-7 measured value in the
# comment; regenerate deliberately when a key's plan legitimately changes)
BUDGETS = {
    # 41.1 MB measured r13 after the carried-n reshape: each doc's
    # shingle count rides the pair rows (one extra doc_id-window exchange
    # of the shingle frame + 16 B/pair) so the pair aggregate needs NO
    # post-joins — the old inter⋈sizes SMJ tail re-shuffled the whole
    # pair-aggregate twice and was the 100× grown sweep's 4.7 GB sort
    # spill. Bytes up at sf0.1, bounded and spill-free at every scale.
    "text_ngram_jaccard":    60_000_000,
    "join_broadcast_hash":   27_000_000,  # 17.7 MB (result-sort exchange)
    "window_first_last":     22_000_000,  # 14.5 MB
    "join_sort_merge":       22_000_000,  # 14.4 MB
    "window_nth_value":      22_000_000,  # 14.3 MB
    "scalar_math":           16_000_000,  # 10.2 MB
    "project_arithmetic":    15_000_000,  #  9.5 MB
    "filter_null_semantics": 13_000_000,  #  8.2 MB
    "join_skew_salted":      13_000_000,  #  8.0 MB
    "window_running_sum":    12_000_000,  #  7.6 MB
    # Cap-bearing candidate-join keys (VERDICT r9 task 1): their shuffle
    # bytes are the direct observable of the bucket/df caps — a cap
    # regression (filter dropped, band widened) shows up here as a byte
    # jump long before fixture-scale timing notices. ScaleGuardSpec proves
    # the caps FIRE on adversarial data; these bounds pin the capped plans
    # at sf0.1 (round-9 measured values in comments).
    # r14 DistRank group-rank/lag rewires (VERDICT r13 task 1): the
    # range-partitioned shape pays more bytes than the old domain-keyed
    # window (which was one exchange onto 4-5 reducers) in exchange for
    # data-proportional parallelism. These bounds pin the new shape's
    # byte cost from above; the PlanSpec domain-bounded-exchange audit is
    # the fence against regressing back to the cheap-but-capped window.
    # Measured r14 (final bucketed-prefix-sum shape for time_range):
    # 11.8 MB / 4.1 MB / 0.24 MB.
    "window_time_range":     18_000_000,
    "events_inter_arrival":   7_000_000,
    "sample_stratified":      1_000_000,
    "text_neardup_banded":        3_000_000,  # 1.6 MB
    "vec_neardup_srp_fixed":      6_000_000,  # 3.4 MB
    "pipeline_dedup_semantic":    5_000_000,  # 2.6 MB
    "pipeline_dedup_keep_banded": 4_000_000,  # 2.0 MB
    "topk_per_group":             3_000_000,  # 1.5 MB (native heap path)
}


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    detail = json.load(open(path))
    meta = detail.pop("_meta", {})
    # Provenance: budgets validate whatever bench run produced this file.
    # If any engine source is newer, the bytes predate the code under test
    # and a green gate is NOT evidence about the current tree (review r7).
    import glob as _glob
    bench_mtime = os.path.getmtime(path)
    newer = [f for f in _glob.glob("src/main/**/*.scala", recursive=True)
             if os.path.getmtime(f) > bench_mtime]
    print(f"budgets: validating {path} from sf={meta.get('sf', 'unknown')} "
          f"cpus={meta.get('cpus', '?')}")
    if newer:
        print(f"budgets: WARNING — {len(newer)} source file(s) are newer "
              f"than {path} (e.g. {newer[0]}); these bytes predate the "
              "current code. Rerun with RUN_BENCH=1 for a fresh gate.")
    fails = 0
    for key, d in sorted(detail.items()):
        if d.get("failed_runs", 0):
            print(f"BUDGET-FAIL {key:28s} failed_runs={d['failed_runs']}")
            fails += 1
        if d.get("disk_spill_bytes", 0):
            print(f"BUDGET-FAIL {key:28s} "
                  f"disk_spill_bytes={d['disk_spill_bytes']} (budget: 0)")
            fails += 1
    sf = meta.get("sf", "")
    if not sf.rstrip("/").endswith("sf0.1"):
        print(f"budgets: byte budgets skipped ({path} is from "
              f"sf={sf or 'unknown'}, bounds are calibrated for sf0.1); "
              f"global zero-failure/zero-spill invariants checked")
        sys.exit(1 if fails else 0)
    # Suite-total tripwire (VERDICT r9 task 4): a cross-cutting regression
    # (a conf change, an accidentally-disabled cache, AQE switched off)
    # inflates EVERY key a little — invisible to per-key byte budgets,
    # obvious in the total. Median-total is the primary trip; the
    # stall-aware arbiter is the min_sec total, because min_sec is a min
    # ACROSS interleaved suite passes (see Bench.scala) and the host's
    # roaming multi-second stall cannot cover every pass of every key: a
    # high median-total with a normal min-total is the documented host
    # stall (warn), a high min-total is a real regression (fail).
    # Bounds are ~1.5x the round-10 sf0.1 measurements (174 keys:
    # total 138 s, min-total 117 s on a 32-cpu host).
    # Absolute-seconds bounds are calibrated for the 32-cpu host class —
    # on a smaller box a healthy tree legitimately exceeds them, so the
    # tripwire is gated on _meta.cpus exactly like byte budgets are gated
    # on sf0.1 (code-review r10).
    TOTAL_SEC_MAX = 200.0
    TOTAL_MIN_SEC_MAX = 175.0
    if int(meta.get("cpus", 0)) != 32:
        print(f"budgets: suite-total tripwire skipped (cpus="
              f"{meta.get('cpus', '?')}; bounds calibrated for 32)")
    elif len(detail) >= 100:
        tot = sum(v["sec"] for v in detail.values() if v["sec"] >= 0)
        tot_min = sum(v.get("min_sec", -1) for v in detail.values()
                      if v.get("min_sec", -1) >= 0)
        if tot_min > TOTAL_MIN_SEC_MAX:
            print(f"BUDGET-FAIL suite min-total {tot_min:.1f}s > "
                  f"{TOTAL_MIN_SEC_MAX}s — cross-cutting regression "
                  "(min_sec is stall-immune; this is not host noise)")
            fails += 1
        elif tot > TOTAL_SEC_MAX:
            print(f"budgets: WARNING suite total {tot:.1f}s > "
                  f"{TOTAL_SEC_MAX}s but min-total {tot_min:.1f}s is "
                  "within bounds — consistent with a host stall window, "
                  "not a plan regression; investigate if persistent")
        else:
            print(f"budgets: suite total {tot:.1f}s <= {TOTAL_SEC_MAX}s, "
                  f"min-total {tot_min:.1f}s <= {TOTAL_MIN_SEC_MAX}s")
    else:
        print(f"budgets: suite-total tripwire skipped "
              f"({len(detail)} keys < 100 — partial run)")
    # Training-time budget (r15, VERDICT r14 task 6): the pre-warm's
    # train-once work (coarse k-means, PQ codebooks, BPE merge loops) runs
    # outside the timed samples but is real wall at scale — the grown
    # sweeps read 60 s -> 96 s at 100x with no code change, and without a
    # pinned anchor + per-phase split that drift is unfalsifiable. Anchor:
    # 5.66 s measured r14 at sf0.1/32cpu; bound 3x for host noise. The
    # per-phase train_warm_<phase>_sec fields in _meta attribute any trip.
    # Self-tested in selftest_guards.sh (guard 7: inflated train goes red).
    TRAIN_WARM_TRAIN_SEC_MAX = 17.0
    train = meta.get("train_warm_train_sec")
    phases = {k[len("train_warm_"):-len("_sec")]: v for k, v in meta.items()
              if k.startswith("train_warm_") and k.endswith("_sec")
              and k not in ("train_warm_sec", "train_warm_train_sec")}
    if train is None:
        print("budgets: train_warm_train_sec missing from _meta (old-format "
              "detail file?) — training budget skipped")
    elif train > TRAIN_WARM_TRAIN_SEC_MAX:
        print(f"BUDGET-FAIL train_warm_train_sec {train:.1f}s > "
              f"{TRAIN_WARM_TRAIN_SEC_MAX}s — training regression; phase "
              f"split: {phases or 'n/a'}")
        fails += 1
    else:
        print(f"budgets: train_warm_train_sec {train:.1f}s <= "
              f"{TRAIN_WARM_TRAIN_SEC_MAX}s (phases: {phases or 'n/a'})")
    for key, budget in sorted(BUDGETS.items()):
        if key not in detail:
            print(f"BUDGET-FAIL {key:28s} missing from {path} "
                  "(key renamed? update BUDGETS)")
            fails += 1
            continue
        w = detail[key]["shuffle_write_bytes"]
        if w > budget:
            print(f"BUDGET-FAIL {key:28s} shuffle_write={w} > {budget} — "
                  "plan regression (lost broadcast / unpushed filter / "
                  "lost partial agg)?")
            fails += 1
        else:
            print(f"budget {key:28s} shuffle_write={w:>10} <= {budget}")
    print(f"\nbudgets: {fails} failure(s)")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
