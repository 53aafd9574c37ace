#!/usr/bin/env python3
"""Suite-context vs isolated comparison for the ANN family (r16, VERDICT
r15 task 2's done-criterion). The r15 finding: at 100x grown,
vec_ann_ivfpq read 9.5 s inside the 187-key suite vs 1.7 s isolated —
earlier keys' undestroyed broadcasts crammed the storage pool and every
new broadcast put had to disk-evict them first. r16's fix is
Sessions.releaseKeyState between keys; this script grades it: every ANN
key's suite-context median must be <= BOUND x its isolated median
(default 2.0, per the verdict), with a small absolute floor so
sub-second dispatch jitter can't fail a key that is fast in both runs.

Seconds are probe-normalized first (the bench_compare.py convention):
each artifact's `_meta.probe_sql_2stage_sec` stamps the host's plan+
dispatch floor AT THAT RUN, so a suite artifact measured under external
load (e.g. a concurrent DuckDB preflight) is scaled by iso_probe/
suite_probe before the ratio — the gate grades context tax (broadcast
litter), not host contention. Artifacts without the stamp compare raw.

Usage: python3 scripts/ann_context_compare.py SUITE_DETAIL ISO_DETAIL [BOUND=2.0]
Exit 1 if any shared key exceeds the bound.
"""
import json
import sys

ABS_FLOOR_SEC = 1.0  # both-fast keys are jitter, not context tax


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    suite = json.load(open(sys.argv[1]))
    iso = json.load(open(sys.argv[2]))
    bound = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    sp = (suite.pop("_meta", None) or {}).get("probe_sql_2stage_sec")
    ip = (iso.pop("_meta", None) or {}).get("probe_sql_2stage_sec")
    norm = ip / sp if sp and ip else 1.0
    if norm != 1.0:
        print(f"probe_sql_2stage_sec suite {sp:.3f} vs iso {ip:.3f} — "
              f"suite seconds scaled by {norm:.2f}x before the ratio")
    bad = []
    for key in sorted(set(suite) & set(iso)):
        s, i = suite[key]["sec"] * norm, iso[key]["sec"]
        if s < 0 or i < 0:
            bad.append((key, f"failed run (suite {s}, iso {i})"))
            continue
        ratio = s / i if i > 0 else float("inf")
        mark = ""
        if ratio > bound and s - i > ABS_FLOOR_SEC:
            bad.append((key, f"suite {s:.2f}s vs isolated {i:.2f}s "
                             f"({ratio:.2f}x > {bound}x)"))
            mark = "  <-- OVER"
        print(f"  {key:32s} suite {s:7.2f}s  isolated {i:7.2f}s "
              f"({ratio:5.2f}x){mark}")
    if bad:
        print(f"FAIL — {len(bad)} key(s) over the {bound}x suite-context "
              f"bound:")
        for k, why in bad:
            print(f"  {k}: {why}")
        sys.exit(1)
    print(f"OK — every shared key's suite-context median is within "
          f"{bound}x of isolated")


if __name__ == "__main__":
    main()
