#!/usr/bin/env python3
"""Probe-normalized cross-run bench comparison (r16, VERDICT r15 task 5).

This host's task-dispatch floor has moved three times across reboots
(BASELINE.md discontinuities #1-#3), so comparing raw per-key seconds
between two bench_detail files conflates host drift with real plan
regressions. r15 stamped the BASELINE.md calibration probes into every
detail file's `_meta` (probe_sql_2stage_sec = the per-query plan+dispatch
floor, measured in-run); this script is the consumer: it divides the new
run's seconds by the probe ratio between the two artifacts and flags only
NORMALIZED regressions.

Flag criteria (both must hold, per key):
  - normalized median ratio > THRESHOLD (default 1.3x), AND
  - normalized min_sec ratio > THRESHOLD — min-across-passes is immune to
    the host's roaming multi-second stall window, so a stall that
    inflated the median alone never reads as a regression, AND
  - absolute normalized gap > 0.3 s — sub-second keys live inside plan/
    dispatch jitter; a 0.2 s -> 0.3 s move is noise, not a plan change.

Keys present in only one file are reported, never failed (registry growth
is normal between rounds). Artifacts predating the probe stamps fall back
to ratio 1.0 with a warning (raw compare — r14-era behavior).

Usage:
  python3 scripts/bench_compare.py BASE_DETAIL NEW_DETAIL [THRESHOLD=1.3]
  python3 scripts/bench_compare.py --selftest BASE_DETAIL

--selftest doctors an in-memory copy of BASE (one key's sec and min_sec
inflated 2x against an unchanged probe) and asserts the gate trips — the
selftest_guards.sh discipline: a guard that has never fired is a guard
you can't trust. Exit 0 iff the doctored artifact was flagged.
"""
import copy
import json
import sys

ABS_GAP_SEC = 0.3


def compare(base, new, threshold):
    """Return (flagged, report_lines). Mutates neither input."""
    base, new = dict(base), dict(new)
    bmeta, nmeta = base.pop("_meta", {}), new.pop("_meta", {})
    bp = bmeta.get("probe_sql_2stage_sec")
    np_ = nmeta.get("probe_sql_2stage_sec")
    lines = []
    if bp and np_:
        ratio = np_ / bp
        lines.append(f"probe_sql_2stage_sec {bp:.3f} -> {np_:.3f} "
                     f"(host floor ratio {ratio:.2f}x; seconds normalized)")
    else:
        ratio = 1.0
        lines.append("WARNING: probe stamps missing in "
                     + ("both" if not bp and not np_ else
                        "base" if not bp else "new")
                     + " _meta — raw (unnormalized) compare")
    flagged = []
    for key in sorted(set(base) & set(new)):
        b, n = base[key], new[key]
        if b.get("sec", -1) <= 0 or n.get("sec", -1) <= 0:
            continue  # failures are bench_budgets.py's jurisdiction
        nsec = n["sec"] / ratio
        nmin = n.get("min_sec", n["sec"]) / ratio
        bmin = b.get("min_sec", b["sec"])
        med_r = nsec / b["sec"]
        min_r = nmin / bmin if bmin > 0 else float("inf")
        if (med_r > threshold and min_r > threshold
                and nsec - b["sec"] > ABS_GAP_SEC):
            flagged.append((key, b["sec"], nsec, med_r, min_r))
    only = sorted(set(base) ^ set(new))
    if only:
        lines.append(f"note: {len(only)} key(s) in only one file: "
                     f"{', '.join(only[:8])}{'...' if len(only) > 8 else ''}")
    for key, bs, ns, mr, nr in sorted(flagged, key=lambda t: -t[3]):
        lines.append(f"  REGRESSION {key}: {bs:.2f}s -> {ns:.2f}s "
                     f"normalized ({mr:.2f}x median, {nr:.2f}x min)")
    return flagged, lines


def selftest(path):
    base = json.load(open(path))
    victim = next(k for k in sorted(base)
                  if k != "_meta" and base[k].get("sec", -1) > 0.5)
    doctored = copy.deepcopy(base)
    doctored[victim]["sec"] *= 2.0
    doctored[victim]["min_sec"] = doctored[victim].get(
        "min_sec", doctored[victim]["sec"]) * 2.0
    flagged, _ = compare(base, doctored, 1.3)
    assert any(k == victim for k, *_ in flagged), \
        f"selftest: 2x-inflated {victim} was NOT flagged"
    # and the unmodified file must compare clean against itself
    clean, _ = compare(base, base, 1.3)
    assert not clean, f"selftest: identical artifacts flagged {clean}"
    print(f"bench_compare selftest OK: 2x-inflated {victim} tripped the "
          f"gate; identical artifacts compare clean")


def main():
    args = sys.argv[1:]
    if args and args[0] == "--selftest":
        selftest(args[1] if len(args) > 1 else "bench_detail.json")
        return
    if len(args) < 2:
        sys.exit(__doc__)
    base = json.load(open(args[0]))
    new = json.load(open(args[1]))
    threshold = float(args[2]) if len(args) > 2 else 1.3
    flagged, lines = compare(base, new, threshold)
    print(f"base: {args[0]}  new: {args[1]}  threshold {threshold}x")
    for ln in lines:
        print(ln)
    if flagged:
        print(f"FAIL — {len(flagged)} normalized regression(s)")
        sys.exit(1)
    print(f"OK — no key regressed >{threshold}x after host-floor "
          f"normalization")


if __name__ == "__main__":
    main()
