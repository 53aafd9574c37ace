#!/usr/bin/env python3
"""Merge chunked-preflight evidence from several runs into one per-key
roll-up (r16: the 300x full-registry gate was produced by an original
sweep run, a resumed filtered run after a session restart, and a
parallel solo lane — each covering a disjoint slice of the registry).

Evidence accepted, in precedence order per key:
  1. an explicit `pass KEY` / `solo[(planned)] KEY OK` / `par-solo KEY OK`
     line in any given log;
  2. membership in a packed chunk whose run printed `chunk N OK` —
     chunk composition is replayed from the dump with the same
     deterministic algorithm chunked_preflight.sh uses (sorted keys,
     SOLO_KB/CHUNK/CHUNK_KB greedy packing), and `chunk N OK` is only
     printed when that chunk's preflight process exited 0 with every
     key passing.
An explicit `FAIL KEY` in a log is overridden by a LATER listed log's
pass (the fix-then-rerun flow); an unresolved FAIL or a key with no
evidence fails the roll-up.

Usage: preflight_rollup.py DUMP_DIR OUT_JSON LOG [LOG...]
Exit 0 iff every registry key has pass evidence.
"""
import glob
import json
import os
import re
import sys

SOLO_KB, CHUNK, CHUNK_KB = 16384, 12, 65536
HEAVY = ("string_split", "unnest", "ngram")


def schedule(dump):
    m = json.load(open(os.path.join(dump, "keys.json")))
    expected = m["attempted"] if m.get("filtered") else m["registry"]
    oracle = json.load(open(os.path.join(dump, "oracle_sql.json")))
    pack, solo = [], []
    for k in sorted(expected):
        kb = sum(os.path.getsize(f)
                 for f in glob.glob(os.path.join(dump, k, "*"))) // 1024
        sql = oracle.get(k) or ""
        (solo if kb >= SOLO_KB or any(h in sql for h in HEAVY)
         else pack).append((kb, k))
    chunks, cur, cur_kb = [], [], 0
    for kb, k in pack:
        if cur and cur_kb + kb > CHUNK_KB:
            chunks.append(cur)
            cur, cur_kb = [], 0
        cur.append(k)
        cur_kb += kb
        if len(cur) >= CHUNK:
            chunks.append(cur)
            cur, cur_kb = [], 0
    if cur:
        chunks.append(cur)
    return [k for _, k in pack] + [k for _, k in solo], chunks


def main():
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    dump, out_json, logs = sys.argv[1], sys.argv[2], sys.argv[3:]
    keys, chunks = schedule(dump)
    evidence = {}
    for log in logs:
        name = os.path.basename(log)
        text = open(log).read()
        for i, chunk in enumerate(chunks):
            if re.search(rf"^chunk {i} OK ", text, re.M):
                for k in chunk:
                    evidence.setdefault(k, []).append((f"{name}:chunk{i}",
                                                       True))
        # negatives first so a pass recorded anywhere in the same log
        # outranks that log's failure (solo-retry-within-run flow)
        for pat, ok in [(r"^FAIL (\S+) ", False),
                        (r"^solo(?:\(planned\))? (\S+) FAILED", False),
                        (r"^par-solo (\S+) FAILED$", False),
                        (r"^pass (\S+) ", True),
                        (r"^solo(?:\(planned\))? (\S+) OK$", True),
                        (r"^par-solo (\S+) OK$", True)]:
            for k in re.findall(pat, text, re.M):
                evidence.setdefault(k, []).append((name, ok))
    rows, missing, failed = {}, [], []
    for k in keys:
        ev = evidence.get(k, [])
        if not ev:
            missing.append(k)
            rows[k] = {"status": "MISSING", "evidence": []}
            continue
        # latest-listed log wins: the fix-then-rerun flow appends the
        # re-verification log after the log that recorded the failure
        ok = ev[-1][1]
        rows[k] = {"status": "pass" if ok else "FAIL",
                   "evidence": [f"{'+' if o else '-'}{src}"
                                for src, o in ev]}
    failed = [k for k in keys if rows[k]["status"] == "FAIL"]
    summary = {"registry": len(keys), "passed": len(keys) - len(missing)
               - len(failed), "failed": failed, "missing": missing,
               "logs": [os.path.basename(l) for l in logs],
               "keys": rows}
    json.dump(summary, open(out_json, "w"), indent=1)
    print(f"rollup: {summary['passed']}/{len(keys)} pass; "
          f"failed={failed}; missing={missing}")
    sys.exit(0 if not failed and not missing else 1)


if __name__ == "__main__":
    main()
