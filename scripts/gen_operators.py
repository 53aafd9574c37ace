#!/usr/bin/env python3
"""Regenerate OPERATORS.md: every registered Q key -> defining file:line,
with oracle status taken from the latest Verify dump's oracle_sql.json."""
import json
import os
import re
import sys

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
entries = []
for root, _, files in os.walk("src/main/scala/graft"):
    for f in files:
        if not f.endswith(".scala"):
            continue
        p = os.path.join(root, f)
        for i, line in enumerate(open(p), 1):
            m = re.search(r'Q\("([a-z0-9_]+)"', line)
            if m:
                entries.append((m.group(1), f"{p}:{i}"))
if not entries:
    sys.exit("no Q(...) definitions found - wrong working tree?")
oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
entries.sort()
with open("OPERATORS.md", "w") as out:
    out.write("# OPERATORS — generated key → implementation index\n\n")
    out.write(
        f"{len(entries)} declared query keys "
        f"({sum(1 for k, _ in entries if k in oracle)} with DuckDB oracle "
        f"SQL, {sum(1 for k, _ in entries if k not in oracle)} rows-only + "
        "unit-tested). Regenerate: `python3 scripts/gen_operators.py`.\n\n")
    out.write("| key | defined at | oracle |\n|---|---|---|\n")
    for k, loc in entries:
        mark = "✅" if k in oracle else "⛔ (tests)"
        out.write(f"| `{k}` | `{loc}` | {mark} |\n")
    out.write("""
## Streaming surface (not registry keys — Verify/t2 is batch-only)

`graft.streaming.StreamOps` entry points, each checked against its batch
twin by StreamingSpec (MemoryStream) and StreamingFileSpec (parquet file
source, sf0.01). Contracts that matter beyond the Scaladoc:

| entry point | batch twin | contract |
|---|---|---|
| `tumblingCounts` | `events_tumbling_window` | exact-cents sums; 2 h watermark |
| `sessionCounts` | `events_sessionization` | `session_window` gap algebra |
| `sessionizeWithState` | `events_sessionization` | O(1) state/user; a late event > gap BEFORE the open session diverges from the batch global sort |
| `sessionizeWithTimers` | `events_sessionization` | event-time timers close idle sessions at watermark; same late-event caveat |
| `sessionizeBuffered` | `events_sessionization` | **exact on out-of-order input**: events buffer until the watermark passes their session's gap deadline, so output equals the batch gap algebra for any disorder within the watermark delay; state = watermark horizon per user (vs the O(1)-state timer variant) |
| `funnelFirstCompletion` | `events_funnel` | **in-order input precondition**: the hit latch fires the first micro-batch `v<c<p` holds and is never retracted, so an out-of-order late stage event (e.g. a click replayed with an earlier ts) can invalidate the batch funnel after the streamed hit was emitted — equality with the batch key is promised only for event-time-ordered arrival; use `funnelWatermarked` when the source can reorder stages |
| `funnelWatermarked` | `events_funnel` | **exact on out-of-order input**: the verdict is decided by an event-time timer at the first purchase's ceiling-ms, final once the watermark passes it (watermark-delay emission latency) |
| `dedupById` | `events_dedup_latest` family | state bounded by the watermark horizon |
| `attributionPairs` | `events_attribution` | watermarked stream-stream interval join |
| `latestPerKey` | `events_dedup_latest` | update-mode CDC keep-latest |
""")
print(f"{len(entries)} keys -> OPERATORS.md")
