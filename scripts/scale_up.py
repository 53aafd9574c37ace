#!/usr/bin/env python3
"""Scale-replicate a fixture SF dir to N× with re-keyed ids (VERDICT r9
task 2: the driver ships sf <= 0.1, but the 100 TB plan story needs at
least one sweep against data big enough to push back).

Each fact/dim table is replicated REP times; replica 0 is the identity
and replica i adds `i * stride(domain)` to every column of each key
DOMAIN, where a domain groups the columns that must stay join-consistent
across tables:

  cust:  customer.c_custkey, orders.o_custkey, events.user_id
         (events_json_enrich joins user_id = c_custkey)
  supp:  supplier.s_suppkey, lineitem.l_suppkey
  part:  part.p_partkey, lineitem.l_partkey
  order: orders.o_orderkey, lineitem.l_orderkey
  doc:   documents.doc_id, embeddings.vec_id
         (pipeline_semantic_search joins vec_id = doc_id)
  event: events.event_id

region/nation are FIXED dimension domains (25/5 rows; fks point into
them from every replica) and are copied unchanged. All non-key columns
are replicated verbatim: duplicate text/embeddings across replicas is
exactly what an N×-crawled corpus looks like, so the dedup families get
N×-deeper groups — real work, not padding. Strides are
1 + max(all columns of the domain), so replica key ranges can never
collide, and replica 0 keeps the original ids (min-doc_id keep-sets and
first-k ANN query selections stay anchored to the original rows in both
engines).

Physical schemas are preserved EXACTLY (pyarrow read -> cast-back ->
write with the source schema), so scripts/preflight.py's fixture
fingerprint guard passes unchanged on the scaled dir.

Usage: python3 scripts/scale_up.py SRC_DIR DST_DIR [REP=10]
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_TABLES = ["region", "nation"]
# table -> {column: domain}
KEYED_TABLES = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part",
                 "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "cust"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "doc"},
}


def main():
    src, dst = sys.argv[1], sys.argv[2]
    rep = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(os.path.join(src, f"{t}.parquet"))
              for t in KEYED_TABLES}

    strides = {}
    for t, cols in KEYED_TABLES.items():
        for col, domain in cols.items():
            m = pc.max(tables[t][col]).as_py()
            strides[domain] = max(strides.get(domain, 0), m + 1)
    print("strides:", strides)

    for t in COPY_TABLES:
        pq.write_table(pq.read_table(os.path.join(src, f"{t}.parquet")),
                       os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: copied unchanged")

    for t, cols in KEYED_TABLES.items():
        base = tables[t]
        # Stream one replica at a time through a ParquetWriter: holding
        # all REP replicas plus their concatenation in RAM made peak
        # memory O(REP × table) and large-REP sweeps could OOM the host
        # (code-review r10).
        with pq.ParquetWriter(os.path.join(dst, f"{t}.parquet"),
                              base.schema) as w:
            for i in range(rep):
                if i == 0:
                    w.write_table(base, row_group_size=256 * 1024)
                    continue
                arrays = []
                for field in base.schema:
                    col = base[field.name]
                    if field.name in cols:
                        off = i * strides[cols[field.name]]
                        # add_checked + cast back: keys stay the pinned
                        # physical type and an overflow fails loudly
                        col = pc.cast(
                            pc.add_checked(col,
                                           pa.scalar(off, field.type)),
                            field.type)
                    arrays.append(col)
                w.write_table(
                    pa.Table.from_arrays(arrays, schema=base.schema),
                    row_group_size=256 * 1024)
        print(f"{t}: {base.num_rows} -> {base.num_rows * rep} rows")


if __name__ == "__main__":
    main()
