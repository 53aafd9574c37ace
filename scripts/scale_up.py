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

GROW MODE (`--grow`): verbatim replication models an N×-crawled corpus
(every page seen N times -> near-dup PAIRS genuinely grow ~N², which is
why scale_compare.py carries QUADRATIC_OK). A real 100 TB corpus mostly
GROWS instead: new documents, new embeddings, a longer event history —
duplicate pairs grow ~linearly with the corpus. `--grow` models that by
making replica i > 0 semantically NEW while keeping every schema,
join key layout, and intra-replica statistic identical:

  documents.text   word-level perturbation: word w -> w + str(i) when
                   crc32(w) mixed with i selects ~1/3 of words. A pure
                   function of (word, replica), so duplicate texts
                   WITHIN a replica stay exact duplicates (exact-dedup
                   keys keep their per-replica dup structure) while a
                   5-gram shingle survives across replicas with
                   p ≈ (2/3)^5 ≈ 0.13 -> cross-replica Jaccard ≈ 0.07,
                   below every near-dup threshold. n_chars is recomputed
                   so the n_chars == length(text) fixture invariant
                   holds.
  embeddings       per-replica deterministic ±1 sign flip per dimension
                   (a diagonal orthogonal transform): norms and ALL
                   intra-replica pairwise cosines are preserved exactly
                   (per-replica workload identical to the original), but
                   cross-replica cosines collapse to ~0 — semantic-dedup
                   candidates stop being replica artifacts.
  events.ts        replica i shifts by i × 31 days: the history EXTENDS
                   (what growth really does) instead of densifying a
                   fixed 30-day window, so interval/as-of candidate
                   counts stay per-row.

Under --grow every key must scale linearly per row; scale_compare.py
--grown enforces exactly that (no quadratic escape hatch).

Usage: python3 scripts/scale_up.py SRC_DIR DST_DIR [REP=10] [--grow]
"""
import os
import sys
import zlib

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


GOLDEN = 2654435761  # Knuth multiplicative-hash constant; replica mixer
US_PER_DAY = 86_400_000_000
GROW_TS_SHIFT_DAYS = 31  # > the fixtures' 30-day span, so histories abut


def _grow_word(w, i):
    """Replica-i word map: suffix ~1/3 of the vocabulary, a different
    third per replica. Pure in (w, i) so identical texts stay identical
    within a replica. Suffixed words can't collide with other replicas'
    vocab: perturbation always starts from replica-0 originals, and
    original words are digit-free."""
    return w + str(i) if (zlib.crc32(w.encode()) ^ (i * GOLDEN)) % 3 == 0 else w


def _grow_documents(arrays, i, schema):
    names = [f.name for f in schema]
    ti, ni = names.index("text"), names.index("n_chars")
    memo = {}
    out = []
    for t in arrays[ti].to_pylist():
        s = memo.get(t)
        if s is None:
            # trailing replica tag kills cross-replica EXACT dups even for
            # texts whose sampled word subset happens to survive unperturbed
            s = " ".join(_grow_word(w, i) for w in t.split(" ")) + f" r{i}"
            memo[t] = s
        out.append(s)
    arrays[ti] = pa.array(out, type=schema[ti].type)
    arrays[ni] = pa.array([len(s) for s in out], type=schema[ni].type)
    return arrays


def _grow_embeddings(arrays, i, schema):
    names = [f.name for f in schema]
    ei = names.index("embedding")
    col = arrays[ei]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    values = col.values  # flat float32 child array
    n = len(col)
    dim = len(values) // n if n else 0
    # Diagonal orthogonal transform: one ±1 per dimension per replica.
    # Norms and every intra-replica pairwise cosine are exactly preserved;
    # expected cross-replica cosine is 0 (each term's sign is flipped
    # independently per replica).
    # splitmix64 finalizer — crc32's GF(2) linearity made replica sign
    # patterns pairwise correlated (adjacent replicas hit cos ~0.9)
    def mix(z):
        m = (1 << 64) - 1
        z = (z + 0x9E3779B97F4A7C15) & m
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & m
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & m
        return z ^ (z >> 31)
    signs = [1.0 if mix((i << 32) | d) & 1 else -1.0 for d in range(dim)]
    # ... composed with a per-replica dimension permutation (a signed
    # permutation matrix overall): a biased sign draw alone leaves the
    # same-index correlation mode intact (replica 1 drew 41/64 agreeing
    # signs -> cos ~0.28 against replica 0); permuting kills it.
    perm = list(range(dim))
    for d in range(dim - 1, 0, -1):
        j = mix((i << 40) ^ (7919 * d)) % (d + 1)
        perm[d], perm[j] = perm[j], perm[d]
    flipped = pc.multiply(values, pa.array(signs * n, type=values.type))
    idx = pa.array([r * dim + perm[d] for r in range(n) for d in range(dim)],
                   type=pa.int64())
    permuted = pc.take(flipped, idx)
    arrays[ei] = pa.ListArray.from_arrays(col.offsets, permuted,
                                          type=schema[ei].type)
    return arrays


def _grow_events(arrays, i, schema):
    names = [f.name for f in schema]
    ti = names.index("ts")
    shift = pa.scalar(i * GROW_TS_SHIFT_DAYS * US_PER_DAY, pa.int64())
    shifted = pc.add_checked(pc.cast(arrays[ti], pa.int64()), shift)
    arrays[ti] = pc.cast(shifted, schema[ti].type)
    return arrays


GROW_TRANSFORMS = {
    "documents": _grow_documents,
    "embeddings": _grow_embeddings,
    "events": _grow_events,
}


def main():
    argv = [a for a in sys.argv[1:] if a != "--grow"]
    grow = "--grow" in sys.argv[1:]
    src, dst = argv[0], argv[1]
    rep = int(argv[2]) if len(argv) > 2 else 10
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
                if grow and t in GROW_TRANSFORMS:
                    arrays = GROW_TRANSFORMS[t](arrays, i, base.schema)
                w.write_table(
                    pa.Table.from_arrays(arrays, schema=base.schema),
                    row_group_size=256 * 1024)
        mode = " (grown)" if grow and t in GROW_TRANSFORMS else ""
        print(f"{t}: {base.num_rows} -> {base.num_rows * rep} rows{mode}")


if __name__ == "__main__":
    main()
