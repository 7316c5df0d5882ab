#!/usr/bin/env python3
"""Generate an sf1-equivalent corpus by key-shifted replication of sf0.1.

Driver-side tooling (pyarrow/duckdb are NOT engine dependencies): each
copy i gets every entity key shifted by i * (entity cardinality), so
ids stay dense, foreign keys stay consistent, and value distributions
are exactly sf0.1's. Fixed dimension tables (region, nation) are copied
untouched, as TPC-H does at every scale factor.

Deliberate choices:
  - documents: copy i>0 appends a ' c<i>' tag to the text (n_chars
    recomputed) — otherwise every doc is a 10-way byte-identical dup
    and the near-dup surface degenerates to the exact tier. With the
    tag, cross-copy docs are NEAR-dups (jaccard ~1), the adversarial
    shape for the LSH/substring operators at scale.
  - embeddings: 5 copies, not 10, with a small per-copy perturbation
    (+0.0003·i to every component): 10 000 vectors sits exactly at the
    quadratic-oracle-path guard (Dedup.embeddingNearDups maxRows), by
    design — the exact ground-truth paths are capped there and the
    scale paths are what sf1 exercises.
  - pyarrow writes preserve the source column types bit-for-bit
    (events.ts is TIMESTAMP(NANOS) — the engine's nanosAsLong handling
    depends on it; o_orderdate/l_shipdate are ms).
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
COPIES = 10
EMB_COPIES = 5

# entity key offsets = sf0.1 cardinality (ids stay dense)
OFF = {"cust": 15000, "part": 20000, "supp": 1000, "ord": 150000,
       "doc": 5000, "event": 100000, "user": 1500, "vec": 2000}

# table -> [(column, offset key)]
SHIFTS = {
    "customer": [("c_custkey", "cust")],
    "part": [("p_partkey", "part")],
    "supplier": [("s_suppkey", "supp")],
    "orders": [("o_orderkey", "ord"), ("o_custkey", "cust")],
    "lineitem": [("l_orderkey", "ord"), ("l_partkey", "part"), ("l_suppkey", "supp")],
    "events": [("event_id", "event"), ("user_id", "user")],
}


def replicate(table, shifts, copies):
    t = pq.read_table(f"{SRC}/{table}.parquet")
    parts = []
    for i in range(copies):
        cols = {name: t.column(name) for name in t.column_names}
        for col, key in shifts:
            cols[col] = pc.add(t.column(col), i * OFF[key])
        parts.append(pa.table(cols, schema=pa.schema(
            [t.schema.field(n).with_nullable(True) for n in t.column_names])))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/{table}.parquet")
    print(f"{table}: {t.num_rows} -> {out.num_rows}")


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    for table in ("region", "nation"):
        t = pq.read_table(f"{SRC}/{table}.parquet")
        pq.write_table(t, f"{DST}/{table}.parquet")
        print(f"{table}: {t.num_rows} (fixed dimension, copied)")
    for table, shifts in SHIFTS.items():
        replicate(table, shifts, COPIES)

    # documents: id shift + text tag + n_chars recompute
    t = pq.read_table(f"{SRC}/documents.parquet")
    parts = []
    for i in range(COPIES):
        doc_id = pc.add(t.column("doc_id"), i * OFF["doc"])
        if i == 0:
            text = t.column("text")
        else:
            text = pc.binary_join_element_wise(
                pc.cast(t.column("text"), pa.string()), f" c{i}", "")
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        parts.append(pa.table(
            {"doc_id": doc_id, "text": text, "lang": t.column("lang"),
             "source": t.column("source"), "n_chars": n_chars}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/documents.parquet")
    print(f"documents: {t.num_rows} -> {out.num_rows}")

    # embeddings: 5 copies, per-copy component perturbation
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    flat_type = t.column("embedding").type
    parts = []
    for i in range(EMB_COPIES):
        vec_id = pc.add(t.column("vec_id"), i * OFF["vec"])
        emb = t.column("embedding").combine_chunks()
        if i > 0:
            # perturb the flattened values, rebuild the list array on
            # the same offsets (every list is the same fixed dim)
            flat = pc.add(emb.values, 0.0003 * i)
            emb = pa.ListArray.from_arrays(emb.offsets, pc.cast(flat, pa.float32()))
            emb = emb.cast(flat_type)
        parts.append(pa.table({"vec_id": vec_id, "embedding": emb,
                               "label": t.column("label")}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
