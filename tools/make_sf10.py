#!/usr/bin/env python3
"""Generate an sf10 SLICE (documents + embeddings only) by key-shifted
replication of sf0.1 — the 100x probe corpus for the bucketed/banded
scale claims (VERDICT r10 item 6: the "sublinear for bucketed families"
claim rested on one 10x point; this adds a 100x point for the families
whose probes must stay bucket-pruned: set-similarity join, MinHash-LSH,
BM25 standing-index top-k).

Driver-side tooling only (pyarrow is NOT an engine dependency). Same
deliberate choices as make_sf1.py:
  - each copy i>0 appends a ' c<i>' tag so cross-copy docs are NEAR
    dups (the adversarial shape for LSH), not byte dups;
  - embeddings use a small per-copy perturbation so the vector space
    has 100x distinct points, not 100x collisions;
  - row groups stay the source's, so file parallelism scales with the
    copy count.

Only the two tables the probe families read are generated — a full
sf10 star schema would be ~9 GB of parquet for no additional signal.
"""
import sys
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf10"
COPIES = 100
EMB_COPIES = 50  # 100k vectors (sf1 uses 5 copies = 10k)

OFF = {"doc": 5000, "vec": 2000}


def main():
    import os
    os.makedirs(DST, exist_ok=True)

    # documents: id shift + text tag + n_chars recompute (make_sf1 logic)
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

    # embeddings: per-copy component perturbation
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    flat_type = t.column("embedding").type
    parts = []
    for i in range(EMB_COPIES):
        vec_id = pc.add(t.column("vec_id"), i * OFF["vec"])
        emb = t.column("embedding").combine_chunks()
        if i > 0:
            flat = pc.add(emb.values, 0.0003 * i)
            emb = pa.ListArray.from_arrays(emb.offsets, pc.cast(flat, pa.float32()))
            emb = emb.cast(flat_type)
        parts.append(pa.table({"vec_id": vec_id, "embedding": emb,
                               "label": t.column("label")}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/embeddings.parquet")
    print(f"embeddings: {t.num_rows} -> {out.num_rows}")

    # graph slice (VERDICT r11 item 7): the bench is graph-dominated
    # (pagerank/betweenness are the top shared-set costs) but the 100x
    # probe only covered text/embedding families. Key-shifted lineitem
    # copies scale the part<->supplier graph to 100 DISJOINT components,
    # each structurally identical to sf0.1's graph — so per-edge costs
    # (pagerank's join+agg per iteration runs over ALL edges) scale
    # honestly 100x. Seeded traversals (betweenness/closeness/bfs) get
    # frontier scaling only if the probe's seed set scales with the
    # copies — their fixed seeds 2..10 live in copy 0, so a probe must
    # plant per-copy seeds (node ids shift by 2*20000*i for parts,
    # 2*1000*i+1 for suppliers per partSupplierEdges' 2p/2s+1 scheme).
    # l_orderkey rides (shifted 10M per copy) so the CO-ORDER family
    # (triangles/ktruss/link_prediction/resource_allocation) can run:
    # their `l_orderkey < 10000` bound keeps them on copy 0 — constant
    # work by design, stated as such in SCALE.md. Only the three
    # columns the graph family reads — a full 60M-row lineitem would
    # be ~4 GB of parquet for no extra signal.
    t = pq.read_table(f"{SRC}/lineitem.parquet",
                      columns=["l_orderkey", "l_partkey", "l_suppkey"])
    parts = []
    for i in range(COPIES):
        parts.append(pa.table(
            {"l_orderkey": pc.add(t.column("l_orderkey"), i * 10000000),
             "l_partkey": pc.add(t.column("l_partkey"), i * 20000),
             "l_suppkey": pc.add(t.column("l_suppkey"), i * 1000)}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/lineitem.parquet")
    print(f"lineitem (graph cols): {t.num_rows} -> {out.num_rows}")

    # events slice: 100x the two-phase-directory family's input
    # (eval_auc_exact / drift_ks_exact / the cumulativeByScore pattern
    # ntileTwoPhase now rides). id-shifted copies, everything else
    # verbatim — the VALUE distribution is intentionally identical
    # across copies, so the distinct-score DIRECTORY stays constant
    # while the data grows 100x: exactly the shape the pattern claims
    # to be flat on (one data pass + directory-sized cumulatives).
    # ts rides unchanged (copying preserves the physical encoding the
    # readers branch on).
    t = pq.read_table(f"{SRC}/events.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(pa.table(
            {"event_id": pc.add(t.column("event_id"), i * 100000),
             "ts": t.column("ts"),
             "user_id": pc.add(t.column("user_id"), i * 1500),
             "event_type": t.column("event_type"),
             "value": t.column("value"),
             "props": t.column("props")}))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{DST}/events.parquet")
    print(f"events: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
