#!/usr/bin/env python3
"""Deterministic 10x scale-up of the driver's sf0.1 testdata (dev tool,
not engine code — same standing as check_oracle.py): builds an sf1
directory so the full oracle+bench gate can run at 10x the bench scale
(VERDICT r4 item 1). /root/testdata is read-only; output goes under the
repo's gitignored target/.

Design: 10 copies of every fact table with per-copy key strides
(referential integrity preserved copy-by-copy; nation/region dims stay
single). Copy 0 is byte-identical to sf0.1. Scaling must not MULTIPLY
the duplication rate — 10 verbatim copies would make every document an
exact dup of 9 others and d4-style pair outputs quadratic (100x), which
no real corpus does — so copies are made DISSIMILAR across copies but
ISOMETRIC within a copy:

  - documents: every space-delimited token gets a per-copy suffix "~k".
    Token renaming is a bijection under the engine's split-on-space
    tokenizer, so within-copy jaccard/minhash/simhash structure is
    EXACTLY preserved while cross-copy token sets are disjoint (modulo
    nothing: suffixed tokens never collide with originals).
  - embeddings: per-copy deterministic sign-flip pattern over the 64
    dims — an isometry (cosines within a copy exactly preserved, floats
    exact under negation) while cross-copy cosines are pseudo-random.
  - events: ids strided; timestamps shifted by k * (span + 1h) so the
    time series grows 10x in LENGTH (the natural scaling for bars),
    preserving the TIMESTAMP(NANOS) physical type Spark must legacy-read.

Usage: python3 tools/make_sf1.py [src_dir] [out_dir] [copies]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def read(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def write(name, tables, schema):
    # Streamed copy-by-copy (tables may be a generator): at sf10 (100
    # copies) the all-copies concat would hold ~60 M lineitem rows in
    # memory; a ParquetWriter keeps peak memory at ONE copy. version=2.6
    # preserves the TIMESTAMP(NANOS) physical type the events fixture
    # relies on, same as the old single-shot write_table.
    n = 0
    with pq.ParquetWriter(f"{OUT}/{name}.parquet", schema, version="2.6",
                          compression="snappy") as w:
        for t in tables:
            t = t.cast(schema)
            w.write_table(t)
            n += t.num_rows
    print(f"{name:10s} {n} rows", flush=True)


def add_i64(col, off, typ):
    if off == 0:
        return col
    shifted = pc.add(pc.cast(col, pa.int64()), pa.scalar(off, pa.int64()))
    return pc.cast(shifted, typ)


def strided(name, strides):
    t = read(name)

    def copies():
        for k in range(COPIES):
            cols = {}
            for field in t.schema:
                c = t.column(field.name)
                if field.name in strides:
                    c = add_i64(c, k * strides[field.name], field.type)
                cols[field.name] = c
            yield pa.table(cols, schema=t.schema)
    write(name, copies(), t.schema)


def passthrough(name):
    t = read(name)
    write(name, [t], t.schema)


def events():
    t = read(name := "events")
    ts = t.column("ts")
    ts_i = pc.cast(ts, pa.int64())
    span = pc.max(ts_i).as_py() - pc.min(ts_i).as_py()
    hour_ns = 3_600_000_000_000

    def copies():
        for k in range(COPIES):
            cols = {
                "event_id": add_i64(t.column("event_id"), k * 10_000_000, pa.int64()),
                "ts": pc.cast(pc.add(ts_i, pa.scalar(k * (span + hour_ns), pa.int64())),
                              t.schema.field("ts").type),
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "value": t.column("value"),
                "props": t.column("props"),
            }
            yield pa.table(cols, schema=t.schema)
    write(name, copies(), t.schema)


def documents():
    t = read(name := "documents")
    doc_id = t.column("doc_id")
    texts = t.column("text").to_pylist()
    langs = t.column("lang")
    sources = t.column("source")

    def copies():
        for k in range(COPIES):
            if k == 0:
                txt, ids = t.column("text"), doc_id
            else:
                suffixed = [" ".join((tok + f"~{k}") if tok else tok
                                     for tok in s.split(" ")) for s in texts]
                txt = pa.array(suffixed, pa.string())
                ids = add_i64(doc_id, k * 1_000_000, pa.int64())
            n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
            yield pa.table(
                {"doc_id": ids, "text": txt, "lang": langs, "source": sources,
                 "n_chars": n_chars}, schema=t.schema)
    write(name, copies(), t.schema)


def embeddings():
    t = read(name := "embeddings")
    vec_id = t.column("vec_id")
    embs = t.column("embedding").to_pylist()
    labels = t.column("label")
    dims = len(embs[0])

    def copies():
      for k in range(COPIES):
        if k == 0:
            emb, ids = t.column("embedding"), vec_id
        else:
            # a MIXED hash bit per (k, d) — a linear form like
            # (k*odd1 + d*odd2) % 2 collapses to (k+d) % 2 (both
            # multipliers odd), making all odd copies share ONE pattern
            # (exact cross-copy twins, the duplication inflation this
            # scaler exists to avoid)
            signs = [1.0 if ((((k * 1000003) ^ (d * 7919)) * 2654435761
                              % 4294967296) >> 16) & 1 == 0 else -1.0
                     for d in range(dims)]
            flipped = [[v * s for v, s in zip(e, signs)] for e in embs]
            emb = pa.array(flipped, t.schema.field("embedding").type)
            ids = add_i64(vec_id, k * 1_000_000, pa.int64())
        yield pa.table(
            {"vec_id": ids, "embedding": emb, "label": labels}, schema=t.schema)
    write(name, copies(), t.schema)


def main():
    import os
    os.makedirs(OUT, exist_ok=True)
    passthrough("region")
    passthrough("nation")
    strided("customer", {"c_custkey": 1_000_000})
    strided("supplier", {"s_suppkey": 100_000})
    strided("part", {"p_partkey": 1_000_000})
    strided("orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000})
    strided("lineitem", {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                         "l_suppkey": 100_000})
    events()
    documents()
    embeddings()


if __name__ == "__main__":
    main()
