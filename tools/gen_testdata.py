"""Self-generated same-schema test data for scaling measurements.

The driver's /root/testdata/sf{0.001,0.01,0.1} dirs are read-only and
stop at sf0.1, so every "100 TB" claim in SCALE.md rested on plan
shapes plus a 10x sweep (r11 verdict "What's missing" #2).  This tool
generates sf slices with the SAME schema and value distributions
(measured from the driver's sf0.01 parquet: table row ratios, column
types, vocab, cluster structure) so `tools/bench_subset.py` can run the
hot query families at sf0.01 / 0.1 / 1 from ONE generator and fit
time-vs-sf scaling exponents that are not polluted by generator skew.

Deliberately seed=7 (NOT the driver's seed=42, TESTDATA.md) and a
separate output root (localdata/, gitignored) so these slices can never
be confused with the driver's correctness inputs.

Row counts per sf (measured ratios from the driver's sf0.01 dir):
    lineitem 6M*sf, orders 1.5M*sf, customer 150k*sf, supplier 10k*sf,
    part 200k*sf, events 1M*sf, documents 50k*sf, embeddings 50k*sf,
    region 5, nation 25 (fixed).

Usage:  python tools/gen_testdata.py <sf> [<sf> ...]   e.g. 0.01 0.1 1
Output: localdata/sf<sf>/<table>.parquet

Layout (r12 verdict #4): at sf >= 1 every non-tiny table is written
as a DIRECTORY named <table>.parquet holding >= N_FILES part files —
the multi-file reality a 100 TB lake has, so scan parallelism at the
measured scale comes from the file count (Spark's per-file splits)
like production, not from byte-splitting one giant row group.  Sub-1
slices keep the single-file layout the driver's testdata uses.
Values are IDENTICAL either way: the split slices the same generated
arrays, so single- vs multi-file is purely a layout change."""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "localdata")

SEED = 7  # != 42: never the driver's data

VOCAB = [
    "join", "hash", "row", "batch", "scan", "customer", "column",
    "filter", "small", "slow", "merge", "order", "vector", "line",
    "table", "data", "agg", "value", "key", "stream", "window",
    "spark", "a", "group", "part", "big", "sort", "query", "fast",
    "the",
]  # + rare "dup" (~0.1% of tokens in the driver's corpus)
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.44, 0.14, 0.14, 0.14, 0.14]
EVENT_TYPES = ["purchase", "error", "view", "click", "signup"]
SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "PROMO"]
PCOLORS = ["red", "blue", "green", "small", "large", "shiny"]
PNOUNS = ["widget", "bolt", "ring", "gear", "cog", "plate"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

EPOCH_1995 = np.datetime64("1995-01-01")
EPOCH_2024 = np.datetime64("2024-01-01")


N_FILES = 32          # part files per table at sf >= 1
_SPLIT_MIN_ROWS = 10_000  # tiny dims (region/nation/...) stay one file


def _write(path: str, table: pa.Table, n_files: int = 1) -> None:
    if n_files <= 1 or table.num_rows < _SPLIT_MIN_ROWS:
        # single file; drop any directory a previous multi-file run left
        if os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        pq.write_table(table, path, compression="snappy")
        print(f"  wrote {path}  ({table.num_rows} rows)", flush=True)
        return
    if os.path.isfile(path):
        os.remove(path)  # previous single-file run
    if os.path.isdir(path):
        # drop the WHOLE directory: a previous run with more part
        # files (or more rows) would otherwise leave stale parts that
        # silently duplicate rows in every downstream read
        import shutil

        shutil.rmtree(path)
    os.makedirs(path)
    per = -(-table.num_rows // n_files)  # ceil
    for i in range(n_files):
        part = table.slice(i * per, per)
        if part.num_rows == 0:
            break
        pq.write_table(
            part,
            os.path.join(path, f"part-{i:05d}.parquet"),
            compression="snappy",
        )
    print(
        f"  wrote {path}/  ({table.num_rows} rows, {n_files} files)",
        flush=True,
    )


def _ts_col(days_float: np.ndarray, epoch: np.datetime64) -> pa.Array:
    us = (days_float * 86400e6).astype("int64")
    return pa.array(epoch.astype("datetime64[us]") + us.astype("timedelta64[us]"))


def gen_sf(sf: float) -> None:
    out = os.path.join(ROOT, f"sf{sf:g}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng([SEED, int(sf * 1_000_000)])
    nf = N_FILES if sf >= 1 else 1

    n_cust = int(150_000 * sf)
    n_supp = max(int(10_000 * sf), 4)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(50_000 * sf)
    n_user = max(int(15_000 * sf), 10)

    # region / nation — fixed tiny dims
    _write(os.path.join(out, "region.parquet"), pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }), nf)
    _write(os.path.join(out, "nation.parquet"), pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }), nf)

    _write(os.path.join(out, "customer.parquet"), pa.table({
        "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }), nf)

    _write(os.path.join(out, "supplier.parquet"), pa.table({
        "s_suppkey": pa.array(np.arange(n_supp, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, n_supp), 2)),
    }), nf)

    _write(os.path.join(out, "part.parquet"), pa.table({
        "p_partkey": pa.array(np.arange(n_part, dtype=np.int64)),
        "p_name": pa.array([
            f"{PCOLORS[i % 6]} {PNOUNS[(i // 6) % 6]}" for i in range(n_part)
        ]),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 5, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(900.0 + (np.arange(n_part) % 1000) / 10.0, 2)),
    }), nf)

    # orders — o_orderdate spans 1995-01-01 .. 2001-08-01 (driver range)
    _write(os.path.join(out, "orders.parquet"), pa.table({
        "o_orderkey": pa.array(np.arange(n_ord, dtype=np.int64)),
        "o_custkey": pa.array(rng.integers(0, max(n_cust, 1), n_ord).astype(np.int64)),
        "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(rng.uniform(900, 450_000, n_ord), 2)),
        "o_orderdate": _ts_col(
            rng.integers(0, 2404, n_ord).astype(np.float64), EPOCH_1995
        ),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }), nf)

    # lineitem — ~4 lines/order (1..7), chunked so every sf stays in
    # RAM.  Chunk size is FIXED regardless of layout so the rng draw
    # sequence (hence the data) is identical single- vs multi-file;
    # multi-file mode STREAMS each chunk into the part files covering
    # its fixed global row range (never buffering the whole table —
    # the chunked-writer design's point, review-pass catch).
    writer = None
    li_writers: dict[int, pq.ParquetWriter] = {}
    li_path = os.path.join(out, "lineitem.parquet")
    if nf > 1:
        if os.path.isfile(li_path):
            os.remove(li_path)
        if os.path.isdir(li_path):
            import shutil

            shutil.rmtree(li_path)
        os.makedirs(li_path)
    li_per = -(-n_li // nf) if nf > 1 else n_li  # rows per part (ceil)
    chunk = 2_000_000
    done = 0
    while done < n_li:
        m = min(chunk, n_li - done)
        qty = rng.integers(1, 51, m).astype(np.float64)
        price = np.round(qty * (900.0 + rng.uniform(0, 1200, m)), 2)
        t = pa.table({
            "l_orderkey": pa.array(rng.integers(0, max(n_ord, 1), m).astype(np.int64)),
            "l_partkey": pa.array(rng.integers(0, max(n_part, 1), m).astype(np.int64)),
            "l_suppkey": pa.array(rng.integers(0, n_supp, m).astype(np.int64)),
            "l_linenumber": pa.array(rng.integers(1, 8, m).astype(np.int32)),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(price),
            "l_discount": pa.array(np.round(rng.integers(0, 11, m) / 100.0, 2)),
            "l_tax": pa.array(np.round(rng.integers(0, 9, m) / 100.0, 2)),
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, m)]),
            "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, m)]),
            "l_shipdate": _ts_col(
                rng.integers(1, 2500, m).astype(np.float64), EPOCH_1995
            ),
        })
        if nf > 1:
            off = 0
            while off < m:
                p_idx = (done + off) // li_per
                take = min(m - off, (p_idx + 1) * li_per - (done + off))
                w = li_writers.get(p_idx)
                if w is None:
                    w = li_writers[p_idx] = pq.ParquetWriter(
                        os.path.join(li_path, f"part-{p_idx:05d}.parquet"),
                        t.schema,
                        compression="snappy",
                    )
                w.write_table(t.slice(off, take))
                off += take
        else:
            if writer is None:
                writer = pq.ParquetWriter(
                    li_path, t.schema, compression="snappy"
                )
            writer.write_table(t)
        done += m
    if writer is not None:
        writer.close()
        print(f"  wrote {li_path}  ({n_li} rows)", flush=True)
    if li_writers:
        for w in li_writers.values():
            w.close()
        print(
            f"  wrote {li_path}/  ({n_li} rows, {len(li_writers)} files)",
            flush=True,
        )

    # events — 30 days of 2024-01, JSON props {"k": 0..99}
    _write(os.path.join(out, "events.parquet"), pa.table({
        "event_id": pa.array(np.arange(n_ev, dtype=np.int64)),
        "ts": _ts_col(rng.uniform(0, 30, n_ev), EPOCH_2024),
        "user_id": pa.array(rng.integers(0, n_user, n_ev).astype(np.int64)),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.uniform(0, 500, n_ev), 2)),
        "props": pa.array([
            '{"k": %d}' % k for k in rng.integers(0, 100, n_ev)
        ]),
    }), nf)

    # documents — word-salad over the 30-word vocab + rare "dup";
    # length 10..110 words (driver: 48..553 chars, mean ~298)
    lens = rng.integers(10, 111, n_doc)
    total_words = int(lens.sum())
    words = np.array(VOCAB)[rng.integers(0, len(VOCAB), total_words)]
    rare = rng.random(total_words) < 0.001
    words[rare] = "dup"
    texts = []
    pos = 0
    for ln in lens:
        texts.append(" ".join(words[pos:pos + ln]))
        pos += ln
    _write(os.path.join(out, "documents.parquet"), pa.table({
        "doc_id": pa.array(np.arange(n_doc, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ]),
        "source": pa.array([f"src{int(s)}" for s in rng.integers(1, 21, n_doc)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }), nf)

    # embeddings — 64-d unit vectors in 10 clusters (driver: 10 labels,
    # unit norm); cluster centers drawn once per sf from the same rng
    dim = 64
    centers = rng.normal(size=(10, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n_emb, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(os.path.join(out, "embeddings.parquet"), pa.table({
        "vec_id": pa.array(np.arange(n_emb, dtype=np.int64)),
        "embedding": pa.array(
            list(vecs.astype(np.float32)), type=pa.list_(pa.float32())
        ),
        "label": pa.array(labels.astype(np.int32)),
    }), nf)


def main() -> None:
    sfs = [float(a) for a in sys.argv[1:]] or [0.01, 0.1, 1.0]
    for sf in sfs:
        print(f"generating sf{sf:g} ...", flush=True)
        gen_sf(sf)


if __name__ == "__main__":
    main()
