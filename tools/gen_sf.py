"""Generate larger-SF fixture tables matching /root/testdata's schemas.

The driver ships read-only fixtures up to sf0.1 (~600k lineitem rows);
round-2 verdict item 1 asks for REAL scale evidence above that. This
generator emits the same 10-table star schema — identical column names,
arrow types, and value shapes (profiled from sf0.1: key ranges scale
linearly with SF; nation/region are copied verbatim; embeddings are
unit-normalized float32[64]; p_retailprice keeps its exact
900 + (key % 1000)/10 formula) — at any SF, deterministically
(numpy PCG64 seeded per table), so bench.py and the DuckDB oracle gate
run unchanged at sf1+ via SPARK_GRAFT_SF_DIR.

Usage: python tools/gen_sf.py --sf 1 --out /root/repo/testdata/sf1
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REF_DIR = "/root/testdata/sf0.1"  # source of the copy-verbatim dims

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPE = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
LANGS = ["de", "en", "es", "fr", "zh"]
LANG_P = [0.15, 0.40, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000  # microseconds per day


def _rng(table: str, sf: float) -> np.random.Generator:
    # zlib.crc32, not hash(): str hashing is salted per process, which
    # would silently break the cross-run determinism this tool promises
    seed = zlib.crc32(f"{table}:{round(sf * 1000)}".encode())
    return np.random.default_rng(seed)


def _ts_us(days_from_epoch):
    return pa.array(np.asarray(days_from_epoch, dtype="int64"), type=pa.timestamp("us"))


def _round2(x):
    return np.round(x, 2)


def gen_customer(sf, out):
    n = int(150_000 * sf)
    r = _rng("customer", sf)
    t = pa.table(
        {
            "c_custkey": pa.array(np.arange(n), type=pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n)],
            "c_nationkey": pa.array(r.integers(0, 25, n), type=pa.int32()),
            "c_acctbal": _round2(r.uniform(-1000, 10_000, n)),
            "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n)]),
        }
    )
    pq.write_table(t, f"{out}/customer.parquet")
    return n


def gen_supplier(sf, out):
    n = int(10_000 * sf)
    r = _rng("supplier", sf)
    t = pa.table(
        {
            "s_suppkey": pa.array(np.arange(n), type=pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n)],
            "s_nationkey": pa.array(r.integers(0, 25, n), type=pa.int32()),
            "s_acctbal": _round2(r.uniform(0, 10_000, n)),
        }
    )
    pq.write_table(t, f"{out}/supplier.parquet")
    return n


def gen_part(sf, out):
    n = int(200_000 * sf)
    r = _rng("part", sf)
    keys = np.arange(n)
    t = pa.table(
        {
            "p_partkey": pa.array(keys, type=pa.int64()),
            "p_name": [
                f"{P_ADJ[a]} {P_NOUN[b]}"
                for a, b in zip(r.integers(0, 8, n), r.integers(0, 8, n))
            ],
            "p_brand": [f"Brand#{b}" for b in r.integers(1, 26, n)],
            "p_type": pa.array(np.array(P_TYPE)[r.integers(0, 6, n)]),
            "p_size": pa.array(r.integers(1, 51, n), type=pa.int32()),
            # exact sf0.1 formula — keeps price/key correlation intact
            "p_retailprice": 900.0 + (keys % 1000) / 10.0,
        }
    )
    pq.write_table(t, f"{out}/part.parquet")
    return n


def gen_orders(sf, out):
    n = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    r = _rng("orders", sf)
    d0 = np.datetime64("1995-01-01").astype("datetime64[D]").astype(int)
    d1 = np.datetime64("2001-08-01").astype("datetime64[D]").astype(int)
    days = r.integers(d0, d1 + 1, n)
    t = pa.table(
        {
            "o_orderkey": pa.array(np.arange(n), type=pa.int64()),
            "o_custkey": pa.array(r.integers(0, n_cust, n), type=pa.int64()),
            "o_orderstatus": pa.array(np.array(["F", "O", "P"])[r.integers(0, 3, n)]),
            "o_totalprice": _round2(r.uniform(1000, 500_000, n)),
            "o_orderdate": _ts_us(days * DAY_US),
            "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n)]),
        }
    )
    pq.write_table(t, f"{out}/orders.parquet")
    return n


def _skewed_partkeys(r, n: int, n_part: int, hot_frac: float = 0.2):
    """Zipf-skewed part keys: ONE hot key (0) is PLANTED with ~hot_frac
    of all lineitem rows; the rest follow a zipf(1.3) tail over the
    remaining key space, whose head (key 1, P(z=1) ≈ 1/ζ(1.3) ≈ 0.25 of
    the cold mass ≈ another ~20% of all rows) makes the fixture
    effectively TWO-hot-key — the shape that makes a plain shuffle join
    straggle on a couple of reducers (the skew the salted operators and
    AQE skew-join exist for; ~uniform fixtures never exercise them)."""
    is_hot = r.random(n) < hot_frac
    z = r.zipf(1.3, n)  # >= 1, heavy tail
    cold = 1 + (z - 1) % max(n_part - 1, 1)  # spread over keys 1..n_part-1
    return np.where(is_hot, 0, cold)


def gen_lineitem(sf, out, skew: str = "none"):
    n_orders = int(1_500_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    r = _rng("lineitem", sf)
    per_order = r.integers(1, 8, n_orders)  # avg 4 items/order like sf0.1
    l_orderkey = np.repeat(np.arange(n_orders), per_order)
    n = len(l_orderkey)
    linenumber = np.concatenate([np.arange(1, c + 1) for c in per_order])
    d0 = np.datetime64("1995-01-02").astype("datetime64[D]").astype(int)
    d1 = np.datetime64("2001-11-04").astype("datetime64[D]").astype(int)
    t = pa.table(
        {
            "l_orderkey": pa.array(l_orderkey, type=pa.int64()),
            "l_partkey": pa.array(
                _skewed_partkeys(r, n, n_part)
                if skew == "zipf"
                else r.integers(0, n_part, n),
                type=pa.int64(),
            ),
            "l_suppkey": pa.array(r.integers(0, n_supp, n), type=pa.int64()),
            "l_linenumber": pa.array(linenumber, type=pa.int32()),
            "l_quantity": r.integers(1, 51, n).astype("float64"),
            "l_extendedprice": _round2(r.uniform(900, 105_000, n)),
            "l_discount": _round2(r.integers(0, 11, n) / 100.0),
            "l_tax": _round2(r.integers(0, 9, n) / 100.0),
            "l_returnflag": pa.array(np.array(["A", "N", "R"])[r.integers(0, 3, n)]),
            "l_linestatus": pa.array(np.array(["F", "O"])[r.integers(0, 2, n)]),
            "l_shipdate": _ts_us(r.integers(d0, d1 + 1, n) * DAY_US),
        }
    )
    pq.write_table(t, f"{out}/lineitem.parquet")
    return n


def gen_events(sf, out):
    n = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    r = _rng("events", sf)
    t0 = np.datetime64("2024-01-01T00:00:00").astype("datetime64[us]").astype(int)
    span = 30 * DAY_US
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n), type=pa.int64()),
            "ts": _ts_us(np.sort(t0 + r.integers(0, span, n))),
            "user_id": pa.array(r.integers(0, n_users, n), type=pa.int64()),
            "event_type": pa.array(np.array(EVENT_TYPES)[r.integers(0, 5, n)]),
            "value": _round2(r.exponential(50.0, n)),
            "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, n)],
        }
    )
    pq.write_table(t, f"{out}/events.parquet")
    return n


def gen_documents(sf, out):
    n = int(50_000 * sf)
    r = _rng("documents", sf)
    vocab = np.array(VOCAB)
    word_counts = r.integers(8, 100, n)
    texts = [" ".join(vocab[r.integers(0, len(vocab), c)]) for c in word_counts]
    # plant exact duplicates (~0.16% like sf0.1) so dedup operators have
    # real work at every SF
    for _ in range(max(1, n // 600)):
        i, j = r.integers(0, n, 2)
        texts[i] = texts[j]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), type=pa.int64()),
            "text": texts,
            "lang": pa.array(np.array(LANGS)[r.choice(5, n, p=LANG_P)]),
            "source": [f"src{i % 20}" for i in range(n)],
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, f"{out}/documents.parquet")
    return n


def gen_embeddings(sf, out):
    # sf0.01 -> sf0.1 scaled x4 (500 -> 2000): pairwise-blocked operators
    # cost sum(block^2), so embeddings grow sublinearly vs the fact tables
    n = int(20_000 * sf)
    r = _rng("embeddings", sf)
    v = r.normal(0, 1, (n, 64))
    # plant near-duplicate pairs (cosine > 0.95) so near-dup/CC operators
    # keep non-trivial edge sets at every SF
    for _ in range(max(1, n // 100)):
        i, j = r.integers(0, n, 2)
        v[i] = v[j] + r.normal(0, 0.1, 64)
    v = (v / np.linalg.norm(v, axis=1, keepdims=True)).astype("float32")
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(r.integers(0, 10, n), type=pa.int32()),
        }
    )
    pq.write_table(t, f"{out}/embeddings.parquet")
    return n


def copy_dim(name: str, out: str):
    pq.write_table(pq.read_table(f"{REF_DIR}/{name}.parquet"), f"{out}/{name}.parquet")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--skew",
        choices=["none", "zipf"],
        default="none",
        help="zipf: one l_partkey takes ~20%% of lineitem (skew-operator fixtures)",
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for dim in ("nation", "region"):
        copy_dim(dim, args.out)
    for fn in (
        gen_customer,
        gen_supplier,
        gen_part,
        gen_orders,
        gen_lineitem,
        gen_events,
        gen_documents,
        gen_embeddings,
    ):
        kw = {"skew": args.skew} if fn is gen_lineitem else {}
        rows = fn(args.sf, args.out, **kw)
        print(f"{fn.__name__}: {rows} rows")


if __name__ == "__main__":
    main()
