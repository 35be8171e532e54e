"""Generate measurement-only synthetic data matching the sandbox
testdata distributions at a larger scale factor.

The driver's round-5 MEASUREMENT ran at sf=1.0 (50k docs) on
driver-generated data that is not retained on disk between rounds.
This script regenerates a *statistically equivalent* sf for local
timing only — same schemas, same parquet layout (pyarrow defaults,
snappy, single row group per <=1Mi-row table), same distributions
measured from /root/testdata/sf0.1:

  documents  : doc_id 0..N-1; text = uniform word soup over the same
               30-word vocabulary, 10..100 tokens; lang en ~41% /
               zh,es,fr,de ~15% each; source src0..src19; ~0.16%
               exact-duplicate pairs; 5% of docs carry the 'dup'
               marker token (matches sf0.1 rates).
  embeddings : iid unit-norm 64-dim Gaussian (verified: no label
               cluster correlation in the originals), 10 labels.
  events     : 10N events over 30 days, 0.3N users, 5 event types
               uniform, value ~ |N(0,1)|*50-ish clipped, props JSON.
  TPC-H-ish  : lineitem/orders/customer/part/supplier/nation/region
               with the measured key ranges, value ranges and
               category frequencies (uniform), ~4 lines per order.

NEVER used by correctness checks (oracles run on the driver's frozen
sf0.001/sf0.01 under /root/testdata) and never read by any query by
default — purely a bench input via SPARK_GRAFT_SF_DIR.

Usage: python scripts/gen_benchdata.py [sf] [outdir]
       (defaults: 1.0  /root/bench_data/sf1.0)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "group",
    "query", "row", "data", "slow", "filter", "customer", "line", "value",
    "agg", "column", "big", "a", "vector",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(rng: np.random.RandomState, n: int) -> pa.Table:
    lens = rng.randint(10, 101, size=n)
    vocab = np.array(VOCAB)
    texts = []
    for i in range(n):
        words = vocab[rng.randint(0, len(vocab), size=lens[i])]
        if rng.rand() < 0.05:  # 'dup' marker docs, ~5% as in sf0.1
            words = np.concatenate([words, ["dup"]])
            rng.shuffle(words)
        texts.append(" ".join(words))
    # exact duplicate pairs at the sf0.1 rate (8 per 5000 docs)
    n_dup_pairs = max(1, round(n * 8 / 5000))
    for _ in range(n_dup_pairs):
        a, b = rng.randint(0, n, size=2)
        texts[b] = texts[a]
    langs = np.array(LANGS)[rng.choice(len(LANGS), size=n, p=LANG_P)]
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array([f"src{i % 20}" for i in rng.permutation(n)], pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    })


def gen_embeddings(rng: np.random.RandomState, n: int, dim: int = 64) -> pa.Table:
    v = rng.randn(n, dim).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, size=n), pa.int32()),
    })


def gen_events(rng: np.random.RandomState, n: int, n_users: int) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + np.sort(rng.randint(0, span_us, size=n)).astype("timedelta64[us]")
    types = np.array(["click", "error", "purchase", "signup", "view"])
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(types[rng.randint(0, 5, size=n)], pa.string()),
        "value": pa.array(np.round(np.abs(rng.randn(n)) * 62.0, 2), pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.randint(0, 100, size=n)], pa.string()),
    })


def gen_tpch(rng: np.random.RandomState, sf: float, out: str) -> None:
    n_orders = int(150_000 * sf / 0.1)
    n_cust = int(15_000 * sf / 0.1)
    n_part = int(20_000 * sf / 0.1)
    n_supp = int(1_000 * sf / 0.1)
    n_li = int(600_000 * sf / 0.1)

    region = pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]),
    })
    pq.write_table(region, f"{out}/region.parquet")
    nation = pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
    })
    pq.write_table(nation, f"{out}/nation.parquet")

    segs = np.array(["AUTOMOBILE", "BUILDING", "MACHINERY", "FURNITURE", "HOUSEHOLD"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.randint(0, 25, size=n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.rand(n_cust) * 10000 - 1000, 2), pa.float64()),
        "c_mktsegment": pa.array(segs[rng.randint(0, 5, size=n_cust)], pa.string()),
    }), f"{out}/customer.parquet")

    adjs = ["large", "hot", "small", "cold", "dim", "shiny", "dark", "pale"]
    nouns = ["ring", "bolt", "cog", "gear", "pin", "cap", "rod", "nut"]
    types = np.array(["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"])
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"{adjs[int(a)]} {nouns[int(b)]}" for a, b in
                            zip(rng.randint(0, 8, n_part), rng.randint(0, 8, n_part))]),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.randint(1, 26, n_part)]),
        "p_type": pa.array(types[rng.randint(0, len(types), n_part)], pa.string()),
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + rng.rand(n_part) * 1100, 2), pa.float64()),
    }), f"{out}/part.parquet")

    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.randint(0, 25, size=n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.rand(n_supp) * 10000 - 1000, 2), pa.float64()),
    }), f"{out}/supplier.parquet")

    base = np.datetime64("1995-01-01")
    statuses = np.array(["F", "O", "P"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    odates = base + rng.randint(0, 2404, size=n_orders).astype("timedelta64[D]")
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, size=n_orders), pa.int64()),
        "o_orderstatus": pa.array(statuses[rng.randint(0, 3, n_orders)], pa.string()),
        "o_totalprice": pa.array(np.round(1000 + rng.rand(n_orders) * 499000, 2), pa.float64()),
        "o_orderdate": pa.array(odates.astype("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(prios[rng.randint(0, 5, n_orders)], pa.string()),
    }), f"{out}/orders.parquet")

    lkeys = np.sort(rng.randint(0, n_orders, size=n_li))
    flags = np.array(["A", "N", "R"])
    stats = np.array(["F", "O"])
    sdates = base + rng.randint(1, 2500, size=n_li).astype("timedelta64[D]")
    # line numbers 1..7 within order
    _, counts = np.unique(lkeys, return_counts=True)
    linenums = np.concatenate([np.arange(1, c + 1) for c in counts])[:n_li]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lkeys, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, size=n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, size=n_li), pa.int64()),
        "l_linenumber": pa.array(np.minimum(linenums, 7), pa.int32()),
        "l_quantity": pa.array(rng.randint(1, 51, size=n_li).astype(np.float64), pa.float64()),
        "l_extendedprice": pa.array(np.round(900 + rng.rand(n_li) * 104100, 2), pa.float64()),
        "l_discount": pa.array(np.round(rng.randint(0, 11, size=n_li) / 100.0, 2), pa.float64()),
        "l_tax": pa.array(np.round(rng.randint(0, 9, size=n_li) / 100.0, 2), pa.float64()),
        "l_returnflag": pa.array(flags[rng.randint(0, 3, n_li)], pa.string()),
        "l_linestatus": pa.array(stats[rng.randint(0, 2, n_li)], pa.string()),
        "l_shipdate": pa.array(sdates.astype("datetime64[us]"), pa.timestamp("us")),
    }), f"{out}/lineitem.parquet")


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/bench_data/sf{sf}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(42)
    n_docs = int(5000 * sf / 0.1)
    pq.write_table(gen_documents(rng, n_docs), f"{out}/documents.parquet")
    pq.write_table(gen_embeddings(rng, int(2000 * sf / 0.1)), f"{out}/embeddings.parquet")
    pq.write_table(gen_events(rng, int(100_000 * sf / 0.1), int(1500 * sf / 0.1)),
                   f"{out}/events.parquet")
    gen_tpch(rng, sf, out)
    sizes = {f: os.path.getsize(f"{out}/{f}") for f in sorted(os.listdir(out))}
    print(json.dumps({"sf": sf, "out": out, "n_docs": n_docs, "bytes": sizes}))


if __name__ == "__main__":
    main()
