"""Generate an sf1-style testdata tier matching the driver tiers' shape.

The driver ships read-only tiers at /root/testdata/sf{0.001,0.01,0.1};
the scale story needs a 100x-the-correctness-SF tier (sf1) to certify
against.  This generator reproduces the OBSERVED schema and
distributions of the shipped tiers (measured on sf0.1 — see the
constants below); it does NOT reproduce the driver's RNG stream, which
is fine: every registry gate compares Spark vs DuckDB over the SAME
parquet files, so correctness is data-independent, and the class-mass
devices (planted dups, in-plan synthesis keyed on ids) scale with row
count by construction.

Measured facts reproduced here (sf0.1, seed-42 driver data):
- row counts scale linearly: customer 150k/sf-unit, supplier 10k,
  part 200k, orders 1.5M, lineitem 6M, events 1M, users 15k;
  documents = max(500, 50k*sf), embeddings = max(500, 20k*sf).
- documents: 30-word uniform vocab + a rare 'dup' marker word appended
  to 5% of docs; 10..100 words/doc; lang en 40% / fr de es zh 15%;
  source src0..src19 uniform; ~0.16% of docs are exact copies of an
  earlier doc; n_chars == length(text).
- events: ts uniform microseconds over 2024-01-01..2024-01-31,
  sorted, event_id = rank; user_id uniform over the user pool; value
  ~ round(Exp(mean=50), 2); props = '{"k": <0..99>}'.
- lineitem: orderkey/partkey/suppkey uniform (Poisson ~4 items per
  order), linenumber uniform 1..7, quantity integer-valued 1..50,
  extendedprice U(900, 105000), discount {0.00..0.10}, tax
  {0.00..0.08}, shipdate INDEPENDENT of orderdate (measured: min diff
  -2399 days), uniform over 1995-01-02..2001-11-04.
- orders: totalprice U(1000, 500000), orderdate uniform
  1995-01-01..2001-08-01, status O/F/P, 5 priorities.
- part: name = adjective+' '+noun from two 8-word pools, Brand#1..25,
  6 types, size 1..50, retailprice = 900 + (key % 1000)/10.
- embeddings: 64-dim iid N(0,1) L2-normalized float32, label 0..9.

Usage:
    python tools/gen_testdata.py --sf 1.0 --out /root/repo/testdata_sf1
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast the row agg key query a scan batch"
).split()

ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "fr", "de", "es", "zh"]
LANG_P = [0.40, 0.15, 0.15, 0.15, 0.15]

DAY_US = 86_400_000_000
EPOCH_2024 = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
EPOCH_1995 = np.datetime64("1995-01-01T00:00:00", "us").astype("int64")


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def _ts_us(int_us: np.ndarray) -> pa.Array:
    return pa.array(int_us, type=pa.timestamp("us"))


def generate(sf: float, out_dir: str, seed: int = 4242) -> dict:
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = round(150_000 * sf)
    n_supp = round(10_000 * sf)
    n_part = round(200_000 * sf)
    n_ord = round(1_500_000 * sf)
    n_li = round(6_000_000 * sf)
    n_ev = round(1_000_000 * sf)
    n_users = round(15_000 * sf)
    n_doc = max(500, round(50_000 * sf))
    n_emb = max(500, round(20_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    adj = np.array(ADJ)[rng.integers(0, 8, n_part)]
    noun = np.array(NOUN)[rng.integers(0, 8, n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {n}" for a, n in zip(adj, noun)],
        "p_brand": pa.array(
            [f"Brand#{b}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) / 10.0,
    }))

    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_us(
            EPOCH_1995 + rng.integers(0, 2405, n_ord) * DAY_US),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts_us(
            EPOCH_1995 + rng.integers(1, 2500, n_li) * DAY_US),
    }))

    ts = np.sort(rng.integers(0, 30 * DAY_US, n_ev)) + EPOCH_2024
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": _ts_us(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": pa.array(
            [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    n_words = rng.integers(10, 101, n_doc)
    word_idx = rng.integers(0, len(VOCAB), int(n_words.sum()))
    has_dup_word = rng.random(n_doc) < 0.05
    vocab = np.array(VOCAB)
    texts: list[str] = []
    off = 0
    for i in range(n_doc):
        w = n_words[i]
        t = " ".join(vocab[word_idx[off:off + w]])
        off += w
        if has_dup_word[i]:
            t += " dup"
        texts.append(t)
    # exact-duplicate copies (~0.16% of docs copy an earlier doc)
    n_copies = max(1, round(0.0016 * n_doc))
    for j in rng.choice(np.arange(1, n_doc), n_copies, replace=False):
        texts[j] = texts[int(rng.integers(0, j))]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[
            rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array(
            [f"src{s}" for s in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((n_emb, 64)).astype("float32")
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32()),
    }))

    counts = {
        "customer": n_cust, "supplier": n_supp, "part": n_part,
        "orders": n_ord, "lineitem": n_li, "events": n_ev,
        "documents": n_doc, "embeddings": n_emb,
    }
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default="/root/repo/testdata_sf1")
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()
    counts = generate(args.sf, args.out, args.seed)
    print(json.dumps({"sf": args.sf, "out": args.out, "counts": counts}))


if __name__ == "__main__":
    main()
