#!/usr/bin/env python
"""Repo-local generator for larger scale factors of the driver's
synthetic star schema (TESTDATA.md — the driver ships sf0.001/0.01/0.1
read-only; scaling experiments past sf0.1 need data the repo can make
itself).

Faithful to the measured sf0.1 distributions (tools-audited: value
domains, cardinality scaling, per-order line counts, planted document
duplicates, clustered unit embeddings, nanosecond event timestamps) but
NOT byte-identical to the driver's generator — good for RELATIVE
scaling measurements (sf0.1→sf1 per-query ratios with both sides
generated here), not for absolute comparisons against driver-provided
parquet.

Usage: python tools/gen_sf.py OUT_DIR SF [--seed 42]
  e.g. python tools/gen_sf.py .sfdata/sf1 1.0
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["small", "large", "red", "blue", "hot", "cold", "old", "new"]
PNOUN = ["ring", "widget", "bolt", "gear", "gizmo", "plate", "cog", "washer"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.42, 0.145, 0.145, 0.145, 0.145]
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def _money(rng, n, lo, hi):
    return np.round(rng.uniform(lo, hi, n), 2)


def generate(out_dir: str, sf: float, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_users = max(1, int(15_000 * sf))

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": _money(rng, n_cust, -1000, 10000),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": _money(rng, n_supp, -1000, 10000),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [
            f"{PADJ[a]} {PNOUN[b]}"
            for a, b in zip(
                rng.integers(0, len(PADJ), n_part),
                rng.integers(0, len(PNOUN), n_part),
            )
        ],
        "p_brand": [f"Brand#{i + 1}" for i in rng.integers(0, 25, n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, len(PTYPES), n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": _money(rng, n_part, 900, 1000),
    }))

    # orders: dates uniform 1995-01-01 .. 2001-08-01 (day granularity)
    day_us = 86_400_000_000
    o_base = np.datetime64("1995-01-01", "us").astype("int64")
    o_span_days = (
        np.datetime64("2001-08-01", "us").astype("int64") - o_base
    ) // day_us
    o_date_us = o_base + rng.integers(0, o_span_days + 1, n_ord) * day_us
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(STATUSES)[rng.integers(0, 3, n_ord)],
        "o_totalprice": _money(rng, n_ord, 1000, 500_000),
        "o_orderdate": pa.array(o_date_us, pa.timestamp("us")),
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    }))

    # lineitem: 1 + Poisson(3.075) lines/order (sf0.1 measures avg 4.08,
    # max 17); shipdate = orderdate + U(1..95) days
    per_order = 1 + rng.poisson(3.075, n_ord)
    l_ord = np.repeat(np.arange(n_ord, dtype=np.int64), per_order)
    n_li = len(l_ord)
    linenum = np.concatenate([np.arange(1, c + 1) for c in per_order])
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    unit = rng.uniform(900, 2100, n_li)
    ship_us = (
        np.repeat(o_date_us, per_order)
        + rng.integers(1, 96, n_li) * day_us
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_ord, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * unit, 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(RETURNFLAGS)[rng.integers(0, 3, n_li)],
        "l_linestatus": np.array(LINESTATUSES)[rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(ship_us, pa.timestamp("us")),
    }))

    # events: exponential interarrival across Jan 2024, ns timestamps
    # (the driver writes TIMESTAMP(NANOS) — tables.table handles it)
    span_s = 30 * 86_400
    gaps = rng.exponential(span_s / n_ev, n_ev)
    ts_s = np.cumsum(gaps)
    ts_s *= span_s / ts_s[-1] * 0.9997  # keep inside the month
    ev_base_ns = np.datetime64("2024-01-01", "ns").astype("int64")
    ts_ns = ev_base_ns + (ts_s * 1e9).astype("int64")
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts_ns, pa.timestamp("ns")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
        "value": np.round(rng.exponential(90.0, n_ev).clip(0, 600), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)],
    }))

    # documents: 10-100 tokens from the 31-token vocab; ~0.2% planted
    # exact duplicates + ~0.3% near-duplicates (one token flipped) so
    # the dedup family has work at every scale
    n_src = 20
    lens = rng.integers(10, 101, n_doc)
    vocab = np.array(VOCAB)
    texts = [
        " ".join(vocab[rng.integers(0, len(vocab), ln)]) for ln in lens
    ]
    n_dup = max(1, int(0.002 * n_doc))
    n_near = max(1, int(0.003 * n_doc))
    for i in rng.integers(0, n_doc, n_dup):
        texts[int(i)] = texts[int(rng.integers(0, n_doc))]
    for i in rng.integers(0, n_doc, n_near):
        src_i = int(rng.integers(0, n_doc))
        words = texts[src_i].split()
        words[int(rng.integers(0, len(words)))] = str(
            vocab[rng.integers(0, len(vocab))]
        )
        texts[int(i)] = " ".join(words)
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_W)
        ],
        "source": [f"src{i}" for i in rng.integers(0, n_src, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: 10 spherical clusters, unit-normalized float32[64];
    # ~2% near-identical pairs planted for SemDeDup / ANN recall
    dim, k = 64, 10
    centers = rng.standard_normal((k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n_emb)
    vecs = centers[labels] + 0.35 * rng.standard_normal((n_emb, dim))
    n_pair = max(1, int(0.02 * n_emb))
    dup_src = rng.integers(0, n_emb, n_pair)
    dup_dst = rng.integers(0, n_emb, n_pair)
    vecs[dup_dst] = vecs[dup_src] + 0.01 * rng.standard_normal(
        (n_pair, dim)
    )
    labels[dup_dst] = labels[dup_src]
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [v.astype(np.float32) for v in vecs], pa.list_(pa.float32())
        ),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("sf", type=float)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.out_dir, a.sf, a.seed)
