#!/usr/bin/env python
"""Alternate-seed fixture generator (VERDICT r5 #7).

Regenerates all ten tables at sf0.01 scale with the SAME schemas and
value domains as the driver fixtures but a DIFFERENT random seed and
independently-written sampling code. Purpose: the oracle-differential
suite is seed-agnostic by construction (Spark and DuckDB read the same
parquet), so re-running it over this corpus tests whether the engine's
TUNED constants — LSH/IVF/int8 recall floors, max_df skew caps, simhash
Hamming radius, blocking keys, lang-ID trigram margins — hold beyond the
one corpus they were tuned on. Failures here are FINDINGS about fixture
sensitivity, recorded in SCALE.md, not oracle bugs.

Usage:  python tools/gen_altseed.py OUTDIR [SEED] [SCALE] [HUB_USERS]
Then:   SPARK_GRAFT_SF_CORRECTNESS=OUTDIR python -m pytest \
            tests/test_oracle_differential.py -q -k matches_duckdb

HUB_USERS (VERDICT r14 #6) pins the events-table user-id domain
regardless of SCALE. Holding it small while events scale is the
hub-entity stress test that found the r14 O(hub^2) window frames: at
SCALE=25 with the default 150 users the Zipf-head user carries ~109k
events — a regime the official driver fixtures (cap ~99 events/user)
can never produce, but any bot/monitoring entity produces at 100 TB.
Default keeps the historical fixed-150 behavior (the accident is now
the documented knob).
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["O", "F", "P"]
PTYPES = ["ECONOMY", "SMALL", "MEDIUM", "LARGE", "STANDARD", "PROMO"]
ADJS = ["small", "large", "red", "blue", "hot", "old", "green", "new"]
NOUNS = ["ring", "widget", "bolt", "gear", "gizmo", "plate", "wheel", "cog"]
EVENT_TYPES = ["view", "click", "signup", "purchase", "error"]
LANGS = ["en", "de", "zh", "fr", "es"]
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch spark "
    "a the line sort window order data column join small customer query "
    "big stream group filter vector"
).split()

N_CUST, N_SUPP, N_PART, N_ORD, N_LINE = 1500, 100, 2000, 15000, 60000
N_EVT, N_DOC, N_EMB, N_USERS, EMB_DIM = 10000, 500, 500, 150, 64


def main(
    outdir: str, seed: int, scale: float = 1.0, hub_users: int | None = None
) -> None:
    import os

    global N_CUST, N_SUPP, N_PART, N_ORD, N_LINE, N_EVT, N_DOC, N_EMB
    global N_USERS
    if hub_users is not None:
        N_USERS = hub_users
    if scale != 1.0:  # optional size multiplier (intermediate-SF sweeps)
        N_CUST, N_PART = int(N_CUST * scale), int(N_PART * scale)
        N_ORD, N_LINE = int(N_ORD * scale), int(N_LINE * scale)
        N_EVT, N_DOC, N_EMB = (
            int(N_EVT * scale), int(N_DOC * scale), int(N_EMB * scale),
        )
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)

    def w(name: str, df: pd.DataFrame) -> None:
        df.to_parquet(f"{outdir}/{name}.parquet", index=False)
        print(f"{name}: {len(df)} rows")

    w("region", pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32), "r_name": REGIONS,
    }))
    w("nation", pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    }))
    w("customer", pd.DataFrame({
        "c_custkey": np.arange(N_CUST, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(N_CUST)],
        "c_nationkey": rng.integers(0, 25, N_CUST).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, N_CUST), 2),
        "c_mktsegment": rng.choice(SEGMENTS, N_CUST),
    }))
    w("supplier", pd.DataFrame({
        "s_suppkey": np.arange(N_SUPP, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(N_SUPP)],
        "s_nationkey": rng.integers(0, 25, N_SUPP).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, N_SUPP), 2),
    }))
    w("part", pd.DataFrame({
        "p_partkey": np.arange(N_PART, dtype=np.int64),
        "p_name": [
            f"{rng.choice(ADJS)} {rng.choice(NOUNS)}" for _ in range(N_PART)
        ],
        "p_brand": [f"Brand#{rng.integers(1, 26)}" for _ in range(N_PART)],
        "p_type": rng.choice(PTYPES, N_PART),
        "p_size": rng.integers(1, 51, N_PART).astype(np.int32),
        "p_retailprice": np.round(900 + np.arange(N_PART) * 0.1, 2),
    }))

    o_date = pd.Timestamp("1995-01-01") + pd.to_timedelta(
        rng.integers(0, 2405, N_ORD), unit="D"
    )
    w("orders", pd.DataFrame({
        "o_orderkey": np.arange(N_ORD, dtype=np.int64),
        "o_custkey": rng.integers(0, N_CUST, N_ORD).astype(np.int64),
        "o_orderstatus": rng.choice(STATUSES, N_ORD, p=[0.49, 0.49, 0.02]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, N_ORD), 2),
        "o_orderdate": o_date.astype("datetime64[us]"),
        "o_orderpriority": rng.choice(PRIORITIES, N_ORD),
    }))

    # ~Poisson(3)+1 lines per order, trimmed to exactly N_LINE rows.
    per_order = rng.poisson(3.0, N_ORD) + 1
    while per_order.sum() < N_LINE:
        per_order[rng.integers(0, N_ORD)] += 1
    ok_rep = np.repeat(np.arange(N_ORD, dtype=np.int64), per_order)[:N_LINE]
    linenum = np.concatenate(
        [np.arange(1, n + 1) for n in per_order]
    )[:N_LINE].astype(np.int32)
    ship = (
        o_date.values.astype("datetime64[D]")[ok_rep]
        + rng.integers(1, 96, N_LINE).astype("timedelta64[D]")
    )
    w("lineitem", pd.DataFrame({
        "l_orderkey": ok_rep,
        "l_partkey": rng.integers(0, N_PART, N_LINE).astype(np.int64),
        "l_suppkey": rng.integers(0, N_SUPP, N_LINE).astype(np.int64),
        "l_linenumber": linenum,
        "l_quantity": rng.integers(1, 51, N_LINE).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(901, 105000, N_LINE), 2),
        "l_discount": np.round(rng.integers(0, 11, N_LINE) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, N_LINE) / 100.0, 2),
        "l_returnflag": rng.choice(["A", "N", "R"], N_LINE),
        "l_linestatus": rng.choice(["O", "F"], N_LINE),
        "l_shipdate": ship.astype("datetime64[us]"),
    }))

    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        np.sort(rng.uniform(0, 30 * 86400, N_EVT)), unit="s"
    )
    w("events", pd.DataFrame({
        "event_id": np.arange(N_EVT, dtype=np.int64),
        "ts": ts.astype("datetime64[us]"),
        # Zipf-ish user skew: a few heavy users, matching the skew the
        # salted-join/dedup operators are built for.
        "user_id": np.minimum(
            rng.zipf(1.6, N_EVT) - 1, N_USERS - 1
        ).astype(np.int64),
        "event_type": rng.choice(EVENT_TYPES, N_EVT),
        "value": np.round(rng.uniform(0.01, 490, N_EVT), 2),
        "props": [
            '{"k": %d}' % rng.integers(0, 100) for _ in range(N_EVT)
        ],
    }))

    # Documents: ~70% independent docs + ~30% near-duplicate mutations of
    # earlier docs (1-3 token edits) so dedup clustering has real work.
    texts: list = []
    n_base = int(N_DOC * 0.7)
    for _ in range(n_base):
        n_tok = int(rng.integers(10, 90))
        texts.append(" ".join(rng.choice(VOCAB, n_tok)))
    while len(texts) < N_DOC:
        base = texts[int(rng.integers(0, n_base))].split()
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(0, len(base)))
            base[pos] = str(rng.choice(VOCAB))
        texts.append(" ".join(base))
    order = rng.permutation(N_DOC)
    texts = [texts[i] for i in order]
    w("documents", pd.DataFrame({
        "doc_id": np.arange(N_DOC, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, N_DOC, p=[0.44, 0.14, 0.14, 0.14, 0.14]),
        "source": [f"src{rng.integers(0, 20)}" for _ in range(N_DOC)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }))

    # Embeddings: 10 gaussian clusters (unnormalized, ~N(0, 0.12) per dim
    # like the originals) so kNN/LSH/IVF recall and k-means have
    # comparable geometry under a different seed.
    centroids = rng.normal(0, 0.1, (10, EMB_DIM))
    labels = rng.integers(0, 10, N_EMB).astype(np.int32)
    vecs = (
        centroids[labels] + rng.normal(0, 0.07, (N_EMB, EMB_DIM))
    ).astype(np.float32)
    w("embeddings", pd.DataFrame({
        "vec_id": np.arange(N_EMB, dtype=np.int64),
        "embedding": list(vecs),
        "label": labels,
    }))


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 1337,
        float(sys.argv[3]) if len(sys.argv) > 3 else 1.0,
        int(sys.argv[4]) if len(sys.argv) > 4 else None,
    )
