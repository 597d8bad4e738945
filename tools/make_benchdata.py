#!/usr/bin/env python3
"""Regenerate benchdata/sfN as K replicas of a source SF dir.

Usage: python3 tools/make_benchdata.py [src=/root/testdata/sf0.1] \
         [dst=/root/repo/benchdata/sf1] [k=10]

Each fact-ish table is unioned K times with every key column shifted
by i * ceil(max_key + 1) so replicas never collide and intra-replica
FK relationships stay valid. Text/embedding payloads replicate
VERBATIM — which is the point for the dedup/ANN benchmarks: a K-fold
corpus has K-fold near-duplicate density, so the candidate-bounded
shapes (q42 LSH, q144 prefix join, q150 n-grams) are stress-tested at
their worst realistic profile, not a diluted one. Dimension tables
(region, nation) keep their TPC-H-style fixed cardinality.

Tooling only (driver-side python + duckdb, like check_oracle.py) —
the engine under test never runs this.
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/benchdata/sf1"
k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# table -> list of (column, shift-base column) pairs; every listed
# column shifts by i * span(base). A base of None means the column is
# its own span source.
KEYED = {
    "customer": {"c_custkey": "c_custkey"},
    "supplier": {"s_suppkey": "s_suppkey"},
    "part": {"p_partkey": "p_partkey"},
    "orders": {"o_orderkey": "o_orderkey", "o_custkey": "c_custkey"},
    "lineitem": {"l_orderkey": "o_orderkey", "l_partkey": "p_partkey",
                 "l_suppkey": "s_suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}
DIMS = ["region", "nation"]

import os
os.makedirs(dst, exist_ok=True)

span = {}
for t, cols in KEYED.items():
    for base in set(cols.values()):
        if base not in span:
            tbl = t if base in duckdb.sql(
                f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").columns else None
            # find the table that owns the base column
            owner = None
            for cand in KEYED:
                if base in duckdb.sql(
                        f"SELECT * FROM '{src}/{cand}.parquet' LIMIT 0").columns:
                    owner = cand
                    break
            span[base] = duckdb.sql(
                f"SELECT CAST(max({base}) + 1 AS BIGINT) "
                f"FROM '{owner}/{owner}.parquet'".replace(
                    f"'{owner}/", f"'{src}/")).fetchone()[0]

for t in DIMS:
    duckdb.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
               f"'{dst}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

for t, cols in KEYED.items():
    allc = duckdb.sql(f"SELECT * FROM '{src}/{t}.parquet' LIMIT 0").columns
    parts = []
    for i in range(k):
        sel = ", ".join(
            f"{c} + {i * span[cols[c]]} AS {c}" if c in cols else c
            for c in allc)
        parts.append(f"SELECT {sel} FROM '{src}/{t}.parquet'")
    q = " UNION ALL ".join(parts)
    duckdb.sql(f"COPY ({q}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    n = duckdb.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
    print(t, n)
