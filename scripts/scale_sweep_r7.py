#!/usr/bin/env python
"""Round-7 headline-core scale sweep (SURVEY §6 refresh).

The round-4 OLAP sweep (star join / sessionization / two-key agg at
1x/4x/8x) predates three rounds of plan changes; this re-measures the
CURRENT headline core at 1x/4x/16x the sf0.1 facts with key-offset
copies (join cardinalities preserved: every copy's customers own only
that copy's orders, which own only that copy's lineitems; events users
are copy-disjoint so session/window group counts scale linearly while
per-group sizes stay constant — the shape a growing tenant base has).

Dims (region/nation/supplier/part) and the corpus tables stay 1x —
broadcast sides don't grow with facts in a star schema.

Swept keys: join_star, agg_group, win_rownum, ts_session, topk,
join_asof. Prints one JSON line per (key, scale): wall seconds +
output rows.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "scale_r7"
)
SCALES = (1, 4, 16)
KEYS = ("join_star", "agg_group", "win_rownum", "ts_session", "topk", "join_asof")

# (table, [key columns to offset], offset stride column→base)
N_CUST = 15_000 * 10  # > max c_custkey at sf0.1, round stride
N_ORD = 150_000 * 10
N_EV = 100_000 * 10
N_USER = 10_000 * 10

_OFFSETS = {
    "customer": {"c_custkey": N_CUST},
    "orders": {"o_orderkey": N_ORD, "o_custkey": N_CUST},
    "lineitem": {"l_orderkey": N_ORD},
    "events": {"event_id": N_EV, "user_id": N_USER},
}
_COPY_AS_IS = ("region", "nation", "supplier", "part", "documents", "embeddings")


def build_scaled() -> None:
    con = duckdb.connect()
    for s in SCALES:
        d = f"{OUT}/x{s}"
        os.makedirs(d, exist_ok=True)
        for name in _COPY_AS_IS:
            dst = f"{d}/{name}.parquet"
            if not os.path.exists(dst):
                shutil.copyfile(f"{BASE}/{name}.parquet", dst)
        for name, offs in _OFFSETS.items():
            dst = f"{d}/{name}.parquet"
            if os.path.exists(dst):
                continue
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM '{BASE}/{name}.parquet'"
                ).fetchall()
            ]
            parts = []
            for c in range(s):
                sel = ", ".join(
                    f"{col} + {c * stride} AS {col}"
                    if (stride := offs.get(col))
                    else col
                    for col in cols
                )
                parts.append(f"SELECT {sel} FROM '{BASE}/{name}.parquet'")
            con.execute(
                f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' (FORMAT PARQUET)"
            )
        print(f"built x{s}", flush=True)


def main() -> None:
    build_scaled()
    from morphl_model_publishers_churning_users_spark.registry import get_queries
    from morphl_model_publishers_churning_users_spark.session import build_session

    spark = build_session("scale-sweep-r7", cpus=32)
    q = get_queries()
    results = []
    for key in KEYS:
        for s in SCALES:
            d = f"{OUT}/x{s}"
            q[key](spark, d).count()  # warm (JIT + file index)
            t0 = time.perf_counter()
            n = q[key](spark, d).count()
            wall = round(time.perf_counter() - t0, 2)
            results.append({"key": key, "scale": s, "wall_s": wall, "rows": n})
            print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"sweep": "r7_headline_core", "results": results}))


if __name__ == "__main__":
    main()
