"""J6 as-of tie semantics: the single-pass window rewrite must equal
the join definition (v.ts <= c.ts) exactly when views and clicks share
identical timestamps — the case the driver's testdata may never hit.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY


def test_asof_equals_join_semantics_under_ties(spark, tmp_path):
    d = str(tmp_path)
    t = datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: view at the click's EXACT ts (must count) + earlier view
        (1, 1, "view", datetime(2024, 1, 1, 11, 0, 0)),
        (2, 1, "click", t),
        (3, 1, "view", t),
        # user 2: two same-ts clicks, no views → null
        (4, 2, "click", t),
        (5, 2, "click", t),
        # user 3: click strictly before any view → null
        (6, 3, "click", datetime(2024, 1, 1, 10, 0, 0)),
        (7, 3, "view", datetime(2024, 1, 1, 10, 30, 0)),
        # user 4: multiple identical-ts views, click at same ts and later
        (8, 4, "view", t),
        (9, 4, "view", t),
        (10, 4, "click", t),
        (11, 4, "click", datetime(2024, 1, 1, 12, 0, 1)),
        # NULL user: the join (v.user_id = c.user_id) never matches
        # NULLs — a null-user view must NOT feed a null-user click
        (12, None, "view", datetime(2024, 1, 1, 11, 0, 0)),
        (13, None, "click", t),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows], pa.string()),
                "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    q = REGISTRY["events_asof_last_view"]
    res = compare_frames(q.spark(spark, d).toPandas(), con.sql(q.sql).df())
    assert res["values_match"], res["diff"]
    by_click = {
        r["click_id"]: r["last_view_us"]
        for r in q.spark(spark, d).collect()
    }
    # naive ts is stored/read as UTC wall time (session tz pinned UTC);
    # naive .timestamp() would use the HOST tz and break off-UTC
    t_us = int(t.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)
    assert by_click[2] == t_us  # same-ts view counts
    assert by_click[4] is None and by_click[5] is None
    assert by_click[6] is None  # no earlier view
    assert by_click[10] == t_us and by_click[11] == t_us
    assert by_click[13] is None  # null-user view never matches
