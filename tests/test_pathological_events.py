"""Hard-input sweep for the events-table queries — the third corpus
of the trilogy (documents / embeddings / events): null user_ids and
timestamps, exact timestamp ties, malformed/null/nested JSON props,
negative and extreme values, single-event users, same-instant
view+click pairs. Each oracle-backed events query runs
Spark-vs-DuckDB over it."""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY


def _t(s: str) -> datetime:
    return datetime.fromisoformat(s)


# (event_id, ts, user_id, event_type, value, props)
_EVENTS = [
    # null user_id: the as-of rewrite must NOT let a null-user view
    # feed a null-user click (SQL join semantics — pinned in r3)
    (0, _t("2024-01-01T00:00:00"), None, "view", 1.0, '{"k": 1}'),
    (1, _t("2024-01-01T00:00:05"), None, "click", 2.0, '{"k": 2}'),
    # null ts
    (2, None, 1, "view", 3.0, '{"k": 3}'),
    (3, _t("2024-01-01T00:01:00"), 1, "click", 4.0, '{"k": 4}'),
    # exact timestamp tie: view and click at the SAME instant
    (4, _t("2024-01-01T00:02:00"), 2, "view", 5.0, '{"k": 5}'),
    (5, _t("2024-01-01T00:02:00"), 2, "click", 6.0, '{"k": 6}'),
    # two views at the same instant before a click (as-of tie)
    (6, _t("2024-01-01T00:03:00"), 3, "view", 7.0, '{"k": 7}'),
    (7, _t("2024-01-01T00:03:00"), 3, "view", 8.0, '{"k": 8}'),
    (8, _t("2024-01-01T00:03:30"), 3, "click", 9.0, '{"k": 9}'),
    # malformed / null / nested / non-object JSON props
    (9, _t("2024-01-01T00:04:00"), 4, "view", 10.0, "{not json"),
    (10, _t("2024-01-01T00:04:10"), 4, "click", 11.0, None),
    (11, _t("2024-01-01T00:04:20"), 4, "error", 12.0, '{"k": {"n": 1}}'),
    (12, _t("2024-01-01T00:04:30"), 4, "purchase", 13.0, "[1,2,3]"),
    (13, _t("2024-01-01T00:04:40"), 4, "view", 14.0, '{"other": 5}'),
    # extreme values: negative, zero, huge (spatial bins must agree on
    # negative-value binning — floor vs truncate-toward-zero)
    (14, _t("2024-01-01T00:05:00"), 5, "view", -17.3, '{"k": 10}'),
    (15, _t("2024-01-01T00:05:10"), 5, "click", 0.0, '{"k": 11}'),
    (16, _t("2024-01-01T00:05:20"), 5, "view", 1.0e9, '{"k": 12}'),
    (17, _t("2024-01-01T00:05:30"), 5, "click", -0.0, '{"k": 13}'),
    # single-event user; session-gap boundary cases around 30 min
    (18, _t("2024-01-01T00:06:00"), 6, "view", 15.0, '{"k": 14}'),
    (19, _t("2024-01-01T01:00:00"), 7, "view", 16.0, '{"k": 15}'),
    (20, _t("2024-01-01T01:30:00"), 7, "view", 17.0, '{"k": 16}'),
    (21, _t("2024-01-01T02:00:00.000001"), 7, "view", 18.0, '{"k": 17}'),
    # value null
    (22, _t("2024-01-01T00:07:00"), 8, "view", None, '{"k": 18}'),
    (23, _t("2024-01-01T00:07:30"), 8, "click", 19.0, '{"k": 19}'),
]

_EVENT_QUERIES = [
    "events_asof_last_view",
    "events_sessionize",
    "events_hourly_agg",
    "events_json_extract",
    "events_transition_matrix",
    "events_spatial_bins",
]


@pytest.fixture(scope="module")
def patho_events_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("patho_events"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in _EVENTS], pa.int64()),
                "ts": pa.array([r[1] for r in _EVENTS], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in _EVENTS], pa.int64()),
                "event_type": pa.array([r[3] for r in _EVENTS], pa.string()),
                "value": pa.array([r[4] for r in _EVENTS], pa.float64()),
                "props": pa.array([r[5] for r in _EVENTS], pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


@pytest.mark.parametrize("name", _EVENT_QUERIES)
def test_events_family_on_pathological_events(spark, patho_events_dir, name):
    q = REGISTRY[name]
    assert q.sql, f"{name} has no oracle SQL"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{patho_events_dir}/events.parquet'"
    )
    res = compare_frames(
        q.spark(spark, patho_events_dir).toPandas(), con.sql(q.sql).df()
    )
    assert res["values_match"], (name, res["diff"])
