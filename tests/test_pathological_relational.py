"""Hard-input sweep for the relational (TPC-H-family) queries — null
join keys, null measures, empty groups, single-row groups, all-equal
values, negative quantities/prices, dangling foreign keys, duplicate
names. Every oracle-backed relational query runs Spark-vs-DuckDB over
the corpus (the fourth sweep of the family)."""

from __future__ import annotations

import os
from datetime import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY


def _d(s: str) -> datetime:
    return datetime.fromisoformat(s)


_TABLES: dict[str, tuple[pa.Schema, list[tuple]]] = {
    "region": (
        pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]),
        [(0, "AMERICA"), (1, "ASIA"), (2, None)],  # null region name
    ),
    "nation": (
        pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
        [
            (0, "US", 0),
            (1, "JP", 1),
            (2, "XX", 9),  # dangling region FK
            (3, "YY", None),  # null region FK
        ],
    ),
    "customer": (
        pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
        [
            (1, "a", 0, -10.5, "BUILDING"),  # negative balance
            (2, "b", 1, 0.0, "BUILDING"),
            (3, "c", 2, 99.9, None),  # null segment
            (4, "d", None, None, "AUTO"),  # null nation + balance
            (5, "e", 0, 50.0, "AUTO"),  # idle (no orders)
        ],
    ),
    "supplier": (
        pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
        [
            (1, "s1", 0, 1.0),
            (2, "s2", 1, -1.0),
            (3, "s3", None, None),  # inactive, null everything
        ],
    ),
    "part": (
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
        [
            (1, "p1", "B1", "T1", 1, 10.0),
            (2, "p2", "B2", "T2", 0, 0.0),  # zero size/price
            (3, "p3", None, None, None, None),  # all-null attrs
        ],
    ),
    "orders": (
        pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
        [
            (10, 1, "O", 100.0, _d("1997-03-01"), "1-URGENT"),
            (11, 1, "F", 100.0, _d("1998-03-01"), "1-URGENT"),  # dup price
            (12, 2, "O", -5.0, _d("1997-06-01"), "2-HIGH"),  # negative
            (13, 2, "F", None, _d("1998-06-01"), None),  # null price+prio
            (14, 3, "O", 0.0, None, "5-LOW"),  # null date
            (15, None, "F", 7.0, _d("1997-01-01"), "3-MEDIUM"),  # null cust
            (16, 99, "O", 1.0e12, _d("1998-12-31"), "4-NOT SPECIFIED"),
            # dangling custkey + huge price; single row for its year-edge
        ],
    ),
    "lineitem": (
        pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
        [
            (10, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _d("1997-04-01")),
            (10, 2, 1, 2, -3.0, 20.0, 1.0, 0.5, "N", "O", _d("1997-04-02")),
            # negative qty, 100% discount
            (11, 1, 2, 1, 1e6, 1e9, 0.1, 0.1, "R", "F", _d("1998-04-01")),
            (12, 3, 2, 1, 0.0, 0.0, 0.0, 0.0, "A", "F", _d("1997-07-01")),
            (12, 99, 99, 2, 2.0, 5.0, None, None, "A", "F", None),
            # dangling part/supp FKs, null discount/tax/shipdate
            (13, 1, None, 1, None, None, 0.2, 0.0, None, None, _d("1998-07-01")),
            # null suppkey/quantity/price/flags
        ],
    ),
}

_REL_QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "orders_percentiles",
    "sigma_clip_quantity",
    "sigma_clip_iter2",
    "mode_priority_per_segment",
    "argminmax_orders",
    "fallback_chain_supplier",
    "except_lost_customers",
    "semi_join_active_suppliers",
    "anti_join_idle_customers",
    "full_outer_year_diff",
    "union_priority_counts",
    "window_running_total",
    "scalar_suite_orders",
    "left_join_default_region",
    "cube_lineitem_qty",
    "pivot_status_qty",
    "range_join_price_bands",
    "rollup_order_revenue",
]


@pytest.fixture(scope="module")
def patho_rel_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("patho_rel"))
    for name, (schema, rows) in _TABLES.items():
        pq.write_table(
            pa.table(
                {
                    f.name: pa.array([r[i] for r in rows], f.type)
                    for i, f in enumerate(schema)
                }
            ),
            os.path.join(d, f"{name}.parquet"),
        )
    return d


@pytest.mark.parametrize("name", _REL_QUERIES)
def test_relational_family_on_pathological_tables(spark, patho_rel_dir, name):
    q = REGISTRY[name]
    assert q.sql, f"{name} has no oracle SQL"
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{patho_rel_dir}/{t}.parquet'"
        )
    res = compare_frames(
        q.spark(spark, patho_rel_dir).toPandas(), con.sql(q.sql).df()
    )
    assert res["values_match"], (name, res["diff"])
