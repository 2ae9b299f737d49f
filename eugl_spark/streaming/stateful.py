"""Custom stateful streaming operator: per-host running QA counters.

The reference accumulates per-granule state only through its output
files; the streaming-native version keeps per-key state in the engine:
`applyInPandasWithState` maintains (n_docs, n_kept, n_scrub_changed)
per url-host across micro-batches — the building block for
"quarantine a host once its keep-rate collapses" policies at
Common-Crawl scale. Keys are hosts (bounded state), values are three
counters (bytes of state per key, not rows).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("n_scrubbed", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("n_kept", T.LongType()),
        T.StructField("n_scrubbed", T.LongType()),
        T.StructField("keep_rate", T.DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n_docs = n_kept = n_scrubbed = 0
    if state.exists:
        n_docs, n_kept, n_scrubbed = state.get
    for pdf in pdfs:
        n_docs += len(pdf)
        n_kept += int(pdf["keep"].sum())
        n_scrubbed += int(pdf["scrub_changed"].fillna(False).sum())
    state.update((n_docs, n_kept, n_scrubbed))
    yield pd.DataFrame(
        {
            "host": [key[0]],
            "n_docs": [n_docs],
            "n_kept": [n_kept],
            "n_scrubbed": [n_scrubbed],
            "keep_rate": [n_kept / n_docs if n_docs else float("nan")],
        }
    )


def host_quality_state(labeled_stream: DataFrame) -> DataFrame:
    """labeled pipeline stream → running per-host counters (update mode)."""
    from eugl_spark.pipeline import host

    # pipeline.host() is the canonical url→host expression — a private
    # re-derivation here would fragment per-host state the moment host
    # canonicalization changes
    keyed = labeled_stream.select(
        host(F.col("url")).alias("host"),
        F.col("keep"),
        F.col("qa.scrub.changed").alias("scrub_changed"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
