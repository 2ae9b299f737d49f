"""Structured Streaming surface.

The reference is batch-only; its luigi file-triggered incremental
model (tasks fire when input targets appear,
/root/reference/eugl/gqa/tasks.py:90-98) maps to a
`Trigger.AvailableNow` file stream: each run drains whatever parquet
drops arrived, exactly-once via the checkpoint dir — the idiomatic
Spark version of "process new granules since last run".

Also provides the watermarked event-time rollup (late-data-tolerant
hourly class distribution — the streaming analog of the per-class
histogram A1/A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from eugl_spark.pipeline import apply_pipeline, host

# canonical schema lives in the batch source layer; re-exported here
# so pre-move imports keep working
from eugl_spark.sources.pages import PAGES_SCHEMA  # noqa: F401


def stream_pipeline(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    host_rules=None,
    path_rules=None,
) -> StreamingQuery:
    """Incremental quality filter over a parquet drop directory.

    AvailableNow: drains all unprocessed files then stops — rerunning
    after new drops processes only the new files (checkpointed source
    offsets), the luigi target-existence resume recast on streaming.

    ``host_rules`` / ``path_rules`` are the batch pipeline's policy
    dims (robots deny/sample + path-scoped disallows), passed through
    unchanged: both join as stream-STATIC broadcast joins — the dim is
    re-read per micro-batch, so updating the robots snapshot between
    runs re-gates subsequent drops without checkpoint surgery.
    """
    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    out = apply_pipeline(
        src, repartition_to=0, host_rules=host_rules, path_rules=path_rules
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("bucket")
        .trigger(availableNow=True)
        .start()
    )


def stream_warc_drops(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    pattern: str = "*.warc*",
    transcode: bool = True,
    host_rules=None,
    path_rules=None,
) -> StreamingQuery:
    """Incremental RAW-CRAWL ingestion: a file stream over incoming
    ``.warc`` / ``.warc.gz`` drops, drained exactly-once per run.

    The full ingestion chain runs inside one streaming plan: binary
    file scan → spec-exact record split (gzip members + Content-Length
    framing + declared-charset transcode, sources/warc.py) →
    header-field parse + WARC-Type dispatch → the complete quality
    pipeline → bucketed parquet sink. AvailableNow + checkpointed
    source offsets = rerunning after new crawl drops land processes
    only the new files — the luigi target-existence model
    (/root/reference/eugl/gqa/tasks.py:90-98) recast on the format
    real crawls actually arrive in.

    Scale shape: parallelism rides the many-files axis (each WARC
    shard is one task through the member splitter); maxFilesPerTrigger
    bounds per-batch memory so a backlog of shards drains in bounded
    micro-batches rather than one giant batch.
    """
    from pyspark.sql import types as T

    from eugl_spark.sources.warc import (
        parse_crawl_records,
        split_warc_records_exact,
    )

    binary_file_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    src = (
        spark.readStream.format("binaryFile")
        .schema(binary_file_schema)
        .option("pathGlobFilter", pattern)
        .option("maxFilesPerTrigger", 64)
        .load(input_dir)
    )
    pages = parse_crawl_records(
        split_warc_records_exact(src, transcode=transcode)
    )
    out = apply_pipeline(
        pages, repartition_to=0, host_rules=host_rules, path_rules=path_rules
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("bucket")
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_pages(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "24 hours",
) -> StreamingQuery:
    """Streaming exact dedup: first-seen wins per url.

    The streaming analog of `dedup_exact` for a live crawl: re-crawled
    urls arriving within the watermark horizon are dropped.
    `dropDuplicatesWithinWatermark` bounds the dedup state — an entry
    expires once the watermark passes it, so state size tracks the
    horizon's url arrival rate, not the corpus (a plain
    dropDuplicates would grow state forever at 10^12 docs).
    Exactly-once across restarts via the checkpointed state store.
    """
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    # Damaged records carry a null warc_ts (warc.py's try_to_timestamp
    # tolerance). They must NOT enter the watermarked operator: treated
    # as epoch-0 they'd be dropped as late, and backfilling with
    # wall-clock time would POISON the checkpointed watermark (one
    # damaged row would advance it past the whole historical crawl,
    # discarding every later record). With no usable event time they
    # dedup on a separate time-free path whose state grows only with
    # the number of distinct damaged urls — the damage rate, not the
    # corpus.
    timed = (
        src.filter(F.col("warc_ts").isNotNull())
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url"])
    )
    damaged = src.filter(F.col("warc_ts").isNull()).dropDuplicates(["url"])
    return (
        timed.unionByName(damaged)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def sessionized_host_activity(pages_stream: DataFrame) -> DataFrame:
    """Streaming sessionization: gap-based session windows per host.

    The streaming twin of the batch lag/gap sessionize query —
    `F.session_window` merges events into a session while gaps stay
    under 30 minutes; the watermark closes (and emits) sessions once
    event time moves past them, bounding state. Output: one row per
    (host, session) with its page count and span.

    Damaged records (null warc_ts — see stream_dedup_pages) are
    EXCLUDED explicitly: with no event time there is no session by
    definition; count them upstream (observe/filter) if the damage
    rate itself is the signal of interest.
    """
    return (
        pages_stream.filter(F.col("warc_ts").isNotNull())
        .withWatermark("warc_ts", "1 hour")
        .groupBy(
            F.session_window("warc_ts", "30 minutes"),
            host(F.col("url")).alias("host"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            "host",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_pages",
        )
    )


def windowed_verdict_counts(labeled_stream: DataFrame) -> DataFrame:
    """Watermarked hourly drop-reason distribution (late data ≤ 2h).

    Damaged records (null warc_ts, warc.py's tolerance contract) have
    no event time to window by — filter them EXPLICITLY rather than
    letting the window expression's implicit isnotnull silently drop
    them: the caller can (and should) count them on a separate
    time-free branch, same split as stream_dedup_pages."""
    return (
        labeled_stream.filter(F.col("warc_ts").isNotNull())
        .withWatermark("warc_ts", "2 hours")
        .groupBy(
            F.window("warc_ts", "1 hour"),
            F.coalesce(F.col("drop_reason"), F.lit("KEEP")).alias("reason"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "reason",
            "n",
        )
    )


def stream_cdx_ingest(
    spark: SparkSession,
    index_dir: str,
    archive_root: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: int = 65536,
    host_rules=None,
    path_rules=None,
) -> StreamingQuery:
    """Incremental INDEX-DRIVEN ingestion: a text-file stream over
    arriving CDXJ index shards; per micro-batch the engine selects
    captures, plans coalesced byte spans, ranged-reads ONLY those
    spans from the archive, and runs the quality pipeline — the
    archive itself is never listed, never scanned (sources/cdx.py).
    This is how a 100-TB archive is actually consumed: index shards
    are the arrival signal AND the read plan.

    foreachBatch, not a pure streaming plan, by necessity: the fetch
    planner is a window function (gaps-and-islands), unsupported on
    unbounded streams — and correctly so, since a fetch plan is a
    per-drop artifact, not a running aggregate. Contract: selection
    (newest 200 text/html per url) applies WITHIN each index drop;
    cross-drop revisit collapse stays a downstream concern
    (stream_dedup_pages, or batch dedup_url_latest over the sink) —
    same layering as the batch chain. Exactly-once per run via
    checkpointed source offsets + AvailableNow."""
    from eugl_spark.sources.cdx import (
        latest_captures,
        parse_cdxj,
        read_ranged_records,
    )
    from eugl_spark.sources.warc import parse_crawl_records

    src = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 64)
        .load(index_dir)
    )

    def _drain(batch_df, _epoch):
        sel = latest_captures(
            parse_cdxj(batch_df.withColumnRenamed("value", "line"))
        )
        pages = parse_crawl_records(
            read_ranged_records(spark, sel, archive_root, gap=gap)
        )
        out = apply_pipeline(
            pages,
            repartition_to=0,
            host_rules=host_rules,
            path_rules=path_rules,
        )
        out.write.mode("append").partitionBy("bucket").parquet(output_dir)

    return (
        src.writeStream.foreachBatch(_drain)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_clean_corpus(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Incremental text hygiene over arriving html-doc drops: the
    clean-corpus chain (boilerplate block extraction → NFC + junk-char
    strip → C4 line rules, plans/queries.py::clean_corpus_from) is
    stateless per-row end to end, so it runs as a PURE streaming plan —
    no foreachBatch, no state store; the one Arrow boundary (the NFC
    kernel) batches per micro-batch exactly as in batch mode.
    AvailableNow + checkpointed offsets: rerunning after new drops
    processes only the new files, exactly-once per run."""
    from pyspark.sql import types as T

    from eugl_spark.plans.queries import clean_corpus_from

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("html", T.StringType()),
        ]
    )
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )
    return (
        clean_corpus_from(src)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
