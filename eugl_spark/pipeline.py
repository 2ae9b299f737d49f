"""The quality-filter pipeline: one lazy DataFrame plan.

The reference's luigi DAG (fmask → gqa → s2cloudless per granule,
/root/reference/eugl/gqa/tasks.py:90-106) collapses into a single
Catalyst plan: extract → heuristics → langid → perplexity → scrub →
verdict → qa struct. Catalyst is the scheduler; stage *gating* order
is ours (cheap native rules first, expensive UDFs only on survivors —
the land/ocean cheap-first branch of eugl/gqa/tasks.py:152-163).

Gating works by feeding NULL into a UDF for rows already dropped:
pandas UDFs are evaluated for every row of a batch regardless of
`when()` branches, so we mask the *input*, which short-circuits the
vectorized kernels to NaN at near-zero cost and keeps one plan (no
row-set splits, no union).

Drop-reason precedence = constants.DROP_PRECEDENCE; a metric is
exposed in the qa struct only if evaluation reached its rule, matching
the oracle exactly (NaN-doc pattern of
/root/reference/eugl/gqa/geometric_utils.py:434-450).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eugl_spark import constants as C
from eugl_spark.functions import extract as X
from eugl_spark.functions import heuristics as H
from eugl_spark.functions import scrub as S
from eugl_spark.models.langid import langid_udf
from eugl_spark.models.perplexity import perplexity_udf

# rule index in DROP_PRECEDENCE at which each qa metric is computed
_METRIC_RULE_IDX = {
    "n_chars": 1, "symbol_ratio": 3, "n_words": 4, "mean_word_len": 5,
    "dup_line_fraction": 6, "detected_lang": 7, "langid_confidence": 7,
    "stopword_fraction": 8, "avg_nll": 9,
}
_REASON_IDX = {r: i for i, r in enumerate(C.DROP_PRECEDENCE)}


def host(url: Column) -> Column:
    # try_parse_url: Common-Crawl urls include malformed ones; ANSI
    # parse_url would fail the whole job on the first bad row.
    return F.try_parse_url(url, F.lit("HOST"))


def salted_bucket(url: Column) -> Column:
    """Stable output-partition key: hash of url-host.

    At 10^12 docs a single hot host (en.wikipedia.org) would own an
    entire partition; bucket = pmod(xxhash64(host), N_BUCKETS) spreads
    hosts, and `salt` (below) additionally splits rows *within* a hot
    host across shuffle partitions (north_rule skew clause).
    """
    return F.pmod(F.xxhash64(host(url)), F.lit(C.N_BUCKETS)).cast("int")


def salt(url: Column) -> Column:
    return F.pmod(F.xxhash64(url), F.lit(C.SALT_FACTOR)).cast("int")


def _first_reason(*pairs: tuple[Column, str]) -> Column:
    """when-chain: first failing rule wins (DROP_PRECEDENCE order)."""
    expr = F.lit(None).cast("string")
    for cond, reason in reversed(pairs):
        expr = F.when(cond, F.lit(reason)).otherwise(expr)
    return expr


def apply_pipeline(pages: DataFrame, with_udf_stages: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, text, lang, ...) → labeled documents.

    Returns the input columns (minus html — the fat column is pruned
    after extraction) plus text_extracted, scrubbed_text, qa struct,
    keep, drop_reason, bucket.
    """
    t = X.text_extracted(F.col("text"), F.col("html"))
    df = pages.withColumn("text_extracted", t)

    te = F.col("text_extracted")
    toks = H.tokens(te)
    df = (
        df.withColumn("_toks", toks)
        .withColumn("_n_chars", H.n_chars(te))
        .withColumn("_symbol_ratio", H.symbol_ratio(te))
        .withColumn("_n_words", H.n_words(F.col("_toks")))
        .withColumn("_mean_word_len", H.mean_word_len(F.col("_toks")))
        .withColumn("_dup_line_fraction", H.dup_line_fraction(te))
        .withColumn("_stopword_fraction", H.stopword_fraction(F.col("_toks")))
    )

    pre_reason = _first_reason(
        (te.isNull() | (te == ""), "no_content"),
        (F.col("_n_chars") < C.MIN_CHARS, "too_short"),
        (F.col("_n_chars") > C.MAX_CHARS, "too_long"),
        (F.col("_symbol_ratio") > C.MAX_SYMBOL_RATIO, "symbol_ratio"),
        (F.col("_n_words") < C.MIN_WORDS, "too_few_words"),
        (
            (F.col("_mean_word_len") < C.MIN_MEAN_WORD_LEN)
            | (F.col("_mean_word_len") > C.MAX_MEAN_WORD_LEN),
            "word_length",
        ),
        (F.col("_dup_line_fraction") > C.MAX_DUP_LINE_FRACTION, "repetition"),
    )
    df = df.withColumn("_pre_reason", pre_reason)

    if with_udf_stages:
        gate1 = F.col("_pre_reason").isNull()
        df = df.withColumn(
            "_lid",
            langid_udf(
                F.when(gate1, F.concat_ws(" ", F.col("_toks"))).otherwise(
                    F.lit(None)
                )
            ),
        )
        lang_ok = F.col("_lid.lang").isin(*sorted(C.TARGET_LANGS))
        reason2 = F.coalesce(
            F.col("_pre_reason"),
            F.when(~lang_ok, F.lit("langid")),
            F.when(
                F.col("_stopword_fraction") < C.MIN_STOPWORD_FRACTION,
                F.lit("stopword_fraction"),
            ),
        )
        df = df.withColumn("_reason2", reason2)
        gate2 = F.col("_reason2").isNull()
        df = df.withColumn(
            "_avg_nll",
            perplexity_udf(
                F.when(gate2, F.col("_toks")).otherwise(F.lit(None)),
                F.col("_lid.lang"),
            ),
        )
        drop_reason = F.coalesce(
            F.col("_reason2"),
            F.when(
                ~F.isnan(F.col("_avg_nll"))
                & (F.col("_avg_nll") > C.MAX_AVG_NLL),
                F.lit("perplexity"),
            ),
        )
    else:
        df = (
            df.withColumn(
                "_lid",
                F.struct(
                    F.lit(None).cast("string").alias("lang"),
                    F.lit(None).cast("double").alias("confidence"),
                ),
            )
            .withColumn("_avg_nll", F.lit(None).cast("double"))
            .withColumn("_reason2", F.col("_pre_reason"))
        )
        drop_reason = F.col("_pre_reason")

    df = df.withColumn("drop_reason", drop_reason)
    df = df.withColumn("keep", F.col("drop_reason").isNull())

    # metric visibility: shown only if evaluation reached its rule
    reached = F.coalesce(
        F.element_at(
            F.create_map(
                *[
                    x
                    for r, i in _REASON_IDX.items()
                    for x in (F.lit(r), F.lit(i))
                ]
            ),
            F.col("drop_reason"),
        ),
        F.lit(len(C.DROP_PRECEDENCE)),
    )

    def vis(metric: str, col: Column) -> Column:
        return F.when(reached >= _METRIC_RULE_IDX[metric], col)

    scrubbed = F.when(
        F.col("drop_reason").eqNullSafe(F.lit("no_content")),
        F.lit(None).cast("string"),
    ).otherwise(S.scrub(te))

    qa = F.struct(
        F.struct(
            vis("n_chars", F.col("_n_chars")).alias("n_chars"),
            vis("symbol_ratio", F.col("_symbol_ratio")).alias("symbol_ratio"),
            vis("n_words", F.col("_n_words")).alias("n_words"),
            vis("mean_word_len", F.col("_mean_word_len")).alias("mean_word_len"),
            vis("dup_line_fraction", F.col("_dup_line_fraction")).alias(
                "dup_line_fraction"
            ),
            vis("stopword_fraction", F.col("_stopword_fraction")).alias(
                "stopword_fraction"
            ),
        ).alias("heuristics"),
        F.struct(
            vis("detected_lang", F.col("_lid.lang")).alias("lang"),
            vis("langid_confidence", F.col("_lid.confidence")).alias(
                "confidence"
            ),
        ).alias("langid"),
        F.struct(
            vis("avg_nll", F.col("_avg_nll")).alias("avg_nll")
        ).alias("perplexity"),
        F.struct(
            S.scrub_changed(te, scrubbed).alias("changed")
        ).alias("scrub"),
    )

    return df.select(
        "url",
        "warc_ts",
        "lang",
        "text_extracted",
        scrubbed.alias("scrubbed_text"),
        qa.alias("qa"),
        "keep",
        "drop_reason",
        salted_bucket(F.col("url")).alias("bucket"),
    )
