"""Physical-plan quality gates (SURVEY.md §4): the optimizations we
rely on at 100 TB must actually appear in the executed plan — filter
pushdown to the parquet scan, column pruning of the fat html column,
broadcast joins for small dims, no UDF evaluation for keep-only
consumers, a single Python boundary in the pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eugl_spark.pipeline import apply_pipeline
from eugl_spark.plans.queries import REGISTRY


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_documents(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("lang") == "en")
        .select("doc_id", "n_chars")
    )
    p = _plan(df)
    assert "PushedFilters" in p and "lang" in p.split("PushedFilters")[1][:120]
    read = p.split("ReadSchema")[1][:160]
    assert "text" not in read, read  # fat column pruned


def test_pipeline_single_python_boundary(spark, pages_path):
    out = apply_pipeline(spark.read.parquet(pages_path).drop("_case"))
    p = _plan(out.agg(F.sum(F.col("keep").cast("long"))))
    assert p.count("ArrowEvalPython") == 1, p.count("ArrowEvalPython")
    assert "BatchEvalPython" not in p  # no row-at-a-time Python


def test_pipeline_prunes_for_light_consumers(spark, pages_path):
    pages = spark.read.parquet(pages_path).drop("_case")
    # bucket/url-only consumer must not decode text/html or run Python
    light = apply_pipeline(pages, repartition_to=0).select("url", "bucket")
    p = _plan(light)
    assert "ArrowEvalPython" not in p
    read = p.split("ReadSchema")[1][:200]
    assert "html" not in read and "text" not in read, read


def test_broadcast_join_small_dims(spark, sf_dir):
    p = _plan(REGISTRY["tpch_q5_local_volume"].spark(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 3, p.count("BroadcastHashJoin")


def test_semi_anti_join_strategies(spark, sf_dir):
    p = _plan(REGISTRY["semi_join_active_suppliers"].spark(spark, sf_dir))
    assert "LeftSemi" in p
    p = _plan(REGISTRY["anti_join_idle_customers"].spark(spark, sf_dir))
    assert "LeftAnti" in p


def test_whole_stage_codegen_in_heuristics(spark, sf_dir):
    # compact plan marks codegen stages with "*(n)"
    p = _plan(REGISTRY["qf_verdict"].spark(spark, sf_dir))
    assert "*(1)" in p


@pytest.mark.parametrize("name", ["qf_token_stats", "qf_fingerprint"])
def test_scan_prunes_unused_columns(spark, sf_dir, name):
    p = _plan(REGISTRY[name].spark(spark, sf_dir))
    read = p.split("ReadSchema")[1][:200]
    assert "source" not in read, read


def test_top_bigrams_is_take_ordered(spark, sf_dir):
    # global top-k must plan as per-partition top-k + driver merge,
    # never a partition-less row_number window (one-task funnel)
    p = _plan(REGISTRY["text_top_bigrams"].spark(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "Window" not in p


def test_asof_join_has_no_join(spark, sf_dir):
    # J6 as-of: single-pass per-user window — a clicks×views join
    # multiplies rows per hot user
    p = _plan(REGISTRY["events_asof_last_view"].spark(spark, sf_dir))
    assert "Join" not in p
    assert "Window" in p


def test_verdict_gate_single_python_boundary(spark, sf_dir):
    p = _plan(REGISTRY["pipeline_docs_verdict"].spark(spark, sf_dir))
    assert p.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in p


def test_once_barrier_keeps_tokenizer_out_of_lambdas(spark):
    """_once must confine an expensive expression to a Generate node.
    Without it, projection collapse inlines the tokenizer into the
    size() filter and PER element_at inside gram lambdas — the
    interpreted HOF path then re-runs the regex once per array element
    (a 1 MB doc: >20 min, killed; with the barrier: seconds)."""
    from eugl_spark.plans.queries import _once

    df = spark.createDataFrame([("a b c",)], "text string")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)
    out = (
        df.select(_once(toks).alias("toks"))
        .filter(F.size("toks") >= 3)
        .select(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 2),
                lambda i: F.element_at("toks", i),
            ).alias("g")
        )
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    gen = [ln for ln in plan.splitlines() if "Generate" in ln]
    rest = [ln for ln in plan.splitlines() if "Generate" not in ln]
    assert any("regexp_extract_all" in ln for ln in gen), plan
    assert not any("regexp_extract_all" in ln for ln in rest), plan
    assert out.collect()[0].g == ["a"]


def test_capstone_base_single_tokenization_plan(spark):
    """The round-4 invariant behind corpus_build_train: verdict
    metrics, shingles, 5-grams and ntok all derive from ONE tokenizer
    run. Structurally: the base frame's plan holds regexp_extract_all
    only inside the _once Generate barrier (once), and the shingle /
    decontamination stages built FROM the token column introduce no
    tokenizer at all."""
    from eugl_spark.functions import heuristics as H
    from eugl_spark.plans.queries import (
        _decontaminate_from,
        _once,
        _qf_metrics_cols,
        _qf_verdict_cols,
        _shingles_from,
        _split_col,
    )

    df = spark.createDataFrame(
        [(1, "en", "s1", "the cat sat on the mat today")],
        "doc_id long, lang string, source string, text string",
    )
    base = _qf_verdict_cols(
        _qf_metrics_cols(df, _once(H.tokens(F.col("text"))))
    ).select(
        "doc_id",
        "source",
        _split_col().alias("split"),
        F.col("_toks").alias("toks"),
        F.col("nw").alias("ntok"),
        "keep",
    )
    # the TOKENIZER is regexp_extract_all over lower(text) — that
    # needle distinguishes it from regexp_count's internal
    # regexp_extract_all rewrite (the symbol counter, a different
    # regex over raw text)
    needle = "regexp_extract_all(lower("
    plan = base._jdf.queryExecution().optimizedPlan().toString()
    tok_lines = [ln for ln in plan.splitlines() if needle in ln]
    assert len(tok_lines) == 1 and "Generate" in tok_lines[0], plan

    for stage in (
        _shingles_from(base.select("doc_id", "toks")),
        _decontaminate_from(base.select("doc_id", "split", "toks")),
    ):
        p = stage._jdf.queryExecution().optimizedPlan().toString()
        # the single Generate from base is allowed; NO additional
        # tokenizer may appear outside it
        extra = [
            ln
            for ln in p.splitlines()
            if needle in ln and "Generate" not in ln
        ]
        assert not extra, p


def test_repetition_profile_nwc_below_explode(spark, sf_dir):
    """qf_repetition_profile's nwc (an O(|toks|) interpreted aggregate
    HOF) must be an attribute BELOW the gram-union explode. A
    multi-expression select around explode() parks its non-generator
    expressions in the Project ABOVE the Generate — re-running the
    aggregate once per exploded gram, O(n²) per doc (a 10 MB page hung
    for minutes until .explain exposed the placement)."""
    df = REGISTRY["qf_repetition_profile"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    lines = plan.splitlines()
    agg_at = [i for i, ln in enumerate(lines) if "aggregate(" in ln]
    gen_at = [
        i
        for i, ln in enumerate(lines)
        if "Generate explode(concat(" in ln
    ]
    assert agg_at and gen_at, plan
    # optimizedPlan prints top-down: deeper (earlier-executed) nodes
    # have LARGER line indices, so "below the explode" = after it
    assert min(agg_at) > max(gen_at), plan


def test_outlinks_partial_agg_no_python(spark):
    """The edge-list groupBy partially aggregates map-side (two
    HashAggregate levels around one exchange) and the whole extraction
    is JVM-side — no Python boundary anywhere."""
    from eugl_spark.plans.queries import REGISTRY, ensure_link_corpus

    ensure_link_corpus()
    p = _plan(REGISTRY["crawl_outlinks"].spark(spark, ""))
    assert "EvalPython" not in p
    assert p.count("HashAggregate") >= 2
    assert "Exchange" in p


def test_frontier_broadcast_anti_join(spark):
    """The crawled-host dim joins as a broadcast LeftAnti — the
    frontier never shuffles the edge list against the dim."""
    from eugl_spark.plans.queries import REGISTRY, ensure_link_corpus

    ensure_link_corpus()
    p = _plan(REGISTRY["crawl_frontier"].spark(spark, ""))
    assert "LeftAnti" in p and "BroadcastHashJoin" in p


def test_anchor_text_window_over_aggregate(spark):
    """The mode window must run over the (host, text) AGGREGATE: the
    plan's Window sits above a HashAggregate pair, and no Python."""
    from eugl_spark.plans.queries import REGISTRY, ensure_link_corpus

    ensure_link_corpus()
    p = _plan(REGISTRY["crawl_anchor_text"].spark(spark, ""))
    assert "EvalPython" not in p
    assert "Window" in p
    # aggregation happens below the window operator in the plan text
    assert p.index("Window") < p.index("HashAggregate")


def test_span_coverage_no_cartesian(spark, sf_dir):
    """Candidate generation is an equi-join on the gram hash — never a
    doc×doc product."""
    from eugl_spark.plans.queries import REGISTRY

    p = _plan(REGISTRY["dedup_span_coverage"].spark(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_path_rules_broadcast_array_gate(spark):
    """The robots path-rule dim joins as ONE broadcast hash join (one
    rules-array row per host — page rows never multiply by rule
    count), the verdict is a native array expression (no Python
    boundary beyond the pipeline's single kernel), and the fat html
    column never enters a shuffle for the gate."""
    from eugl_spark.functions.robots import parse_robots_path_rules

    robots = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /p/\nAllow: /p/ok/\n")],
        "host string, body string",
    )
    pages = spark.createDataFrame(
        [("https://h.example/p/x", None, "text body", "en", None)],
        "url string, html binary, text string, lang string, "
        "warc_ts timestamp",
    )
    out = apply_pipeline(
        pages,
        path_rules=parse_robots_path_rules(robots),
        repartition_to=0,
    )
    p = _plan(out)
    assert p.count("BroadcastHashJoin") == 1
    # exactly the pipeline's one Arrow boundary — the gate adds none
    assert p.count("ArrowEvalPython") == 1
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_boilerplate_zero_shuffle_zero_python(spark):
    """The block classifier's 100-TB claim, pinned: one scan, per-row
    array lambdas only — no Exchange, no Python boundary, no join."""
    p = _plan(REGISTRY["qf_boilerplate_blocks"].spark(spark, ""))
    assert "Exchange" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "Join" not in p and "CartesianProduct" not in p


def test_clean_corpus_single_arrow_boundary_no_shuffle(spark):
    """The composed capstone stays one scan with exactly ONE Arrow
    boundary (the NFC kernel); everything else native, no Exchange."""
    p = _plan(REGISTRY["qf_clean_corpus"].spark(spark, ""))
    assert "Exchange" not in p, p
    assert p.count("ArrowEvalPython") == 1, p.count("ArrowEvalPython")
    assert "BatchEvalPython" not in p


def test_normalize_unicode_single_arrow_boundary(spark):
    p = _plan(REGISTRY["qf_normalize_unicode"].spark(spark, ""))
    assert "Exchange" not in p, p
    assert p.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in p


def test_remove_spans_no_cartesian_no_token_explode(spark, sf_dir):
    """Removal never forms a doc×doc product and never routes through
    Python; since round 7 the covered-position cut is a per-doc
    array_except over the aggregated hit frame — the plan must carry
    the array cut and must NOT re-grow a per-token-position explode
    (posexplode of `toks`) or the old (doc_id, p) anti-join, both of
    which shuffled O(corpus tokens) rows."""
    from eugl_spark.plans.queries import REGISTRY

    p = _plan(REGISTRY["dedup_remove_spans"].spark(spark, sf_dir))
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
    assert "array_except" in p, p
    assert "LeftAnti" not in p, p  # the token-position anti-join is gone
    # the only generator allowed on the post-hit path is the gram
    # builder inside _span_hits_from_toks (runs before the hit frame's
    # checkpoint, so it is not visible in this post-checkpoint plan)
    assert "posexplode" not in p, p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


def test_shard_sequences_window_partitioned_by_shard(spark, sf_dir):
    """The within-shard rank must be a PARTITIONED window (one sort
    task per shard — the scale contract of shard_sequences), never an
    empty-partition global sort over the sequence axis. The packing
    stage underneath keeps its own tiny offsets window; the gate here
    is that no window ORDERS ON the shuffle key k without a shard
    partition."""
    from eugl_spark.plans.queries import REGISTRY

    df = REGISTRY["corpus_shard_sequences"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    hit = False
    for m in re.finditer(r"Window \[.*?windowspecdefinition\((.*?)\)", plan):
        frag = m.group(0)
        # \b is not enough: 'bkt#7' (the packing buckets) contains
        # 'k#' as a substring — anchor on a non-letter before the k
        if re.search(r"(?<![a-z])k#\d", frag):
            hit = True
            assert "shard#" in frag, f"unpartitioned shard window: {frag}"
    assert hit, f"no shard-rank window found:\n{plan}"
