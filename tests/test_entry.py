"""Tier-3: the driver contract — every queries() entry vs its DuckDB
oracle at sf0.01 (row count + columns + order-insensitive values)."""

from __future__ import annotations

import pytest

from eugl_spark.plans.compare import duck_connection, run_one
from eugl_spark.plans.queries import REGISTRY


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_vs_oracle(spark, con, sf_dir, name):
    res = run_one(spark, con, name, sf_dir)
    assert res["rows_match"], res
    assert res["cols_match"], res
    if REGISTRY[name].sql is not None:
        assert res["values_match"], res["diff"]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


# The driver's correctness gate snapshots the first 50 registrations,
# so dict order is an external contract: every family flagship — the
# late-registered dedup/ANN/training/corpus capstones especially —
# must sit inside that window (VERDICT r3 "Next round" #1).
FLAGSHIPS = [
    "qf_verdict",
    "qf_scrub",
    "pipeline_docs_verdict",
    "pipeline_full_corpus",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_embedding_clusters",
    # ann_lsh_pairs / ann_kmeans_cells / corpus_upsample_epochs /
    # decontaminate_bloom rotated to the tail in round 6 (driver-green
    # r5; each family keeps in-window flagships — see _SNAPSHOT_TAIL)
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "ann_kmeans_topk",
    "qf_train_linear",
    "qf_linear_score",
    "corpus_token_budget",
    "corpus_mixture_sample",
    "decontaminate_train",
    "split_train_val_test",
    "text_bpe_token_stats",
    "text_tfidf_top_terms",
    # corpus_host_diversity demoted to the tail with the second
    # web-graph batch: driver-green in r03, composition-stats family
    # keeps the budget/mixture/epochs trio in-window
    "corpus_build_train",
    "events_asof_last_view",
    "sigma_clip_quantity",
    "udf_langid_documents",
    "udf_perplexity_documents",
    # round-4 additions
    "dedup_paragraphs",
    "qf_repetition_profile",
    "dsir_importance",
    "qf_ppl_buckets",
    "qf_score_calibration",
    # web-graph family (round 4, continuation)
    "crawl_outlinks",
    "graph_pagerank_hosts",
    "dedup_url_latest",
    "graph_hits_hosts",
    "crawl_anchor_text",
    "crawl_frontier",
    "dedup_span_coverage",
    "crawl_build_corpus",
    "crawl_host_quality",
    "graph_components_hosts",
    # round-6 additions: the ingestion-parse contract (first-ever
    # driver evidence) and the path-scoped robots pair
    "crawl_ingest_parse",
    "crawl_robots_paths",
    "crawl_robots_verdict",
    # round-6 continuation: the clean-corpus capstone (promoted via
    # _SNAPSHOT_PROMOTE; composes boilerplate extraction, unicode
    # normalization and the C4 line rules, so its driver row evidences
    # the whole text-hygiene chain; events_transition_matrix demoted —
    # driver-green r5)
    "qf_clean_corpus",
    # round-6 session 2: sequence packing (promoted via
    # _SNAPSHOT_PROMOTE; bpe_train_merges demoted — driver-green r5,
    # BPE family keeps apply + token stats in-window)
    "corpus_pack_sequences",
]


def test_flagships_inside_snapshot_window():
    import __spark_entry__ as e

    window = list(e.queries())[:50]
    missing = [f for f in FLAGSHIPS if f not in window]
    assert not missing, f"flagships outside the driver's first-50: {missing}"
