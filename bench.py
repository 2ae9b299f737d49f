"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line
  {"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}

--scaling: run the identical pipeline job at CPU-pinned parallelism
levels (1/4/8/32 cores; headline N→4N pair = local[1]→local[4], see
BASELINE.md for why) in cold subprocesses, compute throughput scaling
efficiency, and write BENCH/BASELINE.md.

--pipeline-only --cores N / --dedup-only --cores N: internal child
modes for --scaling; print "DOCS n SECS s" / "DSECS s" for the parent
to parse. Each N-vs-4N pair runs as two CONCURRENT CPU-pinned children
(see main_scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "qf_verdict",
    "qf_keep_rate_by_source",
    "qf_scrub",
    "pipeline_docs_verdict",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_simhash",
    "dedup_clusters_lsh",
    "dedup_embedding_clusters",
    "ann_topk_bruteforce",
    "ann_lsh_pairs",
    "ann_ivf_topk",
    "ann_kmeans_cells",
    "ann_kmeans_topk",
    "events_asof_last_view",
    "events_sessionize",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_volume",
    "window_running_total",
    "corpus_mixture_sample",
    "corpus_build_train",
    "qf_repetition_profile",
    "dsir_importance",
    "decontaminate_bloom",
    "qf_ppl_buckets",
    "qf_score_calibration",
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
    "bpe_train_merges",
    "bpe_apply_token_stats",
    "crawl_ingest_parse",
    "crawl_robots_paths",
    "crawl_robots_verdict",
    "dedup_url_canonical",
    # round-6 session 3: exact-substring removal (the act half of
    # dedup_span_coverage — same gram stages plus the position
    # anti-join and per-doc reassembly), the pack→shuffle→shard tail,
    # and the one-scan dataset card
    "dedup_remove_spans",
    "corpus_pack_sequences",
    "corpus_shard_sequences",
    "corpus_datasheet",
    "corpus_pack_payload",
    "decontaminate_fuzzy",
    "ann_pq_codes",
    "ann_pq_topk",
]


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def corpus_path(sf: float) -> str:
    """Deterministic pages corpus sized to the scale factor (cached)."""
    n = max(2000, int(sf * 1_000_000))
    path = os.path.join(tempfile.gettempdir(), f"eugl_bench_pages_{n}.parquet")
    if not os.path.exists(path):
        from eugl_spark.corpus import write_pages_parquet

        # write-then-rename: concurrent processes may race on the
        # shared cached path (same fix as documents_path)
        tmp = f"{path}.{os.getpid()}.tmp"
        write_pages_parquet(tmp, n_rows=n, seed=42)
        os.replace(tmp, path)
    return path


def _force(df) -> int:
    """Evaluate EVERY output cell of a plan and return its row count.

    .count() is NOT an honest bench sink: Catalyst prunes columns the
    count doesn't need, so a projection-only plan (qf_scrub, the C4
    line filter, parse_crawl_records…) collapses to a bare scan —
    measured 12× under-report on the sf-scaled C4 row (0.13s counted
    vs 1.6s evaluated) — and even a groupBy().agg() plan drops the
    aggregate expressions, counting only the grouping keys. One
    count+bit_xor(xxhash64(*cols)) aggregate forces every cell in a
    single pass (bit_xor, not sum: ANSI mode overflows on summed
    hashes). Falls back to count() for output types xxhash64 can't
    hash (none in the registry today)."""
    from pyspark.sql import functions as F

    try:
        return int(
            df.agg(
                F.count("*").alias("n"),
                F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
            ).collect()[0]["n"]
        )
    except Exception:
        return df.count()


def run_pipeline_once(spark, pages_path: str) -> int:
    """Force full pipeline evaluation; returns n_docs processed."""
    from pyspark.sql import functions as F

    from eugl_spark.pipeline import apply_pipeline

    pages = spark.read.parquet(pages_path).drop("_case")
    out = apply_pipeline(pages)
    row = out.agg(
        F.count("*").alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.sum(F.length("scrubbed_text")).alias("bytes"),
    ).collect()[0]
    return int(row["n"])


def warc_corpus_dir(sf: float) -> str:
    """Multi-record WET/WARC files for the ingestion bench (cached):
    sf-scaled record count spread over many files — the axis real
    crawl dumps parallelize on."""
    n_files = max(8, int(sf * 400))
    recs_per_file = 50
    out = os.path.join(
        tempfile.gettempdir(), f"eugl_warc_{n_files}x{recs_per_file}"
    )
    if os.path.exists(out):
        return out
    # pid-suffixed temp dir (the file fixtures' recipe): two
    # concurrent bench processes racing past the exists() check must
    # not collide on one shared tmp name — and os.replace of a
    # DIRECTORY fails when the destination exists, so the loser of
    # the publish race discards its copy instead (ADVICE r4)
    tmp = f"{out}.{os.getpid()}.tmp"
    os.makedirs(tmp, exist_ok=True)
    words = ("the water of time is a question for the people and the "
             "day was good for all of them there in the house ").split()
    for f in range(n_files):
        parts = []
        for r in range(recs_per_file):
            body = " ".join(
                words[(f + r + k) % len(words)] for k in range(160)
            ).encode()
            parts.append(
                (
                    f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                    f"WARC-Target-URI: https://w{f}.example/p/{r}\r\n"
                    f"WARC-Date: 2024-03-01T12:00:00Z\r\n"
                    f"Content-Length: {len(body)}\r\n\r\n"
                ).encode()
                + body
            )
        with open(os.path.join(tmp, f"c{f:04d}.warc"), "wb") as fh:
            fh.write(b"\r\n\r\n".join(parts) + b"\r\n\r\n")
    try:
        os.replace(tmp, out)
    except OSError:
        if not os.path.exists(out):  # lost the race → winner's copy
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def warc_gz_corpus_dir(sf: float) -> str:
    """Per-record-gzip-member twin of warc_corpus_dir (the framing
    real Common Crawl actually ships): same record content, each
    record its own gzip member, one .warc.gz per plain file."""
    import gzip

    src = warc_corpus_dir(sf)
    out = f"{src}_gz"
    if os.path.exists(out):
        return out
    from eugl_spark.sources.warc import _split_blob_exact

    tmp = f"{out}.{os.getpid()}.tmp"
    os.makedirs(tmp, exist_ok=True)
    for name in os.listdir(src):
        with open(os.path.join(src, name), "rb") as fh:
            recs = _split_blob_exact(fh.read())
        with open(os.path.join(tmp, name + ".gz"), "wb") as fh:
            fh.write(b"".join(gzip.compress(r + b"\r\n\r\n") for r in recs))
    try:
        os.replace(tmp, out)
    except OSError:
        if not os.path.exists(out):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def capstone_sf1_dir(mult: int = 10) -> str:
    """A 10×-scale documents table for the capstone bench (cached).

    Deterministic upscale of the driver's sf0.1 documents table —
    same shape, 10× rows (sf1.0-equivalent). Replica k of a doc gets a
    per-replica salt word spliced in every 5 tokens, which destroys
    most 3-gram shingles across replicas: replicas are genuinely
    DISTINCT documents (not one giant near-dup family), so the
    capstone's dedup/decontaminate/budget stages do representative
    work rather than clustering a synthetic 10-way dup explosion.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    # cache key includes the SOURCE row count (the sibling caches'
    # staleness rule): a regenerated or re-pointed SF_DIR must not
    # silently reuse an upscale of different data
    src_n = pq.read_metadata(
        os.path.join(SF_DIR, "documents.parquet")
    ).num_rows
    out_dir = os.path.join(
        tempfile.gettempdir(), f"eugl_capstone_x{mult}_{src_n}"
    )
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(dst):
        return out_dir

    src = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    pdf = src.to_pandas()
    parts = []
    for k in range(mult):
        rep = pdf.copy()
        rep["doc_id"] = rep["doc_id"] + k * 10_000_000
        if k > 0:
            salt = f"zq{k}x"

            def splice(t, _s=salt):
                if t is None:
                    return None
                w = t.split(" ")
                return " ".join(
                    tok for i, g in enumerate(w) for tok in ([g, _s] if i % 5 == 4 else [g])
                )

            rep["text"] = rep["text"].map(splice)
            if "n_chars" in rep.columns:
                rep["n_chars"] = rep["text"].map(lambda t: len(t) if t else 0)
        parts.append(rep)
    import pandas as pd

    big = pd.concat(parts, ignore_index=True)
    os.makedirs(out_dir, exist_ok=True)
    tmp = f"{dst}.{os.getpid()}.tmp"
    pq.write_table(
        pa.Table.from_pandas(big, schema=src.schema, preserve_index=False),
        tmp,
        row_group_size=8192,
    )
    os.replace(tmp, dst)
    print(f"capstone_sf1: {len(big)} docs at {out_dir}", file=sys.stderr)
    return out_dir


def link_scaled_path(n_rows: int, n_hosts: int = 2000) -> str:
    """Scaled link corpus for the web-graph bench jobs, cached by
    generator-source hash (the registry fixture's recipe) + row count
    + host cardinality; a different seed than the fixture so no cache
    aliasing. n_hosts=2000 (vs the fixture's 60) so the GRAPH scales
    with the corpus — a 60-node rank frame would make the pagerank
    bench measure only edge extraction."""
    import tempfile

    from eugl_spark import corpus

    # import-time version (see corpus._SRC_VERSION): call-time file
    # hashing let a stale loaded module write to the new path
    ver = corpus._SRC_VERSION
    p = os.path.join(
        tempfile.gettempdir(),
        f"eugl_link_scaled_{ver}_{n_rows}_h{n_hosts}.parquet",
    )
    if not os.path.exists(p):
        tmp = f"{p}.{os.getpid()}.tmp"
        corpus.write_link_pages_parquet(
            tmp, n_rows=n_rows, seed=11, n_hosts=n_hosts
        )
        os.replace(tmp, p)
        print(f"link_scaled: {n_rows} pages at {p}", file=sys.stderr)
    return p


def _scaled_fixture(stem: str, writer: str, n_rows: int, seed: int) -> str:
    """Generic scaled-fixture cache (the link_scaled_path recipe):
    keyed on import-time generator version + row count, written
    beside-then-renamed."""
    import tempfile

    from eugl_spark import corpus

    ver = corpus._SRC_VERSION
    p = os.path.join(
        tempfile.gettempdir(), f"eugl_{stem}_scaled_{ver}_{n_rows}.parquet"
    )
    if not os.path.exists(p):
        tmp = f"{p}.{os.getpid()}.tmp"
        getattr(corpus, writer)(tmp, n_rows=n_rows, seed=seed)
        os.replace(tmp, p)
        print(f"{stem}_scaled: {n_rows} rows at {p}", file=sys.stderr)
    return p


def _shard_dir(single_path: str, shards: int = 24) -> str:
    """Re-lay a cached single-file fixture as a DIRECTORY of parquet
    shards (cached beside it). A one-file fixture with pyarrow's
    default single row group caps the scan at 1-3 tasks regardless of
    cores — the r6 sink fix exposed several scaled rows running 3-way
    parallel on a 32-core session. Real crawl inputs are thousands of
    shard files (the warc_corpus_dir design); the registry-scaled
    bench fixtures now match that axis."""
    import math

    import pyarrow.parquet as pq

    out = f"{single_path[: -len('.parquet')]}_sh{shards}"
    if os.path.exists(out):
        return out
    tbl = pq.read_table(single_path)
    per = max(1, math.ceil(tbl.num_rows / shards))
    tmp = f"{out}.{os.getpid()}.tmp"
    os.makedirs(tmp, exist_ok=True)
    for i in range(0, tbl.num_rows, per):
        pq.write_table(
            tbl.slice(i, per), os.path.join(tmp, f"part-{i // per:04d}.parquet")
        )
    try:
        os.replace(tmp, out)
    except OSError:
        if not os.path.exists(out):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return out


def main_bench() -> None:
    from eugl_spark.plans.queries import REGISTRY
    from eugl_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    pages = corpus_path(sf)  # generate outside the timed section
    spark = get_spark("bench", cores=CPUS, shuffle_partitions=CPUS)

    t0 = time.time()
    n_docs = run_pipeline_once(spark, pages)  # warm (JVM/Arrow spin-up)
    warm = time.time() - t0

    # Interleaved min-of-N (N=3): the shared host's throughput drifts
    # several-fold minute-to-minute, so back-to-back repeats of ONE
    # query all land in the same drift window and their min still
    # carries the window's bias — which made round-over-round per-query
    # comparison unreadable (VERDICT r3 "Next round" #4). Interleaving
    # the rounds (sweep ALL queries, then repeat the whole sweep)
    # spreads each query's samples ~minutes apart, so the per-query min
    # approximates the host's best window rather than one draw of it.
    ROUNDS = 3
    # capstone scale curve: 1× (SF_DIR) / 3× / 10× documents — a third
    # point shows whether the sub-linear 1×→10× growth is a trend or a
    # fixed-cost artifact (VERDICT r3 "Next round" #8)
    cap3, cap10 = capstone_sf1_dir(mult=3), capstone_sf1_dir(mult=10)
    # the headline docs/sec metric gets TWO interleaved slots per
    # round (6 samples total, spread across the whole bench run):
    # round 4's apparent −22% pipeline-throughput regression was host
    # weather that 3 samples couldn't separate (re-measured at
    # identical config: min 2.43s vs the 2.9-3.0s the r4 window drew)
    jobs: list[tuple[str, object]] = [
        ("qf_pipeline_full", lambda: run_pipeline_once(spark, pages))
    ]
    for name in HEADLINE:
        jobs.append(
            (
                name,
                lambda q=REGISTRY[name].spark: _force(q(spark, SF_DIR)),
            )
        )
    # paragraph dedup over the SCALED pages corpus (the registry entry
    # is pinned to the 2k-row oracle fixture; benching that would time
    # a constant-size input)
    def _para_scaled():
        from pyspark.sql import functions as F

        from eugl_spark.plans.queries import dedup_paragraphs_from

        pg = (
            spark.read.parquet(pages)
            .filter(F.col("text").isNotNull())
            .select("url", "text")
        )
        return _force(dedup_paragraphs_from(pg))

    jobs.append(("dedup_paragraphs_scaled", _para_scaled))

    # crawl ingestion: multi-record file split → header parse → count,
    # both splitter paths (native regex boundary vs spec-exact
    # Content-Length mapInPandas) over the same sf-scaled file set
    warc_dir = warc_corpus_dir(sf)

    def _ingest(split_fn):
        from eugl_spark.sources.pages import read_raw_drops
        from eugl_spark.sources.warc import parse_crawl_records

        raw = read_raw_drops(spark, warc_dir, "*.warc")
        return _force(parse_crawl_records(split_fn(raw)))

    def _ingest_native():
        from eugl_spark.sources.warc import split_warc_records

        return _ingest(split_warc_records)

    def _ingest_exact():
        from eugl_spark.sources.warc import split_warc_records_exact

        return _ingest(split_warc_records_exact)

    # compressed-path twin: same records as per-record gzip members —
    # the framing real Common Crawl ships (.warc.gz/.wet.gz)
    warc_gz_dir = warc_gz_corpus_dir(sf)

    def _ingest_gzip():
        from eugl_spark.sources.pages import read_raw_drops
        from eugl_spark.sources.warc import (
            parse_crawl_records,
            split_warc_records_exact,
        )

        raw = read_raw_drops(spark, warc_gz_dir, "*.warc.gz")
        return _force(parse_crawl_records(split_warc_records_exact(raw)))

    # mixed-drop front: plain + gz shards in one directory through
    # read_warc_drops (glob routing at the listing — one read/file)
    mixed_dir = os.path.join(
        tempfile.gettempdir(), f"eugl_warc_mixed_{os.path.basename(warc_dir)}"
    )
    if not os.path.exists(mixed_dir):
        import shutil

        tmpm = f"{mixed_dir}.{os.getpid()}.tmp"
        os.makedirs(tmpm, exist_ok=True)
        plain_files = sorted(os.listdir(warc_dir))
        for f in plain_files[: len(plain_files) // 2]:
            shutil.copy(os.path.join(warc_dir, f), tmpm)
        for f in sorted(os.listdir(warc_gz_dir))[len(plain_files) // 2 :]:
            shutil.copy(os.path.join(warc_gz_dir, f), tmpm)
        try:
            os.replace(tmpm, mixed_dir)
        except OSError:
            if not os.path.exists(mixed_dir):
                raise
            shutil.rmtree(tmpm, ignore_errors=True)

    def _ingest_mixed():
        from eugl_spark.sources.warc import (
            parse_crawl_records,
            read_warc_drops,
        )

        return _force(
            parse_crawl_records(read_warc_drops(spark, mixed_dir))
        )

    jobs.append(("warc_ingest_native", _ingest_native))
    jobs.append(("warc_ingest_exact", _ingest_exact))
    jobs.append(("warc_ingest_gzip", _ingest_gzip))
    jobs.append(("warc_ingest_mixed", _ingest_mixed))

    # web-graph ops over an sf-SCALED link corpus (the registry
    # entries are pinned to the 1.2k-row oracle fixture; these time
    # the same plans at ~40k pages/sf0.1 so the scale-shape claims —
    # map-side edge collapse, O(hosts) rank frame — are measured, not
    # asserted)
    link_scaled = _shard_dir(link_scaled_path(int(40_000 * sf / 0.1)))

    def _webgraph_scaled():
        from eugl_spark.operators.graph import pagerank
        from eugl_spark.plans.queries import link_host_edges

        pg = spark.read.parquet(link_scaled)
        edges = link_host_edges(pg).withColumnRenamed("n_links", "w")
        return _force(pagerank(edges, iters=3))

    def _collapse(pg):
        from pyspark.sql import functions as F

        return _force(
            pg.groupBy("url").agg(
                F.max("warc_ts").alias("last_ts"),
                F.count("*").alias("n_snapshots"),
                F.max_by(
                    F.length(F.col("html").cast("string")), "warc_ts"
                ).alias("last_html_len"),
            )
        )

    def _snapshot_collapse_scaled():
        return _collapse(spark.read.parquet(link_scaled))

    # durable url-bucketed layout of the SAME link corpus
    # (sources/bucketed.py): snapshot collapse is a groupBy(url) over
    # the fat html column, so the unbucketed job re-pays a full
    # fat-column shuffle EVERY run; the layout pays it once at write
    # time. `snapshot_collapse_scaled` above is the unbucketed
    # control — the delta between the two rows is the shuffle the
    # layout removes. Bucket count = CPUS (sized like shuffle
    # partitions, see bucketed.DEFAULT_BUCKETS).
    from eugl_spark.sources import bucketed as B

    bkt_path = f"{link_scaled}_bkturl{CPUS}"
    _link_df = spark.read.parquet(link_scaled)
    if not os.path.exists(bkt_path):
        import shutil

        tmp_tbl = f"bench_bkt_tmp_{os.getpid()}"
        tmpb = f"{bkt_path}.{os.getpid()}.tmp"
        B.write_bucketed(_link_df, tmp_tbl, tmpb, n_buckets=CPUS, key="url")
        B.drop_table(spark, tmp_tbl)
        try:
            os.replace(tmpb, bkt_path)
        except OSError:
            if not os.path.exists(bkt_path):
                raise
            shutil.rmtree(tmpb, ignore_errors=True)
    B.attach_bucketed(
        spark,
        "bench_link_bkt",
        bkt_path,
        B.schema_ddl(_link_df),
        n_buckets=CPUS,
        key="url",
    )

    def _snapshot_collapse_bucketed():
        return _collapse(spark.table("bench_link_bkt"))

    def _crawl_capstone_scaled():
        from eugl_spark.plans.queries import crawl_corpus_from

        pg = spark.read.parquet(link_scaled)
        return _force(crawl_corpus_from(pg, repartition_to=CPUS))

    # vocabulary-scale BPE over the REAL sf documents table: the
    # capped-frame path (deterministic top-N word frame collected
    # once, classic driver-side finish) — the registry bpe entries
    # pin k=8 full-frame correctness; this measures the scale lever
    # (VERDICT r5 weak #1: "k=256 trains in seconds at sf0.1")
    def _bpe_capped_k256():
        from pyspark.sql import functions as F

        from eugl_spark.models.bpe import train_bpe_merges

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(F.col("text"))
            .filter(F.col("text").isNotNull())
        )
        return len(train_bpe_merges(docs, k=256, max_words=5000))

    # index-driven archive selection at scale: CDXJ parse → newest
    # capture per url → coalesced byte-span plan (sources/cdx.py);
    # and the WAT sidecar link graph (sources/wat.py) — both sized to
    # the sf like the link corpus
    cdx_scaled = _shard_dir(_scaled_fixture(
        "cdxj", "write_cdxj_parquet", int(200_000 * sf / 0.1), seed=19
    ))
    wat_scaled = _shard_dir(_scaled_fixture(
        "wat", "write_wat_parquet", int(40_000 * sf / 0.1), seed=23
    ))

    def _cdx_plan_scaled():
        from eugl_spark.sources.cdx import (
            fetch_plan,
            latest_captures,
            parse_cdxj,
        )

        sel = latest_captures(parse_cdxj(spark.read.parquet(cdx_scaled)))
        return _force(fetch_plan(sel))

    def _wat_edges_scaled():
        from eugl_spark.sources.wat import parse_wat_records, wat_host_edges

        return _force(
            wat_host_edges(parse_wat_records(spark.read.parquet(wat_scaled)))
        )

    # C4 line filter and revisit resolution at sf-scaled row counts
    # (the registry entries pin tiny oracle fixtures; these time the
    # same plans at bench scale)
    c4_scaled = _shard_dir(_scaled_fixture(
        "c4", "write_c4_docs_parquet", int(40_000 * sf / 0.1), seed=41
    ))
    rv_scaled = _shard_dir(_scaled_fixture(
        "revisit", "write_revisit_parquet", int(100_000 * sf / 0.1), seed=43
    ))

    def _c4_filter_scaled():
        import eugl_spark.plans.queries as Q

        orig = Q.ensure_c4_docs
        Q.ensure_c4_docs = lambda: c4_scaled
        try:
            return _force(REGISTRY["qf_c4_line_filter"].spark(spark, ""))
        finally:
            Q.ensure_c4_docs = orig

    def _revisit_scaled():
        import eugl_spark.plans.queries as Q

        orig = Q.ensure_revisit_blobs
        Q.ensure_revisit_blobs = lambda: rv_scaled
        try:
            return _force(
                REGISTRY["crawl_revisit_resolution"].spark(spark, "")
            )
        finally:
            Q.ensure_revisit_blobs = orig

    # round-6 additions: boilerplate block classification and unicode
    # normalization (NFC pandas-UDF kernel) at sf-scaled row counts
    boiler_scaled = _shard_dir(_scaled_fixture(
        "boiler", "write_boiler_docs_parquet", int(20_000 * sf / 0.1), seed=47
    ))
    uni_scaled = _shard_dir(_scaled_fixture(
        "unicode", "write_unicode_docs_parquet", int(60_000 * sf / 0.1),
        seed=53,
    ))

    def _boiler_scaled():
        import eugl_spark.plans.queries as Q

        orig = Q.ensure_boiler_docs
        Q.ensure_boiler_docs = lambda: boiler_scaled
        try:
            return _force(REGISTRY["qf_boilerplate_blocks"].spark(spark, ""))
        finally:
            Q.ensure_boiler_docs = orig

    def _normalize_scaled():
        import eugl_spark.plans.queries as Q

        orig = Q.ensure_unicode_docs
        Q.ensure_unicode_docs = lambda: uni_scaled
        try:
            return _force(REGISTRY["qf_normalize_unicode"].spark(spark, ""))
        finally:
            Q.ensure_unicode_docs = orig

    def _clean_corpus_scaled():
        import eugl_spark.plans.queries as Q

        orig = Q.ensure_boiler_docs
        Q.ensure_boiler_docs = lambda: boiler_scaled
        try:
            return _force(REGISTRY["qf_clean_corpus"].spark(spark, ""))
        finally:
            Q.ensure_boiler_docs = orig

    def _pipeline_boiler():
        from pyspark.sql import functions as F

        from eugl_spark.pipeline import apply_pipeline

        out = apply_pipeline(
            spark.read.parquet(pages).drop("_case"), boilerplate=True
        )
        return int(
            out.agg(
                F.count("*").alias("n"),
                F.sum(F.col("keep").cast("long")).alias("kept"),
                F.sum(F.length("scrubbed_text")).alias("bytes"),
            ).collect()[0]["n"]
        )

    jobs.append(("qf_pipeline_boiler", _pipeline_boiler))
    jobs.append(("boiler_blocks_scaled", _boiler_scaled))
    jobs.append(("clean_corpus_scaled", _clean_corpus_scaled))
    jobs.append(("normalize_unicode_scaled", _normalize_scaled))
    jobs.append(("cdx_plan_scaled", _cdx_plan_scaled))
    jobs.append(("wat_edges_scaled", _wat_edges_scaled))
    jobs.append(("c4_filter_scaled", _c4_filter_scaled))
    jobs.append(("revisit_resolution_scaled", _revisit_scaled))
    jobs.append(("bpe_train_capped_k256", _bpe_capped_k256))
    jobs.append(("webgraph_pagerank_scaled", _webgraph_scaled))
    jobs.append(("snapshot_collapse_scaled", _snapshot_collapse_scaled))
    jobs.append(("snapshot_collapse_bucketed", _snapshot_collapse_bucketed))
    jobs.append(("crawl_capstone_scaled", _crawl_capstone_scaled))
    jobs.append(
        (
            "corpus_build_train_sf03",
            lambda: _force(REGISTRY["corpus_build_train"].spark(spark, cap3)),
        )
    )
    jobs.append(
        (
            "corpus_build_train_sf1",
            lambda: _force(REGISTRY["corpus_build_train"].spark(spark, cap10)),
        )
    )
    # second headline slot at the sweep's far end (see the list head)
    jobs.append(
        ("qf_pipeline_full#b", lambda: run_pipeline_once(spark, pages))
    )

    samples: dict[str, list[float]] = {name: [] for name, _ in jobs}
    for _ in range(ROUNDS):
        for name, fn in jobs:
            t0 = time.time()
            fn()
            samples[name].append(time.time() - t0)
    samples["qf_pipeline_full"] += samples.pop("qf_pipeline_full#b")

    timings = {n: round(min(s), 3) for n, s in samples.items()}
    medians = {n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items()}
    # drift indicator: per-query max/min spread across the interleaved
    # rounds — ≈1 means a quiet host (mins are trustworthy), ≫1 means
    # the box was noisy and cross-round deltas under ~the spread are
    # weather, not engine
    spreads = sorted(max(s) / min(s) for s in samples.values())
    drift = {
        "per_query_spread_median": round(spreads[len(spreads) // 2], 3),
        "per_query_spread_max": round(spreads[-1], 3),
        "rounds": ROUNDS,
        "scheme": "interleaved",
    }

    # headline_total = the sf0.1 suite only; the 3×/10× capstones are
    # reported per-query but would swamp (and re-scale) the total
    _scaled = {"corpus_build_train_sf03", "corpus_build_train_sf1"}
    total = round(
        sum(v for k, v in timings.items() if k not in _scaled), 3
    )
    docs_per_sec = round(n_docs / timings["qf_pipeline_full"], 1)
    # The driver records only the LAST 2000 chars of stdout; round 4's
    # artifact lost the per-query mins because the full (mins +
    # medians) line overflowed that window (VERDICT r4 "What's wrong"
    # #2). Emit a COMPACT single line — per-query MINS (the
    # round-over-round comparison numbers) at 2dp, no medians — and
    # write the complete artifact (mins, medians, raw samples, drift)
    # to BENCH/latest_full.json, which is committed per round.
    full = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
        "drift": drift,
        "sf": sf,
        "pipeline_docs": n_docs,
        "pipeline_docs_per_sec": docs_per_sec,
        "pipeline_warm_first_run_sec": round(warm, 3),
        "cores": CPUS,
        # round 6: the per-query sink changed from .count() to a
        # full-evaluation hash aggregate (_force) — projection-only
        # and agg-expression work is now actually timed, so affected
        # rows read HIGHER than r5 by construction, not regression
        "sink": "count+bit_xor(xxhash64(*cols)) full evaluation",
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/latest_full.json", "w") as f:
        json.dump(full, f, indent=1)
    compact = dict(full)
    del compact["samples"]
    compact["queries"] = {n: round(v, 2) for n, v in timings.items()}
    del compact["queries_median"]
    compact["full"] = "BENCH/latest_full.json"
    line = json.dumps(compact)
    if len(line) > 1950:  # belt-and-braces: never overflow the window
        del compact["drift"]
        line = json.dumps(compact)
    # the registry outgrew the window once (72 rows = 2.8k chars, and
    # the driver records only the LAST 2000 chars of stdout — a long
    # line loses its HEAD, i.e. the opening brace): shed the fastest
    # rows until the line fits; the complete map is in the artifact
    while len(line) > 1950 and compact["queries"]:
        fastest = min(compact["queries"], key=compact["queries"].get)
        del compact["queries"][fastest]
        compact["queries_omitted"] = compact.get("queries_omitted", 0) + 1
        line = json.dumps(compact)
    print(line)
    spark.stop()


def documents_path(sf: float) -> str:
    """Synthetic documents table for the dedup scaling job (cached).

    Two sizing constraints, both measured:
    * big enough that steady-state shuffle/kernel work dominates the
      ~1s of fixed per-job cost (scheduling, checkpoint boundaries,
      final collect) — at 100k tiny-vocab docs the 1-core job ran ~4s
      and Amdahl capped the 1→4 ratio at ~2.3× regardless of engine;
    * realistic DIVERSITY: the pages corpus draws from a 48-word
      vocabulary (≤768 possible 3-gram shingles), so at 300k docs the
      MinHash bands degenerate into a quadratic all-pairs join (176s
      at 1 core) — a self-similarity level no real crawl has. Here
      each doc samples 60 words from a 20k-word vocabulary, with ~5%
      planted near-dup copies (2-word edits), so band collisions are
      dominated by true duplicates.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = max(150_000, int(sf * 1_500_000))
    path = os.path.join(tempfile.gettempdir(), f"eugl_bench_docs2_{n}.parquet")
    if not os.path.exists(path):
        import numpy as np

        rng = np.random.RandomState(13)

        def word(k: int) -> str:
            s = ""
            for _ in range(4):
                s += chr(97 + k % 26)
                k //= 26
            return s

        vocab = np.asarray([word(i) for i in range(20_000)], dtype=object)
        idx = rng.randint(0, len(vocab), size=(n, 60))
        dup = np.flatnonzero(rng.rand(n) < 0.05)
        dup = dup[dup > 0]
        src_of = rng.randint(0, n, size=len(dup))
        idx[dup] = idx[src_of]
        edit_pos = rng.randint(0, 60, size=(len(dup), 2))
        for r, (p1, p2) in zip(dup, edit_pos):
            idx[r, p1] = rng.randint(0, len(vocab))
            idx[r, p2] = rng.randint(0, len(vocab))
        texts = [" ".join(vocab[row]) for row in idx]
        tbl = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * n, pa.string()),
                "source": pa.array(
                    [f"s{i % 50}" for i in range(n)], pa.string()
                ),
            }
        )
        tmp = f"{path}.{os.getpid()}.tmp"
        pq.write_table(tbl, tmp, row_group_size=8192)
        os.replace(tmp, path)
    return path


def main_pipeline_only(cores: int) -> None:
    from eugl_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    # 4× the headline corpus: the kernel pipeline finishes 100k docs in
    # ~3s at 32 cores, where per-job fixed costs (stage setup, python
    # worker spin-up) would dominate the N-vs-4N ratio; the scaling
    # criterion is about steady-state throughput, so measure at a size
    # that amortizes them. Same input at both parallelism levels.
    pages = corpus_path(sf * 4)
    spark = get_spark(f"scal{cores}", cores=cores, shuffle_partitions=cores)
    n = run_pipeline_once(spark, pages)  # warm-up: JIT + Arrow workers
    secs = []
    for _ in range(5):  # best-of-5: the shared host is noisy (±40%)
        t0 = time.time()
        n = run_pipeline_once(spark, pages)
        secs.append(time.time() - t0)
    print(f"DOCS {n} SECS {min(secs):.3f}")
    spark.stop()


def main_dedup_only(cores: int) -> None:
    """Shuffle-heavy scaling job: MinHash band dedup (signature kernel
    → band explode → self-join → distinct) — exchange scaling, which
    the map-only pipeline can't show."""
    from eugl_spark.plans.queries import REGISTRY
    from eugl_spark.session import get_spark

    sf = _sf_of(SF_DIR)
    ddir = os.path.join(tempfile.gettempdir(), f"eugl_bench_docs_dir_{cores}")
    os.makedirs(ddir, exist_ok=True)
    src = documents_path(sf)
    dst = os.path.join(ddir, "documents.parquet")
    if os.path.exists(dst):  # stale link from a differently-sized run
        os.remove(dst)
    os.link(src, dst)
    spark = get_spark(f"dscal{cores}", cores=cores, shuffle_partitions=cores)

    def dedup_once():
        return REGISTRY["dedup_minhash_bands"].spark(spark, ddir).count()

    dedup_once()  # warm
    dsecs = []
    for _ in range(5):
        t0 = time.time()
        dedup_once()
        dsecs.append(time.time() - t0)
    print(f"DSECS {min(dsecs):.3f}")
    spark.stop()


def _child_cmd(mode: str, cores: int, cpu_list: str) -> list[str]:
    cmd = [sys.executable, os.path.abspath(__file__), mode,
           "--cores", str(cores)]
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", cpu_list] + cmd
    return cmd


def _parse_pipeline(text: str) -> tuple[int, float]:
    m = re.search(r"DOCS (\d+) SECS ([0-9.]+)", text)
    if not m:
        raise RuntimeError("pipeline child failed")
    return int(m.group(1)), float(m.group(2))


def _parse_dedup(text: str) -> float:
    m = re.search(r"DSECS ([0-9.]+)", text)
    if not m:
        raise RuntimeError("dedup child failed")
    return float(m.group(1))


def _concurrent_pair(mode: str, cwd: str) -> dict[int, str]:
    """Run the 1-core and 4-core children of `mode` SIMULTANEOUSLY on
    disjoint pinned CPU sets; returns their stdout by core count."""
    procs = {
        1: subprocess.Popen(
            _child_cmd(mode, 1, "0"), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, cwd=cwd,
        ),
        4: subprocess.Popen(
            _child_cmd(mode, 4, "1-4"), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True, cwd=cwd,
        ),
    }
    outs = {}
    for cores, p in procs.items():
        o, e = p.communicate()
        if p.returncode != 0:
            print(o, e, file=sys.stderr)
            raise RuntimeError(f"{mode} child {cores} failed")
        outs[cores] = o
    return outs


def main_scaling() -> None:
    """N vs 4N proxy.

    Each child is CPU-pinned (taskset) so local[N] really runs on an
    N-CPU machine — otherwise JVM GC threads, Python workers and
    shuffle threads of the 'small' run silently use all 32 cores and
    the comparison measures nothing. The headline pair (local[1] vs
    local[4]) runs CONCURRENTLY on disjoint CPU sets: this shared
    host's throughput drifts several-fold between minutes, so only a
    simultaneous pair sees identical conditions and yields a
    meaningful ratio."""
    cwd = os.path.dirname(os.path.abspath(__file__))
    # pre-materialize both inputs so the concurrent children don't
    # race (and double-pay) the one-time generation cost
    sf0 = _sf_of(SF_DIR)
    corpus_path(sf0 * 4)
    documents_path(sf0)
    # one concurrent pinned pair PER JOB — a pair member that measured
    # minutes apart from its sibling would sample different host
    # conditions (drift), so each job gets its own simultaneous pair
    results: dict[int, tuple] = {}
    pipe_outs = _concurrent_pair("--pipeline-only", cwd)
    # Dedup pair: least-loaded of 3 simultaneous pairs. Each child is
    # already min-of-5 inside one JVM, but the 4-core member still
    # varies up to ~1.8× BETWEEN pairs (minute-scale host
    # bus-contention windows a single pair cannot average out; measured
    # spread 0.54–0.93 in one afternoon). Select by MIN(p1 + p4) — the
    # pair the host slowed least, since contention only ever adds time
    # — NOT by max efficiency: maximizing the ratio preferentially
    # picks pairs whose 1-core member was host-inflated and biases the
    # criterion metric upward (it could even exceed 1.0). The full
    # per-pair efficiency spread is reported alongside.
    dedup_pairs = []
    for _ in range(3):
        douts = _concurrent_pair("--dedup-only", cwd)
        p1, p4 = _parse_dedup(douts[1]), _parse_dedup(douts[4])
        dedup_pairs.append((p1, p4, (p1 / p4) / 4))
    best = min(dedup_pairs, key=lambda t: t[0] + t[1])
    dsec = {1: best[0], 4: best[1]}
    dspread = sorted(t[2] for t in dedup_pairs)
    for cores, o in pipe_outs.items():
        n, secs = _parse_pipeline(o)
        results[cores] = (n, secs, n / secs, dsec[cores])
    # curve points (sequential; indicative only under host drift)
    for cores in (8, 32):
        out = subprocess.run(
            _child_cmd("--pipeline-only", cores, f"0-{cores - 1}"),
            capture_output=True, text=True, check=True, cwd=cwd,
        )
        n, secs = _parse_pipeline(out.stdout)
        dout = subprocess.run(
            _child_cmd("--dedup-only", cores, f"0-{cores - 1}"),
            capture_output=True, text=True, check=True, cwd=cwd,
        )
        results[cores] = (n, secs, n / secs, _parse_dedup(dout.stdout))

    tp1, tp4, tp8, tp32 = (results[c][2] for c in (1, 4, 8, 32))
    d1, d4 = results[1][3], results[4][3]
    eff14 = (tp4 / tp1) / 4
    deff14 = (d1 / d4) / 4  # same input both levels: time ratio = speedup
    eff832 = (tp32 / tp8) / 4
    sf = _sf_of(SF_DIR)
    md = f"""# BENCH — measured baseline (eugl_spark)

Two jobs, identical input at CPU-pinned (taskset) parallelism levels —
the sandbox proxy for N vs 4N executors (BASELINE.md). Cold JVM per
level; best of 5 timed runs after a warm-up. The 1- and 4-core runs
execute CONCURRENTLY on disjoint CPU sets: this shared host's absolute
throughput drifts several-fold between minutes, so only a simultaneous
pair yields a meaningful ratio (8/32 rows are sequential, indicative
only). The dedup job reports the least-loaded of 3 simultaneous pairs
(selected by minimum total runtime, never by the efficiency ratio
itself — see bench.py for why ratio-selection would bias upward); its
4-core member varies up to ~1.8× between pairs on this host. The
per-pair efficiency spread is printed below.

**Job A — pipeline** (map-only: extract → heuristics → langid →
perplexity → scrub → verdict over {results[8][0]} synthetic pages):

| parallelism | docs | sec | docs/sec |
|---|---|---|---|
| local[1]  | {results[1][0]} | {results[1][1]:.2f} | {tp1:.0f} |
| local[4]  | {results[4][0]} | {results[4][1]:.2f} | {tp4:.0f} |
| local[8]  | {results[8][0]} | {results[8][1]:.2f} | {tp8:.0f} |
| local[32] | {results[32][0]} | {results[32][1]:.2f} | {tp32:.0f} |

**Job B — MinHash band dedup** (shuffle-heavy: signature kernel →
band explode → self-join → distinct, i.e. exchange scaling, which the
map-only job can't show):

| parallelism | sec |
|---|---|
| local[1]  | {d1:.2f} |
| local[4]  | {d4:.2f} |
| local[8]  | {results[8][3]:.2f} |
| local[32] | {results[32][3]:.2f} |

**Scaling efficiency N→4N (1→4 cores)**: the criterion job — the
quality-filter pipeline (BASELINE.json "docs/sec with scaling
efficiency ≥ 0.8") — measures (docs/sec@4 ÷ docs/sec@1) ÷ 4 =
**{eff14:.2f}** (target ≥ 0.8). Supplementary evidence that exchange
stages scale too: the shuffle-heavy dedup job measures (t@1 ÷ t@4) ÷ 4
= **{deff14:.2f}** (least-loaded of 3 pairs; per-pair spread
{dspread[0]:.2f}–{dspread[-1]:.2f}) — its residual gap is the ~1s of
fixed driver cost (checkpoint job boundaries, final collect) against a
{d1:.0f}s job, which amortizes further with input size.

8→32 cores measures **{eff832:.2f}** on the pipeline: this host's
memory subsystem saturates above ~8-12 active cores for string
workloads — four *independent* CPU-pinned 8-core JVMs running the
same job aggregate only ~2.3× one JVM's throughput, so past ~8 cores
the box measures its memory bus, not the engine. On a real N→4N
*executor* scale-out each machine brings its own memory bus; the 1→4
pair (fully below the saturation knee) is the faithful proxy for
coordination/shuffle overhead, which is what the criterion tests.

This file is regenerated whole by `python bench.py --scaling`; it
reports only what THIS run measured. Round-over-round history lives
in the git log of this file (and the per-round BENCH_r*.json), not in
a hand-maintained paragraph that could outlive the numbers it cites.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff14, 3),
                "unit": "ratio",
                "queries": {
                    "docs_per_sec_local1": round(tp1, 1),
                    "docs_per_sec_local4": round(tp4, 1),
                    "docs_per_sec_local8": round(tp8, 1),
                    "docs_per_sec_local32": round(tp32, 1),
                    "efficiency_8_to_32": round(eff832, 3),
                    "dedup_efficiency_1_to_4": round(deff14, 3),
                    "dedup_eff_pair_spread_lo": round(dspread[0], 3),
                    "dedup_eff_pair_spread_hi": round(dspread[-1], 3),
                    "dedup_sec_local1": round(d1, 3),
                    "dedup_sec_local4": round(d4, 3),
                },
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--pipeline-only", action="store_true")
    ap.add_argument("--dedup-only", action="store_true")
    ap.add_argument("--cores", type=int, default=CPUS)
    args = ap.parse_args()
    if args.pipeline_only:
        main_pipeline_only(args.cores)
    elif args.dedup_only:
        main_dedup_only(args.cores)
    elif args.scaling:
        main_scaling()
    else:
        main_bench()
