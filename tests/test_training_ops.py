"""Training-data ops: leakage-safe splits and token budgeting."""

from __future__ import annotations

import duckdb

from eugl_spark.plans.queries import _TOK_SQL, _TOKEN_BUDGET, REGISTRY


def test_split_is_leakage_safe_and_deterministic(spark, sf_dir):
    df = REGISTRY["split_train_val_test"].spark(spark, sf_dir).toPandas()
    # a host (source) maps to EXACTLY one split — near-dups within a
    # host can never straddle train/eval
    per_source = df.groupby("source")["split"].nunique()
    assert (per_source == 1).all()
    # rough 80/10/10 shape — VERY loose bounds: the testdata has only
    # ~20 hosts, so host-granular assignment quantizes the fractions
    frac = df.split.value_counts(normalize=True)
    assert 0.4 <= frac.get("train", 0) <= 0.95
    assert frac.get("train", 0) == frac.max()
    # pure function: rerun identical
    again = REGISTRY["split_train_val_test"].spark(spark, sf_dir).toPandas()
    assert df.sort_values("doc_id").split.tolist() == again.sort_values(
        "doc_id"
    ).split.tolist()


def test_token_budget_semantics(spark, sf_dir):
    got = REGISTRY["corpus_token_budget"].spark(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    totals = dict(
        con.sql(
            f"SELECT source, CAST(sum(len(regexp_extract_all(lower(text),"
            f" '{_TOK_SQL}'))) AS BIGINT) FROM documents"
            f" WHERE text IS NOT NULL GROUP BY source"
        ).fetchall()
    )
    for source, grp in got.groupby("source"):
        last = grp.cum_tokens.max()
        # either the source ran out of documents under budget, or the
        # budget was crossed by exactly the last kept doc
        assert last == totals[source] or last >= _TOKEN_BUDGET
        # every kept doc except the last started under budget
        under = (grp.sort_values("cum_tokens").cum_tokens < _TOKEN_BUDGET).sum()
        assert under >= len(grp) - 1


def _skewed_nt(spark):
    """(doc_id, source, ntok): one source holds 90% of docs (the
    SURVEY §4 skew row — a training mix where one crawl dominates)."""
    rows = [(i, "hot", 1) for i in range(9000)]
    rows += [(9000 + i, f"s{i % 10}", 3) for i in range(1000)]
    return spark.createDataFrame(rows, "doc_id long, source string, ntok long")


def test_budget_two_phase_skew_parity(spark):
    """90%-skewed source: the two-phase prefix sum must equal the
    single-window definition exactly, including across bucket
    boundaries (continuous cum_tokens)."""
    from eugl_spark.plans.queries import _TOKEN_BUDGET, _budget_filter

    nt = _skewed_nt(spark)
    got = (
        _budget_filter(nt, n_buckets=16)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    # pandas oracle of the boundary rule
    pdf = nt.toPandas().sort_values(["source", "doc_id"])
    pdf["cum_tokens"] = pdf.groupby("source").ntok.cumsum()
    pdf["before"] = pdf.cum_tokens - pdf.ntok
    want = (
        pdf[pdf.before < _TOKEN_BUDGET][["doc_id", "source", "cum_tokens"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.cum_tokens.tolist() == want.cum_tokens.tolist()
    # hot source: survivors are exactly the first _TOKEN_BUDGET docs
    # (ntok=1 each) and their running total is the contiguous sequence
    # 1.._TOKEN_BUDGET — the cross-bucket stitching this rewrite must
    # get right (with 16 range buckets the survivors span several)
    hot = got[got.source == "hot"]
    assert hot.cum_tokens.tolist() == list(range(1, _TOKEN_BUDGET + 1))


def test_budget_bucket_count_invariance(spark):
    """THE two-phase invariant: the result is identical at any
    parallelism — bucket boundaries must never show through."""
    from eugl_spark.plans.queries import _budget_filter

    nt = _skewed_nt(spark)
    a = _budget_filter(nt, n_buckets=2).toPandas().sort_values("doc_id")
    b = _budget_filter(nt, n_buckets=64).toPandas().sort_values("doc_id")
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.cum_tokens.tolist() == b.cum_tokens.tolist()


def test_budget_plan_is_bucketed_not_per_source(spark):
    """The per-row window must partition by (source, bkt) — range
    buckets from spark_partition_id — never by source alone (a
    single-task-per-source sort at scale)."""
    from eugl_spark.plans.queries import _budget_filter

    plan = (
        _budget_filter(_skewed_nt(spark), n_buckets=16)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "bkt" in plan
    # every Window node that orders by doc_id (the per-row pass) must
    # also partition by bkt; the offsets window orders by bkt instead
    import re

    for line in plan.splitlines():
        if "windowspecdefinition" in line and "doc_id" in line:
            assert "bkt" in line, line


def test_budget_null_source_grouping(spark):
    """PARTITION BY groups NULL sources as one partition — the offset
    join must be null-safe or null-source rows silently vanish."""
    from eugl_spark.plans.queries import _budget_filter

    nt = spark.createDataFrame(
        [(1, None, 5), (2, None, 7), (3, "a", 2)],
        "doc_id long, source string, ntok long",
    )
    got = _budget_filter(nt, n_buckets=4).toPandas().sort_values("doc_id")
    assert got.doc_id.tolist() == [1, 2, 3]
    assert got.cum_tokens.tolist() == [5, 12, 2]


def test_mixture_budget_per_source(spark, sf_dir):
    """Mixture sampling: each source's survivors honor ITS budget
    (weight x unit), not a flat cap."""
    import re

    from eugl_spark.plans.queries import _MIX_UNIT

    got = REGISTRY["corpus_mixture_sample"].spark(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    totals = dict(
        con.sql(
            f"SELECT source, CAST(sum(len(regexp_extract_all(lower(text),"
            f" '{_TOK_SQL}'))) AS BIGINT) FROM documents"
            f" WHERE text IS NOT NULL GROUP BY source"
        ).fetchall()
    )

    def budget(source):
        m = re.search(r"(\d+)$", source)
        rel = (int(m.group(1)) % 4 + 1) if m else 1
        return rel * _MIX_UNIT

    seen_budgets = set()
    for source, grp in got.groupby("source"):
        cap = budget(source)
        seen_budgets.add(cap)
        last = grp.cum_tokens.max()
        # ran out of docs under budget, or crossed it on the last doc
        assert last == totals[source] or last >= cap
        under = (grp.sort_values("cum_tokens").cum_tokens < cap).sum()
        assert under >= len(grp) - 1
    # the mixture actually exercises several distinct budgets
    assert len(seen_budgets) >= 3


def test_upsample_epochs_copy_counts(spark, sf_dir):
    """Epoch upsampling: per-doc multiplicity == floor(rel/2) plus the
    md5-hash-chosen half epoch for odd rel; epochs dense from 1."""
    import hashlib
    import re

    got = REGISTRY["corpus_upsample_epochs"].spark(spark, sf_dir).toPandas()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()

    def expected_copies(doc_id, source):
        m = re.search(r"(\d+)$", source or "")
        rel = (int(m.group(1)) % 4 + 1) if m else 1
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 100
        return rel // 2 + (1 if rel % 2 == 1 and h < 50 else 0)

    counts = got.groupby("doc_id").epoch.agg(["count", "min", "max"])
    for _, row in docs.iterrows():
        n = expected_copies(row.doc_id, row.source)
        if n == 0:
            assert row.doc_id not in counts.index
        else:
            c = counts.loc[row.doc_id]
            assert c["count"] == n and c["min"] == 1 and c["max"] == n
    # fractional epochs really happen: some rel-1/rel-3 docs dropped
    assert len(counts) < len(docs)
    # and upsampling really happens: more rows out than docs in
    assert len(got) > len(docs)


def test_mixture_budget_filter_skew_parity(spark):
    """The generalized per-source-budget _budget_filter matches the
    pandas boundary rule on the 90%-skew frame with UNEQUAL budgets."""
    from eugl_spark.plans.queries import _budget_filter
    import pyspark.sql.functions as F

    nt = _skewed_nt(spark).withColumn(
        "budget",
        F.when(F.col("source") == "hot", F.lit(500)).otherwise(F.lit(9)),
    )
    got = (
        _budget_filter(nt, n_buckets=16)
        .toPandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pdf = nt.toPandas().sort_values(["source", "doc_id"])
    pdf["cum_tokens"] = pdf.groupby("source").ntok.cumsum()
    pdf["before"] = pdf.cum_tokens - pdf.ntok
    want = (
        pdf[pdf.before < pdf.budget][["doc_id", "source", "cum_tokens"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == want.doc_id.tolist()
    assert got.cum_tokens.tolist() == want.cum_tokens.tolist()
    # hot source capped at 500 (not the flat default), cold at 3 docs
    assert (got.source == "hot").sum() == 500
    assert set(got[got.source != "hot"].groupby("source").size()) == {3}


def test_linear_classifier_learns_beyond_majority(spark, sf_dir):
    """The distilled logistic model must beat the all-drop majority
    baseline (which scores keep-F1 = 0): the rule cascade's dominant
    signals (is_en, length) are linearly recoverable."""
    df = REGISTRY["qf_linear_score"].spark(spark, sf_dir).toPandas()
    majority = max(df.rule_keep.mean(), 1 - df.rule_keep.mean())
    acc = (df.pred_keep == df.rule_keep).mean()
    tp = (df.pred_keep & df.rule_keep).sum()
    fp = (df.pred_keep & ~df.rule_keep).sum()
    fn = (~df.pred_keep & df.rule_keep).sum()
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert acc > majority
    assert f1 >= 0.6
    # scores are calibrated probabilities, not constants
    assert df.score.between(0, 1).all() and df.score.nunique() > 10
    # the weight vector exposes the learned structure: is_en must be
    # the strongest positive signal (langid dominates the rule cascade)
    w = (
        REGISTRY["qf_train_linear"]
        .spark(spark, sf_dir)
        .toPandas()
        .set_index("feature")
    )
    assert w.loc["is_en", "weight"] > 0
    assert w.loc["is_en", "weight"] == w.weight.max()


def test_build_training_corpus_budget_knob(spark, sf_dir):
    """The library surface: a custom token_budget changes the cap but
    keeps the boundary rule — every surviving doc's before-budget
    running total is under the cap, and a smaller budget keeps a
    subset of a bigger one."""
    from eugl_spark.plans.queries import build_training_corpus

    small = build_training_corpus(spark, sf_dir, token_budget=100).toPandas()
    big = build_training_corpus(spark, sf_dir, token_budget=5000).toPandas()
    assert set(small.doc_id) <= set(big.doc_id)
    assert len(small) < len(big)
    # boundary rule: spent-before < cap for every kept doc
    for _, r in small.iterrows():
        assert r.cum_tokens is not None


def test_bloom_decontamination_superset_and_broadcast(spark, sf_dir):
    """The Bloom twin may only OVER-remove: its flagged set must
    contain every exactly-contaminated doc (false negatives are
    impossible by construction), and its probe side must be planned as
    broadcast joins — the whole point of the bounded bit space is that
    the train grams never shuffle."""
    exact = set(
        r.doc_id
        for r in REGISTRY["decontaminate_train"].spark(spark, sf_dir).collect()
    )
    bloom_df = REGISTRY["decontaminate_bloom"].spark(spark, sf_dir)
    bloom = set(r.doc_id for r in bloom_df.collect())
    assert exact <= bloom, exact - bloom
    # FP tripwire: with 2^20 bits and a sf0.01-scale gram set the
    # expected FP count is ~0; the bound is deliberately loose (half
    # the exact-contaminated count, floor 2) — it exists to catch a
    # broken hash recipe / bit space, not to certify an FP rate
    assert len(bloom - exact) <= max(2, len(exact) // 2)
    plan = bloom_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_ppl_buckets_null_lang_parity(spark, tmp_path):
    """Null-lang docs must be bucketed as their own group (the
    oracle's PARTITION BY lang semantics), not silently dropped by
    the two-phase rank's equi-join — the corpus generator emits null
    langs, the committed sf fixtures just happen not to."""
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eugl_spark.plans.compare import compare_frames

    texts = [
        f"the water of time is a question for the people round {i} "
        f"and the day was good for all of them there"
        for i in range(20)
    ]
    d = str(tmp_path / "nulllang")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(20), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [None if i % 3 == 0 else "en" for i in range(20)],
                    pa.string(),
                ),
                "source": pa.array(["s0"] * 20, pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    q = REGISTRY["qf_ppl_buckets"]
    pdf = q.spark(spark, d).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    res = compare_frames(pdf, con.sql(q.sql).df())
    assert res["values_match"], res["diff"]
    assert len(pdf) == 20  # nothing dropped
    assert pdf["lang"].isna().sum() == 7  # null-lang group survived


def test_bpe_training_matches_classic_reference(spark):
    """The DataFrame superstep trainer must learn the same merge
    sequence as a classic driver-side BPE (count adjacent pairs over
    the word frame, merge the most frequent, ties (count, l, r)) —
    and the native apply path must count exactly the symbols the
    reference produces."""
    from collections import Counter

    from eugl_spark.models.bpe import (
        apply_bpe_counts,
        train_bpe_merges,
    )
    from eugl_spark.plans.queries import _BPE_RE
    import re

    texts = [
        "the cat sat on the mat",
        "the hat and the bat and that cat",
        "a hathat thathat the the the",
        None,
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    K = 5

    # classic reference implementation
    pre = re.compile(_BPE_RE)
    words = Counter()
    for t in texts:
        if t:
            for tok in pre.findall(t):
                words[tuple(tok)] += 1
    ref_merges = []
    for _ in range(K):
        pairs = Counter()
        for syms, c in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        ref_merges.append((l, r, c))
        nxt = Counter()
        for syms, cnt in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] += cnt
        words = nxt

    got = train_bpe_merges(docs, k=K)
    assert got == ref_merges

    # apply: per-doc merged symbol counts vs the reference tokenizer
    def ref_count(t):
        n = 0
        for tok in pre.findall(t):
            syms = list(tok)
            for l, r, _ in ref_merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n += len(syms)
        return n

    rows = {
        r["doc_id"]: r for r in apply_bpe_counts(docs, got).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert i not in rows
            continue
        assert rows[i]["n_pre"] == len(pre.findall(t))
        assert rows[i]["n_merged"] == ref_count(t), (i, t)


def test_bpe_sample_capped_training(spark):
    """VERDICT r5 #2: the scale levers on train_bpe_merges.

    (1) classic-finish equivalence: beyond collect_after the capped
        frame collects once and the driver-side classic loop must
        produce EXACTLY the superstep trainer's merge sequence;
    (2) max_words cap keeps the highest-count tokens and still learns
        most of the full-frame merge table (pinned overlap metric);
    (3) defaults leave the full-frame superstep path untouched.
    """
    import pyarrow.parquet as pq

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from eugl_spark.models.bpe import train_bpe_merges

    K = 20
    # same capped frame, two engines: superstep (forced) vs classic
    super_m = train_bpe_merges(
        docs, k=K, max_words=300, collect_after=10_000
    )
    classic_m = train_bpe_merges(docs, k=K, max_words=300, collect_after=1)
    assert classic_m == super_m

    # sampled-vs-full overlap: the capped table learns the head of the
    # full merge table (deterministic fixture → pinned floor)
    full_m = train_bpe_merges(docs, k=12)
    capped_pairs = {(l, r) for l, r, _ in classic_m}
    overlap = sum(1 for l, r, _ in full_m if (l, r) in capped_pairs)
    assert overlap >= 8, (overlap, full_m, classic_m)

    # train_fraction sampling is deterministic and engages the
    # classic path at depth too
    s1 = train_bpe_merges(docs, k=70, train_fraction=0.5, collect_after=64)
    s2 = train_bpe_merges(docs, k=70, train_fraction=0.5, collect_after=64)
    assert s1 == s2 and len(s1) == 70


def test_bpe_deep_merge_training_is_fast(spark):
    """The r5 scale ceiling: k≫supersteps must NOT run k sequential
    Spark jobs. With a capped frame, k=256 collapses to one collect +
    the driver-side classic loop — seconds, not job-scheduler hours."""
    import time

    from eugl_spark.models.bpe import train_bpe_merges

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    t0 = time.monotonic()
    merges = train_bpe_merges(docs, k=256, max_words=3000)
    dt = time.monotonic() - t0
    # the synthetic fixture's vocabulary (61 distinct tokens) SATURATES
    # before 256 merges — every word collapses to one symbol and the
    # pair frame runs dry; that early stop is part of the contract.
    # What this test pins is the COLLAPSE-TO-DRIVER behavior: deep k on
    # a capped frame is one Spark job + a driver loop, not k sequential
    # scheduler round-trips.
    assert 100 < len(merges) <= 256, len(merges)
    # generous CI bound; the superstep path at k=256 measures minutes
    assert dt < 120, f"capped k=256 training took {dt:.0f}s"
    # merges are well-formed and counts non-increasingly plausible
    assert all(isinstance(l, str) and isinstance(r, str) for l, r, _ in merges)


def test_pack_sequences_conservation(spark, sf_dir):
    """Packing invariants: token mass is conserved (sum of per-sequence
    fills == corpus token total), every sequence except the last is
    exactly full, seq_ids are dense from 0, and every document starts
    in exactly one sequence (sum n_starts == n_docs with tokens)."""
    from pyspark.sql import functions as F

    from eugl_spark.plans.queries import _PACK_SEQ_LEN, REGISTRY
    from eugl_spark.functions import heuristics as H

    out = (
        REGISTRY["corpus_pack_sequences"]
        .spark(spark, sf_dir)
        .orderBy("seq_id")
        .collect()
    )
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select(F.size(H.tokens(F.col("text"))).cast("long").alias("ntok"))
        .filter(F.col("ntok") > 0)
    )
    agg = docs.agg(
        F.sum("ntok").alias("total"), F.count("*").alias("n")
    ).collect()[0]
    assert [r["seq_id"] for r in out] == list(range(len(out)))
    assert sum(r["n_tokens"] for r in out) == agg["total"]
    assert all(r["n_tokens"] == _PACK_SEQ_LEN for r in out[:-1])
    assert 0 < out[-1]["n_tokens"] <= _PACK_SEQ_LEN
    assert sum(r["n_starts"] for r in out) == agg["n"]
    # a sequence holds at least the doc that spans it
    assert all(r["n_docs"] >= 1 for r in out)


def test_pack_sequences_two_phase_plan(spark, sf_dir):
    """The prefix sum must be the two-phase shape: no window over the
    full doc stream in one task — the only unpartitioned window runs
    over the tiny per-bucket offsets frame (n_buckets rows)."""
    from eugl_spark.plans.queries import REGISTRY

    df = REGISTRY["corpus_pack_sequences"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the doc-level window is partitioned by bkt; assert the global
    # doc-order window (partitionBy empty + orderBy doc_id) is absent
    import re

    for m in re.finditer(r"Window \[(.*?)\]", plan):
        frag = m.group(0)
        if "doc_id" in frag:
            assert "bkt" in frag, f"unpartitioned doc-order window: {frag}"


def test_shard_sequences_partition_and_determinism(spark, sf_dir):
    """Shuffle-shard invariants: the shards exactly partition the
    packed sequences (every seq_id appears once), pos is dense 1..k
    within each shard, the shard is the salted key's modulo (so the
    layout is reproducible run-to-run), and the within-shard order is
    NOT seq_id order (it is actually shuffled)."""
    from collections import defaultdict

    from eugl_spark.plans.queries import _PACK_SHARDS, REGISTRY

    out = REGISTRY["corpus_shard_sequences"].spark(spark, sf_dir).collect()
    packed = REGISTRY["corpus_pack_sequences"].spark(spark, sf_dir).collect()
    assert sorted(r["seq_id"] for r in out) == sorted(
        r["seq_id"] for r in packed
    )
    by_shard = defaultdict(list)
    for r in out:
        assert 0 <= r["shard"] < _PACK_SHARDS
        by_shard[r["shard"]].append(r)
    for rows in by_shard.values():
        assert sorted(r["pos"] for r in rows) == list(
            range(1, len(rows) + 1)
        )
    in_order = [
        r["seq_id"] for r in sorted(out, key=lambda r: (r["shard"], r["pos"]))
    ]
    assert in_order != sorted(in_order), "shard order degenerated to seq_id"
    # reproducible: a second run yields the identical layout
    again = REGISTRY["corpus_shard_sequences"].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_datasheet_total_row_consistency(spark, sf_dir):
    """The '(all)' grand-total row must equal the per-lang rows summed
    (docs, chars) and doc_share must sum to 1 over langs; null langs
    surface as '(none)', never conflated with the total row."""
    from eugl_spark.plans.queries import REGISTRY

    rows = {
        r["lang"]: r
        for r in REGISTRY["corpus_datasheet"].spark(spark, sf_dir).collect()
    }
    total = rows.pop("(all)")
    assert total["n_docs"] == sum(r["n_docs"] for r in rows.values())
    assert total["total_chars"] == sum(
        r["total_chars"] for r in rows.values()
    )
    assert abs(sum(r["doc_share"] for r in rows.values()) - 1.0) < 1e-4
    assert abs(total["doc_share"] - 1.0) < 1e-9


def test_pack_payload_matches_stats(spark, sf_dir):
    """Payload and stats share the offset contract: per-sequence
    token count identical, payload token stream concatenated over
    seq_id order == the documents' token streams concatenated in
    doc_id order (byte-for-byte), and each sequence carries exactly
    seq_len tokens except the last."""
    from pyspark.sql import functions as F

    from eugl_spark.functions import heuristics as H
    from eugl_spark.plans.queries import REGISTRY

    stats = {
        r["seq_id"]: r
        for r in REGISTRY["corpus_pack_sequences"].spark(spark, sf_dir).collect()
    }
    payload = (
        REGISTRY["corpus_pack_payload"]
        .spark(spark, sf_dir)
        .orderBy("seq_id")
        .collect()
    )
    assert {r["seq_id"] for r in payload} == set(stats)
    for r in payload:
        assert r["n_tokens"] == stats[r["seq_id"]]["n_tokens"]
    stream = " ".join(r["seq_text"] for r in payload)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", F.concat_ws(" ", H.tokens(F.col("text"))).alias("t"))
        .filter(F.length("t") > 0)
        .orderBy("doc_id")
        .collect()
    )
    assert stream == " ".join(r["t"] for r in docs)


def test_capstone_span_drop_gate(spark, sf_dir):
    """The opt-in exact-substring curation gate: with a threshold, the
    capstone's survivors are exactly the default survivors minus the
    docs whose dedup_span_coverage dup_fraction exceeds it; with the
    default None the output is byte-identical to corpus_build_train
    (oracle hashes untouched — the boilerplate-mode precedent)."""
    from eugl_spark.plans.queries import REGISTRY, build_training_corpus

    default = build_training_corpus(spark, sf_dir).toPandas()
    registry = REGISTRY["corpus_build_train"].spark(spark, sf_dir).toPandas()
    key = sorted(default.columns)
    assert sorted(map(tuple, default[key].itertuples(index=False))) == sorted(
        map(tuple, registry[key].itertuples(index=False))
    )

    thr = 0.3
    gated = build_training_corpus(
        spark, sf_dir, span_drop_threshold=thr
    ).toPandas()
    prof = REGISTRY["dedup_span_coverage"].spark(spark, sf_dir).toPandas()
    too_dup = set(prof[prof["dup_fraction"] > thr]["doc_id"])
    assert too_dup, "fixture has no span-heavy docs — threshold too high"
    expect = set(default["doc_id"]) - too_dup
    assert set(gated["doc_id"]) == expect
    assert set(gated["doc_id"]).isdisjoint(too_dup)


def test_fuzzy_decontamination_sound_and_catches_identical(spark, sf_dir):
    """Candidate-then-verify contract: everything flagged IS a true
    near-dup of some eval doc (soundness vs a brute-force jaccard over
    train×test shingle sets), and every train doc with an IDENTICAL
    shingle set to an eval doc is flagged (identical sets → identical
    minhash signatures → same bands → candidate → jaccard 1.0 — the
    recall floor banding can never miss)."""
    from pyspark.sql import functions as F

    from eugl_spark.plans.queries import (
        _FUZZY_DECON_J,
        _shingles,
        _split_col,
        REGISTRY,
    )

    flagged = {
        r["doc_id"]
        for r in REGISTRY["decontaminate_fuzzy"].spark(spark, sf_dir).collect()
    }
    assert flagged, "fixture has no cross-split near-dups"
    sh = {
        r["doc_id"]: frozenset(r["sh"])
        for r in _shingles(spark, sf_dir).collect()
    }
    split = {
        r["doc_id"]: r["split"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", _split_col().alias("split"))
        .collect()
    }
    train = [d for d in sh if split[d] == "train"]
    test = [d for d in sh if split[d] == "test"]
    def jac(a, b):
        c = len(sh[a] & sh[b])
        return c / (len(sh[a]) + len(sh[b]) - c) if c else 0.0
    true_near = {
        t
        for t in train
        if any(
            len(sh[t] & sh[e]) >= 2
            and round(jac(t, e), 6) >= _FUZZY_DECON_J
            for e in test
        )
    }
    assert flagged <= true_near
    identical = {
        t for t in train if any(sh[t] == sh[e] and len(sh[t]) >= 2 for e in test)
    }
    assert identical <= flagged
