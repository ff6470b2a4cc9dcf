"""Repetition quality signals and contamination scan — exact values
on hand-built documents (no reference analogue; phase-E pipeline
surface, SURVEY.md §7)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.curation import (
    contamination_check,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: "a b a b a b" — tokens 6, distinct 2; bigrams [ab,ba,ab,ba,ab]
        #    top bigram "a b" 3/5; trigrams 4, distinct 2
        (0, "a b a b a b"),
        # 1: all-distinct tokens, no repeats anywhere
        (1, "one two three four five"),
        # 2: single token — no bigrams/trigrams
        (2, "solo"),
        # 3: empty text
        (3, "   "),
        # 4: same token repeated — every ngram identical
        (4, "x x x x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_repetition_exact_values(docs):
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    r0 = got[0]
    assert r0["n_tokens"] == 6
    assert r0["dup_token_ratio"] == pytest.approx(1 - 2 / 6, abs=1e-6)
    assert r0["top_bigram_frac"] == pytest.approx(3 / 5, abs=1e-6)
    assert r0["dup_trigram_frac"] == pytest.approx(1 - 2 / 4, abs=1e-6)
    r1 = got[1]
    assert r1["dup_token_ratio"] == 0.0
    assert r1["dup_trigram_frac"] == 0.0
    assert r1["top_bigram_frac"] == pytest.approx(1 / 4, abs=1e-6)
    assert got[2]["n_tokens"] == 1 and got[2]["top_bigram_frac"] == 0.0
    assert got[3]["n_tokens"] == 0 and got[3]["dup_token_ratio"] == 0.0
    r4 = got[4]
    assert r4["dup_token_ratio"] == pytest.approx(0.75, abs=1e-6)
    assert r4["top_bigram_frac"] == 1.0
    assert r4["dup_trigram_frac"] == pytest.approx(0.5, abs=1e-6)


def test_contamination_finds_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "totally unrelated words here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps high")], ["doc_id", "text"]
    )
    out = contamination_check(train, ev, n=4).collect()
    assert len(out) == 1
    row = out[0]
    assert (row["train_doc_id"], row["eval_doc_id"]) == (1, 100)
    # shared 4-gram: "quick brown fox jumps"; eval has 2 distinct 4-grams
    assert row["n_shared_ngrams"] == 1
    assert row["containment"] == pytest.approx(0.5, abs=1e-6)


def test_contamination_self_clean(spark):
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [(1, "zeta eta theta iota kappa")], ["doc_id", "text"]
    )
    assert contamination_check(train, ev, n=4).count() == 0


def test_repetition_plan_is_shuffle_free(docs):
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_rates_and_determinism(spark):
    from gofaiss_spark.operators.curation import (
        hash_bucket,
        stratified_hash_sample,
    )

    rows = [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
            for i in range(3000)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = stratified_hash_sample(
        df, {"en": 50, "de": 10}, strata_col="lang", default_pct=0
    )
    got = out.groupBy("lang").count().collect()
    by_lang = {r["lang"]: r["count"] for r in got}
    assert "fr" not in by_lang  # default 0 drops unlisted strata
    assert 0.4 < by_lang["en"] / 1000 < 0.6
    assert 0.05 < by_lang["de"] / 1000 < 0.16
    # deterministic: same rows again
    again = stratified_hash_sample(
        df, {"en": 50, "de": 10}, strata_col="lang", default_pct=0
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # membership consistent with hash_bucket
    sample_ids = {r["doc_id"] for r in out.collect()}
    buckets = {
        r["doc_id"]: r["bucket"]
        for r in df.select("doc_id", "lang", hash_bucket("doc_id")).collect()
    }
    for i, lang in rows:
        want = (lang == "en" and buckets[i] < 50) or (
            lang == "de" and buckets[i] < 10
        )
        assert (i in sample_ids) == want

    with pytest.raises(ValueError, match="rate"):
        stratified_hash_sample(df, {"en": 101})


def test_pack_chunks_token_offsets(spark):
    from gofaiss_spark.operators.curation import pack_chunks

    # chunks of 10 tokens each: budget 25 → batches of ceil boundaries
    rows = [(0, i, 10) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "chunk_idx", "n_chunk_tokens"])
    got = {
        r["chunk_idx"]: r["batch_id"]
        for r in pack_chunks(df, budget_tokens=25).collect()
    }
    # tokens_before: 0,10,20,30,40,50 → floor(/25): 0,0,0,1,1,2
    assert got == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}

    # per-group packing restarts offsets
    rows2 = [("a", 0, i, 10) for i in range(3)] + [("b", 1, i, 10) for i in range(3)]
    df2 = spark.createDataFrame(
        rows2, ["lang", "doc_id", "chunk_idx", "n_chunk_tokens"]
    )
    per = pack_chunks(df2, budget_tokens=15, group_col="lang").collect()
    for r in per:
        want = (r["chunk_idx"] * 10) // 15
        assert r["batch_id"] == want

    with pytest.raises(ValueError, match="budget"):
        pack_chunks(df, budget_tokens=0)


def test_connected_components_min_label(spark):
    from gofaiss_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (7, 5)], ["doc_a", "doc_b"]
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 5: 5, 7: 5}


def test_connected_components_long_chain(spark):
    """A 30-node path graph needs label propagation over many hops —
    the convergence loop, not a single join, must produce the fix
    point. local_threshold=0 pins the iterative (large-graph) path."""
    from gofaiss_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["doc_a", "doc_b"]
    )
    rows = connected_components(pairs, local_threshold=0).collect()
    assert {r["cluster_id"] for r in rows} == {0}
    assert len(rows) == 31


def test_connected_components_strategies_agree(spark):
    """The single-task union-find and the iterative min-label loop
    must produce identical labelings on a random graph (threshold 0
    forces the iterative path; the default takes the union-find)."""
    import random

    from gofaiss_spark.operators.dedup import connected_components

    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    small = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    large = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(pairs, local_threshold=0).collect()
    }
    assert small == large


def test_near_dup_clusters_planted(spark):
    from gofaiss_spark.operators.dedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base + " extra"),          # near-dup of 0
        (2, base + " extra words"),    # near-dup of 1 (and likely 0)
        (3, "completely different content about spark shuffles and parquet files"),
        (4, "completely different content about spark shuffles and parquet rows"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in near_dup_clusters(docs, threshold=0.5).collect()
    }
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3


def test_dsir_prefers_target_like_docs(spark):
    from gofaiss_spark.operators.curation import dsir_resample, dsir_weights

    # raw corpus: half "english-ish" (target-like), half "noise-ish"
    en = [(i, "the quick brown fox jumps over the lazy dog again", "en")
          for i in range(20)]
    xx = [(i + 20, "zxq vvw qqz kkj xxo pqr zzt wvu nmb lkj", "xx")
          for i in range(20)]
    docs = spark.createDataFrame(en + xx, "doc_id long, text string, lang string")
    target = docs.filter("lang = 'en'")
    w = {r["doc_id"]: r["avg_llr"] for r in dsir_weights(docs, target).collect()}
    assert min(w[i] for i in range(20)) > max(w[i + 20] for i in range(20))
    res = dsir_resample(docs, target, keep_fraction=0.5).collect()
    kept = {r["doc_id"] for r in res if r["keep"]}
    assert kept == set(range(20))  # exactly the target-like half


def test_dsir_resample_keep_fraction_bounds(spark):
    from gofaiss_spark.operators.curation import dsir_resample

    docs = spark.createDataFrame(
        [(0, "alpha beta", "en")], "doc_id long, text string, lang string"
    )
    with pytest.raises(ValueError):
        dsir_resample(docs, docs, keep_fraction=0.0)


def test_perplexity_buckets_partition_and_order(spark):
    from gofaiss_spark.functions.lm import perplexity_buckets

    rows = [(i, "the cat sat on the mat and the cat sat again", "en") for i in range(6)]
    rows += [(10 + i, "word salad " + " ".join(f"tok{j}{i}" for j in range(8)), "de")
             for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(docs, n_buckets=3).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert sorted({r["ppl_bucket"] for r in rs}) == [1, 2, 3]
        # bucket ordering tracks perplexity ordering
        rs.sort(key=lambda r: (r["perplexity"], r["doc_id"]))
        buckets = [r["ppl_bucket"] for r in rs]
        assert buckets == sorted(buckets)


class TestGopherRules:
    """gopher_signals (functions/text.py) — exact rule arithmetic on
    hand-built documents (public Gopher rule set, Rae et al. 2021)."""

    @pytest.fixture(scope="class")
    def gopher_df(self, spark):
        from gofaiss_spark.functions.text import gopher_signals

        passing = " ".join(
            ["the quick brown fox jumps over one of those lazy dogs"] * 5
        )  # 55 words, all alpha, has 'the'+'of', mean len ~4
        rows = [
            (0, passing),
            (1, "too short to pass the filter of rules"),  # 8 words
            (2, " ".join(["####"] * 60)),  # symbol soup, no letters
            (3, ""),
            (4, " ".join(["the of"] + ["1234567"] * 58)),  # digits: alpha frac low
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        sig = gopher_signals(F.col("text"))
        return {
            r["doc_id"]: r
            for r in df.select(
                "doc_id", *[c.alias(n) for n, c in sig.items()]
            ).collect()
        }

    def test_passing_doc(self, gopher_df):
        r = gopher_df[0]
        assert r.n_words == 55
        assert r.gopher_pass is True
        assert r.stopword_hits >= 2
        assert r.alpha_word_frac == 1.0
        assert r.symbol_ratio == 0.0

    def test_short_doc_fails_word_count(self, gopher_df):
        r = gopher_df[1]
        assert r.n_words == 8
        assert r.gopher_pass is False
        assert r.stopword_hits == 3  # the, to, of

    def test_symbol_soup_fails(self, gopher_df):
        r = gopher_df[2]
        assert r.symbol_ratio == pytest.approx(4.0)  # 4 '#' per word
        assert r.alpha_word_frac == 0.0
        assert r.gopher_pass is False

    def test_empty_doc(self, gopher_df):
        r = gopher_df[3]
        assert r.n_words == 0
        assert r.symbol_ratio == 0.0
        assert r.gopher_pass is False

    def test_digit_doc_fails_alpha_frac(self, gopher_df):
        r = gopher_df[4]
        assert r.n_words == 60
        assert r.alpha_word_frac == pytest.approx(2 / 60, abs=1e-6)
        assert r.gopher_pass is False
