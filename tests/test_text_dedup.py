"""Text-analysis + dedup operator tests, including planted-duplicate
detection (the behavior the ops exist for)."""

import pytest
from pyspark.sql import functions as F

from gofaiss_spark.functions.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
    word_shingles,
)
from gofaiss_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_near_dup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "The quick  brown fox jumps over the lazy dog again and again"),  # ws/case dup of 0
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup of 0
        (4, "völlig anderes thema hier nichts gemeinsam mit den anderen texten überhaupt"),
        (5, "completely different content about spark distributed query engines at scale"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "a bb  ccc    dddd ")], "id long, text string")
    row = df.select(
        token_count("text").alias("n"),
        bpe_ish_token_count("text").alias("bpe"),
    ).first()
    assert row["n"] == 4
    assert row["bpe"] == 1 + 1 + 1 + 1  # ceil(len/4) each


def test_word_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d")], "id long, text string")
    row = df.select(word_shingles("text", 2).alias("s")).first()
    assert row["s"] == ["a b", "b c", "c d"]


def test_quality_score_bounds(documents):
    rows = documents.select(quality_score("text").alias("q")).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_lang_id_smoke(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is in the house and it is warm"),
            (1, "der hund ist nicht in den garten und das ist gut"),
            (2, "el perro y el gato en la casa es por un dia"),
            (3, "le chat est dans la maison et les chiens dans une cour"),
            (4, "这是 一个 中文 文本"),
            (5, "xyzzy plugh"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", lang_id("text").alias("l")).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "es"
    assert got[3] == "fr"
    assert got[4] == "zh"
    assert got[5] == "und"


def test_exact_dedup(docs_with_dups):
    groups = exact_dup_groups(docs_with_dups).collect()
    # docs 0,1,2 normalize identically (case + whitespace)
    assert len(groups) == 1
    assert groups[0].doc_ids == [0, 1, 2]
    survivors = exact_dedup(docs_with_dups)
    ids = sorted(r.doc_id for r in survivors.collect())
    assert ids == [0, 3, 4, 5]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "hello worlds")],
        "id long, text string",
    )
    fps = [r["fp"] for r in df.select(doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_minhash_finds_planted_near_dup(docs_with_dups):
    sigs = minhash_signatures(docs_with_dups, num_hashes=32, shingle_n=2)
    row = sigs.first()
    assert len(row["sig"]) == 32
    pairs = minhash_near_dup_pairs(
        docs_with_dups, num_hashes=32, bands=16, shingle_n=2, threshold=0.5
    ).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert (0, 3) in got  # one-word edit at threshold 0.5, 2-shingles
    assert all(not (a in (4, 5) or b in (4, 5)) for a, b in got)
    for r in pairs:
        if (r.doc_a, r.doc_b) == (0, 1):
            assert r.jaccard == 1.0


def test_minhash_band_validation(docs_with_dups):
    with pytest.raises(ValueError):
        minhash_near_dup_pairs(docs_with_dups, num_hashes=32, bands=5)


def test_simhash_duplicates_and_bands(docs_with_dups):
    sh = {r.doc_id: r.simhash for r in simhash(docs_with_dups).collect()}
    assert sh[0] == sh[1]  # identical text → identical simhash
    pairs = simhash_near_dup_pairs(docs_with_dups, max_hamming=3).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs}
    assert got[(0, 1)] == 0
    assert (4, 5) not in got


def test_ngram_jaccard_exact(docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups, shingle_n=1, threshold=0.8).collect()
    got = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert got[(0, 1)] == 1.0
    assert (0, 3) in got  # 1-word substitution, unigram sets overlap >0.8
    assert all(not (a == 4 or b == 4) for a, b in got)


def test_embedding_near_dup_exact_vs_lsh(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.random((80, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
    # plant: 80+i = tiny perturbation of i (cos sim ≈ 1)
    for i in range(5):
        rows.append((80 + i, [float(x) for x in (base[i] + 1e-4)]))
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    exact = embedding_near_dup_pairs(df, threshold=0.999, exact=True).collect()
    exact_pairs = {(r.id_a, r.id_b) for r in exact}
    assert {(i, 80 + i) for i in range(5)} <= exact_pairs
    lsh = embedding_near_dup_pairs(
        df, threshold=0.999, exact=False, num_hash_tables=8
    ).collect()
    lsh_pairs = {(r.id_a, r.id_b) for r in lsh}
    assert {(i, 80 + i) for i in range(5)} <= lsh_pairs
    assert lsh_pairs <= exact_pairs  # LSH never invents pairs (verify step)


def test_normalize_text(spark):
    from gofaiss_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello, WORLD!!  42\tfoo  ",), ("...",)], "t string"
    )
    got = [r["n"] for r in df.select(normalize_text("t").alias("n")).collect()]
    assert got == ["hello world 42 foo", ""]


def test_char_entropy_values(spark):
    import math

    from gofaiss_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [("aaaa",), ("aabc",), ("ab",), ("",)], "t string"
    )
    got = [
        r["h"] for r in df.select(char_entropy("t").alias("h")).collect()
    ]
    assert got[0] == 0.0
    assert got[1] == pytest.approx(1.5)
    assert got[2] == pytest.approx(1.0)
    # empty string: Spark split('') yields [''] (one run) -> H = 0
    assert got[3] == 0.0
    # natural-ish text lands in a plausible band
    txt = "the quick brown fox jumps over the lazy dog"
    df2 = spark.createDataFrame([(txt,)], "t string")
    h = df2.select(char_entropy("t").alias("h")).collect()[0]["h"]
    counts = {}
    for c in txt:
        counts[c] = counts.get(c, 0) + 1
    n = len(txt)
    expect = -sum(c / n * math.log2(c / n) for c in counts.values())
    assert h == pytest.approx(expect)


class TestEstimateMinhashParams:
    def test_known_factorization(self):
        from gofaiss_spark.operators.dedup import estimate_minhash_params

        # classic MMDS example: 100 hashes, target 0.55 -> b=20, r=5
        # (implied t = (1/20)^(1/5) ~ 0.5493)
        p = estimate_minhash_params(0.55, num_hashes=100)
        assert (p["bands"], p["rows_per_band"]) == (20, 5)
        assert p["implied_threshold"] == pytest.approx(0.549280, abs=1e-5)

    def test_curve_shape(self):
        from gofaiss_spark.operators.dedup import estimate_minhash_params

        p = estimate_minhash_params(0.8, num_hashes=128)
        f = p["p_collision"]
        assert p["bands"] * p["rows_per_band"] == 128
        # S-curve: near-certain collision above threshold, rare below
        assert f(0.95) > 0.95
        assert f(0.2) < 0.2
        assert f(0.95) > f(0.8) > f(0.5) > f(0.2)

    def test_validation(self):
        from gofaiss_spark.operators.dedup import estimate_minhash_params

        with pytest.raises(ValueError):
            estimate_minhash_params(1.5)
        with pytest.raises(ValueError):
            estimate_minhash_params(0.5, num_hashes=1)


def test_ngram_jaccard_hot_shingle_skew(spark):
    """Skew fixture (r13, verdict item 1): one shingle occurs in >50%
    of docs. The prefix-filtered join must emit the pair set and
    values of the brute-force all-pairs oracle — the hot key only
    bounds the join work, never the result."""
    import itertools

    rows = []
    for i in range(60):
        toks = [f"w{i}_{j}" for j in range(8)]
        if i % 2 == 0:
            toks.insert(0, "common")  # the hot shingle: 35 of 65 docs
        rows.append((i, " ".join(toks)))
    for i in range(5):  # planted near-dups of docs 0,1,..4
        toks = [f"w{i}_{j}" for j in range(8)] + ["common", f"x{i}"]
        rows.append((100 + i, " ".join(toks)))

    exp = {}
    for (a, ta), (b, tb) in itertools.combinations(rows, 2):
        A, B = set(ta.split()), set(tb.split())
        jr = round(len(A & B) / len(A | B), 6)
        if jr >= 0.85:
            exp[(min(a, b), max(a, b))] = jr
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(df, shingle_n=1, threshold=0.85).collect()
    }
    assert got == exp


def test_embedding_near_dup_exact_grid_path(spark, monkeypatch):
    """Past the broadcast GEMM gate the exact arm must run the
    grid-blocked prefilter (r13, verdict item 4 — no cross join at
    any size) and emit exactly the broadcast path's pairs/values."""
    import numpy as np

    from gofaiss_spark.operators import dedup as D

    rng = np.random.default_rng(11)
    base = rng.random((50, 8))
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(50)]
    for i in range(4):
        rows.append((50 + i, [float(x) for x in (base[i] + 1e-5)]))
    df = spark.createDataFrame(rows, "id long, vec array<float>")
    want = embedding_near_dup_pairs(df, threshold=0.999, exact=True).collect()

    monkeypatch.setattr(D, "_EXACT_GEMM_MAX_CELLS", 64)  # force the grid
    monkeypatch.setattr(D, "_GRID_BLOCK_MAX_CELLS", 64)  # several blocks
    grid_df = embedding_near_dup_pairs(df, threshold=0.999, exact=True)
    assert "BroadcastNestedLoop" not in grid_df._jdf.queryExecution().executedPlan().toString()
    got = grid_df.collect()

    def key(r):
        return (r.id_a, r.id_b)

    assert sorted(map(key, got)) == sorted(map(key, want))
    assert {key(r): r.cos_sim for r in got} == {key(r): r.cos_sim for r in want}


def test_embedding_near_dup_exact_string_ids(spark):
    """r12 ADVICE medium: the exact arm must work for any orderable
    id type (the old kernel coerced ids to int64 — string ids
    crashed). Output columns keep the input id type."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.random((20, 8))
    rows = [(f"doc-{i:02d}", [float(x) for x in base[i]]) for i in range(20)]
    rows.append(("dup-00", [float(x) for x in (base[0] + 1e-5)]))
    df = spark.createDataFrame(rows, "id string, vec array<float>")
    out = embedding_near_dup_pairs(df, threshold=0.999, exact=True)
    assert dict(out.dtypes)["id_a"] == "string"
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    assert ("doc-00", "dup-00") in pairs
    assert all(a < b for a, b in pairs)
