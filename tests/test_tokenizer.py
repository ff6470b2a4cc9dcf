"""BPE tokenizer training (operators/tokenizer.py) — exact merge
sequences on hand-built corpora (Sennrich et al. 2016 algorithm; no
reference analogue, SURVEY.md §2.6 phase-E surface)."""

import pytest

from gofaiss_spark.operators.tokenizer import (
    END_OF_WORD,
    _bpe_merge_loop,
    train_bpe,
    word_frequency_table,
)


class TestMergeLoop:
    def test_classic_example(self):
        # the Sennrich et al. worked example shape: 'l o w', 'l o w
        # e r', 'n e w e s t', 'w i d e s t' with counts
        wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
        merges = _bpe_merge_loop(wc, num_merges=4, min_pair_freq=1)
        # round 1: 'e s' appears in newest(6) + widest(3) = 9 — the max
        assert merges[0] == (1, "e", "s", 9)
        # round 2: 'es t' = 9
        assert merges[1] == (2, "es", "t", 9)
        # round 3: 'est </w>' = 9
        assert merges[2] == (3, "est", END_OF_WORD, 9)
        # round 4: 'l o' appears in low(5) + lower(2) = 7
        assert merges[3] == (4, "l", "o", 7)

    def test_pair_freq_monotone_nonincreasing(self):
        wc = [("abcabc", 4), ("bcd", 7), ("aab", 3), ("dddd", 2)]
        merges = _bpe_merge_loop(wc, num_merges=10, min_pair_freq=1)
        freqs = [f for _, _, _, f in merges]
        assert freqs == sorted(freqs, reverse=True)

    def test_min_pair_freq_stops(self):
        wc = [("ab", 1), ("cd", 1)]
        assert _bpe_merge_loop(wc, num_merges=5, min_pair_freq=2) == []

    def test_tie_breaks_lexicographic(self):
        # 'a b' and 'b a'... craft equal-frequency pairs: 'ab'(2) and
        # 'cd'(2) -> pairs (a,b)=2, (b,</w>)=2, (c,d)=2, (d,</w>)=2;
        # lexicographic min of maxima = (a,b)
        wc = [("ab", 2), ("cd", 2)]
        merges = _bpe_merge_loop(wc, num_merges=1, min_pair_freq=1)
        assert merges[0][1:3] == ("a", "b")


class TestTrainBpe:
    def test_end_to_end(self, spark):
        docs = spark.createDataFrame(
            [(0, "low low low low low lower lower"),
             (1, "newest newest newest newest newest newest"),
             (2, "widest widest widest")],
            ["doc_id", "text"],
        )
        out = train_bpe(docs, num_merges=3, min_pair_freq=1).collect()
        assert [(r["rank"], r["left"], r["right"], r["pair_freq"])
                for r in out] == [
            (1, "e", "s", 9), (2, "es", "t", 9), (3, "est", END_OF_WORD, 9)
        ]
        assert all(r["merged"] == r["left"] + r["right"] for r in out)

    def test_word_frequency_cap_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(0, "aa bb aa cc bb aa")], ["doc_id", "text"]
        )
        rows = word_frequency_table(docs, max_vocab_words=2).collect()
        assert [(r["word"], r["cnt"]) for r in rows] == [("aa", 3), ("bb", 2)]

    def test_num_merges_validation(self, spark):
        docs = spark.createDataFrame([(0, "x y")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            train_bpe(docs, num_merges=0)


class TestApplyBpe:
    def test_exact_segmentation(self, spark):
        from gofaiss_spark.operators.tokenizer import (
            _encode_word,
            apply_bpe,
        )

        # merges learned from the classic corpus
        rank_of = {("e", "s"): 1, ("es", "t"): 2, ("est", END_OF_WORD): 3,
                   ("l", "o"): 4, ("lo", "w"): 5}
        assert _encode_word("newest", rank_of) == ["n", "e", "w", "est</w>"]
        assert _encode_word("low", rank_of) == ["low", END_OF_WORD]
        assert _encode_word("unseen", rank_of) == [
            "u", "n", "s", "e", "e", "n", END_OF_WORD
        ]
        docs = spark.createDataFrame(
            [(0, "newest low"), (1, ""), (2, "widest")], ["doc_id", "text"]
        )
        merges = [(lt, rt, rk) for (lt, rt), rk in rank_of.items()]
        rows = {r["doc_id"]: r for r in apply_bpe(docs, merges).collect()}
        # newest -> 4 tokens, low -> 2 tokens
        assert (rows[0]["n_words"], rows[0]["n_subwords"]) == (2, 6)
        assert rows[1]["n_subwords"] == 0 and rows[1]["bpe_ok"]
        # widest: w i d est</w> = 4
        assert rows[2]["n_subwords"] == 4
        assert all(r["bpe_ok"] for r in rows.values())

    def test_roundtrip_with_trained_merges(self, spark):
        from gofaiss_spark.operators.tokenizer import apply_bpe, train_bpe

        docs = spark.createDataFrame(
            [(0, "low low lower newest newest widest")], ["doc_id", "text"]
        )
        merges = train_bpe(docs, num_merges=6, min_pair_freq=1)
        r = apply_bpe(docs, merges).collect()[0]
        assert r["bpe_ok"]
        assert r["n_words"] == 6
        assert r["n_words"] <= r["n_subwords"]
