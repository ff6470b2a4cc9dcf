"""Binary (Hamming) index tests: packing bit-exactness vs a NumPy
model, search vs a brute-force popcount oracle, tie-break
determinism. Mirrors the exact-value style of tests/test_distance.py.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gofaiss_spark.operators.binary import (
    WORD_BITS,
    binarize,
    n_words,
    search_binary,
)


def _np_pack(mat: np.ndarray) -> np.ndarray:
    """Reference packer: word j bit i set iff mat[:, 32j+i] > 0."""
    n, dim = mat.shape
    nw = n_words(dim)
    out = np.zeros((n, nw), dtype=np.int64)
    for j in range(nw):
        for i in range(min(WORD_BITS, dim - j * WORD_BITS)):
            out[:, j] |= (mat[:, j * WORD_BITS + i] > 0).astype(np.int64) << i
    return out


def _np_hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise popcount distance between packed row-sets."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.vectorize(lambda v: bin(v).count("1"))(x).sum(axis=2)


def _mk(spark, mat):
    rows = [(int(i), [float(x) for x in row]) for i, row in enumerate(mat)]
    return spark.createDataFrame(rows, "id long, vec array<float>")


def test_n_words():
    assert n_words(32) == 1
    assert n_words(33) == 2
    assert n_words(64) == 2
    with pytest.raises(ValueError):
        n_words(0)


def test_pack_known_bits(spark):
    # dim=4: only bits 0..3 of word 0 can be set
    mat = np.array(
        [
            [1.0, -1.0, 0.5, 0.0],   # bits 0,2 -> 0b0101 = 5
            [-1.0, -1.0, -1.0, -1.0],  # 0
            [1.0, 1.0, 1.0, 1.0],    # 0b1111 = 15
        ]
    )
    got = (
        binarize(_mk(spark, mat), dim=4)
        .orderBy("id")
        .collect()
    )
    assert [r["w0"] for r in got] == [5, 0, 15]


def test_pack_matches_numpy_dim64(spark):
    rng = np.random.default_rng(7)
    mat = rng.standard_normal((50, 64))
    got = binarize(_mk(spark, mat), dim=64).orderBy("id").collect()
    want = _np_pack(mat)
    for r in got:
        assert r["w0"] == want[r["id"], 0]
        assert r["w1"] == want[r["id"], 1]
    # words from 32-bit packing are always non-negative
    assert all(r["w0"] >= 0 and r["w1"] >= 0 for r in got)


def test_search_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    mat = rng.standard_normal((120, 64))
    packed = binarize(_mk(spark, mat), dim=64).cache()
    queries = packed.filter(F.col("id") < 5)
    res = search_binary(packed, queries, dim=64, k=7).collect()

    pw = _np_pack(mat)
    dist = _np_hamming(pw[:5], pw)  # (5, 120)
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(range(5))
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, 8))
        # expected ids: sort all 120 by (hamming, id), take 7
        order = sorted(range(120), key=lambda i: (dist[qid, i], i))[:7]
        assert [r["id"] for r in rows] == order
        assert [r["hamming"] for r in rows] == [int(dist[qid, i]) for i in order]


def test_self_match_is_rank1(spark):
    rng = np.random.default_rng(3)
    mat = rng.standard_normal((40, 32))
    packed = binarize(_mk(spark, mat), dim=32)
    queries = packed.filter(F.col("id") == 17)
    top = (
        search_binary(packed, queries, dim=32, k=1)
        .collect()[0]
    )
    assert top["id"] == 17 and top["hamming"] == 0


# --- round 10: Hamming pre-filter + exact re-rank (two-stage) -------


def _qdf(spark, mat, ids):
    rows = [(int(i), [float(x) for x in mat[i]]) for i in ids]
    return spark.createDataFrame(rows, "query_id long, qvec array<float>")


def test_refined_full_oversample_equals_flat(spark):
    """refine covering the whole corpus ⇒ the candidate set is every
    row ⇒ results provably identical to exact flat search — the
    driver-oracle gate construction."""
    from gofaiss_spark.operators.binary import search_binary_refined
    from gofaiss_spark.operators.topk import search_flat

    rng = np.random.default_rng(21)
    mat = rng.standard_normal((90, 64))
    base = _mk(spark, mat).cache()
    packed = binarize(base, dim=64).cache()
    q = _qdf(spark, mat, range(4))
    got = sorted(
        (r.query_id, r.id, round(float(r.distance), 9), r.rank)
        for r in search_binary_refined(
            packed, base, q, dim=64, k=5, refine=90 // 5 + 1).collect()
    )
    want = sorted(
        (r.query_id, r.id, round(float(r.distance), 9), r.rank)
        for r in search_flat(base, q, k=5).collect()
    )
    assert got == want


def test_refined_candidates_bound_and_exact_distances(spark):
    """At shallow refine the result ids must come from the Hamming
    top-(k·refine) candidate set, and every reported distance must be
    the EXACT metric (recomputed vs numpy) — quantization error may
    cost recall, never distance fidelity."""
    from gofaiss_spark.operators.binary import search_binary_refined

    rng = np.random.default_rng(22)
    mat = rng.standard_normal((150, 64))
    base = _mk(spark, mat).cache()
    packed = binarize(base, dim=64).cache()
    q = _qdf(spark, mat, [3])
    k, refine = 4, 3
    res = search_binary_refined(
        packed, base, q, dim=64, k=k, refine=refine).collect()
    assert len(res) == k
    pw = _np_pack(mat)
    dist = _np_hamming(pw[3:4], pw)[0]
    cand = set(sorted(range(150), key=lambda i: (dist[i], i))[: k * refine])
    for r in res:
        assert r.id in cand
        exact = float(np.sum((mat[3] - mat[r.id]) ** 2) ** 0.5)
        assert abs(float(r.distance) - exact) < 1e-6
    with pytest.raises(ValueError):
        search_binary_refined(packed, base, q, dim=64, k=4, refine=0)
