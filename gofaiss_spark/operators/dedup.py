"""Deduplication operators for training-data pipelines.

Five strategies, all candidate-generation + verify shaped so nothing
ever goes O(n²) at scale (SURVEY.md §7 phase E):

- exact: hash-groupBy on a normalized fingerprint.
- MinHash + LSH banding: shingle → minhash signature → band-bucket
  self-join (candidates) → exact Jaccard verify.
- SimHash: token-hash sign aggregation → band-bucket join →
  Hamming-distance verify (JVM ``bit_count(xor)``).
- n-gram Jaccard: exact pairwise on a BOUNDED pair domain (the
  verify kernel; also usable standalone at small scale).
- embedding cosine: LSH bucket candidates → exact cosine verify.

Everything is DataFrame-native; the only Python is the NumPy inside
mapInPandas for simhash bit-packing.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gofaiss_spark.functions.text import (
    doc_fingerprint,
    doc_fingerprint_md5,
    word_shingles,
)


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

_FP_FNS = {"xxhash64": doc_fingerprint, "md5": doc_fingerprint_md5}


def exact_dup_groups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint: str = "xxhash64",
) -> DataFrame:
    """Groups of exact duplicates (normalized): one row per
    fingerprint with >1 member. Returns (fingerprint, n_docs, doc_ids)."""
    fp_fn = _FP_FNS[fingerprint]
    return (
        df.select(F.col(id_col).alias("doc_id"), fp_fn(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fingerprint: str = "xxhash64",
) -> DataFrame:
    """Keep the lowest-id representative of every fingerprint group.
    One shuffle (the groupBy); survivors keep all original columns.
    ``fingerprint="md5"`` is engine-portable (matches DuckDB md5())."""
    fp = df.withColumn("_fp", _FP_FNS[fingerprint](text_col))
    keep = fp.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return fp.join(keep, ["_fp", id_col], "inner").drop("_fp")


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, shingles, sig ARRAY<BIGINT>[num_hashes]).

    sig[i] = min over shingles of family_i(xxhash64(shingle)) — pure
    column expressions, fully codegen'd; the shingle arrays stay
    distributed. Each shingle STRING is hashed once; the num_hashes
    families re-hash the resulting 8-byte long (xxhash64(h, i)), which
    is ~num_hashes× less string hashing on the hot path.
    """
    return _hashed_signatures(df, text_col, id_col, num_hashes, shingle_n).drop("_h")


def _hashed_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
) -> DataFrame:
    """(doc_id, shingles, _h ARRAY<BIGINT>, sig): ``_h`` is the
    per-shingle 64-bit hash set — the working representation for both
    the signature and the exact-Jaccard verify (set sizes are
    preserved under the hash up to 2^-64 collisions)."""
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.lower(F.col(text_col)), shingle_n).alias("shingles"),
    ).filter(F.size("shingles") > 0)
    sh = sh.withColumn("_h", F.transform("shingles", lambda s: F.xxhash64(s)))

    def _minhash(i: int):
        # NB: the lambda must take exactly ONE arg — a two-arg lambda
        # makes F.transform pass (element, array_index), silently
        # replacing the hash-family index with the shingle position.
        return F.array_min(
            F.transform(F.col("_h"), lambda h: F.xxhash64(h, F.lit(i)))
        )

    sig = F.array(*[_minhash(i) for i in range(num_hashes)])
    return sh.withColumn("sig", sig)


def _band_hash_array(r: int, bands: int):
    """ARRAY of ``bands`` band hashes: xxhash64 over each row-chunk of
    ``sig`` (r signature slots per band — the LSH OR-construction)."""
    return F.array(
        *[
            F.xxhash64(*[F.col("sig").getItem(b * r + j) for j in range(r)])
            for b in range(bands)
        ]
    )


def minhash_bands(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """(doc_id, band, band_hash) — the narrow banding rows. This is
    the join/registry key set for candidate generation: batch pair
    mining (minhash_near_dup_pairs) self-joins it; the streaming
    dedup (streaming/ops.stream_near_dup_minhash) persists it as the
    incremental seen-registry. Docs with zero shingles emit no rows."""
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes {num_hashes} must divide into {bands} bands")
    r = num_hashes // bands
    sigs = _hashed_signatures(df, text_col, id_col, num_hashes, shingle_n)
    return sigs.select(
        "doc_id", F.posexplode(_band_hash_array(r, bands)).alias("band", "band_hash")
    )


def near_dup_dedup_batch(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """First-seen-wins near-dup FILTER (the dedup decision, not the
    pair report): keep a doc iff no lower-id doc shares any band
    hash. min-per-(band,hash) + all-bands check — two bounded
    shuffles on narrow keys. Docs with zero shingles are kept (they
    cannot collide). This is the batch twin of
    streaming/ops.stream_near_dup_minhash: identical output when the
    stream arrives in id order."""
    # One signature computation, reused by both the min-per-band pass
    # and the collision join below (without the checkpoint the full
    # scan→shingle→minhash lineage executed twice; see the matching
    # note in minhash_near_dup_pairs). Narrow rows only.
    bands_df = minhash_bands(
        df, text_col, id_col, num_hashes, bands, shingle_n
    ).localCheckpoint(eager=True)
    firsts = bands_df.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("_first_doc")
    )
    dup_ids = (
        bands_df.join(firsts, ["band", "band_hash"])
        .filter(F.col("_first_doc") < F.col("doc_id"))
        .select("doc_id")
        .distinct()
    )
    return df.join(
        dup_ids.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by MinHash banding + exact-Jaccard verify.

    Candidate pairs collide on ≥1 of ``bands`` band-hashes (LSH OR
    construction); the band self-join is on (band, band_hash) — the
    classic shuffle-bounded shape. Returns (doc_a, doc_b, jaccard)
    with doc_a < doc_b and jaccard ≥ threshold.
    """
    if num_hashes % bands != 0:
        raise ValueError(f"num_hashes {num_hashes} must divide into {bands} bands")
    r = num_hashes // bands
    sigs = _hashed_signatures(df, text_col, id_col, num_hashes, shingle_n)
    # Compute the signature pipeline ONCE and checkpoint the derived
    # (hashed-shingle set, band hashes) table: the plan below uses it
    # four times (both sides of the band self-join, both sides of the
    # verify attach), and without the checkpoint Catalyst re-executed
    # the full scan→shingle→32-family-minhash lineage per use — the
    # r12 before-plan showed 8 parquet scans / 0 reused exchanges for
    # one call (plans/r12/doc_minhash_near_dup_before.txt; guide §1.2
    # step 1 — don't compute things twice, §5 — cut lineage when the
    # intermediate is cheaper to hold than to recompute). The
    # checkpointed rows are the banding/verify proxy (hashes only,
    # O(corpus tokens) longs), never the documents themselves — the
    # §8 "decide with small rows" discipline.
    base = sigs.select(
        "doc_id", "_h", _band_hash_array(r, bands).alias("_bh")
    ).localCheckpoint(eager=True)
    # Banding on NARROW rows only — (doc_id, band, band_hash). The
    # shingle arrays must not ride the self-join shuffle: at scale
    # that multiplies every document's shingles by ``bands`` and
    # again by its candidate count.
    banded = base.select(
        "doc_id",
        F.posexplode(F.col("_bh")).alias("band", "band_hash"),
    )
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "band_hash")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "band_hash")
    cands = (
        left.join(right, ["band", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # Exact-Jaccard verify on the HASHED shingle sets (long arrays —
    # array_intersect over longs is far cheaper than over long
    # strings; set sizes are identical up to 2^-64 hash collisions),
    # attached only to the (small) candidate set: Catalyst broadcasts
    # the pair list, so the corpus-side arrays are scanned once per
    # side, never shuffled keyed on pairs.
    sh = base.select("doc_id", "_h")
    pairs = (
        cands.join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("_h").alias("sh_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("_h").alias("sh_b")),
            "doc_b",
        )
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        pairs.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, simhash BIGINT): 64-bit sign-aggregated token hashes.

    Token hashing is JVM-side (xxhash64 inside transform); the bit
    sign-sum runs vectorized in NumPy via mapInPandas (unpackbits over
    the token-hash bytes — no per-bit Python loop)."""
    from gofaiss_spark.functions.text import tokenize

    hashed = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(tokenize(text_col), lambda t: F.xxhash64(t)).alias("th"),
    ).filter(F.size("th") > 0)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = np.empty(len(pdf), dtype=np.int64)
            for i, th in enumerate(pdf["th"]):
                h = np.asarray(th, dtype=np.int64).view(np.uint64)
                bits = np.unpackbits(
                    h[:, None].view(np.uint8), axis=1, bitorder="little"
                )  # (n_tokens, 64)
                votes = bits.sum(axis=0) * 2 - len(h)  # (+1/-1 sums)
                packed = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
                out[i] = packed.view(np.int64)[0]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(), "simhash": out})

    return hashed.mapInPandas(part, schema="doc_id long, simhash long")


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) ≤ max_hamming.

    Candidates collide on one of ``bands`` 16-bit chunks (pigeonhole:
    any pair within Hamming ≤ bands−1 must agree on ≥1 chunk);
    verification is JVM ``bit_count(a XOR b)``. Returns
    (doc_a, doc_b, hamming)."""
    sh = simhash(df, text_col, id_col)
    width = 64 // bands
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("chunk"),
            )
            for b in range(bands)
        ]
    )
    banded = sh.select("doc_id", "simhash", F.explode(chunks).alias("c")).select(
        "doc_id", "simhash", F.col("c.band").alias("band"), F.col("c.chunk").alias("chunk")
    )
    left = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("h_a"), "band", "chunk"
    )
    right = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("h_b"), "band", "chunk"
    )
    return (
        left.join(right, ["band", "chunk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"))
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, bounded domain)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 1,
    threshold: float = 0.9,
) -> DataFrame:
    """Exact pairwise Jaccard over shingle sets.

    For ``threshold > 0`` (every real caller) this is an
    inverted-index equi-join, NOT a cross join: explode the distinct
    shingles, self-join on the shingle hash, count common shingles
    per pair, and derive |A∪B| = |A| + |B| − |A∩B|. Identical output
    to the all-pairs formulation — a pair with zero common shingles
    has jaccard 0 and can never reach a positive threshold — but the
    work is proportional to Σ_shingle df(shingle)² instead of n²,
    it parallelizes across shuffle partitions (the cross join
    degenerated to ONE broadcast-nested-loop task), and the join
    shuffles 8-byte shingle hashes instead of document payloads
    (guide: joins §3.3 / shuffle-fewer-bytes §2.3). The shingle hash
    is the repo-wide xxhash64 set convention (collisions 2⁻⁶⁴, same
    contract as the MinHash verify kernel).

    ``threshold ≤ 0`` keeps the literal all-pairs cross join (it must
    report jaccard-0 pairs too — only a verify kernel at tiny scale
    wants that). Returns (doc_a, doc_b, jaccard).
    """
    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(text_col, shingle_n).alias("sh"),
    )
    if threshold <= 0:
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
        b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
        jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
            F.array_union("sh_a", "sh_b")
        )
        return (
            a.crossJoin(b)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    ex = sh.select(
        "doc_id",
        F.size("sh").alias("nsh"),
        F.explode("sh").alias("_s"),
    ).select("doc_id", "nsh", F.xxhash64("_s").alias("_sh"))
    a = ex.select(
        F.col("doc_id").alias("doc_a"), F.col("nsh").alias("_na"), "_sh"
    )
    b = ex.select(
        F.col("doc_id").alias("doc_b"), F.col("nsh").alias("_nb"), "_sh"
    )
    inter = (
        a.join(b, "_sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "_na", "_nb")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    jac = F.col("_c") / (F.col("_na") + F.col("_nb") - F.col("_c"))
    return (
        inter.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


#: cell budget (n·dim) for the broadcast-matrix GEMM prefilter of the
#: exact arm — same family as ivf.LOCAL_TRAIN_MAX_CELLS; above it the
#: exact arm falls back to the literal cross join (the exact arm is a
#: bounded verify kernel by contract, so the fallback is theoretical)
_EXACT_GEMM_MAX_CELLS = 32_000_000

#: completeness margin for the GEMM prefilter: f64 GEMM differs from
#: the Catalyst per-pair sum by ulps (~1e-14 relative); 1e-6 — one
#: full rounding quantum of the reported 6dp value — is overwhelming
_EXACT_GEMM_MARGIN = 1e-6


def _exact_cosine_candidates(base: DataFrame, threshold: float) -> DataFrame:
    """Candidate (id_a, id_b) pairs with cosine similarity ≥
    threshold − margin, via one blocked f64 GEMM per Arrow batch
    against the broadcast normalized corpus matrix.

    This is a PREFILTER in the repo's guarded-kernel pattern (the
    flat-top-k f32-select + exact-re-score shape, topk.py): it may
    only over-select — every surviving pair is re-scored by the exact
    Catalyst expression afterwards, so reported values and the final
    pair set are bit-identical to the all-pairs formulation while the
    scoring drops from an O(n²) single-task broadcast-nested-loop
    join (89 s at sf0.1) to one vectorized GEMM pass (guide §4.2 —
    hand whole batches to native code). Zero vectors keep the
    CosineDistance zero→1.0 convention: their surrogate norm makes
    every similarity exactly 0.0, identical to 1 − 1.0.

    The corpus matrix is collected once and broadcast — bounded by
    the exact arm's verify-kernel contract and gated by
    ``_EXACT_GEMM_MAX_CELLS`` (the documented ≤1M driver-side-build
    discipline); above the gate the caller's literal cross join runs.
    """
    spark = base.sparkSession
    first = base.select(F.size("vec").alias("d")).first()
    dim = int(first["d"]) if first is not None else 0
    n = base.count()
    if n == 0 or dim == 0 or n * dim > _EXACT_GEMM_MAX_CELLS:
        a = base.select(F.col("id").alias("id_a"))
        b = base.select(F.col("id").alias("id_b"))
        return a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    pdf_all = base.toPandas()
    ids_all = pdf_all["id"].to_numpy(dtype=np.int64)
    mat = np.stack(pdf_all["vec"].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    matn = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids_all, matn))
    cut = float(threshold) - _EXACT_GEMM_MARGIN

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, matn_b = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            an = np.linalg.norm(a, axis=1)
            an[an == 0.0] = 1.0
            sims = (a / an[:, None]) @ matn_b.T  # (batch, n)
            ida = pdf["id"].to_numpy(dtype=np.int64)
            ii, jj = np.where(
                (sims >= cut) & (ida[:, None] < ids_b[None, :])
            )
            yield pd.DataFrame(
                {"id_a": ida[ii], "id_b": ids_b[jj]}
            )

    return base.select("id", "vec").mapInPandas(
        part, schema="id_a long, id_b long"
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "vec",
    id_col: str = "id",
    threshold: float = 0.95,
    num_hash_tables: int = 6,
    exact: bool = False,
    seed: int = 42,
) -> DataFrame:
    """Pairs with cosine similarity ≥ threshold.

    ``exact=True`` scores all pairs (bounded inputs / oracles);
    otherwise LSH bucket candidates (cosine mode) + exact verify —
    the 100 TB path. Returns (id_a, id_b, cos_sim)."""
    from gofaiss_spark.functions.distance import cosine_distance

    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if exact:
        pairs = _exact_cosine_candidates(base, threshold)
        pairs = pairs.join(
            base.select(F.col("id").alias("id_a"), F.col("vec").alias("v_a")),
            "id_a",
        ).join(
            base.select(F.col("id").alias("id_b"), F.col("vec").alias("v_b")),
            "id_b",
        )
        sim = 1.0 - cosine_distance("v_a", "v_b")
        return (
            pairs.withColumn("cos_sim", F.round(sim, 6))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim")
        )
    from gofaiss_spark.operators.lsh import build_lsh

    idx = build_lsh(
        base, metric="cosine", num_hash_tables=num_hash_tables, seed=seed
    )
    # Same narrow-candidate shape as minhash banding: the bucket
    # self-join moves only (id, t, bucket); vectors are attached to
    # the deduped pair set afterwards (broadcast pair list → the
    # vector table is never shuffled on pair keys). Checkpoint the
    # narrow bucket rows so the hashing pass runs ONCE instead of
    # once per side of the self-join (r12; guide §1.2 step 1).
    bk = idx.buckets.select("t", "bucket", "id").localCheckpoint(eager=True)
    cands = (
        bk.select(F.col("id").alias("id_a"), "t", "bucket")
        .join(bk.select(F.col("id").alias("id_b"), "t", "bucket"), ["t", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    first = base.select(F.size("vec").alias("d")).first()
    dim = int(first["d"]) if first is not None else 0
    if 0 < base.count() * dim <= _EXACT_GEMM_MAX_CELLS:
        # Bounded-corpus fast path (r12): intersect the LSH candidate
        # set with the guarded GEMM prefilter before the exact scorer.
        # The prefilter only ever over-selects (margin one full 6dp
        # rounding quantum vs ~1e-14 GEMM ulps), and every surviving
        # pair still gets the identical Catalyst re-score below — the
        # emitted pair set and values are bit-identical to scoring
        # every candidate; the per-pair HOF work just stops being
        # spent on the ~99% of candidates the threshold rejects.
        # Above the cell bound, score all candidates (the 100 TB
        # path, where per-bucket candidate counts are bounded).
        cands = cands.join(
            _exact_cosine_candidates(base, threshold), ["id_a", "id_b"]
        )
    pairs = (
        cands.join(
            base.select(F.col("id").alias("id_a"), F.col("vec").alias("v_a")), "id_a"
        )
        .join(
            base.select(F.col("id").alias("id_b"), F.col("vec").alias("v_b")), "id_b"
        )
    )
    sim = 1.0 - cosine_distance("v_a", "v_b")
    return (
        pairs.withColumn("cos_sim", F.round(sim, 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


# ---------------------------------------------------------------------------
# connected components (duplicate clusters)
# ---------------------------------------------------------------------------


def _components_single_task(pairs: DataFrame) -> DataFrame:
    """Exact connected components in ONE executor task: union-find
    with path compression over the (already materialized, known-small)
    pair list, streamed in as Arrow batches. Union-by-min keeps the
    component root at the smallest id, so ``find`` returns the
    cluster id directly. Emits after the last batch (union-find needs
    the full edge set before any component is final)."""

    def uf(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parent: dict = {}
        nodes: set = set()

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for a, b in zip(
                pdf["src"].to_numpy().tolist(), pdf["dst"].to_numpy().tolist()
            ):
                nodes.add(a)
                nodes.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra
        out = sorted(nodes)
        yield pd.DataFrame(
            {"doc_id": out, "cluster_id": [find(n) for n in out]}
        )

    return pairs.repartition(1).mapInPandas(uf, "doc_id long, cluster_id long")


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iterations: int = 50,
    local_threshold: int = 2_000_000,
) -> DataFrame:
    """Label every node of the near-dup pair graph with the smallest
    id in its connected component — the canonical cluster id the
    dedup decision keys on (pairs say "these two are dups"; clusters
    say "these seventeen are one document").

    Two physical strategies, picked from the MATERIALIZED pair count
    (the AQE philosophy — runtime stats, not guesses):

    - **small graph** (≤ ``local_threshold`` pairs): exact union-find
      in one executor task (``mapInPandas`` over ``repartition(1)``).
      The pair list is post-verify output, orders of magnitude
      smaller than the corpus; a few million pairs resolve in one
      pass with zero shuffle rounds, where the iterative path would
      pay several whole-cluster barriers to converge.
    - **large graph**: min-label propagation — each round every node
      takes the min of its own label and its neighbors' labels;
      converges in O(diameter) rounds, and near-dup components are
      shallow (most members collide with the same representative
      bands). Each round is one shuffle of the narrow (src, label)
      edge join; ``localCheckpoint`` truncates the plan lineage so
      round N's plan does not embed rounds 1..N-1. Same algorithm
      GraphFrames/GraphX use for their connectedComponents.

    Returns (doc_id, cluster_id) for every node that appears in
    ``pairs``."""
    base = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if base.count() <= local_threshold:
        return _components_single_task(base)

    # both directions via ONE explode over the checkpointed base — a
    # self-union would re-evaluate the pair-mining plan twice
    edges = (
        base.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select("src")
        .distinct()
        .select(F.col("src").alias("node"), F.col("src").alias("label"))
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(
                labels.withColumnRenamed("node", "dst"), "dst"
            )
            .groupBy("src")
            .agg(F.min("label").alias("_nmin"))
        )
        new_labels = (
            labels.join(
                neighbor_min.withColumnRenamed("src", "node"), "node", "left"
            )
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nmin"), F.col("label"))
                ).alias("label"),
            )
            # lazy: the convergence count below is the materializing
            # action, so each round costs ONE job, not two
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def near_dup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash pair mining → connected components: (doc_id,
    cluster_id) for every document that has at least one verified
    near-duplicate. Keep-one-per-cluster is then
    ``filter(doc_id == cluster_id)`` — the principled dedup decision
    (transitively closed), vs. near_dup_dedup_batch's cheaper
    band-collision first-seen-wins."""
    pairs = minhash_near_dup_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_n, threshold
    )
    return connected_components(pairs, "doc_a", "doc_b")


def substring_dup_spans(
    docs: DataFrame,
    shingle_len: int = 40,
    stride: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-substring detection (the public "Deduplicating
    Training Data Makes Language Models Better" (Lee et al. 2022)
    signal, approximated with fixed-length strided shingles instead of
    a suffix array): a span is duplicated when the identical
    ``shingle_len``-char substring occurs in ≥2 distinct documents.

    Returns (doc_id, n_shingles, n_dup_shingles, dup_fraction) for
    every document long enough to produce at least one shingle —
    fully deterministic, hash-checked against a SQL oracle.

    Scale shape: shingle generation is a JVM expression (sequence +
    substring — no Python); the duplicate decision is ONE groupBy
    shuffle keyed on the shingle (a 100 TB suffix array is
    infeasible; strided shingles are the standard distributed
    approximation) followed by a semi-join back per doc. Shingle keys
    could be hashed (xxhash64) to cut shuffle width at scale; kept as
    raw strings here so the oracle is engine-portable.
    """
    n_sh = (F.length(text_col) - F.lit(shingle_len)) / F.lit(stride)
    sh = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.floor(n_sh).cast("int")),
                    lambda i: F.substring(
                        F.col(text_col), i * stride + 1, shingle_len
                    ),
                )
            ).alias("shingle"),
        )
        .filter(F.length("shingle") == shingle_len)
    )
    dup = (
        sh.groupBy("shingle")
        .agg(F.count_distinct("doc_id").alias("_nd"))
        .filter(F.col("_nd") >= 2)
        .select("shingle")
    )
    # no broadcast hint: the duplicated-shingle set is corpus-sized in
    # the worst case — AQE picks broadcast when it is actually small
    flagged = sh.join(dup, "shingle", "left_semi").groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("n_dup_shingles"))
    per_doc = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        per_doc.join(flagged, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_dup_shingles", F.lit(0)).alias("n_dup_shingles"),
            F.round(
                F.coalesce("n_dup_shingles", F.lit(0))
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("dup_fraction"),
        )
    )


def estimate_minhash_params(
    threshold: float,
    num_hashes: int = 128,
) -> dict:
    """Pick (bands, rows_per_band) for a target Jaccard threshold.

    Standard S-curve analysis (Leskovec/Rajaraman/Ullman, "Mining of
    Massive Datasets" ch. 3 — public): with b bands of r rows each,
    a pair with Jaccard similarity s collides with probability
    1 - (1 - s^r)^b, and the curve's inflection sits near
    t ≈ (1/b)^(1/r). Among all (b, r) with b·r = num_hashes, choose
    the factorization whose implied t is closest to ``threshold``.

    Returns {"bands", "rows_per_band", "implied_threshold",
    "p_collision_at_threshold", "p_collision"} where ``p_collision``
    is a callable s → collision probability, for plotting the curve
    or bounding FP/FN rates before committing a 100 TB dedup run —
    parameter tuning is O(divisors(num_hashes)) driver-side math,
    zero Spark jobs.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    if num_hashes < 2:
        raise ValueError(f"num_hashes must be >= 2, got {num_hashes}")
    best = None
    for b in range(1, num_hashes + 1):
        if num_hashes % b:
            continue
        r = num_hashes // b
        if b < 2 or r < 1:
            continue
        t = (1.0 / b) ** (1.0 / r)
        if best is None or abs(t - threshold) < abs(best[2] - threshold):
            best = (b, r, t)
    b, r, t = best

    def p_collision(s: float) -> float:
        return 1.0 - (1.0 - s ** r) ** b

    return {
        "bands": b,
        "rows_per_band": r,
        "implied_threshold": round(t, 6),
        "p_collision_at_threshold": round(p_collision(threshold), 6),
        "p_collision": p_collision,
    }
