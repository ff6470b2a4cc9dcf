"""Index persistence: partitioned Parquet + ``_meta.json`` sidecar.

Reference: pkg/storage (serialize.go:27-73 gob/json+gzip writers,
version.go:8-90 version header with major-must-match compat). Spark
disposition (SURVEY.md §2.4): Parquet IS the binary format
(compression built-in); the version header becomes a
``format_version`` field in ``_meta.json`` with the same compat rule.

Layout on disk (all relative to the index root):
    _meta.json                    {index_type, dim, metric, params, format_version}
    vectors/     (flat, lsh)      parquet
    centroids/   (ivf, ivfpq)     parquet (list_id, centroid)
    assignments/ (ivf)            parquet partitionBy(list_id)  ← nprobe pruning
    codebooks/   (pq, ivfpq)      parquet (m, k, centroid)
    codes/       (pq)             parquet; (ivfpq) partitionBy(list_id)

partitionBy("list_id") is the load-bearing choice: an nprobe search
filters list_id IN (...) and Catalyst prunes the untouched partition
directories at file-listing time — scan cost scales with
nprobe/nlist, not table size (SURVEY.md §4 row 4).
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

FORMAT_VERSION = "1.0.0"


def check_version_compat(found: str) -> None:
    """Major must match; minor is backward-compatible
    (version.go:63-90)."""
    cur_major = int(FORMAT_VERSION.split(".")[0])
    try:
        found_major, found_minor = (int(x) for x in found.split(".")[:2])
    except (ValueError, AttributeError) as e:
        raise ValueError(f"unparseable format_version {found!r}") from e
    if found_major != cur_major:
        raise ValueError(
            f"incompatible format_version {found} (current {FORMAT_VERSION}): "
            "major version must match"
        )
    cur_minor = int(FORMAT_VERSION.split(".")[1])
    if found_minor > cur_minor:
        raise ValueError(
            f"format_version {found} is newer than supported {FORMAT_VERSION}"
        )


# ---------------------------------------------------------------------------
# Version migration registry (VersionMigrator parity, version.go:96-126):
# from→to migration functions over on-disk artifacts. A migration takes
# (spark, path, meta) and returns the updated meta dict; migrate_index
# walks the chain until the target version is reached.
# ---------------------------------------------------------------------------

_MIGRATIONS: dict[str, tuple[str, object]] = {}


def register_migration(from_version: str, to_version: str, fn) -> None:
    """Register ``fn(spark, path, meta) -> meta`` migrating an index
    artifact from ``from_version`` to ``to_version``."""
    _MIGRATIONS[from_version] = (to_version, fn)


def migrate_index(spark: SparkSession, path: str, target: str | None = None) -> dict:
    """Walk registered migrations from the artifact's current
    format_version to ``target`` (default: FORMAT_VERSION). Raises if
    no chain reaches the target. Returns the final meta dict."""
    target = target or FORMAT_VERSION
    meta = _read_meta_raw(path)
    seen = set()
    while meta.get("format_version") != target:
        cur = meta.get("format_version")
        if cur in seen:
            raise ValueError(f"migration cycle detected at {cur}")
        seen.add(cur)
        if cur not in _MIGRATIONS:
            raise ValueError(
                f"no migration path from {cur} to {target} for {path}"
            )
        to_version, fn = _MIGRATIONS[cur]
        meta = fn(spark, path, dict(meta))
        meta["format_version"] = to_version
        with open(os.path.join(path, "_meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return meta


def artifact_size_mb(path: str) -> float:
    """On-disk footprint (MiB) of a saved index artifact — the
    Parquet-era analogue of the reference's MemoryUsageMB
    (stats.go:4-10; SURVEY.md §4 row 13): sum of all files under the
    artifact directory (parquet parts + _meta.json)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / (1024 * 1024)


def _read_meta_raw(path: str) -> dict:
    with open(f"{path}/_meta.json") as f:
        return json.load(f)


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_meta.json"), "w") as f:
        json.dump({**meta, "format_version": FORMAT_VERSION}, f, indent=2)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, "_meta.json")) as f:
        meta = json.load(f)
    check_version_compat(meta.get("format_version", ""))
    return meta


def _centroids_to_df(spark: SparkSession, centroids: np.ndarray):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in c]) for i, c in enumerate(centroids)],
        schema="list_id int, centroid array<double>",
    )


def _codebooks_to_df(spark: SparkSession, codebooks: np.ndarray):
    mm, ksub, _ = codebooks.shape
    rows = [
        (int(m), int(k), [float(x) for x in codebooks[m, k]])
        for m in range(mm)
        for k in range(ksub)
    ]
    return spark.createDataFrame(rows, schema="m int, k int, centroid array<double>")


def _df_to_centroids(df, nlist: int, dim: int) -> np.ndarray:
    out = np.zeros((nlist, dim), dtype=np.float64)
    for r in df.collect():
        out[r.list_id] = np.asarray(r.centroid)
    return out


def _df_to_codebooks(df, m: int, ksub: int, dsub: int) -> np.ndarray:
    out = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in df.collect():
        out[r.m, r.k] = np.asarray(r.centroid)
    return out


def _write_df(df, path: str, fmt: str, partition_by: str | None = None) -> None:
    """Write one artifact component. For the JSON debug format a
    ``_schema.json`` sidecar (underscore prefix → ignored by Spark's
    hidden-file filter) preserves exact types for the round-trip."""
    if partition_by:
        # Cluster rows by the partition key BEFORE the partitioned
        # write (optimization r12; guide §6 — coalesce on write, aim
        # for few well-sized files): an unclustered partitionBy makes
        # EVERY input task open one file per key it holds — W tasks ×
        # nlist keys ≈ W·nlist tiny files per artifact (measured: the
        # ivf_save bench row spent its 4 s on file create/commit, not
        # bytes). Hash-distributing by the key first writes one file
        # per key — the Iceberg write.distribution-mode=hash shape.
        df = df.repartition(F.col(partition_by))
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    getattr(w, fmt)(path)
    if fmt == "json":
        with open(os.path.join(path, "_schema.json"), "w") as f:
            f.write(df.schema.json())


def export_index_json(index, path: str) -> None:
    """Human-readable JSON debug export of an index artifact —
    line-delimited JSON per component, same directory layout as the
    Parquet format (SaveToFileJSON parity, pkg/storage/json.go:15-56;
    cross-format round-trip mirrors serialize_test.go:300-370).
    ``load_index`` reads it back via the ``format`` field in
    _meta.json."""
    save_index(index, path, fmt="json")


def _is_pca(index) -> bool:
    from gofaiss_spark.operators.pca import PcaModel

    return isinstance(index, PcaModel)


def _is_sq(index) -> bool:
    from gofaiss_spark.operators.sq import SqIndex

    return isinstance(index, SqIndex)


def _is_ivfsq(index) -> bool:
    from gofaiss_spark.operators.ivfsq import IvfSqIndex

    return isinstance(index, IvfSqIndex)


def _is_hnsw_sharded(index) -> bool:
    from gofaiss_spark.operators.hnsw import HnswShardedIndex

    return isinstance(index, HnswShardedIndex)


def _is_opq(index) -> bool:
    from gofaiss_spark.operators.opq import OpqIndex

    return isinstance(index, OpqIndex)


def _is_hnsw_routed(index) -> bool:
    from gofaiss_spark.operators.hnsw import HnswRoutedIndex

    return isinstance(index, HnswRoutedIndex)


def save_index(index, path: str, fmt: str = "parquet") -> None:
    """Persist any index artifact (Save parity: flat.go:123-147,
    ivfpq.go:367-470 — but Parquet, not gob; ``fmt="json"`` gives the
    debug export of pkg/storage/json.go)."""
    from gofaiss_spark.operators.flat import FlatIndex
    from gofaiss_spark.operators.ivf import IvfIndex
    from gofaiss_spark.operators.ivfpq import IvfPqIndex
    from gofaiss_spark.operators.lsh import LshIndex
    from gofaiss_spark.operators.pq import PqIndex

    from gofaiss_spark.operators.retrieval import TextIndex, save_text_index

    if fmt not in ("parquet", "json"):
        raise ValueError(f"unknown artifact format {fmt!r}")

    if isinstance(index, TextIndex):
        # bucketed-postings layout + sidecar handled by the retrieval
        # module (partition pruning contract documented there); the
        # layout is parquet-only — honoring fmt="json" would silently
        # drop the bucket-pruning contract, so reject it instead
        if fmt != "parquet":
            raise ValueError(
                f"text indexes persist as bucketed parquet only, got fmt={fmt!r}"
            )
        save_text_index(index, path)
        return

    def wm(meta: dict) -> None:
        _write_meta(path, {**meta, "format": fmt})

    if isinstance(index, FlatIndex):
        wm({"index_type": "flat", "dim": index.dim, "metric": index.metric})
        _write_df(index.vectors, f"{path}/vectors", fmt)
    elif isinstance(index, IvfIndex):
        wm(
            {
                "index_type": "ivf",
                "dim": index.dim,
                "metric": index.metric,
                "params": {"nlist": index.nlist},
            }
        )
        spark = index.assignments.sparkSession
        _write_df(_centroids_to_df(spark, index.centroids), f"{path}/centroids", fmt)
        _write_df(index.assignments, f"{path}/assignments", fmt, "list_id")
    elif isinstance(index, PqIndex):
        wm(
            {
                "index_type": "pq",
                "dim": index.dim,
                "metric": "l2",
                "params": {"m": index.m, "nbits": index.nbits},
            }
        )
        spark = index.codes.sparkSession
        _write_df(_codebooks_to_df(spark, index.codebooks), f"{path}/codebooks", fmt)
        _write_df(index.codes, f"{path}/codes", fmt)
    elif _is_opq(index):
        wm(
            {
                "index_type": "opq",
                "dim": index.dim,
                "metric": "l2",
                "params": {
                    "m": index.m,
                    "nbits": index.nbits,
                    # ADVICE r11: persist the rotate="auto" decision
                    # so stats() after a save/load round trip reports
                    # the same rotation_trained/spectral_energy the
                    # live index did (a skipped rotation must not
                    # come back as "trained")
                    "rotation_trained": bool(index.rotation_trained),
                    "spectral_energy": index.spectral_energy,
                },
            }
        )
        spark = index.pq.codes.sparkSession
        rot_df = spark.createDataFrame(
            [(int(i), [float(x) for x in row]) for i, row in enumerate(index.rotation)],
            schema="i int, row array<double>",
        )
        _write_df(rot_df, f"{path}/rotation", fmt)
        _write_df(_codebooks_to_df(spark, index.pq.codebooks), f"{path}/codebooks", fmt)
        _write_df(index.pq.codes, f"{path}/codes", fmt)
    elif isinstance(index, IvfPqIndex):
        wm(
            {
                "index_type": "ivfpq",
                "dim": index.dim,
                "metric": index.metric,
                "params": {
                    "nlist": index.nlist,
                    "m": index.m,
                    "nbits": index.nbits,
                },
            }
        )
        spark = index.codes.sparkSession
        _write_df(_centroids_to_df(spark, index.centroids), f"{path}/centroids", fmt)
        _write_df(_codebooks_to_df(spark, index.codebooks), f"{path}/codebooks", fmt)
        _write_df(index.codes, f"{path}/codes", fmt, "list_id")
    elif isinstance(index, LshIndex):
        wm(
            {
                "index_type": "lsh",
                "dim": index.dim,
                "metric": index.metric,
                "params": {
                    "bucket_length": index.bucket_length,
                    "num_hash_tables": index.num_hash_tables,
                    "seed": index.seed,
                    "projections": [[float(x) for x in r] for r in index.projections],
                    "offsets": [float(x) for x in index.offsets],
                },
            }
        )
        # partitionBy("t"): a search joins one bucket table at a time;
        # vectors are stored ONCE, not per table (the ×L payload copy
        # is the artifact-size killer at scale)
        _write_df(index.buckets, f"{path}/buckets", fmt, "t")
        _write_df(index.vectors, f"{path}/vectors", fmt)
    elif _is_ivfsq(index):
        wm(
            {
                "index_type": "ivfsq",
                "dim": index.dim,
                "metric": index.metric,
                "params": {
                    "nlist": index.nlist,
                    "vmin": [float(x) for x in index.vmin],
                    "vmax": [float(x) for x in index.vmax],
                },
            }
        )
        spark = index.codes.sparkSession
        _write_df(_centroids_to_df(spark, index.centroids), f"{path}/centroids", fmt)
        _write_df(index.codes, f"{path}/codes", fmt, "list_id")
    elif _is_sq(index):
        wm(
            {
                "index_type": "sq",
                "dim": index.dim,
                "metric": index.metric,
                "params": {
                    "vmin": [float(x) for x in index.vmin],
                    "vmax": [float(x) for x in index.vmax],
                },
            }
        )
        _write_df(index.codes, f"{path}/codes", fmt)
    elif _is_pca(index):
        # components are k×dim floats (a few KB) — they ride in the
        # meta like the LSH projections; no table to write
        wm(
            {
                "index_type": "pca",
                "dim": index.dim,
                "metric": "l2",
                "params": {
                    "k": index.k,
                    "components": [
                        [float(x) for x in r] for r in index.components
                    ],
                    "explained_variance": [
                        float(x) for x in index.explained_variance
                    ],
                },
            }
        )
    elif _is_hnsw_sharded(index):
        # per-shard graph blobs: the table IS the index (one pickled
        # graph per shard row, bounded by rows_per_shard at build);
        # partitionBy("shard_id") so a future selective-shard serve
        # can prune. JSON export is skipped for the binary blob
        # payload — meta + shard manifest only.
        dims = index.blobs.agg(F.max("dim").alias("d")).collect()[0]["d"]
        wm(
            {
                "index_type": "hnsw_sharded",
                "dim": int(dims or 0),
                "metric": index.metric,
                "params": {
                    "m": index.m,
                    "ef_construction": index.ef_construction,
                    "ef_search": index.ef_search,
                    "num_shards": index.num_shards,
                },
            }
        )
        _write_df(index.blobs, f"{path}/shards", "parquet", "shard_id")
    elif _is_hnsw_routed(index):
        # routed variant: hnsw_sharded's blob table plus the coarse
        # centroid routing table (IVF-style); shards partitioned by
        # shard_id so a routed serve over the persisted artifact can
        # partition-prune to the probed cells.
        dims = index.blobs.agg(F.max("dim").alias("d")).collect()[0]["d"]
        wm(
            {
                "index_type": "hnsw_routed",
                "dim": int(dims or 0),
                "metric": index.metric,
                "params": {
                    "m": index.m,
                    "ef_construction": index.ef_construction,
                    "ef_search": index.ef_search,
                    "nlist": index.nlist,
                    "default_nprobe": index.default_nprobe,
                },
            }
        )
        spark = index.blobs.sparkSession
        _write_df(
            _centroids_to_df(spark, index.centroids), f"{path}/centroids", "parquet"
        )
        _write_df(index.blobs, f"{path}/shards", "parquet", "shard_id")
    else:
        from gofaiss_spark.operators.hnsw import HnswIndex

        if not isinstance(index, HnswIndex):
            raise TypeError(f"cannot save index of type {type(index).__name__}")
        g = index.graph
        spark = index.spark
        wm(
            {
                "index_type": "hnsw",
                "dim": g.dim,
                "metric": g.metric,
                "params": {
                    "m": g.m,
                    "ef_construction": g.ef_construction,
                    "ef_search": index.ef_search,
                    "seed": index.seed,
                    "entry_point_id": int(g.ids[g.entry_point])
                    if g.entry_point >= 0
                    else -1,
                    "max_level": g.max_level,
                },
            }
        )
        nodes = spark.createDataFrame(
            [
                (int(g.ids[i]), int(g.levels[i]), [float(x) for x in g.vecs[i]])
                for i in range(g.n())
                if g.levels[i] >= 0
            ],
            schema="id long, level int, vec array<float>",
        )
        _write_df(nodes, f"{path}/nodes", fmt)
        _write_df(index.edges_df(spark), f"{path}/edges", fmt)


def load_index(spark: SparkSession, path: str):
    """Load an index artifact by its ``_meta.json`` index_type — the
    NewSearcher/detectIndexType analogue (search.go:42-53, :193-208),
    but dispatching on declared metadata instead of a type switch."""
    from gofaiss_spark.operators.flat import FlatIndex
    from gofaiss_spark.operators.ivf import IvfIndex
    from gofaiss_spark.operators.ivfpq import IvfPqIndex
    from gofaiss_spark.operators.lsh import LshIndex
    from gofaiss_spark.operators.pq import PqIndex

    meta = _read_meta(path)
    itype = meta["index_type"]
    if itype == "text_bm25":
        from gofaiss_spark.operators.retrieval import load_text_index

        return load_text_index(spark, path)
    dim = int(meta["dim"])
    fmt = meta.get("format", "parquet")

    def rd(name: str):
        p = f"{path}/{name}"
        if fmt == "json":
            from pyspark.sql.types import StructType

            with open(os.path.join(p, "_schema.json")) as f:
                schema = StructType.fromJson(json.load(f))
            return spark.read.schema(schema).json(p)
        return spark.read.parquet(p)

    if itype == "flat":
        return FlatIndex(
            metric=meta["metric"],
            dim=dim,
            vectors=rd("vectors"),
        )
    if itype == "ivf":
        nlist = int(meta["params"]["nlist"])
        cents = _df_to_centroids(rd("centroids"), nlist, dim)
        return IvfIndex(
            metric=meta["metric"],
            nlist=nlist,
            dim=dim,
            centroids=cents,
            assignments=rd("assignments"),
        )
    if itype == "pq":
        m = int(meta["params"]["m"])
        nbits = int(meta["params"]["nbits"])
        cb = _df_to_codebooks(rd("codebooks"), m, 1 << nbits, dim // m)
        return PqIndex(
            dim=dim,
            m=m,
            nbits=nbits,
            codebooks=cb,
            codes=rd("codes"),
        )
    if itype == "opq":
        from gofaiss_spark.operators.opq import OpqIndex

        m = int(meta["params"]["m"])
        nbits = int(meta["params"]["nbits"])
        cb = _df_to_codebooks(rd("codebooks"), m, 1 << nbits, dim // m)
        rot = np.zeros((dim, dim), dtype=np.float64)
        for r in rd("rotation").collect():
            rot[r.i] = np.asarray(r.row)
        pq = PqIndex(dim=dim, m=m, nbits=nbits, codebooks=cb, codes=rd("codes"))
        # pre-r12 artifacts lack the two fields: derive
        # rotation_trained from the matrix itself (identity ⇔ the
        # auto gate skipped rotation) — the ADVICE r11 fallback
        se = meta["params"].get("spectral_energy")
        rt = meta["params"].get(
            "rotation_trained", not np.allclose(rot, np.eye(dim)))
        return OpqIndex(dim=dim, m=m, nbits=nbits, rotation=rot, pq=pq,
                        rotation_trained=bool(rt),
                        spectral_energy=se)
    if itype == "ivfpq":
        p = meta["params"]
        nlist, m, nbits = int(p["nlist"]), int(p["m"]), int(p["nbits"])
        cents = _df_to_centroids(rd("centroids"), nlist, dim)
        cb = _df_to_codebooks(rd("codebooks"), m, 1 << nbits, dim // m)
        return IvfPqIndex(
            metric=meta["metric"],
            nlist=nlist,
            dim=dim,
            m=m,
            nbits=nbits,
            centroids=cents,
            codebooks=cb,
            codes=rd("codes"),
            colocated=True,  # partitionBy("list_id") artifact: rows
            # arrive list-contiguous, no re-shuffle needed for ADC
        )
    if itype == "lsh":
        p = meta["params"]
        return LshIndex(
            metric=meta["metric"],
            dim=dim,
            bucket_length=float(p["bucket_length"]),
            num_hash_tables=int(p["num_hash_tables"]),
            seed=int(p["seed"]),
            projections=np.asarray(p["projections"], dtype=np.float64),
            offsets=np.asarray(p["offsets"], dtype=np.float64),
            buckets=rd("buckets"),
            vectors=rd("vectors"),
        )
    if itype == "ivfsq":
        from gofaiss_spark.operators.ivfsq import IvfSqIndex

        p = meta["params"]
        nlist = int(p["nlist"])
        cents = _df_to_centroids(rd("centroids"), nlist, dim)
        return IvfSqIndex(
            metric=meta["metric"],
            nlist=nlist,
            dim=dim,
            centroids=cents,
            vmin=np.asarray(p["vmin"], dtype=np.float64),
            vmax=np.asarray(p["vmax"], dtype=np.float64),
            codes=rd("codes"),
            colocated=True,  # partitionBy("list_id") artifact
        )
    if itype == "sq":
        from gofaiss_spark.operators.sq import SqIndex

        p = meta["params"]
        return SqIndex(
            dim=dim,
            metric=meta["metric"],
            vmin=np.asarray(p["vmin"], dtype=np.float64),
            vmax=np.asarray(p["vmax"], dtype=np.float64),
            codes=rd("codes"),
        )
    if itype == "pca":
        from gofaiss_spark.operators.pca import PcaModel

        p = meta["params"]
        return PcaModel(
            dim=dim,
            k=int(p["k"]),
            components=np.asarray(p["components"], dtype=np.float64),
            explained_variance=np.asarray(
                p["explained_variance"], dtype=np.float64
            ),
        )
    if itype == "hnsw":
        from gofaiss_spark.operators.hnsw import (
            MAX_LEVEL_CAP,
            HnswGraph,
            HnswIndex,
        )

        p = meta["params"]
        rows = rd("nodes").toPandas()
        ids = rows["id"].to_numpy(dtype=np.int64)
        vecs = np.stack(rows["vec"].to_numpy()).astype(np.float32)
        levels = rows["level"].to_numpy(dtype=np.int32)
        idx_of = {int(v): i for i, v in enumerate(ids)}
        g = HnswGraph(
            metric=meta["metric"],
            dim=dim,
            m=int(p["m"]),
            ef_construction=int(p["ef_construction"]),
            vecs=vecs,
            ids=ids,
            levels=levels,
            edges=[dict() for _ in range(MAX_LEVEL_CAP + 1)],
            entry_point=idx_of.get(int(p["entry_point_id"]), -1),
            max_level=int(p["max_level"]),
        )
        by_key: dict[tuple[int, int], list[int]] = {}
        for r in rd("edges").collect():
            by_key.setdefault((r.level, idx_of[r.src]), []).append(idx_of[r.dst])
        for i in range(len(ids)):
            for lvl in range(int(levels[i]) + 1):
                g.edges[lvl][i] = np.asarray(
                    by_key.get((lvl, i), []), dtype=np.int32
                )
        return HnswIndex(
            graph=g, ef_search=int(p["ef_search"]), seed=int(p["seed"]), spark=spark
        )
    if itype == "hnsw_sharded":
        from gofaiss_spark.operators.hnsw import HnswShardedIndex

        p = meta["params"]
        return HnswShardedIndex(
            blobs=spark.read.parquet(f"{path}/shards"),
            metric=meta["metric"],
            m=int(p["m"]),
            ef_construction=int(p["ef_construction"]),
            num_shards=int(p["num_shards"]),
            ef_search=int(p["ef_search"]),
            spark=spark,
        )
    if itype == "hnsw_routed":
        from gofaiss_spark.operators.hnsw import HnswRoutedIndex

        p = meta["params"]
        nlist = int(p["nlist"])
        cents = _df_to_centroids(
            spark.read.parquet(f"{path}/centroids"), nlist, dim
        )
        return HnswRoutedIndex(
            blobs=spark.read.parquet(f"{path}/shards"),
            centroids=cents,
            metric=meta["metric"],
            m=int(p["m"]),
            ef_construction=int(p["ef_construction"]),
            nlist=nlist,
            ef_search=int(p["ef_search"]),
            default_nprobe=int(p["default_nprobe"]),
            spark=spark,
        )
    raise ValueError(f"unknown index_type {itype!r} in {path}/_meta.json")


# ---------------------------------------------------------------------------
# artifact maintenance: compaction + persisted remove
# ---------------------------------------------------------------------------

#: index_type -> (data tables, partitioned-by-list_id tables)
_DATA_TABLES: dict[str, tuple[list[str], list[str]]] = {
    "flat": (["vectors"], []),
    "ivf": (["assignments"], ["assignments"]),
    "pq": (["codes"], []),
    "opq": (["codes", "rotation"], []),
    "sq": (["codes"], []),
    "ivfpq": (["codes"], ["codes"]),
    "ivfsq": (["codes"], ["codes"]),
    "lsh": (["vectors", "buckets"], []),
}


def _parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".parquet")
        )
    return out


def _swap_dir(tmp: str, dst: str) -> None:
    """Replace ``dst`` with ``tmp`` (local-FS artifact layout; on a
    real lake this is the table format's commit — Iceberg/Delta
    rewrite-files, or a HDFS rename)."""
    import shutil

    old = dst + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(dst, old)
    os.rename(tmp, dst)
    shutil.rmtree(old, ignore_errors=True)


def compact_index(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> dict:
    """Compact a saved artifact's data tables: rewrite many small
    files (the inevitable residue of streaming micro-batch appends —
    one file per list per batch) into few balanced ones, preserving
    the ``partitionBy(list_id)`` layout that nprobe pruning needs.

    Partitioned tables are rewritten with ``repartition("list_id")``
    — hash-clustered so each inverted list lands contiguous in one
    task → one file per list (the ``colocated`` fast path that skips
    the per-partition ADC rebuild at search time). Unpartitioned
    tables coalesce to ``ceil(rows / target_rows_per_file)`` files.
    Readers are unaffected semantically: same rows, same schema, same
    partition directories; search results are byte-identical (gated
    in tests). Returns {table: {files_before, files_after, rows}}.
    """
    from pyspark.sql import functions as F  # noqa: F401

    meta = _read_meta(path)
    tables, partitioned = _DATA_TABLES.get(meta["index_type"], ([], []))
    report: dict = {}
    for name in tables:
        tdir = f"{path}/{name}"
        before = len(_parquet_files(tdir))
        df = spark.read.parquet(tdir)
        rows = df.count()
        tmp = f"{path}/.{name}.compact"
        if name in partitioned:
            (
                df.repartition("list_id")
                .write.mode("overwrite")
                .partitionBy("list_id")
                .parquet(tmp)
            )
        else:
            n_files = max(1, -(-rows // target_rows_per_file))
            df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
        _swap_dir(tmp, tdir)
        report[name] = {
            "files_before": before,
            "files_after": len(_parquet_files(tdir)),
            "rows": rows,
        }
    return report


def remove_from_index(spark: SparkSession, path: str, ids) -> int:
    """Row-level delete on a SAVED artifact (the reference errors
    "remove not supported" for IVF, ivf.go:176-178; our in-memory
    ``api.remove`` anti-joins — this is the persisted twin).

    For list-partitioned tables the rewrite is PARTITION-PRUNED: the
    ids are first located (one pruned-column scan of (id, list_id)),
    then ONLY the affected list directories are rewritten and
    atomically swapped; untouched lists keep their files — at
    nlist=65k and a handful of deletes, that is a few directories,
    not a table rewrite. Emptied lists have their directories
    removed outright (the case dynamic partition overwrite silently
    skips). Unpartitioned tables rewrite wholesale. Returns the
    number of rows removed from the primary data table.
    """
    import shutil

    from pyspark.sql import functions as F

    if not isinstance(ids, (list, tuple)):
        ids = [r[0] for r in ids.collect()]
    ids = [int(i) for i in ids]
    meta = _read_meta(path)
    tables, partitioned = _DATA_TABLES.get(meta["index_type"], ([], []))
    removed = 0
    for name in tables:
        primary = name == tables[0]
        tdir = f"{path}/{name}"
        df = spark.read.parquet(tdir)
        id_col = "id" if "id" in df.columns else df.columns[0]
        hit = F.col(id_col).isin(ids)
        if name in partitioned:
            affected = [
                r["list_id"]
                for r in df.filter(hit).select("list_id").distinct().collect()
            ]
            if not affected:
                continue
            sub = df.filter(F.col("list_id").isin(affected))
            if primary:
                removed = sub.filter(hit).count()
            keep = sub.filter(~hit)
            tmp = f"{path}/.{name}.remove"
            keep.repartition("list_id").write.mode("overwrite").partitionBy(
                "list_id"
            ).parquet(tmp)
            for lid in affected:
                old = f"{tdir}/list_id={lid}"
                new = f"{tmp}/list_id={lid}"
                shutil.rmtree(old, ignore_errors=True)
                if os.path.isdir(new):
                    os.rename(new, old)
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            n = df.filter(hit).count()
            if not n:
                continue
            if primary:
                removed = n
            tmp = f"{path}/.{name}.remove"
            df.filter(~hit).write.mode("overwrite").parquet(tmp)
            _swap_dir(tmp, tdir)
    return removed
