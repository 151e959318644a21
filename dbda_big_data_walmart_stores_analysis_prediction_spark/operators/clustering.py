"""Spherical k-means over embedding columns, and the cluster-based
SemDeDup it enables — deterministic, oracle-portable, zero Python in the
per-row path.

North-star surface (the reference's 489 lines have no vector ops; see
SURVEY.md §2 extensions). The repo already ships TWO embedding near-dup
paths — sign-LSH bucketing (q31/q72) and IVF ANN (q47, which trains a
private sample-based quantizer) — but the published SemDeDup recipe
(Abbas et al. 2023) and every cluster-then-curate pipeline
(domain discovery, per-cluster quotas, cluster-balanced eval splits)
need the CLUSTERING itself as a first-class, reproducible operator:
stable cluster ids, an auditable fit, and within-cluster pair
generation whose cost is bounded by cluster sizes instead of LSH band
collisions.

Design — why this is NOT MLlib KMeans:

* **Fixed, small iteration count as part of the contract.** Lloyd
  iterations converge geometrically and curation pipelines run 2-10 of
  them; with ``iters`` fixed the whole fit is a deterministic function
  of (data, salt) — and therefore SQL-expressible as a chained-CTE
  oracle (init → assign → update, repeated). MLlib's kMeans|| init +
  tolerance-based stopping is neither deterministic across partitionings
  nor oracle-replicable.
* **Deterministic init**: the ``n_clusters`` vectors with the smallest
  ``(md5(id || ':' || salt), id)`` — a seeded hash-order pick, the
  repo-wide convention for oracle-portable sampling.
* **Rounding firewalls at every cross-engine float boundary**: centroid
  means round to 9 dp (absorbs partial-aggregation summation-order ulps
  between Spark and any oracle engine), assignment dots round to 6 dp
  with first-max/lowest-index tie-break. Unit-normalized inputs make
  dot == cosine, so L2-Lloyd on the unit sphere ranks identically to
  cosine (same argument as ``knn_ivf``).

Scale shape at 100 TB: per iteration ONE full scan (assignment against
``n_clusters × dim`` centroid literals — JVM higher-order functions, no
Python, no shuffle of the data) plus ONE bounded shuffle
(``posexplode`` → ``groupBy(cluster, pos).avg``, ≤ n_clusters·dim
result rows to the driver). The corpus itself never shuffles. The
literal-centroid assignment targets the curation regime (k up to a few
hundred); a >10k-centroid FAISS-style deployment should route
assignment through an Arrow-batched matmul instead (the `knn_ivf`
machinery) and accept the Python boundary.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbda_big_data_walmart_stores_analysis_prediction_spark.functions.vectors import (
    dot_col,
    l2_norm_col,
)

MEAN_DP = 9  # centroid-mean rounding (cross-engine summation-order firewall)
DOT_DP = 6  # assignment-dot rounding (matches the q30/q31 cosine contract)


@dataclass(frozen=True)
class KMeansModel:
    """Unit-norm centroids (list of dim-length float lists, index = cluster
    id) plus the fit configuration that produced them."""

    centroids: list[list[float]]
    salt: str
    iters: int


def _unit(col: Column) -> Column:
    """Unit-normalize an array<double> column. Null-guarded: zero-norm
    rows are filtered out by the caller, but ANSI mode evaluates fused
    subexpressions before the filter drops the row — the ``when`` keeps
    the division off the zero-divisor path (elements come back NULL on
    rows the filter discards anyway)."""
    n = l2_norm_col(col)
    return F.transform(col, lambda x: F.when(n > 0, x / n))


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, nv): ids with unit-normalized vectors. Malformed embeddings —
    zero norm, or any NaN/±Inf element (a failed upstream encoder) — are
    DROPPED, explicitly: NaN comparison semantics differ across engines
    (both Spark and DuckDB order NaN above all values, so a bare
    ``norm > 0`` filter would KEEP a NaN vector and then poison every
    argmax downstream); the exists-check makes the contract engine-
    independent."""
    vd = F.col(vec_col).cast("array<double>")
    bad = F.exists(
        vd, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    )
    return (
        df.where(~bad & (dot_col(vec_col, vec_col) > 0))
        .select(F.col(id_col).alias("id"), _unit(vd).alias("nv"))
    )


def _assign_cols(centroids: list[list[float]]) -> tuple[Column, Column]:
    """(cluster, cent_cos) against literal centroids: per-centroid dots
    rounded to DOT_DP, first-max wins (ties → lowest cluster id)."""
    dots = F.array(
        *[
            F.round(
                dot_col(F.col("nv"), F.array(*[F.lit(float(x)) for x in c])),
                DOT_DP,
            )
            for c in centroids
        ]
    )
    best = F.array_max(dots)
    return (F.array_position(dots, best) - 1).cast("int"), best


def fit_kmeans(
    df: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> KMeansModel:
    """Fit spherical k-means; returns the bounded centroid model.

    Per iteration: assignment is a scan against literal centroids (no
    shuffle of the data), the centroid update is one
    ``posexplode → groupBy(cluster, pos).avg`` shuffle whose result
    (≤ n_clusters·dim rows) collects to the driver. A cluster that loses
    all members — or whose member mean rounds to the zero vector — keeps
    its previous centroid (the coalesce contract the SQL oracle
    replicates).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    norm = _normalized(df, id_col, vec_col)
    init_rows = (
        norm.orderBy(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(":" + salt))),
            "id",
        )
        .limit(n_clusters)
        .collect()
    )
    centroids = [list(r["nv"]) for r in init_rows]
    for _ in range(iters):
        cluster, _ = _assign_cols(centroids)
        means = (
            norm.select(cluster.alias("cluster"), F.posexplode("nv"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("col"), MEAN_DP).alias("m"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["m"]
        nxt = []
        for cid, prev in enumerate(centroids):
            dims = by_cluster.get(cid)
            if dims is None:
                nxt.append(prev)  # empty cluster: keep previous centroid
                continue
            vec = [dims[p] for p in range(len(prev))]
            nrm = sum(x * x for x in vec) ** 0.5
            nxt.append([x / nrm for x in vec] if nrm > 0 else prev)
        centroids = nxt
    return KMeansModel(centroids=centroids, salt=salt, iters=iters)


def assign_clusters(
    df: DataFrame,
    model: KMeansModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster, cent_cos): nearest-centroid assignment — one scan,
    zero shuffle, JVM-side. Works unchanged on a STREAMING ``df`` (it is
    a stateless projection: no shuffle, no aggregation, no state store —
    replay == batch is pinned in tests), so a saved artifact
    (`save_kmeans_artifact`/`load_kmeans_artifact`) routes live traffic
    to clusters fitted offline."""
    norm = _normalized(df, id_col, vec_col)
    cluster, best = _assign_cols(model.centroids)
    return norm.select(
        F.col("id").alias(id_col),
        cluster.alias("cluster"),
        best.alias("cent_cos"),
    )


def cluster_embeddings(
    df: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> DataFrame:
    """Fit + assign in one call: (id, cluster, cent_cos) for every
    non-zero-norm input row. ``fit_kmeans``/``assign_clusters`` are the
    split form for fit-once / assign-many (the S5 artifact pattern)."""
    model = fit_kmeans(df, n_clusters, iters, id_col, vec_col, salt)
    return assign_clusters(df, model, id_col, vec_col)


_KMEANS_ARTIFACT_COLS = ("cluster", "centroid", "salt", "iters")


def save_kmeans_artifact(spark, model: KMeansModel, path: str) -> None:
    """Persist a fitted `KMeansModel` as parquet — the clustering
    family's member of the model sink/source contract (SURVEY S5; same
    pattern as `plans.tokenizer.save_tokenizer_artifact`): fit once,
    ship the bounded centroid table, assign on any cluster. One row per
    centroid: (cluster, centroid array<double>, salt, iters)."""
    rows = [
        (cid, list(map(float, c)), model.salt, int(model.iters))
        for cid, c in enumerate(model.centroids)
    ]
    spark.createDataFrame(
        rows, "cluster int, centroid array<double>, salt string, iters int"
    ).write.mode("overwrite").parquet(path)


def load_kmeans_artifact(spark, path: str) -> KMeansModel:
    """Reload a `save_kmeans_artifact` parquet, re-validating the schema
    contract (a path mix-up fails loudly here, not as a garbage
    assignment on a different cluster)."""
    df = spark.read.parquet(path)
    if not set(_KMEANS_ARTIFACT_COLS) <= set(df.columns):
        raise ValueError(
            f"load_kmeans_artifact: {path} has columns {sorted(df.columns)}"
            f" — not a saved k-means artifact {_KMEANS_ARTIFACT_COLS}"
        )
    rows = df.orderBy("cluster").collect()
    if [r["cluster"] for r in rows] != list(range(len(rows))):
        raise ValueError(
            f"load_kmeans_artifact: {path} cluster ids are not the dense "
            "0..k-1 range — artifact is corrupt or partially written"
        )
    return KMeansModel(
        centroids=[list(r["centroid"]) for r in rows],
        salt=rows[0]["salt"],
        iters=rows[0]["iters"],
    )


def semdedup(
    df: DataFrame,
    n_clusters: int = 8,
    iters: int = 2,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023), the cluster-bounded form: k-means
    clusters → WITHIN-cluster cosine pairs ≥ ``threshold`` → connected
    components → per duplicate group keep the member LEAST similar to its
    centroid (the paper's keep-low-centroid-similarity rule; ties →
    smallest id).

    Output: (id, cluster, group_id, keep) for every clustered row —
    ``group_id`` = min id of the near-dup component (own id if
    unduplicated), ``keep`` marks survivors. Filter ``keep`` for the
    deduplicated corpus; the full frame is the audit trail.

    Scale shape: the pair join is keyed on ``cluster`` — candidate
    generation is O(Σ cluster_size²) and never all-pairs, the published
    trick that makes SemDeDup run at LAION scale. Cluster granularity
    (``n_clusters`` ~ corpus_size / desired_cluster_size) bounds the
    quadratic term; the component closure reuses the size-gated
    union-find / star-contraction machinery every other dedup family
    goes through (`operators.dedup.connected_components`).

    vs q72 (`embedding_near_dup_pairs` + collapse): the LSH form answers
    "collapse everything above τ" with banding-bounded recall; this form
    is the paper-exact recipe — cluster-bounded candidates, exact
    within-cluster cosines, and the centroid-distance survivor rule
    (q72 keeps min-id) — and additionally emits the cluster structure
    curation pipelines consume.
    """
    from dbda_big_data_walmart_stores_analysis_prediction_spark.operators.dedup import (
        connected_components,
    )

    assigned = cluster_embeddings(
        df, n_clusters, iters, id_col, vec_col, salt
    )
    norm = _normalized(df, id_col, vec_col)
    feats = assigned.join(
        norm.withColumnRenamed("id", id_col), id_col
    ).select(id_col, "cluster", "cent_cos", "nv")
    a = feats.select(
        F.col(id_col).alias("id_a"),
        F.col("cluster"),
        F.col("nv").alias("nv_a"),
    )
    b = feats.select(
        F.col(id_col).alias("id_b"),
        F.col("cluster"),
        F.col("nv").alias("nv_b"),
    )
    pairs = (
        a.join(b, "cluster")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(dot_col("nv_a", "nv_b"), DOT_DP) >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs, "id_a", "id_b")
    labeled = feats.join(
        comp.withColumnRenamed("id", id_col), id_col, "left"
    ).select(
        id_col,
        "cluster",
        "cent_cos",
        F.coalesce(F.col("component"), F.col(id_col)).alias("group_id"),
    )
    survivor = F.row_number().over(
        Window.partitionBy("group_id").orderBy(F.asc("cent_cos"), F.asc(id_col))
    )
    return labeled.select(
        id_col,
        "cluster",
        "group_id",
        (survivor == 1).alias("keep"),
    )
