"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — pure native expressions
(``zip_with`` dot product + ``aggregate`` sum), fully codegen'd, one
``TakeOrderedAndProject``; the correct reference for recall.

Scale path: IVF-style bucketing — assign every vector to its nearest
of C fixed centroid vectors (deterministically chosen as the first C
vectors by id — k-means is deliberately out: determinism first), then
search only the query's ``n_probe`` nearest buckets. The bucket
assignment is a crossJoin against a broadcast centroid table + one
groupBy — no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                    F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_to_query(vectors: DataFrame, query_vec: list[float],
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cosine) vs a constant query vector — native expressions."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col)
    cos = _dot(v, q) / (_norm(v) * _norm(q))
    return vectors.select(F.col(id_col).alias("vec_id"), cos.alias("cosine"))


def brute_force_topk(vectors: DataFrame, query_vec: list[float], k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     exclude_id: int | None = None,
                     round_digits: int | None = 6) -> DataFrame:
    """Exact cosine top-k: scan → score → TakeOrderedAndProject.
    Rounded before ordering for cross-engine rank stability."""
    scored = cosine_to_query(vectors, query_vec, vec_col, id_col)
    if exclude_id is not None:
        scored = scored.filter(F.col("vec_id") != exclude_id)
    if round_digits is not None:
        scored = scored.withColumn("cosine", F.round("cosine", round_digits))
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               vec_col: str = "embedding", id_col: str = "vec_id",
               cent_vec_col: str = "embedding",
               cent_id_col: str = "centroid_id") -> DataFrame:
    """(vec_id, centroid_id) — nearest centroid by cosine; the centroid
    table is broadcast (it is small by construction)."""
    c = F.broadcast(
        centroids.select(F.col(cent_id_col).alias("centroid_id"),
                         F.col(cent_vec_col).alias("c_vec"))
    )
    joined = vectors.select(F.col(id_col).alias("vec_id"),
                            F.col(vec_col).alias("v_vec")).crossJoin(c)
    cos = _dot(F.col("v_vec"), F.col("c_vec")) / (
        _norm(F.col("v_vec")) * _norm(F.col("c_vec"))
    )
    scored = joined.select("vec_id", "centroid_id", cos.alias("cos"))
    # argmax per vec_id with deterministic tie-break (centroid_id asc)
    best = scored.groupBy("vec_id").agg(
        F.max_by("centroid_id", F.struct(F.col("cos"), -F.col("centroid_id")))
        .alias("centroid_id")
    )
    return best


def ivf_topk(vectors: DataFrame, centroids: DataFrame, query_vec: list[float],
             k: int = 10, n_probe: int = 2, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only vectors in the query's n_probe
    nearest centroid buckets. Recall measured vs brute force in tests."""
    assign = ivf_assign(vectors, centroids, vec_col, id_col)
    # nearest centroids of the query (tiny table → driver-side)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cent_scored = centroids.select(
        F.col("centroid_id"),
        (_dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * _norm(q))).alias("cos"),
    ).orderBy(F.desc("cos"), F.asc("centroid_id")).limit(n_probe)
    probe_ids = [r["centroid_id"] for r in cent_scored.collect()]
    cands = assign.filter(F.col("centroid_id").isin(probe_ids)).select("vec_id")
    pool = vectors.join(cands, vectors[id_col] == cands["vec_id"], "left_semi")
    return brute_force_topk(pool, query_vec, k, vec_col, id_col)
