"""Similarity search over an embedding column (array<float>).

* :func:`cosine_topk` — brute-force exact top-k: one narrow pass
  computing cosine against a broadcast query vector (dot product via
  ``zip_with``/``aggregate`` — JVM, no UDF), then a top-k. Baseline and
  ground truth.
* :func:`build_ivf` / :func:`ivf_topk` — the scale path: IVF-style
  inverted file. Centroids are trained by a few Lloyd iterations run AS
  DataFrame aggregations (posexplode + groupBy avg — no MLlib
  dependency), vectors are assigned to their nearest centroid
  (partition pruning at query time: only ``n_probe`` cells scanned).

At 100 TB the IVF table is written partitioned by cell so a query scans
``n_probe`` partitions instead of the corpus — the same
partition-pruning story as everywhere else in this engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _dot_lit(vec_col, qvec: list[float]):
    """dot(vec, literal query) — zip_with against an array literal."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda v, w: v.cast("double") * w),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _norm(vec_col):
    return F.sqrt(
        F.aggregate(
            vec_col,
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double") * v.cast("double"),
        )
    )


def cosine_topk(
    df: DataFrame,
    qvec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in qvec)) or 1.0
    sim = _dot_lit(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        df.select(F.col(key_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(key_col))
        .limit(k)
    )


def build_ivf(
    spark: SparkSession,
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> tuple[DataFrame, list[list[float]]]:
    """Train IVF centroids (Lloyd via DataFrame aggs) and assign cells.

    Init: deterministic — the ``n_cells`` vectors with the smallest keys.
    Returns (assigned_df with ``cell`` column, centroids list).
    """
    seed_rows = (
        df.orderBy(key_col).limit(n_cells).select(vec_col).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(iters):
        assigned = assign_cells(df, centroids, vec_col)
        agg = (
            assigned.select("cell", F.posexplode(vec_col).alias("i", "v"))
            .groupBy("cell", "i")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in agg:
            by_cell.setdefault(r["cell"], {})[r["i"]] = r["m"]
        dims = len(centroids[0])
        centroids = [
            [by_cell.get(c, {}).get(i, centroids[c][i]) for i in range(dims)]
            for c in range(len(centroids))
        ]
    return assign_cells(df, centroids, vec_col), centroids


def assign_cells(df: DataFrame, centroids: list[list[float]], vec_col: str = "embedding") -> DataFrame:
    """cell = argmax_c cosine(vec, centroid_c) as one column expression."""
    import math

    norms = [math.sqrt(sum(x * x for x in c)) or 1.0 for c in centroids]
    sims = F.array(
        *[
            (_dot_lit(F.col(vec_col), c) / (F.lit(n) * _norm(F.col(vec_col)))).alias(
                f"s{i}"
            )
            for i, (c, n) in enumerate(zip(centroids, norms))
        ]
    )
    return df.withColumn(
        "cell", (F.array_position(sims, F.array_max(sims)) - 1).cast("int")
    )


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    qvec: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: scan only the ``n_probe`` cells nearest the query."""
    import math

    qn = math.sqrt(sum(float(x) * float(x) for x in qvec)) or 1.0

    def cos_to(c):
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(a * b for a, b in zip(qvec, c)) / (qn * cn)

    probe = sorted(range(len(centroids)), key=lambda i: -cos_to(centroids[i]))[:n_probe]
    sim = _dot_lit(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qn))
    return (
        assigned.where(F.col("cell").isin(probe))
        .select(F.col(key_col), F.round(sim, 6).alias("sim"))
        .orderBy(F.col("sim").desc(), F.col(key_col))
        .limit(k)
    )
