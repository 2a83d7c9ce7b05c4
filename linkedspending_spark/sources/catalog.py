"""Dataset catalog: freshness metadata + scheduling pool.

Reference analogs:

* S1 — ``OpenSpendingDatasetInfo`` builds a sorted name → (created,
  modified) map from ``datasets.json`` with a 15-minute TTL cache
  (OpenSpendingDatasetInfo.java:47-50,119-157). Here the catalog is an
  aggregation over the transcripts table itself (min/max ts per
  conversation) with the same driver-side TTL cache.
* S5 — downloaded-names scan (ConvertWorker.java:129-150) →
  ``input_file_name()`` listing.
* Boss scheduling pool (Boss.java:61-76) — ``unconverted ∪ stale``:
  catalog anti-join manifests (J4/U1), union with freshness-expired
  datasets (U2, P7 ``upToDate`` semantics).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CATALOG_TTL_SECONDS = 15 * 60  # OpenSpendingDatasetInfo.java:49 (15 min)

_cache: dict[str, tuple[float, list]] = {}


def dataset_catalog(transcripts: DataFrame) -> DataFrame:
    """conv_id → (created, modified, n_turns), sorted by name (O1)."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.min("ts").alias("created"),
            F.max("ts").alias("modified"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .orderBy("conv_id")
    )


def cached_catalog_rows(transcripts: DataFrame, cache_key: str = "default") -> list:
    """Driver-side TTL-cached catalog (the 15-min cache analog)."""
    now = time.time()
    hit = _cache.get(cache_key)
    if hit and now - hit[0] < CATALOG_TTL_SECONDS:
        return hit[1]
    rows = dataset_catalog(transcripts).collect()
    _cache[cache_key] = (now, rows)
    return rows


def invalidate_catalog_cache(cache_key: str | None = None) -> None:
    if cache_key is None:
        _cache.clear()
    else:
        _cache.pop(cache_key, None)


def input_files(df: DataFrame) -> DataFrame:
    """Distinct source files feeding a DataFrame (S5 names-scan analog)."""
    return df.select(F.input_file_name().alias("file")).distinct().orderBy("file")


def scheduling_pool(
    catalog: DataFrame, manifests: DataFrame, stale_before: float | None = None
) -> DataFrame:
    """(unconverted ∪ stale) dataset names — the Boss pool (J4+U2).

    ``manifests``: (dataset, finished_at, ...). A dataset is stale when
    it was modified after its manifest was recorded, or (optionally)
    when the manifest predates ``stale_before``.
    """
    cat = catalog.select(F.col("conv_id").alias("dataset"), "modified")
    done = manifests.groupBy("dataset").agg(F.max("finished_at").alias("finished_at"))
    unconverted = cat.join(F.broadcast(done), "dataset", "left_anti").select("dataset")
    stale = (
        cat.join(done, "dataset")
        .where(
            (F.unix_timestamp("modified") > F.col("finished_at"))
            | (
                F.lit(stale_before is not None)
                & (F.col("finished_at") < F.lit(stale_before or 0.0))
            )
        )
        .select("dataset")
    )
    return unconverted.union(stale).distinct()
