"""Continuous transform (ES ``_transform`` / rollup-index core): a
destination table that MAINTAINS a date-histogram aggregation of a
source event stream incrementally — each run processes only the data
past its checkpoint and rewrites only the affected buckets.

This is the warehouse incremental-rollup shape ES transforms implement
with checkpoints + bucket invalidation, mapped onto this engine's
Iceberg-shaped catalog:

* **checkpoint** = a high-water mark (max source ``ts`` seen) carried
  as the snapshot tag of the destination table — crash-safe because the
  tag commits atomically WITH the data (the catalog's manifest+VERSION
  flip), so a crashed run is simply re-run (idempotent: same delta,
  same buckets, same rows).
* **bucket invalidation** = the delta's distinct hour buckets, widened
  by ``lateness_buckets`` (ES ``sync.time.delay``): those buckets are
  recomputed FROM SOURCE (so in-bucket late arrivals inside the margin
  are folded in) and committed as a partition-level copy-on-write
  (``Catalog.write(replace_partitions=...)``) — cost ∝ affected
  buckets, never ∝ the destination table. Late data older than the
  margin is out of contract, exactly as in ES.

Scale shape: the delta scan is a pushed ``ts > watermark - margin``
range predicate; the recompute scan is a pushed bucket-key IN-list;
the aggregation is one hash agg over the affected slice; the commit
touches |affected| partitions. At 100 TB the destination stays
queryable at every instant (readers see the previous snapshot until
the atomic flip) — the rollup the dashboards hit while ingest runs.

Determinism: bucket key = epoch seconds of the hour window start
(integer), counts are longs; the value sum rounds at the contract
boundary like every events aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog

TABLE = "rollup"
MAX_AFFECTED = 100_000  # loud cap: one year of hourly buckets is 8,760


def _bucketed(events: DataFrame, hours: int, key: str) -> DataFrame:
    return events.select(
        F.unix_timestamp(F.window("ts", f"{hours} hour").start)
        .cast("long")
        .alias("bkt_s"),
        F.col(key).alias("grp"),
        "ts",
        "value",
    )


def transform_rollup(
    spark: SparkSession,
    events: DataFrame,
    dest_root: str,
    hours: int = 1,
    key: str = "event_type",
    lateness_buckets: int = 1,
) -> dict:
    """Run one transform checkpoint: fold everything past the stored
    watermark into the destination rollup. Returns metrics
    ``{version, mode, buckets_recomputed, watermark}``."""
    if hours < 1 or lateness_buckets < 0:
        raise ValueError("hours must be >= 1 and lateness_buckets >= 0")
    cat = Catalog(dest_root)
    b = _bucketed(events, hours, key)
    agg = lambda df: (  # noqa: E731 — one shared aggregation shape
        df.groupBy("bkt_s", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("value").alias("v_sum"),
        )
    )
    if not cat.exists(TABLE):
        full = agg(b)
        wm = b.agg(F.max(F.unix_timestamp("ts")).cast("long")).collect()[0][0]
        v = cat.write(
            TABLE, full, mode="overwrite", partition_by=["bkt_s"],
            tag={"watermark": int(wm or 0)},
        )
        return {
            "version": v, "mode": "full",
            "buckets_recomputed": full.select("bkt_s").distinct().count(),
            "watermark": int(wm or 0),
        }
    wm = int(cat._manifest(TABLE)["tag"]["watermark"])
    margin = lateness_buckets * hours * 3600
    delta = b.filter(F.unix_timestamp("ts") > F.lit(wm - margin))
    affected = [r["bkt_s"] for r in delta.select("bkt_s").distinct().collect()]
    if len(affected) > MAX_AFFECTED:
        raise RuntimeError(
            f"{len(affected)} affected buckets exceeds {MAX_AFFECTED}; "
            "run transforms more often or raise the cap deliberately"
        )
    new_wm = delta.agg(F.max(F.unix_timestamp("ts")).cast("long")).collect()[0][0]
    if not affected:
        return {
            "version": cat.current_version(TABLE), "mode": "noop",
            "buckets_recomputed": 0, "watermark": wm,
        }
    recomputed = agg(b.filter(F.col("bkt_s").isin(affected)))
    v = cat.write(
        TABLE, recomputed, mode="append", partition_by=["bkt_s"],
        replace_partitions={"bkt_s": affected},
        tag={"watermark": max(wm, int(new_wm))},
    )
    return {
        "version": v, "mode": "incremental",
        "buckets_recomputed": len(affected),
        "watermark": max(wm, int(new_wm)),
    }


def read_rollup(spark: SparkSession, dest_root: str) -> DataFrame:
    """The maintained rollup table, contract-shaped: (bkt_s, grp, n,
    v_sum_r) ordered by (bkt_s, grp)."""
    return (
        Catalog(dest_root)
        .read(spark, TABLE)
        .select(
            F.col("bkt_s").cast("long").alias("bkt_s"),
            "grp",
            F.col("n").cast("long").alias("n"),
            F.round("v_sum", 6).alias("v_sum_r"),
        )
        .orderBy("bkt_s", "grp")
    )
