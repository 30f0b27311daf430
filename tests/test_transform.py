"""Continuous transform / rollup-index gates (transform.py): watermark
checkpointing, bucket invalidation with the lateness margin,
partition-COW rewrites, noop detection, and final-state equality with
a from-scratch recompute.

Driver oracle: transform_rollup in __spark_entry__ (two checkpoints
vs the full GROUP BY replay).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.transform import TABLE, read_rollup, transform_rollup


def _events(spark, rows):
    t0 = datetime.datetime(2024, 3, 1)
    return spark.createDataFrame(
        [
            (i, t0 + datetime.timedelta(minutes=m), et, float(v))
            for i, (m, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, event_type string, value double",
    )


def test_incremental_equals_full_recompute(spark, tmp_path):
    rows = [(h * 60 + j, "a" if j % 2 else "b", j) for h in range(6) for j in range(5)]
    ev = _events(spark, rows)
    d_inc, d_full = str(tmp_path / "inc"), str(tmp_path / "full")
    cut = ev.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0] - 2 * 3600
    m1 = transform_rollup(spark, ev.filter(F.unix_timestamp("ts") <= cut), d_inc)
    assert m1["mode"] == "full"
    m2 = transform_rollup(spark, ev, d_inc)
    assert m2["mode"] == "incremental"
    # only the delta's buckets (+1 lateness margin) were recomputed
    assert m2["buckets_recomputed"] <= 4
    transform_rollup(spark, ev, d_full)
    got = [tuple(r) for r in read_rollup(spark, d_inc).collect()]
    want = [tuple(r) for r in read_rollup(spark, d_full).collect()]
    assert got == want


def test_late_data_within_margin_is_folded(spark, tmp_path):
    dest = str(tmp_path / "late")
    early = [(0, "a", 1), (60, "a", 1)]  # hours 0 and 1
    ev1 = _events(spark, early)
    transform_rollup(spark, ev1, dest)
    # a LATE event lands in hour 1 (inside the 1-bucket margin) plus a
    # new hour-2 event; the union table is what the next run sees
    ev2 = _events(spark, early + [(90, "a", 5), (130, "a", 7)])
    m = transform_rollup(spark, ev2, dest)
    assert m["mode"] == "incremental"
    rows = {r["bkt_s"]: r for r in read_rollup(spark, dest).collect()}
    assert len(rows) == 3
    by_time = [rows[k] for k in sorted(rows)]
    assert by_time[1]["n"] == 2 and by_time[1]["v_sum_r"] == 6.0  # late folded
    assert by_time[2]["n"] == 1 and by_time[2]["v_sum_r"] == 7.0


def test_noop_and_idempotent_rerun(spark, tmp_path):
    dest = str(tmp_path / "noop")
    ev = _events(spark, [(0, "a", 1), (61, "b", 2)])
    transform_rollup(spark, ev, dest)
    v_before = Catalog(dest).current_version(TABLE)
    before = [tuple(r) for r in read_rollup(spark, dest).collect()]
    # same source again: the 1-bucket lateness margin re-covers the
    # last bucket (a rewrite, same rows) — never data corruption
    m = transform_rollup(spark, ev, dest)
    assert m["mode"] in ("incremental", "noop")
    after = [tuple(r) for r in read_rollup(spark, dest).collect()]
    assert after == before
    # zero-margin variant: a second run with no new data is a true noop
    dest2 = str(tmp_path / "noop2")
    transform_rollup(spark, ev, dest2, lateness_buckets=0)
    v2 = Catalog(dest2).current_version(TABLE)
    m2 = transform_rollup(spark, ev, dest2, lateness_buckets=0)
    assert m2["mode"] == "noop"
    assert Catalog(dest2).current_version(TABLE) == v2
    assert v_before >= 1


def test_validation(spark, tmp_path):
    ev = _events(spark, [(0, "a", 1)])
    with pytest.raises(ValueError):
        transform_rollup(spark, ev, str(tmp_path / "x"), hours=0)
    with pytest.raises(ValueError):
        transform_rollup(spark, ev, str(tmp_path / "x"), lateness_buckets=-1)
