"""Resume-equivalence (SURVEY.md §5.5, BASELINE.json:6 "resumable from
per-partition checkpoints"): crash after a subset of group units, resume,
and the final segments must be identical to an uncrashed build."""

import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.index import build_index
from yase_spark.synth import corpus_df


def _segments_signature(spark, root):
    cat = Catalog(root)
    segs = cat.read(spark, "segments").select(
        "term", "shard", "df", "cf", "n", F.sha2(F.col("payload"), 256).alias("ph")
    )
    rows = segs.collect()
    return sorted((r["term"], r["shard"], r["df"], r["cf"], r["n"], r["ph"]) for r in rows)


@pytest.mark.slow
def test_crash_resume_equivalence(spark, tiny_corpus, tmp_path):
    cfg = IndexConfig(build_groups=4, shuffle_partitions=8, hot_term_df=400, salt_shards=4)

    full_root = str(tmp_path / "full")
    build_index(spark, tiny_corpus, full_root, cfg)

    crash_root = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="injected crash"):
        build_index(spark, tiny_corpus, crash_root, cfg, fail_after_units=2)

    cat = Catalog(crash_root)
    done_before = {
        t["unit"] for t in cat.committed_tags("segments") if "unit" in t
    }
    assert len(done_before) == 2, "exactly 2 group units committed pre-crash"

    summary = build_index(spark, tiny_corpus, crash_root, cfg)
    assert summary["groups_built"] == cfg.build_groups - 2, "resume skipped done units"

    assert _segments_signature(spark, crash_root) == _segments_signature(
        spark, full_root
    )

    # lineage rows exist for every unit
    ck = cat.read(spark, "checkpoints")
    units = {r["unit"] for r in ck.select("unit").collect()}
    assert {"docs"} | {f"grp-{g}" for g in range(cfg.build_groups)} <= units


@pytest.mark.slow
def test_noop_rebuild_skips_everything(spark, tiny_corpus, tmp_path):
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8)
    root = str(tmp_path / "ix")
    build_index(spark, tiny_corpus, root, cfg)
    v_before = Catalog(root).current_version("segments")
    summary = build_index(spark, tiny_corpus, root, cfg)
    assert summary["groups_built"] == 0
    assert Catalog(root).current_version("segments") == v_before
