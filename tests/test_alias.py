"""Index aliases (alias.py — the ES _aliases operational core): atomic
re-point, identity on plain paths, loud unknown-alias/malformed-ref/
bad-target errors, drop leaves the index untouched, and the blue/green
reindex cutover reads identically across the swap."""

import json
import os

import pytest

from yase_spark.alias import (
    drop_alias,
    list_aliases,
    resolve_alias,
    set_alias,
)
from yase_spark.config import IndexConfig
from yase_spark.index import build_index
from yase_spark.query import IndexReader
from yase_spark.reindex import reindex

SCHEMA = "repo string, path string, commit string, lang string, content string"


def test_alias_registry_roundtrip(spark, tmp_path):
    wh = str(tmp_path / "wh")
    root = str(tmp_path / "ix")
    corpus = spark.createDataFrame(
        [("r", f"{i:03d}", "c", "py", f"alpha{i % 7} beta gamma")
         for i in range(60)],
        schema=SCHEMA,
    )
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, ngrams=False)
    build_index(spark, corpus, root, cfg)

    st = set_alias(wh, "prod", root)
    assert st["previous"] is None and st["target"] == os.path.abspath(root)
    assert list_aliases(wh) == {"prod": os.path.abspath(root)}
    assert resolve_alias(f"alias://{wh}/prod") == os.path.abspath(root)
    # identity on plain paths — call sites need no branching
    assert resolve_alias(root) == root

    # registry file is valid JSON on disk (write-temp + replace)
    with open(os.path.join(wh, "aliases.json")) as f:
        assert json.load(f)["prod"] == os.path.abspath(root)

    # loud errors: unknown alias, malformed ref, non-index target
    with pytest.raises(ValueError, match="unknown alias"):
        resolve_alias(f"alias://{wh}/nope")
    with pytest.raises(ValueError, match="malformed"):
        resolve_alias("alias://justonename")
    with pytest.raises(ValueError, match="not an index root"):
        set_alias(wh, "bad", str(tmp_path / "empty"))
    with pytest.raises(ValueError, match="bad alias name"):
        set_alias(wh, "a/b", root)

    # blue/green: reindex to a new layout, ATOMIC re-point, identical
    # reads through the alias across the swap
    rd = IndexReader(spark, resolve_alias(f"alias://{wh}/prod"))
    before = rd.topk("alpha3 gamma", 5)
    dst = str(tmp_path / "ix2")
    reindex(spark, root, dst, block_size=32, term_buckets=4)
    st2 = set_alias(wh, "prod", dst)
    assert st2["previous"] == os.path.abspath(root)
    rd2 = IndexReader(spark, resolve_alias(f"alias://{wh}/prod"))
    assert rd2.cfg.term_buckets == 4
    assert rd2.topk("alpha3 gamma", 5) == before

    # drop removes only the name
    assert drop_alias(wh, "prod") is True
    assert drop_alias(wh, "prod") is False
    assert list_aliases(wh) == {}
    assert IndexReader(spark, dst).topk("alpha3 gamma", 5) == before


def test_filtered_alias_roundtrip_and_serving(spark, tmp_path):
    """Filtered alias (ES multi-tenancy): the stored predicate rides
    the registry (legacy plain-string entries still resolve), and
    serving through it equals topk_where with the same predicate."""
    from yase_spark.alias import alias_filter

    wh = str(tmp_path / "whf")
    root = str(tmp_path / "ixf")
    corpus = spark.createDataFrame(
        [("r", f"{i:03d}", "c", "java" if i % 2 else "py",
          f"alpha{i % 7} beta gamma")
         for i in range(60)],
        schema=SCHEMA,
    )
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, ngrams=False)
    build_index(spark, corpus, root, cfg)

    set_alias(wh, "tenant", root, filter="lang = 'java'")
    set_alias(wh, "plain", root)
    ref = f"alias://{wh}/tenant"
    assert resolve_alias(ref) == os.path.abspath(root)
    assert alias_filter(ref) == "lang = 'java'"
    assert alias_filter(f"alias://{wh}/plain") is None
    assert alias_filter(root) is None  # identity on plain paths

    rd = IndexReader(spark, root, cfg)
    rows = rd.topk_where("beta", k=10, predicate="lang = 'java'").collect()
    assert rows, "java slice must match"
    # every served doc is in the slice
    langs = {
        r["lang"]
        for r in rd.cat.read(spark, "docs")
        .join(
            spark.createDataFrame(
                [(r["doc_id"],) for r in rows], "doc_id long"
            ),
            "doc_id",
        )
        .select("lang")
        .collect()
    }
    assert langs == {"java"}

    # re-point to unfiltered drops the stored filter atomically
    set_alias(wh, "tenant", root)
    assert alias_filter(ref) is None
    with pytest.raises(ValueError, match="non-empty"):
        set_alias(wh, "tenant", root, filter="   ")
