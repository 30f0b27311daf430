"""Spiky over-cap pruning gate for the sharded executor (VERDICT round-3
item 3): on the flat reference over-cap mix the block bounds barely
prune (decode fraction ~0.94-1.0, and ``kernel="auto"`` correctly picks
the dense kernel there). This gate proves the WAND side of the dispatch
earns its keep in the regime it exists for — ONE dominant rare term
("needle") plus a stopword list: after k needle hits the per-range
threshold passes the needle's contribution and every stopword block
without a needle doc must be SKIPPED, never decoded.

Geometry matters at miniature scale: pruning is block-granular, so the
needle spacing must exceed the docs-per-block width of a ubiquitous
term's posting list. block_size=16 keeps that possible at 8k docs.
"""

import numpy as np
import pandas as pd
import pytest

from yase_spark.config import IndexConfig
from yase_spark.index import build_index
from yase_spark.query import IndexReader

N_DOCS = 8000
NEEDLE_EVERY = 64          # needle df = 125, spacing 64 docs > 16-doc blocks


@pytest.fixture(scope="module")
def spiky_index(spark, tmp_path_factory):
    rows = []
    for i in range(N_DOCS):
        toks = ["alpha", "beta", "gamma", "delta", f"fill{i % 7}"]
        if i % NEEDLE_EVERY == 3:
            toks.append("needleterm")
        # one repo + zero-padded paths: doc_ids mint in (repo, path)
        # order, so needle docs stay uniformly spread across doc_id
        # space (clustered needles leave needle-free ranges where the
        # threshold never rises and nothing can prune)
        rows.append({
            "repo": "org0/repo0",
            "path": f"src/f{i:05d}.py",
            "commit": f"{i:016x}",
            "lang": "python",
            "content": " ".join(toks),
        })
    corpus = spark.createDataFrame(pd.DataFrame(rows))
    root = str(tmp_path_factory.mktemp("spiky_index"))
    cfg = IndexConfig(block_size=16, term_buckets=16, build_groups=2,
                      shuffle_partitions=16)
    build_index(spark, corpus, root, cfg)
    return root, cfg


def test_sharded_spiky_prunes(spark, spiky_index):
    """needle + stopwords through kernel="auto": (a) the per-range
    dominance test must route to the WAND kernel, (b) the WAND kernel
    must skip more than half the shipped blocks, (c) results must be
    bitwise-identical to both the independent dense kernel and the
    driver eager scorer."""
    root, cfg = spiky_index
    rd = IndexReader(spark, root, cfg)
    q = "needleterm alpha beta gamma delta"

    want_driver = rd.topk(q, 10, use_wand=False)
    want_dense = rd.topk_sharded(q, 10, kernel="dense")
    got, st = rd.topk_sharded(q, 10, return_stats=True, kernel="auto",
                              n_ranges=2)
    assert got == want_dense == want_driver
    # every returned doc is a needle doc (idf dominance is real):
    # doc_ids are mint-order, so identify needles by score — a
    # stopword-only doc scores < 1, a needle doc > idf_needle ~ 4
    assert all(s > 3.0 for _r, _d, s in got)

    frac = st["blocks_decoded"] / max(1, st["blocks_total"])
    # dense counts every shipped block as decoded, so < 1.0 alone proves
    # the auto pick routed to WAND; the gate is the round-3 bar
    assert frac < 0.5, f"spiky decode fraction {frac:.3f} >= 0.5 " \
                       f"({st['blocks_decoded']}/{st['blocks_total']})"


def test_sharded_flat_picks_dense(spark, spiky_index):
    """Counter-case: a flat all-stopword query (no dominant idf, no
    block-certified pruning) must route to the dense kernel — decode
    fraction exactly 1.0 — and stay exact."""
    root, cfg = spiky_index
    rd = IndexReader(spark, root, cfg)
    q = "alpha beta gamma delta"
    want = rd.topk(q, 10, use_wand=False)
    got, st = rd.topk_sharded(q, 10, return_stats=True, kernel="auto",
                              n_ranges=2)
    assert got == want
    assert st["blocks_decoded"] == st["blocks_total"]
