"""ES ILM-style index rollover — bounded-size write generations behind
a stable stream name (the ``_rollover`` API + write alias, the way ES
data streams cap per-index size so merges, caches, and recovery stay
O(generation), never O(stream lifetime)).

Semantics here:

* A *stream* is a sequence of generation indexes
  ``<warehouse>/<stream>-000001, -000002, ...`` listed in an atomic
  state file (``<stream>.rollover.json``, write-temp + ``os.replace``
  like every registry in this repo). Generation NAMES are stored (not
  absolute paths) so a warehouse directory stays relocatable, matching
  the catalog's table-relative manifests.
* ``rollover_append`` writes a corpus batch to the CURRENT generation —
  ``index.IndexBuilder.append``'s bucket-level copy-on-write, so cost ∝
  delta — then evaluates the rollover condition (``max_docs``, the ES
  ``max_docs`` condition). When met, the generation is SEALED: the next
  batch starts a fresh generation via a full ``build_index``. ES
  creates the empty next index eagerly at the ``_rollover`` call; we
  create it lazily at the next write (observable behavior is identical
  — post-seal writes land in generation N+1 — and no empty-corpus
  build exists to special-case).
* The write alias ``<stream>-write`` (``alias.set_alias``) always
  points at the newest generation, so every other CLI verb can address
  it as ``alias://<warehouse>/<stream>-write``.
* ``rollover_search`` serves the STREAM: exact global-stats federated
  top-k over all generations (``federate.dfs_query_then_fetch`` —
  per-shard BM25 under summed df / global avgdl, proven rank- and
  score-identical to a single merged index). Generations are disjoint
  doc sets by construction, so federation is exact, and each
  generation's over-cap terms keep their cluster-side serving lane.

At 100 TB this is the only sane write topology: an unbounded single
index makes every append's affected-bucket fraction drift toward 1 and
every recovery replay unbounded, while generations bound all three of
append cost, per-index optimizer state, and blast radius — at the price
of one O(q·generations) stats round per query, which the DFS phase
already pays per shard.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .alias import set_alias
from .config import IndexConfig
from .federate import dfs_query_then_fetch
from .index import IndexBuilder, build_index
from .query import IndexReader


def _state_path(warehouse: str, stream: str) -> str:
    return os.path.join(warehouse, f"{stream}.rollover.json")


def get_state(warehouse: str, stream: str) -> dict:
    """{"generations": [names...], "sealed": bool} — sealed means the
    newest generation takes no more writes."""
    try:
        with open(_state_path(warehouse, stream)) as f:
            return dict(json.load(f))
    except FileNotFoundError:
        return {"generations": [], "sealed": False}


def _write_state(warehouse: str, stream: str, state: dict) -> None:
    os.makedirs(warehouse, exist_ok=True)
    tmp = _state_path(warehouse, stream) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
    os.replace(tmp, _state_path(warehouse, stream))


def generation_roots(warehouse: str, stream: str) -> list[str]:
    """Absolute index roots of every generation, oldest first."""
    return [
        os.path.join(os.path.abspath(warehouse), name)
        for name in get_state(warehouse, stream)["generations"]
    ]


def rollover_append(
    spark: SparkSession,
    warehouse: str,
    stream: str,
    corpus: DataFrame,
    cfg: IndexConfig | None = None,
    max_docs: int | None = None,
) -> dict:
    """Write one corpus batch into the stream and evaluate the rollover
    condition. Returns {generation, created, n_docs, rolled}."""
    if "/" in stream or not stream:
        raise ValueError(f"bad stream name {stream!r}")
    cfg = cfg or IndexConfig()
    state = get_state(warehouse, stream)
    created = not state["generations"] or state["sealed"]
    if created:
        name = f"{stream}-{len(state['generations']) + 1:06d}"
        root = os.path.join(os.path.abspath(warehouse), name)
        build_index(spark, corpus, root, cfg)
        state["generations"].append(name)
        state["sealed"] = False
    else:
        name = state["generations"][-1]
        root = os.path.join(os.path.abspath(warehouse), name)
        IndexBuilder(spark, root, cfg).append(corpus)
    n_docs = IndexReader(spark, root, cfg).n_docs
    rolled = bool(max_docs and n_docs >= max_docs)
    if rolled:
        state["sealed"] = True  # next batch starts generation N+1
    _write_state(warehouse, stream, state)
    set_alias(warehouse, f"{stream}-write", root)
    return {
        "generation": name,
        "created": created,
        "n_docs": int(n_docs),
        "rolled": rolled,
        "generations": len(state["generations"]),
    }


def rollover_now(warehouse: str, stream: str) -> dict:
    """The explicit ES ``_rollover`` call with no conditions: seal the
    current generation unconditionally."""
    state = get_state(warehouse, stream)
    if not state["generations"]:
        raise ValueError(f"stream {stream!r} has no generations")
    already = state["sealed"]
    state["sealed"] = True
    _write_state(warehouse, stream, state)
    return {
        "generation": state["generations"][-1],
        "rolled": not already,
    }


def stream_readers(
    spark: SparkSession,
    warehouse: str,
    stream: str,
    cfg: IndexConfig | None = None,
) -> list[IndexReader]:
    roots = generation_roots(warehouse, stream)
    if not roots:
        raise ValueError(f"stream {stream!r} has no generations")
    return [IndexReader(spark, r, cfg or IndexConfig()) for r in roots]


def rollover_search(
    spark: SparkSession,
    warehouse: str,
    stream: str,
    query: str,
    k: int = 10,
    cfg: IndexConfig | None = None,
) -> list[tuple[int, str, str, str, float]]:
    """Stream-wide ranked top-k: exact global-stats federation over all
    generations. (rank, repo, path, commit, score) rows."""
    return dfs_query_then_fetch(
        stream_readers(spark, warehouse, stream, cfg), query, k=k
    )
