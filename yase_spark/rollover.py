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
    """{"generations": [names...], "sealed": bool, "last_seq": int} —
    sealed means the newest generation takes no more writes; last_seq
    is the monotonic generation counter (never reused, even after ILM
    retention deletes shrink the generations list)."""
    try:
        with open(_state_path(warehouse, stream)) as f:
            return dict(json.load(f))
    except FileNotFoundError:
        return {"generations": [], "sealed": False, "last_seq": 0}


def _next_seq(state: dict) -> int:
    """Next generation sequence number: one past the persisted
    monotonic counter, floored by the max numeric suffix of the listed
    generations (covers pre-``last_seq`` state files). Deriving this
    from ``len(generations)`` would REUSE a name after an ILM retention
    delete — e.g. delete gen 1 of [1,2,3] and the next append would
    mint ``-000003`` again, rebuilding over the live newest generation
    and federating it twice."""
    seq = int(state.get("last_seq", 0))
    for name in state["generations"]:
        seq = max(seq, int(name.rsplit("-", 1)[1]))
    return seq + 1


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
        seq = _next_seq(state)
        name = f"{stream}-{seq:06d}"
        root = os.path.join(os.path.abspath(warehouse), name)
        build_index(spark, corpus, root, cfg)
        state["generations"].append(name)
        state["last_seq"] = seq
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


def ilm_policy(
    spark: SparkSession,
    warehouse: str,
    stream: str,
    cfg: IndexConfig | None = None,
    keep_generations: int | None = None,
    merge_sealed: bool = True,
    vacuum_keep: int = 1,
    sweep_orphans: bool = True,
    orphan_min_age_s: float = 3600.0,
) -> dict:
    """ES ILM phase executor over a rollover stream — the hot / warm /
    delete lifecycle a long-lived data stream runs on a schedule:

    * **hot**: the newest UNSEALED generation keeps taking writes and
      is never touched here.
    * **warm** (``merge_sealed``): every sealed generation is
      read-optimized — ``force_merge`` (one segment row per term; a
      no-op when already merged, so re-running the policy is free) and
      ``vacuum(keep_last=vacuum_keep)`` (expire superseded snapshots,
      physically reclaim COW-superseded bucket dirs).
    * **delete** (``keep_generations``): the oldest generations beyond
      the newest ``keep_generations`` are dropped — the retention step
      that keeps a time-series stream's footprint bounded. The newest
      generation is never deleted.

    Crash consistency: the state file is rewritten (atomic
    ``os.replace``) BEFORE any directory is removed, so readers never
    resolve a half-deleted generation; a crash between the two leaves
    an orphan directory that the next policy run sweeps (any
    ``<stream>-NNNNNN`` dir not in the state file). The sweep is
    AGE-GATED (``orphan_min_age_s``, default 1 h): an in-flight
    ``rollover_append`` bootstrap creates its generation dir before the
    state commit and is indistinguishable from a crashed one by name
    alone, so only dirs whose newest mtime predates the threshold are
    removed — run the policy concurrently with ingest and the live
    partial build survives. ``sweep_orphans=False`` disables the sweep
    outright. Idempotent: merges no-op, vacuums converge, the delete
    set is empty on a re-run.

    At 100 TB each action is O(generation), never O(stream): merge and
    vacuum rewrite only the sealed generation's affected buckets, and
    delete is a directory unlink — which is exactly why ES caps
    generation size with rollover in the first place."""
    import re
    import shutil
    import time

    cfg = cfg or IndexConfig()
    state = get_state(warehouse, stream)
    if not state["generations"]:
        raise ValueError(f"stream {stream!r} has no generations")
    gens = list(state["generations"])
    # delete phase first (never merge a generation we are about to drop)
    deleted: list[str] = []
    if keep_generations is not None:
        if keep_generations < 1:
            raise ValueError("keep_generations must be >= 1")
        deleted = gens[: max(0, len(gens) - keep_generations)]
        if deleted:
            state["generations"] = gens[len(deleted):]
            _write_state(warehouse, stream, state)
    wh = os.path.abspath(warehouse)
    for name in deleted:
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    # orphan sweep: generation-shaped dirs no longer (or never) listed —
    # the crash window above, or a crashed rollover_append build.
    # Age-gated: a dir still being written (any file newer than the
    # threshold) is treated as an in-flight build, not an orphan.
    live = set(state["generations"])
    pat = re.compile(re.escape(stream) + r"-\d{6}$")
    swept = []
    if sweep_orphans:
        now = time.time()
        for entry in sorted(os.listdir(wh)):
            path = os.path.join(wh, entry)
            if not (pat.match(entry) and entry not in live
                    and os.path.isdir(path)):
                continue
            newest = os.path.getmtime(path)
            for dirpath, _dirs, files in os.walk(path):
                for fn in files:
                    try:
                        newest = max(
                            newest, os.path.getmtime(
                                os.path.join(dirpath, fn))
                        )
                    except OSError:
                        newest = now  # vanished mid-walk: in-flight
            if now - newest < orphan_min_age_s:
                continue
            shutil.rmtree(path, ignore_errors=True)
            swept.append(entry)
    # warm phase: every remaining sealed generation (all but the newest,
    # plus the newest itself when the stream is sealed)
    merged: list[str] = []
    vacuumed: list[str] = []
    if merge_sealed:
        sealed = state["generations"][:-1]
        if state["sealed"]:
            sealed = list(state["generations"])
        for name in sealed:
            b = IndexBuilder(spark, os.path.join(wh, name), cfg)
            b.force_merge()
            b.vacuum(keep_last=vacuum_keep)
            merged.append(name)
            vacuumed.append(name)
    return {
        "deleted": deleted,
        "swept": swept,
        "merged": merged,
        "vacuumed": vacuumed,
        "kept": list(state["generations"]),
    }
