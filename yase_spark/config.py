"""Pinned engine parameters (SURVEY.md §7 M0, BASELINE.md metric table).

Every tunable that affects output bytes/scores lives here so that "k1/b
parity with the reference" (BASELINE.json:6) is a one-line change if
authoritative values ever arrive, and so the build is reproducible across
parallelism levels (BASELINE.json:14: N vs 4N executors).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

# ---------------------------------------------------------------- BM25
K1: float = 1.2
B: float = 0.75

# idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   (Lucene-style, >= 0)
# score(d, q) = sum over unique query terms, in first-occurrence query
# order (fixed summation order -> bitwise-reproducible float64 sums,
# BASELINE.json:6 "bitwise-matching BM25 scores").

# ------------------------------------------------------------- postings
BLOCK_SIZE: int = 128          # postings per skip/block-max block (C4)
TERM_BUCKETS: int = 64         # pmod(xxhash64(term), NB) layout buckets (C7)
PARALLEL_UNITS: int = 4        # group units built concurrently (driver
                               # threads; Spark schedules their jobs in
                               # parallel, so fixed per-job latency stops
                               # serializing the build)
BUILD_GROUPS: int = 8          # checkpointable build units (S4): buckets
                               # are built group-by-group; resume skips
                               # completed groups via left-anti join.

# ---------------------------------------------------------------- skew
HOT_TERM_DF: int = 50_000      # df above which a term's posting build is
                               # sharded by doc_id range (C1 salting)
SALT_SHARDS: int = 16          # shards for hot terms

# --------------------------------------------------------------- corpus
SEED: int = 42                 # deterministic synthesizer seed (driver
                               # convention, TESTDATA.md)

# --------------------------------------------------------------- session
DEFAULT_CPUS: int = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR: str = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@dataclass(frozen=True)
class IndexConfig:
    """Per-build knobs; defaults mirror the module constants."""

    k1: float = K1
    b: float = B
    block_size: int = BLOCK_SIZE
    term_buckets: int = TERM_BUCKETS
    build_groups: int = BUILD_GROUPS
    hot_term_df: int = HOT_TERM_DF
    salt_shards: int = SALT_SHARDS
    ngrams: bool = True            # identifier n-grams (T2) in the index
    tokenizer: str = "arrow"       # "arrow" (vectorized pandas_udf,
                                   # default — measured ~10x faster per
                                   # doc than the Catalyst higher-order-
                                   # function expression, whose lambda
                                   # evaluation is interpreted) | "jvm"
                                   # — equality-tested impls of ONE spec
    parallel_units: int = PARALLEL_UNITS
    shuffle_partitions: int = field(default_factory=lambda: DEFAULT_CPUS)
    # docs per row of the positional sibling index (positions.py): hot
    # terms chunk into multiple shard rows so no task/row ever holds a
    # ubiquitous term's full position list. Not semantic: chunking
    # changes bytes-at-rest layout, never query results.
    pos_row_docs: int = 1 << 20

    # postings above which a term's merged segment stays split into one
    # row per doc-range shard (postings.py MERGE_CAP). Layout-only, like
    # pos_row_docs: splitting changes bytes-at-rest, never query results
    # (the reader concatenates shard rows; force_merge re-coalesces them)
    merge_cap: int = 50_000_000

    # target raw-content bytes per sort partition in the ingest shuffle.
    # DATA-derived (never core-derived): the partition count fixes
    # runs-per-term in the merge, so it must be identical across cluster
    # sizes for strong scaling. 4 MiB suits per-row-CPU-heavy local runs
    # (>=2.5 task waves on 32 cores at the bench sizes — wave-tail
    # balance); a 100 TB deployment raises it (e.g. 256-512 MiB) to
    # bound task count.
    sort_partition_bytes: int = 4 << 20

    # declared analysis chain (ES per-field analyzer filters) applied
    # AFTER the pinned code tokenizer at build time and to query terms
    # at read time (analysis.py — parity by construction, the reader
    # adopts these with the rest of the semantic config). stop_words is
    # the canonical space-separated string form so it JSON-round-trips
    # through catalog properties without list/tuple type drift.
    stop_words: str = ""
    stem_tokens: bool = False

    # fields that change the index bytes or query results: a reader using
    # different values than the build silently returns wrong results
    # (e.g. term_buckets mismatch -> bucket-pruned fetch misses terms), so
    # the build persists them as catalog properties and the reader
    # validates / adopts them (ADVICE round 1).
    SEMANTIC_FIELDS = (
        "k1", "b", "block_size", "term_buckets", "ngrams",
        "stop_words", "stem_tokens",
    )

    def semantic_dict(self) -> dict:
        return {f: getattr(self, f) for f in self.SEMANTIC_FIELDS}
