"""Corpus ingest: dedup, sha256 invariant, tokenize, docs dimension.

SURVEY.md §2.1 S1/S2, §2.2 P4, §2.3 T1–T3. The sha256 per-row invariant
(BASELINE.json:6,15) is enforced JVM-side with ``F.sha2`` against a
source manifest; the code-aware tokenizer runs as a vectorized Arrow
``pandas_udf`` (BASELINE.json:6) shared verbatim with the query analyzer
and the naive oracle (yase_spark/tokenize.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from .ids import KEY, dedup_and_assign_ids
from .tokenize import tokenize_series, tokens_column

CORPUS_COLS = ["repo", "path", "commit", "lang", "content"]


def tokens_udf(ngrams: bool = True):
    """T1+T2 as one Arrow-batched scalar pandas_udf: content -> tokens."""

    @pandas_udf(ArrayType(StringType()))
    def _tok(content: pd.Series) -> pd.Series:
        return tokenize_series(content, ngrams=ngrams)

    return _tok


def check_sha256(corpus: DataFrame, manifest: DataFrame) -> int:
    """Count of per-row sha256 invariant violations (must be 0).

    ``manifest``: (repo, path, commit, content_sha256) from the source.
    Join is on the natural key; a missing manifest row also counts as a
    violation.
    """
    c = corpus.select(*KEY, F.sha2(F.col("content"), 256).alias("_sha"))
    j = c.join(manifest, KEY, "left")
    return j.filter(
        F.col("content_sha256").isNull() | (F.col("_sha") != F.col("content_sha256"))
    ).count()


def ingest(
    corpus: DataFrame,
    ngrams: bool = True,
    sort_partitions: int | None = None,
    id_offset: int = 0,
    tokenizer: str = "arrow",
):
    """corpus -> (docs_df, tokenized_df, persisted_base).

    ``docs_df``: doc_id, repo, path, commit, lang, doc_len, content_sha256
    ``tokenized_df``: doc_id, doc_len, tokens (pre-explode, for reuse)
    ``persisted_base``: the shared MEMORY_AND_DISK-persisted parent — the
    caller unpersists it once docs + postings staging are materialized.
    Persisting here means the (expensive) tokenizer pass runs ONCE even
    though two downstream tables consume it.

    Dedup keeps the lexicographically-first row per (repo, path, commit)
    — deterministic, unlike dropDuplicates' arbitrary pick.
    """
    from pyspark.storagelevel import StorageLevel

    with_ids = dedup_and_assign_ids(
        corpus.select(*CORPUS_COLS), sort_partitions=sort_partitions, id_offset=id_offset
    )
    if tokenizer == "jvm":
        tokens_col = tokens_column(F.col("content"), ngrams=ngrams)
    else:
        tokens_col = tokens_udf(ngrams=ngrams)(F.col("content"))
    base = with_ids.withColumn("tokens", tokens_col).withColumn(
        "content_sha256", F.sha2(F.col("content"), 256)
    )
    # drop `content` BEFORE any shuffle: column pruning can't help once a
    # UDF referenced it, so we project explicitly (SURVEY.md §4.1).
    base = base.select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha256",
        F.size("tokens").alias("doc_len"), "tokens",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    docs = base.drop("tokens")
    tokenized = base.select("doc_id", "doc_len", "tokens")
    base._yase_persisted_source = getattr(with_ids, "_yase_persisted_source", None)
    return docs, tokenized, base


def tokenize_and_count(base: DataFrame, ngrams: bool = True) -> DataFrame:
    """Fused T1+T2+A1: (doc_id, content) -> (term, doc_id, tf, dl) in ONE
    Arrow pass — tokenization and per-doc term counting happen in the same
    Python worker invocation, so token strings are never transferred back
    to the JVM or cached (halves the Python/Arrow traffic of the docs
    stage; term counting needs no shuffle because a document lives whole
    in one row)."""
    import itertools

    import numpy as np

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            toks = tokenize_series(pdf["content"], ngrams=ngrams)
            lens = np.array([len(x) for x in toks], dtype=np.int64)
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.fromiter(
                itertools.chain.from_iterable(toks), dtype=object, count=total
            )
            codes, uniq = pd.factorize(flat)
            doc_pos = np.repeat(np.arange(len(pdf)), lens)
            key = doc_pos.astype(np.int64) * len(uniq) + codes
            uk, first_idx, counts = np.unique(key, return_index=True, return_counts=True)
            sel = doc_pos[first_idx]
            yield pd.DataFrame(
                {
                    "term": np.asarray(uniq, dtype=object)[
                        (uk % len(uniq)).astype(np.int64)
                    ],
                    "doc_id": pdf["doc_id"].to_numpy()[sel],
                    "tf": counts.astype(np.int64),
                    "dl": lens[sel],
                }
            )

    return base.select("doc_id", "content").mapInPandas(
        run, schema="term string, doc_id long, tf long, dl long"
    )


# reserved pseudo-term whose "postings" carry per-doc token counts
# (doc_len), like Lucene's norms; cannot collide with real tokens
# (tokenizer output matches [a-z0-9_]+ only)
DOCLEN_TERM = "\x00doclen"


def tokenize_count_encode(base: DataFrame, ngrams: bool = True) -> DataFrame:
    """Fully fused map-side indexing (T1+T2+A1+C2+C3 in ONE Arrow pass):
    (doc_id, content) -> encoded local segments, one run per term per
    input partition.

    This is the classic map-side partial index: input partitions are
    doc_id-contiguous (the id mint range-sorts), so the partition id IS
    the doc-range shard — no shuffle of TF rows ever happens; the only
    shuffled bytes after tokenization are varint-compressed segment runs
    (~10x smaller). Memory is bounded by one input split's term counts
    (sized via spark.sql.files.maxPartitionBytes). doc_len is emitted as
    the DOCLEN_TERM pseudo posting list and decoded by the docs stage.
    """
    import itertools

    import numpy as np

    from .postings import _encode_groups

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        chunks = []
        for pdf in batches:
            if pdf.empty:
                continue
            toks = tokenize_series(pdf["content"], ngrams=ngrams)
            lens = np.array([len(x) for x in toks], dtype=np.int64)
            doc_ids_b = pdf["doc_id"].to_numpy()
            total = int(lens.sum())
            if total:
                flat = np.fromiter(
                    itertools.chain.from_iterable(toks), dtype=object, count=total
                )
                codes, uniq = pd.factorize(flat)
                doc_pos = np.repeat(np.arange(len(pdf)), lens)
                key = doc_pos.astype(np.int64) * len(uniq) + codes
                uk, first_idx, counts = np.unique(
                    key, return_index=True, return_counts=True
                )
                sel = doc_pos[first_idx]
                chunks.append(
                    pd.DataFrame(
                        {
                            "term": np.asarray(uniq, dtype=object)[
                                (uk % len(uniq)).astype(np.int64)
                            ],
                            "doc_id": doc_ids_b[sel],
                            "tf": counts.astype(np.int64),
                            "dl": lens[sel],
                        }
                    )
                )
            # doc_len pseudo postings (tf=1, dl=token count; includes
            # empty docs so every doc has a doc_len)
            chunks.append(
                pd.DataFrame(
                    {
                        "term": np.full(len(pdf), DOCLEN_TERM, dtype=object),
                        "doc_id": doc_ids_b,
                        "tf": np.ones(len(pdf), dtype=np.int64),
                        "dl": lens,
                    }
                )
            )
        if not chunks:
            return
        big = pd.concat(chunks, ignore_index=True)
        codes, _ = pd.factorize(big["term"].to_numpy())
        order = np.lexsort((big["doc_id"].to_numpy(), codes))
        big = big.iloc[order].reset_index(drop=True)
        big["salt"] = np.int32(pid)
        yield _encode_groups(big)

    from .postings import LOCAL_SCHEMA

    return base.select("doc_id", "content").mapInPandas(run, schema=LOCAL_SCHEMA)


def decode_doclens(staged_local: DataFrame) -> DataFrame:
    """DOCLEN_TERM pseudo-segment rows -> (doc_id, doc_len). The filter
    prunes to the pseudo-term's grp partition + pushes the term predicate
    to the parquet scan."""
    from .codec import decode_postings

    def dec(batches):
        for pdf in batches:
            for r in pdf.itertuples():
                ids, _tfs, dls = decode_postings(bytes(r.payload), int(r.df_local))
                yield pd.DataFrame({"doc_id": ids, "doc_len": dls})

    return (
        staged_local.filter(F.col("term") == DOCLEN_TERM)
        .select("df_local", "payload")
        .mapInPandas(dec, schema="doc_id long, doc_len long")
    )


def explode_terms(tokenized: DataFrame) -> DataFrame:
    """(doc_id, doc_len, tokens) -> (doc_id, doc_len, term) rows."""
    return tokenized.select(
        "doc_id", "doc_len", F.explode("tokens").alias("term")
    )


def term_counts(tokenized: DataFrame) -> DataFrame:
    """(doc_id, doc_len, tokens) -> (term, doc_id, tf, dl) — the TF table,
    computed INSIDE the Arrow batch with numpy (factorize + unique).

    Term frequency is a per-document statistic and every document sits
    whole in one row, so counting needs no shuffle at all. The explode →
    groupBy(term, doc_id) alternative (stats.term_frequencies) pushes
    ~2.5× more rows through a full JVM hash-agg shuffle, whose 32-way
    concurrent partial-agg state was the measured scaling bottleneck of
    the docs stage. Equivalence with the relational path is tested.
    """
    import itertools

    import numpy as np
    import pandas as pd

    def count(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            toks = pdf["tokens"]
            lens = np.array([len(x) if x is not None else 0 for x in toks])
            total = int(lens.sum())
            if total == 0:
                continue
            flat = np.fromiter(
                itertools.chain.from_iterable(t for t in toks if t is not None),
                dtype=object,
                count=total,
            )
            codes, uniq = pd.factorize(flat)
            doc_pos = np.repeat(np.arange(len(pdf)), lens)
            key = doc_pos.astype(np.int64) * len(uniq) + codes
            uk, first_idx, counts = np.unique(
                key, return_index=True, return_counts=True
            )
            doc_ids = pdf["doc_id"].to_numpy()[doc_pos[first_idx]]
            dls = pdf["doc_len"].to_numpy()[doc_pos[first_idx]]
            yield pd.DataFrame(
                {
                    "term": np.asarray(uniq, dtype=object)[(uk % len(uniq)).astype(np.int64)],
                    "doc_id": doc_ids,
                    "tf": counts.astype(np.int64),
                    "dl": dls.astype(np.int64),
                }
            )

    return tokenized.mapInPandas(
        count, schema="term string, doc_id long, tf long, dl long"
    )
