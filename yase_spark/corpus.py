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


def tokenize_count_encode(
    base: DataFrame, ngrams: bool = True, offsets=None
) -> DataFrame:
    """Fully fused map-side indexing (doc_id zip + T1+T2+A1+C2+C3 in ONE
    Arrow pass): sorted/deduped corpus partitions -> encoded local
    segments, one run per term per input partition.

    This is the classic map-side partial index: input partitions are
    doc_id-contiguous (the id mint range-sorts), so the partition id IS
    the doc-range shard — no shuffle of TF rows ever happens; the only
    shuffled bytes after tokenization are varint-compressed segment runs
    (~10x smaller). Memory is bounded by one input split's term counts
    (sized via spark.sql.files.maxPartitionBytes). doc_len is emitted as
    the DOCLEN_TERM pseudo posting list and decoded by the docs stage.

    ``offsets``: broadcast {_pid -> doc_id base} from
    :func:`yase_spark.ids.dedup_sorted` — when given, ``base`` must carry
    (_pid, content) and doc_ids are zipped INSIDE this kernel (saves a
    dedicated pass that would move the content column through Arrow one
    more round trip); when None, ``base`` must carry (doc_id, content).

    Arrow end-to-end (``mapInArrow``): content arrives as Arrow string
    buffers and is tokenized/counted by RE2 + dictionary-encode C++
    kernels (yase_spark.tokenize.tokenize_count_arrow) — per-token
    Python ``str`` objects never exist, which is what capped the 32-way
    scaling of the pandas path (allocator/cache churn).
    """
    import numpy as np
    import pyarrow as pa

    from .postings import encode_runs_coded
    from .tokenize import tokenize_count_arrow

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        term_chunks, doc_chunks, tf_chunks, dl_chunks = [], [], [], []
        dl_docs, dl_lens = [], []
        zbase = None
        seen = 0
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            if offsets is not None:
                if zbase is None:
                    # shard id = the sort-stage partition id (_pid), the
                    # same key the doc_id offsets are built on — the merge
                    # relies on shard order == doc-range order
                    pid = int(rb.column(0)[0].as_py())
                    zbase = offsets.value.get(pid, 0)
                doc_ids_b = np.arange(
                    zbase + seen + 1, zbase + seen + 1 + n, dtype=np.int64
                )
                seen += n
            else:
                doc_ids_b = rb.column(0).to_numpy().astype(np.int64)
            di, codes, tfs, dic, dlens = tokenize_count_arrow(
                rb.column(1), ngrams=ngrams
            )
            if codes.size:
                term_chunks.append(dic.take(pa.array(codes)))
                doc_chunks.append(doc_ids_b[di])
                tf_chunks.append(tfs)
                dl_chunks.append(dlens[di])
            dl_docs.append(doc_ids_b)
            dl_lens.append(dlens)
        if not dl_docs:
            return
        if term_chunks:
            denc = pa.chunked_array(term_chunks).combine_chunks().dictionary_encode()
            codes = denc.indices.to_numpy().astype(np.int64)
            dic = denc.dictionary
        else:
            codes = np.empty(0, dtype=np.int64)
            dic = pa.array([], type=pa.string())
        k = len(dic)
        # doc_len pseudo postings ride as one more code (tf=1, dl=token
        # count; includes empty docs so every doc has a doc_len)
        all_docs = np.concatenate(dl_docs)
        all_lens = np.concatenate(dl_lens)
        codes_full = np.concatenate([codes, np.full(all_docs.size, k, dtype=np.int64)])
        docs_full = np.concatenate(
            [np.concatenate(doc_chunks) if doc_chunks else np.empty(0, np.int64), all_docs]
        )
        tfs_full = np.concatenate(
            [np.concatenate(tf_chunks) if tf_chunks else np.empty(0, np.int64),
             np.ones(all_docs.size, dtype=np.int64)]
        )
        dls_full = np.concatenate(
            [np.concatenate(dl_chunks) if dl_chunks else np.empty(0, np.int64), all_lens]
        )
        dic_full = pa.concat_arrays([dic, pa.array([DOCLEN_TERM], type=dic.type)])
        order = np.lexsort((docs_full, codes_full))
        yield encode_runs_coded(
            codes_full[order], docs_full[order], tfs_full[order], dls_full[order],
            dic_full, pid,
        )

    from .postings import LOCAL_SCHEMA

    cols = ("_pid", "content") if offsets is not None else ("doc_id", "content")
    return base.select(*cols).mapInArrow(run, schema=LOCAL_SCHEMA)


def docs_projection(s1: DataFrame, offsets) -> DataFrame:
    """Docs dimension from the sorted/deduped corpus: zip doc_ids over the
    SKINNY columns only — content_sha256 was computed in the dedup kernel,
    so the content column never crosses Arrow here (it is projected away
    JVM-side before the Python worker)."""

    def zip_meta(batches):
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            base = offsets.value.get(int(pdf["_pid"].iloc[0]), 0)
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf[["doc_id", "repo", "path", "commit", "lang", "content_sha256"]]

    return s1.select("_pid", "repo", "path", "commit", "lang", "content_sha256").mapInPandas(
        zip_meta,
        schema="doc_id long, repo string, path string, commit string, "
        "lang string, content_sha256 string",
    )


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
