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


# reserved pseudo-term whose "postings" carry per-doc token counts
# (doc_len), like Lucene's norms; cannot collide with real tokens
# (tokenizer output matches [a-z0-9_]+ only)
DOCLEN_TERM = "\x00doclen"
# reserved pseudo-term whose payload carries Arrow-IPC-serialized doc
# metadata chunks (repo, path, commit, lang, content_sha256) — the docs
# dimension rides inside the local-segments channel so the single fused
# kernel is the ONLY pass over content after the ingest shuffle
DOCMETA_TERM = "\x00docmeta"

# doc_len rides inside the metadata chunk too: the docs table then needs
# NO join against the decoded doclen postings (at 10^12 rows that join
# was a full-table shuffle purely to attach one int)
_DOCMETA_FIELDS = ["repo", "path", "commit", "lang", "content_sha256"]


def fused_local_segments(
    sorted_corpus: DataFrame, ngrams: bool = True, chain=None
) -> DataFrame:
    """THE single content pass of the build: the range-shuffled, sorted
    corpus partitions stream through ONE mapInArrow kernel that

    1. deduplicates adjacent equal-key runs (equal keys are co-located
       by the range partitioner and adjacent after the sort),
    2. computes content_sha256 straight from the Arrow string buffer,
    3. tokenizes + counts via the RE2/dictionary C++ kernels,
    4. encodes local segment runs with LOCAL (per-partition, 1-based)
       doc ids — re-based to global ids by the merge via the per-shard
       doc-count offsets, which are themselves derived from the emitted
       DOCLEN runs (no driver barrier between shuffle and kernel),
    5. emits the docs dimension as DOCMETA pseudo-rows (Arrow IPC bytes
       in the payload column, cf_local = chunk sequence).

    Compared to the round-2 two-pass layout (dedup+persist, then
    tokenize), this removes the MEMORY_AND_DISK persist of the full
    content, one JVM->Python->JVM content round trip, and the
    counts-collect barrier — the content column exists exactly twice on
    the wire: source scan -> shuffle, shuffle -> this kernel.

    Input must have columns (repo, path, commit, lang, content), already
    ``repartitionByRange(n, KEY).sortWithinPartitions(KEY, 'lang',
    'content')``.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from .postings import LOCAL_SCHEMA, encode_runs_coded
    from .tokenize import tokenize_count_arrow

    names = ["repo", "path", "commit", "lang", "content"]
    ki = [0, 1, 2]
    ci = 4

    def run(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        prev_key = None
        seen = 0
        chunk_seq = 0
        term_chunks, doc_chunks, tf_chunks, dl_chunks = [], [], [], []
        dl_docs, dl_lens = [], []
        meta_rows = []

        meta_schema = pa.schema(
            [(f, pa.string()) for f in _DOCMETA_FIELDS] + [("doc_len", pa.int64())]
        )

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            keep = np.ones(n, dtype=bool)
            if n > 1:
                dup = None
                for i in ki:
                    col = rb.column(i)
                    eq = pc.equal(col.slice(1), col.slice(0, n - 1))
                    dup = eq if dup is None else pc.and_(dup, eq)
                keep[1:] = ~dup.to_numpy(zero_copy_only=False)
            first = tuple(rb.column(i)[0].as_py() for i in ki)
            if prev_key is not None and first == prev_key:
                keep[0] = False
            prev_key = tuple(rb.column(i)[n - 1].as_py() for i in ki)
            if not keep.any():
                continue
            out = rb.filter(pa.array(keep)) if not keep.all() else rb
            m = out.num_rows
            local_ids = np.arange(seen + 1, seen + 1 + m, dtype=np.int64)
            seen += m

            # sha256 from the utf-8 bytes in the Arrow buffer
            content = out.column(ci)
            odt = np.int64 if pa.types.is_large_string(content.type) else np.int32
            offs = np.frombuffer(content.buffers()[1], dtype=odt)
            offs = offs[content.offset : content.offset + m + 1]
            mv = memoryview(content.buffers()[2])
            shas = [
                hashlib.sha256(mv[offs[i] : offs[i + 1]]).hexdigest()
                for i in range(m)
            ]

            # tokenize + count (C++), pairs with LOCAL doc ids
            di, codes, tfs, dic, dlens = tokenize_count_arrow(
                content, ngrams=ngrams, chain=chain
            )

            # doc metadata chunk -> Arrow IPC bytes (one pseudo-row);
            # doc_len included so the docs table needs no join
            meta_rb = pa.record_batch(
                [out.column(0), out.column(1), out.column(2), out.column(3),
                 pa.array(shas, type=pa.string()), pa.array(dlens, type=pa.int64())],
                schema=meta_schema,
            )
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, meta_schema) as w:
                w.write_batch(meta_rb)
            meta_rows.append((m, chunk_seq, sink.getvalue().to_pybytes()))
            chunk_seq += 1
            if codes.size:
                term_chunks.append(dic.take(pa.array(codes)))
                doc_chunks.append(local_ids[di])
                tf_chunks.append(tfs)
                dl_chunks.append(dlens[di])
            dl_docs.append(local_ids)
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
        yield pa.record_batch(
            {
                "term": pa.array([DOCMETA_TERM] * len(meta_rows), type=pa.string()),
                "shard": pa.array(
                    np.full(len(meta_rows), pid, dtype=np.int32)
                ),
                "df_local": pa.array([r[0] for r in meta_rows], type=pa.int64()),
                "cf_local": pa.array([r[1] for r in meta_rows], type=pa.int64()),
                "payload": pa.array([r[2] for r in meta_rows], type=pa.binary()),
            }
        )

    return sorted_corpus.select(*names).mapInArrow(run, schema=LOCAL_SCHEMA)


def shard_offsets_from_doclens(staged_doclen_rows) -> dict:
    """{shard -> global doc_id base} from the DOCLEN runs' df_local
    (= deduped docs per shard). One tiny collect over pruned rows."""
    rows = sorted(
        (int(r["shard"]), int(r["df_local"])) for r in staged_doclen_rows
    )
    offsets, acc = {}, 0
    for shard, cnt in rows:
        offsets[shard] = acc
        acc += cnt
    return offsets, acc


def docs_from_meta(staged: DataFrame, offsets: dict) -> DataFrame:
    """Decode DOCMETA pseudo-rows -> the docs dimension with GLOBAL
    doc_ids. The per-chunk doc_id base is resolved driver-side from the
    (tiny) chunk index first, so decoding makes no assumptions about
    which Spark partition a chunk lands in."""
    import numpy as np
    import pyarrow as pa

    meta = staged.filter(F.col("term") == DOCMETA_TERM).select(
        "shard", "df_local", "cf_local", "payload"
    )
    idx = sorted(
        (int(r["shard"]), int(r["cf_local"]), int(r["df_local"]))
        for r in meta.select("shard", "cf_local", "df_local").collect()
    )
    chunk_base = {}
    run = {}
    for shard, cf, n in idx:
        chunk_base[(shard, cf)] = offsets.get(shard, 0) + run.get(shard, 0)
        run[shard] = run.get(shard, 0) + n
    bo = staged.sparkSession.sparkContext.broadcast(chunk_base)

    def dec(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            for r in pdf.itertuples():
                base = bo.value[(int(r.shard), int(r.cf_local))]
                rdr = pa.ipc.open_stream(pa.BufferReader(bytes(r.payload)))
                tbl = rdr.read_all().to_pandas()
                tbl.insert(
                    0, "doc_id",
                    np.arange(base + 1, base + 1 + len(tbl), dtype=np.int64),
                )
                yield tbl

    return meta.mapInPandas(
        dec,
        schema="doc_id long, repo string, path string, commit string, "
        "lang string, content_sha256 string, doc_len long",
    )


def decode_doclens(staged_local: DataFrame, offsets: dict | None = None) -> DataFrame:
    """DOCLEN_TERM pseudo-segment rows -> (doc_id, doc_len). The filter
    prunes to the pseudo-term's grp partition + pushes the term predicate
    to the parquet scan. ``offsets``: per-shard doc_id bases when the
    runs were encoded with LOCAL ids (fused single-pass build)."""
    from .codec import decode_postings

    spark = staged_local.sparkSession
    bo = spark.sparkContext.broadcast(offsets or {})

    def dec(batches):
        for pdf in batches:
            for r in pdf.itertuples():
                ids, _tfs, dls = decode_postings(bytes(r.payload), int(r.df_local))
                base = bo.value.get(int(r.shard), 0)
                yield pd.DataFrame({"doc_id": ids + base, "doc_len": dls})

    return (
        staged_local.filter(F.col("term") == DOCLEN_TERM)
        .select("shard", "df_local", "payload")
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
