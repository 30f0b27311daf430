"""Multi-field search: per-field BM25 with query-time field boosts.

The Lucene ``MultiFieldQueryParser`` / per-field-boost shape: every
FIELD of a document (content, title, path…) is indexed as its own
inverted index over the SAME doc-id space, and a query scores
``sum_f w_f * BM25_f(q, d)`` — each field with its own df/avgdl/dl
statistics (that per-field normalization is the practical reason
engines rank titles above bodies at equal tf).

Field index = an ordinary index built from the same corpus rows with
``content`` replaced by the field's text. Doc-id alignment is free by
construction: ids are minted as the dense row number over the natural
key order (``ids.dedup_sorted``), which depends only on (repo, path,
commit) — identical across every field of the same corpus (gated in
tests/test_fields.py, and ``fields_topk`` hard-checks ``n_docs``).

Scale shape: the combiner rides the cluster contribution lane
(``IndexReader.contrib_df`` — executor-side decode + weighted BM25 per
bucket partition, no postings at the driver). The per-field frames
union (no barrier, no extra shuffle: union is partition concatenation)
and ONE hash aggregation by doc_id feeds a TakeOrderedAndProject
top-k, so the cost is exactly one topk_distributed over the union of
the fields' postings for the query terms. A pruned variant would
rescale each field's block maxima by ``w_f`` and run the sharded
WAND per field against the shared threshold — the bounds stay valid
since ``w_f`` is a positive constant; not implemented (the unpruned
lane is the documented dispatch for bulk scoring).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def fields_topk(
    fields: list[tuple], query: str, k: int = 10
) -> DataFrame:
    """Ranked top-k over weighted fields: ``fields`` is a list of
    ``(IndexReader, weight)`` pairs whose indexes cover the same corpus
    (same doc-id space — checked). Returns (rank, doc_id, score) with
    the deterministic (score DESC, doc_id ASC) tie-break. A term the
    query mentions but a field never contains simply contributes
    nothing for that field — the standard multi-field semantics.

    Per-field ANALYSIS (the ES multi_match contract): each field's
    query terms go through that field's own declared analyzer chain
    (``rd._analyze`` — the chain the field index was built with), so a
    stemmed title field and a raw content field each match their own
    token space. A field whose chain filters the query to nothing
    contributes nothing."""
    if not fields:
        raise ValueError("fields_topk needs at least one (reader, weight)")
    readers = [r for r, _ in fields]
    n0 = readers[0].n_docs
    for r in readers[1:]:
        if r.n_docs != n0:
            raise ValueError(
                f"field indexes cover different corpora: n_docs {n0} != "
                f"{r.n_docs} — every field must be built from the same rows"
            )
    spark = readers[0].spark
    per_field_terms = [rd._analyze(query) for rd, _ in fields]
    contribs = [
        rd.contrib_df(ts, weight=w)
        for (rd, w), ts in zip(fields, per_field_terms)
        if ts
    ]
    if not contribs:
        return spark.createDataFrame(
            [], schema="rank long, doc_id long, score double"
        )
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    per_doc = allc.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score"
    )


def fields_dismax_topk(
    fields: list[tuple], query: str, k: int = 10, tie_breaker: float = 0.0
) -> DataFrame:
    """Dis-max multi-field ranking — the ES ``multi_match`` ``best_fields``
    semantics (Lucene DisjunctionMaxQuery): a doc's score is its BEST
    field's (weighted) BM25, plus ``tie_breaker`` times the other
    fields' scores::

        score = max_f s_f + tie_breaker * (sum_f s_f - max_f s_f)

    ``tie_breaker = 0`` is pure best-field (a doc matching one field
    well beats a doc matching every field poorly — the right call when
    fields are near-duplicates like title/body); ``tie_breaker = 1``
    degenerates to the weighted sum of :func:`fields_topk`.

    Scale shape: the per-field frames union with a field tag, ONE
    (doc_id, field) hash agg builds the per-field scores, one more
    per-doc agg takes max+sum — two map-side-combinable aggregations,
    TakeOrdered top-k, nothing corpus-sized at the driver."""
    if not fields:
        raise ValueError("fields_dismax_topk needs at least one (reader, weight)")
    readers = [r for r, _ in fields]
    n0 = readers[0].n_docs
    for r in readers[1:]:
        if r.n_docs != n0:
            raise ValueError(
                f"field indexes cover different corpora: n_docs {n0} != "
                f"{r.n_docs} — every field must be built from the same rows"
            )
    spark = readers[0].spark
    # per-field analysis, like fields_topk: each field matches in its
    # own chain's token space
    per_field_terms = [rd._analyze(query) for rd, _ in fields]
    tagged = [
        rd.contrib_df(ts, weight=w).withColumn("fld", F.lit(i))
        for i, ((rd, w), ts) in enumerate(zip(fields, per_field_terms))
        if ts
    ]
    if not tagged:
        return spark.createDataFrame(
            [], schema="rank long, doc_id long, score double"
        )
    allc = tagged[0]
    for c in tagged[1:]:
        allc = allc.unionByName(c)
    per_field = allc.groupBy("doc_id", "fld").agg(
        F.sum("contrib").alias("s")
    )
    tie = float(tie_breaker)
    per_doc = per_field.groupBy("doc_id").agg(
        (F.max("s") + F.lit(tie) * (F.sum("s") - F.max("s"))).alias("score")
    )
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score"
    )


def fields_cross_topk(
    fields: list[tuple], query: str, k: int = 10
) -> DataFrame:
    """Term-centric multi-field ranking — the ES ``multi_match``
    ``cross_fields`` mode (Lucene ``BlendedTermQuery``): treat the
    fields as ONE logical field per term. Two differences from the
    field-centric modes above:

    * **Blended df.** A term's idf uses ``max`` of its per-field dfs,
      so a term that is merely RARE IN ONE FIELD (every author name is
      rare in the body) cannot manufacture a huge idf — the classic
      cross_fields failure this mode exists to fix. Per-field length
      normalization (dl/avgdl) stays field-local, like Lucene.
    * **Per-term dis-max, then sum.** score(d) = sum_t max_f
      w_f*BM25_f(t, d): each query term counts once at its best field,
      terms combine additively — "first name matches the title, last
      name matches the body" scores like a full match, which
      best_fields (doc-level max) structurally cannot do.

    Scale shape: per-field dfs are a dictionary-sized metadata fetch
    (``term_dfs``); the blended dict broadcasts into the contribution
    kernels (``contrib_df(df_override=...)``); the per-field frames
    union (partition concat, no shuffle) and ONE aggregation keyed by
    (doc_id, term) -> partial re-agg by doc_id feeds TakeOrdered — the
    same one-shuffle budget as ``fields_topk``.
    """
    if not fields:
        raise ValueError("fields_cross_topk needs at least one (reader, weight)")
    readers = [r for r, _ in fields]
    n0 = readers[0].n_docs
    for r in readers[1:]:
        if r.n_docs != n0:
            raise ValueError(
                f"field indexes cover different corpora: n_docs {n0} != "
                f"{r.n_docs} — every field must be built from the same rows"
            )
    chains = {r.chain for r in readers}
    if len(chains) > 1:
        # ES groups cross_fields by analyzer for the same reason: a
        # blended per-TERM df is meaningless across incompatible token
        # spaces (one field's 'tables' is another's 'table')
        raise ValueError(
            "fields_cross_topk requires every field to share one "
            "analysis chain (ES cross_fields groups fields by analyzer)"
        )
    spark = readers[0].spark
    qterms = list(dict.fromkeys(readers[0]._analyze(query)))
    if not qterms:
        return spark.createDataFrame(
            [], schema="rank long, doc_id long, score double"
        )
    per_field_dfs = [rd.term_dfs(qterms) for rd in readers]
    blended = {
        t: max(int(d.get(t, 0)) for d in per_field_dfs) for t in qterms
    }
    blended = {t: v for t, v in blended.items() if v > 0}
    contribs = [
        rd.contrib_df(qterms, weight=w, include_term=True, df_override=blended)
        for rd, w in fields
    ]
    allc = contribs[0]
    for c in contribs[1:]:
        allc = allc.unionByName(c)
    per_doc = (
        allc.groupBy("doc_id", "term")
        .agg(F.max("contrib").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("score"))
    )
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score"
    )

def fields_combined_topk(
    fields: list[tuple], query: str, k: int = 10
) -> DataFrame:
    """ES ``combined_fields`` query (Lucene ``CombinedFieldQuery``) —
    the BM25F shape of Robertson/Zaragoza/Taylor 2004 ("Simple BM25
    extension to multiple weighted fields"): blend the fields into ONE
    synthetic field BEFORE saturation, which none of the field-centric
    modes can express (BM25's tf saturation is not additive, so
    ``sum_f BM25_f`` over-rewards a term spread across fields)::

        tf'(t,d)  = sum_f w_f * tf_f(t,d)        # raw tf blends
        dl'(d)    = sum_f w_f * dl_f(d)          # lengths blend
        avgdl'    = sum_f w_f * avgdl_f          # exact: same N per field
        df'(t)    = max_f df_f(t)                # Lucene merged stats
        score(d)  = sum_t idf(df') * sat(tf'(t,d); dl'(d))

    Like ``cross_fields``, every field must share one analysis chain
    (blending raw tf across incompatible token spaces is meaningless —
    the same grouping rule ES applies), and Lucene additionally
    requires ``w_f >= 1`` — enforced here too so the pseudo-field
    length can never shrink below a real field's.

    Scale shape: per-field RAW tf frames come from the bucket-pruned
    executor decode (``IndexReader.tf_df``), union by partition concat,
    and blend in ONE (term, doc_id) hash agg; the combined length is a
    second union+agg over the fields' doc-dimension projections
    (doc_id, doc_len — column-pruned scans); candidates join lengths on
    doc_id (candidate side is query-selective, so AQE broadcasts it
    against the corpus-sized length frame); the dictionary-sized
    blended-idf map ships as a literal. One more doc_id agg feeds
    TakeOrderedAndProject — three map-side-combinable aggregations
    total, nothing corpus-sized at the driver."""
    if not fields:
        raise ValueError("fields_combined_topk needs at least one (reader, weight)")
    readers = [r for r, _ in fields]
    n0 = readers[0].n_docs
    for r in readers[1:]:
        if r.n_docs != n0:
            raise ValueError(
                f"field indexes cover different corpora: n_docs {n0} != "
                f"{r.n_docs} — every field must be built from the same rows"
            )
    chains = {r.chain for r in readers}
    if len(chains) > 1:
        raise ValueError(
            "fields_combined_topk requires every field to share one "
            "analysis chain (raw tf blends only within one token space)"
        )
    for _, w in fields:
        if w < 1.0:
            raise ValueError(
                f"combined_fields weights must be >= 1 (Lucene rule), got {w}"
            )
    spark = readers[0].spark
    rd0 = readers[0]
    qterms = list(dict.fromkeys(rd0._analyze(query)))
    empty = "rank long, doc_id long, score double"
    if not qterms:
        return spark.createDataFrame([], schema=empty)
    per_field_dfs = [rd.term_dfs(qterms) for rd in readers]
    blended = {t: max(int(d.get(t, 0)) for d in per_field_dfs) for t in qterms}
    blended = {t: v for t, v in blended.items() if v > 0}
    if not blended:
        return spark.createDataFrame([], schema=empty)
    live = list(blended)
    k1, b = rd0.cfg.k1, rd0.cfg.b
    cavgdl = sum(w * rd.avgdl for rd, w in fields)
    tfs = [
        rd.tf_df(live).select(
            "term", "doc_id",
            (F.col("tf").cast("double") * F.lit(float(w))).alias("wtf"),
        )
        for rd, w in fields
    ]
    allt = tfs[0]
    for t in tfs[1:]:
        allt = allt.unionByName(t)
    ctf = allt.groupBy("term", "doc_id").agg(F.sum("wtf").alias("ctf"))
    dls = [
        rd.cat.read(rd.spark, "docs").select(
            "doc_id",
            (F.col("doc_len").cast("double") * F.lit(float(w))).alias("wdl"),
        )
        for rd, w in fields
    ]
    alld = dls[0]
    for d in dls[1:]:
        alld = alld.unionByName(d)
    cdl = alld.groupBy("doc_id").agg(F.sum("wdl").alias("cdl"))
    idf = {
        t: math.log(1.0 + (n0 - v + 0.5) / (v + 0.5)) for t, v in blended.items()
    }
    idf_col = F.create_map(
        *[F.lit(x) for tv in idf.items() for x in tv]
    )
    per_term = ctf.join(cdl, "doc_id").select(
        "doc_id",
        (
            idf_col[F.col("term")]
            * (F.col("ctf") * F.lit(k1 + 1.0))
            / (
                F.col("ctf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("cdl") / F.lit(cavgdl))
            )
        ).alias("c"),
    )
    per_doc = per_term.groupBy("doc_id").agg(F.sum("c").alias("score"))
    top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score"
    )


def with_runtime_fields(docs: DataFrame, fields: dict[str, str]) -> DataFrame:
    """ES RUNTIME FIELDS (schema-on-read): a mapping of field name ->
    SQL expression, materialized per query instead of per index. Each
    expression may reference stored columns and previously declared
    runtime fields (declaration order matters, as in ES scripts that
    ``emit`` from other fields' values).

    The whole point at 100 TB: runtime fields cost NOTHING at ingest
    and evaluate inside whole-stage codegen at query time — a pure
    projection, no shuffle, no stored bytes. Sorting/filtering on one
    is exactly as pushable as the expression itself (Catalyst folds it
    into the scan's projection; a filter over it prunes before any
    downstream join). The trade is query-time CPU for index bytes —
    the same trade ES documents.

    Names must be new (shadowing a stored column raises — ES rejects
    runtime/stored name clashes at mapping level)."""
    out = docs
    for name, expr in fields.items():
        if name in out.columns:
            raise ValueError(f"runtime field {name!r} shadows a stored column")
        out = out.withColumn(name, F.expr(expr))
    return out


def runtime_field_topk(
    docs: DataFrame,
    fields: dict[str, str],
    where: str,
    order_by: str,
    k: int = 15,
    cols: tuple[str, ...] = ("doc_id",),
    descending: bool = True,
) -> DataFrame:
    """Search sorted/filtered by a runtime field: declare, filter,
    rank — filter and sort expressions may name any runtime field.
    Deterministic: ties broken by doc_id ASC; the runtime values are
    part of the output contract (rounded at the entry boundary like
    every ranked surface)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    rt = with_runtime_fields(docs, fields)
    key = F.expr(order_by)
    return (
        rt.filter(F.expr(where))
        .orderBy(key.desc() if descending else key.asc(), F.asc("doc_id"))
        .limit(int(k))
        .select(*cols, *fields.keys())
    )
