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
