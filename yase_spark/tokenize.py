"""Code-aware tokenization (SURVEY.md §2.3 T1–T4).

Spec: BASELINE.json:6 "code-aware tokenization (camelCase/snake_case
splitting, identifier n-grams) via vectorized Arrow pandas_udf".

Pinned tokenizer definition (applied identically by the index build, the
driver-side query analyzer, the pure-Python oracle, and the DuckDB oracle
SQL — rank identity requires analyzer parity):

1. Identifier extraction: maximal runs of ``[A-Za-z0-9_]`` in the text;
   everything else is a separator.
2. Part splitting, in this exact order (regexes chosen to behave
   identically under Python ``re``, pandas, and DuckDB RE2):
     a. ``_`` -> space                      (snake_case)
     b. ``([A-Z]+)([A-Z][a-z])`` -> ``\\1 \\2``   (acronym boundary: HTMLDoc)
     c. ``([a-z0-9])([A-Z])``    -> ``\\1 \\2``   (camel boundary: getUser)
3. Emitted tokens, all lowercased:
     - every part (always);
     - the full identifier, iff it is multi-part (contains ``_`` or a
       camel boundary) — so ``getUserName`` yields
       ``get user name getusername`` and a one-part token is not doubled;
     - (T2, optional) identifier n-grams: adjacent part bigrams joined
       with ``_`` — ``get_user``, ``user_name`` — which makes
       ``getUserName`` and ``get_user_name`` share bigram tokens.

Term frequencies are multiset counts over this stream.
"""

from __future__ import annotations

import re

import pandas as pd

IDENT_RE = "[A-Za-z0-9_]+"
NON_IDENT_RE = "[^A-Za-z0-9_]+"
ACRONYM_RE = r"([A-Z]+)([A-Z][a-z])"
CAMEL_RE = r"([a-z0-9])([A-Z])"
# a full identifier is "multi-part" iff it matches this (an underscore
# counts only with identifier chars on BOTH sides: "_x" / "x_" are one part)
MULTIPART_RE = r"[A-Za-z0-9]_+[A-Za-z0-9]|[A-Z]+[A-Z][a-z]|[a-z0-9][A-Z]"

_acronym = re.compile(ACRONYM_RE)
_camel = re.compile(CAMEL_RE)
_multipart = re.compile(MULTIPART_RE)
_ident = re.compile(IDENT_RE)


def split_parts(identifier: str) -> list[str]:
    """Lowercased parts of a single identifier, in order."""
    s = identifier.replace("_", " ")
    s = _acronym.sub(r"\1 \2", s)
    s = _camel.sub(r"\1 \2", s)
    return s.lower().split()


def tokenize_text(text: str, ngrams: bool = True) -> list[str]:
    """Reference (pure-Python) tokenizer — the query analyzer (T4) and the
    naive oracle both call this; the Spark path (tokenize_series) must
    produce the identical multiset per document (tested)."""
    out: list[str] = []
    for ident in _ident.findall(text):
        parts = split_parts(ident)
        out.extend(parts)
        if len(parts) > 1:
            out.append(ident.lower())
            if ngrams:
                out.extend(
                    parts[i] + "_" + parts[i + 1] for i in range(len(parts) - 1)
                )
    return out


def analyze_phrase(query: str) -> list[str]:
    """Phrase analyzer: the query's PARTS stream in order (no synonym
    tokens, duplicates kept) — the positional index's token stream
    (positions.py module docstring), so ``"getUserName"`` as a phrase is
    the 3-part sequence ``get user name``."""
    out: list[str] = []
    for ident in _ident.findall(query):
        out.extend(split_parts(ident))
    return out


def analyze_query(query: str, ngrams: bool = False) -> list[str]:
    """Query analyzer (T4): unique tokens, first-occurrence order kept —
    the fixed BM25 summation order (BASELINE.json:6 bitwise parity)."""
    seen: dict[str, None] = {}
    for t in tokenize_text(query, ngrams=ngrams):
        seen.setdefault(t)
    return list(seen)


# matches a whole identifier iff it is multi-part (anchored lookahead)
MULTI_IDENT_RE = (
    r"(?<![A-Za-z0-9_])(?=[A-Za-z0-9_]*(?:" + MULTIPART_RE + r"))[A-Za-z0-9_]+"
)

# zero-width equivalents of ACRONYM_RE / CAMEL_RE: same split positions,
# but a constant replacement string keeps re.sub on its C fast path
# (backreference templates cost a Python expand_template call per match —
# ~1M calls per 2000 docs dominated the tokenizer profile).
ACRONYM_SPLIT = r"(?<=[A-Z])(?=[A-Z][a-z])"
CAMEL_SPLIT = r"(?<=[a-z0-9])(?=[A-Z])"
# one-pass union of both boundaries: a zero-width insertion can neither
# create nor destroy a match of the other pattern (a space/underscore
# breaks adjacency, and acronym sites have an uppercase on the left),
# so one combined pass == the two sequential passes.
BOUNDARY_SPLIT = r"(?<=[A-Z])(?=[A-Z][a-z])|(?<=[a-z0-9])(?=[A-Z])"


def tokens_column(col, ngrams: bool = True):
    """The SAME pinned tokenizer as a pure Catalyst column expression
    (whole-stage codegen, zero Python workers).

    Two equality-tested implementations exist on purpose: this one is the
    default build path — at 32 threads the pandas tokenizer's millions of
    per-token Python string objects put the kernel at ~66%% sys time
    (pymalloc arena churn), while the JVM expression scales with cores.
    ``tokenize_series`` (Arrow pandas_udf) remains the spec-surface UDF
    path (BASELINE.json:6) and the property-tested reference.

    Java regex supports the fixed-width lookbehind/lookahead boundary
    patterns used here; the classes are ASCII so Java/Python/RE2 agree.
    """
    from pyspark.sql import functions as F

    # parts stream
    parts = F.split(
        F.lower(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(col, NON_IDENT_RE, " "), "_", " "
                ),
                BOUNDARY_SPLIT,
                " ",
            )
        ),
        " +",
    )
    parts = F.filter(parts, lambda x: x != "")

    # multipart identifiers, original form
    idents = F.filter(
        F.split(F.regexp_replace(col, NON_IDENT_RE, " "), " +"),
        lambda x: x.rlike(MULTIPART_RE),
    )
    fulls = F.transform(idents, lambda x: F.lower(x))
    if not ngrams:
        return F.concat(parts, fulls)

    # normalized underscore-joined form per multipart identifier:
    #   boundary -> '_', collapse runs, strip edge underscores, lower
    norm = F.transform(
        idents,
        lambda x: F.lower(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(x, BOUNDARY_SPLIT, "_"), "_+", "_"
                ),
                "^_+|_+$",
                "",
            )
        ),
    )
    # adjacent-part bigrams per identifier (multipart => >= 2 parts, so
    # the sequence upper bound is always >= 0)
    part_arrays = F.transform(norm, lambda s: F.split(s, "_"))
    bigrams = F.flatten(
        F.transform(
            part_arrays,
            lambda p: F.transform(
                F.sequence(F.lit(0), F.size(p) - F.lit(2)),
                lambda i: F.concat(F.get(p, i), F.lit("_"), F.get(p, i + 1)),
            ),
        )
    )
    return F.concat(parts, fulls, bigrams)


def tokenize_count_arrow(contents, ngrams: bool = True, chain=None):
    """THE SAME pinned tokenizer fused with per-doc term counting,
    executed almost entirely in Arrow C++ kernels (RE2 regex over flat
    string buffers, no per-token Python objects).

    Motivation (round 2 scaling work): the pandas ``.str`` tokenizer
    materializes millions of Python ``str`` tokens per batch; allocator
    and cache pressure give it a measured ~1.22x per-core slowdown at 32
    concurrent workers, which alone caps N->4N build scaling efficiency
    at ~0.8. RE2 + flat buffers keep the hot loop in C++ (also ~4x
    faster per core), and counting happens on integer codes.

    Equivalence with :func:`tokenize_text` is property-tested per doc
    (multiset of tokens). The capture-group acronym/camel regexes are
    applied on the raw identifier (underscores intact) instead of after
    ``_ -> ' '``; both boundary classes exclude ``_``/space, so the
    substitution sites are identical (same argument as BOUNDARY_SPLIT).

    ``contents``: pa.Array/ChunkedArray of strings (or pd.Series).
    Returns ``(doc_idx, codes, tfs, dictionary, doc_lens)``:
    unique (doc, term) pairs with term-frequencies, the term dictionary
    (pa.StringArray), and per-doc total token counts — doc_idx is the
    0-based position within this batch.

    ``chain`` (analysis.AnalyzerChain, duck-typed to avoid an import
    cycle): the declared post-tokenizer filters. Applied at the
    DICTIONARY level, which is the cheap place — stopword membership
    and stemming are computed once per distinct term per batch
    (vocabulary-sized Python work), then pushed onto the integer codes:
    stopword pairs are dropped with their tf subtracted from doc_lens
    (BM25 length norms see the filtered stream), stem folding remaps
    codes and re-aggregates tf per (doc, stem). The C++ hot loop is
    untouched.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(contents, pd.Series):
        contents = pa.Array.from_pandas(contents.fillna(""))
    elif isinstance(contents, pa.ChunkedArray):
        contents = contents.combine_chunks()
    contents = pc.fill_null(contents, "")
    n_docs = len(contents)

    def flat_nonempty(list_arr):
        parents = pc.list_parent_indices(list_arr)
        flat = pc.list_flatten(list_arr)
        mask = pc.not_equal(flat, "")
        return flat.filter(mask), parents.filter(mask)

    # identifiers per doc (maximal [A-Za-z0-9_]+ runs)
    idents, id_doc = flat_nonempty(pc.split_pattern_regex(contents, NON_IDENT_RE))
    # normalized underscore-joined form: acronym then camel boundaries
    # become '_', everything lowercased (same split sites as split_parts)
    norm = pc.replace_substring_regex(idents, ACRONYM_RE, r"\1_\2")
    norm = pc.replace_substring_regex(norm, CAMEL_RE, r"\1_\2")
    norm = pc.utf8_lower(norm)
    parts_l = pc.split_pattern_regex(norm, "_+")
    parts, p_ident = flat_nonempty(parts_l)
    p_doc = pc.take(id_doc, p_ident)

    # multipart identifiers: full lowercased form is also a token
    multi = pc.match_substring_regex(idents, MULTIPART_RE)
    fulls = pc.utf8_lower(idents.filter(multi))
    f_doc = id_doc.filter(multi)

    streams = [(parts, p_doc.to_numpy()), (fulls, f_doc.to_numpy())]
    if ngrams:
        # adjacent-part bigrams of multipart identifiers: pair positions
        # from the flattened parts-of-multipart stream (order preserved)
        mparts, m_ident = flat_nonempty(parts_l.filter(multi))
        mi = m_ident.to_numpy()
        if mi.size > 1:
            left = np.flatnonzero(mi[1:] == mi[:-1]).astype(np.int64)
            lidx = pa.array(left)
            ridx = pa.array(left + 1)
            bigrams = pc.binary_join_element_wise(
                mparts.take(lidx), mparts.take(ridx), "_"
            )
            b_doc = f_doc.to_numpy()[mi[left]]
            streams.append((bigrams, b_doc))

    all_terms = pa.concat_arrays(
        [s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s for s, _ in streams]
    )
    all_docs = np.concatenate([d for _, d in streams]) if streams else np.empty(0, np.int64)
    doc_lens = np.bincount(all_docs, minlength=n_docs).astype(np.int64)
    if len(all_terms) == 0:
        return (
            np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64),
            pa.array([], type=pa.string()), doc_lens,
        )
    denc = all_terms.dictionary_encode()
    codes = denc.indices.to_numpy().astype(np.int64)
    dictionary = denc.dictionary
    k = len(dictionary)
    key = all_docs.astype(np.int64) * k + codes
    uk, tfs = np.unique(key, return_counts=True)
    di, codes, tfs = uk // k, uk % k, tfs.astype(np.int64)
    if chain is not None and not getattr(chain, "is_noop", True):
        di, codes, tfs, dictionary, doc_lens = _apply_chain_pairs(
            di, codes, tfs, dictionary, doc_lens, n_docs, chain
        )
    return di, codes, tfs, dictionary, doc_lens


def _apply_chain_pairs(di, codes, tfs, dictionary, doc_lens, n_docs, chain):
    """Analysis-chain application over unique (doc, term-code, tf)
    pairs: all per-token work happens on the batch-local DICTIONARY
    (distinct terms), never on the token stream."""
    import numpy as np
    import pyarrow as pa

    dic_py = dictionary.to_pylist()
    if chain.stop_words:
        stop = np.fromiter(
            (t in chain.stop_words for t in dic_py), bool, len(dic_py)
        )
        drop = stop[codes]
        if drop.any():
            doc_lens = doc_lens - np.bincount(
                di[drop], weights=tfs[drop], minlength=n_docs
            ).astype(np.int64)
            di, codes, tfs = di[~drop], codes[~drop], tfs[~drop]
    if chain.stem:
        from .expand import s_stem  # local: avoids a module-level cycle

        stems = np.array([s_stem(t) for t in dic_py], dtype=object)
        new_dic, old_to_new = np.unique(stems, return_inverse=True)
        k2 = len(new_dic)
        new_codes = old_to_new[codes]
        key = di * k2 + new_codes
        uk, inv = np.unique(key, return_inverse=True)
        tfs = np.bincount(inv, weights=tfs).astype(np.int64)
        di, codes = uk // k2, uk % k2
        dictionary = pa.array(new_dic.tolist(), type=pa.string())
    return di, codes, tfs, dictionary, doc_lens


def tokenize_series(texts: pd.Series, ngrams: bool = True) -> pd.Series:
    """Vectorized tokenizer body used inside the Arrow pandas_udf (T1/T2).

    Whole-Series pandas ``.str`` regex passes only — no per-identifier
    Python loop (that loop dominated the profile at ~3 s / 1000 docs).
    The bigram stream is produced by a string rewrite: parts are joined
    with ``_`` and ``'_p(?=_)' -> '_p p'`` duplicates interior parts, so
    ``a_b_c`` becomes ``a_b b_c``. Equivalence with ``tokenize_text`` is
    property-tested (tests/test_tokenize.py).
    """
    s = texts.fillna("")
    # --- parts stream (always emitted)
    parts_str = (
        s.str.replace(NON_IDENT_RE, " ", regex=True)
        .str.replace("_", " ", regex=False)
        .str.replace(BOUNDARY_SPLIT, " ", regex=True)
        .str.lower()
    )
    parts_lists = parts_str.str.split()

    # --- multipart identifiers, original form, space-joined stream
    m_str = s.str.findall(MULTI_IDENT_RE).str.join(" ")
    fulls = m_str.str.lower().str.split()
    if not ngrams:
        return parts_lists.combine(fulls, lambda a, b: (a or []) + (b or []))

    bigrams = (
        m_str.str.replace(BOUNDARY_SPLIT, "_", regex=True)
        .str.lower()
        .str.replace(r"_+", "_", regex=True)
        .str.replace(r"(?<![a-z0-9])_+", "", regex=True)
        .str.replace(r"_+(?![a-z0-9])", "", regex=True)
        .str.replace(r"_([a-z0-9]+)(?=_)", r"_\1 \1", regex=True)
        .str.split()
    )
    out = parts_lists.combine(fulls, lambda a, b: (a or []) + (b or []))
    return out.combine(bigrams, lambda a, b: (a or []) + (b or []))
