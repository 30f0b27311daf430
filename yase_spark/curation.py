"""Training-data curation operators over the ``documents`` table:
benchmark decontamination, deterministic stratified sampling,
token-window chunking, and sequence packing.

These fill the curation stages a real LLM-data pipeline runs between
dedup (neardup.py) and materialization (pipeline.py):

* ``decontaminate`` — n-gram overlap against an eval/benchmark set
  (the GPT-3/FLAN-style 13-gram rule, n configurable). The benchmark
  gram set is tiny relative to the corpus (10^6-10^7 grams even for
  large eval suites), so the plan is a BROADCAST semi-join against the
  map-side-distinct doc-gram stream: the 100-TB corpus is never
  shuffled — only matched grams (a sliver) reach the per-doc count,
  and the count table joins back broadcast. Everything else is one
  scan in WholeStageCodegen.
* ``stratified_sample`` — per-stratum Bernoulli sampling keyed on a
  cross-engine md5 hash of the doc key: deterministic (re-runs pick
  identical rows, the property a resumable pipeline needs), map-only,
  zero shuffles. Thresholds are pre-scaled to integers so the
  keep/drop comparison is exact in both engines — no float-boundary
  flakes.
* ``chunk_docs`` — fixed token windows (size/stride, overlap allowed)
  over the word stream; all-integer window arithmetic so Spark and the
  DuckDB oracle agree bitwise. Map-only: a doc's chunks are computed
  where the doc lives; output fan-out is bounded by n_tokens/stride.
* ``pack_sequences`` — next-fit bin packing of docs into max_tokens
  training sequences. Packing is inherently sequential, so the global
  problem is sharded: docs hash into ``n_groups`` independent packing
  groups, each packed by one deterministic next-fit pass (Arrow-batch
  ``applyInPandas``, vectorized numpy inside). At 10^12 docs, pick
  n_groups ~ corpus/50k docs: groups pack in parallel across the
  cluster, each holds only (doc_id, len) pairs — a few hundred KB —
  and the per-group result is independent of every other group, so
  the packing is reproducible under any executor placement.

All outputs are value-checked against DuckDB oracles in
``__spark_entry__.py`` (``decontaminate``/``stratified_sample``/
``chunk_docs`` as closed-form SQL; ``pack_sequences`` via a recursive
CTE replaying the same next-fit recurrence).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9_]+"

# 60-bit md5 prefix as bigint — the same cross-engine idiom as
# textstats.doc_fingerprints (Spark conv(hex,16,10) == DuckDB
# CAST(concat('0x',hex) AS BIGINT) for 15 hex digits = 60 bits < 2^63).
def _h60(expr: str) -> str:
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def _grams_expr(n: int) -> str:
    """Distinct n-grams (space-joined) of the lowercased word stream.

    Guarded: Spark's sequence(1, 0) yields a DESCENDING [1, 0] rather
    than an empty array, so short docs must short-circuit to array().
    """
    return (
        f"case when size(w) >= {n} then array_distinct(transform("
        f"sequence(1, size(w) - {n} + 1), i -> concat_ws(' ', slice(w, i, {n}))"
        ")) else array() end"
    )


def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 5) -> DataFrame:
    """Flag docs sharing any word n-gram with a benchmark set.

    Output: (doc_id, n_grams, n_hits, contaminated) for EVERY doc in
    ``docs`` — n_grams counts the doc's distinct n-grams, n_hits how
    many of them occur anywhere in ``bench``, contaminated = n_hits>0.

    Both sides tokenize identically (lowercased ``[a-z0-9_]+`` runs),
    so a benchmark doc that also appears verbatim in the corpus always
    flags itself. Join key is the 64-bit xxhash64 of the gram, not the
    gram string — the broadcast table and the shuffle-free probe stay
    narrow no matter how long the grams are (internal only: the oracle
    joins on the raw gram, counts agree iff collision-free — grams are
    distinct per doc, so hashes are too).

    ONE corpus tokenize pass (guide §2.4): the per-doc gram count rides
    each exploded row (explode_outer keeps zero-gram docs, with a NULL
    hash that can never match), the broadcast bench join marks hits,
    and one map-side-combinable per-doc aggregate emits both columns —
    the r5 shape ran the full regex+gram evaluation a second time just
    for the n_grams side.
    """
    w = f"regexp_extract_all(lower(text), '{WORD_RE}', 0)"
    sized = (
        docs.select("doc_id", F.expr(w).alias("w"))
        .select("doc_id", F.expr(_grams_expr(n)).alias("gs"))
        .select(
            "doc_id",
            F.size("gs").alias("n_grams"),
            F.explode_outer("gs").alias("g"),
        )
        .select(
            "doc_id",
            "n_grams",
            F.when(F.col("g").isNotNull(), F.xxhash64("g")).alias("h"),
        )
    )
    bench_grams = (
        bench.select(F.expr(w).alias("w"))
        .select(F.explode(F.expr(_grams_expr(n))).alias("g"))
        .select(F.xxhash64("g").alias("h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        sized.join(F.broadcast(bench_grams), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.min("n_grams").alias("n_grams"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    salt: str = "s0",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample.

    Keeps a doc iff h60(salt || doc_id) < rate[stratum] * 2^60, i.e.
    every run (and every engine) selects the identical row set. The
    comparison threshold is a pre-computed INTEGER per stratum, so
    there is no float rounding at the decision boundary. Map-only —
    the filter runs inside the scan's codegen stage; at 100 TB this is
    a single pass with the sampled slice as the only output.

    Output: (doc_id, stratum, h) of kept rows.
    """
    h = _h60(f"concat('{salt}', cast(doc_id as string))")
    thresholds = {s: int(r * (1 << 60)) for s, r in rates.items()}
    branches = " ".join(
        f"when '{s}' then {t}L" for s, t in sorted(thresholds.items())
    )
    thr = f"case {stratum_col} {branches} else {int(default_rate * (1 << 60))}L end"
    return (
        docs.select(
            "doc_id",
            F.col(stratum_col).alias("stratum"),
            F.expr(h).alias("h"),
            F.expr(thr).alias("thr"),
        )
        .filter(F.col("h") < F.col("thr"))
        .select("doc_id", "stratum", "h")
    )


def chunk_docs(
    docs: DataFrame, chunk: int = 64, stride: int | None = None
) -> DataFrame:
    """Split each doc's word stream into fixed token windows.

    Windows start at 0, stride, 2*stride, ...; ``stride < chunk``
    yields overlapping chunks (the usual context-window training prep).
    A doc with t > 0 tokens emits 1 + ceil(max(t - chunk, 0) / stride)
    windows (the last may be short); empty docs emit nothing. All the
    window math is integer, shared verbatim with the oracle SQL.

    Output: (doc_id, chunk_id, n_tokens, chunk_text).
    """
    stride = stride or chunk
    if stride <= 0 or chunk <= 0:
        raise ValueError("chunk and stride must be positive")
    w = f"regexp_extract_all(lower(text), '{WORD_RE}', 0)"
    n_win = f"1 + cast(floor((greatest(size(w) - {chunk}, 0) + {stride} - 1) / {stride}) as int)"
    wins = (
        f"case when size(w) > 0 then sequence(0, {n_win} - 1) "
        "else cast(array() as array<int>) end"
    )
    return (
        docs.select("doc_id", F.expr(w).alias("w"))
        .select("doc_id", "w", F.explode(F.expr(wins)).alias("chunk_id"))
        .select(
            "doc_id",
            "chunk_id",
            F.expr(f"least({chunk}, size(w) - chunk_id * {stride})").alias("n_tokens"),
            F.expr(f"concat_ws(' ', slice(w, chunk_id * {stride} + 1, {chunk}))").alias(
                "chunk_text"
            ),
        )
    )


PACK_SCHEMA = "doc_id bigint, grp int, bin_id bigint, off bigint, n_tokens bigint"


def pack_sequences(
    docs: DataFrame, max_tokens: int = 256, n_groups: int = 8, salt: str = "p0"
) -> DataFrame:
    """Next-fit pack docs into max_tokens training sequences, sharded
    into ``n_groups`` independent hash groups.

    Within a group (docs ordered by doc_id) the next-fit recurrence is:
    if the current bin is non-empty and doc doesn't fit, open a new
    bin; place the doc at the bin's current offset. A doc longer than
    ``max_tokens`` occupies a bin alone (callers chunk first via
    ``chunk_docs`` if truncation isn't acceptable). Bin ids are made
    globally unique as grp * 2^40 + local_bin.

    One Arrow batch per group carries only (doc_id, len) — the packing
    pass is O(group size) numpy, and groups pack in parallel. Output:
    (doc_id, grp, bin_id, off, n_tokens).
    """
    w = f"size(regexp_extract_all(lower(text), '{WORD_RE}', 0))"
    key = f"concat('{salt}', cast(doc_id as string))"
    g = f"cast({_h60(key)} % {n_groups} as int)"
    src = docs.select(
        "doc_id", F.expr(g).alias("grp"), F.expr(w).alias("n_tokens")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        lens = pdf["n_tokens"].to_numpy()
        bins = []
        offs = []
        cur_bin, used = 0, 0
        for ln in lens:
            if used > 0 and used + ln > max_tokens:
                cur_bin += 1
                used = 0
            bins.append(cur_bin)
            offs.append(used)
            used += int(ln)
        grp = int(pdf["grp"].iloc[0]) if len(pdf) else 0
        pdf["bin_id"] = [grp * (1 << 40) + b for b in bins]
        pdf["off"] = offs
        return pdf[["doc_id", "grp", "bin_id", "off", "n_tokens"]]

    return src.groupBy("grp").applyInPandas(pack, schema=PACK_SCHEMA)


# ---------------------------------------------------------------- PII
# detection/redaction patterns — written for identical semantics under
# Java regex (Spark), RE2 (DuckDB), and Python re: character classes +
# bounded quantifiers + \b only, no lookaround, no backreferences
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\+\d{1,3}[ \-]\d{2,4}[ \-]\d{3,4}[ \-]\d{3,4}\b",
}


def pii_scrub(docs: DataFrame, token: str = "[PII]") -> DataFrame:
    """PII detection + redaction — the scrub stage every training-data
    pipeline runs before materialization (emails, IPv4s, SSN-shaped
    ids, international phone numbers).

    Returns (doc_id, clean_text, n_email, n_ipv4, n_ssn, n_phone):
    counts are per-pattern matches on the ORIGINAL text (audit
    metrics), ``clean_text`` applies the replacements in the fixed
    dictionary order above (email first, so an address is one [PII],
    not an [PII]-with-embedded-ipv4).

    Scale shape: map-only, pure JVM (``regexp_extract_all`` /
    ``regexp_replace`` in WholeStageCodegen) — one scan, zero
    exchanges, composes with any upstream filter pushdown. The pattern
    set is the operator's contract surface: patterns are written to
    evaluate identically under Java regex, RE2, and Python re (the
    DuckDB oracle runs the same scrub), so extending the dictionary
    keeps the oracle meaningful.
    """
    out = docs.select("doc_id", "text")
    # F.regexp_extract_all takes the pattern as a literal column — no
    # SQL string literal, so the backslashes survive un-mangled
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(pat), F.lit(0)))
        .cast("long")
        .alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]
    clean = F.col("text")
    for pat in PII_PATTERNS.values():
        clean = F.regexp_replace(clean, pat, token)
    return out.select(
        "doc_id", clean.alias("clean_text"), *counts
    )


# policy-screen pattern dictionary: license / provenance / generated-
# code markers a source-code training pipeline screens for before
# materialization. Written (like PII_PATTERNS) in the Java-regex /
# RE2 / Python-re common subset so the DuckDB oracle replays the exact
# same patterns; extend per policy, the machinery is pattern-agnostic.
POLICY_PATTERNS: dict[str, str] = {
    # SPDX machine-readable license tag (the id itself is captured by
    # policy_flags' spdx extraction below)
    "spdx": r"SPDX-License-Identifier:\s*[A-Za-z0-9.+-]+",
    # permissive-license heads (MIT/BSD/Apache wording)
    "permissive": r"(?i)\b(mit license|bsd [23]-clause|apache license)\b",
    # copyleft heads (GPL-family wording)
    "copyleft": r"(?i)\b(gnu (lesser |affero )?general public license|gpl-?[23])\b",
    # generated-file markers (protoc/thrift/swagger/yacc style)
    "generated": r"(?i)\b(do not edit|auto-?generated|generated by)\b",
}


def policy_flags(
    docs: DataFrame, patterns: dict[str, str] | None = None
) -> DataFrame:
    """License / provenance / generated-code screening — the policy
    stage a source-code pretraining pipeline runs before
    materialization (keep permissive, quarantine copyleft, drop
    generated files): one boolean flag column per pattern plus the
    extracted SPDX identifier when the ``spdx`` pattern is present
    (empty string otherwise — the flat NULL-free encoding every other
    curation stage uses).

    Returns (doc_id, f_<name>... , spdx_id, n_flags). ``patterns``
    overrides/extends ``POLICY_PATTERNS`` (a corpus with house markers
    adds them without touching the operator).

    Scale shape: map-only, pure JVM regex in WholeStageCodegen — one
    scan, zero exchanges, same posture as ``pii_scrub``; downstream
    filters on the flag columns compose with scan-level pushdown when
    the flags are materialized as a screened sibling table."""
    pats = dict(POLICY_PATTERNS)
    if patterns:
        pats.update(patterns)
    flags = [
        (F.size(F.regexp_extract_all("text", F.lit(p), F.lit(0))) > 0)
        .alias(f"f_{name}")
        for name, p in pats.items()
    ]
    out = docs.select("doc_id", "text").select("doc_id", *flags,
        F.regexp_extract(
            "text", r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)", 1
        ).alias("spdx_id"),
    )
    n = None
    for name in pats:
        c = F.col(f"f_{name}").cast("int")
        n = c if n is None else (n + c)
    return out.withColumn("n_flags", n.cast("long"))


def line_dedup(
    docs: DataFrame,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line-level boilerplate removal (the CCNet / RefinedWeb /
    MassiveText line-dedup stage): a non-blank line occurring in
    >= ``min_docs`` DISTINCT documents is boilerplate (navigation
    chrome, license banners, templated headers) and is stripped from
    EVERY document; blank lines and unique lines survive in their
    original order. Output per doc: ``clean_text`` (surviving lines
    re-joined with newlines), ``n_lines``, ``n_removed``,
    ``removed_chars`` — the audit columns a curation pipeline logs.

    Scale shape: one corpus pass explodes lines with their positions;
    the global frequency shuffle is keyed by the line's xxhash64
    (8 bytes/line — line text never rides the frequency shuffle; the
    hash is internal only — the oracle groups by the raw line — and
    ~2x cheaper per row than the previous md5-derived key);
    ``countDistinct(doc_id)`` is the standard two-phase expand; the
    reassembly is one doc_id-keyed aggregation whose per-doc state is
    the doc's own line list (bounded by doc size — the same bound as
    any per-doc kernel). Nothing corpus-sized reaches the driver."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias("pos", "line"),
    )
    keyed = lines.withColumn("h", F.xxhash64("line"))
    boiler = (
        keyed.filter(F.length(F.trim("line")) > 0)
        .groupBy("h")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .filter(F.col("ndocs") >= min_docs)
        .select("h")
    )
    flagged = keyed.join(
        boiler.withColumn("is_boiler", F.lit(True)), "h", "left"
    ).withColumn(
        "drop",
        F.col("is_boiler").isNotNull() & (F.length(F.trim("line")) > 0),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("drop").cast("long")).alias("n_removed"),
            F.sum(
                F.when(F.col("drop"), F.length("line")).otherwise(F.lit(0))
            ).alias("removed_chars"),
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list(case when not drop "
                    "then struct(pos, line) end)), x -> x.line)"
                ),
            ).alias("clean_text"),
        )
        .select(
            "doc_id", "clean_text", "n_lines", "n_removed", "removed_chars"
        )
    )
