"""Deterministic synthetic source-code corpus (SURVEY.md §2.1 S5, FIXTURES.md §A).

Generates the exact ``input_hint`` shape (BASELINE.json:15):
``(repo, path, commit, lang, content)``. All randomness is counter-based
splitmix64 hashing of ``(SEED, row_index, stream)`` — a row's content is a
pure function of its global index, so generation is identical whether done
driver-side (pandas, tests) or distributed (spark.range + mapInPandas) and
at any parallelism level (BASELINE.json:14 N vs 4N determinism).

Skew by design (BASELINE.json:6 "repo/language hot-key skew"): Zipf repo
sizes (a few repos own a large share of files), skewed language weights
(python-heavy), Zipf term frequencies over a ~5k identifier vocabulary so
document frequency spans rare -> ubiquitous.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .config import SEED

# ------------------------------------------------------------ hashing
_U64 = np.uint64


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 -> uint64."""
    z = x.astype(_U64) + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _h(idx: np.ndarray, stream: int, seed: int = SEED) -> np.ndarray:
    k = (stream * 1469598103934665603 + seed) % (1 << 64)
    return mix64(idx.astype(_U64) * _U64(0x100000001B3) + _U64(k))


def _uniform(idx: np.ndarray, stream: int) -> np.ndarray:
    return (_h(idx, stream) >> _U64(11)).astype(np.float64) / float(1 << 53)


# --------------------------------------------------------- vocabulary
_SYLLABLES = (
    "get set add read write parse load store fetch push pull merge split "
    "build index query token doc term score rank sort scan hash list map "
    "node tree heap block byte file path repo lang code text line char "
    "buf ptr ctx cfg env arg val key row col net http json xml sql db "
    "user name data item task job run exec eval test mock stub init close "
    "open flush sync lock free alloc copy move swap find count sum min max "
    "avg norm vec mat dim axis grad loss train infer batch shard part seg "
    "meta stat info warn error debug trace log event time date zone utc "
    "cache pool queue stack ring slot page frame heap gc ref weak strong"
).split()

_LANGS = np.array(["python", "java", "js", "go", "rust"])
_LANG_CUM = np.cumsum(np.array([0.40, 0.20, 0.18, 0.12, 0.10]))
_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "rust": "rs"}

VOCAB_SIZE = 5000


def _build_vocab() -> np.ndarray:
    """~5k deterministic identifiers mixing camelCase / snake_case / plain."""
    n_syl = len(_SYLLABLES)
    idx = np.arange(VOCAB_SIZE, dtype=np.uint64)
    a = _h(idx, 101) % _U64(n_syl)
    b = _h(idx, 102) % _U64(n_syl)
    c = _h(idx, 103) % _U64(n_syl)
    n_parts = 1 + (_h(idx, 104) % _U64(3)).astype(np.int64)  # 1..3
    style = (_h(idx, 105) % _U64(3)).astype(np.int64)  # 0 camel, 1 snake, 2 plain
    out = []
    for i in range(VOCAB_SIZE):
        parts = [_SYLLABLES[int(a[i])], _SYLLABLES[int(b[i])], _SYLLABLES[int(c[i])]][
            : int(n_parts[i])
        ]
        if len(parts) == 1 or style[i] == 2:
            out.append("".join(parts))
        elif style[i] == 1:
            out.append("_".join(parts))
        else:
            out.append(parts[0] + "".join(p.capitalize() for p in parts[1:]))
    # dedupe while keeping deterministic order and size (suffix collisions)
    seen: dict[str, int] = {}
    uniq = []
    for w in out:
        k = seen.get(w, 0)
        seen[w] = k + 1
        uniq.append(w if k == 0 else f"{w}{k}")
    return np.array(uniq, dtype=object)


VOCAB = _build_vocab()

# Zipf (s=1.07) rank CDF over the vocabulary: rank 0 is ubiquitous,
# the tail is rare -> document frequencies span the whole range.
_ZIPF_W = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), 1.07)
_ZIPF_CDF = np.cumsum(_ZIPF_W) / _ZIPF_W.sum()

N_REPOS = 200
_REPO_W = 1.0 / np.power(np.arange(1, N_REPOS + 1, dtype=np.float64), 1.2)
_REPO_CDF = np.cumsum(_REPO_W) / _REPO_W.sum()


def gen_batch(indices: np.ndarray) -> pd.DataFrame:
    """Corpus rows for the given global row indices (vectorized)."""
    idx = indices.astype(np.uint64)
    n = idx.size
    repo_rank = np.searchsorted(_REPO_CDF, _uniform(idx, 1), side="right")
    lang_i = np.searchsorted(_LANG_CUM, _uniform(idx, 2), side="right").clip(0, 4)
    lang = _LANGS[lang_i]
    n_tok = (40 + (_h(idx, 3) % _U64(560))).astype(np.int64)  # 40..599 tokens

    # token stream for all docs at once: position-indexed counter hashing
    starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
    total = int(n_tok.sum())
    doc_of_pos = np.repeat(np.arange(n), n_tok)
    pos_in_doc = np.arange(total) - starts[doc_of_pos]
    ctr = idx[doc_of_pos] * _U64(1_000_003) + pos_in_doc.astype(_U64)
    ranks = np.searchsorted(_ZIPF_CDF, (mix64(ctr + _U64(SEED * 7919)) >> _U64(11)).astype(np.float64) / float(1 << 53), side="right").clip(0, VOCAB_SIZE - 1)
    toks = VOCAB[ranks]

    contents = []
    for i in range(n):
        s, e = starts[i], starts[i] + n_tok[i]
        words = toks[s:e]
        # deterministic light punctuation: newline every 8 tokens
        lines = [" ".join(words[j : j + 8]) for j in range(0, len(words), 8)]
        contents.append("\n".join(lines))

    repo = np.array([f"org{r % 20}/repo{r}" for r in repo_rank], dtype=object)
    path = np.array(
        [
            f"src/m{int(h % 50)}/File{int(i)}.{_EXT[l]}"
            for h, i, l in zip(_h(idx, 5) % _U64(50), idx, lang)
        ],
        dtype=object,
    )
    commit = np.array([f"{int(h):016x}" for h in _h(idx, 6)], dtype=object)
    return pd.DataFrame(
        {
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": pd.Series(lang, dtype=object),
            "content": contents,
        }
    )


def gen_corpus_pdf(n_docs: int) -> pd.DataFrame:
    """Driver-side generation (tests / tiny scales)."""
    return gen_batch(np.arange(n_docs, dtype=np.uint64))


def corpus_df(spark, n_docs: int, partitions: int | None = None):
    """Distributed generation: spark.range + mapInPandas (S5)."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        [StructField(c, StringType()) for c in ["repo", "path", "commit", "lang", "content"]]
    )

    def gen(batches):
        for pdf in batches:
            yield gen_batch(pdf["id"].to_numpy(dtype=np.uint64))

    rng = spark.range(0, n_docs, numPartitions=partitions or max(2, n_docs // 2000))
    return rng.mapInPandas(gen, schema=schema)


# ------------------------------------------------------- query set (A2)
def reference_query_set() -> list[dict]:
    """Deterministic reference query set (FIXTURES.md §A2): 40 queries
    spanning rare/common single terms, AND/OR combos, camelCase and
    snake_case forms, n-gram-hitting and absent terms, tie-heavy terms."""
    v = VOCAB
    qs: list[dict] = []

    def add(kind: str, query: str, k: int = 10):
        qs.append(
            {"query_id": f"q{len(qs) + 1:03d}", "kind": kind, "query": query, "k": k}
        )

    common = [str(v[i]) for i in (0, 1, 2, 3, 5, 8)]
    mid = [str(v[i]) for i in (50, 120, 300, 700, 999)]
    rare = [str(v[i]) for i in (3000, 3500, 4000, 4500, 4999)]
    for t in common[:3]:
        add("topk", t)
    for t in mid[:3]:
        add("topk", t)
    for t in rare[:3]:
        add("topk", t)
    add("topk", f"{common[0]} {rare[0]}")
    add("topk", f"{common[1]} {mid[1]} {rare[1]}")
    add("topk", f"{common[2]} {common[3]} {mid[2]} {rare[2]}")
    add("topk", "getUserName")          # camelCase query form
    add("topk", "parse_http_json")      # snake_case query form
    add("topk", f"{mid[0]}_{mid[1]}")   # bigram-shaped query
    add("topk", "zzz_not_in_corpus")    # absent term -> empty
    add("topk", common[0], k=25)        # tie-heavy, larger k
    for a, b2 in zip(common[:5], mid[:5]):
        add("bool_and", f"{a} {b2}")
    for a, b2 in zip(mid[:5], rare[:5]):
        add("bool_and", f"{a} {b2}")
    add("bool_and", f"{rare[0]} zzz_not_in_corpus")
    for a, b2 in zip(common[:5], rare[:5]):
        add("bool_or", f"{a} {b2}")
    add("bool_or", "zzz_not_in_corpus qqq_also_absent")
    while len(qs) < 40:
        i = len(qs)
        add("topk", f"{v[(i * 97) % VOCAB_SIZE]} {v[(i * 211) % VOCAB_SIZE]}")
    return qs
