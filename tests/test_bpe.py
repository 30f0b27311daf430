"""BPE trainer/encoder gates — yase_spark.bpe.

The reference is a from-scratch pure-Python BPE (Sennrich et al. 2016
semantics with the engine's documented tie-break: count DESC, left ASC,
right ASC). Gates: the Spark merge sequence equals the reference
EXACTLY (order included) on both a hand corpus and a synth slice; the
encoder's token counts equal a reference re-encode; token sequences
reconstruct their word; early-stop honors min_pair_count.
"""

import re

import pytest

from yase_spark.bpe import EOW, bpe_encode, encode_vocab, learn_bpe

SPLIT = "[^a-z0-9_]+"


def _ref_words(texts):
    counts = {}
    for t in texts:
        for w in re.split(SPLIT, t.lower()):
            if w:
                counts[w] = counts.get(w, 0) + 1
    return counts


def _apply(syms, left, right, merged):
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == left and x == right:
            out[-1] = merged
        else:
            out.append(x)
    return out


def _ref_bpe(texts, n_merges, min_pair=2):
    words = {
        w: (list(w) + [EOW], c) for w, c in _ref_words(texts).items()
    }
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = {}
        for syms, c in words.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        (left, right), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < min_pair:
            break
        merged = left + right
        merges.append((rank, left, right, merged))
        words = {
            w: (_apply(syms, left, right, merged), c)
            for w, (syms, c) in words.items()
        }
    return merges, words


def _ref_encode(word, merges):
    syms = list(word) + [EOW]
    for _rank, left, right, merged in merges:
        syms = _apply(syms, left, right, merged)
    return syms


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "low new lower newer",
    "west vest rest west",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS, start=1)), ["doc_id", "text"]
    )


def test_merge_sequence_matches_reference(docs):
    got = learn_bpe(docs, 16)
    want, _ = _ref_bpe(TEXTS, 16)
    assert got == want
    assert len(got) > 5  # the corpus genuinely supports merges


def test_merge_sequence_on_synth_corpus(spark, tiny_corpus):
    sl = tiny_corpus.limit(40).select("content").collect()
    docs = spark.createDataFrame(
        [(i, r["content"]) for i, r in enumerate(sl)], ["doc_id", "text"]
    )
    got = learn_bpe(docs, 12)
    want, _ = _ref_bpe([r["content"] for r in sl], 12)
    assert got == want


def test_encode_counts_match_reference(docs):
    merges = learn_bpe(docs, 16)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(docs, merges).collect()
    }
    for doc_id, text in enumerate(TEXTS, start=1):
        words = [w for w in re.split(SPLIT, text.lower()) if w]
        n_tok = sum(len(_ref_encode(w, merges)) for w in words)
        assert got[doc_id] == (len(words), n_tok)


def test_tokens_reconstruct_word(spark, docs):
    merges = learn_bpe(docs, 16)
    vocab = spark.createDataFrame(
        [("lowest",), ("newer",), ("zzz_unseen",)], ["word"]
    )
    for r in encode_vocab(vocab, merges).collect():
        assert "".join(r["tokens"]) == r["word"] + EOW
        assert r["n_tokens"] == len(r["tokens"])
        assert r["tokens"] == _ref_encode(r["word"], merges)


def test_min_pair_count_stops_early(docs):
    # every word unique => max pair weight is small; a huge floor
    # stops immediately
    assert learn_bpe(docs, 16, min_pair_count=10**6) == []


def test_rejects_nonpositive_merges(docs):
    with pytest.raises(ValueError):
        learn_bpe(docs, 0)
