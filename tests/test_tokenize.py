"""Tokenizer spec + analyzer-parity tests (SURVEY.md §2.3, §5.4)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from yase_spark.tokenize import analyze_query, split_parts, tokenize_series, tokenize_text


def test_camel_snake_spec():
    assert tokenize_text("getUserName", ngrams=False) == ["get", "user", "name", "getusername"]
    assert tokenize_text("get_user_name", ngrams=False) == [
        "get",
        "user",
        "name",
        "get_user_name",
    ]
    assert tokenize_text("getUserName")[-2:] == ["get_user", "user_name"]
    assert tokenize_text("plain") == ["plain"]  # single-part: not doubled
    assert split_parts("XMLHttpRequest") == ["xml", "http", "request"]
    assert split_parts("parseHTML5Doc") == ["parse", "html5", "doc"]


def test_ngram_bridges_camel_and_snake():
    camel = set(tokenize_text("getUserName"))
    snake = set(tokenize_text("get_user_name"))
    assert {"get_user", "user_name"} <= camel & snake


def test_analyzer_dedup_order():
    assert analyze_query("user get user name get") == ["user", "get", "name"]
    assert analyze_query("") == []


@given(
    st.lists(
        st.text(
            alphabet="abcXYZ_09 .(){};\n\t",
            max_size=40,
        ),
        max_size=8,
    )
)
@settings(max_examples=150, deadline=None)
def test_series_matches_reference(chunks):
    texts = [" ".join(chunks), "getUser fooBar_baz", ""]
    for ng in (True, False):
        ref = [sorted(tokenize_text(t, ngrams=ng)) for t in texts]
        got = [sorted(x) for x in tokenize_series(pd.Series(texts), ngrams=ng)]
        assert got == ref
