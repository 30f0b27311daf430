"""Query-string parser (qparse.py): tree shapes, precedence, the
MUST_NOT lifting rule, and loud errors. Engine execution of parsed
trees is covered end-to-end by the qs_topk contract entry (same lanes
as bool_tree/topk_filtered — the parser only builds the AST)."""

import pytest

from yase_spark.qparse import parse_query_string, parse_topk
from yase_spark.query import And, Not, Or, Phrase, Term, TopK


def P(s, **kw):
    return parse_query_string(s, **kw)


def test_single_term_and_phrase():
    assert P("getPage") == Term("getPage")
    assert P('"json get page"') == Phrase("json get page", slop=0)
    assert P('"json get page"~2') == Phrase("json get page", slop=2)


def test_default_operator_or_and():
    assert P("a b c") == Or((Term("a"), Term("b"), Term("c")))
    assert P("a b", default_operator="and") == And((Term("a"), Term("b")))


def test_keyword_precedence_or_loosest():
    # AND binds tighter than OR; adjacency tighter than AND
    assert P("a AND b OR c") == Or((And((Term("a"), Term("b"))), Term("c")))
    assert P("a b AND c") == And((Or((Term("a"), Term("b"))), Term("c")))
    assert P("(a OR b) AND c") == And((Or((Term("a"), Term("b"))), Term("c")))


def test_flattening_and_singleton_collapse():
    assert P("a OR b OR c") == Or((Term("a"), Term("b"), Term("c")))
    assert P("a AND b AND c") == And((Term("a"), Term("b"), Term("c")))
    assert P("((a))") == Term("a")
    # inner And spliced into outer And keeps Not a direct child
    assert P("a AND b NOT c") == And((Term("a"), Term("b"), Not(Term("c"))))


def test_negatives_lift_to_enclosing_and():
    assert P("a -b") == And((Term("a"), Not(Term("b"))))
    assert P("a b -c") == And((Or((Term("a"), Term("b"))), Not(Term("c"))))
    assert P("a NOT b", default_operator="and") == And((Term("a"), Not(Term("b"))))
    assert P("NOT NOT a b") == Or((Term("a"), Term("b")))  # double negation
    assert P('a -"b c"') == And((Term("a"), Not(Phrase("b c"))))


def test_not_of_group():
    got = P("a NOT (b OR c)")
    assert got == And((Term("a"), Not(Or((Term("b"), Term("c"))))))


def test_hyphen_inside_word_is_term_text():
    assert P("foo-bar") == Term("foo-bar")


def test_parse_topk_wraps():
    assert parse_topk("a b", k=5) == TopK(Or((Term("a"), Term("b"))), k=5)


@pytest.mark.parametrize(
    "bad,msg",
    [
        ("", "empty query string"),
        ("   ", "empty query string"),
        ('"unterminated', "unterminated phrase"),
        ("(a OR b", "expected '\\)'"),
        ("a OR", "term, phrase, or '\\('"),
        ("AND a", "term, phrase, or '\\('"),
        ("-a", "only negative clauses"),
        ("-a -b", "only negative clauses"),
        ("a OR -b", "operand of OR must be positive"),
        ("NOT a OR b", "operand of OR must be positive"),
        ("a -", "dangling '-'"),
        ('""', "empty phrase"),
        ("a ) b", "unexpected token"),
    ],
)
def test_errors_are_loud_with_positions(bad, msg):
    with pytest.raises(ValueError, match=msg):
        P(bad)


def test_default_operator_validated():
    with pytest.raises(ValueError, match="default_operator"):
        P("a", default_operator="xor")
