"""Query-string parser: the Lucene/ES ``query_string`` user surface
over the boolean AST (SURVEY.md §1.4 / §2.6 Q12) — users type strings,
not dataclass trees.

Syntax (a deliberately clean subset of Lucene's):

* bare terms — analyzer-applied downstream exactly like ``Term`` leaves
  (camelCase/snake_case splitting happens in the engine, not here)
* ``"quoted phrase"`` with optional ``~N`` proximity slop → ``Phrase``
* ``AND`` / ``OR`` / ``NOT`` keywords (uppercase, like Lucene)
* ``-term`` as a ``NOT`` shorthand (only at a clause start; a ``-``
  inside a word stays part of the term and is the analyzer's business)
* parentheses for grouping

Precedence, tightest first: ``NOT``/``-`` > adjacency (the implicit
``default_operator`` between side-by-side clauses) > ``AND`` > ``OR``.
This is a FIXED grammar — Lucene's own query_string precedence is
famously position-dependent; we document ours instead of reproducing
that. Negative clauses obey the engine's MUST_NOT rule (query.Not):
they attach to the nearest AND-level group, which must contain at least
one positive clause — ``a -b`` parses to ``And([a, Not(b)])``, and a
group with no positive clause is a parse error (a bare complement is
corpus-sized by construction; the engine rejects it too, the parser
just says it sooner and with a position). An operand of an explicit
``OR`` must be positive (``a OR -b`` has no single sane reading — ES
silently picks one; we refuse).

Pure driver-side string processing — no Spark, O(len(query)). The
output tree runs unchanged on every AST lane (``search``, ``search_df``,
``search_topk``, percolation)."""

from __future__ import annotations

import re

from .query import And, Not, Or, Phrase, Term, TopK

_SCANNER = re.compile(
    r"""\s+
      | (?P<lparen>\()
      | (?P<rparen>\))
      | "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | (?P<word>[^\s()"]+)
    """,
    re.X,
)


def _lex(s: str) -> list[tuple[str, object, int]]:
    """(kind, value, position) tokens. Kinds: lparen rparen phrase
    and or not minus term. A leading ``-`` on a word is split off as
    ``minus``; ``-`` elsewhere in the word is term text."""
    out: list[tuple[str, object, int]] = []
    i = 0
    while i < len(s):
        m = _SCANNER.match(s, i)
        if m is None:  # only an unterminated quote can fail the scanner
            raise ValueError(f'unterminated phrase quote at position {i}')
        if m.group("lparen"):
            out.append(("lparen", "(", i))
        elif m.group("rparen"):
            out.append(("rparen", ")", i))
        elif m.group("phrase") is not None:
            q = m.group("phrase")
            out.append(("phrase", (q, int(m.group("slop") or 0)), i))
        elif m.group("word"):
            w = m.group("word")
            if w in ("AND", "OR", "NOT"):
                out.append((w.lower(), w, i))
            elif w.startswith("-") and len(w) > 1:
                out.append(("minus", "-", i))
                out.append(("term", w[1:], i + 1))
            elif w == "-":
                # `-` directly before a quote or '(' negates that group
                if m.end() < len(s) and s[m.end()] in '("':
                    out.append(("minus", "-", i))
                else:
                    raise ValueError(f"dangling '-' at position {i}")
            else:
                out.append(("term", w, i))
        i = m.end()
    return out


def _splice(cls, kids: list) -> object:
    """Build ``cls(kids)`` with singleton collapse and same-class
    flattening (And/Or are associative; splicing an inner And's kids —
    including its Not children — into an outer And preserves the
    MUST_NOT-with-positive-sibling invariant because the outer group
    keeps every positive the inner one had)."""
    flat: list = []
    for kid in kids:
        if isinstance(kid, cls):
            flat.extend(kid.kids)
        else:
            flat.append(kid)
    return flat[0] if len(flat) == 1 else cls(flat)


class _Parser:
    def __init__(self, toks: list, default_operator: str):
        if default_operator not in ("or", "and"):
            raise ValueError("default_operator must be 'or' or 'and'")
        self.toks = toks
        self.i = 0
        self.default_and = default_operator == "and"

    def peek(self) -> str | None:
        return self.toks[self.i][0] if self.i < len(self.toks) else None

    def pos(self) -> object:
        return self.toks[self.i][2] if self.i < len(self.toks) else "end"

    # or_expr := and_expr (OR and_expr)*
    def or_expr(self):
        kids = [self.and_expr()]
        while self.peek() == "or":
            self.i += 1
            kids.append(self.and_expr())
        if len(kids) == 1:
            if isinstance(kids[0], Not):
                raise ValueError(
                    "a group of only negative clauses is a bare complement "
                    "(corpus-sized); add at least one positive clause"
                )
            return kids[0]
        for kid in kids:
            self._positive(kid, "an operand of OR")
        return _splice(Or, kids)

    # and_expr := adj (AND adj)*
    def and_expr(self):
        groups = [self.adj()]
        while self.peek() == "and":
            self.i += 1
            groups.append(self.adj())
        if len(groups) == 1:
            return groups[0]
        return self._combine(groups, and_level=True)

    # adj := clause+  (combined with the default operator)
    def adj(self):
        clauses = [self.clause()]
        while self.peek() in ("term", "phrase", "lparen", "not", "minus"):
            clauses.append(self.clause())
        if len(clauses) == 1:
            return clauses[0]
        return self._combine(clauses, and_level=self.default_and)

    # clause := (NOT | -) clause | primary   — NOT toggles the sign
    def clause(self):
        kind = self.peek()
        if kind in ("not", "minus"):
            self.i += 1
            inner = self.clause()
            return inner.kid if isinstance(inner, Not) else Not(inner)
        return self.primary()

    def primary(self):
        kind = self.peek()
        if kind == "term":
            node = Term(self.toks[self.i][1])
            self.i += 1
            return node
        if kind == "phrase":
            q, slop = self.toks[self.i][1]
            if not q.strip():
                raise ValueError(f"empty phrase at position {self.toks[self.i][2]}")
            self.i += 1
            return Phrase(q, slop=slop)
        if kind == "lparen":
            self.i += 1
            node = self.or_expr()
            if self.peek() != "rparen":
                raise ValueError(f"expected ')' at position {self.pos()}")
            self.i += 1
            return node
        raise ValueError(
            f"expected a term, phrase, or '(' at position {self.pos()}"
            + (f" (got {kind})" if kind else " (got end of query)")
        )

    def _combine(self, parts: list, and_level: bool):
        """Combine sibling clauses, lifting negatives to an enclosing
        ``And`` (the MUST_NOT rule): at an AND level every part is a
        direct child; at an OR level the positives form the ``Or`` and
        any negatives wrap it in ``And([or, Not(...), ...])`` — the ES
        bool-query reading of ``a b -c``."""
        pos = [p for p in parts if not isinstance(p, Not)]
        neg = [p for p in parts if isinstance(p, Not)]
        if not pos:
            raise ValueError(
                "a group of only negative clauses is a bare complement "
                "(corpus-sized); add at least one positive clause"
            )
        if and_level:
            return _splice(And, parts)
        core = _splice(Or, pos)
        return _splice(And, [core, *neg]) if neg else core

    def _positive(self, node, where: str):
        if isinstance(node, Not):
            raise ValueError(f"{where} must be positive (drop the NOT/-)")
        return node


def parse_query_string(s: str, default_operator: str = "or"):
    """Parse ``s`` into a boolean AST node (``Term``/``Phrase``/``And``/
    ``Or``/``Not`` composition). Raises ``ValueError`` with a position
    on malformed input. ``default_operator`` governs bare adjacency:
    ``"or"`` (the Lucene default — ``a b`` means ``a OR b``) or
    ``"and"``."""
    toks = _lex(s)
    if not toks:
        raise ValueError("empty query string")
    p = _Parser(toks, default_operator)
    node = p.or_expr()
    if p.i != len(toks):
        raise ValueError(f"unexpected token at position {p.pos()}")
    return node


def parse_topk(s: str, k: int = 10, default_operator: str = "or") -> TopK:
    """``parse_query_string`` wrapped as a ranked request — the string
    form of ``TopK(expr, k)`` for ``IndexReader.search_topk``."""
    return TopK(parse_query_string(s, default_operator), k=k)


def render_template(template: str, params: dict[str, object]) -> str:
    """ES SEARCH TEMPLATE (mustache core): substitute ``{{name}}``
    placeholders with the given params and return the query string to
    parse. STRICT by design — a missing param raises (ES renders
    mustache's empty string, which silently changes the query; a data
    pipeline wants the loud version), an unused param raises (catches
    caller typos), and a substituted VALUE may not contain braces
    (no re-expansion, no template injection through data)."""
    import re as _re

    names = set(_re.findall(r"\{\{\s*([A-Za-z0-9_]+)\s*\}\}", template))
    missing = names - params.keys()
    if missing:
        raise ValueError(f"template params missing: {sorted(missing)}")
    unused = params.keys() - names
    if unused:
        raise ValueError(f"template params unused: {sorted(unused)}")
    out = template
    for name in names:
        val = str(params[name])
        if "{" in val or "}" in val:
            raise ValueError(f"param {name!r} value may not contain braces")
        out = _re.sub(r"\{\{\s*" + name + r"\s*\}\}", val, out)
    return out
