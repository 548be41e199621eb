"""Surround query parser (lucene/queryparser/src/java/org/apache/lucene/
queryparser/surround/ — QueryParser.jj + query/*.java; Solr `{!surround}`).

Span-style proximity language: infix `a 3W b` / `a 5N b` (ordered /
unordered within distance), prefix `3W(a, b, c)` / `N(a, b)`, boolean
`AND` / `OR` / `NOT` (infix and prefix), `*`/`?` truncation on terms, and
`^n` boosts.  Operator words are reserved, case-insensitive; terms are
lowercased but NOT analyzed (SrndTermQuery semantics).

Compilation onto the engine's algebra:

- `AND`/`OR`/`NOT` outside a distance op → BooleanQuery clauses
  (MUST / SHOULD / MUST + MUST_NOT — NotQuery chains left).
- distance ops → the intervals algebra (`search/intervals.py`):
  `dW(c1..ck)` → `maxwidth(Σ width(ci) + d - 1, ordered(c1..ck))`,
  `dN(...)` → same over `unordered`.  `width(term | or)` = 1; a nested
  distance op contributes its own maxwidth bound (each nesting level
  keeps its own slack budget, the SpanNearQuery contract).  Default
  distance is 1 (adjacent).  This is the engine's documented minimal-
  intervals variant of span matching (see intervals.py header).
- `AND`/`NOT` are rejected inside a distance op ("not allowed as
  distance subquery" — the reference parser's contract); `OR`, terms and
  nested distance ops are allowed.
- truncated terms inside a distance op expand against the term
  dictionary through the caller-supplied expander (shard-side in
  `Searcher.search_surround`, driver-side in tests/oracles); outside,
  they stay prefix/wildcard QueryNodes for the normal distributed
  rewrite.  An expansion that matches nothing keeps the (unindexable)
  pattern as a dead interval term, so the distance op simply never
  matches — SpanMultiTermQueryWrapper's empty-rewrite behavior.

Scoring: distance ops score like phrases with match frequency = number
of intervals (see actor._score_intervals_tree); booleans score normally.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from .intervals import IntervalsNode, ior, iterm, maxwidth, ordered, unordered
from .query import QueryNode

_TOKEN_RE = re.compile(r"\(|\)|,|\^\d+(?:\.\d+)?|[^\s(),^]+")
_OP_RE = re.compile(r"^(?:and|or|not|(\d*)([wn]))$", re.IGNORECASE)


class SurroundParseError(ValueError):
    pass


@dataclass
class SrndNode:
    kind: str  # "term" | "or" | "and" | "not" | "dist"
    term: str = ""
    children: list["SrndNode"] = field(default_factory=list)
    distance: int = 1
    ordered: bool = True
    boost: float = 1.0


def _op_kind(tok: str) -> tuple[str, int] | None:
    """(kind, distance) when `tok` is a reserved operator word."""
    m = _OP_RE.match(tok)
    if not m:
        return None
    low = tok.lower()
    if low == "and":
        return ("and", 0)
    if low == "or":
        return ("or", 0)
    if low == "not":
        return ("not", 0)
    d = int(m.group(1)) if m.group(1) else 1
    if d < 1:
        raise SurroundParseError(f"distance must be >= 1: {tok!r}")
    return (("dist_w" if m.group(2).lower() == "w" else "dist_n"), d)


class _Parser:
    def __init__(self, text: str):
        self.toks = _TOKEN_RE.findall(text)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise SurroundParseError("unexpected end of query")
        t = self.toks[self.i]
        self.i += 1
        return t

    # infix precedence, loosest -> tightest: OR, AND, NOT, N, W
    def parse(self) -> SrndNode:
        n = self.or_q()
        if self.peek() is not None:
            raise SurroundParseError(f"trailing input at {self.peek()!r}")
        return n

    def _infix(self, sub, kinds: tuple[str, ...]) -> SrndNode:
        left = sub()
        while True:
            tok = self.peek()
            op = _op_kind(tok) if tok and tok not in ("(", ")", ",") and not tok.startswith("^") else None
            if op is None or op[0] not in kinds:
                return left
            self.next()
            right = sub()
            if op[0] in ("dist_w", "dist_n"):
                if left.kind == "dist" and left.distance == op[1] and left.ordered == (op[0] == "dist_w") and left.boost == 1.0:
                    left.children.append(right)  # a 3w b 3w c = one chain
                else:
                    left = SrndNode("dist", children=[left, right], distance=op[1], ordered=op[0] == "dist_w")
            elif op[0] == "not":
                if left.kind == "not" and left.boost == 1.0:
                    left.children.append(right)  # a NOT b NOT c chains left
                else:
                    left = SrndNode("not", children=[left, right])
            elif left.kind == op[0] and left.boost == 1.0:
                left.children.append(right)
            else:
                left = SrndNode(op[0], children=[left, right])

    def or_q(self) -> SrndNode:
        return self._infix(self.and_q, ("or",))

    def and_q(self) -> SrndNode:
        return self._infix(self.not_q, ("and",))

    def not_q(self) -> SrndNode:
        return self._infix(self.n_q, ("not",))

    def n_q(self) -> SrndNode:
        return self._infix(self.w_q, ("dist_n",))

    def w_q(self) -> SrndNode:
        return self._infix(self.primary, ("dist_w",))

    def primary(self) -> SrndNode:
        tok = self.next()
        if tok == "(":
            n = self.or_q()
            if self.next() != ")":
                raise SurroundParseError("expected )")
            return self._boost(n)
        op = _op_kind(tok)
        if op is not None and self.peek() == "(":
            self.next()
            children = [self.or_q()]
            while self.peek() == ",":
                self.next()
                children.append(self.or_q())
            if self.next() != ")":
                raise SurroundParseError("expected )")
            kind, d = op
            if kind == "not":
                if len(children) < 2:
                    raise SurroundParseError("NOT() needs >= 2 arguments")
                n = SrndNode("not", children=children)
            elif kind in ("and", "or"):
                if len(children) < 2:
                    raise SurroundParseError(f"{kind.upper()}() needs >= 2 arguments")
                n = SrndNode(kind, children=children)
            else:
                if len(children) < 2:
                    raise SurroundParseError("distance op needs >= 2 arguments")
                n = SrndNode("dist", children=children, distance=d, ordered=kind == "dist_w")
            return self._boost(n)
        if op is not None:
            raise SurroundParseError(f"operator {tok!r} needs arguments")
        if tok in (")", ",") or tok.startswith("^"):
            raise SurroundParseError(f"unexpected {tok!r}")
        return self._boost(SrndNode("term", term=tok.lower()))

    def _boost(self, n: SrndNode) -> SrndNode:
        tok = self.peek()
        if tok and tok.startswith("^"):
            self.next()
            n.boost = n.boost * float(tok[1:])
        return n


def parse_surround(text: str) -> SrndNode:
    return _Parser(text).parse()


def _truncation_node(term: str) -> QueryNode | None:
    """QueryNode for a truncated term, None for a plain term."""
    if "*" not in term and "?" not in term:
        return None
    if re.fullmatch(r"[a-z0-9_]+\*", term):
        return QueryNode("prefix", pattern=term[:-1])
    return QueryNode("wildcard", pattern=term)


def multi_term_leaves(ast: SrndNode, in_dist: bool = False) -> list[QueryNode]:
    """Truncated-term leaves INSIDE distance ops (the set the caller must
    expand before building interval trees; leaves outside distance ops go
    through the normal QueryNode rewrite)."""
    if ast.kind == "term":
        n = _truncation_node(ast.term)
        return [n] if (n is not None and in_dist) else []
    out: list[QueryNode] = []
    for c in ast.children:
        out.extend(multi_term_leaves(c, in_dist or ast.kind == "dist"))
    return out


def _to_intervals(ast: SrndNode, expander, root: bool = False) -> tuple[IntervalsNode, int]:
    """(interval tree, width bound) for a span-context subquery."""
    if ast.boost != 1.0 and not root:
        # the intervals algebra carries no per-leaf weights — reject a
        # nested boost loudly instead of silently dropping it (the
        # top-level distance op's own boost IS honored via surround_to_node)
        raise SurroundParseError("boosts inside distance subqueries are not supported")
    if ast.kind == "term":
        mt = _truncation_node(ast.term)
        if mt is None:
            return iterm(ast.term), 1
        terms = expander(mt)
        if not terms:
            return iterm(ast.term), 1  # dead leaf: pattern is unindexable
        return (iterm(terms[0]) if len(terms) == 1 else ior(*[iterm(t) for t in terms])), 1
    if ast.kind == "or":
        parts = [_to_intervals(c, expander) for c in ast.children]
        return ior(*[p[0] for p in parts]), max(p[1] for p in parts)
    if ast.kind == "dist":
        parts = [_to_intervals(c, expander) for c in ast.children]
        w = sum(p[1] for p in parts) + ast.distance - 1
        op = ordered if ast.ordered else unordered
        return maxwidth(w, op(*[p[0] for p in parts])), w
    raise SurroundParseError(f"{ast.kind.upper()} not allowed as distance subquery")


def surround_to_node(ast: SrndNode, expander) -> QueryNode:
    """Compile a parsed surround AST to an engine QueryNode.  `expander`
    maps a prefix/wildcard QueryNode to its dictionary matches (used only
    inside distance ops)."""
    if ast.kind == "term":
        mt = _truncation_node(ast.term)
        n = mt if mt is not None else QueryNode("term", terms=[ast.term])
        n.boost = ast.boost
        return n
    if ast.kind == "dist":
        tree, _ = _to_intervals(ast, expander, root=True)
        return QueryNode("intervals", tree=tree, boost=ast.boost)
    if ast.kind == "or":
        return QueryNode(
            "bool",
            clauses=[("SHOULD", surround_to_node(c, expander)) for c in ast.children],
            boost=ast.boost,
        )
    if ast.kind == "and":
        return QueryNode(
            "bool",
            clauses=[("MUST", surround_to_node(c, expander)) for c in ast.children],
            boost=ast.boost,
        )
    if ast.kind == "not":
        clauses = [("MUST", surround_to_node(ast.children[0], expander))]
        clauses += [("MUST_NOT", surround_to_node(c, expander)) for c in ast.children[1:]]
        return QueryNode("bool", clauses=clauses, boost=ast.boost)
    raise SurroundParseError(ast.kind)
