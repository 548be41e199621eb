"""Token-graph filters: SynonymGraphFilter, WordDelimiterGraphFilter,
FlattenGraph.

Reference anchors (SURVEY.md §2.2):
- synonym/SynonymGraphFilter.java — multi-word synonym matching emits a
  token GRAPH: side paths stack over the matched span via posLength.
- miscellaneous/WordDelimiterGraphFilter.java — split parts occupy
  consecutive positions; catenated/original tokens span all parts via
  posLength.
- core/FlattenGraphFilter.java — squashes a graph into the flat
  (term, position) stream the indexer stores.  Indexing a graph is LOSSY
  in Lucene too (posLength is not indexed); this module reproduces the
  flattened RESULT for the supported cases, so phrase queries behave like
  Lucene's flattened streams: a single-token synonym spanning "wi fi"
  matches term queries, and a multi-token synonym path occupies
  consecutive positions starting at the match (which may collide with
  following original positions — the documented FlattenGraph artifact).

A graph token is (term, position, posLength); `to_graph`/`flatten_graph`
convert from/to the plain (term, position) chain of `analysis.extras`.
"""

from __future__ import annotations

from collections.abc import Callable

Token = tuple[str, int]
GToken = tuple[str, int, int]  # (term, position, posLength)
GraphFilter = Callable[[list[GToken]], list[GToken]]


def to_graph(tokens: list[Token]) -> list[GToken]:
    return [(t, p, 1) for t, p in tokens]


def flatten_graph(gtokens: list[GToken]) -> list[Token]:
    """FlattenGraph: drop posLength, order by (position, emission order) —
    stacked side-path tokens keep their start position."""
    return [(t, p) for t, p, _ in sorted(gtokens, key=lambda g: g[1])]


def synonym_graph_filter(
    rules: dict[tuple[str, ...], list[tuple[str, ...]]],
    keep_original: bool = True,
) -> GraphFilter:
    """Multi-word synonym graph filter.

    `rules` maps an input phrase (tuple of terms over CONSECUTIVE
    positions) to one or more output phrases.  Matching is greedy
    longest-match over the primary path (the first token at each
    position), as SynonymMap's FST matcher resolves overlaps.

    Emission per match over span [p, p+m):
    - single-token output  → (out, p, m): the token spans the whole match,
      so a phrase crossing it stays aligned;
    - multi-token output   → tokens at consecutive positions p, p+1, …;
      the last token's posLength stretches to the span end when the
      output is shorter than the match (flattened-graph alignment).
    """
    max_len = max((len(k) for k in rules), default=0)

    def f(gtokens: list[GToken]) -> list[GToken]:
        if not gtokens or not rules:
            return list(gtokens)
        primary: dict[int, str] = {}
        for t, p, pl in gtokens:
            if pl == 1 and p not in primary:
                primary[p] = t
        out: list[GToken] = []
        matched_spans: list[tuple[int, int]] = []
        positions = sorted(primary)
        for p in positions:
            for m in range(max_len, 0, -1):  # greedy longest match at p
                phrase = tuple(primary.get(p + i) for i in range(m))
                if None in phrase:
                    continue
                outs = rules.get(phrase)
                if outs is None:
                    continue
                if any(s <= p < e for s, e in matched_spans):
                    break  # inside an earlier (longer) match — FST greed
                matched_spans.append((p, p + m))
                for out_phrase in outs:
                    n = len(out_phrase)
                    if n == 1:
                        out.append((out_phrase[0], p, m))
                    else:
                        for i, ot in enumerate(out_phrase):
                            last = i == n - 1
                            pl = max(1, (p + m) - (p + i)) if last else 1
                            out.append((ot, p + i, pl))
                break
        if keep_original:
            out.extend(gtokens)
        else:
            out.extend(
                (t, p, pl)
                for t, p, pl in gtokens
                if not any(s <= p < e for s, e in matched_spans)
            )
        out.sort(key=lambda g: (g[1], -g[2]))
        return out

    return f


def word_delimiter_graph_filter(
    generate_parts: bool = True,
    catenate_all: bool = False,
    preserve_original: bool = False,
) -> GraphFilter:
    """WordDelimiterGraphFilter: split on letter↔digit transitions, case
    changes and intra-word delimiters; parts occupy CONSECUTIVE positions
    (each with posLength 1) while catenated/original tokens span all parts
    (posLength = part count) — the graph shape, unlike the non-graph
    `extras.word_delimiter_filter` where parts stack at one position."""
    import re

    part_re = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+")

    def f(gtokens: list[GToken]) -> list[GToken]:
        out: list[GToken] = []
        for term, pos, pl in gtokens:
            parts = part_re.findall(term)
            if len(parts) <= 1:
                if not parts or parts[0] == term:
                    out.append((term, pos, pl))
                else:
                    if preserve_original:
                        out.append((term, pos, pl))
                    if generate_parts or not preserve_original:
                        out.append((parts[0], pos, pl))
                continue
            n = len(parts)
            if preserve_original:
                out.append((term, pos, n))
            if catenate_all:
                out.append(("".join(parts), pos, n))
            if generate_parts:
                out.extend((p, pos + i, 1) for i, p in enumerate(parts))
        out.sort(key=lambda g: (g[1], -g[2]))
        return out

    return f


def graph_chain(*filters: GraphFilter) -> GraphFilter:
    def f(g: list[GToken]) -> list[GToken]:
        for flt in filters:
            g = flt(g)
        return g

    return f


def as_token_filter(gf: GraphFilter) -> Callable[[list[Token]], list[Token]]:
    """Adapt a graph filter to the flat (term, position) chain of
    `analysis.extras` / the index build: to_graph → filter → flatten."""
    return lambda tokens: flatten_graph(gf(to_graph(tokens)))


def check_graph_invariants(gtokens: list[GToken]) -> None:
    """BaseTokenStreamTestCase-style invariants: non-decreasing positions,
    posLength ≥ 1, non-empty terms.  Raises AssertionError on violation."""
    last = -1
    for t, p, pl in gtokens:
        assert t, "empty term"
        assert p >= 0, f"negative position {p}"
        assert pl >= 1, f"posLength < 1 on {t!r}"
        assert p >= last, f"position went backwards at {t!r}"
        last = p
