"""Query model + parser.

A query-AST in the spirit of the reference's query algebra
(lucene/core/src/java/org/apache/lucene/search/Query.java) with Solr's
`lucene` QParser default-OR behavior:

  term             → SHOULD TermQuery
  "a b c"          → SHOULD PhraseQuery (PhraseQuery.java)
  +x / -x / #x     → MUST / MUST_NOT / FILTER clause
                     (BooleanClause.Occur incl. the unscored FILTER)
  field:value      → keyword term in the unified term space (StringField
                     pattern; role/tool fields) — value is lowercased, not
                     analyzed
  pre* / wi?d      → prefix / wildcard multi-term query (PrefixQuery.java,
                     WildcardQuery.java) — expanded against the sorted term
                     dictionary by `rewrite` (SCORING_BOOLEAN_REWRITE,
                     MultiTermQuery.java), capped at MAX_EXPANSIONS clauses
  term~ / term~1   → fuzzy query, Levenshtein ≤ n (default 2, FuzzyQuery.java)
  /re/ / field:/re/ → regexp query anchored over the whole term
                     (RegexpQuery.java; dialect = Python `re`)

Analyzed query text runs through the SAME chain as documents; terms that
analyze away (stopwords) drop their clause.  A query with no surviving
positive clause matches nothing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis import tokenize

_CLAUSE_RE = re.compile(r'([+\-#]?)(?:"([^"]*)"(?:~(\d+))?(?:\^(\d+\.?\d*))?|(\w+:\[[^\]]+\])|(\S+))')
_KEYWORD_RE = re.compile(r"^(\w+):(.+)$")
_RANGE_RE = re.compile(r"^(\w+):\[(\S+) TO (\S+)\]$")
_FUZZY_RE = re.compile(r"^(.+?)~(\d?)$")
_REGEXP_RE = re.compile(r"^(?:(\w+):)?/(.+)/$")
_BOOST_RE = re.compile(r"^(.*?)\^(\d+\.?\d*)$")

MAX_EXPANSIONS = 1024  # BooleanQuery.maxClauseCount spirit

_OCCUR = {"+": "MUST", "-": "MUST_NOT", "#": "FILTER", "": "SHOULD"}


@dataclass
class QueryNode:
    kind: str  # "term" | "phrase" | "bool" | "prefix" | "wildcard" | "fuzzy"
    #           | "dismax" | "term_set"
    terms: list[str] = field(default_factory=list)
    clauses: list[tuple[str, "QueryNode"]] = field(default_factory=list)  # (occur, child)
    pattern: str = ""
    max_edits: int = 2
    boost: float = 1.0  # BoostQuery: multiplies the node's score
    min_should_match: int = 0  # BooleanQuery.setMinimumNumberShouldMatch
    tiebreak: float = 0.0  # DisjunctionMaxQuery tieBreakerMultiplier
    slop: int = 0  # PhraseQuery slop: "a b"~N proximity window
    tree: object = None  # IntervalsNode for kind == "intervals"
    slots: list[list[str]] = field(default_factory=list)  # multi_phrase positions

    def all_terms(self) -> list[str]:
        if self.kind in ("term", "phrase", "term_set", "interval", "synonym"):
            return list(self.terms)
        if self.kind == "multi_phrase":
            return [t for alts in self.slots for t in alts]
        if self.kind == "intervals":
            return self.tree.leaf_terms()
        out: list[str] = []
        for _, c in self.clauses:
            out.extend(c.all_terms())
        return out


def synonym_query(terms: list[str], boost: float = 1.0) -> QueryNode:
    """SynonymQuery (lucene/core/src/java/org/apache/lucene/search/
    SynonymQuery.java): terms scored as ONE pseudo-term — per doc the
    frequency is the SUM over members, and the combined TermStatistics
    carry docFreq = max(df_i), so idf reflects the most common member.
    This is the QueryBuilder output for same-position single-token
    synonyms (vs dismax, which scores members separately and takes max)."""
    return QueryNode("synonym", terms=list(terms), boost=boost)


def synonym_weight_key(terms: list[str]) -> str:
    """idfs-dict key for a synonym node's blended weight (computed on the
    driver from GLOBAL stats, read in the shard actors)."""
    return "\0syn:" + "\0".join(terms)


def multi_phrase(slots: list[list[str]], slop: int = 0, boost: float = 1.0) -> QueryNode:
    """MultiPhraseQuery (lucene/core/src/java/org/apache/lucene/search/
    MultiPhraseQuery.java): a phrase where each position admits ANY of
    several terms — the query QueryBuilder emits for analysis graphs
    (index- or query-time synonyms at one position).  freq counts matches
    with per-slot alternatives unioned; scoring uses the phrase shape
    with idf summed over every alternative (BM25Similarity combines all
    TermStatistics)."""
    return QueryNode("multi_phrase", slots=[list(a) for a in slots], slop=slop, boost=boost)


def dismax(children: list[QueryNode], tiebreak: float = 0.0, boost: float = 1.0) -> QueryNode:
    """DisjunctionMaxQuery: score = max(child) + tiebreak·Σ(other children)
    (lucene/core/src/java/org/apache/lucene/search/DisjunctionMaxQuery.java)."""
    return QueryNode("dismax", clauses=[("SHOULD", c) for c in children], tiebreak=tiebreak, boost=boost)


def interval(terms: list[str], max_width: int, ordered: bool = True, boost: float = 1.0) -> QueryNode:
    """Intervals-lite (lucene/queries/.../intervals/Intervals.java subset):
    docs where all terms occur within a `max_width`-position window —
    ordered (phrase-with-slop equivalence: slop = max_width − n) or
    unordered minimal-window containment.  Scored like a phrase with
    freq = number of matching windows."""
    return QueryNode(
        "interval", terms=list(terms), max_edits=max_width,  # max_edits reused as width
        min_should_match=1 if ordered else 0, boost=boost,
    )


def synonym_expand(
    user_query: str,
    rules: dict[tuple[str, ...], list[tuple[str, ...]]],
    tiebreak: float = 0.0,
) -> QueryNode | None:
    """Query-time synonym-graph expansion (lucene/core/src/java/org/apache/
    lucene/util/QueryBuilder.java :: analyzeGraphBoolean over a
    SynonymGraphFilter): each greedy-longest rule match over the analyzed
    query expands to the ORIGINAL path plus every synonym alternative.
    All-single-token alternative sets become a blended SynonymQuery
    (QueryBuilder's actual output for same-position synonyms); sets with
    a multi-token path become a DisjunctionMax of phrase/term paths — so
    "wi fi" finds docs indexed with either surface form."""
    toks = [t for t, _ in tokenize(user_query)]
    if not toks:
        return None
    max_len = max((len(k) for k in rules), default=0)

    def path_node(terms: tuple[str, ...]) -> QueryNode:
        if len(terms) == 1:
            return QueryNode("term", terms=[terms[0]])
        return QueryNode("phrase", terms=list(terms))

    clauses: list[tuple[str, QueryNode]] = []
    i = 0
    while i < len(toks):
        matched = None
        for m in range(min(max_len, len(toks) - i), 0, -1):
            phrase = tuple(toks[i : i + m])
            if phrase in rules:
                matched = phrase
                break
        if matched is None:
            clauses.append(("SHOULD", QueryNode("term", terms=[toks[i]])))
            i += 1
            continue
        paths = [matched] + list(rules[matched])
        if all(len(p) == 1 for p in paths):
            members = list(dict.fromkeys(p[0] for p in paths))
            clauses.append(("SHOULD", synonym_query(members)))
        else:
            alts = [path_node(p) for p in paths]
            clauses.append(("SHOULD", dismax(alts, tiebreak=tiebreak)))
        i += len(matched)
    if len(clauses) == 1:
        return clauses[0][1]
    return QueryNode("bool", clauses=clauses)


def intervals_query(tree, boost: float = 1.0) -> QueryNode:
    """Full intervals-algebra query (lucene/queries/.../intervals/
    IntervalQuery.java): matches docs where `tree` (an
    `search.intervals.IntervalsNode`) yields ≥1 interval; freq = interval
    count, scored like a phrase over the tree's leaf terms."""
    return QueryNode("intervals", tree=tree, boost=boost)


def term_set(terms: list[str], boost: float = 1.0) -> QueryNode:
    """TermInSetQuery: constant-score membership in a large term OR
    (lucene/core/src/java/org/apache/lucene/search/TermInSetQuery.java)."""
    return QueryNode("term_set", terms=sorted(set(terms)), boost=boost)


def edismax(
    user_query: str,
    field_boosts: dict[str | None, float],
    tiebreak: float = 0.0,
    min_should_match: int = 0,
    pf: dict[str | None, float] | None = None,
    ps: int = 0,
    pf2: dict[str | None, float] | None = None,
    pf3: dict[str | None, float] | None = None,
) -> QueryNode | None:
    """ExtendedDisMax-style rewriter (solr/core/src/java/org/apache/solr/
    search/ExtendedDismaxQParser.java): each analyzed user term becomes a
    DisjunctionMax across the queried fields (None = the analyzed text
    field; other keys are keyword fields, matched as `field:term`), the
    per-term dismaxes combine as SHOULD clauses with minShouldMatch.

    `pf` / `ps` are the phrase-boost params: with ≥2 surviving tokens the
    WHOLE query is added per pf-field as an OPTIONAL phrase clause (slop
    `ps`, boosted), layered OUTSIDE the mm group — Solr's shape: main
    query mandatory, phrase boosts additive when they match."""
    toks = [t for t, _ in tokenize(user_query)]
    if not toks:
        return None
    clauses = []
    for t in toks:
        alts = []
        for fld, boost in field_boosts.items():
            term = t if fld is None else f"{fld}:{t}"
            alts.append(QueryNode("term", terms=[term], boost=boost))
        clauses.append(("SHOULD", dismax(alts, tiebreak=tiebreak)))
    main = QueryNode("bool", clauses=clauses, min_should_match=min_should_match)
    outer: list[tuple[str, QueryNode]] = [("MUST", main)]

    def add_layers(fields: dict[str | None, float] | None, spans: list[list[str]]) -> None:
        if not fields or not spans:
            return
        for fld, boost in fields.items():
            for span in spans:
                terms = span if fld is None else [f"{fld}:{t}" for t in span]
                outer.append(("SHOULD", QueryNode("phrase", terms=terms, boost=boost, slop=ps)))

    # pf spans the whole query; pf2/pf3 every consecutive bigram/trigram
    add_layers(pf, [toks] if len(toks) >= 2 else [])
    add_layers(pf2, [toks[i : i + 2] for i in range(len(toks) - 1)])
    add_layers(pf3, [toks[i : i + 3] for i in range(len(toks) - 2)])
    if len(outer) == 1:
        return main
    return QueryNode("bool", clauses=outer)


def _leaf(raw: str, is_phrase: bool, analyzer=None) -> QueryNode | None:
    analyzer = analyzer or tokenize
    if not is_phrase:
        if raw == "*:*":
            # MatchAllDocsQuery (lucene/core/src/java/org/apache/lucene/
            # search/MatchAllDocsQuery.java): every live doc, score 1
            return QueryNode("match_all")
        m = _RANGE_RE.match(raw)
        if m:
            # TermRangeQuery over a keyword field, inclusive bounds —
            # executed via the IndexOrDocValues cost choice (actor-side)
            return QueryNode(
                "term_range",
                pattern=m.group(1).lower(),
                terms=[m.group(2).lower(), m.group(3).lower()],
            )
        m = _REGEXP_RE.match(raw)
        if m:
            # RegexpQuery (lucene/core/src/java/org/apache/lucene/search/
            # RegexpQuery.java): /re/ anchored over the whole term; a field
            # prefix scopes it to that keyword namespace (field:/re/).
            # Dialect is the LUCENE RegExp automaton syntax (r4: util/
            # automaton/RegExp.java semantics — `\x` is a literal x, and
            # `~`/`&`/`<n-m>`/`@` are operators; see lucene_regexp.py), so
            # a query copied from a Solr app means the same thing here.
            # The body is NOT lowercased (a lowercased literal class could
            # silently change meaning); indexed terms are lowercase, so
            # write lowercase literals — same contract as Lucene, which
            # skips multi-term analysis.  The field prefix chars are all
            # literals in the dialect, so plain prepending is exact.
            fld, body = m.group(1), m.group(2)
            # prefix chars are literals in the dialect; the body is GROUPED
            # so a top-level `|`/`&` stays scoped to it, not the prefix
            pat = f"{fld.lower()}:({body})" if fld else body
            from .lucene_regexp import compile_regexp

            compile_regexp(pat)  # validate at parse time, like Lucene
            return QueryNode("regexp", pattern=pat)
        m = _KEYWORD_RE.match(raw)
        if m and "*" not in raw and "?" not in raw and not raw.endswith("~"):
            return QueryNode("term", terms=[raw.lower()])
        m = _FUZZY_RE.match(raw)
        if m:
            toks = [t for t, _ in analyzer(m.group(1))]
            if len(toks) == 1:
                edits = int(m.group(2)) if m.group(2) else 2
                return QueryNode("fuzzy", pattern=toks[0], max_edits=min(edits, 2))
        if "*" in raw or "?" in raw:
            pat = raw.lower()
            if re.fullmatch(r"[a-z0-9_]+\*", pat):
                return QueryNode("prefix", pattern=pat[:-1])
            return QueryNode("wildcard", pattern=pat)
    toks = [t for t, _ in analyzer(raw)]
    if not toks:
        return None
    if is_phrase and len(toks) > 1:
        return QueryNode("phrase", terms=toks)
    if len(toks) == 1:
        return QueryNode("term", terms=[toks[0]])
    return QueryNode("bool", clauses=[("SHOULD", QueryNode("term", terms=[t])) for t in toks])


def parse_query(query: str, analyzer=None) -> QueryNode | None:
    """Parse the query string; returns None if nothing survives analysis.

    `analyzer` overrides the standard chain for term/phrase/fuzzy leaves —
    queries against an index built with `tokenizer="icu"` must analyze
    with the SAME chain (QueryBuilder uses the field's analyzer)."""
    clauses: list[tuple[str, QueryNode]] = []
    for m in _CLAUSE_RE.finditer(query):
        sign, phrase, slop_s, phrase_boost, rng, word = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6),
        )
        boost = 1.0
        slop = int(slop_s) if slop_s else 0
        if phrase is not None:
            raw = phrase
            if phrase_boost:
                boost = float(phrase_boost)
        elif rng is not None:
            raw = rng  # bracket range (contains spaces — its own alternative)
        else:
            raw = word
            bm = _BOOST_RE.match(word)
            if bm and bm.group(1):
                raw, boost = bm.group(1), float(bm.group(2))
        node = _leaf(raw, phrase is not None, analyzer)
        if node is None:
            continue
        node.boost = node.boost * boost
        if node.kind == "phrase" and slop:
            node.slop = slop
        clauses.append((_OCCUR[sign], node))
    if not clauses:
        return None
    if not any(occ in ("MUST", "SHOULD") for occ, _ in clauses):
        # FILTER/MUST_NOT only: no scoring clause → matches nothing in the
        # `lucene` parser sense (we require at least one positive clause)
        if not any(occ == "FILTER" for occ, _ in clauses):
            return None
        # pure-filter query: legal (ConstantScoreQuery-ish, score 0)
    if len(clauses) == 1 and clauses[0][0] == "SHOULD":
        return clauses[0][1]
    return QueryNode("bool", clauses=clauses)


_CP_ELEM_RE = re.compile(r"\(([^)]*)\)(?:~(\d+))?|(\S+)")


def _cp_slot_nodes(raw: str, analyzer) -> list[QueryNode]:
    """One whitespace-separated element inside a complex phrase → slot
    node(s).  Wildcard/prefix/fuzzy elements are lowercased but NOT
    analyzed (Lucene skips analysis for multi-term queries); plain
    elements run through the analyzer and may yield several consecutive
    slots (or none, for stopwords)."""
    if "*" in raw or "?" in raw:
        pat = raw.lower()
        if re.fullmatch(r"[a-z0-9_]+\*", pat):
            return [QueryNode("prefix", pattern=pat[:-1])]
        return [QueryNode("wildcard", pattern=pat)]
    m = _FUZZY_RE.match(raw)
    if m:
        toks = [t for t, _ in analyzer(m.group(1))]
        if len(toks) == 1:
            edits = int(m.group(2)) if m.group(2) else 2
            return [QueryNode("fuzzy", pattern=toks[0], max_edits=min(edits, 2))]
        # fuzzy base analyzed to 0 (stopword: slot collapses) or >1 tokens
        # (fuzziness dropped, tokens become consecutive slots) — never
        # re-analyze WITH the ~N suffix (the digits would become a slot)
        return [QueryNode("term", terms=[t]) for t in toks]
    toks = [t for t, _ in analyzer(raw)]
    return [QueryNode("term", terms=[t]) for t in toks]


def complex_phrase(text: str, slop: int = 0, boost: float = 1.0, analyzer=None) -> QueryNode | None:
    """ComplexPhraseQueryParser phrase body (lucene/queryparser/src/java/
    org/apache/lucene/queryparser/complexPhrase/ComplexPhraseQueryParser
    .java; Solr `{!complexphrase}`): a quoted phrase whose elements may be
    wildcards (`ba*`, `wi?d`), fuzzy terms (`smyth~`, `smyth~1`) or
    parenthesized alternative groups (`(john jon)`).  Parses to a
    `complex_phrase` node whose slots rewrite against the term dictionary
    (shard-side in the distributed path) into a MultiPhraseQuery.

    Analysis contract: plain elements run the index analyzer (stopwords
    drop their slot — collapsing the position, the documented variant);
    multi-term elements are lowercased only."""
    analyzer = analyzer or tokenize
    slots: list[QueryNode] = []
    for m in _CP_ELEM_RE.finditer(text):
        group, word = m.group(1), m.group(3)
        if group is not None:
            if m.group(2) is not None:
                # per-group proximity isn't a ComplexPhrase feature either —
                # reject loudly rather than silently ignoring the suffix
                raise ValueError(f"per-group proximity (…)~{m.group(2)} is not supported")
            alts: list[QueryNode] = []
            for w in group.split():
                alts.extend(_cp_slot_nodes(w, analyzer))
            if not alts:
                continue  # all-stopword group: position collapses
            slots.append(alts[0] if len(alts) == 1 else QueryNode("bool", clauses=[("SHOULD", a) for a in alts]))
        else:
            slots.extend(_cp_slot_nodes(word, analyzer))
    if not slots:
        return None
    if len(slots) == 1:
        one = slots[0]
        one.boost = one.boost * boost
        return one  # single-position phrase degrades to its slot query
    if not any(multi_term_nodes(s) for s in slots):
        # no dictionary expansion needed → concrete MultiPhraseQuery now
        # (the distributed rewrite only visits trees with multi-term leaves)
        return QueryNode(
            "multi_phrase",
            slots=[list(dict.fromkeys(_term_leaves(s))) for s in slots],
            slop=slop,
            boost=boost,
        )
    return QueryNode("complex_phrase", clauses=[("SLOT", s) for s in slots], slop=slop, boost=boost)


def _wildcard_to_re(pattern: str) -> re.Pattern:
    return re.compile("".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in pattern) + "$")


def _levenshtein_leq(a: str, b: str, k: int) -> bool:
    """Banded edit distance ≤ k (the LevenshteinAutomata contract without
    the automaton machinery)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        best = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            best = min(best, cur[j])
        if best > k:
            return False
        prev = cur
    return prev[-1] <= k


def expand_multi_term(node: QueryNode, sorted_terms) -> list[str]:
    """Expand a prefix/wildcard/fuzzy node against a SORTED term dictionary
    (numpy object array or list).  Prefix uses binary search; wildcard and
    fuzzy scan (automaton intersection is the upgrade path; leading
    wildcards always scan, as in the reference)."""
    import numpy as np

    terms = sorted_terms
    if node.kind == "prefix":
        lo = int(np.searchsorted(terms, node.pattern))
        hi = int(np.searchsorted(terms, node.pattern + "￿"))
        out = [str(t) for t in terms[lo:hi]]
    elif node.kind == "wildcard":
        rx = _wildcard_to_re(node.pattern)
        out = [str(t) for t in terms if rx.match(str(t))]
    elif node.kind == "fuzzy":
        out = [str(t) for t in terms if _levenshtein_leq(node.pattern, str(t), node.max_edits)]
    elif node.kind == "regexp":
        from .lucene_regexp import compile_regexp

        rx = compile_regexp(node.pattern)  # Lucene RegExp dialect
        out = [str(t) for t in terms if rx.fullmatch(str(t))]
    else:
        raise ValueError(node.kind)
    return out[:MAX_EXPANSIONS]


def multi_term_nodes(node: QueryNode) -> list[QueryNode]:
    """All prefix/wildcard/fuzzy leaves of a query tree (the set a
    distributed rewrite must expand before scoring)."""
    if node.kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        return [node]
    if node.kind in ("bool", "dismax", "complex_phrase", "covering"):
        out: list[QueryNode] = []
        for _, c in node.clauses:
            out.extend(multi_term_nodes(c))
        return out
    return []


def node_key(node: QueryNode) -> tuple:
    """Identity of a multi-term leaf for batching expansions."""
    return (node.kind, node.pattern, node.max_edits)


def rewrite_with(node: QueryNode, expander) -> QueryNode | None:
    """Rewrite multi-term queries to scoring boolean ORs
    (MultiTermQuery.SCORING_BOOLEAN_REWRITE), preserving boosts.
    `expander(node) -> list[str]` supplies the dictionary matches — a
    driver-side array scan, or a shard-fan-out merge (the distributed
    TermsComponent shape)."""
    if node.kind in ("prefix", "wildcard", "fuzzy", "regexp"):
        expanded = expander(node)
        if not expanded:
            return QueryNode("bool", clauses=[], boost=node.boost)  # matches nothing
        if len(expanded) == 1:
            return QueryNode("term", terms=[expanded[0]], boost=node.boost)
        return QueryNode(
            "bool",
            clauses=[("SHOULD", QueryNode("term", terms=[t])) for t in expanded],
            boost=node.boost,
        )
    if node.kind == "complex_phrase":
        # ComplexPhraseQueryParser rewrite (lucene/queryparser/.../
        # complexPhrase/ComplexPhraseQueryParser.java): each slot's
        # embedded multi-term / group query expands against the term
        # dictionary, then the phrase becomes a MultiPhraseQuery with
        # per-slot alternatives.  Any slot that expands to nothing →
        # MatchNoDocsQuery (the span rewrite's empty-clause contract).
        slots: list[list[str]] = []
        for _, c in node.clauses:
            rc = rewrite_with(c, expander)
            alts = list(dict.fromkeys(_term_leaves(rc))) if rc is not None else []
            if not alts:
                return QueryNode("bool", clauses=[], boost=node.boost)  # matches nothing
            slots.append(alts)
        return QueryNode("multi_phrase", slots=slots, slop=node.slop, boost=node.boost)
    if node.kind in ("bool", "dismax", "covering"):
        new = [(occ, rewrite_with(c, expander)) for occ, c in node.clauses]
        return QueryNode(
            node.kind,
            clauses=[(o, c) for o, c in new if c is not None],
            pattern=node.pattern,  # covering: the min-match dv field
            boost=node.boost,
            min_should_match=node.min_should_match,
            tiebreak=node.tiebreak,
        )
    return node


def _term_leaves(node: QueryNode) -> list[str]:
    """Concrete term leaves of a rewritten slot subtree, in order."""
    if node.kind == "term":
        return [node.terms[0]]
    out: list[str] = []
    for _, c in node.clauses:
        out.extend(_term_leaves(c))
    return out


def rewrite(node: QueryNode, sorted_terms) -> QueryNode | None:
    """`rewrite_with` against a driver-held sorted term array (the
    single-node path and the brute-force oracle)."""
    return rewrite_with(node, lambda n: expand_multi_term(n, sorted_terms))
