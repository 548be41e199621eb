"""Query model + minimal parser.

A tiny query-AST in the spirit of the reference's query algebra
(lucene/core/src/java/org/apache/lucene/search/Query.java,
BooleanQuery.java :: MUST/SHOULD/MUST_NOT clauses,
PhraseQuery.java) with Solr's `lucene` QParser default-OR behavior
(solr/core/src/java/org/apache/solr/search/LuceneQParserPlugin.java):

  term            → SHOULD TermQuery
  "a b c"         → SHOULD PhraseQuery
  +term / +"..."  → MUST
  -term / -"..."  → MUST_NOT

Query text is run through the SAME analysis chain as documents; terms that
analyze away (stopwords) drop their clause, mirroring query-time analysis.
A query with no surviving positive clause matches nothing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..analysis import tokenize

_CLAUSE_RE = re.compile(r'([+-]?)(?:"([^"]*)"|(\S+))')


@dataclass
class QueryNode:
    kind: str  # "term" | "phrase" | "bool"
    terms: list[str] = field(default_factory=list)
    clauses: list[tuple[str, "QueryNode"]] = field(default_factory=list)  # (occur, child)

    def all_terms(self) -> list[str]:
        if self.kind in ("term", "phrase"):
            return list(self.terms)
        out: list[str] = []
        for _, c in self.clauses:
            out.extend(c.all_terms())
        return out


def parse_query(query: str) -> QueryNode | None:
    """Parse the query string; returns None if nothing survives analysis."""
    clauses: list[tuple[str, QueryNode]] = []
    for m in _CLAUSE_RE.finditer(query):
        sign, phrase, word = m.group(1), m.group(2), m.group(3)
        occur = {"+": "MUST", "-": "MUST_NOT", "": "SHOULD"}[sign]
        raw = phrase if phrase is not None else word
        toks = [t for t, _ in tokenize(raw)]
        if not toks:
            continue  # analyzed away (stopword / punctuation)
        if phrase is not None and len(toks) > 1:
            clauses.append((occur, QueryNode("phrase", terms=toks)))
        elif len(toks) == 1:
            clauses.append((occur, QueryNode("term", terms=[toks[0]])))
        else:
            # unquoted token that splits into several terms: nested OR
            sub = QueryNode("bool", clauses=[("SHOULD", QueryNode("term", terms=[t])) for t in toks])
            clauses.append((occur, sub))
    if not clauses:
        return None
    if not any(occ in ("MUST", "SHOULD") for occ, _ in clauses):
        return None  # only negations: matches nothing
    if len(clauses) == 1 and clauses[0][0] == "SHOULD":
        return clauses[0][1]
    return QueryNode("bool", clauses=clauses)
