"""Solr local-params QParser dispatch (solr/core/src/java/org/apache/
solr/search/QParserPlugin.java + LocalParams syntax, `{!type k=v ...}body`).

`parse_local_params` splits a query string into (parser name, params,
body); `dispatch` routes to the Searcher method implementing that parser —
the engine's analog of the QParserPlugin registry:

    {!lucene}...            → Searcher.search           (default)
    {!complexphrase}"a b*"  → Searcher.search_complex_phrase
    {!surround}a 3w b       → Searcher.search_surround
    {!boost b=expr}query    → Searcher.search_boosted
    {!join from=f to=t score=m}subq        → Searcher.join_search
    {!graph from=f to=t maxDepth=N ...}q   → Searcher.graph_search
    {!parent score=m}childq / {!child score=m}parentq → block joins
    {!payload_score func=max}term          → Searcher.payload_score
    {!collapse field=f} (as fq)            → Searcher.search_collapse

Param values may be bare, 'single-' or "double-quoted"; `v=` overrides the
trailing body (the LocalParams `v` convention)."""

from __future__ import annotations

import re

_LP_RE = re.compile(
    r"^\{!\s*([\w.]+)?((?:\s+[\w.]+=(?:'[^']*'|\"[^\"]*\"|[^\s}]+))*)\s*\}(.*)$",
    re.DOTALL,
)
_PARAM_RE = re.compile(r"([\w.]+)=('[^']*'|\"[^\"]*\"|[^\s}]+)")
_PHRASE_RE = re.compile(r'^\s*"(.*)"(?:~(\d+))?\s*$', re.DOTALL)


class QParserError(ValueError):
    pass


def parse_local_params(q: str) -> tuple[str, dict[str, str], str]:
    """→ (parser_name, params, body).  A query without a `{!...}` prefix
    is ('lucene', {}, q)."""
    m = _LP_RE.match(q)
    if not m:
        return "lucene", {}, q
    name = m.group(1) or "lucene"
    params: dict[str, str] = {}
    for pm in _PARAM_RE.finditer(m.group(2) or ""):
        v = pm.group(2)
        if v and v[0] in "'\"" and v[-1] == v[0]:
            v = v[1:-1]
        params[pm.group(1)] = v
    body = params.pop("v", m.group(3).strip())
    return name.lower(), params, body


def _bool(v: str | None, default: bool) -> bool:
    if v is None:
        return default
    return v.lower() in ("true", "1", "yes", "on")


def dispatch(
    searcher,
    q: str,
    k: int = 10,
    similarity: str = "bm25",
    fq: str | None = None,
    start: int = 0,
):
    """Execute `q` through the parser its local params name — the
    SearchHandler front door.  `fq={!collapse field=f}` applies query-time
    collapse to the main query (Solr's collapse-as-filter contract);
    `start` is offset paging (rows=k & start=N → fetch N+k, return the
    page — use search_after for deep pages)."""
    if start:
        page = dispatch(searcher, q, k=start + k, similarity=similarity, fq=fq)
        return page[start:]
    if fq is not None:
        fname, fparams, _ = parse_local_params(fq)
        if fname != "collapse" or "field" not in fparams:
            raise QParserError(f"unsupported fq parser: {fq!r}")
        qname, _, qbody = parse_local_params(q)
        if qname != "lucene":
            # search_collapse parses its query with the default parser —
            # a {!surround}/{!complexphrase} main query would silently
            # misparse as lucene term syntax, so reject the combination
            raise QParserError(f"fq={{!collapse}} composes with the default parser only, not {{!{qname}}}")
        return searcher.search_collapse(qbody, fparams["field"], k, similarity=similarity)
    name, p, body = parse_local_params(q)
    if name == "lucene":
        return searcher.search(body, k, similarity=similarity)
    if name == "field":
        # {!field f=role v=tool} / {!field f=role}tool — exact keyword term
        # (FieldQParserPlugin; no analysis, no wildcard interpretation)
        if "f" not in p:
            raise QParserError("{!field} requires f=")
        from .query import QueryNode

        return searcher.search_node(
            QueryNode("term", terms=[f"{p['f'].lower()}:{body.lower()}"]), k, similarity=similarity
        )
    if name == "prefix":
        # {!prefix f=tool v=ba} — PrefixQParserPlugin (no escaping needed)
        if "f" not in p:
            raise QParserError("{!prefix} requires f=")
        from .query import QueryNode

        return searcher.search_node(
            QueryNode("prefix", pattern=f"{p['f'].lower()}:{body.lower()}"), k, similarity=similarity
        )
    if name == "complexphrase":
        pm = _PHRASE_RE.match(body)
        text = pm.group(1) if pm else body
        slop = int(pm.group(2)) if (pm and pm.group(2)) else 0
        return searcher.search_complex_phrase(text, k, slop=slop, similarity=similarity)
    if name == "surround":
        return searcher.search_surround(body, k, similarity=similarity)
    if name == "boost":
        if "b" not in p:
            raise QParserError("{!boost} requires b=<function>")
        return searcher.search_boosted(body, p["b"], k, similarity=similarity)
    if name == "join":
        if "from" not in p or "to" not in p:
            raise QParserError("{!join} requires from= and to=")
        return searcher.join_search(
            p["from"], p["to"], body, k, score=p.get("score", "none")
        )
    if name == "graph":
        if "from" not in p or "to" not in p:
            raise QParserError("{!graph} requires from= and to=")
        return searcher.graph_search(
            p["from"],
            p["to"],
            body,
            max_depth=int(p.get("maxDepth", 1)),
            k=k,
            return_root=_bool(p.get("returnRoot"), True),
            traversal_filter=p.get("traversalFilter"),
        )
    if name == "edismax":
        # {!edismax qf='text^1 role^2' mm=N tie=t pf='text^3' ps=S pf2= pf3=}
        # — "text" names the analyzed default field (None key)
        from .query import edismax

        def fb(s: str | None) -> dict | None:
            if s is None:
                return None
            out: dict = {}
            for part in s.split():
                f, _, b = part.partition("^")
                out[None if f == "text" else f] = float(b) if b else 1.0
            return out

        node = edismax(
            body,
            fb(p.get("qf", "text")) or {None: 1.0},
            tiebreak=float(p.get("tie", 0.0)),
            min_should_match=int(p.get("mm", 0)),
            pf=fb(p.get("pf")),
            ps=int(p.get("ps", 0)),
            pf2=fb(p.get("pf2")),
            pf3=fb(p.get("pf3")),
        )
        return [] if node is None else searcher.search_node(node, k, similarity=similarity)
    if name == "parent":
        # {!parent score=m}childQuery → ToParentBlockJoin (the engine's
        # block structure fixes `which=` to conversation parents)
        return searcher.search_parents(body, k, score_mode=p.get("score", "max"))
    if name == "child":
        # {!child score=m}parentQuery → ToChildBlockJoin
        return searcher.search_children(body, k, score_mode=p.get("score", "max"))
    if name == "rerank":
        # {!rerank reRankQuery='...' reRankDocs=N reRankWeight=w}mainQuery
        if "reRankQuery" not in p:
            raise QParserError("{!rerank} requires reRankQuery=")
        return searcher.rerank_query(
            body,
            p["reRankQuery"],
            k=k,
            rerank_docs=int(p.get("reRankDocs", 200)),
            weight=float(p.get("reRankWeight", 2.0)),
            similarity=similarity,
        )
    if name == "ltr":
        # {!ltr model=m reRankDocs=N}query — LTRQParserPlugin over the
        # ManagedModelStore analog (Searcher.register_ltr_model)
        models = getattr(searcher, "_ltr_models", {})
        if p.get("model") not in models:
            raise QParserError(f"unknown LTR model {p.get('model')!r}")
        model, fx = models[p["model"]]
        return searcher.rerank_ltr(
            body, model, rerank_docs=int(p.get("reRankDocs", 50)), k=k, feature_exprs=fx
        )
    if name == "payload_score":
        return searcher.payload_score(
            body,
            k,
            func=p.get("func", "max"),
            include_span_score=_bool(p.get("includeSpanScore"), False),
        )
    raise QParserError(f"unknown query parser {name!r}")
