"""FieldAnalysisRequestHandler analog (solr/core/src/java/org/apache/solr/
handler/FieldAnalysisRequestHandler.java — the /analysis/field debug
endpoint): run a char-filter + tokenizer + filter chain over one input and
report the token stream AFTER EVERY STAGE, so users can see exactly where
a term was split, folded, stemmed or dropped.

Pure driver-side debugging (one string in, a stage trace out) — never part
of a data pipeline.
"""

from __future__ import annotations

from .extras import Token, TokenFilter
from .tokenizers import CharFilter, Tokenizer


def analyze_debug(
    text: str,
    tokenizer: Tokenizer,
    filters: list[tuple[str, TokenFilter]] | None = None,
    char_filters: list[tuple[str, CharFilter]] | None = None,
) -> list[dict]:
    """→ [{stage, kind, output}] — one entry per chain stage.

    `output` is the rewritten text for char-filter stages and the
    [(term, position)] token list for tokenizer/filter stages, exactly as
    the next stage receives it (the /analysis/field per-phase listing)."""
    trace: list[dict] = []
    s = text
    for name, cf in char_filters or []:
        s = cf(s)
        trace.append({"stage": name, "kind": "char_filter", "output": s})
    tokens: list[Token] = tokenizer(s)
    trace.append({"stage": "tokenizer", "kind": "tokenizer", "output": list(tokens)})
    for name, f in filters or []:
        tokens = f(tokens)
        trace.append({"stage": name, "kind": "token_filter", "output": list(tokens)})
    return trace


def analyze_standard_debug(text: str) -> list[dict]:
    """The default chain's trace (StandardAnalyzer equivalent): standard
    tokenizer + lowercase happen inside `analyzer.tokenize`; the stop stage
    is reported separately so the position gaps are visible."""
    from .analyzer import ENGLISH_STOP_WORDS, tokenize

    pre = tokenize(text, remove_stopwords=False)
    post = [(t, p) for t, p in pre if t not in ENGLISH_STOP_WORDS]
    return [
        {"stage": "standard+lowercase", "kind": "tokenizer", "output": pre},
        {"stage": "stop", "kind": "token_filter", "output": post},
    ]
