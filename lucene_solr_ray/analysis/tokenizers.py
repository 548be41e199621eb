"""Alternative tokenizers + char filters (SURVEY.md §2.2 long tail).

Reference anchors (lucene/analysis/common/src/java/org/apache/lucene/analysis/
unless noted):
- WhitespaceTokenizer / LetterTokenizer / KeywordTokenizer — core/*.java
- PatternTokenizer       pattern/PatternTokenizer.java (group=-1 splits,
                         group>=0 emits that match group)
- PathHierarchyTokenizer path/PathHierarchyTokenizer.java (prefix chain at
                         one position; `reverse` emits the suffix chain)
- UAX29URLEmailTokenizer standard/UAX29URLEmailTokenizer.java (approximated:
                         emails/URLs kept whole, else word runs)
- HTMLStripCharFilter    charfilter/HTMLStripCharFilter.java (tags → space,
                         entities decoded; offset correction n/a — positions
                         here are token ordinals, not char offsets)
- MappingCharFilter      charfilter/MappingCharFilter.java (longest-match
                         greedy rewrite)
- PatternReplaceCharFilter  pattern/PatternReplaceCharFilter.java

A CharFilter is `str -> str` applied before any tokenizer; a Tokenizer is
`str -> list[(term, position)]` producing the same Token shape the filter
chain in `analysis/extras.py` consumes.
"""

from __future__ import annotations

import html
import re
from collections.abc import Callable

from .extras import Token

CharFilter = Callable[[str], str]
Tokenizer = Callable[[str], list[Token]]


# -- char filters -----------------------------------------------------------

_TAG_RE = re.compile(r"<[^>]*>")


def html_strip_char_filter() -> CharFilter:
    return lambda s: html.unescape(_TAG_RE.sub(" ", s))


def mapping_char_filter(mapping: dict[str, str]) -> CharFilter:
    """Greedy longest-match-first source rewrite (ties broken by length)."""
    keys = sorted(mapping, key=len, reverse=True)
    pat = re.compile("|".join(re.escape(k) for k in keys)) if keys else None

    def f(s: str) -> str:
        return pat.sub(lambda m: mapping[m.group()], s) if pat else s

    return f


def pattern_replace_char_filter(pattern: str, replacement: str) -> CharFilter:
    pat = re.compile(pattern)
    return lambda s: pat.sub(replacement, s)


# -- tokenizers -------------------------------------------------------------


def _positioned(terms: list[str]) -> list[Token]:
    return [(t, i) for i, t in enumerate(terms)]


def whitespace_tokenizer() -> Tokenizer:
    return lambda s: _positioned(s.split())


_LETTER_RE = re.compile(r"[A-Za-z]+")


def letter_tokenizer() -> Tokenizer:
    return lambda s: _positioned(_LETTER_RE.findall(s))


def keyword_tokenizer() -> Tokenizer:
    return lambda s: [(s, 0)] if s else []


def pattern_tokenizer(pattern: str, group: int = -1) -> Tokenizer:
    pat = re.compile(pattern)
    if group < 0:
        return lambda s: _positioned([t for t in pat.split(s) if t])
    return lambda s: _positioned([m.group(group) for m in pat.finditer(s) if m.group(group)])


def path_hierarchy_tokenizer(delimiter: str = "/", reverse: bool = False, skip: int = 0) -> Tokenizer:
    """`/a/b/c` → the prefix chain (`/a`, `/a/b`, `/a/b/c`) stacked at one
    position (posInc 0 after the first, PathHierarchyTokenizer contract);
    `reverse` emits the suffix chain instead."""

    def f(s: str) -> list[Token]:
        if not s:
            return []
        parts = s.split(delimiter)
        if reverse:
            parts = parts[::-1]
        parts = parts[skip:]
        out: list[Token] = []
        for end in range(1, len(parts) + 1):
            seq = parts[:end]
            out.append((delimiter.join(seq[::-1] if reverse else seq), 0))
        return out

    return f


_URL_EMAIL_RE = re.compile(
    r"(?P<email>[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})"
    r"|(?P<url>https?://[^\s<>\"]+|www\.[^\s<>\"]+)"
    r"|(?P<word>[A-Za-z0-9_]+)"
)


def url_email_tokenizer() -> Tokenizer:
    """UAX29URLEmailTokenizer approximation: emails and URLs survive as
    single tokens; everything else tokenizes as word runs."""

    def f(s: str) -> list[Token]:
        return _positioned([m.group() for m in _URL_EMAIL_RE.finditer(s)])

    return f


def _icu_entry() -> Tokenizer:
    from .icu import icu_tokenizer

    return icu_tokenizer()


def _cjk_entry() -> Tokenizer:
    from .icu import cjk_tokenizer

    return cjk_tokenizer()


def _ja_entry() -> Tokenizer:
    from .ja import ja_tokenizer

    return ja_tokenizer()


def _ko_entry() -> Tokenizer:
    from .ko import ko_tokenizer

    return ko_tokenizer()


def _zh_entry() -> Tokenizer:
    from .zh import zh_tokenizer

    return zh_tokenizer()


TOKENIZER_REGISTRY: dict[str, Callable[..., Tokenizer]] = {
    "whitespace": whitespace_tokenizer,
    "letter": letter_tokenizer,
    "keyword": keyword_tokenizer,
    "pattern": pattern_tokenizer,
    "path_hierarchy": path_hierarchy_tokenizer,
    "url_email": url_email_tokenizer,
    # ICU-lite multilingual word-break + CJK bigramming (analysis/icu.py)
    "icu": _icu_entry,
    "cjk": _cjk_entry,
    # kuromoji-lite Japanese lattice segmentation (analysis/ja.py)
    "ja": _ja_entry,
    # nori-lite Korean suffix strip (analysis/ko.py)
    "ko": _ko_entry,
    # smartcn-lite Chinese lattice segmentation (analysis/zh.py)
    "zh": _zh_entry,
}

CHAR_FILTER_REGISTRY: dict[str, Callable[..., CharFilter]] = {
    "html_strip": html_strip_char_filter,
    "mapping": mapping_char_filter,
    "pattern_replace": pattern_replace_char_filter,
}
