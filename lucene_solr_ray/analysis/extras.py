"""Composable analysis components beyond the standard chain (SURVEY.md §2.2).

Each filter is a pure function `list[Token] -> list[Token]` over
`(term, position)` tuples, composable after `tokenize` — the TokenFilter
registry pattern (lucene/core/src/java/org/apache/lucene/analysis/
TokenizerFactory.java SPI; factories registered by name).

Implemented (reference anchors in lucene/analysis/common/src/java/org/
apache/lucene/analysis/ unless noted):
- ngram / edge-ngram     ngram/NGramTokenFilter.java, EdgeNGramTokenFilter.java
- shingle (word n-grams) shingle/ShingleFilter.java (fill char '_')
- length filter          miscellaneous/LengthFilter.java
- trim / lowercase       miscellaneous/TrimFilter.java, core/LowerCaseFilter.java
- ascii folding (latin-1 subset)  miscellaneous/ASCIIFoldingFilter.java
- porter stemmer         en/PorterStemFilter.java (Porter 1980 algorithm,
                         reimplemented from the published description)
- stopword filter w/ gaps  core/StopFilter.java
- keyword marker         miscellaneous/KeywordMarkerFilter.java protects
                         terms from stemming
"""

from __future__ import annotations

import unicodedata
from collections.abc import Callable

Token = tuple[str, int]
TokenFilter = Callable[[list[Token]], list[Token]]


# -- generation filters (1 → N tokens) -------------------------------------


def ngram_filter(min_gram: int = 2, max_gram: int = 3) -> TokenFilter:
    def f(tokens: list[Token]) -> list[Token]:
        out = []
        for term, pos in tokens:
            for n in range(min_gram, max_gram + 1):
                for i in range(0, len(term) - n + 1):
                    out.append((term[i : i + n], pos))
        return out

    return f


def edge_ngram_filter(min_gram: int = 1, max_gram: int = 5) -> TokenFilter:
    def f(tokens: list[Token]) -> list[Token]:
        out = []
        for term, pos in tokens:
            for n in range(min_gram, min(max_gram, len(term)) + 1):
                out.append((term[:n], pos))
        return out

    return f


def shingle_filter(size: int = 2, sep: str = " ", fill: str = "_") -> TokenFilter:
    """Word n-grams over positions; position gaps (removed stopwords) are
    filled with `fill`, mirroring ShingleFilter's filler tokens."""

    def f(tokens: list[Token]) -> list[Token]:
        if not tokens:
            return []
        max_pos = tokens[-1][1]
        by_pos = {p: t for t, p in tokens}
        first = tokens[0][1]
        seq = [by_pos.get(p, fill) for p in range(first, max_pos + 1)]
        out = []
        for i in range(0, len(seq) - size + 1):
            gram = seq[i : i + size]
            if gram[0] == fill or gram[-1] == fill:
                continue  # shingles never start/end with a filler
            out.append((sep.join(gram), first + i))
        return out

    return f


# -- per-token filters ------------------------------------------------------


def length_filter(min_len: int = 1, max_len: int = 255) -> TokenFilter:
    def f(tokens: list[Token]) -> list[Token]:
        return [(t, p) for t, p in tokens if min_len <= len(t) <= max_len]

    return f


def trim_filter() -> TokenFilter:
    return lambda tokens: [(t.strip(), p) for t, p in tokens if t.strip()]


def lowercase_filter() -> TokenFilter:
    return lambda tokens: [(t.lower(), p) for t, p in tokens]


def ascii_folding_filter() -> TokenFilter:
    """Strip combining marks after NFKD — covers the Latin accent range of
    ASCIIFoldingFilter (the full table is ~2000 mappings; this is the
    standard-normalization subset)."""

    def fold(t: str) -> str:
        return "".join(c for c in unicodedata.normalize("NFKD", t) if not unicodedata.combining(c))

    return lambda tokens: [(fold(t), p) for t, p in tokens]


def stop_filter(stopwords: frozenset[str]) -> TokenFilter:
    """Removes stopwords, keeping position gaps (FilteringTokenFilter)."""
    return lambda tokens: [(t, p) for t, p in tokens if t not in stopwords]


def keyword_marker(protected: frozenset[str], inner: TokenFilter) -> TokenFilter:
    def f(tokens: list[Token]) -> list[Token]:
        out = []
        for tok in tokens:
            if tok[0] in protected:
                out.append(tok)
            else:
                out.extend(inner([tok]))
        return out

    return f


# -- Porter stemmer ---------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    return (
        len(w) >= 3
        and _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def porter_stem(w: str) -> str:
    """Porter 1980, steps 1–5 (An algorithm for suffix stripping)."""
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, rep in [("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
                     ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
                     ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
                     ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
                     ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")]:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 3
    for suf, rep in [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
                     ("ical", "ic"), ("ful", ""), ("ness", "")]:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # step 4
    for suf in ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
                "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize"]:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def porter_stem_filter() -> TokenFilter:
    return lambda tokens: [(porter_stem(t), p) for t, p in tokens]


def synonym_filter(synonyms: dict[str, list[str]], keep_original: bool = True) -> TokenFilter:
    """Single-token synonym expansion at the SAME position (the non-graph
    subset of synonym/SynonymGraphFilter.java: multi-word synonyms emit a
    token graph via posLength and are round-2 scope; single-token synonyms
    are position-stacked tokens, exactly as emitted here)."""

    def f(tokens: list[Token]) -> list[Token]:
        out = []
        for t, p in tokens:
            if keep_original or t not in synonyms:
                out.append((t, p))
            for syn in synonyms.get(t, ()):
                out.append((syn, p))
        return out

    return f


def word_delimiter_filter(
    generate_parts: bool = True,
    catenate_all: bool = False,
    preserve_original: bool = False,
) -> TokenFilter:
    """Non-graph subset of miscellaneous/WordDelimiterGraphFilter.java:
    splits tokens on letter↔digit transitions, case changes, and intra-word
    delimiters ("wi-fi2" → wi, fi, 2); optionally catenates all parts
    ("wifi2") and/or keeps the original.  Parts stack at the original
    token's position (the graph posLength refinement is round-2 scope)."""
    import re

    part_re = re.compile(r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+")

    def f(tokens: list[Token]) -> list[Token]:
        out = []
        for term, pos in tokens:
            parts = part_re.findall(term)
            if len(parts) <= 1:
                # single-part token: emit once (WordDelimiterGraphFilter never
                # duplicates a token whose sole part equals the original)
                if not parts or parts[0] == term:
                    out.append((term, pos))
                else:  # leading/trailing delimiters, e.g. "foo-"
                    if preserve_original:
                        out.append((term, pos))
                    if generate_parts or not preserve_original:
                        out.append((parts[0], pos))
                continue
            if preserve_original:
                out.append((term, pos))
            if generate_parts:
                out.extend((p, pos) for p in parts)
            if catenate_all and len(parts) > 1:
                out.append(("".join(parts), pos))
        return out

    return f


# -- long-tail filters (SURVEY §2.2: the miscellaneous/* family) ------------


def common_grams_filter(common_words: frozenset[str], sep: str = "_") -> TokenFilter:
    """commongrams/CommonGramsFilter.java: for each adjacent token pair where
    either side is a common word, additionally emit the joined bigram at the
    first token's position (posLength-2 token in Lucene)."""

    def f(tokens: list[Token]) -> list[Token]:
        out: list[Token] = []
        for i, (t, p) in enumerate(tokens):
            out.append((t, p))
            if i + 1 < len(tokens):
                nt, _ = tokens[i + 1]
                if t in common_words or nt in common_words:
                    out.append((t + sep + nt, p))
        return out

    return f


def pattern_replace_filter(pattern: str, replacement: str) -> TokenFilter:
    """pattern/PatternReplaceFilter.java (empty results are dropped)."""
    import re

    pat = re.compile(pattern)

    def f(tokens: list[Token]) -> list[Token]:
        out = [(pat.sub(replacement, t), p) for t, p in tokens]
        return [(t, p) for t, p in out if t]

    return f


def remove_duplicates_filter() -> TokenFilter:
    """miscellaneous/RemoveDuplicatesTokenFilter.java: drop tokens whose
    (term, position) pair was already emitted."""

    def f(tokens: list[Token]) -> list[Token]:
        seen: set[Token] = set()
        out = []
        for tok in tokens:
            if tok not in seen:
                seen.add(tok)
                out.append(tok)
        return out

    return f


def capitalization_filter() -> TokenFilter:
    """miscellaneous/CapitalizationFilter.java default mode: first char
    uppercased, rest lowercased."""
    return lambda tokens: [(t.capitalize(), p) for t, p in tokens]


def limit_token_count_filter(max_count: int) -> TokenFilter:
    """miscellaneous/LimitTokenCountFilter.java."""
    return lambda tokens: tokens[:max_count]


def truncate_filter(length: int) -> TokenFilter:
    """miscellaneous/TruncateTokenFilter.java."""
    return lambda tokens: [(t[:length], p) for t, p in tokens]


def decimal_digit_filter() -> TokenFilter:
    """core/DecimalDigitFilter.java: fold any Unicode decimal digit to its
    ASCII value."""

    def fold(t: str) -> str:
        return "".join(str(unicodedata.decimal(c)) if c.isdigit() and not c.isascii() else c for c in t)

    return lambda tokens: [(fold(t), p) for t, p in tokens]


_ELISION_DEFAULT = frozenset("l m t qu n s j d c jusqu quoiqu lorsqu puisqu".split())


def elision_filter(articles: frozenset[str] = _ELISION_DEFAULT) -> TokenFilter:
    """util/ElisionFilter.java: strip a leading article before an apostrophe
    (l'avion → avion)."""

    def strip(t: str) -> str:
        for apos in ("'", "’"):
            i = t.find(apos)
            if i >= 0 and t[:i].lower() in articles:
                return t[i + 1 :]
        return t

    def f(tokens: list[Token]) -> list[Token]:
        out = [(strip(t), p) for t, p in tokens]
        return [(t, p) for t, p in out if t]

    return f


def english_possessive_filter() -> TokenFilter:
    """en/EnglishPossessiveFilter.java: strip trailing 's (both apostrophes)."""

    def strip(t: str) -> str:
        if len(t) >= 2 and t[-1] in ("s", "S") and t[-2] in ("'", "’"):
            return t[:-2]
        return t

    return lambda tokens: [(strip(t), p) for t, p in tokens]


def english_minimal_stem_filter() -> TokenFilter:
    """en/EnglishMinimalStemFilter.java (S-stemmer, Harman 1991 as shipped
    in Lucene's EnglishMinimalStemmer): plural-only minimal stemming."""

    def stem(w: str) -> str:
        if len(w) < 3 or w[-1] != "s":
            return w
        c = w[-2]
        if c in ("u", "s"):
            return w
        if c == "e":
            if len(w) > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
                return w[:-3] + "y"  # -ies → -y
            if w[-3] in ("i", "a", "o", "e"):
                return w
            return w[:-1]
        return w[:-1]

    return lambda tokens: [(stem(t), p) for t, p in tokens]


def stemmer_override_filter(overrides: dict[str, str], inner: TokenFilter) -> TokenFilter:
    """miscellaneous/StemmerOverrideFilter.java: dictionary-mapped terms
    bypass the inner stemmer."""

    def f(tokens: list[Token]) -> list[Token]:
        out: list[Token] = []
        for tok in tokens:
            if tok[0] in overrides:
                out.append((overrides[tok[0]], tok[1]))
            else:
                out.extend(inner([tok]))
        return out

    return f


def keep_word_filter(keep: frozenset[str]) -> TokenFilter:
    """miscellaneous/KeepWordFilter.java (position gaps kept, like stop)."""
    return lambda tokens: [(t, p) for t, p in tokens if t in keep]


def delimited_payload_filter(delimiter: str = "|") -> TokenFilter:
    """payloads/DelimitedPayloadTokenFilter.java: strip the `term|payload`
    suffix from the term. Payload bytes are not carried into postings (our
    index stores positions only); the filter exists so delimited corpora
    analyze to the same terms as the reference chain."""

    def f(tokens: list[Token]) -> list[Token]:
        out = []
        for t, p in tokens:
            i = t.find(delimiter)
            out.append((t[:i] if i > 0 else t, p))
        return out

    return f


def chain(*filters: TokenFilter) -> TokenFilter:
    """Compose filters left-to-right (the TokenStream decorator chain)."""

    def f(tokens: list[Token]) -> list[Token]:
        for flt in filters:
            tokens = flt(tokens)
        return tokens

    return f


REGISTRY: dict[str, Callable[..., TokenFilter]] = {
    "ngram": ngram_filter,
    "edge_ngram": edge_ngram_filter,
    "shingle": shingle_filter,
    "length": length_filter,
    "trim": trim_filter,
    "lowercase": lowercase_filter,
    "ascii_folding": ascii_folding_filter,
    "porter_stem": porter_stem_filter,
    "synonym": synonym_filter,
    "word_delimiter": word_delimiter_filter,
    "common_grams": common_grams_filter,
    "pattern_replace": pattern_replace_filter,
    "remove_duplicates": remove_duplicates_filter,
    "capitalization": capitalization_filter,
    "limit_token_count": limit_token_count_filter,
    "truncate": truncate_filter,
    "decimal_digit": decimal_digit_filter,
    "elision": elision_filter,
    "english_possessive": english_possessive_filter,
    "english_minimal_stem": english_minimal_stem_filter,
    "stemmer_override": stemmer_override_filter,
    "keep_word": keep_word_filter,
    "delimited_payload": delimited_payload_filter,
}
