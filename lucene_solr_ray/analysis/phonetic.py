"""Phonetic encoders (SURVEY.md §2.2 — the `lucene/analysis/phonetic`
module: PhoneticFilterFactory delegating to commons-codec encoders).

Reimplemented from the published algorithm descriptions:
- `soundex`          — American Soundex (Russell/Odell, the archival
                       standard incl. the H/W same-code bridging rule).
- `refined_soundex`  — commons-codec RefinedSoundex variant (no length
                       cap, every letter coded, adjacent duplicates folded).
- `metaphone`        — Lawrence Philips' 1990 Metaphone (the classic
                       16-rule consonant mapping; commons-codec semantics,
                       configurable max code length).
- `nysiis`           — New York State Identification and Intelligence
                       System code (strict 6-char variant).
- `phonetic_filter`  — the TokenFilter wrapper (PhoneticFilterFactory's
                       `inject` semantics: encoded token stacked at the
                       same position as the original).

The soundex implementation is the byte-for-byte twin of the chained
`translate`/`regexp_replace` SQL expression in
`pipelines/text.py::PHONETIC_SQL` (driver hash gate) — change both or
neither.
"""

from __future__ import annotations

from .extras import Token, TokenFilter

# A0 B1 C2 D3 E0 F1 G2 H9 I0 J2 K2 L4 M5 N5 O0 P1 Q2 R6 S2 T3 U0 V1 W9 X2 Y0 Z2
# (9 = the H/W sentinel: removed before folding so same-code letters bridged
# by H/W fold together, while vowels — mapped to 0 — keep them apart)
_SOUNDEX_MAP = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01230129022455012623019202")

# commons-codec RefinedSoundex US_ENGLISH mapping
_REFINED_MAP = str.maketrans("ABCDEFGHIJKLMNOPQRSTUVWXYZ", "01360240043788015936020505")


def _letters(word: str) -> str:
    return "".join(c for c in word.upper() if "A" <= c <= "Z")


def _fold_runs(s: str) -> str:
    """Collapse runs of the same character to one occurrence."""
    out = []
    for c in s:
        if not out or out[-1] != c:
            out.append(c)
    return "".join(out)


def soundex(word: str) -> str:
    """American Soundex: first letter + 3 digits, zero-padded."""
    u = _letters(word)
    if not u:
        return ""
    d = u.translate(_SOUNDEX_MAP)
    first_code = d[0]
    folded = _fold_runs(d.replace("9", ""))
    # the folded string's first char is the first letter's own code unless
    # the first letter was H/W (already removed) — don't double-drop then
    tail = folded if first_code == "9" else folded[1:]
    digits = tail.replace("0", "")
    return u[0] + (digits + "000")[:3]


def refined_soundex(word: str) -> str:
    """RefinedSoundex: first letter + one digit per letter run, uncapped."""
    u = _letters(word)
    if not u:
        return ""
    return u[0] + _fold_runs(u.translate(_REFINED_MAP))


# -- Metaphone --------------------------------------------------------------

_M_VOWELS = "AEIOU"
_M_FRONTV = "EIY"  # front vowels soften C and G
_M_VARSON = "CSPTG"  # consonants whose following H is silent


def metaphone(word: str, max_code_len: int = 4) -> str:
    """Classic Metaphone (Philips 1990)."""
    txt = _letters(word)
    if not txt:
        return ""
    if len(txt) == 1:
        return txt
    two = txt[:2]
    if two in ("AE", "GN", "KN", "PN", "WR"):
        txt = txt[1:]
    elif txt[0] == "X":
        txt = "S" + txt[1:]
    elif two == "WH":
        txt = "W" + txt[2:]
    n = len(txt)

    def at(i: int) -> str:
        return txt[i] if 0 <= i < n else ""

    def vowel(i: int) -> bool:
        return at(i) in _M_VOWELS

    code: list[str] = []
    i = 0
    while i < n and len(code) < max_code_len:
        c = txt[i]
        if c != "C" and i > 0 and txt[i - 1] == c:  # fold doubles except CC
            i += 1
            continue
        if c in _M_VOWELS:
            if i == 0:
                code.append(c)
        elif c == "B":
            if not (i == n - 1 and i > 0 and txt[i - 1] == "M"):
                code.append("B")  # final MB → silent B
        elif c == "C":
            if at(i - 1) == "S" and at(i + 1) in _M_FRONTV:
                pass  # SCE/SCI/SCY: C silent
            elif txt[i : i + 3] == "CIA":
                code.append("X")
            elif at(i + 1) in _M_FRONTV:
                code.append("S")  # CE/CI/CY
            elif at(i - 1) == "S" and at(i + 1) == "H":
                code.append("K")  # SCH
            elif at(i + 1) == "H":
                if i == 0 and n >= 3 and not vowel(2):
                    code.append("K")  # CH + consonant at start (chronic)
                else:
                    code.append("X")  # CH
            else:
                code.append("K")
        elif c == "D":
            if at(i + 1) == "G" and at(i + 2) in _M_FRONTV:
                code.append("J")  # DGE/DGI/DGY
                i += 2
            else:
                code.append("T")
        elif c == "G":
            silent = False
            if at(i + 1) == "H" and (i + 1 == n - 1 or not vowel(i + 2)):
                silent = True  # GH at end / before consonant
            if i > 0 and (txt[i : i + 2] == "GN" or txt[i : i + 4] == "GNED"):
                silent = True
            if not silent:
                if at(i + 1) in _M_FRONTV and at(i - 1) != "G":
                    code.append("J")
                else:
                    code.append("K")
        elif c == "H":
            if i == n - 1 or at(i - 1) in _M_VARSON:
                pass  # final H / H after CSPTG: silent
            elif vowel(i + 1):
                code.append("H")
        elif c == "K":
            if at(i - 1) != "C":
                code.append("K")
        elif c == "P":
            code.append("F" if at(i + 1) == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if txt[i : i + 2] == "SH" or txt[i : i + 3] in ("SIO", "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif c == "T":
            if txt[i : i + 3] in ("TIA", "TIO"):
                code.append("X")
            elif txt[i : i + 3] == "TCH":
                pass  # silent T in TCH
            elif txt[i : i + 2] == "TH":
                code.append("0")  # theta
            else:
                code.append("T")
        elif c == "V":
            code.append("F")
        elif c in ("W", "Y"):
            if vowel(i + 1):
                code.append(c)
        elif c == "X":
            code.append("K")
            if len(code) < max_code_len:
                code.append("S")
        elif c == "Z":
            code.append("S")
        else:  # F J L M N R
            code.append(c)
        i += 1
    return "".join(code)


# -- NYSIIS -----------------------------------------------------------------

_NY_VOWELS = "AEIOU"
_NY_FIRST = [("MAC", "MCC"), ("KN", "NN"), ("K", "C"), ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")]
_NY_LAST = [("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"), ("RD", "D"), ("NT", "D"), ("ND", "D")]


def nysiis(word: str, strict: bool = True) -> str:
    """NYSIIS code; `strict` truncates to the archival 6-character key."""
    u = _letters(word)
    if not u:
        return ""
    for pre, rep in _NY_FIRST:
        if u.startswith(pre):
            u = rep + u[len(pre) :]
            break
    for suf, rep in _NY_LAST:
        if u.endswith(suf):
            u = u[: -len(suf)] + rep
            break
    key = [u[0]]
    i = 1
    while i < len(u):
        c = u[i]
        rep: str
        if u[i : i + 2] == "EV":
            rep = "AF"
            i += 2
        elif c in _NY_VOWELS:
            rep = "A"
            i += 1
        elif c == "Q":
            rep = "G"
            i += 1
        elif c == "Z":
            rep = "S"
            i += 1
        elif c == "M":
            rep = "N"
            i += 1
        elif u[i : i + 2] == "KN":
            rep = "N"
            i += 2
        elif c == "K":
            rep = "C"
            i += 1
        elif u[i : i + 3] == "SCH":
            rep = "SSS"
            i += 3
        elif u[i : i + 2] == "PH":
            rep = "FF"
            i += 2
        elif c == "H" and (u[i - 1] not in _NY_VOWELS or (i + 1 < len(u) and u[i + 1] not in _NY_VOWELS)):
            rep = u[i - 1]
            i += 1
        elif c == "W" and u[i - 1] in _NY_VOWELS:
            rep = u[i - 1]
            i += 1
        else:
            rep = c
            i += 1
        for r in rep:
            if key[-1] != r:
                key.append(r)
    # terminal cleanup
    if key[-1] == "S" and len(key) > 1:
        key.pop()
    if len(key) >= 2 and key[-2] == "A" and key[-1] == "Y":
        del key[-2]
    if key[-1] == "A" and len(key) > 1:
        key.pop()
    out = "".join(key)
    return out[:6] if strict else out


ENCODERS = {
    "soundex": soundex,
    "refined_soundex": refined_soundex,
    "metaphone": metaphone,
    "nysiis": nysiis,
}


def phonetic_filter(encoder: str = "soundex", inject: bool = True) -> TokenFilter:
    """PhoneticFilterFactory: stack the encoded form at the original token's
    position (`inject=true`), or replace the token (`inject=false`)."""
    enc = ENCODERS[encoder]

    def f(tokens: list[Token]) -> list[Token]:
        out: list[Token] = []
        for t, p in tokens:
            if inject:
                out.append((t, p))
            c = enc(t)
            if c and (not inject or c != t):
                out.append((c, p))
        return out

    return f
