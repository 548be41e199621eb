"""Function queries / ValueSource library (SURVEY.md §2.9a).

Reimplements the reference's function-query surface — the per-row scalar
expression language registered in
solr/core/src/java/org/apache/solr/search/ValueSourceParser.java with
implementations under lucene/queries/src/java/org/apache/lucene/queries/
function/valuesource/ — as vectorized numpy kernels over column dicts.

`parse_expr("recip(ms(ts), 3.16e-11, 1, 1)")` → AST;
`evaluate(ast, {"ts": np.array(...)})` → float64 array.

Inside a Ray pipeline these evaluate per batch in `map_batches`
(batch_format="numpy"/"pandas"); scoring use mirrors FunctionScoreQuery
(lucene/queries/.../function/FunctionScoreQuery.java).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

__all__ = ["FUNCTIONS", "parse_expr", "evaluate", "Expr"]


def _map_fn(x, mn, mx, target, default=None):
    out = np.where((x >= mn) & (x <= mx), target, x if default is None else default)
    return out.astype(np.float64)


def _scale_fn(x, lo, hi):
    xmin, xmax = np.nanmin(x), np.nanmax(x)
    if xmax == xmin:
        return np.full_like(np.asarray(x, dtype=np.float64), lo)
    return lo + (x - xmin) * (hi - lo) / (xmax - xmin)


def levenshtein(s: str, t: str) -> int:
    """Plain edit distance, DuckDB `levenshtein()` semantics — the ONE
    scalar kernel shared by strdist, the fuzzy suggester and tests (the
    vectorized matrix DP in search/spell.py is the bulk variant)."""
    prev = list(range(len(t) + 1))
    for i, ca in enumerate(s, 1):
        cur = [i] + [0] * len(t)
        for j, cb in enumerate(t, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def _strdist(a, b, metric="levenshtein"):
    lev = levenshtein
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        d = lev(str(a[i]), str(b[i]))
        m = max(len(str(a[i])), len(str(b[i]))) or 1
        out[i] = 1.0 - d / m  # Solr strdist returns a similarity in [0,1]
    return out


def jaro_winkler(s1: str, s2: str, p: float = 0.1, threshold: float = 0.7) -> float:
    """Jaro-Winkler similarity, exactly DuckDB's `jaro_winkler_similarity`
    semantics (strdist(a,b,'jw') in Solr's ValueSourceParser — lucene/
    suggest/src/java/org/apache/lucene/search/spell/JaroWinklerDistance
    .java): Winkler prefix boost (≤4 chars, scale 0.1) applied only when
    jaro > 0.7; EMPTY input on either side → 0.0 (DuckDB convention —
    verified bit-exact over 20k random pairs)."""
    l1, l2 = len(s1), len(s2)
    if not l1 or not l2:
        return 0.0
    if s1 == s2:
        return 1.0
    md = max(l1, l2) // 2 - 1
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i, c in enumerate(s1):
        for j in range(max(0, i - md), min(l2, i + md + 1)):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if j > threshold:
        l = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            l += 1
        j = j + l * p * (1 - j)
    return j


def _strdist_jw(a, b):
    a = np.asarray(a, dtype=object)
    b = np.asarray(b, dtype=object)
    return np.array([jaro_winkler(str(x), str(y)) for x, y in zip(a, b)], dtype=np.float64)


# name → (min_arity, max_arity, kernel).  Kernels take/return float64 arrays
# (broadcasting scalars fine), matching the ValueSourceParser registry names.
FUNCTIONS: dict[str, tuple[int, int, callable]] = {
    "add": (2, 99, lambda *a: np.sum(np.broadcast_arrays(*a), axis=0)),
    "sum": (1, 99, lambda *a: np.sum(np.broadcast_arrays(*a), axis=0)),
    "sub": (2, 2, lambda a, b: a - b),
    "mul": (2, 99, lambda *a: np.prod(np.broadcast_arrays(*a), axis=0)),
    "product": (2, 99, lambda *a: np.prod(np.broadcast_arrays(*a), axis=0)),
    "div": (2, 2, lambda a, b: a / b),
    "mod": (2, 2, lambda a, b: np.mod(a, b)),
    "abs": (1, 1, np.abs),
    "log": (1, 1, np.log10),
    "ln": (1, 1, np.log),
    "sqrt": (1, 1, np.sqrt),
    "cbrt": (1, 1, np.cbrt),
    "pow": (2, 2, np.power),
    "exp": (1, 1, np.exp),
    "sin": (1, 1, np.sin), "cos": (1, 1, np.cos), "tan": (1, 1, np.tan),
    "asin": (1, 1, np.arcsin), "acos": (1, 1, np.arccos), "atan": (1, 1, np.arctan),
    "atan2": (2, 2, np.arctan2),
    "sinh": (1, 1, np.sinh), "cosh": (1, 1, np.cosh), "tanh": (1, 1, np.tanh),
    "ceil": (1, 1, np.ceil), "floor": (1, 1, np.floor), "rint": (1, 1, np.rint),
    "hypot": (2, 2, np.hypot),
    "max": (2, 99, lambda *a: np.maximum.reduce(list(np.broadcast_arrays(*a)))),
    "min": (2, 99, lambda *a: np.minimum.reduce(list(np.broadcast_arrays(*a)))),
    "map": (4, 5, _map_fn),
    "scale": (3, 3, _scale_fn),
    "recip": (4, 4, lambda x, m, a, b: a / (m * x + b)),
    "linear": (3, 3, lambda x, m, c: m * x + c),
    "if": (3, 3, lambda c, t, f: np.where(c != 0, t, f)),
    "not": (1, 1, lambda a: (a == 0).astype(np.float64)),
    "and": (2, 99, lambda *a: np.logical_and.reduce([x != 0 for x in np.broadcast_arrays(*a)]).astype(np.float64)),
    "or": (2, 99, lambda *a: np.logical_or.reduce([x != 0 for x in np.broadcast_arrays(*a)]).astype(np.float64)),
    "xor": (2, 2, lambda a, b: ((a != 0) ^ (b != 0)).astype(np.float64)),
    "def": (2, 2, lambda a, d: np.where(np.isnan(a), d, a)),
    "exists": (1, 1, lambda a: (~np.isnan(a)).astype(np.float64)),
    "gt": (2, 2, lambda a, b: (a > b).astype(np.float64)),
    "gte": (2, 2, lambda a, b: (a >= b).astype(np.float64)),
    "lt": (2, 2, lambda a, b: (a < b).astype(np.float64)),
    "lte": (2, 2, lambda a, b: (a <= b).astype(np.float64)),
    "eq": (2, 2, lambda a, b: (a == b).astype(np.float64)),
    "ms": (1, 2, lambda a, b=0.0: a - b),  # millis diff (caller supplies epoch ms)
    "sqedist": (2, 99, lambda *a: _lp_dist(a, squared=True)),
    "dist": (3, 99, lambda p, *a: _lp_dist(a, p=float(np.asarray(p).flat[0]))),
    "strdist": (2, 3, _strdist),
    "jarowinkler": (2, 2, _strdist_jw),
    # RawCurrencyValueSource (solr/.../schema/CurrencyFieldType.java):
    # pre-resolved by functions.currency.resolve_currency_codes to
    # (minor-unit column, rate literal); the truncating multiply is
    # CurrencyValue.convertTo's (long)(amount * rate), returned as a
    # double of TARGET MINOR UNITS (RawCurrencyValueSource.longVal).
    "currency": (2, 2, lambda c, r: np.trunc(c * r)),
    "hsin": (5, 5, lambda r, y1, x1, y2, x2: _haversine(y1, x1, y2, x2, r)),
    "geodist": (4, 4, lambda y1, x1, y2, x2: _haversine(y1, x1, y2, x2, EARTH_MEAN_RADIUS_KM)),
}

EARTH_MEAN_RADIUS_KM = 6371.0087714  # GeoUtils.EARTH_MEAN_RADIUS_METERS / 1000


def _haversine(lat1, lon1, lat2, lon2, radius):
    """Great-circle distance (solr/core/.../search/function/distance/
    HaversineFunction.java; `geodist` returns km on the earth-mean
    radius).  Spherical-trig kernels are vectorized numpy — deliberately
    NOT hash-gated against SQL (np.sin vs libm can differ in the last
    ulp); the pytest oracle checks against scalar math.* instead."""
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(v, dtype=np.float64)) for v in (lat1, lon1, lat2, lon2))
    sdlat = np.sin((lat2 - lat1) / 2.0)
    sdlon = np.sin((lon2 - lon1) / 2.0)
    h = sdlat * sdlat + np.cos(lat1) * np.cos(lat2) * sdlon * sdlon
    r = float(np.asarray(radius, dtype=np.float64).flat[0])
    return 2.0 * r * np.arcsin(np.sqrt(np.clip(h, 0.0, 1.0)))


def _lp_dist(cols, p=2.0, squared=False):
    half = len(cols) // 2
    xs, ys = cols[:half], cols[half:]
    diffs = [np.abs(np.asarray(x, dtype=np.float64) - np.asarray(y, dtype=np.float64)) for x, y in zip(xs, ys)]
    if squared:
        return np.sum([d * d for d in diffs], axis=0)
    if p == 0:
        return np.max(diffs, axis=0)
    return np.sum([d**p for d in diffs], axis=0) ** (1.0 / p)


# -- expression parsing -----------------------------------------------------


@dataclass
class Expr:
    kind: str  # "call" | "field" | "lit" | "str" (quoted literal, in name)
    name: str = ""
    value: float = 0.0
    args: list["Expr"] = None


_TOKEN = re.compile(r"\s*('[^']*'|[A-Za-z_][\w.]*|-?\d+\.?\d*(?:[eE][+-]?\d+)?|[(),])")


def parse_expr(s: str) -> Expr:
    tokens = _TOKEN.findall(s)
    pos = 0

    def peek():
        return tokens[pos] if pos < len(tokens) else None

    def take():
        nonlocal pos
        t = tokens[pos]
        pos += 1
        return t

    def expr() -> Expr:
        t = take()
        if t.startswith("'"):
            return Expr("str", name=t[1:-1])
        if re.fullmatch(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", t):
            return Expr("lit", value=float(t))
        if peek() == "(":
            take()
            args = []
            if peek() != ")":
                args.append(expr())
                while peek() == ",":
                    take()
                    args.append(expr())
            assert take() == ")", f"expected ) in {s}"
            if t == "field":
                assert len(args) == 1 and args[0].kind == "field"
                return args[0]
            return Expr("call", name=t, args=args)
        return Expr("field", name=t)

    out = expr()
    assert pos == len(tokens), f"trailing tokens in {s!r}"
    return out


def expr_fields(node: Expr) -> list[str]:
    """Field names an expression reads (the columns a caller must load)."""
    if node.kind == "field":
        return [node.name]
    out: list[str] = []
    for a in node.args or []:
        out.extend(expr_fields(a))
    return list(dict.fromkeys(out))


def transform_calls(node: Expr, fn) -> Expr:
    """Depth-first call rewrite: `fn(call_node) -> Expr | None` (None =
    keep).  The hook for materializing relevance value sources —
    termfreq() in the shard actor, docfreq()/idf() constants on the
    driver (Solr's ValueSource tree rewrite)."""
    if node.kind == "call":
        cand = Expr(
            "call", name=node.name, args=[transform_calls(a, fn) for a in node.args or []]
        )
        out = fn(cand)
        return out if out is not None else cand
    return node


def expr_to_src(node: Expr) -> str:
    """Serialize an Expr back to parseable source (driver-side constant
    substitution re-serializes before the scatter, which ships strings)."""
    if node.kind == "lit":
        return repr(float(node.value))
    if node.kind == "str":
        return f"'{node.name}'"
    if node.kind == "field":
        return node.name
    return f"{node.name}({','.join(expr_to_src(a) for a in node.args or [])})"


def evaluate(node: Expr, columns: dict[str, np.ndarray]) -> np.ndarray:
    """Vectorized evaluation over a batch's columns."""
    if node.kind == "lit":
        return np.float64(node.value)
    if node.kind == "str":
        raise ValueError(
            "unresolved string literal — relevance value sources (termfreq/"
            "docfreq/idf) must be materialized before evaluation"
        )
    if node.kind == "field":
        if node.name not in columns:
            raise KeyError(f"unknown field {node.name!r}")
        arr = np.asarray(columns[node.name])
        return arr if arr.dtype.kind in "USO" else arr.astype(np.float64)
    if node.name not in FUNCTIONS:
        raise KeyError(f"unknown function {node.name!r}")
    lo, hi, fn = FUNCTIONS[node.name]
    if not (lo <= len(node.args) <= hi):
        raise ValueError(f"{node.name} expects {lo}..{hi} args, got {len(node.args)}")
    args = [evaluate(a, columns) for a in node.args]
    return fn(*args)
