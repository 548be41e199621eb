"""CurrencyFieldType analog (solr/core/src/java/org/apache/solr/schema/
CurrencyFieldType.java, CurrencyValue.java, FileExchangeRateProvider.java).

A currency value is stored as the string ``"<amount>,<CODE>"`` (e.g.
``"12.50,USD"``); internally it is an exact long of MINOR units (cents)
plus the ISO code — never a float.  Conversion mirrors
``CurrencyValue.convertTo``: a TRUNCATING multiply of the minor-unit long
by the double exchange rate (``(long)(amount * rate)``), which DuckDB
reproduces exactly as ``trunc(CAST(cents AS DOUBLE) * rate)`` — that is
what keeps the `currency_convert` gate strict.

The rate table is the FileExchangeRateProvider contract: rates are
directed (from, to) pairs; a missing direction falls back to the inverse
(1/rate) exactly like ``FileExchangeRateProvider.getExchangeRate``.

`fraction_digits` is the schema-level precision attribute (Solr derives
it from ``java.util.Currency``; here it is an explicit field parameter,
default 2).  Like Solr, conversion does NOT re-scale between currencies
with different fraction digits — minor units in, minor units out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "ExchangeRateProvider",
    "parse_currency",
    "format_currency",
    "convert_cents",
    "resolve_currency_codes",
    "DEFAULT_RATES",
]

# deterministic demo table (the currency.xml analog used by the gate)
DEFAULT_RATES: dict[tuple[str, str], float] = {
    ("EUR", "USD"): 1.08,
    ("JPY", "USD"): 0.0092,
    ("USD", "GBP"): 0.79,
}


class ExchangeRateProvider:
    """FileExchangeRateProvider: directed rates, derived inverses."""

    def __init__(self, rates: dict[tuple[str, str], float] | None = None):
        self._rates = dict(DEFAULT_RATES if rates is None else rates)

    def rate(self, frm: str, to: str) -> float:
        if frm == to:
            return 1.0
        r = self._rates.get((frm, to))
        if r is not None:
            return r
        inv = self._rates.get((to, frm))
        if inv is not None:
            return 1.0 / inv
        raise KeyError(f"no exchange rate {frm}->{to}")


def parse_currency(values, fraction_digits: int = 2):
    """Vectorized ``"amount,CODE"`` → (int64 minor units, code array).

    The amount is parsed as DECIMAL TEXT (BigDecimal.movePointRight in
    CurrencyValue.parse) — digits only, never through a float — so
    ``"12.50"`` is exactly 1250 cents.  Fraction parts longer than
    `fraction_digits` raise, like BigDecimal→longValueExact."""
    s = pd.Series(np.asarray(values, dtype=object), dtype="string")
    amt, _, code = (p := s.str.partition(","))[0], p[1], p[2]
    if (code == "").any():
        raise ValueError("currency value without ',CODE' suffix")
    # BigDecimal-strict: one optional sign, digits with at most one point,
    # at least one digit somewhere — "--5", "-", "" all raise like
    # NumberFormatException (exponent forms are rejected too: stricter
    # than BigDecimal, but no currency source emits them)
    ok = amt.str.fullmatch(r"[+-]?(?:\d+(?:\.\d*)?|\.\d+)")
    if not ok.all():
        bad = amt[~ok.fillna(False)].iloc[0] if len(amt) else ""
        raise ValueError(f"malformed currency amount {bad!r}")
    neg = amt.str.startswith("-")
    amt = amt.str.lstrip("+-")
    whole, _, frac = (q := amt.str.partition("."))[0], q[1], q[2]
    if (frac.str.len() > fraction_digits).any():
        raise ValueError(f"more than {fraction_digits} fraction digits")
    frac = frac.str.pad(fraction_digits, side="right", fillchar="0")
    scale = 10**fraction_digits
    cents = (
        whole.replace("", "0").astype(np.int64) * scale
        + frac.replace("", "0").astype(np.int64)
    )
    cents = np.where(neg.to_numpy(), -cents.to_numpy(), cents.to_numpy()).astype(np.int64)
    return cents, code.to_numpy(dtype=object)


def format_currency(cents, codes, fraction_digits: int = 2):
    """int64 minor units + codes → ``"amount,CODE"`` strings (exact)."""
    cents = np.asarray(cents, dtype=np.int64)
    scale = 10**fraction_digits
    sign = np.where(cents < 0, "-", "")
    a = np.abs(cents)
    whole = (a // scale).astype(str)
    frac = np.char.zfill((a % scale).astype(str), fraction_digits)
    body = (
        np.char.add(np.char.add(whole, "."), frac) if fraction_digits else whole
    )
    return np.char.add(
        np.char.add(np.char.add(sign.astype("U1"), body), ","),
        np.asarray(codes, dtype=str),
    )


def convert_cents(cents, codes, target: str, provider: ExchangeRateProvider):
    """CurrencyValue.convertTo over arrays: per distinct source code one
    rate lookup, then the truncating double multiply → int64 target minor
    units.  trunc(float64 product) is the same IEEE op DuckDB's
    ``trunc(CAST(c AS DOUBLE) * rate)`` performs."""
    cents = np.asarray(cents, dtype=np.int64)
    codes = np.asarray(codes, dtype=object)
    out = np.empty(cents.size, dtype=np.int64)
    for code in pd.unique(codes):
        m = codes == code
        r = provider.rate(str(code), target)
        out[m] = np.trunc(cents[m].astype(np.float64) * r).astype(np.int64)
    return out


def resolve_currency_codes(node, provider: ExchangeRateProvider, source_field_codes: dict):
    """Rewrite ``currency(field, CODE)`` calls in a parsed ValueSource
    expression (the code parses as a bare field node) into
    ``currency(field_cents, <rate literal>)`` so the vectorized evaluator
    needs only numerics — the ChildFieldValueSourceParser-style
    pre-resolution step.  `source_field_codes` maps field → its (single)
    source code for the rate lookup."""
    from .scalar import Expr, transform_calls

    def repl(call):
        if call.name != "currency":
            return None
        fld = call.args[0].name
        target = call.args[1].name if len(call.args) > 1 else "USD"
        rate = provider.rate(source_field_codes[fld], target)
        return Expr(
            "call",
            name="currency",
            args=[Expr("field", name=f"{fld}_cents"), Expr("lit", value=rate)],
        )

    return transform_calls(node, repl)
