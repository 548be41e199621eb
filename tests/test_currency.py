"""CurrencyFieldType analog: exact decimal parse, truncating conversion,
FileExchangeRateProvider derived inverses, ValueSource pre-resolution."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_ray.functions.currency import (
    ExchangeRateProvider,
    convert_cents,
    format_currency,
    parse_currency,
    resolve_currency_codes,
)
from lucene_solr_ray.functions.scalar import evaluate, parse_expr


def test_parse_exact_decimal_text():
    c, codes = parse_currency(["12.50,USD", "0.07,EUR", "-3.2,JPY", "41,GBP"])
    assert c.tolist() == [1250, 7, -320, 4100]
    assert codes.tolist() == ["USD", "EUR", "JPY", "GBP"]
    # a value float parsing would get wrong: 0.29 is not representable
    c2, _ = parse_currency(["0.29,USD"])
    assert c2.tolist() == [29]


def test_parse_rejects_bad_inputs():
    with pytest.raises(ValueError):
        parse_currency(["12.505,USD"])  # 3 fraction digits at scale 2
    with pytest.raises(ValueError):
        parse_currency(["12.50"])  # no code


def test_fraction_digits_zero():
    c, codes = parse_currency(["120,JPY", "-3,JPY"], fraction_digits=0)
    assert c.tolist() == [120, -3]
    assert format_currency(c, codes, fraction_digits=0).tolist() == ["120,JPY", "-3,JPY"]


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(-(10**12), 10**12), min_size=1, max_size=40))
def test_format_parse_roundtrip(cents):
    arr = np.asarray(cents, dtype=np.int64)
    codes = np.asarray(["USD", "EUR", "JPY"], dtype=object)[np.abs(arr) % 3]
    back, bcodes = parse_currency(format_currency(arr, codes))
    assert np.array_equal(back, arr)
    assert bcodes.tolist() == codes.tolist()


def test_provider_derived_inverse_and_identity():
    p = ExchangeRateProvider({("EUR", "USD"): 1.08})
    assert p.rate("EUR", "EUR") == 1.0
    assert p.rate("EUR", "USD") == 1.08
    assert p.rate("USD", "EUR") == 1.0 / 1.08  # FileExchangeRateProvider inverse
    with pytest.raises(KeyError):
        p.rate("USD", "CHF")


def test_convert_truncates_like_curencyvalue():
    p = ExchangeRateProvider({("JPY", "USD"): 0.0092, ("EUR", "USD"): 1.08})
    c = np.array([1, 108, -108, 10000], dtype=np.int64)
    codes = np.array(["JPY", "JPY", "JPY", "EUR"], dtype=object)
    out = convert_cents(c, codes, "USD", p)
    # (long)(amount * rate): truncation toward zero, exactly the java cast
    exp = [int(np.trunc(a * (0.0092 if k == "JPY" else 1.08))) for a, k in zip(c, codes)]
    assert out.tolist() == exp
    assert out[0] == 0 and out[2] <= 0


def test_valuesource_preresolution():
    p = ExchangeRateProvider({("EUR", "USD"): 1.08})
    ast = parse_expr("div(currency(price, USD), 100)")
    node = resolve_currency_codes(ast, p, {"price": "EUR"})
    got = evaluate(node, {"price_cents": np.array([1250.0, 99.0])})
    exp = np.trunc(np.array([1250.0, 99.0]) * 1.08) / 100.0
    assert np.array_equal(got, exp)


def test_parse_rejects_malformed_amounts():
    """r5 review: BigDecimal-strict parse — double signs, bare signs,
    empty amounts, and garbage all raise instead of folding to 0/-N."""
    import pytest

    for bad in ["--5,USD", "-,USD", ",USD", "+,USD", "5-,USD", "1.2.3,USD", "abc,USD"]:
        with pytest.raises(ValueError):
            parse_currency([bad])
    # the valid edge shapes still parse exactly
    cents, codes = parse_currency(["+5,USD", ".5,USD", "5.,USD", "-0.01,USD"])
    assert cents.tolist() == [500, 50, 500, -1]
