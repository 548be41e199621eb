"""ValueSource function-query library: parse + vectorized evaluation."""

import numpy as np
import pytest

from lucene_solr_ray.functions import evaluate, parse_expr

COLS = {
    "x": np.array([1.0, 4.0, 9.0, np.nan]),
    "y": np.array([2.0, 2.0, 2.0, 2.0]),
    "s": np.array(["abc", "abd", "xyz", "abc"], dtype=object),
    "t": np.array(["abc", "abc", "abc", "ab"], dtype=object),
}


def ev(expr):
    return evaluate(parse_expr(expr), COLS)


def test_arith_and_nesting():
    np.testing.assert_allclose(ev("add(x, mul(2, y))")[:3], [5, 8, 13])
    np.testing.assert_allclose(ev("sub(x, y)")[:3], [-1, 2, 7])
    np.testing.assert_allclose(ev("div(x, y)")[:3], [0.5, 2, 4.5])
    np.testing.assert_allclose(ev("sqrt(x)")[:3], [1, 2, 3])
    np.testing.assert_allclose(ev("pow(y, 3)")[:3], [8, 8, 8])


def test_conditionals():
    np.testing.assert_allclose(ev("if(gt(x, 2), 1, 0)")[:3], [0, 1, 1])
    np.testing.assert_allclose(ev("def(x, 0)"), [1, 4, 9, 0])
    np.testing.assert_allclose(ev("exists(x)"), [1, 1, 1, 0])
    np.testing.assert_allclose(ev("and(gt(x,1), lt(x,9))")[:3], [0, 1, 0])


def test_solr_specials():
    np.testing.assert_allclose(ev("recip(x, 1, 2, 1)")[:3], [1.0, 0.4, 0.2])
    np.testing.assert_allclose(ev("linear(x, 2, 1)")[:3], [3, 9, 19])
    np.testing.assert_allclose(ev("scale(y, 0, 1)"), [0, 0, 0, 0])
    s = ev("scale(x, 0, 10)")
    assert np.nanmin(s) == 0.0


def test_minmax_variadic():
    np.testing.assert_allclose(ev("max(x, y, 3)")[:3], [3, 4, 9])
    np.testing.assert_allclose(ev("min(x, y)")[:3], [1, 2, 2])


def test_distance():
    np.testing.assert_allclose(ev("sqedist(x, y)")[:3], [1, 4, 49])
    np.testing.assert_allclose(ev("dist(2, x, y)")[:3], [1, 2, 7])


def test_strdist():
    out = ev("strdist(s, t)")
    np.testing.assert_allclose(out, [1.0, 1 - 1 / 3, 0.0, 1 - 1 / 3])


def test_parse_errors():
    with pytest.raises(KeyError):
        ev("nosuchfn(x)")
    with pytest.raises(KeyError):
        ev("nosuchfield")
    with pytest.raises(ValueError):
        ev("div(x)")


def test_literals_and_field_syntax():
    np.testing.assert_allclose(ev("add(1.5e1, field(y))")[:1], [17.0])
