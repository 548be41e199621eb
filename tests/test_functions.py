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


def test_geodist_haversine():
    """geodist/hsin: great-circle km vs a scalar-math reference and a
    known city-pair distance (Paris-London ~343.5 km)."""
    import math

    import numpy as np

    from lucene_solr_ray.functions.scalar import EARTH_MEAN_RADIUS_KM, FUNCTIONS

    geodist = FUNCTIONS["geodist"][2]
    hsin = FUNCTIONS["hsin"][2]
    lat1, lon1 = np.array([48.8566, 0.0]), np.array([2.3522, 0.0])
    lat2, lon2 = np.array([51.5074, 0.0]), np.array([-0.1278, 0.0])
    d = geodist(lat1, lon1, lat2, lon2)
    assert abs(d[0] - 343.5) < 1.0, d[0]  # Paris → London
    assert d[1] == 0.0
    # scalar-math reference, element-wise
    for i in range(2):
        p1, l1, p2, l2 = (math.radians(float(x[i])) for x in (lat1, lon1, lat2, lon2))
        h = math.sin((p2 - p1) / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin((l2 - l1) / 2) ** 2
        ref = 2 * EARTH_MEAN_RADIUS_KM * math.asin(math.sqrt(h))
        assert d[i] == pytest.approx(ref, rel=1e-12)
    # hsin with an explicit radius: same formula scaled
    d2 = hsin(np.array([1.0]), lat1[:1], lon1[:1], lat2[:1], lon2[:1])
    assert d2[0] == pytest.approx(d[0] / EARTH_MEAN_RADIUS_KM, rel=1e-12)


def test_geodist_through_expression_parser():
    import numpy as np

    from lucene_solr_ray.functions.scalar import evaluate, parse_expr

    node = parse_expr("geodist(lat, lon, 48.8566, 2.3522)")
    out = evaluate(node, {"lat": np.array([48.8566]), "lon": np.array([2.3522])})
    assert out[0] == 0.0


def test_hugeint_to_double_matches_duckdb():
    """pipelines.common.hugeint_to_double == DuckDB CAST(HUGEINT AS DOUBLE)
    bit-exactly across magnitude bands and signs (the non-correctly-rounded
    hi/lo recombination the SQL twins actually execute)."""
    import random

    import duckdb

    from lucene_solr_ray.pipelines.common import hugeint_to_double

    rng = random.Random(31337)
    con = duckdb.connect()
    cases = [0, 1, -1, 5, -5, (1 << 63) - 1, -(1 << 63), (1 << 64) - 1,
             1 << 64, -(1 << 64), 22240711483861231690]
    for _ in range(400):
        mag = rng.choice(
            [rng.randint(0, 1 << 53), rng.randint(1 << 53, 1 << 63),
             rng.randint(1 << 63, 1 << 64), rng.randint(1 << 64, 1 << 100),
             rng.randint(1 << 100, (1 << 126))]
        )
        cases.append(mag * rng.choice([1, -1]))
    for v in cases:
        exp = con.execute(f"SELECT CAST(CAST({v} AS HUGEINT) AS DOUBLE)").fetchone()[0]
        assert hugeint_to_double(v) == exp, v
