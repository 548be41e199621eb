"""DateMathParser (functions/datemath.py): rounding, calendar-clamped
month arithmetic, aliases, chained ops, error cases — vectors per
solr/core/.../util/DateMathParser.java semantics."""

from datetime import datetime

import pytest

from lucene_solr_ray.functions.datemath import parse_date_math

NOW = "2024-02-20T10:30:45.123456Z"


def test_rounding_units():
    assert parse_date_math("NOW/YEAR", NOW) == datetime(2024, 1, 1)
    assert parse_date_math("NOW/MONTH", NOW) == datetime(2024, 2, 1)
    assert parse_date_math("NOW/DAY", NOW) == datetime(2024, 2, 20)
    assert parse_date_math("NOW/DATE", NOW) == datetime(2024, 2, 20)  # alias
    assert parse_date_math("NOW/HOUR", NOW) == datetime(2024, 2, 20, 10)
    assert parse_date_math("NOW/MINUTE", NOW) == datetime(2024, 2, 20, 10, 30)
    assert parse_date_math("NOW/SECOND", NOW) == datetime(2024, 2, 20, 10, 30, 45)
    assert parse_date_math("NOW/MILLI", NOW) == datetime(2024, 2, 20, 10, 30, 45, 123000)


def test_calendar_clamped_month_arithmetic():
    # Jan 31 + 1 MONTH clamps to Feb 29 (leap year) — Calendar.add semantics
    assert parse_date_math("2024-01-31T00:00:00Z+1MONTH") == datetime(2024, 2, 29)
    assert parse_date_math("2023-01-31T00:00:00Z+1MONTH") == datetime(2023, 2, 28)
    assert parse_date_math("2024-03-31T00:00:00Z-1MONTH") == datetime(2024, 2, 29)
    assert parse_date_math("2024-02-29T00:00:00Z+1YEAR") == datetime(2025, 2, 28)
    # month wrap across year boundaries
    assert parse_date_math("2024-11-15T00:00:00Z+3MONTHS") == datetime(2025, 2, 15)
    assert parse_date_math("2024-02-15T00:00:00Z-3MONTHS") == datetime(2023, 11, 15)


def test_chained_expressions():
    assert parse_date_math("NOW/MONTH-1MONTH", NOW) == datetime(2024, 1, 1)
    assert parse_date_math("NOW/MONTH+1MONTH", NOW) == datetime(2024, 3, 1)
    assert parse_date_math("2024-03-05T10:30:00Z/DAY+6MONTHS-3DAYS") == datetime(2024, 9, 2)
    assert parse_date_math("NOW/HOUR+30MINUTES", NOW) == datetime(2024, 2, 20, 10, 30)
    assert parse_date_math("NOW+2DAYS/DAY", NOW) == datetime(2024, 2, 22)


def test_bare_dates_and_aliases():
    assert parse_date_math("2024-06-01") == datetime(2024, 6, 1)
    assert parse_date_math("2024-06-01+36HOURS") == datetime(2024, 6, 2, 12)
    assert parse_date_math("NOW+90SECS/MINUTE", NOW) == datetime(2024, 2, 20, 10, 32)
    assert parse_date_math("NOW+500MILLIS/SECOND", NOW) == datetime(2024, 2, 20, 10, 30, 45)


def test_twin_equivalence_duckdb():
    """The gate's premise: DuckDB date_trunc + INTERVAL month arithmetic
    lands on the SAME instants as the parser (incl. the clamp)."""
    import duckdb

    pairs = [
        ("NOW/MONTH-1MONTH", "date_trunc('month', TIMESTAMP '2024-02-20 10:30:45') - INTERVAL 1 MONTH"),
        ("NOW/MONTH+1MONTH", "date_trunc('month', TIMESTAMP '2024-02-20 10:30:45') + INTERVAL 1 MONTH"),
        ("2024-01-31T00:00:00Z+1MONTH", "TIMESTAMP '2024-01-31' + INTERVAL 1 MONTH"),
        ("2024-03-31T00:00:00Z-1MONTH", "TIMESTAMP '2024-03-31' - INTERVAL 1 MONTH"),
    ]
    for expr, sql in pairs:
        got = parse_date_math(expr, NOW)
        exp = duckdb.sql(f"SELECT {sql}").fetchone()[0]
        assert got == exp, expr


def test_errors():
    for bad in ["NOW/FORTNIGHT", "NOW+3LIGHTYEARS", "NOW//DAY", "notadate/DAY", "NOW+x"]:
        with pytest.raises(ValueError):
            parse_date_math(bad, NOW)
