"""Lossless-dtype sweep over every registered DuckDB oracle.

The driver fetches oracle results through pandas; some DuckDB logical
types degrade on that conversion and silently red the value-hash while
rows/schema still pass:

- ``HUGEINT``/``UHUGEINT`` -> float64 (DuckDB ``sum(BIGINT)`` widens to
  HUGEINT; bit-packed 2^63-magnitude hashes lose low bits).  Burned
  three entries in round 5 and ``mm_image_ahash`` in round 7.
- ``DECIMAL(p>18)`` -> object/float (loses exactness past 18 digits).

This sweep runs every oracle at sf0.001 (DuckDB only — no Spark, so it
is cheap) and asserts no output column carries a lossy logical type.
Any new oracle that reintroduces the class fails registration here, at
authoring time, instead of redding a driver round.
"""

from __future__ import annotations

import re

import pytest

#: DuckDB logical types whose pandas fetch is lossy for int64-magnitude
#: or high-precision values.  Keep in sync with the docstring above.
_LOSSY = re.compile(r"^(U?HUGEINT)$")
_DECIMAL = re.compile(r"^DECIMAL\((\d+),\s*(\d+)\)$")


def _oracle_names():
    from time_series_db_spark.catalog import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_fetches_lossless(name, duck):
    from time_series_db_spark.catalog import ORACLES

    rel = duck.sql(ORACLES[name])
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        t = str(typ)
        m = _DECIMAL.match(t)
        if _LOSSY.match(t) or (m and int(m.group(1)) > 18):
            bad.append((col, t))
    assert not bad, (
        f"{name}: oracle column(s) {bad} fetch lossily through pandas "
        f"(HUGEINT->float64 / wide DECIMAL). Cast in the oracle SQL, "
        f"e.g. sum(...)::BIGINT — see tests/test_oracle_dtypes.py."
    )
    # NO DECIMAL output columns at all, lossy or not: the Spark side
    # emits DOUBLE, and a bare SQL literal (1.0 binds DECIMAL(2,1))
    # makes the oracle's column type diverge — invisible to the
    # driver's pandas fetch but a real engine-type mismatch (r10 found
    # m3_is_non_null and promql_absent this way). Always ::DOUBLE.
    decs = [
        (c, str(ty)) for c, ty in zip(rel.columns, rel.types)
        if _DECIMAL.match(str(ty))
    ]
    assert not decs, (
        f"{name}: oracle column(s) {decs} are DECIMAL-typed — a bare "
        f"SQL literal is binding DECIMAL where Spark emits DOUBLE; "
        f"cast it (1.0::DOUBLE)."
    )
