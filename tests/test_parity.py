"""Differential gate mirror: every catalog query vs its DuckDB oracle.

This reproduces the driver's CORRECTNESS check locally (row count, schema
column names, order-insensitive value comparison) so operator regressions
surface before a round ends — SURVEY.md §5 layer 4 (the reference's
pushdown-on-vs-off differential suite plays the same role).
"""

from __future__ import annotations

import math

import pytest


def _canon(rows, cols):
    """Sort columns by name, rows by repr — order-insensitive compare."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 4)  # final guard; sides already quantized
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return [c for c in sorted(cols)], out


def _query_names():
    from time_series_db_spark.catalog import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    return sorted(ORACLES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from time_series_db_spark.catalog import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    ores = duck.execute(ORACLES[name])
    ocols = [d[0].lower() for d in ores.description]
    orows = [tuple(r) for r in ores.fetchall()]

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"

    sc, sdata = _canon(srows, scols)
    oc, odata = _canon(orows, ocols)
    mismatches = [
        (a, b) for a, b in zip(sdata, odata) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"
