"""PromQL parser parity against the reference's golden corpus.

The reference ships 8 PromQL queries with expected AST dumps
(src/test/resources/org/opensearch/tsdb/lang/prom/data/) — byte-for-byte
comparison, SURVEY.md §5 layer 2 for the Prom front-end.
"""

from __future__ import annotations

import pathlib

import pytest

DATA = pathlib.Path(
    "/root/reference/src/test/resources/org/opensearch/tsdb/lang/prom/data"
)

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference golden corpus not available"
)


def _cases() -> list[str]:
    if not DATA.exists():
        return []
    return sorted(
        (p.stem for p in (DATA / "queries").glob("*.promql")),
        key=lambda s: int(s),
    )


@pytest.mark.parametrize("case", _cases())
def test_ast_golden(case: str) -> None:
    from time_series_db_spark.lang.prom.parser import parse

    query = (DATA / "queries" / f"{case}.promql").read_text()
    expected = (DATA / "ast" / f"{case}.txt").read_text()
    root = parse(query)
    assert root.dump() + "\n" == expected, f"AST mismatch for case {case}"


def test_scalar_args_and_without() -> None:
    """Extensions beyond the reference grammar: scalar fn args and the
    `without` modifier parse into the expected shapes."""
    from time_series_db_spark.lang.prom import ast as A
    from time_series_db_spark.lang.prom.parser import parse

    root = parse('quantile_over_time(0.9, up{job="x"}[5m])')
    fn = root.children[0]
    assert isinstance(fn, A.FunctionCallNode)
    assert fn.scalars == [0.9]
    assert isinstance(fn.children[0], A.RangeVectorSelectorNode)
    assert fn.children[0].range_ms == 300_000

    root = parse("sum without (instance) (up)")
    agg = root.children[0]
    assert isinstance(agg, A.AggregationNode)
    assert agg.modifier == "without"
    assert agg.labels == ["instance"]
