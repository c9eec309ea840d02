"""Golden parser/planner parity against the reference's own test corpus.

The reference ships 27 M3QL queries with expected AST dumps and logical
plan dumps (src/test/resources/org/opensearch/tsdb/lang/m3/data/).
These tests run our parser/planner over the same inputs and compare
byte-for-byte — SURVEY.md §5 layer 2 ported verbatim.
"""

from __future__ import annotations

import pathlib

import pytest

DATA = pathlib.Path(
    "/root/reference/src/test/resources/org/opensearch/tsdb/lang/m3/data"
)

pytestmark = pytest.mark.skipif(
    not DATA.exists(), reason="reference golden corpus not available"
)


def _cases() -> list[str]:
    if not DATA.exists():
        return []
    return sorted(
        (p.stem for p in (DATA / "queries").glob("*.m3ql")), key=lambda s: int(s)
    )


@pytest.mark.parametrize("case", _cases())
def test_ast_golden(case: str) -> None:
    from time_series_db_spark.lang.m3.parser import parse

    query = (DATA / "queries" / f"{case}.m3ql").read_text()
    expected = (DATA / "ast" / f"{case}.txt").read_text()
    root = parse(query, expand_macros=True)
    assert root.dump() + "\n" == expected, f"AST mismatch for case {case}"


@pytest.mark.parametrize("case", _cases())
def test_plan_golden(case: str) -> None:
    from time_series_db_spark.lang.m3.parser import parse
    from time_series_db_spark.lang.m3.plan import build_plan

    query = (DATA / "queries" / f"{case}.m3ql").read_text()
    expected = (DATA / "plan" / f"{case}.txt").read_text()
    plan = build_plan(parse(query, expand_macros=True))
    assert plan.dump() + "\n" == expected, f"plan mismatch for case {case}"
