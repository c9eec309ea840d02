"""M3QL front-end: parser → AST transforms → logical plan → DataFrame.

A faithful re-implementation of the reference's M3QL pipeline language
(grammar: lang/m3/m3ql/parser/m3ql.jj; AST transforms:
parser/transform/*.java; planner: plan/M3ASTConverter.java +
M3PlanNodeFactory.java), validated line-for-line against the
reference's own 27 golden parser/planner test cases
(src/test/resources/.../lang/m3/data/{queries,ast,plan}).

The back-end (builder.py) emits SeriesFrame operator calls instead of
OpenSearch DSL — Catalyst replaces the unfold/coordinator split
(SURVEY.md §3.1 lifecycle mapping).
"""

from time_series_db_spark.lang.m3.parser import parse  # noqa: F401
from time_series_db_spark.lang.m3.plan import build_plan  # noqa: F401
