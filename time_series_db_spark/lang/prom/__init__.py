"""PromQL front-end (reference: lang/prom/*, SURVEY.md §2.2).

Parser (parser.py) ports the promql.jj grammar; the builder (builder.py)
maps the AST directly onto the operator engine — the reference routes
PromQL through the same M3 pipeline stages (PromSourceBuilderVisitor
.java:155-173 reuses PerSecondRateStage, SumStage, …), and so do we.
Beyond the reference's implemented subset (selectors, rate, increase,
sum/avg/min/max/count by), this front-end also covers the FunctionType
entries the reference leaves as "not yet implemented" — irate, delta,
deriv, changes, resets, *_over_time, the math mappers, clamp family and
the `without` grouping modifier — since they are cheap once the M3QL
operator set exists (SURVEY.md §2.2 closing note).
"""

from time_series_db_spark.lang.prom.parser import parse
from time_series_db_spark.lang.prom.builder import execute

__all__ = ["parse", "execute"]
