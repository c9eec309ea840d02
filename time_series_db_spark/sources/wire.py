"""Shared plumbing for the text wire-format parsers.

One lesson, one helper: the three wire parsers filter on their input
column several times (comment/blank/shape guards) before projecting.
Catalyst pushes those predicates through the producing projection by
ALIAS SUBSTITUTION, so when the line column is itself an expensive
expression — a format sink feeding a parse (the roundtrip entries), a
decompress/transform stage, anything but a raw file scan — the upstream
expression is re-inlined once per predicate and once per consuming
projection, and whole-stage codegen's subexpression elimination does
not reach across operator boundaries.  Measured on
``m3_line_protocol_roundtrip`` at sf0.1 (r12 A/B): the format
expression appeared NINE times in the optimized plan, 4.83 s; with the
barrier, once, 3.07 s — a 36% cut with byte-identical output.  On a
plain ``spark.read.text`` input the barrier is cost-neutral (2.47 s vs
2.32 s, within noise): the exploded column is a cheap reference either
way, and a line scan has no pushdown to lose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def isolate_input(lines: DataFrame, column: str) -> DataFrame:
    """Pin ``column`` to ONE evaluation per row via a single-element
    ``explode`` (a ``Generate`` node — predicates cannot be pushed
    through it, so the parsers' guards evaluate a column REFERENCE, not
    a re-inlined copy of whatever produced the line).

    Every OTHER column of the input is carried through unchanged
    (``Generate`` preserves its child's output), so callers may attach
    metadata — file name, ingest timestamp — alongside the line column
    without losing it; the barrier isolates only the line expression.
    """
    rest = [F.col(c) for c in lines.columns if c != column]
    return lines.select(
        F.explode(F.array(F.col(column))).alias(column), *rest
    )
