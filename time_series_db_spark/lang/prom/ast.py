"""PromQL AST nodes — ports parser/nodes/*.java (9 classes).

``dump()`` reproduces the reference's golden AST format (class name per
line, two-space indent per depth — see
src/test/resources/org/opensearch/tsdb/lang/prom/data/ast/*.txt), so the
8 golden cases compare byte-for-byte in tests/test_promql_golden.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class PromParseError(ValueError):
    pass


@dataclass
class PromNode:
    children: list["PromNode"] = field(default_factory=list)

    def dump(self, depth: int = 0) -> str:
        lines = ["  " * depth + type(self).__name__]
        for c in self.children:
            lines.append(c.dump(depth + 1))
        return "\n".join(lines)


@dataclass
class RootNode(PromNode):
    pass


#: matcher types — MatcherType.java
EQUAL = "="
NOT_EQUAL = "!="
REGEX_MATCH = "=~"
REGEX_NOT_MATCH = "!~"


@dataclass
class LabelMatcherNode(PromNode):
    """k <op> "v" — LabelMatcherNode.java (not part of the dump tree)."""

    name: str = ""
    op: str = EQUAL
    value: str = ""


@dataclass
class VectorSelectorNode(PromNode):
    """Common selector base — VectorSelectorNode.java. ``offset_ms``
    carries the PromQL ``offset`` modifier and ``at`` the ``@`` modifier
    (both beyond the reference grammar, which parses no modifiers):
    ``at`` is an epoch-ms int, or the sentinel strings ``"start"`` /
    ``"end"`` for ``@ start()`` / ``@ end()``."""

    metric: str | None = None
    matchers: list[LabelMatcherNode] = field(default_factory=list)
    offset_ms: int = 0
    at: int | str | None = None


@dataclass
class InstantVectorSelectorNode(VectorSelectorNode):
    pass


@dataclass
class RangeVectorSelectorNode(VectorSelectorNode):
    """selector[5m] — RangeVectorSelectorNode.java."""

    range_ms: int = 0


@dataclass
class SubqueryNode(PromNode):
    """expr[range:step] — PromQL subquery (beyond the reference grammar,
    which has neither operators nor subqueries): evaluate the inner
    expression at ``step_ms`` resolution over the trailing ``range_ms``
    window, producing a range vector any range function can consume.
    ``step_ms=0`` means the query's own step (Prometheus's default
    evaluation-interval rule); ``offset_ms`` shifts the whole window.
    children = [inner expr]."""

    range_ms: int = 0
    step_ms: int = 0
    offset_ms: int = 0


@dataclass
class FunctionCallNode(PromNode):
    """fn(expr) — FunctionCallNode.java; argument is children[0]."""

    name: str = ""
    #: scalar arguments (φ for quantile, bounds for clamp/round)
    scalars: list[float] = field(default_factory=list)
    #: string arguments (label_replace/label_join dst, patterns, sep)
    strings: list[str] = field(default_factory=list)


@dataclass
class AggregationNode(PromNode):
    """aggr [by|without (labels)] (expr) — AggregationNode.java."""

    agg_type: str = ""
    modifier: str | None = None  # "by" | "without" | None — GroupingModifier.java
    labels: list[str] = field(default_factory=list)
    #: leading scalar parameter — k for topk/bottomk, φ for quantile
    param: float | None = None
    #: leading string parameter — dst label for count_values
    str_param: str | None = None


@dataclass
class NumberLiteralNode(PromNode):
    """Bare scalar literal in an expression position (``v * 2``)."""

    value: float = 0.0


@dataclass
class BinaryExprNode(PromNode):
    """lhs op rhs — the full PromQL binary-operator surface, entirely
    beyond the reference (promql.jj:140 Expression has no operators at
    all). children = [lhs, rhs]; literal operands are
    :class:`NumberLiteralNode`.

    ``matching``/``match_labels`` carry ``on(...)`` / ``ignoring(...)``;
    ``group`` carries group_left/group_right and ``group_labels`` its
    include list — the labels PromQL copies from the "one" side into
    the many-to-one result."""

    op: str = ""
    bool_modifier: bool = False
    matching: str | None = None  # "on" | "ignoring" | None
    match_labels: list[str] = field(default_factory=list)
    group: str | None = None  # "group_left" | "group_right" | None
    group_labels: list[str] = field(default_factory=list)


#: duration unit table — promql.jj parseDuration (ms s m h d w y)
_UNITS_MS = {
    "ms": 1,
    "s": 1000,
    "m": 60_000,
    "h": 3_600_000,
    "d": 86_400_000,
    "w": 604_800_000,
    "y": 31_536_000_000,
}


def parse_duration_ms(text: str) -> int:
    import re

    m = re.fullmatch(r"(\d+)([a-zA-Z]+)", text)
    if not m or m.group(2) not in _UNITS_MS:
        raise PromParseError(f"invalid duration: {text!r}")
    return int(m.group(1)) * _UNITS_MS[m.group(2)]
