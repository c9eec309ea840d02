"""PromQL parser unit tests for the binary-operator extension.

The reference grammar (promql.jj:140) has no operator productions, so
these pin OUR precedence/associativity choices to the published
Prometheus operator table.
"""

from __future__ import annotations

import pytest

from time_series_db_spark.lang.prom import ast as A
from time_series_db_spark.lang.prom.parser import parse


def _expr(q: str) -> A.PromNode:
    return parse(q).children[0]


def _shape(node: A.PromNode) -> str:
    """Compact s-expression of the tree for precedence assertions."""
    if isinstance(node, A.BinaryExprNode):
        l, r = node.children
        mods = ""
        if node.bool_modifier:
            mods += " bool"
        if node.matching:
            mods += f" {node.matching}({','.join(node.match_labels)})"
        if node.group:
            mods += f" {node.group}"
        return f"({_shape(l)} {node.op}{mods} {_shape(r)})"
    if isinstance(node, A.NumberLiteralNode):
        v = node.value
        return str(int(v)) if v == int(v) else str(v)
    if isinstance(node, A.AggregationNode):
        return f"{node.agg_type}[{_shape(node.children[0])}]"
    if isinstance(node, A.FunctionCallNode):
        return f"{node.name}[{_shape(node.children[0])}]"
    if isinstance(node, A.VectorSelectorNode):
        return node.metric or "{}"
    return type(node).__name__


def test_mul_binds_over_add():
    assert _shape(_expr("a + b * c")) == "(a + (b * c))"
    assert _shape(_expr("a * b + c")) == "((a * b) + c)"


def test_left_associativity():
    assert _shape(_expr("a / b / c")) == "((a / b) / c)"
    assert _shape(_expr("a - b - c")) == "((a - b) - c)"


def test_pow_right_associative_and_tightest():
    assert _shape(_expr("2 ^ 3 ^ 2")) == "(2 ^ (3 ^ 2))"
    assert _shape(_expr("a * b ^ c")) == "(a * (b ^ c))"


def test_comparison_below_arithmetic():
    assert _shape(_expr("a + b > c * 2")) == "((a + b) > (c * 2))"


def test_set_ops_loosest_or_below_and():
    assert _shape(_expr("a and b or c")) == "((a and b) or c)"
    assert _shape(_expr("a or b unless c")) == "(a or (b unless c))"


def test_parens_override():
    assert _shape(_expr("(a + b) * c")) == "((a + b) * c)"
    assert _shape(_expr("a + (b or c)")) == "(a + (b or c))"


def test_bool_and_matching_modifiers():
    assert _shape(_expr("a > bool 1")) == "(a > bool 1)"
    assert _shape(_expr("a / on(region) b")) == "(a / on(region) b)"
    assert (
        _shape(_expr("a / ignoring(shard) group_left b"))
        == "(a / ignoring(shard) group_left b)"
    )
    assert _shape(_expr("a / on() group_left sum(b)")) == "(a / on() group_left sum[b])"


def test_offset_modifier_parses():
    sel = _expr("a offset 1h")
    assert isinstance(sel, A.InstantVectorSelectorNode)
    assert sel.offset_ms == 3_600_000
    rng = _expr("rate(a[5m] offset 1d)").children[0]
    assert isinstance(rng, A.RangeVectorSelectorNode)
    assert rng.range_ms == 300_000 and rng.offset_ms == 86_400_000


def test_negative_literal():
    assert _shape(_expr("a * -2")) == "(a * -2)"


def test_string_args_collected():
    fn = _expr('label_replace(a, "dc", "$1", "region", "r(.*)")')
    assert isinstance(fn, A.FunctionCallNode)
    assert fn.strings == ["dc", "$1", "region", "r(.*)"]


def test_aggregation_operand():
    assert (
        _shape(_expr("sum(a) / sum by (x) (b)")) == "(sum[a] / sum[b])"
    )


def test_unclosed_paren_raises():
    with pytest.raises(A.PromParseError):
        parse("(a + b")


def test_group_modifier_include_labels_carried():
    node = _expr("a * on(inst) group_left(role, zone) b")
    assert node.group == "group_left"
    assert node.group_labels == ["role", "zone"]
    node = _expr("a / ignoring(x) group_right(owner) b")
    assert node.group == "group_right"
    assert node.group_labels == ["owner"]
    node = _expr("a * on(inst) group_left b")
    assert node.group_labels == []


def test_string_escape_sequences():
    """PromQL strings follow Go strconv.Unquote: \\n is a newline, not
    the letter n; \\xHH / \\uXXXX are code points."""
    from time_series_db_spark.lang.prom.parser import unquote_string

    assert unquote_string(r'"a\nb"') == "a\nb"
    assert unquote_string(r'"tab\there"') == "tab\there"
    assert unquote_string(r'"q\"q"') == 'q"q'
    assert unquote_string(r'"back\\slash"') == "back\\slash"
    assert unquote_string(r'"\x41B"') == "AB"
    assert unquote_string(r'"\101"') == "A"  # octal
    fn = _expr(r'label_join(a, "dst", "\n", "x")')
    assert fn.strings == ["dst", "\n", "x"]


def test_keywords_fold_case_like_prometheus():
    """Prometheus's lexer lowercases words before keyword lookup
    (lexer.go lexKeywordOrIdentifier) and the reference grammar's
    aggregation lookahead does the same (promql.jj:148), so AND/OR and
    modifiers in any case are operators, not metric names."""
    node = _expr("a AND b")
    assert isinstance(node, A.BinaryExprNode) and node.op == "and"
    node = _expr("a * ON(inst) GROUP_LEFT(role) b")
    assert node.matching == "on" and node.group == "group_left"
    assert node.group_labels == ["role"]


def test_number_literals_scientific_inf_nan():
    """Prometheus number literals: exponents, leading-dot, Inf/NaN —
    previously 1e3 lexed as NUMBER(1) + metric e3 and silently queried
    the wrong series."""
    from time_series_db_spark.lang.prom.parser import parse

    n = parse("histogram_fraction(0, 1e3, h)").children[0]
    assert n.scalars == [0.0, 1000.0] and len(n.children) == 1

    n = parse("clamp(v, -1.5e-1, .5)").children[0]
    assert n.scalars == [-0.15, 0.5]

    n = parse("histogram_fraction(-Inf, Inf, h)").children[0]
    assert n.scalars[0] == float("-inf") and n.scalars[1] == float("inf")


def test_unary_minus_binds_looser_than_pow():
    """Upstream PromQL declares unary below %right POW
    (promql/parser/generated_parser.y), so `-a ^ b` is `-(a ^ b)` and
    `-1 ^ 2` evaluates to -1 — previously both negated the atom first."""
    from time_series_db_spark.lang.prom.parser import parse

    def _expr(q):
        return parse(q).children[0]

    # -1 ^ 2 => 0 - (1 ^ 2)
    node = _expr("-1 ^ 2")
    assert isinstance(node, A.BinaryExprNode) and node.op == "-"
    assert node.children[0].value == 0.0
    assert node.children[1].op == "^"

    # -a ^ 2 * b => (0 - (a ^ 2)) * b — unary still binds tighter than *
    node = _expr("-a ^ 2 * b")
    assert node.op == "*"
    neg = node.children[0]
    assert neg.op == "-" and neg.children[0].value == 0.0
    assert neg.children[1].op == "^"

    # -a * b unchanged: (0 - a) * b
    node = _expr("-a * b")
    assert node.op == "*" and node.children[0].op == "-"

    # plain folded literal still a NumberLiteral (function args need it)
    lit = _expr("-1.5")
    assert isinstance(lit, A.NumberLiteralNode) and lit.value == -1.5


_FMT_CASES = [
    'sum by (x) (rate(error{a="b"}[5m] offset 1m)) + topk(2, click)',
    "error > bool 0.5 + 1",
    "quantile_over_time(0.9, error[1h])",
    "histogram_fraction(-Inf, 0.5, error)",
    "clamp(error, -1, 1.5)",
    'label_replace(error, "dst", "$1", "region", "(.*)")',
    'label_join(error, "d", "-", "a", "b")',
    "error / on(region) group_left(extra) nation_total",
    "error[5m:1m] offset 2m",
    "avg_over_time((rate(error[5m]))[30m:5m])",
    "error @ 1700000000.000",
    "error @ start()",
    'count_values("v", error)',
    "time()",
    "vector(0.5)",
    "round(error, 0.5)",
    "holt_winters(error[1h], 0.3, 0.1)",
    "predict_linear(error[30m], 600)",
    'sort_by_label(error, "region")',
    "-error",
    "error unless on(region) click",
    'error{a!="x", b=~"y.*"}',
    '{__name__="error"}',
    "limitk(2, error)",
    "quantile(0.5, error)",
    "error atan2 click",
    "sum without (region) (error) ^ 2",
]


def test_format_query_round_trips():
    """format(x) re-parses to the SAME tree and is idempotent — across
    selectors, modifiers, subqueries, every argument-order family
    (leading scalars, trailing scalars, strings), and set/vector
    matching."""
    from time_series_db_spark.lang.prom.fmt import format_query
    from time_series_db_spark.lang.prom.parser import parse

    for case in _FMT_CASES:
        formatted = format_query(case)
        assert parse(formatted) == parse(case), case
        assert format_query(formatted) == formatted, case


def test_parse_and_format_service_endpoints():
    from time_series_db_spark.service import prom_format_query, prom_parse_query

    ok = prom_format_query("rate(error[5m])")
    assert ok == {"status": "success", "data": "rate(error[5m])"}
    bad = prom_format_query("rate(error[5m]")
    assert bad["status"] == "error" and bad["errorType"] == "bad_data"

    ast = prom_parse_query("sum by (region) (error)")
    assert ast["status"] == "success"
    assert ast["data"]["type"] == "Aggregation"
    assert ast["data"]["agg_type"] == "sum"
    assert ast["data"]["children"][0]["type"] == "InstantVectorSelector"
    assert prom_parse_query("{{")["status"] == "error"
