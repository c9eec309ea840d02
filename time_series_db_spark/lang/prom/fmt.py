"""Canonical PromQL pretty-printer — the ``/api/v1/format_query`` and
``/api/v1/parse_query`` service surface (Prometheus 3 endpoints; the
reference's grammar, promql.jj, has no printer at all).

``format_node`` renders any parsed AST back to PromQL text such that
re-parsing yields a STRUCTURALLY IDENTICAL tree, and formatting is
idempotent (``format(parse(format(x))) == format(x)``) — the property
test sweeps the grammar-fuzz corpus.  Binary operands are fully
parenthesized (parentheses are transparent to the parser), so the
printer never needs precedence reasoning.
"""

from __future__ import annotations

import math

from time_series_db_spark.lang.prom import ast as A

#: functions whose leading arguments are scalars (everything else takes
#: the vector first: clamp(v, lo, hi), round(v, to), label_replace(v, …))
_LEADING_SCALARS = {
    "quantile_over_time": 1,
    "histogram_quantile": 1,
    "histogram_fraction": 2,
}

_UNITS_DESC = [
    ("y", 31_536_000_000),
    ("w", 604_800_000),
    ("d", 86_400_000),
    ("h", 3_600_000),
    ("m", 60_000),
    ("s", 1000),
    ("ms", 1),
]


def _dur(ms: int) -> str:
    """Canonical compound duration (Prometheus style): 5400000 → 1h30m."""
    if ms <= 0:
        return "0s"
    parts = []
    rest = int(ms)
    for unit, width in _UNITS_DESC:
        if rest >= width:
            parts.append(f"{rest // width}{unit}")
            rest %= width
    return "".join(parts)


def _num(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Inf" if v > 0 else "-Inf"
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _quote(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"').replace(
        "\n", "\\n"
    ) + '"'


def _modifiers(node: A.VectorSelectorNode) -> str:
    out = ""
    if node.offset_ms:
        out += f" offset {_dur(node.offset_ms)}"
    if node.at is not None:
        if node.at in ("start", "end"):
            out += f" @ {node.at}()"
        else:
            out += f" @ {int(node.at) / 1000:.3f}"
    return out


def _selector(node: A.VectorSelectorNode) -> str:
    base = node.metric or ""
    if node.matchers:
        base += (
            "{"
            + ", ".join(
                f"{m.name}{m.op}{_quote(m.value)}" for m in node.matchers
            )
            + "}"
        )
    elif not node.metric:
        base += "{}"
    return base


def format_node(node: A.PromNode) -> str:
    if isinstance(node, A.RootNode):
        return format_node(node.children[0])
    if isinstance(node, A.RangeVectorSelectorNode):
        return (
            _selector(node) + f"[{_dur(node.range_ms)}]" + _modifiers(node)
        )
    if isinstance(node, A.InstantVectorSelectorNode):
        return _selector(node) + _modifiers(node)
    if isinstance(node, A.SubqueryNode):
        step = _dur(node.step_ms) if node.step_ms else ""
        out = (
            f"({format_node(node.children[0])})"
            f"[{_dur(node.range_ms)}:{step}]"
        )
        if node.offset_ms:
            out += f" offset {_dur(node.offset_ms)}"
        return out
    if isinstance(node, A.NumberLiteralNode):
        return _num(node.value)
    if isinstance(node, A.FunctionCallNode):
        lead = _LEADING_SCALARS.get(node.name, 0)
        args = [_num(s) for s in node.scalars[:lead]]
        args += [format_node(c) for c in node.children]
        args += [_num(s) for s in node.scalars[lead:]]
        args += [_quote(s) for s in node.strings]
        return f"{node.name}({', '.join(args)})"
    if isinstance(node, A.AggregationNode):
        head = node.agg_type
        if node.modifier:
            head += f" {node.modifier} ({', '.join(node.labels)})"
        args = []
        if node.str_param is not None:
            args.append(_quote(node.str_param))
        elif node.param is not None:
            args.append(_num(node.param))
        args.append(format_node(node.children[0]))
        return f"{head}({', '.join(args)})"
    if isinstance(node, A.BinaryExprNode):
        op = node.op
        if node.bool_modifier:
            op += " bool"
        if node.matching:
            op += f" {node.matching}({', '.join(node.match_labels)})"
        if node.group:
            op += f" {node.group}({', '.join(node.group_labels)})"
        l, r = node.children
        return f"({format_node(l)}) {op} ({format_node(r)})"
    raise TypeError(f"unknown PromQL node {type(node).__name__}")


def format_query(text: str) -> str:
    """Parse and canonically re-print a PromQL expression."""
    from time_series_db_spark.lang.prom.parser import parse

    return format_node(parse(text))


def ast_to_dict(node: A.PromNode) -> dict:
    """JSON-able AST (the ``parse_query`` payload): node type (without
    the ``Node`` suffix), its scalar fields, and recursive children."""
    import dataclasses

    out: dict = {"type": type(node).__name__.removesuffix("Node")}
    for f in dataclasses.fields(node):
        if f.name == "children":
            continue
        v = getattr(node, f.name)
        # drop only genuinely-absent fields: None, empty containers, and
        # an unset bool flag.  Numeric zero is MEANINGFUL (``topk(0, v)``,
        # ``quantile(0, v)``, ``offset 0``) and must survive into the
        # JSON AST — ``v in (None, 0, ...)`` would drop it (0 == False).
        if v is None or v == [] or v == "" or v is False:
            continue
        if f.name == "matchers":
            out["matchers"] = [
                {"name": m.name, "op": m.op, "value": m.value} for m in v
            ]
        else:
            out[f.name] = v
    if node.children:
        out["children"] = [ast_to_dict(c) for c in node.children]
    return out


def parse_query(text: str) -> dict:
    """Parse a PromQL expression into the JSON AST shape."""
    from time_series_db_spark.lang.prom.parser import parse

    root = parse(text)
    return ast_to_dict(root.children[0])
