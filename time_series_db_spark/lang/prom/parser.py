"""PromQL recursive-descent parser — ports promql.jj (340 lines).

Token set and productions follow the grammar exactly (tokens :90-125,
productions :126-340): DURATION before NUMBER (most-specific first),
keywords ``by``/``without`` before IDENTIFIER, the aggregation lookahead
on {sum,avg,min,max,count}, and both aggregation formats
(``sum by (l) (e)`` and ``sum(e) by (l)``). One deliberate extension:
function calls accept scalar NUMBER arguments (``clamp(v, 0, 1)``,
``quantile_over_time(0.9, v[5m])``) — the reference grammar reserves a
NUMBER token but never uses it, and its FunctionType declares scalar
argument counts (FunctionType.java getScalarArgumentCount) that the
grammar cannot yet feed.
"""

from __future__ import annotations

import re

from time_series_db_spark.lang.prom.ast import (
    AggregationNode,
    BinaryExprNode,
    FunctionCallNode,
    InstantVectorSelectorNode,
    LabelMatcherNode,
    NumberLiteralNode,
    PromNode,
    PromParseError,
    RangeVectorSelectorNode,
    RootNode,
    SubqueryNode,
    parse_duration_ms,
)

_AGGREGATIONS = {
    "sum", "avg", "min", "max", "count",
    # PromQL aggregations beyond the reference's AggregationType five
    "stddev", "stdvar", "group", "quantile", "topk", "bottomk",
    "count_values", "limitk", "limit_ratio",
}
#: aggregations taking a leading scalar parameter: aggr(param, expr)
_PARAM_AGGS = {"quantile", "topk", "bottomk", "limitk", "limit_ratio"}

#: token spec, most-specific first (promql.jj TOKEN block ordering);
#: CMP before OP so ``==`` wins over ``=``, ARITH for the binary-operator
#: extension (the reference grammar has no operators at all)
_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n\r]*)
  | (?P<DURATION>\d+(?:ms|s|m|h|d|w|y)\b)
  | (?P<NUMBER>(?:\d+(?:\.\d+)?|\.\d+)(?:[eE][+-]?\d+)?|[iI][nN][fF]\b|[nN][aA][nN]\b)
  | (?P<CMP>==|>=|<=|>|<)
  | (?P<OP>=~|!~|!=|=)
  | (?P<ARITH>[-+*/%^])
  | (?P<DELIM>[(){}\[\],:@])
  | (?P<IDENTIFIER>[a-zA-Z_]+[a-zA-Z0-9_:]*)
  | (?P<STRING>"(?:[^"\\]|\\.)*")
    """,
    re.VERBOSE,
)

#: binary-operator precedence, lowest binds loosest (Prometheus table);
#: ^ is right-associative
_PRECEDENCE = {
    "or": 1,
    "and": 2, "unless": 2,
    "==": 3, "!=": 3, "<=": 3, "<": 3, ">=": 3, ">": 3,
    "+": 4, "-": 4,
    "*": 5, "/": 5, "%": 5, "atan2": 5,
    "^": 6,
}


#: Go/PromQL string escapes (strconv.Unquote semantics): named escapes,
#: \xHH, \uXXXX, \UXXXXXXXX, and 3-digit octal. Unknown escapes keep the
#: escaped character (lenient, like the previous behavior for \{ etc.).
_NAMED_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b",
    "f": "\f", "v": "\v", "\\": "\\", '"': '"', "'": "'",
}
_ESCAPE_RE = re.compile(
    r"\\(x[0-9a-fA-F]{2}|u[0-9a-fA-F]{4}|U[0-9a-fA-F]{8}|[0-7]{3}|.)"
)


def unquote_string(raw: str) -> str:
    """Strip quotes and interpret escape sequences the way PromQL does
    (Go strconv.Unquote): ``"\\n"`` is a newline, not the letter n."""
    def repl(m: re.Match) -> str:
        e = m.group(1)
        if e[0] == "x" and len(e) == 3:
            return chr(int(e[1:], 16))
        if e[0] in "uU" and len(e) > 1:
            return chr(int(e[1:], 16))
        if len(e) == 3 and all(c in "01234567" for c in e):
            return chr(int(e, 8))
        return _NAMED_ESCAPES.get(e, e)

    return _ESCAPE_RE.sub(repl, raw[1:-1])


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise PromParseError(f"unexpected character {text[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        out.append((kind, m.group()))
    out.append(("EOF", ""))
    return out


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, ahead: int = 0) -> tuple[str, str]:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind: str, value: str | None = None) -> str:
        k, v = self.next()
        if k != kind or (value is not None and v != value):
            raise PromParseError(f"expected {value or kind}, got {v!r}")
        return v

    # Root() — promql.jj:126
    def root(self) -> RootNode:
        expr = self.expression()
        self.expect("EOF")
        return RootNode(children=[expr])

    # Expression() — promql.jj:140 extended with the binary-operator
    # surface (precedence climbing; the reference grammar has none)
    def expression(self, min_prec: int = 1) -> PromNode:
        left = self.atom()
        while True:
            op = self._peek_binop()
            if op is None or _PRECEDENCE[op] < min_prec:
                return left
            self.next()
            if op == "unless":
                op_canon = "unless"
            else:
                op_canon = op.lower() if op in ("and", "or") else op
            bool_mod = False
            if (
                op in ("==", "!=", "<=", "<", ">=", ">")
                and self.peek()[0] == "IDENTIFIER"
                and self.peek()[1].lower() == "bool"
            ):
                self.next()
                bool_mod = True
            matching, match_labels, group, group_labels = self._vector_matching()
            # left-assoc: right side binds at prec+1; ^ is right-assoc
            next_min = _PRECEDENCE[op] + (0 if op == "^" else 1)
            right = self.expression(next_min)
            left = BinaryExprNode(
                children=[left, right], op=op_canon,
                bool_modifier=bool_mod, matching=matching,
                match_labels=match_labels, group=group,
                group_labels=group_labels,
            )

    def _peek_binop(self) -> str | None:
        k, v = self.peek()
        if k in ("ARITH", "CMP"):
            return v
        if k == "OP" and v == "!=":
            return v
        if k == "IDENTIFIER" and v.lower() in ("and", "or", "unless", "atan2"):
            return v.lower()
        return None

    def _vector_matching(self):
        """[on|ignoring (labels)] [group_left|group_right [(labels)]]

        Keyword matching is case-INsensitive on purpose: Prometheus's
        lexer folds words with strings.ToLower before keyword lookup
        (promql/parser/lexer.go lexKeywordOrIdentifier) and the reference
        grammar's aggregation lookahead does the same
        (promql.jj:148 ``getToken(1).image.toLowerCase()``), so ``ON``/
        ``GROUP_LEFT`` are modifiers upstream too."""
        matching, labels, group, group_labels = None, [], None, []
        if (
            self.peek()[0] == "IDENTIFIER"
            and self.peek()[1].lower() in ("on", "ignoring")
            and self.peek(1) == ("DELIM", "(")
        ):
            matching = self.next()[1].lower()
            self.expect("DELIM", "(")
            if self.peek() != ("DELIM", ")"):
                labels = self.label_list()
            self.expect("DELIM", ")")
        if (
            self.peek()[0] == "IDENTIFIER"
            and self.peek()[1].lower() in ("group_left", "group_right")
        ):
            group = self.next()[1].lower()
            if self.peek() == ("DELIM", "("):
                self.next()
                if self.peek() != ("DELIM", ")"):
                    group_labels = self.label_list()
                self.expect("DELIM", ")")
        return matching, labels, group, group_labels

    def atom(self) -> PromNode:
        k, v = self.peek()
        if (k, v) == ("DELIM", "("):
            self.next()
            node = self.expression()
            self.expect("DELIM", ")")
            return self._postfix_subquery(node)
        if k == "NUMBER":
            return NumberLiteralNode(value=float(self.next()[1]))
        if (
            (k, v) == ("ARITH", "-")
            and self.peek(1)[0] == "NUMBER"
            and self.peek(2) != ("ARITH", "^")
        ):
            # fold `-NUMBER` to a literal (function args expect
            # NumberLiteralNode) — EXCEPT before `^`: upstream unary
            # minus binds looser than `^`, so `-1 ^ 2` is `-(1^2)` = -1
            # and must go through the general unary path below
            self.next()
            return NumberLiteralNode(value=-float(self.next()[1]))
        if (k, v) in (("ARITH", "-"), ("ARITH", "+")):
            # unary +/- — Prometheus desugars `-expr` to `0 - expr`,
            # with the operand at unary precedence: tighter than every
            # binary op EXCEPT `^` (promql/parser/generated_parser.y:
            # `%right POW`, unary declared below it), so `-a * b` is
            # `(0-a) * b` but `-a ^ b` is `0 - (a ^ b)`
            self.next()
            operand = self.expression(_PRECEDENCE["^"])
            if v == "+":
                return operand
            zero = NumberLiteralNode(value=0.0)
            node = BinaryExprNode(op="-")
            node.children = [zero, operand]
            return node
        if k == "IDENTIFIER" and v.lower() in _AGGREGATIONS:
            return self._postfix_subquery(self.aggregation())
        if k == "IDENTIFIER" and self.peek(1) == ("DELIM", "("):
            return self._postfix_subquery(self.function_call())
        return self._postfix_subquery(self.selector())

    def _postfix_subquery(self, node: PromNode) -> PromNode:
        """``expr[range:step]`` — subquery postfix (Prometheus grammar;
        beyond the reference, like the whole operator surface). The
        plain ``[range]`` (no colon) postfix is a range selector and is
        consumed inside :meth:`selector` only."""
        while (
            self.peek() == ("DELIM", "[")
            and self.peek(1)[0] == "DURATION"
            and self.peek(2) == ("DELIM", ":")
        ):
            self.next()
            range_ms = parse_duration_ms(self.expect("DURATION"))
            self.expect("DELIM", ":")
            step_ms = 0
            if self.peek()[0] == "DURATION":
                step_ms = parse_duration_ms(self.next()[1])
            self.expect("DELIM", "]")
            offset_ms = 0
            if self.peek() == ("IDENTIFIER", "offset"):
                self.next()
                offset_ms = parse_duration_ms(self.expect("DURATION"))
            node = SubqueryNode(
                children=[node], range_ms=range_ms,
                step_ms=step_ms, offset_ms=offset_ms,
            )
        return node

    # Aggregation() — promql.jj:166 (both formats)
    def aggregation(self) -> AggregationNode:
        agg = self.expect("IDENTIFIER")
        modifier, labels = None, []
        if self.peek()[1] in ("by", "without") and self.peek()[0] == "IDENTIFIER":
            # Format 1: aggr by (labels) (expr)
            modifier = self.next()[1]
            self.expect("DELIM", "(")
            labels = self.label_list()
            self.expect("DELIM", ")")
            self.expect("DELIM", "(")
            param, str_param = self.agg_param(agg)
            expr = self.expression()
            self.expect("DELIM", ")")
        else:
            # Format 2: aggr(expr) [by|without (labels)]
            self.expect("DELIM", "(")
            param, str_param = self.agg_param(agg)
            expr = self.expression()
            self.expect("DELIM", ")")
            if (
                self.peek()[0] == "IDENTIFIER"
                and self.peek()[1] in ("by", "without")
            ):
                modifier = self.next()[1]
                self.expect("DELIM", "(")
                labels = self.label_list()
                self.expect("DELIM", ")")
        return AggregationNode(
            children=[expr], agg_type=agg.lower(), modifier=modifier,
            labels=labels, param=param, str_param=str_param,
        )

    def agg_param(self, agg: str):
        """Leading parameter: scalar for topk/bottomk/quantile, string
        for count_values — aggr(param, expr)."""
        if agg.lower() == "count_values":
            raw = self.expect("STRING")
            self.expect("DELIM", ",")
            return None, unquote_string(raw)
        if agg.lower() not in _PARAM_AGGS:
            return None, None
        sign = 1.0
        if self.peek() == ("ARITH", "-"):
            self.next()
            sign = -1.0
        param = sign * float(self.expect("NUMBER"))
        self.expect("DELIM", ",")
        return param, None

    def label_list(self) -> list[str]:
        labels = [self.expect("IDENTIFIER")]
        while self.peek() == ("DELIM", ","):
            self.next()
            labels.append(self.expect("IDENTIFIER"))
        return labels

    # FunctionCall() — promql.jj:225, extended with scalar args
    def function_call(self) -> FunctionCallNode:
        name = self.expect("IDENTIFIER")
        self.expect("DELIM", "(")
        node = FunctionCallNode(name=name.lower())
        while self.peek() != ("DELIM", ")"):
            k, v = self.peek()
            if k == "ARITH" and v in "+-" and self.peek(1)[0] == "NUMBER":
                # signed scalar argument: clamp(v, -1, 1), histogram_
                # fraction(-Inf, 0, v) — the sign binds to the literal
                sign = -1.0 if v == "-" else 1.0
                self.next()
                node.scalars.append(sign * float(self.next()[1]))
            elif k == "NUMBER":
                node.scalars.append(float(self.next()[1]))
            elif k == "STRING":
                node.strings.append(unquote_string(self.next()[1]))
            else:
                node.children.append(self.expression())
            if self.peek() == ("DELIM", ","):
                self.next()
        self.expect("DELIM", ")")
        return node

    # VectorOrMatrixSelector() — promql.jj:247
    def selector(self) -> PromNode:
        metric = None
        matchers: list[LabelMatcherNode] = []
        k, v = self.peek()
        if k == "IDENTIFIER":
            metric = self.next()[1]
            if self.peek() == ("DELIM", "{"):
                self.next()
                matchers = self.label_matchers()
                self.expect("DELIM", "}")
        elif (k, v) == ("DELIM", "{"):
            self.next()
            matchers = self.label_matchers()
            self.expect("DELIM", "}")
        else:
            raise PromParseError(f"expected selector, got {v!r}")

        range_ms = None
        # a '[' holding DURATION ':' is a subquery postfix — leave it for
        # _postfix_subquery (the selector stays an instant vector)
        if self.peek() == ("DELIM", "[") and self.peek(2) == ("DELIM", "]"):
            self.next()
            dur = self.expect("DURATION")
            self.expect("DELIM", "]")
            range_ms = parse_duration_ms(dur)
        offset_ms = 0
        at: int | str | None = None
        # offset and @ modifiers, in either order (Prometheus allows both)
        while True:
            if self.peek() == ("IDENTIFIER", "offset"):
                self.next()
                offset_ms = parse_duration_ms(self.expect("DURATION"))
            elif self.peek() == ("DELIM", "@"):
                self.next()
                k, v = self.peek()
                if k == "IDENTIFIER" and v in ("start", "end"):
                    self.next()
                    self.expect("DELIM", "(")
                    self.expect("DELIM", ")")
                    at = v
                elif k in ("NUMBER", "DURATION"):
                    # epoch seconds; DURATION absorbs forms like "30s"
                    # only when unitless digits were lexed as NUMBER
                    if k != "NUMBER":
                        raise PromParseError("@ expects epoch seconds")
                    at = int(float(self.next()[1]) * 1000.0)
                else:
                    raise PromParseError(f"@ expects a timestamp, got {v!r}")
            else:
                break
        if range_ms is not None:
            return RangeVectorSelectorNode(
                metric=metric, matchers=matchers,
                range_ms=range_ms, offset_ms=offset_ms, at=at,
            )
        return InstantVectorSelectorNode(
            metric=metric, matchers=matchers, offset_ms=offset_ms, at=at
        )

    # LabelMatchers()/LabelMatcher() — promql.jj:300-340
    def label_matchers(self) -> list[LabelMatcherNode]:
        matchers = [self.label_matcher()]
        while self.peek() == ("DELIM", ","):
            self.next()
            matchers.append(self.label_matcher())
        return matchers

    def label_matcher(self) -> LabelMatcherNode:
        name = self.expect("IDENTIFIER")
        op = self.expect("OP")
        value = unquote_string(self.expect("STRING"))
        return LabelMatcherNode(name=name, op=op, value=value)


def parse(query: str) -> RootNode:
    """Parse a PromQL expression to its AST — PromQLParser.parse()."""
    return _Parser(_tokenize(query)).root()
