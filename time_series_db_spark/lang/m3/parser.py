"""M3QL parser: two-mode tokenizer + recursive descent.

Faithful port of the reference grammar (lang/m3/m3ql/parser/m3ql.jj):

- DEFAULT lexer mode: whitespace/comment skipping, identifiers (which
  subsume most numbers — IDENTIFIER is listed before SCIENTIFIC_NUMBER
  and wins length ties), operators, quoted strings, punctuation.
- LITERAL mode (tag values after ``key:``, alias arguments): raw
  pattern text preserving ``{},*?[]^$/\\`` characters, quoted strings,
  explicit space/newline/comment tokens — no skipping.

Productions follow m3ql.jj: Root (macro defs ``name = pipeline;`` then a
pipeline), Pipeline, Expression, ParenthesizedExpression (with optional
``exec``/``execute`` prefix), Function (with special argument handling
for alias / fetch / mockFetch), Argument, Tag.
"""

from __future__ import annotations

import re

from time_series_db_spark.lang.m3.ast import (
    FunctionNode,
    GroupNode,
    MacroNode,
    Node,
    PipelineNode,
    RootNode,
    TagKeyNode,
    TagValueNode,
    ValueNode,
)


class M3ParseError(ValueError):
    pass


# token kinds
EOF = "EOF"
IDENT = "IDENT"
NULL = "NULL"  # the literal word "nan"
OPERATOR = "OPERATOR"
SCI = "SCI"
STRING = "STRING"
SEMICOLON = "SEMICOLON"
EQUALS = "EQUALS"
PIPE = "PIPE"
LPAREN = "LPAREN"
RPAREN = "RPAREN"
COLON = "COLON"
COMMA = "COMMA"
EXCLAMATION = "EXCLAMATION"
OPEN_CURLY = "OPEN_CURLY"
CLOSED_CURLY = "CLOSED_CURLY"
# literal-mode kinds
LRETURN = "LRETURN"
LQUOTED = "LQUOTED"
LCOMMENT = "LCOMMENT"
LTEXT = "LTEXT"
LSPACE = "LSPACE"

_IDENT_RE = re.compile(r"[a-zA-Z0-9_\-*.]+")
_SCI_RE = re.compile(r"[0-9]+(?:\.[0-9]+)?(?:[eE][+-]?[0-9]+)?")
_LTEXT_RE = re.compile(r"[a-zA-Z0-9_\-./\\{}\[\]*?,^$]+")
_PUNCT = {
    ";": SEMICOLON, "=": EQUALS, "|": PIPE, "(": LPAREN, ")": RPAREN,
    ":": COLON, "{": OPEN_CURLY, "}": CLOSED_CURLY, ",": COMMA,
    "!": EXCLAMATION,
}


class Token:
    __slots__ = ("kind", "image")

    def __init__(self, kind: str, image: str) -> None:
        self.kind = kind
        self.image = image

    def __repr__(self) -> str:  # pragma: no cover
        return f"Token({self.kind}, {self.image!r})"


class Lexer:
    """Positioned scanner; the parser chooses which mode to read in."""

    def __init__(self, text: str) -> None:
        self.text = text
        self.pos = 0
        self._peeked: list[Token] = []  # DEFAULT-mode lookahead buffer

    # -- DEFAULT mode ------------------------------------------------------

    def _skip_default(self) -> None:
        t, n = self.text, len(self.text)
        while self.pos < n:
            c = t[self.pos]
            if c in " \t\n\r":
                self.pos += 1
            elif c == "#":
                while self.pos < n and t[self.pos] not in "\n\r":
                    self.pos += 1
            else:
                return

    def _scan_default(self) -> Token:
        self._skip_default()
        t, n = self.text, len(self.text)
        if self.pos >= n:
            return Token(EOF, "")
        c = t[self.pos]
        if c == '"':
            end = t.find('"', self.pos + 1)
            if end < 0:
                raise M3ParseError("unclosed string literal")
            img = t[self.pos : end + 1]
            self.pos = end + 1
            return Token(STRING, img)
        two = t[self.pos : self.pos + 2]
        if two in ("<=", "==", "!=", ">="):
            self.pos += 2
            return Token(OPERATOR, two)
        if c in "<>":
            self.pos += 1
            return Token(OPERATOR, c)
        m_ident = _IDENT_RE.match(t, self.pos)
        m_sci = _SCI_RE.match(t, self.pos)
        ident_len = len(m_ident.group()) if m_ident else 0
        sci_len = len(m_sci.group()) if m_sci else 0
        if sci_len > ident_len:
            self.pos += sci_len
            return Token(SCI, m_sci.group())
        if ident_len:
            self.pos += ident_len
            img = m_ident.group()
            return Token(NULL if img == "nan" else IDENT, img)
        if c in _PUNCT:
            self.pos += 1
            return Token(_PUNCT[c], c)
        raise M3ParseError(f"unexpected character {c!r} at {self.pos}")

    def peek(self, k: int = 1) -> Token:
        while len(self._peeked) < k:
            self._peeked.append(self._scan_default())
        return self._peeked[k - 1]

    def next(self) -> Token:
        if self._peeked:
            return self._peeked.pop(0)
        return self._scan_default()

    # -- LITERAL mode ------------------------------------------------------

    def next_literal(self) -> Token:
        """Scan one LITERAL_MODE token (no skipping). The DEFAULT-mode
        lookahead buffer must be empty when switching modes; the parser
        guarantees this by never peeking across a mode switch."""
        assert not self._peeked, "peeked across a lexer mode switch"
        t, n = self.text, len(self.text)
        if self.pos >= n:
            return Token(EOF, "")
        c = t[self.pos]
        if c == "\r":
            if t[self.pos : self.pos + 2] == "\r\n":
                self.pos += 2
                return Token(LRETURN, "\r\n")
            self.pos += 1
            return Token(LRETURN, "\r")
        if c == "\n":
            self.pos += 1
            return Token(LRETURN, "\n")
        if c == '"':
            end = self.pos + 1
            while end < n and t[end] not in '"\n\r':
                end += 1
            if end >= n or t[end] != '"':
                raise M3ParseError(
                    "Unclosed quoted string: " + t[self.pos : end]
                )
            img = t[self.pos : end + 1]
            self.pos = end + 1
            return Token(LQUOTED, img)
        if c == "#":
            end = self.pos
            while end < n and t[end] not in "\n\r":
                end += 1
            img = t[self.pos : end]
            self.pos = end
            return Token(LCOMMENT, img)
        if c in " \t":
            end = self.pos
            while end < n and t[end] in " \t":
                end += 1
            img = t[self.pos : end]
            self.pos = end
            return Token(LSPACE, img)
        m = _LTEXT_RE.match(t, self.pos)
        if m:
            self.pos = m.end()
            return Token(LTEXT, m.group())
        if c in _PUNCT:
            self.pos += 1
            return Token(_PUNCT[c], c)
        raise M3ParseError(f"unexpected literal-mode character {c!r} at {self.pos}")

    def peek_literal(self) -> Token:
        save = self.pos
        tok = self.next_literal()
        self.pos = save
        return tok


def _strip_quotes(s: str) -> str:
    if len(s) >= 2 and s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    return s


class Parser:
    def __init__(self, text: str) -> None:
        self.lex = Lexer(text)

    # Root: [macro (; macro)*] pipeline EOF
    def parse_root(self) -> RootNode:
        root = RootNode()
        while (
            self.lex.peek(1).kind == IDENT and self.lex.peek(2).kind == EQUALS
        ):
            root.add(self._macro())
            self._expect(SEMICOLON)
        root.add(self._pipeline())
        if self.lex.peek(1).kind != EOF:
            tok = self.lex.peek(1)
            raise M3ParseError(f"unexpected trailing token {tok.image!r}")
        return root

    def _expect(self, kind: str) -> Token:
        tok = self.lex.next()
        if tok.kind != kind:
            raise M3ParseError(f"expected {kind}, got {tok.kind}({tok.image!r})")
        return tok

    def _macro(self) -> MacroNode:
        name = self._expect(IDENT).image
        self._expect(EQUALS)
        macro = MacroNode(name)
        macro.add(self._pipeline())
        return macro

    def _pipeline(self) -> PipelineNode:
        node = PipelineNode()
        node.add(self._expression())
        while self.lex.peek(1).kind == PIPE:
            self.lex.next()
            node.add(self._expression())
        return node

    def _at_left_paren(self) -> bool:
        """LeftParen(): '(' or 'exec'/'execute' followed by '('."""
        t1 = self.lex.peek(1)
        if t1.kind == LPAREN:
            return True
        return (
            t1.kind == IDENT
            and t1.image in ("exec", "execute")
            and self.lex.peek(2).kind == LPAREN
        )

    def _consume_left_paren(self) -> None:
        if self.lex.peek(1).kind == IDENT:
            self.lex.next()  # swallow exec/execute
        self._expect(LPAREN)

    def _expression(self) -> Node:
        if self._at_left_paren():
            return self._group()
        return self._function()

    def _group(self) -> GroupNode:
        self._consume_left_paren()
        group = GroupNode()
        group.add(self._expression())
        while self.lex.peek(1).kind == PIPE:
            self.lex.next()
            group.add(self._expression())
        self._expect(RPAREN)
        return group

    def _function(self) -> FunctionNode:
        tok = self.lex.next()
        if tok.kind not in (IDENT, OPERATOR):
            raise M3ParseError(
                f"expected function name, got {tok.kind}({tok.image!r})"
            )
        node = FunctionNode(tok.image)
        if tok.image == "alias":
            self._alias_argument(node)
        elif tok.image == "fetch":
            while (
                self.lex.peek(1).kind in (IDENT, NULL)
                and self.lex.peek(2).kind == COLON
            ):
                self._tag(node)
        elif tok.image == "mockFetch":
            self._mock_fetch_arguments(node)
        elif tok.image in (
            "mockFetchLine", "mockFetchLinear", "mockFetchPeriodic"
        ):
            # generator variants: space-separated params, then tags
            self._mock_fetch_arguments(node, comma_separated=False)
        else:
            while self._argument_ahead():
                self._argument(node)
        return node

    # -- alias (LITERAL mode, space-joined) --------------------------------

    _ALIAS_STOP = (LRETURN, LCOMMENT, PIPE, SEMICOLON, RPAREN, EOF)

    def _alias_argument(self, node: FunctionNode) -> None:
        parts: list[str] = []
        while True:
            tok = self.lex.peek_literal()
            if tok.kind in self._ALIAS_STOP:
                break
            tok = self.lex.next_literal()
            if tok.kind == LQUOTED:
                parts.append(_strip_quotes(tok.image))
            elif tok.kind == LTEXT:
                parts.append(tok.image)
            elif tok.kind == LSPACE:
                pass
            elif tok.kind == EXCLAMATION:
                parts.append(" " + tok.image)
            else:
                raise M3ParseError(
                    f"unexpected token in alias: {tok.kind}({tok.image!r})"
                )
        text = " ".join(parts).strip()
        if text:
            node.add(ValueNode(text))
        self._consume_literal_trailer()

    def _consume_literal_trailer(self) -> None:
        """returns*, comments*, spaces* — the grammar's mode-exit skip."""
        for kinds in ((LRETURN,), (LCOMMENT,), (LSPACE,)):
            while self.lex.peek_literal().kind in kinds:
                self.lex.next_literal()

    # -- fetch tags --------------------------------------------------------

    _TAG_STOP = (LRETURN, LCOMMENT, LSPACE, PIPE, SEMICOLON, LPAREN, RPAREN, EOF)

    def _tag(self, node: FunctionNode) -> None:
        key = self.lex.next().image
        self._expect(COLON)
        tag = TagKeyNode(key)
        node.add(tag)
        while self.lex.peek_literal().kind == LSPACE:
            self.lex.next_literal()
        if self.lex.peek_literal().kind == EXCLAMATION:
            self.lex.next_literal()
            tag.inverted = True
            while self.lex.peek_literal().kind == LSPACE:
                self.lex.next_literal()
        text = []
        while True:
            tok = self.lex.peek_literal()
            if tok.kind in self._TAG_STOP:
                break
            tok = self.lex.next_literal()
            if tok.kind == LQUOTED:
                text.append(_strip_quotes(tok.image))
            elif tok.kind == LTEXT:
                text.append(tok.image)
            else:
                raise M3ParseError(
                    f"unexpected token in tag value: {tok.kind}({tok.image!r})"
                )
        value = "".join(text).strip()
        if value:
            tag.add(TagValueNode(value))
        self._consume_literal_trailer()

    # -- mockFetch ---------------------------------------------------------

    def _mock_fetch_arguments(
        self, node: FunctionNode, comma_separated: bool = True
    ) -> None:
        def _value_ahead() -> bool:
            return self.lex.peek(1).kind in (NULL, SCI, IDENT, OPERATOR) and not (
                self.lex.peek(1).kind == IDENT and self.lex.peek(2).kind == COLON
            )

        def _one_value() -> None:
            tok = self.lex.peek(1)
            if tok.kind == NULL:
                self.lex.next()
                node.add(ValueNode("nan"))
                return
            sign = ""
            if tok.kind == OPERATOR:
                op = self.lex.next()
                if op.image != "-":
                    raise M3ParseError(f"Expected '-' but got: {op.image}")
                sign = "-"
                tok = self.lex.peek(1)
            if tok.kind in (SCI, IDENT):
                self.lex.next()
                node.add(ValueNode(sign + tok.image))
            else:
                raise M3ParseError(f"expected number in mockFetch, got {tok.image!r}")

        if _value_ahead():
            _one_value()
            if comma_separated:
                while self.lex.peek(1).kind == COMMA:
                    self.lex.next()
                    _one_value()
            else:
                while _value_ahead():
                    _one_value()
        while (
            self.lex.peek(1).kind in (IDENT, NULL)
            and self.lex.peek(2).kind == COLON
        ):
            self._tag(node)

    # -- generic arguments -------------------------------------------------

    def _argument_ahead(self) -> bool:
        k = self.lex.peek(1).kind
        return k in (LPAREN, IDENT, STRING, SCI) or (
            k == IDENT and self.lex.peek(2).kind == EOF
        )

    def _argument(self, node: FunctionNode) -> None:
        t1 = self.lex.peek(1)
        if t1.kind == LPAREN:
            # LOOKAHEAD(3): "(" IDENT ")" → bare function/macro reference
            if (
                self.lex.peek(2).kind == IDENT
                and self.lex.peek(3).kind == RPAREN
            ):
                self.lex.next()
                name = self.lex.next().image
                self.lex.next()
                node.add(FunctionNode(name))
            else:
                node.add(self._expression())
        elif t1.kind in (IDENT, STRING):
            node.add(ValueNode(self.lex.next().image))
            while self.lex.peek(1).kind == COMMA:
                self.lex.next()
                tok = self.lex.next()
                if tok.kind not in (IDENT, STRING):
                    raise M3ParseError(
                        f"expected value after ',', got {tok.image!r}"
                    )
                node.add(ValueNode(tok.image))
        elif t1.kind == SCI:
            node.add(ValueNode(self.lex.next().image))
        else:  # pragma: no cover — guarded by _argument_ahead
            raise M3ParseError(f"unexpected argument token {t1.image!r}")


def parse(query: str, expand_macros: bool = True) -> RootNode:
    """Parse M3QL text into a (transformed) AST — M3QLParser.parse."""
    from time_series_db_spark.lang.m3.transforms import process

    root = Parser(query).parse_root()
    process(root, expand_macros)
    return root
