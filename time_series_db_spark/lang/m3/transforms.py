"""AST transformations — port of parser/transform/*.java.

Applied in the reference's order (M3ASTProcessor.process): macro
expansion, macro removal, union-function rewrite, group normalization,
pipeline flattening, brace value interpolation. The traversal is
children-first with a fixed-point loop over each node's direct children
(ASTTransformer.transformNode) — macro definitions are expanded
*in place* first (they are Root children), so later references clone
already-expanded pipelines.
"""

from __future__ import annotations

from time_series_db_spark.lang.m3.parser import M3ParseError
from time_series_db_spark.lang.m3.ast import (
    FunctionNode,
    GroupNode,
    MacroNode,
    Node,
    PipelineNode,
    TagArgsNode,
    TagValueNode,
)


class Transformation:
    def prepare(self, root: Node) -> None:
        pass

    def can_transform(self, node: Node) -> bool:
        raise NotImplementedError

    def transform(self, node: Node) -> list[Node]:
        raise NotImplementedError


def _transform_node(node: Node, t: Transformation) -> None:
    for child in list(node.children):
        _transform_node(child, t)
    changed = True
    while changed:
        changed = False
        i = 0
        while i < len(node.children):
            child = node.children[i]
            if t.can_transform(child):
                replacements = t.transform(child)
                node.children[i : i + 1] = replacements
                for r in replacements:
                    r.parent = node
                i += len(replacements)
                changed = True
            else:
                i += 1


class MacroExpansion(Transformation):
    def __init__(self) -> None:
        self.defs: dict[str, PipelineNode] = {}

    def prepare(self, root: Node) -> None:
        self._collect(root)

    def _collect(self, node: Node) -> None:
        for child in node.children:
            if isinstance(child, MacroNode):
                self.defs[child.name] = child.pipeline
                continue
            self._collect(child)

    def can_transform(self, node: Node) -> bool:
        return isinstance(node, FunctionNode) and node.name in self.defs

    def transform(self, node: Node) -> list[Node]:
        return [self.defs[node.name].clone()]


class MacroRemoval(Transformation):
    def can_transform(self, node: Node) -> bool:
        return isinstance(node, MacroNode)

    def transform(self, node: Node) -> list[Node]:
        return []


class UnionFunction(Transformation):
    """``union (a) (b)`` → inline the group arguments into the pipeline."""

    def can_transform(self, node: Node) -> bool:
        return isinstance(node, FunctionNode) and node.name == "union"

    def transform(self, node: Node) -> list[Node]:
        if len(node.children) < 2:
            raise M3ParseError(
                f"union function requires at least 2 arguments, got {len(node.children)}"
            )
        for i, child in enumerate(node.children):
            if not isinstance(child, GroupNode):
                raise M3ParseError(
                    f"union function expects argument {i + 1} of type Pipeline "
                    f"(parenthesized expression)"
                )
        return list(node.children)


class GroupNormalization(Transformation):
    """Unwrap pipeline-less groups; drop pre-fetch children when a fetch
    restarts the chain inside a group (GroupNormalizationTransformation)."""

    def can_transform(self, node: Node) -> bool:
        if not isinstance(node, GroupNode):
            return False
        if any(isinstance(c, PipelineNode) for c in node.children):
            return False
        return self._first_fetch_index(node) != 0

    @staticmethod
    def _first_fetch_index(node: GroupNode) -> int:
        for i, child in enumerate(node.children):
            if isinstance(child, FunctionNode) and child.name == "fetch":
                return i
        return -1

    def transform(self, node: Node) -> list[Node]:
        idx = self._first_fetch_index(node)
        if idx < 0:
            return list(node.children)
        new_group = GroupNode()
        for child in node.children[idx:]:
            new_group.add(child)
        return [new_group]


class PipelineFlattening(Transformation):
    """Collapse single-child pipelines nested in single-child pipelines."""

    def can_transform(self, node: Node) -> bool:
        return (
            isinstance(node, PipelineNode)
            and len(node.children) == 1
            and isinstance(node.parent, PipelineNode)
            and len(node.parent.children) == 1
        )

    def transform(self, node: Node) -> list[Node]:
        return [node.children[0]]


class ValueInterpolation(Transformation):
    """Expand brace patterns in tag values: ``a{b,c}d`` → TAG_ARGS."""

    def can_transform(self, node: Node) -> bool:
        return isinstance(node, TagValueNode) and self._has_braces(node.value)

    @staticmethod
    def _has_braces(value: str) -> bool:
        depth = 0
        found = False
        for i, c in enumerate(value):
            if c == "{":
                depth += 1
                found = True
            elif c == "}":
                depth -= 1
                if depth < 0:
                    raise M3ParseError(
                        f"Mismatched braces: unopened closing brace at position {i}"
                    )
        if depth > 0:
            raise M3ParseError(f"Mismatched braces: {depth} unclosed opening brace(s)")
        return found

    def transform(self, node: Node) -> list[Node]:
        values = [node.value]
        while any(self._has_braces(v) for v in values):
            out: list[str] = []
            for v in values:
                out.extend(self._expand_first(v) if self._has_braces(v) else [v])
            values = out
        if len(values) == 1:
            return [TagValueNode(values[0])]
        return [TagArgsNode(values)]

    @staticmethod
    def _expand_first(value: str) -> list[str]:
        """Expand the first innermost-complete brace pair."""
        start = -1
        for i, c in enumerate(value):
            if c == "{":
                start = i
            elif c == "}":
                inner = value[start + 1 : i]
                prefix, suffix = value[:start], value[i + 1 :]
                return [prefix + part + suffix for part in inner.split(",")]
        raise AssertionError("no brace pair found")  # pragma: no cover


def process(root: Node, expand_macros: bool = True) -> None:
    """M3ASTProcessor.process — apply the transform battery in order."""
    transforms: list[Transformation] = []
    if expand_macros:
        transforms += [MacroExpansion(), MacroRemoval()]
    transforms += [
        UnionFunction(),
        GroupNormalization(),
        PipelineFlattening(),
        ValueInterpolation(),
    ]
    for t in transforms:
        t.prepare(root)
        _transform_node(root, t)
