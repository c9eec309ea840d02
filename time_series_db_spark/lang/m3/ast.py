"""M3QL AST node classes + dump.

Mirrors the reference node set (lang/m3/m3ql/parser/nodes/*.java) and the
test dump format (M3TestUtils.printAST: 2-space indent per depth, one
``getExplainName`` per line).
"""

from __future__ import annotations


class Node:
    __slots__ = ("parent", "children")

    def __init__(self) -> None:
        self.parent: Node | None = None
        self.children: list[Node] = []

    def add(self, child: "Node") -> None:
        self.children.append(child)
        child.parent = self

    def explain(self) -> str:
        raise NotImplementedError

    def clone(self) -> "Node":
        c = self._clone_self()
        for child in self.children:
            c.add(child.clone())
        return c

    def _clone_self(self) -> "Node":
        return type(self)()

    def dump(self, depth: int = 0) -> str:
        out = ["  " * depth + self.explain()]
        for c in self.children:
            out.append(c.dump(depth + 1))
        return "\n".join(out)


class RootNode(Node):
    def explain(self) -> str:
        return "ROOT"


class PipelineNode(Node):
    def explain(self) -> str:
        return "PIPELINE"


class GroupNode(Node):
    def explain(self) -> str:
        return "GROUP"


class MacroNode(Node):
    __slots__ = ("name",)

    def __init__(self, name: str = "") -> None:
        super().__init__()
        self.name = name

    def _clone_self(self) -> "MacroNode":
        return MacroNode(self.name)

    @property
    def pipeline(self) -> PipelineNode:
        return self.children[0]

    def explain(self) -> str:
        return f"MACRO({self.name})"


class FunctionNode(Node):
    __slots__ = ("name",)

    def __init__(self, name: str = "") -> None:
        super().__init__()
        self.name = name

    def _clone_self(self) -> "FunctionNode":
        return FunctionNode(self.name)

    def explain(self) -> str:
        return f"FUNCTION({self.name})"


class ValueNode(Node):
    __slots__ = ("value",)

    def __init__(self, value: str = "") -> None:
        super().__init__()
        self.value = value

    def _clone_self(self) -> "ValueNode":
        return ValueNode(self.value)

    def explain(self) -> str:
        return f"VALUE({self.value})"


class TagKeyNode(Node):
    __slots__ = ("key", "inverted")

    def __init__(self, key: str = "", inverted: bool = False) -> None:
        super().__init__()
        self.key = key
        self.inverted = inverted

    def _clone_self(self) -> "TagKeyNode":
        return TagKeyNode(self.key, self.inverted)

    def explain(self) -> str:
        if self.inverted:
            return f"TAG_KEY({self.key}, inverted=true)"
        return f"TAG_KEY({self.key})"


class TagValueNode(Node):
    __slots__ = ("value",)

    def __init__(self, value: str = "") -> None:
        super().__init__()
        self.value = value

    def _clone_self(self) -> "TagValueNode":
        return TagValueNode(self.value)

    def explain(self) -> str:
        return f"TAG_VALUE({self.value})"


class TagArgsNode(Node):
    __slots__ = ("args",)

    def __init__(self, args: list[str] | None = None) -> None:
        super().__init__()
        self.args: list[str] = list(args or [])

    def _clone_self(self) -> "TagArgsNode":
        return TagArgsNode(self.args)

    def explain(self) -> str:
        return "TAG_ARGS([" + ", ".join(self.args) + "])"
