"""Operator-DAG visualization — reference streamz/graph.py:56-252.

The reference walks the push-graph's upstreams/downstreams into
networkx and renders via graphviz. Here the Stream API records a
lightweight lineage DAG (one OpNode per fluent call) as it builds the
Catalyst plan; this module renders that DAG as DOT text or an ASCII
tree. graphviz/networkx are not in this container, so ``render``
writes ``.dot`` (feed to ``dot -Tpng`` anywhere graphviz exists) and
falls back gracefully; the *physical* plan stays available through
plans.inspect.explain_string.
"""

from __future__ import annotations

__all__ = ["OpNode", "to_dot", "ascii_tree", "render"]


class OpNode:
    """One operator application in a Stream pipeline."""

    __slots__ = ("name", "parents")

    def __init__(self, name: str, parents=()):
        self.name = name
        self.parents = tuple(p for p in parents if p is not None)


def _walk(node: OpNode):
    """Nodes in deterministic reverse-topological order, deduped."""
    seen: dict[int, OpNode] = {}

    def rec(n: OpNode):
        if id(n) in seen:
            return
        for p in n.parents:
            rec(p)
        seen[id(n)] = n

    rec(node)
    return list(seen.values())


def to_dot(node: OpNode) -> str:
    """DOT digraph of the operator DAG (reference graph.py:56-108
    create_graph + visualize shapes: sources as ellipses, ops boxes)."""
    nodes = _walk(node)
    ids = {id(n): f"n{i}" for i, n in enumerate(nodes)}
    lines = ["digraph stream {", "  rankdir=LR;"]
    for n in nodes:
        shape = "ellipse" if not n.parents else "box"
        lines.append(f'  {ids[id(n)]} [label="{n.name}", shape={shape}];')
    for n in nodes:
        for p in n.parents:
            lines.append(f"  {ids[id(p)]} -> {ids[id(n)]};")
    lines.append("}")
    return "\n".join(lines)


def ascii_tree(node: OpNode) -> str:
    """Terminal-friendly rendering, leaf (latest op) first."""
    out: list[str] = []

    def rec(n: OpNode, depth: int):
        out.append("  " * depth + ("+- " if depth else "") + n.name)
        for p in n.parents:
            rec(p, depth + 1)

    rec(node, 0)
    return "\n".join(out)


def render(node: OpNode, filename: str | None = None) -> str:
    """Render the DAG: returns DOT text; writes ``filename`` if given.

    A non-.dot filename (e.g. .png) is rendered via the graphviz
    python package when importable, else the DOT source is written to
    ``filename + '.dot'`` with a note (mirrors the reference's
    graceful degradation, graph.py:150-178).
    """
    dot = to_dot(node)
    if filename is None:
        return dot
    if filename.endswith(".dot"):
        with open(filename, "w") as f:
            f.write(dot)
        return dot
    try:  # pragma: no cover - graphviz absent in this container
        import graphviz

        graphviz.Source(dot).render(outfile=filename, cleanup=True)
    except ImportError:
        with open(filename + ".dot", "w") as f:
            f.write(dot)
    return dot
