""".dot graph + GFD file source.

Reference: Desbordante parses graphviz-style ``.dot`` files into its graph
model and GFD files into (premise literals, conclusion literals, pattern
graph) triples (/root/reference/src/core/parser/graph_parser/
graph_parser.cpp; fixtures under test_input_data/graph_data/). Formats:

- **graph file**: ``graph G {`` … ``}`` with vertex lines
  ``<id>[key=value key="quoted value" …];`` and undirected edge lines
  ``<a>--<b> [label=<x>];``.
- **GFD file**: line 1 = premise literals, line 2 = conclusion literals
  (space-separated ``tok=tok``; a token is ``<vertex>.<attr>`` or a bare
  constant; an empty line = no literals), then the pattern graph in the
  same dot format.

Spark-first: the parser is a tiny driver-side text step (pattern/GFD files
are inherently small); the DATA graph becomes two DataFrames —
``vertices (vertex_id, label, <attr columns…>)`` and
``edges (src, dst, label)`` — which is exactly what operators/gfd.py's
join-based matcher consumes. For graphs too big for a local file, load
vertices/edges from parquet directly; this module only bridges the
reference's file-based flows.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "parse_dot_graph",
    "dot_graph_frames",
    "parse_gfd_file",
    "verify_gfd_files",
]

_ATTR_RE = re.compile(r'(\w+)=(?:"([^"]*)"|([^\s\]";]+))')
_VERTEX_RE = re.compile(r"^(\w+)\s*\[(.*)\]\s*;?\s*$")
_EDGE_RE = re.compile(r"^(\w+)\s*(?:--|->)\s*(\w+)\s*(?:\[(.*)\])?\s*;?\s*$")
_BARE_VERTEX_RE = re.compile(r"^(\w+)\s*;?\s*$")


def _load(path_or_text: str | Path) -> str:
    s = str(path_or_text)
    if "\n" in s or "{" in s:  # literal dot/GFD text, not a path
        return s
    return Path(s).read_text()


def _parse_attrs(s: str) -> dict[str, str]:
    return {m.group(1): m.group(2) if m.group(2) is not None else m.group(3)
            for m in _ATTR_RE.finditer(s or "")}


def parse_dot_graph(
    text: str,
) -> tuple[list[dict[str, str]], list[tuple[str, str, str | None]]]:
    """Parse dot text → (vertex dicts incl. ``vertex_id``/``label``,
    edge tuples ``(src, dst, label-or-None)``)."""
    vertices: list[dict[str, str]] = []
    edges: list[tuple[str, str, str | None]] = []
    for raw in text.splitlines():
        line = raw.strip()
        if line.startswith(("graph", "digraph")):
            # header may share its line with the first statement:
            # "digraph G {0[label=a];" — keep whatever follows the brace
            line = line.split("{", 1)[1].strip() if "{" in line else ""
        if not line or line.startswith(("//", "#")) or line in ("{", "}"):
            continue
        line = line.removesuffix("}").strip()
        if not line:
            continue
        em = _EDGE_RE.match(line)
        if em:
            attrs = _parse_attrs(em.group(3) or "")
            edges.append((em.group(1), em.group(2), attrs.get("label")))
            continue
        vm = _VERTEX_RE.match(line)
        if vm:
            attrs = _parse_attrs(vm.group(2))
            vertices.append({"vertex_id": vm.group(1), **attrs})
            continue
        bm = _BARE_VERTEX_RE.match(line)
        if bm:
            vertices.append({"vertex_id": bm.group(1)})
            continue
        # silently dropping a line would yield an empty edge/vertex frame
        # and a vacuously-holding GFD — fail loudly on unsupported syntax
        raise ValueError(f"unparseable dot line: {raw!r}")
    return vertices, edges


def dot_graph_frames(
    spark: SparkSession, path_or_text: str | Path
) -> tuple[DataFrame, DataFrame]:
    """``.dot`` file (or literal dot text) → (vertices, edges) DataFrames.
    Vertex attribute columns are the union over all vertices (missing →
    NULL); all columns are strings."""
    text = _load(path_or_text)
    vrows, erows = parse_dot_graph(text)
    attr_names = ["vertex_id"] + sorted(
        {k for v in vrows for k in v} - {"vertex_id"}
    )
    vdata = [tuple(v.get(a) for a in attr_names) for v in vrows]
    vschema = ", ".join(f"`{a}` string" for a in attr_names)
    vertices = spark.createDataFrame(vdata, vschema)
    edges = spark.createDataFrame(erows, "src string, dst string, label string")
    return vertices, edges


def _parse_token(tok: str):
    m = re.match(r"^(\d+)\.(.+)$", tok)
    # (pattern var, attribute) — but attribute names are identifiers, so a
    # purely-numeric "attribute" means the token is a decimal constant
    # (e.g. 19.99), not a reference to pattern vertex 19
    if m and not m.group(2).isdigit():
        return (m.group(1), m.group(2))
    return tok  # constant


def _parse_literal_line(line: str) -> list[tuple]:
    lits = []
    # split() collapses runs of whitespace — a double space or trailing
    # blank must not produce an empty "literal"
    for item in line.split():
        lhs, rhs = item.split("=", 1)
        lits.append((_parse_token(lhs), _parse_token(rhs)))
    return lits


def parse_gfd_file(path_or_text: str | Path) -> dict:
    """GFD file → ``{premises, conclusion, pattern_vertices,
    pattern_edges}`` in the exact shapes ``gfd_verify`` consumes (pattern
    vertex vars are the dot vertex ids as strings; vertex label = the
    ``label`` attribute, None when absent)."""
    lines = _load(path_or_text).splitlines()
    premises = _parse_literal_line(lines[0] if lines else "")
    conclusion = _parse_literal_line(lines[1] if len(lines) > 1 else "")
    vrows, erows = parse_dot_graph("\n".join(lines[2:]))
    pattern_vertices = {v["vertex_id"]: v.get("label") for v in vrows}
    return {
        "premises": premises,
        "conclusion": conclusion,
        "pattern_vertices": pattern_vertices,
        "pattern_edges": erows,
    }


def verify_gfd_files(
    spark: SparkSession,
    graph_path: str | Path,
    gfd_path: str | Path,
    **kwargs,
):
    """End-to-end file-based GFD verification (the reference's
    examples/verifying_gfd flow): parse both files, run the join-based
    verifier."""
    from desbordante_spark.operators.gfd import gfd_verify

    vertices, edges = dot_graph_frames(spark, graph_path)
    spec = parse_gfd_file(gfd_path)
    return gfd_verify(
        vertices,
        edges,
        spec["pattern_vertices"],
        spec["pattern_edges"],
        spec["premises"],
        spec["conclusion"],
        **kwargs,
    )
