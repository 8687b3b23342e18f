"""Graph functional dependency (GFD) verification.

Reference semantics (/root/reference/src/core/algorithms/gfd/): a GFD is a
small pattern graph Q plus premise/conclusion literals; each literal compares
two tokens, a token being either ``(pattern_vertex, attribute)`` or a
constant (gfd.h:7-14). The GFD holds iff EVERY isomorphic embedding of Q in
the data graph that satisfies all premises also satisfies the conclusion
(naivegfd_validation.cpp:34-90 — a missing attribute makes its literal
false). The reference matches embeddings with VF2 and distributes candidate
pieces with a balancer; validation is embedding-at-a-time.

Spark-first re-expression — the graph is relational:

- ``vertices``: one row per vertex, ``(vertex_id, label, <attribute
  columns...>)`` (attributes are plain columns, not a map — Catalyst prunes
  to the attributes the literals actually reference).
- ``edges``: ``(src, dst, label)``; undirected by default (the reference's
  ``graph_t`` is undirected) via a symmetric union.
- Pattern matching = one hash equi-join per pattern edge: bind an unbound
  endpoint by joining the (distinct) edge table, then the new vertex's
  candidate frame. Injectivity (isomorphism, not homomorphism) is a pairwise
  inequality filter. No UDFs, no driver-side search — a 100-TB edge table
  shuffles once per pattern edge, and AQE handles skewed hubs.
- Literals become boolean columns; a NULL attribute makes the literal false
  (missing-attribute rule above).

Match explosion is inherent to dense patterns (same in the reference; its
balancer only spreads the work) — keep patterns small and selective.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from desbordante_spark.model import VerificationResult

__all__ = ["gfd_matches", "gfd_violations", "gfd_metrics_df", "gfd_verify"]

Token = tuple[str, str]  # (pattern var, attribute column) — else a constant


def _literal_col(lit: tuple) -> F.Column:
    """Literal (token, token) → boolean column; NULL side ⇒ false."""
    sides = []
    for tok in lit:
        if isinstance(tok, tuple):
            var, attr = tok
            sides.append(F.col(f"{var}__{attr}"))
        else:
            sides.append(F.lit(tok))
    eq = (sides[0] == sides[1]) & sides[0].isNotNull() & sides[1].isNotNull()
    return F.coalesce(eq, F.lit(False))


def _all_of(lits: Sequence[tuple]) -> F.Column:
    out = F.lit(True)
    for lit in lits:
        out = out & _literal_col(lit)
    return out


def gfd_matches(
    vertices: DataFrame,
    edges: DataFrame,
    pattern_vertices: Mapping[str, str | None],
    pattern_edges: Sequence[tuple[str, str, str | None]],
    attrs: Mapping[str, Sequence[str]] | None = None,
    id_col: str = "vertex_id",
    label_col: str = "label",
    src_col: str = "src",
    dst_col: str = "dst",
    edge_label_col: str = "label",
    directed: bool = False,
) -> DataFrame:
    """All isomorphic embeddings of the pattern:
    one row per match with ``<var>__id`` plus ``<var>__<attr>`` columns.

    ``pattern_vertices``: var → required vertex label (None = any);
    ``pattern_edges``: (var_a, var_b, edge label or None);
    ``attrs``: var → attribute columns to carry (defaults to none — pass the
    ones your literals need).
    """
    attrs = dict(attrs or {})
    # symmetric edge view for undirected semantics; distinct so parallel
    # duplicate edges can't multiply embeddings
    e = edges.select(
        F.col(src_col).alias("_s"),
        F.col(dst_col).alias("_d"),
        F.col(edge_label_col).alias("_l"),
    )
    if not directed:
        e = e.unionByName(
            e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"), "_l")
        )
    e = e.distinct()

    def cand(var: str) -> DataFrame:
        c = vertices
        lbl = pattern_vertices[var]
        if lbl is not None:
            c = c.filter(F.col(label_col) == F.lit(lbl))
        cols = [F.col(id_col).alias(f"{var}__id")]
        for a in attrs.get(var, ()):
            cols.append(F.col(a).alias(f"{var}__{a}"))
        return c.select(*cols)

    bound: set[str] = set()
    matched: DataFrame | None = None
    remaining = list(pattern_edges)
    # BFS over pattern edges: always extend from a bound endpoint when one
    # exists (keeps every join an equi-join on an existing column)
    while remaining:
        pick = next(
            (pe for pe in remaining if pe[0] in bound or pe[1] in bound),
            remaining[0],
        )
        remaining.remove(pick)
        a, b, lbl = pick
        if lbl is None:
            # distinct over (_s,_d,_l) is NOT distinct over (_s,_d): a
            # multigraph edge with the same endpoints under two labels would
            # multiply embeddings for an unlabeled pattern edge.
            el = e.select("_s", "_d").distinct()
        else:
            el = e.filter(F.col("_l") == F.lit(lbl)).select("_s", "_d")
        if matched is None:
            matched = (
                cand(a)
                .join(el, F.col(f"{a}__id") == F.col("_s"))
                .join(cand(b), F.col("_d") == F.col(f"{b}__id"))
                .drop("_s", "_d")
            )
            bound |= {a, b}
        elif a in bound and b in bound:
            # closing edge: require existence between two bound vertices
            matched = matched.join(
                el,
                (F.col(f"{a}__id") == F.col("_s"))
                & (F.col(f"{b}__id") == F.col("_d")),
            ).drop("_s", "_d")
        else:
            if b in bound:  # orient so the bound side is `a`
                a, b = b, a
            if a not in bound:
                # disconnected component: seed it with a's candidates, then
                # extend along this edge as usual
                matched = matched.crossJoin(cand(a))
                bound.add(a)
            matched = (
                matched.join(el, F.col(f"{a}__id") == F.col("_s"))
                .join(cand(b), F.col("_d") == F.col(f"{b}__id"))
                .drop("_s", "_d")
            )
            bound.add(b)
    for var in pattern_vertices:  # isolated pattern vertices
        if var not in bound:
            matched = cand(var) if matched is None else matched.crossJoin(cand(var))
            bound.add(var)
    assert matched is not None
    # injectivity (isomorphism): all matched vertices pairwise distinct
    vs = list(pattern_vertices)
    for i in range(len(vs)):
        for j in range(i + 1, len(vs)):
            matched = matched.filter(
                F.col(f"{vs[i]}__id") != F.col(f"{vs[j]}__id")
            )
    return matched


def gfd_violations(
    vertices: DataFrame,
    edges: DataFrame,
    pattern_vertices: Mapping[str, str | None],
    pattern_edges: Sequence[tuple[str, str, str | None]],
    premises: Sequence[tuple],
    conclusion: Sequence[tuple],
    **kwargs,
) -> DataFrame:
    """Embeddings satisfying every premise but violating the conclusion."""
    m = gfd_matches(
        vertices, edges, pattern_vertices, pattern_edges,
        attrs=_referenced_attrs(premises, conclusion), **kwargs,
    )
    return m.filter(_all_of(premises) & ~_all_of(conclusion))


def _referenced_attrs(
    premises: Sequence[tuple], conclusion: Sequence[tuple]
) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for lit in (*premises, *conclusion):
        for tok in lit:
            if isinstance(tok, tuple):
                var, attr = tok
                if attr not in out.setdefault(var, []):
                    out[var].append(attr)
    return out


def gfd_metrics_df(
    vertices: DataFrame,
    edges: DataFrame,
    pattern_vertices: Mapping[str, str | None],
    pattern_edges: Sequence[tuple[str, str, str | None]],
    premises: Sequence[tuple],
    conclusion: Sequence[tuple],
    **kwargs,
) -> DataFrame:
    """One-row verdict: ``(total_matches, premise_matches, num_violations,
    error, holds)`` — error = violating fraction of premise-satisfying
    embeddings. ONE matching pass (conditional aggregates)."""
    m = gfd_matches(
        vertices, edges, pattern_vertices, pattern_edges,
        attrs=_referenced_attrs(premises, conclusion), **kwargs,
    )
    prem = _all_of(premises)
    concl = _all_of(conclusion)
    agg = m.agg(
        F.count(F.lit(1)).cast("long").alias("total_matches"),
        F.coalesce(F.sum(prem.cast("long")), F.lit(0)).cast("long")
        .alias("premise_matches"),
        F.coalesce(F.sum((prem & ~concl).cast("long")), F.lit(0)).cast("long")
        .alias("num_violations"),
    )
    return agg.select(
        "total_matches",
        "premise_matches",
        "num_violations",
        F.when(
            F.col("premise_matches") > 0,
            F.col("num_violations").cast("double")
            / F.col("premise_matches").cast("double"),
        ).otherwise(F.lit(0.0)).alias("error"),
        (F.col("num_violations") == 0).cast("int").alias("holds"),
    )


def gfd_verify(
    vertices: DataFrame,
    edges: DataFrame,
    pattern_vertices: Mapping[str, str | None],
    pattern_edges: Sequence[tuple[str, str, str | None]],
    premises: Sequence[tuple],
    conclusion: Sequence[tuple],
    **kwargs,
) -> VerificationResult:
    """GFD verdict (naivegfd_validation.cpp semantics: holds iff no
    embedding satisfies premises and breaks the conclusion)."""
    row = gfd_metrics_df(
        vertices, edges, pattern_vertices, pattern_edges, premises,
        conclusion, **kwargs,
    ).collect()[0]
    nv = int(row["num_violations"])
    return VerificationResult(
        holds=nv == 0,
        error=float(row["error"]),
        num_violating_clusters=nv,
        num_violating_rows=nv,
        total_rows=int(row["total_matches"]),
        violations=gfd_violations(
            vertices, edges, pattern_vertices, pattern_edges, premises,
            conclusion, **kwargs,
        ),
        details={"premise_matches": int(row["premise_matches"])},
    )
