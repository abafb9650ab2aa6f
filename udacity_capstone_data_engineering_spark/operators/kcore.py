"""k-core decomposition by fixed-round peeling: the graph-tier
density filter (connected components -> PageRank -> triangles ->
k-core).

The k-core is the maximal subgraph where every vertex keeps degree
>= k — the standard "dense cohort" extractor (community seeds,
spam/bot rings, co-purchase bundles). Peeling computes it: repeatedly
delete vertices of degree < k; what survives is the k-core.

Determinism/oracle story (the PageRank pattern a third time): run a
FIXED number of peel rounds. Each round is pure set algebra on
integers — degree count, threshold filter, endpoint semi-joins — so
the state after round T is engine-exact and the DuckDB twin just
unrolls T CTE blocks. When peeling converges within T rounds (it
does on the driver data; each extra round is idempotent on a
fixpoint) the output IS the k-core; the operator raises if the
caller asks for a convergence check and it hasn't settled.

Scale shape: per round one degree aggregation + two semi-joins, all
on the EDGE LIST (never the corpus); lineage cut per round with
localCheckpoint like every iterative operator in the house. Rounds
needed in the wild is small (the degeneracy ordering collapses fast);
a 100 TB run picks T by monitoring the removed-vertex count per
round, which is a 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _peel_once(e: DataFrame, k: int) -> DataFrame:
    """One peel round: degree count, threshold, and two endpoint
    LEFT-SEMI joins — pure set algebra on the edge list."""
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    keep = deg.filter(F.col("d") >= k)
    return e.join(keep.select("src"), "src", "left_semi").join(
        keep.select(F.col("src").alias("dst")), "dst", "left_semi"
    )


def kcore_fixed(
    edges: DataFrame,
    k: int,
    rounds: int,
    src: str = "src",
    dst: str = "dst",
    require_converged: bool = False,
) -> DataFrame:
    """``(node, core_deg)`` for every vertex surviving ``rounds``
    peels of the degree-< k rule over a DIRECTED (symmetrized) edge
    list. With convergence inside ``rounds`` this is exactly the
    k-core and ``core_deg`` its internal degree."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    for _ in range(rounds):
        # localCheckpoint cuts lineage per round (iterative plans grow
        # exponentially otherwise) — which also hides the round's plan
        # from the final DataFrame; plan tests inspect _peel_once
        e = _peel_once(e, k).localCheckpoint(eager=False)
    if require_converged:
        # one more peel must remove nothing
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        n_low = deg.filter(F.col("d") < k).limit(1).count()
        if n_low:
            raise RuntimeError(
                f"k-core peeling not converged after {rounds} rounds"
            )
    return e.groupBy("src").agg(F.count(F.lit(1)).alias("core_deg")).select(
        F.col("src").alias("node"), "core_deg"
    )


def kcore_oracle_blocks(
    sym_cte: str, k: int, rounds: int
) -> tuple[list[str], str]:
    """Unrolled peel rounds over an existing symmetric-edge CTE named
    ``sym_cte``; returns (blocks, final_edge_cte_name).

    Every ``ke_t`` / ``kkeep_t`` is AS MATERIALIZED: each round reads
    the previous edge relation TWICE (degree count + filter), so plain
    CTE inlining doubles per round — 2^rounds copies of the base scan
    (measured: a 10-round chain exhausted the file-handle limit
    before it exhausted the planner)."""
    blocks = [f"ke_0 AS MATERIALIZED (SELECT src, dst FROM {sym_cte})"]
    for t in range(1, rounds + 1):
        blocks.append(
            f"""kdeg_{t} AS (
      SELECT src, count(*) AS d FROM ke_{t - 1} GROUP BY 1),
    kkeep_{t} AS MATERIALIZED (
      SELECT src AS node FROM kdeg_{t} WHERE d >= {k}),
    ke_{t} AS MATERIALIZED (
      SELECT e.src, e.dst FROM ke_{t - 1} e
      JOIN kkeep_{t} ka ON e.src = ka.node
      JOIN kkeep_{t} kb ON e.dst = kb.node)"""
        )
    return blocks, f"ke_{rounds}"
