"""Connected components over duplicate-pair edges: the step that turns
near-dup PAIRS into dedup GROUPS (keep one representative per
component, drop the rest) — the actual deliverable of a corpus dedup
pass.

Algorithm: iterative minimum-label propagation (the standard
Pregel-style formulation expressed in DataFrames):

  label(v) ← min(v, min over neighbors' labels), iterate to fixpoint.

Each iteration is one join + one aggregation (both on the edge list,
which for dedup is ≪ corpus); rounds needed = graph diameter, and
duplicate clusters are near-cliques, so it converges in 2-3 rounds in
practice. The fixpoint (label = min id of the component) is unique and
engine-independent — oracle-checkable against a recursive-CTE SQL
implementation.

A hard ``max_iterations`` bounds pathological chains; hitting it
raises rather than silently returning a non-fixpoint (no silent caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge list; component =
    min node id reachable. Nodes not in any pair are not emitted
    (callers union-in singletons if they need full coverage)."""
    # Persist the directed edge list: it is joined EVERY propagation
    # round (and labels are seeded from it), but its lineage is the
    # caller's whole pair-detection chain (minhash -> LSH -> jaccard
    # for dedup) — without the persist each round re-runs that chain,
    # because exchange reuse does not span the loop's separate jobs.
    # The edge list itself is ≪ corpus (near-dup pairs only).
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("component")
    )
    for _ in range(max_iterations):
        # candidate labels: own + min over neighbors' current labels
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        # convergence: no label changed this round
        changed = (
            labels.alias("old")
            .join(updated.alias("new"), "node")
            .filter(F.col("old.component") != F.col("new.component"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            return labels
        # Cut lineage each round: iterative self-referential plans grow
        # exponentially otherwise. localCheckpoint keeps it executor-side.
        labels = labels.localCheckpoint(eager=True)
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} iterations"
    )


def dedup_groups(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Full dedup verdict per row: (id, component, is_representative).
    Rows in no pair are their own singleton component. Downstream keeps
    ``is_representative`` rows only."""
    comps = connected_components(pairs, id_a, id_b)
    out = (
        df.select(F.col(id_col).alias("node"))
        .join(comps, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("component", "node").alias("component"),
        )
    )
    return out.withColumn(
        "is_representative", F.col(id_col) == F.col("component")
    )


def pagerank_fixed(
    edges: DataFrame,
    iterations: int = 5,
    mass_scale: int = 1_000_000_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic:
    ``(node, pr_mass)`` after ``iterations`` rounds of

        pr'(v) = 0.15 * scale + floor(17 * S(v) / 20),
        S(v)   = sum over in-edges (u, v) of floor(pr(u) / deg(u))

    with every quantity a BIGINT multiple of ``1/mass_scale``.  Why
    integers: float PageRank sums are order-dependent, so two engines
    (or two shuffles) disagree in the last ulps and value-hash gates
    break.  Integer division and integer sums are exact, associative,
    and engine-identical — the fixpoint of the DETERMINISTIC recurrence
    is bit-equal everywhere, which makes an iterative graph algorithm
    oracle-pairable (the DuckDB twin unrolls the same recurrence).
    Damping 0.85 is the exact rational 17/20.

    ``edges`` must be DIRECTED (symmetrize an undirected graph first);
    every node must appear as a source (true after symmetrization).
    Per-round cost: one join of the edge list against the |V|-sized
    rank relation + one groupBy — the same scale shape as
    ``connected_components``.  Lineage is cut per round.  Overflow
    bound: 17 * total_mass must stay under 2^63 — total mass is
    ~|V| * mass_scale, so at |V| ~ 1e9 drop ``mass_scale`` to 1e6
    (precision is relative to mass_scale, not the graph)."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .persist()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    pr = deg.select(
        F.col("src").alias("node"),
        F.lit(mass_scale).cast("long").alias("pr_mass"),
    )
    base = (3 * mass_scale) // 20  # 0.15 * scale, exact
    for _ in range(iterations):
        contribs = (
            pr.join(deg, pr.node == deg.src)
            .select(
                F.col("node").alias("u"),
                F.expr("pr_mass DIV deg").alias("m"),
            )
            .join(e, F.col("u") == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("m").alias("s"))
        )
        pr = (
            deg.select(F.col("src").alias("node"))
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base).cast("long")
                    + F.expr("(17 * coalesce(s, CAST(0 AS BIGINT))) DIV 20")
                ).alias("pr_mass"),
            )
        )
        pr = pr.localCheckpoint(eager=False)
    return pr
