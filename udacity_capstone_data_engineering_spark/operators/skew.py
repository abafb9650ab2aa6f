"""Skew-mitigation operators.

AQE handles skewed JOINS automatically (skew-join splitting, enabled in
the session factory), but a skewed GROUP BY key still concentrates one
reducer. ``salted_group_agg`` is the classic two-phase fix: shard each
hot key across ``salt`` sub-keys, partially aggregate, then combine.
Results are identical to a plain groupBy for any algebraic aggregate
(sum/count/min/max) — asserted against the same oracles as the
unsalted path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (final_combine, partial_expr) per supported algebraic aggregate.
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``{out_name: (kind, sql_expr)}`` where
    kind ∈ {sum, count, min, max}.

    Phase 1 groups by (keys + random salt in [0, salt)) — the hot key's
    rows spread over ``salt`` reducers; phase 2 combines the ``salt``
    partials per key. The salt column uses a uniform random int: it
    never affects results (only placement), so nondeterminism is safe.
    """
    for name, (kind, _) in aggs.items():
        if kind not in _COMBINE:
            raise ValueError(f"{name}: unsupported algebraic kind {kind!r}")

    salted = df.withColumn("__salt", (F.rand() * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        *(
            (F.expr(f"count({expr})") if kind == "count" else F.expr(f"{kind}({expr})"))
            .alias(f"__p_{name}")
            for name, (kind, expr) in aggs.items()
        )
    )
    return partial.groupBy(*keys).agg(
        *(
            _COMBINE[kind](f"__p_{name}").alias(name)
            for name, (kind, _) in aggs.items()
        )
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join salting — for when AQE's skew splitting can't
    help (it splits map blocks of a sort-merge join, but a single key
    so hot it dwarfs executor memory, joined against a
    non-broadcastable right side, still lands on one reducer pair).

    Mechanics: the LEFT (large, skewed) side gets a random salt in
    [0, salt); the RIGHT side is replicated ``salt`` times via an
    exploded literal range; the join key becomes (key, salt). Every
    row pair of the original join appears exactly once — the left row
    carries ONE salt value and the right row exists at ALL salt values
    — so results equal the unsalted join for inner/left joins.
    Replication costs |right| × salt: use for dimension-sized right
    sides only, and prefer broadcast when it fits (salting is the
    fallback BETWEEN broadcast and plain shuffle). Random salt is safe:
    it affects placement, never membership.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right rows are replicated)")
    salted_left = left.withColumn("__salt", (F.rand() * salt).cast("int"))
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")
