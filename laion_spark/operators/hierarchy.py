"""Hierarchical dictionary traversal — ClickHouse ``dictGetHierarchy`` /
``dictGetDescendants`` semantics on Spark.

The reference delegates every dictionary feature to its ClickHouse
server (reference search.py builds flat SQL only), so this module is
part of the §2 analytic surface the rebuild owns. A hierarchy
dictionary is any DataFrame with a node column and a parent column
where following parents terminates at a root sentinel.

Scale shape: the walk is a bounded pointer-chase — each round joins
the current frontier against the (small) dictionary with an explicit
``broadcast()``, so the fact side never shuffles on the walk key and
the number of rounds is bounded by the tree depth, not the row count.
At 100 TB the dictionary is exactly the kind of dimension table that
must broadcast; a dictionary too large to broadcast should be bucketed
by node and the same loop works with a co-located join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resolve_depths", "with_ancestors"]


def resolve_depths(
    dict_df: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    root: int = 0,
    max_depth: int = 21,
) -> DataFrame:
    """Per-node depth (number of parent hops to reach ``root``).

    ``max_depth`` bounds the unrolled walk; 21 rounds cover any
    dictionary whose parents at least halve the key (2^21 > 2M keys).
    Nodes that fail to reach the root within the bound keep the depth
    reached so far (a cycle would otherwise never terminate — callers
    that need strictness can assert on ``reached_root``).

    Returns columns ``(node, depth, reached_root)`` with ``depth`` as
    LONG and ``reached_root`` a boolean that is false exactly for the
    nodes the bound cut off (cycles or chains deeper than
    ``max_depth``).
    """
    d = dict_df.select(
        F.col(node_col).alias("_h_node"), F.col(parent_col).alias("_h_parent")
    )
    walk = d.select(
        F.col("_h_node").alias("node"),
        F.col("_h_node").alias("cur"),
        F.lit(0).cast("long").alias("depth"),
    )
    for _ in range(max_depth):
        walk = walk.join(
            F.broadcast(d), walk.cur == d._h_node, "left"
        ).select(
            "node",
            F.when(F.col("cur") > root, F.coalesce("_h_parent", F.lit(root)))
            .otherwise(root)
            .cast("long")
            .alias("cur"),
            (F.col("depth") + F.when(F.col("cur") > root, 1).otherwise(0))
            .cast("long")
            .alias("depth"),
        )
    # the walk's own step test treats cur <= root as terminated, so the
    # strictness flag must use the same predicate
    return walk.select(
        "node", "depth", (F.col("cur") <= root).alias("reached_root")
    )


def with_ancestors(
    resolved: DataFrame,
    dict_df: DataFrame,
    node_col: str = "node",
    parent_col: str = "parent",
    levels: int = 2,
    root: int = 0,
) -> DataFrame:
    """Attach ``anc1..ancN`` columns (parent, grandparent, ...) to a
    node-keyed DataFrame via ``levels`` chained broadcast lookups;
    hops past the root stay at the root sentinel."""
    out = resolved
    prev = node_col
    for i in range(1, levels + 1):
        alias = f"anc{i}"
        d = dict_df.select(
            F.col(node_col).alias(f"_a_node{i}"),
            F.col(parent_col).alias(f"_a_parent{i}"),
        )
        out = (
            out.join(F.broadcast(d), F.col(prev) == F.col(f"_a_node{i}"), "left")
            .withColumn(
                alias,
                F.coalesce(F.col(f"_a_parent{i}"), F.lit(root)).cast("long"),
            )
            .drop(f"_a_node{i}", f"_a_parent{i}")
        )
        prev = alias
    return out
