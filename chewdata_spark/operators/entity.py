"""Entity resolution (record linkage): blocked fuzzy matching + transitive
closure, at NAME grain.

Beyond the reference surface (chewdata's validator exposes fuzzy string
predicates only, src/updater/tera_helpers/string.rs — it has no linkage
step); this is the standard large-scale ER pipeline re-expressed in
DataFrame ops:

1. canonicalize the name (lower/trim/space-squeeze) and aggregate to the
   DISTINCT-name grain first — the match never runs at row grain, so
   100 TB of rows cost one groupBy before any pairwise work;
2. multi-key blocking: each name emits its first and last token as block
   keys; candidates are generated ONLY inside blocks (equi-join on the
   key), never all-pairs — and blocks wider than ``max_block`` names are
   dropped entirely (cap mirrored in the SQL oracle, surfaced via
   ``observe()``), so no single ubiquitous token can create a quadratic
   block;
3. a length filter ``abs(len_a - len_b) <= max_edit`` prunes inside the
   block before the levenshtein verify (edit distance >= length gap);
4. verified match edges feed :func:`~chewdata_spark.operators.graph.
   connected_components` (alternating-star, O(log n) rounds); the
   entity id is the component's lexicographic-minimum canonical name.

The block keys are PART OF THE MATCH RULE (names matching in neither
their first nor last token are distinct entities even at small edit
distance) — standard practice in production linkage, and what makes the
semantics exactly SQL-replayable: the DuckDB oracle applies the same
rule with a recursive-CTE closure, no approximation to excuse.
"""

from __future__ import annotations

import itertools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.operators.graph import connected_components

_OBS_SEQ = itertools.count()


def canonical_name(col: Column) -> Column:
    """lower/trim/single-space canonical form of a name column."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def entity_resolution(
    df: DataFrame,
    name_col: str,
    *,
    max_edit: int = 2,
    max_block: int | None = 10_000,
) -> DataFrame:
    """(name, entity_id, n_rows, entity_size) — one row per distinct
    canonical name; ``entity_id`` is the min name of its match
    component, ``n_rows`` the source rows carrying that name,
    ``entity_size`` the number of distinct names resolved into the
    entity.  Match rule: (first or last token shared, through a block of
    width <= ``max_block``) AND levenshtein <= ``max_edit``.

    Hot-block cap: the within-block candidate join is O(block²), so a
    ubiquitous boundary token ("inc", "john") would otherwise make one
    quadratic block at scale.  Blocks wider than ``max_block`` names are
    dropped ENTIRELY before the self-join — same discipline as the LSH
    family's hot-bucket cap: the cap is part of the declared semantics,
    mirrored in the SQL oracle via a HAVING on the block grain, and
    surfaced (never silent) through ``observe()`` as
    ``entity_resolution_<n>/dropped_hot_blocks``.  A pair sharing BOTH a
    hot and a non-hot block still matches through the non-hot one.
    Block widths are computed with a groupBy (map-side combine), not a
    window, so a hot block never funnels its rows through one task.
    Pass ``max_block=None`` to disable.
    """
    names = (
        df.select(canonical_name(F.col(name_col)).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    toks = F.split(F.col("name"), " ")
    blocked = (
        names.select(
            "name",
            F.explode(
                F.array_distinct(
                    F.array(toks.getItem(0), F.element_at(toks, -1))
                )
            ).alias("blk"),
        )
        .dropDuplicates(["name", "blk"])
    )
    if max_block is not None:
        keep = (
            blocked.groupBy("blk")
            .agg(F.count(F.lit(1)).alias("_bw"))
            .observe(
                f"entity_resolution_{next(_OBS_SEQ)}",
                F.sum(
                    F.when(F.col("_bw") > max_block, 1).otherwise(0)
                ).alias("dropped_hot_blocks"),
            )
            .filter(F.col("_bw") <= max_block)
            .select("blk")
        )
        blocked = blocked.join(keep, "blk")
    a, b = blocked.alias("a"), blocked.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.name") < F.col("b.name"))
            & (
                F.abs(F.length(F.col("a.name")) - F.length(F.col("b.name")))
                <= max_edit
            ),
        )
        .select(F.col("a.name").alias("id_a"), F.col("b.name").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.levenshtein("id_a", "id_b") <= max_edit)
    )
    labels = connected_components(edges)
    out = (
        names.join(labels, names["name"] == labels["node"], "left")
        .withColumn("entity_id", F.coalesce("cluster_id", "name"))
        .select("name", "entity_id", "n_rows")
    )
    return out.withColumn(
        "entity_size",
        F.count(F.lit(1)).over(Window.partitionBy("entity_id")),
    )
