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


def _blocks(names: DataFrame, max_block: int | None) -> DataFrame:
    """(name, blk) rows: each canonical name emits its first and last
    token as block keys; blocks wider than ``max_block`` names are
    dropped entirely (cap computed with a map-side-combining groupBy,
    surfaced via ``observe()`` — see :func:`entity_resolution`)."""
    toks = F.split(F.col("name"), " ")
    blocked = names.select(
        "name",
        F.explode(
            F.array_distinct(F.array(toks.getItem(0), F.element_at(toks, -1)))
        ).alias("blk"),
    ).dropDuplicates(["name", "blk"])
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
    return blocked


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
    blocked = _blocks(names, max_block)
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


def incremental_entity_resolution(
    new_df: DataFrame,
    seen_resolved: DataFrame,
    name_col: str,
    *,
    max_edit: int = 2,
    max_block: int | None = 10_000,
) -> DataFrame:
    """Resolve an ARRIVING batch against an EXISTING resolved entity
    table without re-clustering history — the ER sibling of
    :func:`~chewdata_spark.operators.dedup.incremental_ingest_dedup`
    (re-running the full transitive closure per ingest would be
    quadratic in history; production linkage assigns incrementally).

    ``seen_resolved`` is ``(name, entity_id)`` at canonical-name grain —
    the output of :func:`entity_resolution` over the existing corpus.
    Three gates, cheapest first:

    1. exact — a new name string-equal to a seen name adopts its
       entity_id (one equi-join on name; the new batch is the small
       side and broadcasts under AQE);
    2. fuzzy — survivors block against the SEEN names only (first/last
       token keys, seen-side ``max_block`` cap — history is the wide
       side at scale), verify ``levenshtein <= max_edit``, and adopt
       the MIN matching entity_id (deterministic tie-break);
    3. remainder — unmatched new names found new entities
       (``entity_id = name``, ``is_new_entity = true``).

    New-vs-new matches are deliberately NOT resolved (they join
    tomorrow's seen set — the idempotent-per-batch discipline of
    incremental ingest), and a new name matching two seen entities does
    NOT merge them (merges are a periodic full re-resolution, not an
    ingest step).  Both choices keep every gate a plain join, so the
    DuckDB oracle replays the whole operator exactly.

    Returns ``(name, entity_id, n_rows, is_new_entity)`` — one row per
    distinct canonical NEW name.
    """
    new_names = (
        new_df.select(canonical_name(F.col(name_col)).alias("name"))
        .groupBy("name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    seen = seen_resolved.select("name", "entity_id")
    exact = new_names.join(seen, "name").select(
        "name", "entity_id", "n_rows", F.lit(False).alias("is_new_entity")
    )
    rest = new_names.join(seen.select("name"), "name", "left_anti")

    sblk = _blocks(seen.select("name"), max_block).withColumnRenamed(
        "name", "sname"
    )
    nblk = _blocks(rest.select("name"), None)
    fuzzy = (
        nblk.join(sblk, "blk")
        .filter(F.abs(F.length("name") - F.length("sname")) <= max_edit)
        .dropDuplicates(["name", "sname"])
        .filter(F.levenshtein("name", "sname") <= max_edit)
        .join(
            seen.select(F.col("name").alias("sname"), "entity_id"), "sname"
        )
        .groupBy("name")
        .agg(F.min("entity_id").alias("entity_id"))
    )
    rest_out = rest.join(fuzzy, "name", "left").select(
        "name",
        F.coalesce("entity_id", "name").alias("entity_id"),
        "n_rows",
        F.col("entity_id").isNull().alias("is_new_entity"),
    )
    return exact.unionByName(rest_out)
