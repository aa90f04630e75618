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
   key), never all-pairs;
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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.operators.graph import connected_components


def canonical_name(col: Column) -> Column:
    """lower/trim/single-space canonical form of a name column."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def entity_resolution(
    df: DataFrame,
    name_col: str,
    *,
    max_edit: int = 2,
) -> DataFrame:
    """(name, entity_id, n_rows, entity_size) — one row per distinct
    canonical name; ``entity_id`` is the min name of its match
    component, ``n_rows`` the source rows carrying that name,
    ``entity_size`` the number of distinct names resolved into the
    entity.  Match rule: (first OR last token equal) AND
    levenshtein <= ``max_edit``.
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
