"""Chewdata step semantics as verifiable queries.

Each query exercises a real operator implementation from
:mod:`chewdata_spark.operators` (transformer action compiler, validator
rule assembly, generator, error channel) with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chewdata_spark.functions import faker
from chewdata_spark.operators import generator
from chewdata_spark.operators.errors import split_streams
from chewdata_spark.operators.transformer import Action, apply_actions
from chewdata_spark.operators.validator import Rule, apply_rules
from chewdata_spark.tables import load_table


# --- Transformer: compiled action list ---------------------------------------
def transformer_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge/replace/remove actions on `part` (reference
    src/step/transformer.rs:98-253) compiled to one projection."""
    part = load_table(spark, sf_dir, "part")
    actions = [
        Action("adjusted_price", "{{ input.p_retailprice * 1.1 | round(precision=2) }}", "merge"),
        Action("p_brand", "{{ input.p_brand | lower }}", "replace"),
        Action("label", "part: {{ input.p_name | upper }}", "merge"),
        Action("p_type", type="remove"),
    ]
    return apply_actions(part, actions)


TRANSFORMER_SQL = """
SELECT p_partkey, p_name, lower(p_brand) AS p_brand, p_size, p_retailprice,
       ROUND(p_retailprice * 1.1, 2) AS adjusted_price,
       concat('part: ', upper(p_name)) AS label
FROM part
"""


# --- Validator: rules → _error column ----------------------------------------
VALIDATOR_RULES = [
    Rule("quantity_max", "{{ input.l_quantity <= 45 }}", "quantity too large"),
    Rule("discount_range", "{{ input.l_discount <= 0.08 }}", "discount out of range"),
    Rule("tax_check", "{{ input.l_tax < 0.07 }}", "tax too high"),
]
VALIDATOR_SEP = "; "


def _validated_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return apply_rules(li, VALIDATOR_RULES, error_separator=VALIDATOR_SEP)


def validator_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference validator semantics: named boolean rules assemble _error per record."""
    return _validated_lineitem(spark, sf_dir).select("l_orderkey", "l_linenumber", "_error")


VALIDATOR_SQL = """
SELECT l_orderkey, l_linenumber,
       nullif(concat_ws('; ',
           CASE WHEN NOT coalesce(l_quantity <= 45, false) THEN 'quantity too large' END,
           CASE WHEN NOT coalesce(l_discount <= 0.08, false) THEN 'discount out of range' END,
           CASE WHEN NOT coalesce(l_tax < 0.07, false) THEN 'tax too high' END
       ), '') AS _error
FROM lineitem
"""


# --- Error channel: ok/err split ---------------------------------------------
def error_channel_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataResult::Ok|Err dataflow (src/lib.rs:226-302): the validator's
    output fans into ok/err streams; here we count both branches."""
    ok, err = split_streams(_validated_lineitem(spark, sf_dir))
    return (
        ok.select(F.lit("ok").alias("channel"))
        .union(err.select(F.lit("err").alias("channel")))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ERROR_SPLIT_SQL = """
WITH v AS (
    SELECT nullif(concat_ws('; ',
           CASE WHEN NOT coalesce(l_quantity <= 45, false) THEN 'quantity too large' END,
           CASE WHEN NOT coalesce(l_discount <= 0.08, false) THEN 'discount out of range' END,
           CASE WHEN NOT coalesce(l_tax < 0.07, false) THEN 'tax too high' END
       ), '') AS _error
    FROM lineitem
)
SELECT CASE WHEN _error IS NULL THEN 'ok' ELSE 'err' END AS channel, COUNT(*) AS n
FROM v GROUP BY 1
"""


# --- Generator + deterministic faker -----------------------------------------
GENERATOR_N = 1000


def generator_faker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.range seed records enriched with deterministic faker columns
    (reference generator src/step/generator.rs:85-179 + faker.rs)."""
    df = generator.generate(spark, GENERATOR_N)
    seed = F.col("id")
    return df.select(
        "id",
        faker.fake_first_name(seed).alias("first_name"),
        faker.fake_country_code(seed).alias("country"),
        faker.fake_email(seed).alias("email"),
        faker.fake_phone_number(seed).alias("phone"),
        F.round((seed * 37 % 1000).cast("double") / 7.0, 3).alias("score"),
    )


GENERATOR_SQL = f"""
SELECT r AS id,
       {faker.pick_sql('r', faker.FIRST_NAMES, 1)} AS first_name,
       {faker.pick_sql('r', faker.COUNTRY_CODES, 4)} AS country,
       concat(lower({faker.pick_sql('r', faker.FIRST_NAMES, 1)}), '.',
              lower({faker.pick_sql('r', faker.LAST_NAMES, 2)}), '@example.com') AS email,
       concat('+1-555-', lpad(CAST((r * {faker.KNUTH} + 8) % {faker.P} % 10000 AS VARCHAR), 4, '0')) AS phone,
       ROUND(CAST(r * 37 % 1000 AS DOUBLE) / 7.0, 3) AS score
FROM range({GENERATOR_N}) t(r)
"""


# --- Generator duplication mode ----------------------------------------------
def generator_duplicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate each region row 3x with a copy_id (reference duplication
    mode) — explode(array_repeat), no shuffle."""
    region = load_table(spark, sf_dir, "region")
    return generator.duplicate(region, 3).select("r_regionkey", "r_name", "copy_id")


GENERATOR_DUP_SQL = """
SELECT r_regionkey, r_name, CAST(c AS INT) AS copy_id
FROM region, range(3) t(c)
"""


QUERIES = {
    "transformer_actions": transformer_actions,
    "validator_rules": validator_rules,
    "error_channel_split": error_channel_split,
    "generator_faker": generator_faker,
    "generator_duplicate": generator_duplicate,
}

ORACLES = {
    "transformer_actions": TRANSFORMER_SQL,
    "validator_rules": VALIDATOR_SQL,
    "error_channel_split": ERROR_SPLIT_SQL,
    "generator_faker": GENERATOR_SQL,
    "generator_duplicate": GENERATOR_DUP_SQL,
}
