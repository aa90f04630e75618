"""Relational core: joins, aggregations, windows, set ops, sort/limit.

The reference engine has no first-class relational algebra (SURVEY §2.8)
— it delegates to pushdown backends (Postgres SQL, S3 Select, Mongo
filters).  Our engine exposes these through native Spark DataFrame ops
so Catalyst plans them: broadcast joins for dimension tables, partial
aggregation map-side, AQE skew handling at scale.

Scale notes (100 TB):
- ``region``/``nation`` are always broadcast (constant size).
- Fact-fact joins (orders x lineitem) shuffle on the join key — the key
  is the natural partition key, so a bucketed layout on l_orderkey /
  o_orderkey removes the shuffle entirely; AQE handles skew otherwise.
- All aggregates use built-in functions → whole-stage codegen; doubles
  in final outputs are rounded so results are stable across summation
  orders (Spark's partial aggregation order differs run to run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chewdata_spark.operators.rangejoin import interval_overlap_join
from chewdata_spark.tables import load_table


# --- TPC-H Q1 style pricing summary -----------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy aggregation: predicate pushdown + map-side partial agg.

    Reference parity: chewdata can only express this by pushing SQL to
    Postgres (src/connector/psql.rs:406-409); here it is a native plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3 style: fact-fact join + top-N ---------------------------------
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem with top-N.

    customer is broadcast (small side); orders⋈lineitem shuffles on
    orderkey.  The limit is pushed through a TakeOrderedAndProject so
    only N rows reach the driver.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- TPC-H Q5 style: star join through broadcast dims -----------------------
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by nation where customer and supplier share the nation.

    region/nation are broadcast; the only shuffles are the two fact
    joins (orders⋈customer on custkey, lineitem⋈supplier on suppkey) —
    exactly the plan a 1000-executor run wants.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name, r_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# --- Window function: top orders per customer --------------------------------
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() over (partition by custkey order by totalprice desc)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


TOP_ORDERS_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
    FROM orders
) t
WHERE rn <= 3
"""


# --- Aggregation + HAVING -----------------------------------------------------
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order count / total / avg (HAVING-gated aggregation)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
            F.round(F.max("o_totalprice"), 2).alias("max_order"),
        )
        .filter(F.col("n_orders") >= 3)
    )


CUSTOMER_STATS_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_spent,
       ROUND(MAX(o_totalprice), 2) AS max_order
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 3
"""


# --- Set operations -----------------------------------------------------------
def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with 1997 orders EXCEPT customers with 1998 orders."""
    orders = load_table(spark, sf_dir, "orders")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey")
    return y97.distinct().subtract(y98.distinct()).select(F.col("o_custkey").alias("custkey"))


CHURNED_SQL = """
SELECT DISTINCT o_custkey AS custkey
FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
EXCEPT
SELECT DISTINCT o_custkey AS custkey
FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
"""


# --- Semi / anti joins (the validator "exists in referential" idiom) ---------
def customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi join ≡ the reference's referential-existence validation
    (src/step/validator.rs:66 `filter(attribute=..., value=input.code)`)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with zero orders (the null-safe NOT IN)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# --- Broadcast referential lookup (chewdata `referentials`) ------------------
def referential_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference materializes named sub-readers into an in-memory map
    injected into templates (src/step/referential.rs:16-126).  Spark-first:
    a broadcast hash join — same semantics, executor-side, no collect."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


REFERENTIAL_SQL = """
SELECT n_name AS nation, r_name AS region, COUNT(*) AS n_customers,
       ROUND(AVG(c_acctbal), 4) AS avg_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY n_name, r_name
"""


# --- Sort + limit -------------------------------------------------------------
def top_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 orders by totalprice (TakeOrderedAndProject, no full sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


TOP_VALUE_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""


# --- Event-time rollup (batch shape of the streaming tumbling window) --------
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling hourly counts+sums per event type (batch twin of the streaming window)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


# --- JSON extraction (chewdata entry_path / nested access) -------------------
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference drills into JSON via RFC6901 pointers (entry_path,
    src/document/json.rs).  Spark: get_json_object on the JSON column."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


EVENTS_PROPS_SQL = """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
"""


# --- Sessionization (gaps-and-islands; streaming variant in streaming/) ------
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user via lag + running sum — the batch
    equivalent of session_window() in Structured Streaming."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 1800
    with_sess = ev.withColumn(
        "session_id", F.sum(F.when(gap, 1).otherwise(0)).over(w)
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


SESSIONIZE_SQL = """
WITH g AS (
    SELECT user_id, ts, event_id, value,
           CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
                THEN 1 ELSE 0 END AS new_sess
    FROM events
), s AS (
    SELECT user_id, ts, value,
           CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM g
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, ROUND(SUM(value), 2) AS session_value
FROM s
GROUP BY user_id, session_id
"""


# --- INTERSECT + string similarity + null handling ---------------------------
def loyal_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custkeys ordering in both 1997 AND 1998 (INTERSECT set op)."""
    orders = load_table(spark, sf_dir, "orders")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey").distinct()
    y98 = orders.filter(F.year("o_orderdate") == 1998).select("o_custkey").distinct()
    return y97.intersect(y98).select(F.col("o_custkey").alias("custkey"))


LOYAL_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1997
INTERSECT
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1998
"""


def part_name_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance between name and type per part —
    string-similarity surface (validator fuzzy-match idiom)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.levenshtein(F.lower("p_name"), F.lower("p_type")).cast("bigint").alias("name_type_dist"),
        F.length("p_name").alias("name_len"),
    )


LEVENSHTEIN_SQL = """
SELECT p_partkey, levenshtein(lower(p_name), lower(p_type)) AS name_type_dist,
       CAST(length(p_name) AS INT) AS name_len
FROM part
"""


def events_missing_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-channel handling: absent JSON keys → coalesce defaults
    (the reference's `default` filter semantics)."""
    ev = load_table(spark, sf_dir, "events")
    k2 = F.get_json_object("props", "$.missing_key").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.coalesce(k2, F.lit(-1))).alias("sum_with_default"),
        F.count(k2).alias("n_present"),
    )


MISSING_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.missing_key') AS INT), -1)) AS BIGINT) AS sum_with_default,
       COUNT(CAST(json_extract_string(props, '$.missing_key') AS INT)) AS n_present
FROM events
GROUP BY event_type
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "loyal_customers": loyal_customers,
    "part_name_similarity": part_name_similarity,
    "events_missing_props": events_missing_props,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "top_orders_per_customer": top_orders_per_customer,
    "customer_order_stats": customer_order_stats,
    "churned_customers": churned_customers,
    "customers_with_open_orders": customers_with_open_orders,
    "customers_without_orders": customers_without_orders,
    "referential_lookup": referential_lookup,
    "top_value_orders": top_value_orders,
    "events_hourly_rollup": events_hourly_rollup,
    "events_props_extract": events_props_extract,
    "sessionize_events": sessionize_events,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "loyal_customers": LOYAL_SQL,
    "part_name_similarity": LEVENSHTEIN_SQL,
    "events_missing_props": MISSING_PROPS_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "top_orders_per_customer": TOP_ORDERS_SQL,
    "customer_order_stats": CUSTOMER_STATS_SQL,
    "churned_customers": CHURNED_SQL,
    "customers_with_open_orders": SEMI_SQL,
    "customers_without_orders": ANTI_SQL,
    "referential_lookup": REFERENTIAL_SQL,
    "top_value_orders": TOP_VALUE_SQL,
    "events_hourly_rollup": EVENTS_HOURLY_SQL,
    "events_props_extract": EVENTS_PROPS_SQL,
    "sessionize_events": SESSIONIZE_SQL,
}


def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining: part pairs co-ordered in the same order,
    with co-occurrence count ≥ 2 — the classic basket analysis.

    Scale shape: the pair fan-out is a SELF-JOIN ON l_orderkey with
    p_a < p_b — bounded by per-order line count (≤ 7 in TPC-H data,
    small by schema design), so intermediate rows ≈ |lineitem| × avg
    basket size, then one (p_a, p_b)-keyed count with map-side
    partials.  The (order, part) grain is DISTINCT first — a part on
    several lines of one order must not let the pair clear the
    ≥2-orders threshold from a single order.  A per-order collect_list
    + explode-pairs plan would build the same rows with extra array
    materialization."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a = li.alias("a")
    b = li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("p_a"), F.col("b.l_partkey").alias("p_b")
    )
    return (
        pairs.groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


MARKET_BASKET_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, COUNT(*) AS n_orders
FROM li a
JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""

QUERIES["market_basket_pairs"] = market_basket_pairs
ORACLES["market_basket_pairs"] = MARKET_BASKET_SQL


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the co-purchase graph (edges = part pairs
    co-ordered ≥ 2 times): the standard two-join formulation on
    canonically ordered edges (u < v < w), so each triangle is counted
    exactly once and the join fan-out is bounded by the ordered
    adjacency lists — the distributed-graph classic.  Returns one row
    (n_edges, n_triangles).  Edges inherit market_basket_pairs' grain:
    DISTINCT (order, part) first."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")),
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return edges.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(tri)


TRIANGLES_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
edges AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM li a
    JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
)
SELECT (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(*)
        FROM edges e1
        JOIN edges e2 ON e1.v = e2.u
        JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v) AS n_triangles
"""

QUERIES["copurchase_triangles"] = copurchase_triangles
ORACLES["copurchase_triangles"] = TRIANGLES_SQL


def copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling trajectory (k=4, 3 rounds) over the co-purchase
    graph — operators/graph.py::kcore_peel on market_basket_pairs'
    edge grain (part pairs co-ordered ≥ 2 times)."""
    from chewdata_spark.operators.graph import kcore_peel

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    return kcore_peel(edges, k=4, rounds=3)


def _kcore_round_sql(r: int, k: int) -> str:
    return f"""deg{r} AS (
    SELECT node, COUNT(*) AS d
    FROM (SELECT u AS node FROM edges{r - 1}
          UNION ALL SELECT v FROM edges{r - 1})
    GROUP BY 1
), keep{r} AS (
    SELECT node FROM deg{r} WHERE d >= {k}
), edges{r} AS (
    SELECT u, v FROM edges{r - 1}
    WHERE u IN (SELECT node FROM keep{r})
      AND v IN (SELECT node FROM keep{r})
)"""


def _kcore_row_sql(r: int) -> str:
    return f"""SELECT {r} AS round,
       (SELECT COUNT(DISTINCT n)
        FROM (SELECT u AS n FROM edges{r} UNION ALL SELECT v FROM edges{r})) AS n_nodes,
       (SELECT COUNT(*) FROM edges{r}) AS n_edges"""


KCORE_SQL = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges0 AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
), {_kcore_round_sql(1, 4)}, {_kcore_round_sql(2, 4)}, {_kcore_round_sql(3, 4)}
SELECT CAST(round AS INT) AS round, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges
FROM ({_kcore_row_sql(1)} UNION ALL {_kcore_row_sql(2)} UNION ALL {_kcore_row_sql(3)})
"""

QUERIES["copurchase_kcore"] = copurchase_kcore
ORACLES["copurchase_kcore"] = KCORE_SQL


def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation communities over the co-purchase graph
    (operators/graph.py::label_propagation, deterministic min tie-break,
    2 fixed rounds) — the community-detection sibling of
    copurchase_kcore/triangles.  Returns each community's size and
    smallest member; the full trajectory replays in SQL."""
    from chewdata_spark.operators.graph import label_propagation

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .dropDuplicates(["l_orderkey", "l_partkey"])
    )
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    labels = label_propagation(edges, rounds=2)
    return labels.groupBy("community").agg(
        F.count(F.lit(1)).alias("n_nodes"), F.min("node").alias("min_node")
    )


def _lpa_round_sql(r: int) -> str:
    prev = "l0" if r == 1 else f"l{r - 1}"
    return f"""l{r} AS (
    SELECT node, nb_label AS label FROM (
        SELECT n.node, l.label AS nb_label, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY n.node
                                  ORDER BY COUNT(*) DESC, l.label ASC) AS rk
        FROM nbr n JOIN {prev} l ON l.node = n.nb
        GROUP BY n.node, l.label
    ) WHERE rk = 1
)"""


LPA_SQL = f"""
WITH li AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), edges0 AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
), nbr AS (
    SELECT u AS node, v AS nb FROM edges0
    UNION ALL
    SELECT v AS node, u AS nb FROM edges0
), l0 AS (
    SELECT DISTINCT node, node AS label FROM nbr
), {_lpa_round_sql(1)}, {_lpa_round_sql(2)}
SELECT label AS community, COUNT(*) AS n_nodes, MIN(node) AS min_node
FROM l2 GROUP BY 1
"""

QUERIES["copurchase_communities"] = copurchase_communities
ORACLES["copurchase_communities"] = LPA_SQL


def part_transit_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join without a cross product: pairs of
    lineitems for the SAME part, from DIFFERENT suppliers, whose
    fulfillment windows [o_orderdate, l_shipdate] overlap — concurrent
    supply competition.  Top 20 parts by conflict-pair count.

    Delegates the overlap join to
    :func:`chewdata_spark.operators.rangejoin.interval_overlap_join`:
    each interval explodes into month-grid cells, pairs equi-join on
    (partkey, cell), and the first-shared-cell predicate emits each
    qualifying pair EXACTLY ONCE — raw row-pairs are counted directly
    (identical grain to the oracle), with no pair-identity column and
    no global dedup shuffle.  ``iid`` exists only to order the pair
    (count each unordered pair once); it is NOT a row key in this
    synthetic data (duplicate (orderkey, linenumber) rows exist), and
    both sides of the comparison exclude same-iid row pairs
    identically.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        F.to_date("l_shipdate").alias("e"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("s"),
    )
    iv = li.join(orders, "l_orderkey").select(
        "l_partkey", "l_suppkey", "s", "e",
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("iid"),
    )
    a = iv.select(
        "l_partkey",
        F.col("l_suppkey").alias("supp_a"),
        F.col("s").alias("s_a"),
        F.col("e").alias("e_a"),
        F.col("iid").alias("iid_a"),
    )
    b = iv.select(
        "l_partkey",
        F.col("l_suppkey").alias("supp_b"),
        F.col("s").alias("s_b"),
        F.col("e").alias("e_b"),
        F.col("iid").alias("iid_b"),
    )
    # grid unit picked from the span stats: normalized spans average
    # ~27 months here, so a month grid explodes ~27x and — because a
    # span covers the same FRACTION of its cells at any grain — total
    # per-cell candidate work scales with cell count too.  Year cells
    # cut both by ~12x; the first-shared-cell predicate keeps emission
    # exactly-once at any grain (unit-tested across all four).
    pairs = interval_overlap_join(
        a, b,
        on=["l_partkey"],
        left_start="s_a", left_end="e_a",
        right_start="s_b", right_end="e_b",
        grid="year",
    ).filter(
        (F.col("iid_a") < F.col("iid_b"))
        & (F.col("supp_a") != F.col("supp_b"))
    )
    return (
        pairs.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.count(F.lit(1)).cast("int").alias("n_conflicts"))
        .orderBy(F.col("n_conflicts").desc(), F.col("p_partkey").asc())
        .limit(20)
    )


TRANSIT_CONFLICTS_SQL = """
WITH iv AS (
    SELECT l.l_partkey, l.l_suppkey,
           CAST(o.o_orderdate AS DATE) AS s, CAST(l.l_shipdate AS DATE) AS e,
           l.l_orderkey * 10 + l.l_linenumber AS iid
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), pr AS (
    SELECT a.l_partkey, a.iid AS iid_a, b.iid AS iid_b
    FROM iv a JOIN iv b
      ON a.l_partkey = b.l_partkey AND a.iid < b.iid
     AND a.l_suppkey <> b.l_suppkey
     AND a.s <= b.e AND b.s <= a.e
)
SELECT l_partkey AS p_partkey, CAST(COUNT(*) AS INT) AS n_conflicts
FROM pr GROUP BY 1
ORDER BY n_conflicts DESC, p_partkey ASC LIMIT 20
"""

QUERIES["part_transit_conflicts"] = part_transit_conflicts
ORACLES["part_transit_conflicts"] = TRANSIT_CONFLICTS_SQL
