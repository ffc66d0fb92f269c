"""Relational operator coverage — SURVEY.md §2 operators that the KG
pipeline doesn't already exercise, mapped onto the driver's TPC-H-ish
tables so each gets an independent DuckDB oracle.

Every query names the §2 operator(s) it covers and the reference code the
semantics come from. Aggregates on money columns go through DECIMAL so the
result is exact and order-independent (float sums drift across partition
orders; decimals don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.corpus import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def rel_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 species/taxon isin filter + A7 count (string_ppi.py:78-81)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_returnflag").isin("A", "N"))
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


def rel_pair_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 order-insensitive entity-type pair filter (pharmgkb.py:44-47):
    {Entity1, Entity2} == {target set} via array_sort equality."""
    li = _t(spark, sf_dir, "lineitem")
    pair = F.array_sort(F.array("l_returnflag", "l_linestatus"))
    return (
        li.filter(pair == F.array(F.lit("F"), F.lit("R")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


def rel_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1/J2 chained broadcast dimension joins (string_ppi.py:61-96):
    fact ⋈ supplier ⋈ nation ⋈ region, dims explicitly broadcast; exact
    decimal revenue per region."""
    li = _t(spark, sf_dir, "lineitem")
    sup = F.broadcast(_t(spark, sf_dir, "supplier"))
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region"))
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(nat, sup.s_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


def rel_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/J6 left join + coalesce-on-miss (normalize_utils.py:7-46 /
    string_ppi.py:225-230): customers annotated with order count, 0 on miss."""
    cust = _t(spark, sf_dir, "customer")
    counts = (
        _t(spark, sf_dir, "orders").groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    )
    return cust.join(
        counts, cust.c_custkey == counts.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        F.coalesce("cnt", F.lit(0)).alias("n_orders"),
    )


def rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 left-anti join (make_holdouts.py:184-191 negative-edge filter):
    customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def rel_degree_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/J10 degree counts (make_holdouts.py:270-285)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("degree"))
    )


def rel_window_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/A1 deterministic first-wins: the reference's seen-set emit-once
    becomes row_number over an explicit priority (SURVEY.md §7.4 risk 1) —
    each customer's highest-value order, orderkey as tiebreak."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def rel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/L1 global ORDER BY DESC + LIMIT (query-06, make_holdouts head(n))."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def rel_keep_false_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 drop_duplicates(keep=False) (make_holdouts.py:178-181): keep only
    (partkey, suppkey) pairs that occur exactly once."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") == 1)
        .select("l_partkey", "l_suppkey")
    )


def rel_explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/E2 pipe-split + explode (drug_central.py:167-195): word counts
    over split part names."""
    return (
        _t(spark, sf_dir, "part")
        .select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def rel_zip_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 arrays_zip multi-list explode (drug_central ACCESSION×GENE×TDL
    zip, drug_central.py:96-146): zip part-name words with type words,
    null-padded like the reference's broadcast-repeat rule handles ragged
    lists."""
    part = _t(spark, sf_dir, "part")
    z = F.arrays_zip(F.split("p_name", " "), F.split("p_type", " "))
    return (
        part.select(F.explode(z).alias("z"))
        .select(F.col("z")["0"].alias("name_word"), F.col("z")["1"].alias("type_word"))
        .groupBy("name_word", "type_word")
        .agg(F.count("*").alias("n"))
    )


def rel_union_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1/A9 heterogeneous union with provenance (merge.yaml semantics) on
    relational data: customer+supplier per nation with source accumulation."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    sup = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return (
        cust.unionByName(sup)
        .groupBy("nationkey")
        .agg(
            F.count("*").alias("n"),
            F.concat_ws("|", F.sort_array(F.collect_set("src"))).alias("sources"),
        )
    )


def rel_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape aggregation (the canonical OLAP pattern; reference has
    A7-style counts only). DECIMAL arithmetic → exact, order-independent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    qty = F.col("l_quantity").cast("decimal(18,4)")
    price = F.col("l_extendedprice").cast("decimal(18,4)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    tax = F.col("l_tax").cast("decimal(18,4)")
    one = F.lit(1).cast("decimal(18,4)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(price * (one - disc)), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(price * (one - disc) * (one + tax)), 2)
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


def rel_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 natural extension: cube over (returnflag, linestatus) counts
    (SURVEY.md §2.4 note)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


def rel_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window + lag delta per customer order history — the two
    window shapes (frame aggregation, offset access) the first-wins rank
    (W1) doesn't exercise. Cents-exact longs so the running sums hash
    identically across engines regardless of summation order.

    Cents are derived via pure IEEE-754 arithmetic — floor(x*100 + 0.5)
    — which is bit-identical in any engine regardless of its
    decimal-cast rounding policy (half-up-on-decimal-string vs
    round-on-binary-value divergence is thereby unreachable). Prices
    are non-negative so floor(+0.5) == round-half-up."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            cents.alias("price_cents"),
            F.sum(cents).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).alias("running_cents"),
            (cents - F.lag(cents, 1).over(w)).alias("delta_cents"),
        )
    )


def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide aggregation): order counts per priority,
    one column per order status. Values are declared explicitly — a
    values-less pivot runs a driver-side distinct scan AND makes the
    output schema data-dependent, both wrong at scale. Missing cells
    are normalized to 0 (Spark pivot yields null, conditional-count
    oracles yield 0)."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .na.fill(0, ["F", "O", "P"])
    )


def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op: customers ordering in both 1995 and 1996."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


def rel_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: customers ordering in 1995 but never in 1996."""
    o = _t(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.subtract(y96)  # EXCEPT DISTINCT semantics


def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit LEFT SEMI join (the EXISTS shape merge-time filters use
    internally, F9): customers with at least one 1995 order — probe side
    never duplicates, build side projected to the key only."""
    c = _t(spark, sf_dir, "customer")
    o95 = (
        _t(spark, sf_dir, "orders")
        .filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o95, "c_custkey", "semi").select("c_custkey", "c_mktsegment")


def rel_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — year-over-year reconciliation: per-customer
    1995 vs 1996 order counts, keeping customers present in either
    year (absent side coalesced to 0)."""
    o = _t(spark, sf_dir, "orders")

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == y)
            .groupBy("o_custkey")
            .agg(F.count("*").alias(alias))
        )

    a = year_counts(1995, "n95")
    b = year_counts(1996, "n96")
    return (
        a.join(b, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            F.coalesce("n95", F.lit(0)).alias("n95"),
            F.coalesce("n96", F.lit(0)).alias("n96"),
        )
    )


def rel_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (orders above their own customer's
    average order value) — the decorrelation class: Catalyst rewrites
    the correlated aggregate into a join, which is exactly how the
    DataFrame side states it. The comparison is cross-multiplied
    integers (cents·n > sum_cents) so no engine ever divides — an
    average would reintroduce float/decimal rounding divergence."""
    o = _t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    pre = o.select("o_orderkey", "o_custkey", cents.alias("cents"))
    per_cust = pre.groupBy("o_custkey").agg(
        F.sum("cents").alias("sum_cents"), F.count("*").alias("n_orders")
    )
    return (
        pre.join(per_cust, "o_custkey")
        .filter(F.col("cents") * F.col("n_orders") > F.col("sum_cents"))
        .select("o_orderkey", "o_custkey", "cents")
    )


def rel_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame — the time-window aggregation a ROWS frame
    can't express: per customer, order count and cents-sum over the 29
    days preceding each order (inclusive). The frame bound is on the
    epoch-day VALUE, so peers (same-day orders) are always in-frame
    together — identical semantics in both engines; cents go through
    the pure-IEEE floor(x*100+0.5) path (bit-identical across
    engines, unlike decimal casts whose rounding policy varies)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    pre = o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-29, 0)
    return pre.select(
        "o_custkey",
        "o_orderkey",
        F.count("*").over(w).alias("n_orders_30d"),
        F.sum("cents").over(w).alias("cents_30d"),
    )


def rel_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (nation → region totals) — the graph-stats
    natural hierarchy (A8 note), subtotals + grand total."""
    n = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey_fk"), F.col("n_name")
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n),
        F.col("c_nationkey") == F.col("c_nationkey_fk"),
    )
    return (
        cust.rollup("c_mktsegment", "n_name")
        .agg(F.count("*").alias("n_custs"))
    )


def rel_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE quartiles of each customer's order history by (date, key)
    — the equal-width bucketing window W1's rank doesn't cover. NTILE
    is integer-deterministic given a TOTAL order (ties broken by
    o_orderkey), so both engines bucket identically; the partition key
    is the bounded customer id, no skewed-reducer hazard."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.ntile(4).over(w).alias("quartile"),
        )
    )


def rel_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 extension: percent_rank and cume_dist as EXACT integer ppm —
    pr_ppm = (rn−1)·1e6 div (n−1), cd_ppm = rn·1e6 div n under a total
    order (ties broken by o_orderkey), which is the float built-ins'
    value without their cross-engine repr hazard (the jaccard_ppm /
    pagerank fixed-point discipline). Partition key is the bounded
    o_orderpriority; rank and the partition count are two windows over
    the same exchange."""
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    wn = Window.partitionBy("o_orderpriority")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 100)
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.expr(
                "CAST(CASE WHEN n > 1 THEN (rn - 1) * 1000000L div (n - 1) "
                "ELSE 0 END AS LONG)"
            ).alias("pr_ppm"),
            F.expr("CAST(rn * 1000000L div n AS LONG)").alias("cd_ppm"),
        )
    )


def rel_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form cube/rollup
    specialize: order counts by (priority, status), by priority alone,
    and the grand total, with GROUPING() flags disambiguating real
    NULLs from subtotal rows (the A8 graph-stats hierarchy note). One
    expand + one partial-agg groupBy — same exchange budget as a plain
    groupBy times the (here 3, bounded) set count."""
    o = _t(spark, sf_dir, "orders")
    o.select("o_orderpriority", "o_orderstatus").createOrReplaceTempView(
        "_rel_gs_orders"
    )
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus, count(*) AS n,
               grouping(o_orderpriority) AS g_pri,
               grouping(o_orderstatus) AS g_st
        FROM _rel_gs_orders
        GROUP BY GROUPING SETS (
          (o_orderpriority, o_orderstatus), (o_orderpriority), ()
        )
        """
    )


REL_QUERIES = {
    "rel_ntile": rel_ntile,
    "rel_percent_rank": rel_percent_rank,
    "rel_grouping_sets": rel_grouping_sets,
    "rel_rollup_counts": rel_rollup_counts,
    "rel_running_total": rel_running_total,
    "rel_filter_in": rel_filter_in,
    "rel_pair_filter": rel_pair_filter,
    "rel_broadcast_dims": rel_broadcast_dims,
    "rel_left_join_coalesce": rel_left_join_coalesce,
    "rel_anti_join": rel_anti_join,
    "rel_degree_count": rel_degree_count,
    "rel_window_first": rel_window_first,
    "rel_topk": rel_topk,
    "rel_keep_false_dedup": rel_keep_false_dedup,
    "rel_explode_split": rel_explode_split,
    "rel_zip_explode": rel_zip_explode,
    "rel_union_provenance": rel_union_provenance,
    "rel_tpch_q1": rel_tpch_q1,
    "rel_cube_counts": rel_cube_counts,
    "rel_pivot": rel_pivot,
    "rel_intersect": rel_intersect,
    "rel_except": rel_except,
    "rel_range_frame": rel_range_frame,
    "rel_above_avg": rel_above_avg,
    "rel_semi_join": rel_semi_join,
    "rel_full_outer": rel_full_outer,
}

REL_ORACLES = {
    "rel_percent_rank": """
WITH o AS (SELECT * FROM orders WHERE o_custkey <= 100),
r AS (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn,
         count(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM o
)
SELECT o_orderpriority, o_orderkey,
       CAST(CASE WHEN n > 1 THEN (rn - 1) * 1000000 // (n - 1)
            ELSE 0 END AS BIGINT) AS pr_ppm,
       CAST(rn * 1000000 // n AS BIGINT) AS cd_ppm
FROM r
""",
    "rel_ntile": """
SELECT o_custkey, o_orderkey,
       ntile(4) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC) AS quartile
FROM orders WHERE o_custkey <= 100
""",
    "rel_grouping_sets": """
SELECT o_orderpriority, o_orderstatus, count(*) AS n,
       grouping(o_orderpriority) AS g_pri,
       grouping(o_orderstatus) AS g_st
FROM orders
GROUP BY GROUPING SETS (
  (o_orderpriority, o_orderstatus), (o_orderpriority), ()
)
""",
    "rel_filter_in": """
SELECT l_returnflag, count(*) AS n FROM lineitem
WHERE l_returnflag IN ('A', 'N') GROUP BY l_returnflag
""",
    "rel_pair_filter": """
SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
WHERE list_sort([l_returnflag, l_linestatus]) = ['F', 'R']
GROUP BY l_returnflag, l_linestatus
""",
    "rel_broadcast_dims": """
SELECT r_name,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                      (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
    "rel_left_join_coalesce": """
SELECT c_custkey, c_name, coalesce(cnt, 0) AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
""",
    "rel_anti_join": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
    "rel_degree_count": """
SELECT o_custkey, count(*) AS degree FROM orders GROUP BY o_custkey
""",
    "rel_window_first": """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1
""",
    "rel_topk": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
    "rel_keep_false_dedup": """
SELECT l_partkey, l_suppkey FROM lineitem
GROUP BY l_partkey, l_suppkey HAVING count(*) = 1
""",
    "rel_explode_split": """
SELECT word, count(*) AS n FROM (
  SELECT unnest(string_split(p_name, ' ')) AS word FROM part
) GROUP BY word
""",
    "rel_zip_explode": """
SELECT name_word, type_word, count(*) AS n FROM (
  SELECT z[1] AS name_word, z[2] AS type_word FROM (
    SELECT unnest(list_zip(string_split(p_name, ' '),
                           string_split(p_type, ' '))) AS z
    FROM part
  )
) GROUP BY name_word, type_word
""",
    "rel_union_provenance": """
SELECT nationkey, count(*) AS n,
       string_agg(DISTINCT src, '|' ORDER BY src) AS sources
FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
) GROUP BY nationkey
""",
    "rel_tpch_q1": """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                 (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) *
                 (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "rel_cube_counts": """
SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    "rel_rollup_counts": """
SELECT c_mktsegment, n_name, count(*) AS n_custs
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (c_mktsegment, n_name)
""",
    "rel_pivot": """
SELECT o_orderpriority,
  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
FROM orders GROUP BY o_orderpriority
""",
    "rel_intersect": """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    "rel_except": """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
""",
    "rel_full_outer": """
WITH a AS (
  SELECT o_custkey, count(*) AS n95 FROM orders
  WHERE year(o_orderdate) = 1995 GROUP BY o_custkey
),
b AS (
  SELECT o_custkey, count(*) AS n96 FROM orders
  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey
)
SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
       coalesce(a.n95, 0) AS n95, coalesce(b.n96, 0) AS n96
FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
""",
    "rel_semi_join": """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND year(o.o_orderdate) = 1995
)
""",
    # the oracle states it as the correlated subquery it is; Spark
    # states the decorrelated join — same cross-multiplied predicate
    "rel_above_avg": """
WITH pre AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT o_orderkey, o_custkey, cents
FROM pre p
WHERE p.cents * (SELECT count(*) FROM pre q WHERE q.o_custkey = p.o_custkey)
      > (SELECT sum(cents) FROM pre q WHERE q.o_custkey = p.o_custkey)
""",
    "rel_range_frame": """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_custkey <= 200
)
SELECT o_custkey, o_orderkey,
  CAST(count(*) OVER w AS BIGINT) AS n_orders_30d,
  -- DuckDB types sum(BIGINT) as HUGEINT, which has no Arrow int128 and
  -- degrades to double through a pandas/Arrow fetch — cast back so the
  -- driver-side hash sees an int64 on both engines.
  CAST(sum(cents) OVER w AS BIGINT) AS cents_30d
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY d
             RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
""",
    "rel_running_total": """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
  FROM orders WHERE o_custkey <= 100
)
SELECT o_custkey, o_orderkey, price_cents,
  -- CAST: DuckDB sum(BIGINT) is HUGEINT → degrades to double through an
  -- Arrow/pandas fetch (no int128); int64 on both engines hashes equal.
  CAST(sum(price_cents) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
  price_cents - lag(price_cents, 1) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
  ) AS delta_cents
FROM o
""",
}
