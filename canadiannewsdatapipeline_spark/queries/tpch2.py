"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q14/Q15/Q17/Q21/Q22),
adapted to the driver warehouse schema (no partsupp / shipmode /
commitdate / phone columns — each adaptation keeps the *plan shape*
that makes the original query interesting: correlated-subquery
decorrelation, multi-exists semi/anti chains, conditional-ratio
aggregates, global-max selection).

These complete the classic decorrelation families on top of the
Q1/Q3/Q4/Q5/Q6/Q10/Q13/Q18/Q19 shapes in ``core.py``. Reference
parity note: the reference app has no TPC-H surface — this family
exists to exercise the relational engine breadth the reference's
dashboard queries (sentiment_dashboard.py) only touch lightly.

Cross-engine determinism: every money aggregate is an exact DECIMAL
sum cast to DOUBLE at the end; every ratio is a single IEEE division
of two exact sums; year extraction is cast to INTEGER on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .core import _dec
from .registry import register

_ONE = 'CAST(1.00 AS DECIMAL(3,2))'
_DISC = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * "
    f"({_ONE} - CAST(l_discount AS DECIMAL(4,2)))"
)


def _disc_price():
    one = F.lit("1.00").cast("decimal(3,2)")
    return _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2))


@register(
    "tpch_q14_promo_revenue",
    f"""
    SELECT CAST(100.00 * SUM(CASE WHEN p_type = 'PROMO' THEN {_DISC}
                                  ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM({_DISC}) AS DOUBLE) AS promo_revenue_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-07-01'
    """,
    doc="TPC-H Q14 shape: conditional-ratio aggregate over an equi-join",
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share. Both the numerator and denominator are
    exact decimal sums reduced in one shuffle (two aggregates, one
    groupBy); the ratio is a single IEEE division so both engines emit
    the identical double. Part is fact-proportional — AQE picks the
    join side."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    disc = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .agg(
            (
                (F.lit(100.00) * F.sum(promo)).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_DISC}) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total AS DOUBLE) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total = (SELECT MAX(total) FROM rev)
    """,
    doc="TPC-H Q15 shape: per-key revenue, keep rows matching the global max",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue. The global max is a
    one-row aggregate broadcast back over the per-supplier totals
    (never a single-partition window over the whole frame); equality
    is on exact DECIMAL totals, so ties — which Q15 must return all
    of — agree across engines bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total"))
    best = rev.agg(F.max("total").alias("best_total"))
    return (
        rev.join(F.broadcast(best), F.col("total") == F.col("best_total"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue")
        )
    )


@register(
    "tpch_q17_small_qty_avg",
    """
    WITH pf AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_size < 10
    ),
    lf AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN pf ON p_partkey = l_partkey
    ),
    pa AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
               AS avg_qty
      FROM lf GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(lf.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lf JOIN pa ON pa.l_partkey = lf.l_partkey
    WHERE lf.l_quantity < 0.5 * pa.avg_qty
    """,
    doc="TPC-H Q17 shape: correlated AVG subquery decorrelated into a per-key agg join",
)
def tpch_q17_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity revenue for one brand. The correlated
    ``l_quantity < 0.5 * (SELECT AVG(..) WHERE same part)`` becomes a
    per-part aggregate joined back on partkey — the filtered part list
    is semi-joined FIRST so the per-part averages are computed over the
    reduced lineitem subset, not the whole fact table. The average is
    exact-decimal-sum / count (one deterministic division per part)."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lf = li.join(p, p.p_partkey == li.l_partkey).drop("p_partkey")
    pa = lf.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (
            F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        lf.join(pa, lf.l_partkey == pa.pa_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "tpch_q22_idle_customers",
    """
    WITH act AS (
      SELECT c_custkey, c_acctbal,
             CAST(c_nationkey % 10 AS INTEGER) AS cntrycode
      FROM customer
      WHERE CAST(c_nationkey % 10 AS INTEGER) IN (1, 2, 3, 4, 5)
    ),
    thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
               AS avg_bal
      FROM act WHERE c_acctbal > 0.00
    )
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM act, thr
    WHERE c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: scalar-avg threshold + NOT EXISTS anti-join, grouped",
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers who never ordered, by country-code proxy
    (nationkey mod 10 stands in for the phone prefix; "idle" = no
    order since 1999 — this corpus has no orderless customers). The
    scalar average is a one-row broadcast; the NOT EXISTS is a
    left-anti join against orders — at scale that anti-join shuffles
    on custkey once, and the threshold never recomputes per row."""
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("int")
    ).filter(F.col("cntrycode").isin(1, 2, 3, 4, 5))
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    thr = c.filter(F.col("c_acctbal") > 0.00).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
            "avg_bal"
        )
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_min_bal_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    sb AS (
      SELECT ps.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal, s.s_nationkey
      FROM ps JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    ),
    best AS (SELECT l_partkey, MIN(s_acctbal) AS min_bal FROM sb GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_brand, p.p_size,
           sb.s_suppkey, sb.s_name, sb.s_acctbal, n.n_name AS nation_name
    FROM part p
    JOIN sb ON sb.l_partkey = p.p_partkey
    JOIN best ON best.l_partkey = sb.l_partkey AND sb.s_acctbal = best.min_bal
    JOIN nation n ON n.n_nationkey = sb.s_nationkey
    WHERE p.p_size < 5
    """,
    doc="TPC-H Q2 shape: correlated MIN subquery decorrelated via per-key MIN join (lineitem as the part-supplier bridge)",
)
def tpch_q2_min_bal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lowest-acctbal supplier per small part. No partsupp table in
    this warehouse, so the observed DISTINCT (partkey, suppkey) pairs
    from lineitem form the bridge — same decorrelation: per-part MIN
    joined back, keeping ALL tied minima exactly as Q2 does. The
    distinct is the only wide op on a fact-sized input; everything
    after runs on the bridge (|parts| x avg-suppliers rows)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    ps = li.distinct()
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 5)
    sb = ps.join(s, s.s_suppkey == ps.l_suppkey).select(
        "l_partkey", "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    best = sb.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        p.join(sb, sb.l_partkey == p.p_partkey)
        .join(
            best,
            (F.col("b_partkey") == F.col("l_partkey"))
            & (F.col("s_acctbal") == F.col("min_bal")),
        )
        .join(F.broadcast(n), n.n_nationkey == F.col("s_nationkey"))
        .select(
            "p_partkey", "p_brand", "p_size",
            "s_suppkey", "s_name", "s_acctbal",
            F.col("n_name").alias("nation_name"),
        )
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           CAST(SUM({_DISC.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair volume by ship year",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between two nations, both directions, by year.
    The nation-pair disjunction sits above two independent broadcast
    joins (supplier-nation, customer-nation); Catalyst pushes each
    single-sided residual (n_name IN (A,B)) into its own broadcast
    build, so the fact scan only carries rows touching either nation."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n1), F.col("n1_key") == s.s_nationkey)
        .join(F.broadcast(n2), F.col("n2_key") == c.c_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_DISC.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lines
    FROM vol GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: national market share — conditional share of a filtered multi-join volume",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_2's share of ECONOMY-part volume sold into ASIA, by
    order year. Six joins, but only lineitem/orders/customer are
    fact-sized; nation x2 and region broadcast, and the region filter
    prunes the customer side before the fact join via the broadcast
    hash table. Share = one division of two exact decimal sums."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(p, p.p_partkey == li.l_partkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n1), F.col("n1_key") == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == F.col("n1_region"))
        .join(F.broadcast(n2), F.col("n2_key") == s.s_nationkey)
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    nat = F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return vol.groupBy("o_year").agg(
        (F.sum(nat).cast("double") / F.sum("volume").cast("double")).alias(
            "mkt_share"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q9_nation_profit",
    """
    SELECT n.n_name AS nation_name,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                    - CAST(p.p_retailprice AS DECIMAL(12,2))
                      * CAST(l.l_quantity AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(3,2))) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_brand = 'Brand#1'
    GROUP BY 1, 2
    """,
    doc="TPC-H Q9 shape: profit (revenue minus modeled cost) by supplier nation and year",
)
def tpch_q9_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier-nation per year. No partsupp/supplycost
    here, so cost is modeled as 10% of retail price x quantity — the
    plan shape (4-way fact-dim join, two-key group) is Q9's. The whole
    profit expression stays in DECIMAL until the final cast."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit("1.00").cast("decimal(3,2)")
    cost_rate = F.lit("0.10").cast("decimal(3,2)")
    profit = _dec("l_extendedprice") * (one - _dec("l_discount", 4, 2)) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * cost_rate
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(p, p.p_partkey == li.l_partkey)
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    WITH l1 AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    ),
    f AS (
      SELECT l1.l_orderkey, l1.l_suppkey
      FROM l1 JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM f
    JOIN supplier ON s_suppkey = f.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = f.l_orderkey AND l2.l_suppkey <> f.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l3
            WHERE l3.l_orderkey = f.l_orderkey AND l3.l_suppkey <> f.l_suppkey
              AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    doc="TPC-H Q21 shape: EXISTS + NOT EXISTS pair as semi/anti joins on a compound key",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returned lines in finalized
    orders (returnflag stands in for the receipt/commit lateness
    columns this schema lacks). EXISTS -> left-semi, NOT EXISTS ->
    left-anti, both on (orderkey, suppkey<>) compound conditions; the
    DISTINCT on (orderkey, suppkey) fixes the count semantics to
    one-per-order-per-supplier before the joins."""
    li = load_table(spark, sf_dir, "lineitem")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = load_table(spark, sf_dir, "supplier")
    f = l1.join(o, o.o_orderkey == l1.l_orderkey).select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    f = f.join(
        l2,
        (F.col("l2_orderkey") == F.col("l_orderkey"))
        & (F.col("l2_suppkey") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l3_orderkey") == F.col("l_orderkey"))
        & (F.col("l3_suppkey") != F.col("l_suppkey")),
        "left_anti",
    )
    return (
        f.join(s, s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q12_priority_by_status",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    doc="TPC-H Q12 shape: priority-split conditional counts per lineitem attribute (linestatus for shipmode)",
)
def tpch_q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's plan: fact-fact equi-join carried by orderkey with the
    date filter pushed to the lineitem scan, then two conditional
    counts in ONE aggregate pass (never two scans). linestatus stands
    in for the missing shipmode column."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "tpch_q11_important_parts",
    """
    WITH pv AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      WHERE s_nationkey = 1
      GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(part_value) AS t FROM pv)
    SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM pv, tot
    WHERE CAST(part_value AS DOUBLE) > CAST(t AS DOUBLE) * 0.001
    """,
    doc="TPC-H Q11 shape: per-key value vs fraction-of-total scalar threshold (lineitem as partsupp)",
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11's decorrelation: the HAVING threshold is a one-row total
    re-aggregated FROM the per-part frame (no second fact scan) and
    broadcast back. Both sides compare as doubles derived from the
    same exact decimal sums."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 1)
    pv = (
        li.join(s, s.s_suppkey == li.l_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice") * _dec("l_quantity")).alias("part_value"))
    )
    tot = pv.agg(F.sum("part_value").alias("t"))
    return (
        pv.join(F.broadcast(tot))
        .filter(
            F.col("part_value").cast("double") > F.col("t").cast("double") * 0.001
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
    )


@register(
    "tpch_q16_supplier_cnt",
    """
    WITH bridge AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM bridge JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute triple (bridge from lineitem)",
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per attribute triple over the observed
    part-supplier bridge; the part filters (negated brand + size
    IN-list) push into the part scan before the join. Distinct-agg
    runs as the standard two-phase Expand."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bridge = li.distinct()
    return (
        bridge.join(p, p.p_partkey == bridge.l_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_bulk_suppliers",
    """
    WITH qty AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey, l_partkey
    ),
    pf AS (SELECT p_partkey FROM part WHERE p_type = 'SMALL'),
    cand AS (
      SELECT DISTINCT q.l_suppkey
      FROM qty q JOIN pf ON pf.p_partkey = q.l_partkey
      WHERE q.sq > 50
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN cand ON cand.l_suppkey = s_suppkey
    """,
    doc="TPC-H Q20 shape: nested IN-subqueries flattened to agg + semi-join chain",
)
def tpch_q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20's nested `IN (SELECT ... IN (SELECT ...))` flattens into a
    per-(supplier, part) aggregate filtered by the part subset, then a
    distinct-project semi-joined to supplier — every level an
    equi-join, nothing correlated at runtime."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pf = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "SMALL"
    ).select("p_partkey")
    s = load_table(spark, sf_dir, "supplier")
    qty = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sq")
    )
    cand = (
        qty.join(pf, pf.p_partkey == qty.l_partkey)
        .filter(F.col("sq") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(cand, F.col("l_suppkey") == s.s_suppkey).select(
        "s_suppkey", "s_name"
    )
