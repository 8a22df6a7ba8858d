"""Robust statistics and time-series repair queries.

Extends the aggregate family (SURVEY.md §2.6) with the shapes a
corpus-curation / metrics pipeline reaches for next: robust outlier
stats (MAD), gap repair by linear interpolation (the step past LOCF),
and per-stratum deterministic sampling (engine-portable ``sampleBy``).

Determinism rules: medians are exact interpolated percentiles over
the same multiset (identical IEEE interpolation on both engines);
interpolation fractions are computed from exact integer epoch-micros;
every float output is rounded before comparison thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import register


@register(
    "a_mad_robust",
    """
    WITH med AS (
      SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
      FROM lineitem GROUP BY l_returnflag
    ),
    dev AS (
      SELECT l.l_returnflag, abs(l.l_extendedprice - m.med) AS adev, m.med
      FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag
    )
    SELECT l_returnflag,
           ROUND(ANY_VALUE(med), 6) AS median_price,
           ROUND(quantile_cont(adev, 0.5), 6) AS mad
    FROM dev GROUP BY l_returnflag
    """,
    doc="median absolute deviation per group: two-phase decorrelated robust stats",
)
def a_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD = median(|x - median(x)|) per group — the robust spread
    stat quality pipelines use where stddev is outlier-poisoned. The
    correlated inner median decorrelates into a per-group aggregate
    broadcast back onto the fact rows; two shuffles total (group sizes
    are bounded by the flag cardinality, so the second agg is tiny).
    Exact interpolated percentiles, identical IEEE math both engines.

    INVARIANT — interpolated percentile is output-only: never feed it
    into a COMPARISON (>=, BETWEEN, a CASE boundary). A 1-ulp
    cross-engine divergence in quantile_cont vs percentile() flipped a
    clamp count on content-fresh data in `a_winsorize` (round 5, since
    re-specced to discrete rank bounds); values that are only output
    are safe because the 10-sig-digit canonicalization absorbs the
    ulp. The inner median here feeds a SUBTRACTION, which propagates
    the ulp linearly into the rounded outputs — same absorbed class —
    but never a branch."""
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy(F.col("l_returnflag").alias("m_flag")).agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med")
    )
    dev = li.join(
        F.broadcast(med), F.col("m_flag") == F.col("l_returnflag")
    ).select(
        "l_returnflag",
        "med",
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("adev"),
    )
    return dev.groupBy("l_returnflag").agg(
        F.round(F.first("med"), 6).alias("median_price"),
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad"),
    )


@register(
    "a_linear_interpolate",
    """
    WITH masked AS (
      SELECT user_id, event_id, ts, epoch_us(ts) AS t,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
      FROM events
    ),
    nb AS (
      SELECT user_id, event_id, ts, t, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(t IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
             first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(t IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt
      FROM masked
    )
    SELECT user_id, event_id, ts,
           ROUND(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
               THEN pv + (nv - pv) * ((t - pt) / CAST(nt - pt AS DOUBLE))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv END, 6) AS v_filled,
           v IS NULL AS was_interpolated
    FROM nb
    """,
    doc="linear interpolation of missing values between neighbors (time-weighted; LOCF at edges)",
)
def a_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair one step past LOCF: a masked value is rebuilt from
    its nearest non-null neighbors, weighted by exact integer
    epoch-micro distance. Both IGNORE NULLS scans share one hash
    exchange on user_id (same partitioning, forward frame is the
    reversed cumulative window). Edge gaps fall back to the single
    available side."""
    ev = load_table(spark, sf_dir, "events")
    masked = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    back = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    nb = masked.select(
        "user_id",
        "event_id",
        "ts",
        "t",
        "v",
        F.last("v", ignorenulls=True).over(back).alias("pv"),
        F.last("t", ignorenulls=True).over(back).alias("pt"),
        F.first("v", ignorenulls=True).over(fwd).alias("nv"),
        F.first("t", ignorenulls=True).over(fwd).alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("pt")) / (F.col("nt") - F.col("pt")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nt") != F.col("pt")),
            interp,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    return nb.select(
        "user_id",
        "event_id",
        "ts",
        F.round(filled, 6).alias("v_filled"),
        F.col("v").isNull().alias("was_interpolated"),
    )


@register(
    "sample_stratified_hash",
    """
    WITH s AS (
      SELECT event_type, value
      FROM events
      WHERE CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                 AS BIGINT) % 100
            < CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 10
                              WHEN 'purchase' THEN 50 WHEN 'signup' THEN 50
                              ELSE 25 END
    )
    SELECT event_type, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM s GROUP BY event_type
    """,
    doc="deterministic stratified sampling: per-stratum md5-bucket fractions (portable sampleBy)",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sampleBy`` with a seed is engine-private; hashing the row key
    into 100 buckets gives per-stratum fractions that reproduce on any
    engine and any partitioning — the down-sampling rule a training
    pipeline must be able to replay years later. High-volume strata
    (click/view) keep 10%, rare ones 50%. Map-only filter + one
    grouped aggregation."""
    from ..operators.training import _hash_pct

    ev = load_table(spark, sf_dir, "events")
    pct = (
        F.when(F.col("event_type").isin("click", "view"), F.lit(10))
        .when(F.col("event_type").isin("purchase", "signup"), F.lit(50))
        .otherwise(F.lit(25))
    )
    s = ev.filter(_hash_pct(F.col("event_id")) < pct)
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


@register(
    "a_partial_reaggregation",
    """
    SELECT CAST(date_trunc('month', ts) AS TIMESTAMP) AS month, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
    doc="re-aggregation algebra: monthly rollup computed FROM daily partials (== direct monthly agg)",
)
def a_partial_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance invariant: a coarse aggregate
    rebuilt from pre-aggregated partials (sum-of-sums, min-of-mins,
    count-of-counts) must equal the direct aggregate — the oracle IS
    the direct form. This is how 100 TB rollups actually run: the
    daily partial is tiny and incremental, and month/quarter/year
    views re-aggregate partials instead of rescanning the fact table.
    DECIMAL partial sums make the regroup exact under any partitioning."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(12,2)")).alias("pv"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return daily.groupBy(
        F.date_trunc("month", "day").alias("month"), "event_type"
    ).agg(
        F.sum("n").alias("n"),
        F.sum("pv").cast("double").alias("total_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )


@register(
    "profile_table_stats",
    """
    SELECT 'o_orderkey' AS col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(o_orderkey) AS n_nulls,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_num,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_num
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           MIN(o_totalprice), MAX(o_totalprice)
    FROM orders
    """,
    doc="column profiling: rows/nulls/ndv/min/max per column (the ANALYZE/data-quality primitive)",
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The profiling scan every ingestion job runs before trusting a
    feed. All three column profiles reduce in ONE pass over the table
    (a single multi-aggregate), then unpivot locally — not one scan
    per column as the SQL UNION suggests (the oracle's 3 scans are
    semantically equal; Spark's plan is the efficient one). Exact
    COUNT(DISTINCT) per column shares the aggregate via Expand."""
    o = load_table(spark, sf_dir, "orders")
    prof = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            e
            for c in ("o_orderkey", "o_custkey", "o_totalprice")
            for e in (
                (F.count(F.lit(1)) - F.count(c)).alias(f"{c}_nulls"),
                F.countDistinct(c).alias(f"{c}_ndv"),
                F.min(F.col(c).cast("double")).alias(f"{c}_min"),
                F.max(F.col(c).cast("double")).alias(f"{c}_max"),
            )
        ],
    )
    stacked = ", ".join(
        f"'{c}', n_rows, {c}_nulls, {c}_ndv, {c}_min, {c}_max"
        for c in ("o_orderkey", "o_custkey", "o_totalprice")
    )
    return prof.select(
        F.expr(
            f"stack(3, {stacked}) AS (col, n_rows, n_nulls, n_distinct, min_num, max_num)"
        )
    )


@register(
    "snapshot_diff_customers",
    """
    WITH newsnap AS (
      SELECT c_custkey, c_name, c_nationkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 500 ELSE c_acctbal END
               AS c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 13 <> 0
      UNION ALL
      SELECT c_custkey + 2000000, 'SNAP-' || c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 101 = 0
    )
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'I'
                WHEN n.c_custkey IS NULL THEN 'D'
                ELSE 'U' END AS op
    FROM customer o
    FULL OUTER JOIN newsnap n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_name <> n.c_name OR o.c_nationkey <> n.c_nationkey
       OR o.c_acctbal <> n.c_acctbal OR o.c_mktsegment <> n.c_mktsegment
    """,
    doc="snapshot diff: derive an I/U/D change feed from two full snapshots (CDC without a log)",
)
def snapshot_diff_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reverse of CDC-apply: two full snapshots in, a change feed
    out (insert / update / delete per key) — how pipelines bootstrap
    CDC from sources that only publish full dumps. One full-outer
    shuffle join on the key; the attribute comparison filters
    unchanged keys so the output is change-sized, not table-sized.
    The 'new' snapshot derives deterministically from the old (every
    13th key deleted, 7th updated, 101st re-inserted shifted)."""
    cu = load_table(spark, sf_dir, "customer")
    new = (
        cu.filter(F.col("c_custkey") % 13 != 0)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 500
            ).otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cu.filter(F.col("c_custkey") % 101 == 0).select(
                (F.col("c_custkey") + 2000000).alias("c_custkey"),
                F.concat(F.lit("SNAP-"), F.col("c_name")).alias("c_name"),
                "c_nationkey",
                "c_acctbal",
                "c_mktsegment",
            )
        )
    )
    o = cu.alias("o")
    n = new.alias("n")
    changed = (
        F.col("o.c_custkey").isNull()
        | F.col("n.c_custkey").isNull()
        | (F.col("o.c_name") != F.col("n.c_name"))
        | (F.col("o.c_nationkey") != F.col("n.c_nationkey"))
        | (F.col("o.c_acctbal") != F.col("n.c_acctbal"))
        | (F.col("o.c_mktsegment") != F.col("n.c_mktsegment"))
    )
    op = (
        F.when(F.col("o.c_custkey").isNull(), F.lit("I"))
        .when(F.col("n.c_custkey").isNull(), F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return (
        o.join(n, F.col("o.c_custkey") == F.col("n.c_custkey"), "full_outer")
        .filter(changed)
        .select(
            F.coalesce(F.col("o.c_custkey"), F.col("n.c_custkey")).alias("c_custkey"),
            op.alias("op"),
        )
    )


@register(
    "a_ratio_ntile",
    """
    SELECT c_custkey, c_mktsegment,
           ROUND(c_acctbal / CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)))
                 OVER (PARTITION BY c_mktsegment) AS DOUBLE), 10)
             AS share_of_segment,
           ntile(10) OVER (PARTITION BY c_mktsegment
                           ORDER BY c_acctbal DESC, c_custkey ASC) AS decile
    FROM customer WHERE c_acctbal > 0
    """,
    doc="ratio-to-report + NTILE decile binning per segment (one shared exchange)",
)
def a_ratio_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-total and equal-frequency decile per segment — the
    feature-binning pair. The denominator is an exact DECIMAL sum over
    the segment partition (double partition sums drift with
    partitioning); ntile needs the total-order tiebreak to be
    deterministic. Both windows partition by segment, so Catalyst
    plans ONE hash exchange."""
    cu = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    seg = Window.partitionBy("c_mktsegment")
    ord_w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    share = F.round(
        F.col("c_acctbal")
        / F.sum(F.col("c_acctbal").cast("decimal(12,2)")).over(seg).cast("double"),
        10,
    )
    return cu.select(
        "c_custkey",
        "c_mktsegment",
        share.alias("share_of_segment"),
        F.ntile(10).over(ord_w).alias("decile"),
    )


@register(
    "events_cohort_retention",
    """
    WITH cohorts AS (
      SELECT user_id, CAST(MIN(date_trunc('week', ts)) AS TIMESTAMP) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
      FROM events
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_week
    ),
    ret AS (
      SELECT c.cohort_week,
             CAST(date_diff('day', c.cohort_week, a.week) / 7 AS INTEGER)
               AS week_offset,
             COUNT(*) AS n_active
      FROM cohorts c JOIN activity a ON a.user_id = c.user_id
      GROUP BY 1, 2
    )
    SELECT r.cohort_week, r.week_offset, r.n_active, s.cohort_size,
           ROUND(CAST(r.n_active AS DOUBLE) / s.cohort_size, 6) AS retention_rate
    FROM ret r JOIN sizes s ON s.cohort_week = r.cohort_week
    """,
    doc="cohort retention: first-seen week cohorts x weekly activity, rate per offset",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The product-analytics staple: users grouped by first-seen week,
    retention = share still active N weeks later. Three aggregates and
    two joins, all hash-partitioned on user_id / cohort_week — the
    cohort and activity frames are both user-cardinality (small
    relative to events), so at scale only the two DISTINCT/MIN passes
    scan the fact table. One IEEE division at the end."""
    from pyspark.storagelevel import StorageLevel

    ev = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    # persisted (r12): cohorts feeds BOTH the per-cohort size count and
    # the retention join — unpersisted, Catalyst planned the full
    # events MIN-pass once per consumer (runtime-audited: 3 events
    # scans, zero ReusedExchange). The cache is user-cardinality, two
    # columns — already small relative to the fact table at any scale —
    # and removes one full fact scan + map-side-combined shuffle.
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.min(wk).alias("cohort_week"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    activity = ev.select("user_id", wk.alias("week")).distinct()
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        cohorts.join(activity, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return ret.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active").cast("double") / F.col("cohort_size"), 6
        ).alias("retention_rate"),
    )


@register(
    "j_null_safe_eq",
    """
    WITH a AS (
      SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp FROM customer
    ),
    b AS (
      SELECT NULLIF(n_nationkey % 5, 0) AS grp, COUNT(*) AS n_nations
      FROM nation GROUP BY 1
    )
    SELECT a.grp, COUNT(*) AS n_customers, ANY_VALUE(b.n_nations) AS n_nations
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    GROUP BY a.grp
    """,
    doc="null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys match each other",
)
def j_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain equality drops NULL keys from an inner join; the
    null-safe operator keeps the NULL<=>NULL group — the behavior a
    dimension join needs when 'unknown' is a real category. Spark
    plans eqNullSafe as a hash join key (coalesced), NOT a nested
    loop, so it scales like any equi-join."""
    cu = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp")
    )
    na = (
        load_table(spark, sf_dir, "nation")
        .select(F.nullif(F.col("n_nationkey") % 5, F.lit(0)).alias("grp"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )
    return (
        cu.join(na.withColumnRenamed("grp", "b_grp"), cu.grp.eqNullSafe(F.col("b_grp")))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.first("n_nations").alias("n_nations"),
        )
    )


@register(
    "f_map_ops",
    """
    WITH m AS (
      SELECT o_orderkey,
             MAP {'status': o_orderstatus, 'priority': o_orderpriority} AS props
      FROM orders WHERE o_orderkey % 50 = 0
    )
    SELECT o_orderkey,
           props['status'][1] AS status,
           props['priority'][1] AS priority,
           CAST(cardinality(props) AS INTEGER) AS n_keys,
           array_to_string(list_sort(map_keys(props)), ',') AS keys_sorted
    FROM m
    """,
    doc="map column ops: construct, extract by key, cardinality, sorted key list",
)
def f_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map columns carry sparse per-row attributes without schema
    evolution (the props pattern). Construction and key extraction
    are map-only codegen expressions; keys are sorted before joining
    because map iteration order is engine-private — never compare raw
    map renderings across engines."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status"),
        F.element_at(m, "priority").alias("priority"),
        F.size(m).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
    )


@register(
    "f_timezone_suite",
    """
    SELECT event_id,
           CAST(timezone('America/Toronto', timezone('UTC', ts)) AS TIMESTAMP)
             AS ts_toronto,
           CAST(timezone('UTC', timezone('America/Toronto', ts)) AS TIMESTAMP)
             AS ts_as_if_toronto_utc,
           CAST(EXTRACT(hour FROM timezone('America/Toronto', timezone('UTC', ts)))
             AS INTEGER) AS local_hour
    FROM events WHERE event_id % 25 = 0
    """,
    doc="timezone conversion both directions (UTC<->America/Toronto), session-TZ-independent",
)
def f_timezone_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference normalizes scraped Canadian timestamps to UTC
    (get_news.py:275) and dashboards re-localize for display; both
    directions via IANA rules. The oracle nests timezone() twice so
    neither side depends on the session timezone — the absolute
    instant is pinned by the inner call. January data = EST, no DST
    edge in-corpus (the IANA tables handle it identically if present)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 25 == 0)
    return ev.select(
        "event_id",
        F.from_utc_timestamp("ts", "America/Toronto").alias("ts_toronto"),
        F.to_utc_timestamp("ts", "America/Toronto").alias("ts_as_if_toronto_utc"),
        F.hour(F.from_utc_timestamp("ts", "America/Toronto"))
        .cast("int")
        .alias("local_hour"),
    )


@register(
    "a_period_over_period",
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1
    )
    SELECT day, total,
           lag(total) OVER (ORDER BY day ASC) AS prev_total,
           ROUND((total - lag(total) OVER (ORDER BY day ASC))
                 / lag(total) OVER (ORDER BY day ASC) * 100, 6) AS pct_change
    FROM daily
    """,
    doc="period-over-period: daily totals + lag-based percent change (dashboard staple)",
)
def a_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day deltas: one fact aggregation, then a lag window
    over the DAY-cardinality frame — the unpartitioned window is safe
    because its input is already reduced to one row per day (bounded),
    never the fact table. Exact-decimal daily totals make the ratio
    deterministic."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total")
    )
    w = Window.orderBy(F.col("day").asc())
    prev = F.lag("total").over(w)
    return daily.select(
        "day",
        "total",
        prev.alias("prev_total"),
        F.round((F.col("total") - prev) / prev * 100, 6).alias("pct_change"),
    )


@register(
    "j_right_outer_nulls",
    """
    SELECT n.n_nationkey, n.n_name, c.c_custkey
    FROM customer c
    RIGHT JOIN nation n
      ON c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9990
    """,
    doc="right outer join: preserved side keeps unmatched keys with NULL probe columns",
)
def j_right_outer_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the join-type matrix (inner/left/full/semi/anti/cross
    elsewhere): the selective pre-join condition on the probe side
    leaves most nations unmatched, which must surface as NULL
    c_custkey rows — the asymmetry that distinguishes the ON-clause
    filter from a WHERE (which would drop them)."""
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation")
    return cu.join(
        na,
        (cu.c_nationkey == na.n_nationkey) & (cu.c_acctbal > 9990),
        "right_outer",
    ).select("n_nationkey", "n_name", "c_custkey")


@register(
    "f_array_set_ops",
    """
    WITH t AS (
      SELECT doc_id,
             list_distinct(regexp_extract_all(lower(text), '[a-z]+')) AS a,
             list_distinct(regexp_extract_all(lower(substr(text, 1, 200)), '[a-z]+')) AS b
      FROM documents WHERE doc_id % 25 = 0
    )
    SELECT doc_id,
           -- COALESCE: DuckDB array_to_string([]) is NULL, Spark
           -- array_join([]) is '' — zero-token docs must agree
           COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '')
             AS both_,
           CAST(len(list_filter(a, x -> NOT list_contains(b, x))) AS INTEGER)
             AS only_full,
           CAST(len(list_distinct(list_concat(a, b))) AS INTEGER) AS union_size
    FROM t
    """,
    doc="array set algebra: intersect / except / union-distinct (sorted before render)",
)
def f_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra on array columns — all codegen, no explode: the
    vocabulary of the 200-char prefix vs the full document. Arrays are
    sorted before string-rendering because set-op output order is
    engine-private (same rule as map keys)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 25 == 0)
    toks = lambda c: F.array_distinct(
        F.regexp_extract_all(F.lower(c), F.lit("[a-z]+"), 0)
    )
    a = toks(F.col("text"))
    b = toks(F.substring(F.col("text"), 1, 200))
    return docs.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_intersect(a, b)), ",").alias("both_"),
        F.size(F.array_except(a, b)).alias("only_full"),
        F.size(F.array_distinct(F.concat(a, b))).alias("union_size"),
    )


@register(
    "j_range_bin_join",
    """
    WITH bins AS (
      SELECT i AS bin_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
      FROM (SELECT unnest(generate_series(0, 9)) AS i)
    )
    SELECT b.bin_id, b.lo, b.hi, COUNT(e.event_id) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e JOIN bins b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bin_id, b.lo, b.hi
    """,
    doc="range-bin join: fact rows matched to a small interval dimension (broadcast nested loop)",
)
def j_range_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binning via an interval DIMENSION (not a computed bucket) — the
    shape you need when bins are irregular or configured at runtime.
    The bins side is tiny, so the non-equi condition plans as a
    BroadcastNestedLoopJoin: each fact row tests 10 intervals in the
    broadcast hash — linear in the fact table, never a shuffled
    cartesian. With computable bins prefer the arithmetic bucket
    (doc_length_histogram); this is the general-interval fallback."""
    ev = load_table(spark, sf_dir, "events")
    bins = spark.range(10).select(
        F.col("id").cast("int").alias("bin_id"),
        (F.col("id") * 50.0).alias("lo"),
        ((F.col("id") + 1) * 50.0).alias("hi"),
    )
    return (
        ev.join(
            F.broadcast(bins),
            (ev.value >= F.col("lo")) & (ev.value < F.col("hi")),
        )
        .groupBy("bin_id", "lo", "hi")
        .agg(
            F.count("event_id").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "a_rolling_distinct_users",
    """
    WITH du AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
      FROM events
    ),
    days AS (SELECT DISTINCT day FROM du)
    SELECT d.day,
           COUNT(DISTINCT u.user_id) AS users_7d
    FROM days d
    JOIN du u ON u.day >= d.day - INTERVAL 6 DAY AND u.day <= d.day
    GROUP BY d.day
    """,
    doc="rolling 7-day distinct users: day-spine range join over the (day,user) distinct frame",
)
def a_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counts do NOT compose across window frames (no
    partial-merge), so the rolling-unique metric joins the day spine
    to the per-day distinct pairs within the range and re-counts. The
    fact table is reduced to |days| x |users| pairs FIRST — at 100 TB
    the range join runs on that small frame, never on raw events; the
    spine side broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    return (
        du.alias("u")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("u.day") >= F.col("d.day") - F.expr("INTERVAL 6 DAY"))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("users_7d"))
    )


@register(
    "a_rolling_zscore",
    """
    WITH st AS (
      SELECT user_id, event_id, ts, value,
             COUNT(*) OVER w AS n,
             SUM(CAST(value AS DECIMAL(12,2))) OVER w AS s1,
             SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2)))
               OVER w AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id, ts,
           CASE WHEN n > 1
                  AND (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                      / (n - 1) > 0
                THEN ROUND((value - CAST(s1 AS DOUBLE) / n)
                     / sqrt((CAST(s2 AS DOUBLE)
                             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                            / (n - 1)), 6)
                ELSE NULL END AS zscore
    FROM st
    """,
    doc="rolling z-score anomaly signal: exact-decimal moment sums over a 21-row frame",
)
def a_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online anomaly scoring: each event against its user's trailing
    21-event window. Mean/stddev derive from exact DECIMAL moment
    sums over the ROWS frame (native stddev over doubles is
    summation-order-dependent and drifts between engines/partitions);
    the three window aggregates share one user_id exchange. The same
    moment-sum trick is what makes this expressible in streaming
    state later."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-20, 0)
    )
    v = F.col("value").cast("decimal(12,2)")
    n = F.count(F.lit(1)).over(w)
    s1 = F.sum(v).over(w).cast("double")
    s2 = F.sum(v * v).over(w).cast("double")
    st = ev.select(
        "user_id", "event_id", "ts", "value",
        n.alias("n"), s1.alias("s1"), s2.alias("s2"),
    )
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    z = F.round(
        (F.col("value") - F.col("s1") / F.col("n")) / F.sqrt(var), 6
    )
    return st.select(
        "user_id", "event_id", "ts",
        F.when((F.col("n") > 1) & (var > 0), z).otherwise(F.lit(None)).alias("zscore"),
    )


@register(
    "a_group_linear_regression",
    """
    WITH m AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(24,0))) AS sx,
             SUM(CAST(value AS DECIMAL(12,2))) AS sy,
             SUM(CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(24,0))
                 * CAST(value AS DECIMAL(12,2))) AS sxy,
             SUM(CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(24,0))
                 * CAST(epoch_us(ts) - 1704067200000000 AS DECIMAL(24,0))) AS sxx
      FROM events GROUP BY user_id
    )
    SELECT user_id, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE) * 86400000000.0, 8)
             AS slope_per_day,
           ROUND((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
                    / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / n, 6) AS intercept
    FROM m WHERE n >= 2
    """,
    doc="per-group OLS trend line from exact decimal moment sums (one shuffle, no UDF/MLlib)",
)
def a_group_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value-over-time trend — the feature-engineering
    regression that does NOT need MLlib or a UDAF: slope and intercept
    are closed forms over five moment sums, all exact DECIMAL (x is
    integer epoch-micros rebased to the corpus epoch so products stay
    in range), reduced map-side in ONE shuffle. The only doubles are
    the final two divisions, identical on any engine. Native
    regr_slope over doubles would be summation-order-dependent."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_micros("ts") - F.lit(1704067200000000)).cast("decimal(24,0)")
    y = F.col("value").cast("decimal(12,2)")
    m = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    ).filter(F.col("n") >= 2)
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / F.col("n")
    return m.select(
        "user_id",
        "n",
        F.round(slope * 86400000000.0, 8).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    )


@register(
    "j_fuzzy_trigram_blocked",
    """
    WITH corrupted AS (
      SELECT c_custkey AS dirty_id,
             substr(c_name, 1, CAST(c_custkey % 7 + 3 AS INTEGER))
               || substr(c_name, CAST(c_custkey % 7 + 5 AS INTEGER)) AS dirty_name
      FROM customer WHERE c_custkey % 10 = 0
    ),
    canon AS (SELECT c_custkey, c_name FROM customer),
    d_keys AS (
      SELECT DISTINCT dirty_id, dirty_name, k.g
      FROM corrupted,
           unnest([substr(dirty_name, length(dirty_name) - 3, 4),
                   substr(dirty_name, length(dirty_name) - 7, 4)]) AS k(g)
    ),
    c_keys AS (
      SELECT DISTINCT c_custkey, c_name, k.g
      FROM canon,
           unnest([substr(c_name, length(c_name) - 3, 4),
                   substr(c_name, length(c_name) - 7, 4)]) AS k(g)
    ),
    c_keys_clamped AS (
      SELECT * FROM (
        SELECT c_custkey, c_name, g,
               COUNT(*) OVER (PARTITION BY g) AS block_freq
        FROM c_keys
      ) WHERE block_freq <= 32
    ),
    blocked AS (
      SELECT DISTINCT d.dirty_id, d.dirty_name, c.c_custkey, c.c_name
      FROM d_keys d JOIN c_keys_clamped c ON c.g = d.g
    ),
    verified AS (
      SELECT dirty_id, dirty_name, c_custkey AS match_id,
             levenshtein(dirty_name, c_name) AS dist,
             ROW_NUMBER() OVER (PARTITION BY dirty_id
                                ORDER BY levenshtein(dirty_name, c_name) ASC,
                                         c_custkey ASC) AS rnk
      FROM blocked
      WHERE levenshtein(dirty_name, c_name) <= 2
    )
    SELECT dirty_id, dirty_name, match_id, dist
    FROM verified WHERE rnk = 1
    """,
    doc="entity resolution: multi-key blocked fuzzy join + edit-distance verify + best-match pick",
)
def j_fuzzy_trigram_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalable fuzzy-join shape: block candidate pairs on a SMALL
    set of discriminative keys (two 4-char suffix q-grams here),
    verify survivors with edit distance <= 2, keep the best match per
    dirty record with a deterministic tiebreak — never an all-pairs
    levenshtein. Blocking keys must be chosen for the data: naive
    whole-string trigrams are catastrophically promiscuous on
    templated names like 'Customer#000000042' (every name shares
    'Cus'/'ust'/'000' -> the block join goes quadratic; measured 10x+
    blow-up at sf0.1). The suffix keys hit the high-entropy region and
    bound block size at ~N/10^4; production systems union several such
    keys and clamp any block whose frequency explodes, exactly like
    hot LSH bands. Dirty names derive from the canonical set by a
    key-seeded char deletion in the low-entropy prefix, so ground
    truth is known and the suffix keys survive corruption."""
    cu = load_table(spark, sf_dir, "customer")
    k = (F.col("c_custkey") % 7 + 3).cast("int")
    dirty = cu.filter(F.col("c_custkey") % 10 == 0).select(
        F.col("c_custkey").alias("dirty_id"),
        F.concat(
            F.substring(F.col("c_name"), 1, F.lit(0) + k),
            F.col("c_name").substr(k + 2, F.lit(200)),
        ).alias("dirty_name"),
    )
    canon = cu.select("c_custkey", "c_name")

    def block_keys(name_col: str):
        n = F.length(name_col)
        return F.array_distinct(
            F.array(
                F.col(name_col).substr(n - 3, F.lit(4)),
                F.col(name_col).substr(n - 7, F.lit(4)),
            )
        )

    d_keys = dirty.select(
        "dirty_id", "dirty_name", F.explode(block_keys("dirty_name")).alias("g")
    )
    c_keys = canon.select(
        "c_custkey", "c_name", F.explode(block_keys("c_name")).alias("g")
    )
    # the block clamp: any key whose canonical block exceeds 32 rows is
    # non-discriminative (zero-padding regions, template text) and is
    # dropped BEFORE the join — recall survives via the other key(s).
    # Same windowed count the LSH band clamp uses; same partitioning
    # the join needs, so it costs no extra exchange.
    from pyspark.sql import Window

    c_keys = (
        c_keys.withColumn(
            "block_freq", F.count(F.lit(1)).over(Window.partitionBy("g"))
        )
        .filter(F.col("block_freq") <= 32)
        .drop("block_freq")
    )
    blocked = (
        d_keys.join(c_keys, "g")
        .select("dirty_id", "dirty_name", "c_custkey", "c_name")
        .distinct()
    )
    verified = blocked.withColumn(
        "dist", F.levenshtein("dirty_name", "c_name")
    ).filter(F.col("dist") <= 2)
    from pyspark.sql import Window

    w = Window.partitionBy("dirty_id").orderBy(
        F.col("dist").asc(), F.col("c_custkey").asc()
    )
    return (
        verified.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("dirty_id", "dirty_name", F.col("c_custkey").alias("match_id"), "dist")
    )


@register(
    "a_winsorize",
    """
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice ASC) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    b AS (
      SELECT l_returnflag,
             MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.01 * n) AS BIGINT))
                      THEN l_extendedprice END) AS p01,
             MAX(CASE WHEN rn = GREATEST(1, CAST(CEIL(0.99 * n) AS BIGINT))
                      THEN l_extendedprice END) AS p99
      FROM r GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN l.l_extendedprice < b.p01 OR l.l_extendedprice > b.p99
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
           ROUND(CAST(SUM(CAST(
             CASE WHEN l.l_extendedprice < b.p01 THEN b.p01
                  WHEN l.l_extendedprice > b.p99 THEN b.p99
                  ELSE l.l_extendedprice END AS DECIMAL(14,4))) AS DOUBLE)
             / COUNT(*), 6) AS winsorized_mean
    FROM lineitem l JOIN b ON b.l_returnflag = l.l_returnflag
    GROUP BY l.l_returnflag
    """,
    doc="winsorization: per-group discrete p01/p99 clamp + robust mean (outlier capping for features)",
)
def a_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier capping before feature aggregation: clamp to per-group
    percentile bounds, then aggregate the clamped values. The bounds
    are DISCRETE percentiles — the actual data value at rank
    ceil(p*n), the ``a_percentile_disc`` rule — NOT interpolated ones:
    interpolation manufactures a double that exists in neither
    engine's data, and a 1-ulp divergence in that double flips
    ``<``/``>`` clamp comparisons for rows sitting exactly at the
    bound (seen on a content-fresh x3 warehouse: DuckDB's
    quantile_cont p99 landed 1 ulp below Spark's percentile() and
    n_clamped moved by 3). Discrete bounds stay in the column's exact
    decimal domain, so every comparison and the DECIMAL(14,4) clamp
    sum are engine-exact and row-count-independent. The value at rank
    r is invariant to tie order (ties permute rows only within
    equal-value runs), so ORDER BY the value alone is deterministic.
    One window exchange for the bounds (tiny per-group aggregate,
    broadcast back)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    wr = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").asc()
    )
    wn = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    t01 = F.greatest(F.lit(1), F.ceil(0.01 * F.col("n")).cast("bigint"))
    t99 = F.greatest(F.lit(1), F.ceil(0.99 * F.col("n")).cast("bigint"))
    b = (
        r.filter((F.col("rn") == t01) | (F.col("rn") == t99))
        .groupBy(F.col("l_returnflag").alias("b_flag"))
        .agg(
            F.max(
                F.when(F.col("rn") == t01, F.col("l_extendedprice"))
            ).alias("p01"),
            F.max(
                F.when(F.col("rn") == t99, F.col("l_extendedprice"))
            ).alias("p99"),
        )
    )
    j = li.join(F.broadcast(b), F.col("b_flag") == F.col("l_returnflag"))
    clamped = (
        F.when(F.col("l_extendedprice") < F.col("p01"), F.col("p01"))
        .when(F.col("l_extendedprice") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("l_extendedprice"))
    )
    out_of_range = (F.col("l_extendedprice") < F.col("p01")) | (
        F.col("l_extendedprice") > F.col("p99")
    )
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(out_of_range, 1).otherwise(0)).cast("bigint").alias("n_clamped"),
        F.round(
            F.sum(clamped.cast("decimal(14,4)")).cast("double") / F.count(F.lit(1)),
            6,
        ).alias("winsorized_mean"),
    )


@register(
    "p_topk_with_ties",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC) AS rnk
      FROM orders WHERE o_custkey % 100 = 0
    ) WHERE rnk <= 2
    """,
    doc="top-k per group WITH ties (rank <= k): the keep-all-peers variant of p12's row_number",
)
def p_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() <= k keeps every row tied at the boundary — the correct
    semantics when 'top 2 orders' must not arbitrarily drop an equal
    price (row_number would, nondeterministically without a tiebreak).
    Same single window exchange as p12; no tiebreaker needed because
    peers share ranks by definition."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.rank().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 2)
    )


@register(
    "events_pattern_adjacent",
    """
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             lead(event_type) OVER w AS next_type,
             lead(event_id) OVER w AS next_id,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT user_id, event_id AS click_id, next_id AS purchase_id,
           CAST(FLOOR((epoch_us(next_ts) - epoch_us(ts)) / 1000000) AS BIGINT)
             AS gap_sec
    FROM seq
    WHERE event_type = 'click' AND next_type = 'purchase'
    """,
    doc="adjacent-pair pattern detection (click immediately followed by purchase)",
)
def events_pattern_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern matching, adjacency form: the next event in
    the user's stream must be the target type — stricter than the
    funnel's first-times and the as-of join's time-window. One lead()
    window; the pattern filter is a plain predicate on the
    self-aligned row, no self-join."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "user_id", "event_id", "ts", "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead("event_id").over(w).alias("next_id"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    return seq.filter(
        (F.col("event_type") == "click") & (F.col("next_type") == "purchase")
    ).select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("next_id").alias("purchase_id"),
        F.floor((F.unix_micros("next_ts") - F.unix_micros("ts")) / 1000000)
        .cast("bigint")
        .alias("gap_sec"),
    )


@register(
    "f_struct_ops",
    """
    WITH lines AS (
      SELECT l_orderkey,
             {'qty': l_quantity, 'line': l_linenumber, 'price': l_extendedprice}
               AS ls
      FROM lineitem WHERE l_orderkey % 200 = 0
    ),
    agg AS (
      SELECT l_orderkey, list_sort(list(ls)) AS sorted_lines
      FROM lines GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(sorted_lines) AS INTEGER) AS n_lines,
           sorted_lines[1].qty AS min_qty,
           sorted_lines[1].line AS min_qty_line,
           sorted_lines[len(sorted_lines)].qty AS max_qty,
           ROUND(sorted_lines[1].price, 2) AS min_qty_price
    FROM agg
    """,
    doc="nested struct ops: build, collect, total-order sort, positional field extraction",
)
def f_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-of-struct algebra: per-order line structs collected and
    sorted by the struct's total field order (qty, line, price), then
    fields extracted positionally. collect_list order is
    partition-dependent, so the sort is what makes the result
    deterministic — and structs are never emitted raw (engines render
    them differently); only extracted scalars leave the query."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 200 == 0)
    ls = F.struct(
        F.col("l_quantity").alias("qty"),
        F.col("l_linenumber").alias("line"),
        F.col("l_extendedprice").alias("price"),
    )
    agg = li.select("l_orderkey", ls.alias("ls")).groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("ls")).alias("sorted_lines")
    )
    n = F.size("sorted_lines")
    return agg.select(
        "l_orderkey",
        n.cast("int").alias("n_lines"),
        F.col("sorted_lines")[0]["qty"].alias("min_qty"),
        F.col("sorted_lines")[0]["line"].alias("min_qty_line"),
        F.element_at("sorted_lines", n)["qty"].alias("max_qty"),
        F.round(F.col("sorted_lines")[0]["price"], 2).alias("min_qty_price"),
    )


@register(
    "quality_fk_audit",
    """
    SELECT 'lineitem->orders' AS fk, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
    UNION ALL
    SELECT 'lineitem->part', COUNT(*),
           CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON p.p_partkey = l.l_partkey
    UNION ALL
    SELECT 'lineitem->supplier', COUNT(*),
           CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON s.s_suppkey = l.l_suppkey
    UNION ALL
    SELECT 'orders->customer', COUNT(*),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="warehouse-wide FK audit: orphan counts for every fact->dim edge (dbt relationships test, batched)",
)
def quality_fk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every FK edge audited in one submitted job — the dbt
    `relationships` test generalized from the news schema
    (operators/quality.py) to the warehouse. Each edge is a left join
    + null count (AQE broadcasts the dim side); a healthy warehouse
    returns zero orphans, and the row per edge keeps the audit
    monitorable."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")

    def edge(fact, dim, fk, pk, label):
        return (
            fact.join(dim, fact[fk] == dim[pk], "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(dim[pk].isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(F.lit(label).alias("fk"), "n_rows", "n_orphans")
        )

    return (
        edge(li, o, "l_orderkey", "o_orderkey", "lineitem->orders")
        .unionByName(edge(li, p, "l_partkey", "p_partkey", "lineitem->part"))
        .unionByName(edge(li, s, "l_suppkey", "s_suppkey", "lineitem->supplier"))
        .unionByName(edge(o, c, "o_custkey", "c_custkey", "orders->customer"))
    )


@register(
    "a_pivot_multi_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS f_n,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS f_qty,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
             AS o_n,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                         THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE)
             AS o_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="pivot with MULTIPLE aggregates per cell (count + exact-decimal sum), one pass",
)
def a_pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two measures per pivot cell in one grouped pass — the explicit
    value list keeps the output schema static (pivot without a value
    list runs a distinct-scan first AND can produce unbounded-width
    rows at scale). Column names are normalized to the oracle's."""
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("qty"),
        )
    )
    return piv.select(
        "l_returnflag",
        F.col("F_n").cast("bigint").alias("f_n"),
        F.col("F_qty").alias("f_qty"),
        F.col("O_n").cast("bigint").alias("o_n"),
        F.col("O_qty").alias("o_qty"),
    )


@register(
    "a_weighted_median",
    """
    WITH w AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(l_quantity AS DECIMAL(12,2)) AS wt,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC
               ROWS UNBOUNDED PRECEDING) AS cum_wt,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
               PARTITION BY l_returnflag) AS tot_wt
      FROM lineitem
    ),
    hit AS (
      SELECT l_returnflag, v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cum_wt ASC, v ASC) AS rn
      FROM w
      WHERE CAST(cum_wt AS DOUBLE) >= CAST(tot_wt AS DOUBLE) / 2
    )
    SELECT l_returnflag, v AS weighted_median FROM hit WHERE rn = 1
    """,
    doc="weighted median: cumulative exact-decimal weight crossing half the total (quantity-weighted price)",
)
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted percentile no built-in offers: order by value with
    a total-order tiebreak, accumulate exact DECIMAL weights, take the
    first row whose running weight crosses half the (windowed) total.
    Both windows share the group exchange; weights stay decimal until
    the single crossing comparison, so the crossing row is identical
    on any engine/partitioning."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    wt = F.col("l_quantity").cast("decimal(12,2)")
    cum = (
        Window.partitionBy("l_returnflag")
        .orderBy(
            F.col("l_extendedprice").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.sum(wt).over(cum).alias("cum_wt"),
        F.sum(wt).over(tot).alias("tot_wt"),
    ).filter(
        F.col("cum_wt").cast("double") >= F.col("tot_wt").cast("double") / 2
    )
    rn = F.row_number().over(
        Window.partitionBy("l_returnflag").orderBy(
            F.col("cum_wt").asc(), F.col("v").asc()
        )
    )
    return (
        w.select("l_returnflag", "v", rn.alias("rn"))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("v").alias("weighted_median"))
    )


@register(
    "u_union_distinct",
    """
    SELECT c_mktsegment AS seg, c_nationkey FROM customer WHERE c_nationkey < 5
    UNION
    SELECT c_mktsegment, c_nationkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="UNION DISTINCT set semantics (vs UNION ALL elsewhere): dedup across branches",
)
def u_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UNION's default distinct semantics — rows equal across
    branches collapse. Spark's ``union`` is UNION ALL; the explicit
    ``distinct()`` afterwards is the faithful translation (one
    hash-aggregate over the concatenation, not a join)."""
    cu = load_table(spark, sf_dir, "customer")
    a = cu.filter(F.col("c_nationkey") < 5).select(
        F.col("c_mktsegment").alias("seg"), "c_nationkey"
    )
    b = cu.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_mktsegment").alias("seg"), "c_nationkey"
    )
    return a.union(b).distinct()


@register(
    "a_percentile_disc",
    """
    WITH r AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice ASC,
                                         l_orderkey ASC, l_linenumber ASC) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag, l_extendedprice AS p90_disc
    FROM r WHERE rn = GREATEST(1, CAST(CEIL(0.9 * n) AS BIGINT))
    """,
    doc="discrete percentile: the actual element at ceil(p*n) — no interpolation, returns a real row value",
)
def a_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_disc semantics spelled out as the explicit rank
    formula (engines disagree on disc rounding conventions, so BOTH
    sides use the same ceil(p*n) rule): unlike the interpolated
    `a_exact_percentiles`, the result is guaranteed to be an actual
    data value — what you want when the percentile indexes back into
    rows (e.g., 'show me the p90 document'). One window exchange."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").asc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    wn = Window.partitionBy("l_returnflag")
    r = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    target = F.greatest(F.lit(1), F.ceil(0.9 * F.col("n")).cast("bigint"))
    return r.filter(F.col("rn") == target).select(
        "l_returnflag", F.col("l_extendedprice").alias("p90_disc")
    )


@register(
    "f_url_parse",
    """
    WITH u AS (
      SELECT doc_id,
             'https://news' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.ca/articles/' || CAST(doc_id AS VARCHAR)
               || '?utm_source=feed' || CAST(doc_id % 3 AS VARCHAR)
               || '&page=' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents WHERE doc_id % 20 = 0
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]page=([^&]*)', 1) AS page_param
    FROM u
    """,
    doc="URL parsing: protocol/host/path/query-param extraction (reference article-URL handling)",
)
def f_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference keys articles by URL (get_news.py url fields) and
    strips tracking params for dedup; Spark's parse_url covers the
    split natively (the oracle mirrors it with regex, which is also
    the portable fallback). Deterministic synthetic URLs derive from
    doc_id so the parse is verifiable. Map-only."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://news"), (d % 7).cast("string"),
        F.lit(".example.ca/articles/"), d.cast("string"),
        F.lit("?utm_source=feed"), (d % 3).cast("string"),
        F.lit("&page="), (d % 5).cast("string"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.lower(F.parse_url("url", F.lit("PROTOCOL"))).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("page")).alias("page_param"),
    )


@register(
    "a_mode_per_group",
    """
    WITH c AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ),
    r AS (
      SELECT c_mktsegment, c_nationkey, n,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n DESC, c_nationkey ASC) AS rn
      FROM c
    )
    SELECT c_mktsegment, c_nationkey AS mode_nationkey, n AS mode_count
    FROM r WHERE rn = 1
    """,
    doc="statistical mode per group: two-level count + deterministic argmax window",
)
def a_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent value per group — no built-in mode() is
    engine-portable (tie behavior is implementation-defined), so the
    mode is spelled out: count per (group, value), then a tiebroken
    argmax window over the count frame (group-cardinality-sized, tiny
    after the first aggregate)."""
    from pyspark.sql import Window

    cu = load_table(spark, sf_dir, "customer")
    c = cu.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), F.col("c_nationkey").asc()
    )
    return (
        c.select("*", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("c_nationkey").alias("mode_nationkey"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "events_dwell_time_stats",
    """
    WITH d AS (
      SELECT user_id, gap_us FROM (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                 PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS gap_us
        FROM events
      ) WHERE gap_us IS NOT NULL
    ),
    g AS (
      SELECT user_id,
             COUNT(*) AS n_gaps,
             MIN(gap_us) AS min_us,
             quantile_cont(gap_us, 0.5) AS q50_us,
             list_sort(list(gap_us)) AS gs
      FROM d GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           CAST(FLOOR(min_us / 1000000) AS BIGINT) AS min_gap_sec,
           q50_us / 1000000 AS p50_gap_sec,
           gs[CAST(FLOOR((n_gaps - 1) * 0.9) AS INTEGER) + 1] AS p90_gap_us
    FROM g
    """,
    doc="dwell-time distribution per user: lag gaps -> exact percentile summary",
)
def events_dwell_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event dwell times (the engagement signal sessionization
    thresholds are tuned from): integer epoch-micro lag gaps, then per-
    user percentiles. The lag window and the aggregate share the
    user_id partitioning — one exchange.

    Cross-engine exactness (sf0.1 caught a ROUND(,4) boundary flip:
    Spark rounds doubles via decimal string HALF_UP, DuckDB rounds the
    binary value): p50 is the UNROUNDED type-7 interpolation — on
    integer micros that is exactly (a+b)/2, bit-identical in both
    engines; p90 is the DISCRETE element at an explicitly computed
    index (floor((n-1)*0.9) is the same IEEE product and floor on both
    sides), an exact BIGINT in micros — no float rounding anywhere.
    collect_list is bounded by max events/user (the same bound the
    sessionizer's state store assumes).

    INVARIANT — the interpolated p50 is output-only: never feed it
    into a COMPARISON (see a_winsorize's round-5 1-ulp clamp flip).
    On integer micros (a+b)/2 happens to be bit-identical anyway, but
    the rule stands so a future edit doesn't branch on it."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    d = ev.select("user_id", gap.alias("gap_us")).filter(F.col("gap_us").isNotNull())
    n = F.count(F.lit(1))
    g = d.groupBy("user_id").agg(
        n.alias("n_gaps"),
        F.floor(F.min("gap_us") / 1000000).cast("bigint").alias("min_gap_sec"),
        (F.expr("percentile(gap_us, 0.5)") / 1000000).alias("p50_gap_sec"),
        F.sort_array(F.collect_list("gap_us")).alias("gs"),
    )
    idx = F.floor((F.col("n_gaps") - 1) * F.lit(0.9)).cast("int") + 1
    return g.select(
        "user_id",
        "n_gaps",
        "min_gap_sec",
        "p50_gap_sec",
        F.element_at("gs", idx).alias("p90_gap_us"),
    )


@register(
    "a_cume_dist",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROUND(cume_dist() OVER (PARTITION BY o_custkey % 50
                                   ORDER BY o_totalprice ASC), 8) AS cd
    FROM orders WHERE o_custkey % 50 = 7
    """,
    doc="cume_dist: fraction of partition peers at or below each row (tie-stable)",
)
def a_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the rank family (rank/dense_rank/percent_rank/ntile
    covered elsewhere): cume_dist counts peers AT the current value,
    so it is deterministic under ties without a tiebreaker — unlike
    percent_rank's rank-1 numerator, the two differ exactly on tied
    rows."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 7)
    w = Window.partitionBy(F.col("o_custkey") % 50).orderBy(
        F.col("o_totalprice").asc()
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.round(F.cume_dist().over(w), 8).alias("cd"),
    )


@register(
    "a_grouping_sets_explicit",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    doc="explicit non-hierarchical GROUPING SETS (neither rollup nor cube): two independent margins, one pass",
)
def a_grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary grouping-set combinations — the general form behind
    ROLLUP/CUBE: two independent one-column margins computed in a
    single Expand pass over the fact table (a UNION of two GROUP BYs
    would scan twice). Spark SQL expresses it directly; the absent
    column in each set is NULL in the output."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "a_argmax_bool_aggs",
    """
    SELECT o_orderstatus,
           arg_max(o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
             AS top_order,
           arg_min(o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) * 10000000 + o_orderkey)
             AS bottom_order,
           CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_large,
           bool_and(o_totalprice > 0) AS all_positive,
           bool_or(o_totalprice > 500000) AS any_jumbo
    FROM orders GROUP BY o_orderstatus
    """,
    doc="argmax/argmin + boolean aggregates (every/any/count_if), tie-safe composite key",
)
def a_argmax_bool_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by tie behavior is implementation-defined, so the
    ordering key is a composite exact integer (cents x 1e7 + orderkey)
    that is unique per row — the portable way to make argmax
    deterministic. The cents computation must be *identical* on both
    sides: a bare double->bigint CAST rounds in DuckDB but truncates in
    Spark, so near-.5-cent values flip the winner — both sides round()
    explicitly before the cast. count_if / every / some are the boolean
    aggregate trio (DuckDB: count_if / bool_and / bool_or)."""
    o = load_table(spark, sf_dir, "orders")
    key = F.round(F.col("o_totalprice") * 100).cast("bigint") * 10000000 + F.col(
        "o_orderkey"
    )
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", key).alias("top_order"),
        F.min_by("o_orderkey", key).alias("bottom_order"),
        F.count_if(F.col("o_totalprice") > 200000).cast("bigint").alias("n_large"),
        F.every(F.col("o_totalprice") > 0).alias("all_positive"),
        F.some(F.col("o_totalprice") > 500000).alias("any_jumbo"),
    )


@register(
    "a_conditional_count_distinct",
    """
    SELECT o_orderstatus,
           COUNT(DISTINCT CASE WHEN o_totalprice > 200000 THEN o_custkey END)
             AS big_spenders,
           COUNT(DISTINCT o_custkey) AS all_customers
    FROM orders GROUP BY o_orderstatus
    """,
    doc="conditional COUNT(DISTINCT): distinct keys among qualifying rows only (NULL-eliminating CASE)",
)
def a_conditional_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers among qualifying rows — the CASE produces
    NULL for non-qualifying rows and COUNT(DISTINCT) drops NULLs, so
    no pre-filter join is needed; both distincts share one Expand
    pass with the unconditional one."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct(
            F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
        ).alias("big_spenders"),
        F.countDistinct("o_custkey").alias("all_customers"),
    )


@register(
    "o_limit_offset_page",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
    doc="keyless pagination: ORDER BY total-order + LIMIT/OFFSET (page 3 of the price ranking)",
)
def o_limit_offset_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 3 of a ranked listing — only deterministic because the
    ORDER BY is a total order (the tiebreak again). OFFSET still sorts
    the first offset+limit rows (TakeOrdered with a larger k), so deep
    pagination should switch to keyset pagination (WHERE key < last
    seen) — this query documents the shallow-page form."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(40)
        .limit(20)
    )
