package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shape and concentration analytics — the reporting verbs a
  * surveillance/ops dashboard derives from the same event and order
  * streams the reference aggregates per-frame (`main.py:226-233` counts;
  * `auth_user` relational side): inequality (Gini), market concentration
  * (HHI), persistence (autocorrelation), coverage (Pareto), and weekly
  * seasonality.
  *
  * Determinism discipline (the Relational.scala rule): every aggregate
  * sums EXACT integers (cents) or exact decimals; doubles appear only in
  * the final scalar arithmetic (division / sqrt — both IEEE
  * correctly-rounded, so bit-identical across engines given identical
  * exact inputs). No double is ever SUMMED, so parallel reduction order
  * cannot flip a rounded digit.
  *
  * Scale notes: per-key partials are BIGINT cents; anything multiplied
  * by a rank or by itself is cast to DECIMAL(38,0) BEFORE the sum (a
  * rank×cents product at 1e9 rows × 1e7 cents overflows BIGINT; DuckDB
  * silently widens to HUGEINT, Spark must be told). Windows partition by
  * the report key, never globally except where the output itself is
  * dow/day-sized.
  */
object Analytics {

  /** q_gini: Gini coefficient of per-customer order spend, per region —
    * "how unequal is customer value" as one number per region. Formula
    * over ascending spend with 1-based rank i:
    * G = (2·Σ(i·x_i) − (n+1)·Σx_i) / (n·Σx_i).
    * Plan: orders reduce to per-customer cents (shuffle on custkey),
    * customer join is co-partitioned on the same key, nation⋈region
    * rides in broadcast; the rank window partitions by region. Ties
    * break on custkey so the rank — and therefore the sum — is a total
    * order on both engines. */
  def gini(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
    val geo = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name"))
    val ranked = spend
      .join(geo, col("o_custkey") === col("c_custkey"))
      .withColumn("i", row_number().over(
        Window.partitionBy("r_name").orderBy(col("cents"), col("o_custkey"))))
    ranked
      .groupBy(col("r_name").as("region"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents").cast("decimal(38,0)")).as("s"),
        sum((col("i").cast("decimal(38,0)") * col("cents"))).as("w"))
      .select(col("region"), col("n_customers"),
        when(col("s") === 0, lit(0.0))
          .otherwise(round(
            (lit(2) * col("w") - (col("n_customers") + 1) * col("s")).cast("double")
              / (col("n_customers") * col("s")).cast("double"), 6)).as("gini"))
      .orderBy("region")
  }

  /** q_hhi: Herfindahl–Hirschman concentration of event value across
    * event types, per day — "is one event type dominating the day".
    * HHI = Σ share_t² = Σv_t² / (Σv_t)², computed from the exact cents
    * sums so no per-type double share is ever summed. 1.0 = one type
    * carries everything; 1/n_types = perfectly even. */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
        col("event_type"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    perType
      .groupBy("day")
      .agg(count(lit(1)).as("n_types"),
        sum(col("v").cast("decimal(38,0)")).as("tot"),
        sum((col("v").cast("decimal(38,0)") * col("v"))).as("sq"))
      .select(col("day"), col("n_types"),
        when(col("tot") === 0, lit(0.0))
          .otherwise(round(col("sq").cast("double")
            / (col("tot") * col("tot")).cast("double"), 6)).as("hhi"))
      .orderBy("day")
  }

  /** q_autocorr: lag-1 autocorrelation of the daily revenue series, per
    * event type — "does a strong day predict the next". Pearson r over
    * (yesterday, today) pairs of OBSERVED days (a gap pairs across it —
    * documented, matches the oracle), from the six exact sums; doubles
    * only in the closing ratio. Degenerate series (either side constant,
    * or <2 pairs) report 0.0 on both engines rather than NULL/NaN. */
  def autocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val pairs = daily
      .withColumn("x", lag("v", 1).over(w))
      .filter(col("x").isNotNull)
      .withColumnRenamed("v", "y")
    val s = pairs.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x").cast("decimal(38,0)") * col("y"))).as("sxy"),
        sum((col("x").cast("decimal(38,0)") * col("x"))).as("sxx"),
        sum((col("y").cast("decimal(38,0)") * col("y"))).as("syy"))
    val varx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    s.select(col("event_type"), col("n").as("n_pairs"),
        when(col("n") < 2 || varx === 0.0 || vary === 0.0, lit(0.0))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt(varx) * sqrt(vary)), 6)).as("lag1_autocorr"))
      .orderBy("event_type")
  }

  /** q_pareto: how concentrated is revenue — per event type, the fewest
    * users whose combined value reaches 80% of the type's total, and the
    * share of the user base they are. The 80% test is the INTEGER
    * comparison 5·cum ≥ 4·total (decimal-exact on both engines), so no
    * cumulative double share is ever compared against a threshold. */
  def pareto(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val w = Window.partitionBy("event_type")
      .orderBy(col("v").desc, col("user_id"))
    val wAll = Window.partitionBy("event_type")
    val ranked = perUser
      // long, not int: DuckDB's row_number is BIGINT and the driver's
      // frame compare is dtype-sensitive (the q_winnow lesson)
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("v").cast("decimal(38,0)")).over(w))
      .withColumn("tot", sum(col("v").cast("decimal(38,0)")).over(wAll))
      .withColumn("n_users", count(lit(1)).over(wAll))
    ranked
      .filter(col("cum") * 5 >= col("tot") * 4)
      .groupBy("event_type")
      .agg(max("n_users").as("n_users"),
        min("rn").as("users_to_80"))
      .select(col("event_type"), col("n_users"), col("users_to_80"),
        round(col("users_to_80").cast("double") / col("n_users"), 4)
          .as("user_share"))
      .orderBy("event_type")
  }

  /** q_xcorr: Pearson correlation between line quantity and extended
    * price, per return flag — "do bigger orders carry proportionally
    * bigger value". Same exact-sums construction as [[autocorr]]: both
    * measures go to integer hundredths, the six sums are DECIMAL(38,0),
    * doubles only in the closing ratio. The built-in `corr` aggregate is
    * deliberately NOT used: it sums doubles in reduction order. */
  def xcorr(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long").as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
    val s = pts.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum((col("x").cast("decimal(38,0)") * col("y"))).as("sxy"),
        sum((col("x").cast("decimal(38,0)") * col("x"))).as("sxx"),
        sum((col("y").cast("decimal(38,0)") * col("y"))).as("syy"))
    val varx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vary = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    s.select(col("l_returnflag"), col("n").as("n_items"),
        when(col("n") < 2 || varx === 0.0 || vary === 0.0, lit(0.0))
          .otherwise(round(
            (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (sqrt(varx) * sqrt(vary)), 6)).as("qty_price_corr"))
      .orderBy("l_returnflag")
  }

  /** q_gap_stats: inter-event cadence — for each event type, the
    * distribution of seconds since the SAME USER's previous event (any
    * type): pair count, median, p90, max. The engagement-rhythm verb
    * behind "how often do users come back". One (user)-partitioned sort
    * produces every gap; the quantiles run per type over exact BIGINT
    * seconds (`percentile` ≡ DuckDB `quantile_cont` on integers — the
    * q_quantiles equivalence). */
  def gapStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - lag(unix_timestamp(col("ts")), 1).over(w))
      .filter(col("gap_s").isNotNull)
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(expr("percentile(gap_s, 0.5)"), 4).as("p50_gap_s"),
        round(expr("percentile(gap_s, 0.9)"), 4).as("p90_gap_s"),
        max("gap_s").as("max_gap_s"))
      .orderBy("event_type")
  }

  /** q_ema: exponentially-weighted moving average (α = 0.3) of each
    * event type's daily revenue — the standard smoothed trend line. EMA
    * is inherently sequential (ema_t = α·x_t + (1−α)·ema_{t−1}), which
    * SQL window frames can't express exactly; here each type's daily
    * series is collected into ONE sorted array (|days| elements — a
    * bounded, dim-sized state, NOT fact-sized) and folded left-to-right
    * with `aggregate`, appending each step's value. The fold's float ops
    * run in one fixed order, so the doubles are bit-identical to the
    * oracle's recursive-CTE evaluation of the same recurrence — the
    * q_entropy sequential-fold trick, applied to a recurrence instead of
    * a sum. Exploded back out, one row per (type, day). */
  def ema(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("cents")))).as("s"))
      .select(col("event_type"), explode(expr(
        """aggregate(s,
          |  cast(array() as array<struct<day:string, ema:double>>),
          |  (acc, x) -> array_append(acc, named_struct('day', x.day,
          |    'ema', if(size(acc) = 0, cast(x.cents as double),
          |       0.3d * x.cents + 0.7d * element_at(acc, size(acc)).ema))))
          |""".stripMargin)).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        round(col("e.ema"), 6).as("ema_cents"))
      .orderBy("event_type", "day")
  }

  /** q_key_skew: the shuffle-skew audit a scale engineer reads before
    * picking a partitioning — the distribution of rows per join key
    * (lineitem's orderkey): key count, mean/median/p99/max rows per key,
    * and max/mean as the headline skew ratio. All counts exact; the two
    * ratios are the only doubles. One narrow agg per key then one
    * key-cardinality agg — never a fact-sized window. */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.lineitem(spark, dir)
      .groupBy("l_orderkey").agg(count(lit(1)).as("rows_per_key"))
    perKey.agg(
        count(lit(1)).as("n_keys"),
        sum("rows_per_key").as("n_rows"),
        round(expr("percentile(rows_per_key, 0.5)"), 4).as("p50_rows"),
        round(expr("percentile(rows_per_key, 0.99)"), 4).as("p99_rows"),
        max("rows_per_key").as("max_rows"))
      .select(col("n_keys"), col("n_rows"), col("p50_rows"), col("p99_rows"),
        col("max_rows"),
        round(col("max_rows") * col("n_keys")
          / col("n_rows").cast("double"), 4).as("skew_ratio"))
  }

  /** q_moments: higher central moments — per return flag, the skewness
    * and excess kurtosis of line quantity (in exact hundredths). The
    * four power sums Σx..Σx⁴ are DECIMAL(38,0)-exact; central moments
    * come from the algebraic identities
    *   n²·m3 = (n²Σx³ − 3nΣxΣx² + 2(Σx)³) / n  (times 1/n³ overall)
    *   m2    = (nΣx² − (Σx)²) / n²
    * and the closing arithmetic is double-only. `pow(x, 1.5)` is
    * deliberately avoided — libm pow is not correctly rounded and JVM vs
    * C could differ in the last ulp; `sqrt` and multiplication ARE
    * IEEE-correctly-rounded, so m2^(3/2) is built as sqrt(m2)·m2.
    * Headroom note: x⁴ sums need ~4·log10(x)+log10(n) digits; hundredths
    * of a bounded measure (quantity ≤ 500·100) fit DECIMAL(38,0) up to
    * ~1e13 rows per group — at larger scales drop to whole units. */
  def moments(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        floor(col("l_quantity") * 100).cast("long").as("x"))
    val s = pts.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("s1"),
        sum((col("x").cast("decimal(38,0)") * col("x"))).as("s2"),
        sum((col("x").cast("decimal(38,0)") * col("x") * col("x"))).as("s3"),
        sum((col("x").cast("decimal(38,0)") * col("x") * col("x") * col("x"))).as("s4"))
    // doubles from here down — one fixed expression tree on both engines
    val n = col("n").cast("double")
    val (s1, s2) = (col("s1").cast("double"), col("s2").cast("double"))
    val (s3, s4) = (col("s3").cast("double"), col("s4").cast("double"))
    val m2 = (n * s2 - s1 * s1) / (n * n)
    val m3 = (n * n * s3 - lit(3.0) * n * s1 * s2 + lit(2.0) * s1 * s1 * s1) / (n * n * n)
    val m4 = (n * n * n * s4 - lit(4.0) * n * n * s1 * s3
      + lit(6.0) * n * s1 * s1 * s2 - lit(3.0) * s1 * s1 * s1 * s1) / (n * n * n * n)
    s.select(col("l_returnflag"), col("n").as("n_items"),
        when(col("n") < 2 || m2 === 0.0, lit(0.0))
          .otherwise(round(m3 / (sqrt(m2) * m2), 6)).as("skewness"),
        when(col("n") < 2 || m2 === 0.0, lit(0.0))
          .otherwise(round(m4 / (m2 * m2) - 3.0, 6)).as("excess_kurtosis"))
      .orderBy("l_returnflag")
  }

  /** q_calendar: a generated date dimension — no source table at all:
    * `sequence(start, stop)` + explode builds the spine, the attributes
    * (dow, week, month, quarter, is_weekend) are derived per row. The
    * dimension every warehouse joins to, shown as a pure generator
    * (constant-folded scan; the only data movement is the final
    * verify sort). */
  def calendar(spark: SparkSession, dir: String): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(java.sql.Date.valueOf("2024-01-01")),
        lit(java.sql.Date.valueOf("2024-06-30")))).as("day"))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        (dayofweek(col("day")) - 1).cast("long").as("dow"),
        weekofyear(col("day")).cast("long").as("iso_week"),
        month(col("day")).cast("long").as("month"),
        quarter(col("day")).cast("long").as("quarter"),
        dayofweek(col("day")).isin(1, 7).as("is_weekend"))
      .orderBy("day")

  /** q_anomaly_days: trailing-window anomaly screen — each day's total
    * revenue z-scored against the mean/sd of the PRECEDING 7 observed
    * days (never including itself — no self-dampening), flagging
    * |z| ≥ 2. The operational "did something break yesterday" monitor.
    * Trailing mean/sd come from exact cents sums and sums-of-squares in
    * a ROWS frame (sd via the same nΣx²−(Σx)² identity as the moment
    * queries); doubles only at the closing z. Days with fewer than 7
    * predecessors or a zero-variance window report z = 0 (warm-up). */
  def anomalyDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val w = Window.orderBy("day").rowsBetween(-7, -1)
    val scored = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("v").cast("decimal(38,0)")).over(w))
      .withColumn("s2", sum((col("v").cast("decimal(38,0)") * col("v"))).over(w))
    val n = col("n").cast("double")
    val (s1, s2) = (col("s1").cast("double"), col("s2").cast("double"))
    val mean = s1 / n
    val variance = (n * s2 - s1 * s1) / (n * n)
    val z = (col("v").cast("double") - mean) / sqrt(variance)
    scored
      .select(col("day"), col("v").as("cents"),
        when(col("n") < 7 || variance <= 0.0, lit(0.0))
          .otherwise(round(z, 4)).as("z"),
        when(col("n") < 7 || variance <= 0.0, lit(false))
          .otherwise(abs(z) >= 2.0).as("is_anomaly"))
      .orderBy("day")
  }

  /** q_drift: population-stability-index drift monitor — per event
    * type, the PSI of the value distribution between the month's first
    * half (reference) and second half (current): Σ (p−q)·ln(p/q) over 5
    * fixed value buckets, add-one smoothed so an empty bucket never
    * takes ln(0). The ML-ops report that decides "retrain or not". All
    * bucket counts are exact; the PSI fold runs over ONE per-type array
    * sorted by bucket id (the q_entropy sequential-fold discipline), so
    * the 5-term double sum has one fixed order on both engines. */
  def drift(spark: SparkSession, dir: String): DataFrame = {
    val bucket = when(col("value") < 10, 0L).when(col("value") < 50, 1L)
      .when(col("value") < 100, 2L).when(col("value") < 250, 3L).otherwise(4L)
    val period = when(dayofmonth(to_date(col("ts"))) <= 14, lit("ref"))
      .otherwise(lit("cur"))
    val counts = Tables.events(spark, dir)
      .select(col("event_type"), bucket.as("b"), period.as("p"))
      .groupBy("event_type", "b")
      .agg(sum(when(col("p") === "ref", 1L).otherwise(0L)).as("r"),
        sum(when(col("p") === "cur", 1L).otherwise(0L)).as("c"))
    // materialize ALL 5 buckets per type: a bucket empty in BOTH halves
    // still contributes a nonzero smoothed term whenever n_ref ≠ n_cur,
    // and the groupBy alone silently dropped it (PSI underestimated) —
    // the "Σ over 5 fixed buckets" the doc promises needs the grid
    val grid = counts.select("event_type").distinct()
      .crossJoin(broadcast(spark.range(0, 5).select(col("id").as("b"))))
    val full = grid.join(counts, Seq("event_type", "b"), "left")
      .na.fill(0L, Seq("r", "c"))
    full
      .groupBy("event_type")
      .agg(sum("r").as("n_ref"), sum("c").as("n_cur"),
        array_sort(collect_list(struct(col("b"), col("r"), col("c")))).as("bs"))
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(expr(
          """aggregate(bs, 0.0d, (acc, x) ->
            |  acc + ((x.r + 1) / cast(n_ref + 5 as double)
            |         - (x.c + 1) / cast(n_cur + 5 as double))
            |      * ln(((x.r + 1) / cast(n_ref + 5 as double))
            |          / ((x.c + 1) / cast(n_cur + 5 as double))))
            |""".stripMargin), 6).as("psi"))
      .orderBy("event_type")
  }

  /** q_ks: two-sample Kolmogorov–Smirnov statistic between the click and
    * view value distributions — the nonparametric "are these two
    * samples from the same distribution" test a drift monitor reaches
    * for when PSI's fixed buckets are too coarse. D = max over x of
    * |F̂₁(x) − F̂₂(x)|, computed exactly over the DISTINCT observed
    * values as the integer cross-product |cum₁·n₂ − cum₂·n₁| (no double
    * CDF is ever subtracted); the single division happens once on the
    * final max.
    *
    * Scale shape: the fact table collapses to one row per distinct
    * cents value FIRST (partial-aggregable shuffle), so the ordered
    * cumulative window runs over a value-cardinality frame (≤10⁴ here —
    * prices are bounded), never the fact. For genuinely continuous
    * measures the same plan runs over sketch-bucketed values (the
    * q_histogram_eq boundary recipe) with D exact per bucket edge. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("cents")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
    val wCum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = perVal.agg(
      sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    perVal
      .withColumn("cum1", sum(col("c1").cast("decimal(38,0)")).over(wCum))
      .withColumn("cum2", sum(col("c2").cast("decimal(38,0)")).over(wCum))
      .crossJoin(broadcast(tot))
      .groupBy("n1", "n2")
      .agg(max(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))).as("dmax"))
      .select(col("n1"), col("n2"),
        when(col("n1") === 0 || col("n2") === 0, lit(0.0))
          .otherwise(round(col("dmax").cast("double")
            / (col("n1").cast("decimal(38,0)") * col("n2")).cast("double"), 6))
          .as("ks_stat"))
  }

  /** q_cusum: CUSUM changepoint scan over the daily revenue series, per
    * event type — the day where the cumulative deviation from the
    * period mean peaks is the classic single-changepoint estimate
    * (Page 1954's statistic in offline form). The deviation
    * S_i = Σ_{j≤i}(x_j − x̄) is kept exact as the integer
    * n·cum_i − i·total (never a running double), so the argmax — and
    * the tie-break on earliest day — is bit-deterministic.
    *
    * Scale shape: one partial-aggregable shuffle to daily grain, then
    * per-type windows over a days-sized frame; the argmax is a second
    * window over the same partitioning (no extra exchange). */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val wOrd = Window.partitionBy("event_type").orderBy("day")
    val wAll = Window.partitionBy("event_type")
    val scanned = daily
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("v").cast("decimal(38,0)")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("v").cast("decimal(38,0)")).over(wAll))
      .withColumn("dev", abs(col("n") * col("cum") - col("i") * col("tot")))
    val wPick = Window.partitionBy("event_type")
      .orderBy(col("dev").desc, col("day"))
    scanned
      .withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        date_format(col("day"), "yyyy-MM-dd").as("cp_day"),
        round(col("dev").cast("double") / col("n").cast("double") / 100.0, 6)
          .as("max_dev"))
      .orderBy("event_type")
  }

  /** q_mad: robust outlier days via median-absolute-deviation — the
    * stddev-based q_anomaly_days screen breaks when the outlier itself
    * inflates sigma; MAD doesn't. Flags days where
    * |x − median| > 2.5·MAD and reports the 0.6745-scaled robust z.
    * Medians interpolate exact integers (cents) or their exact dyadic
    * midpoints, so `percentile` ≡ DuckDB `quantile_cont` bit-for-bit
    * (the q_quantiles/q_impute precedent).
    *
    * Scale shape: the two median passes run on the DAILY frame
    * (days×types rows) and come back as broadcast joins; the fact table
    * is aggregated once and never windowed. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(v, 0.5)").as("med"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("v") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .filter(col("mad") > 0 && col("adev") > lit(2.5) * col("mad"))
      .select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("v").as("cents"),
        round(lit(0.6745) * (col("v") - col("med")) / col("mad"), 6)
          .as("robust_z"))
      .orderBy("event_type", "day")
  }

  /** q_winsorize: winsorized mean of event value per type — the robust
    * location estimate a quality dashboard quotes when a few giant
    * purchases would swamp the plain mean: values below p10 count as
    * p10, above p90 as p90. Uses the sketch-boundary two-pass shape the
    * r7 verdict prescribed for q_rfm/q_wmedian: percentile cuts on a
    * per-type aggregate, broadcast back, then ONE exact aggregate over
    * the fact — the winsorized sum is reassembled as
    * Σmid + n_lo·p10 + n_hi·p90 (exact integer sum plus two scalar
    * products), never a sum of per-row clipped doubles. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
    val cuts = e.groupBy("event_type").agg(
      expr("percentile(cents, 0.1)").as("lo"),
      expr("percentile(cents, 0.9)").as("hi"))
    e.join(broadcast(cuts), "event_type")
      .groupBy("event_type", "lo", "hi")
      .agg(count(lit(1)).as("n"),
        sum(when(col("cents") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(col("cents") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(col("cents") >= col("lo") && col("cents") <= col("hi"),
          col("cents").cast("decimal(38,0)")).otherwise(lit(0).cast("decimal(38,0)")))
          .as("s_mid"))
      .select(col("event_type"), col("n"), col("n_lo"), col("n_hi"),
        round(col("lo") / 100.0, 4).as("cut_lo"),
        round(col("hi") / 100.0, 4).as("cut_hi"),
        round((col("s_mid").cast("double") + col("n_lo").cast("double") * col("lo")
          + col("n_hi").cast("double") * col("hi"))
          / col("n").cast("double") / 100.0, 6).as("wmean"))
      .orderBy("event_type")
  }

  /** q_runs: Wald–Wolfowitz runs test on the daily revenue series, per
    * event type — "is the above/below-median pattern random, or does
    * the series streak". Days equal to the (interpolated) median are
    * dropped per standard practice; R counts maximal same-sign runs via
    * one lag over the days frame. E[R] = 2ab/m + 1 and
    * Var[R] = 2ab(2ab−m)/(m²(m−1)) are evaluated as scalar doubles in
    * identical textual order on both engines; everything upstream (a,
    * b, R) is an exact integer. Degenerate series (one sign absent, or
    * m ≤ 1) report z = 0.
    *
    * Scale shape: the only fact-sized op is the daily aggregation; the
    * median is a days-frame percentile broadcast back, and the run
    * count is a lag window over the same days frame. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile(v, 0.5)").as("med"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val signed = daily.join(broadcast(med), "event_type")
      .filter(col("v") =!= col("med"))
      .withColumn("s", when(col("v") > col("med"), 1L).otherwise(0L))
    val counted = signed
      .withColumn("prev", lag("s", 1).over(w))
      .groupBy("event_type")
      .agg(sum(col("s")).as("n_above"),
        sum(lit(1L) - col("s")).as("n_below"),
        sum(when(col("prev").isNull || col("prev") =!= col("s"), 1L)
          .otherwise(0L)).as("runs"))
    val m = (col("n_above") + col("n_below")).cast("double")
    val tab = (lit(2L) * col("n_above") * col("n_below")).cast("double")
    counted.select(col("event_type"), col("n_above"), col("n_below"), col("runs"),
        // the 2ab = m guard: at n_above = n_below = 1 (the only solution
        // of 2ab = a+b with a,b ≥ 1) Var[R] = 0 and R = E[R], so the
        // formula is 0/0 — the documented degenerate-series contract
        // (z = 0) covers it, the NaN did not
        when(col("n_above") === 0 || col("n_below") === 0
            || col("n_above") + col("n_below") <= 1
            || lit(2L) * col("n_above") * col("n_below")
                 === col("n_above") + col("n_below"), lit(0.0))
          .otherwise(round(
            (col("runs").cast("double") - (tab / m + lit(1.0)))
              / sqrt(tab * (tab - m) / (m * m * (m - lit(1.0)))), 6)).as("z"))
      .orderBy("event_type")
  }

  /** q_kendall: Mann–Kendall monotone-trend test per event type —
    * S = Σ_{i<j} sgn(x_j − x_i) over all ordered day pairs, with the
    * tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18
    * and the ±1 continuity correction in z. The robust cousin of
    * q_trend's OLS slope (no linearity assumption, outlier-immune); S,
    * n, and the tie term are exact integers, z is one scalar double.
    *
    * Scale shape: the pair join is a theta self-join of the DAILY frame
    * (calendar-bounded: 30 days → 435 pairs per type) — never the fact.
    * The broadcast hint makes the boundedness explicit in the plan. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val s = daily.select(col("event_type"), col("day").as("d1"), col("v").as("x1"))
      .join(broadcast(daily.select(col("event_type").as("et2"),
        col("day").as("d2"), col("v").as("x2"))),
        col("event_type") === col("et2") && col("d1") < col("d2"))
      .groupBy("event_type")
      .agg(sum(when(col("x2") > col("x1"), 1L)
        .when(col("x2") < col("x1"), -1L).otherwise(0L)).as("s_stat"))
    val n = daily.groupBy("event_type").agg(count(lit(1)).as("n_days"))
    val ties = daily.groupBy("event_type", "v").agg(count(lit(1)).as("t"))
      .groupBy("event_type")
      .agg(sum(col("t") * (col("t") - 1) * (lit(2L) * col("t") + 5)).as("tie_term"))
    val nd = col("n_days").cast("double")
    val varS = (nd * (nd - 1.0) * (lit(2.0) * nd + 5.0)
      - col("tie_term").cast("double")) / 18.0
    s.join(n, "event_type").join(ties, "event_type")
      .select(col("event_type"), col("n_days"), col("s_stat"),
        when(col("s_stat") === 0 || varS <= 0.0, lit(0.0))
          .otherwise(round(
            (col("s_stat").cast("double")
              - when(col("s_stat") > 0, 1.0).otherwise(-1.0)) / sqrt(varS), 6))
          .as("z"))
      .orderBy("event_type")
  }

  /** q_emd: Wasserstein-1 (earth mover's) distance between the click
    * and view value distributions — the integral companion to q_ks's
    * max: EMD = Σ over distinct values of |F̂₁−F̂₂|·gap. Each term is
    * the exact integer |cum₁·n₂ − cum₂·n₁|·(next − cents), summed in
    * decimal(38,0); the single division by n₁·n₂·100 closes it in
    * currency units. Sensitive to WHERE the distributions differ, not
    * just the largest pointwise gap — the drift magnitude q_ks's
    * significance test doesn't give.
    *
    * Scale shape: identical to q_ks — one partial-aggregable collapse
    * to the distinct-cents frame, cumulative + lead windows over that
    * value-cardinality frame, never the fact. BOUNDED-DOMAIN ASSUMPTION
    * (shared with q_ks): the unpartitioned windows are safe because
    * `value` is a price on a cents grid (≤10⁴ distinct values), a
    * property of the DOMAIN, not of the data volume. For an unbounded
    * continuous measure, bucket to a fixed grid first (the
    * q_histogram_eq boundary recipe) or two-level the prefix sum (the
    * q_auc reshape) before this plan runs at scale. */
  def emdDistance(spark: SparkSession, dir: String): DataFrame = {
    val perVal = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("cents"))
      .groupBy("cents")
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c1"),
        sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("c2"))
    val wCum = Window.orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLead = Window.orderBy("cents")
    val tot = perVal.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    perVal
      .withColumn("cum1", sum(col("c1").cast("decimal(38,0)")).over(wCum))
      .withColumn("cum2", sum(col("c2").cast("decimal(38,0)")).over(wCum))
      .withColumn("gap", lead("cents", 1).over(wLead) - col("cents"))
      .filter(col("gap").isNotNull)
      .crossJoin(broadcast(tot))
      .groupBy("n1", "n2")
      .agg(sum(abs(col("cum1") * col("n2") - col("cum2") * col("n1"))
        * col("gap")).as("w"))
      .select(col("n1"), col("n2"),
        when(col("n1") === 0 || col("n2") === 0, lit(0.0))
          .otherwise(round(col("w").cast("double")
            / (col("n1").cast("decimal(38,0)") * col("n2")).cast("double")
            / 100.0, 6)).as("emd"))
  }

  /** q_seasonality: day-of-week revenue profile — each weekday's share
    * of total value and its index against a uniform week (share·7; 1.0 =
    * flat). Output is 7 rows; the "window" is the one-row total riding
    * in as a broadcast cross join, not a global sort. Day numbering is
    * 0 = Sunday (Spark dayofweek()−1 ≡ DuckDB dayofweek()). */
  def seasonality(spark: SparkSession, dir: String): DataFrame = {
    val perDow = Tables.events(spark, dir)
      .groupBy((dayofweek(to_date(col("ts"))) - 1).cast("long").as("dow"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100).cast("long")).as("cents"))
    val tot = perDow.agg(sum(col("cents").cast("decimal(38,0)")).as("tot"))
    perDow.crossJoin(broadcast(tot))
      .select(col("dow"), col("n_events"), col("cents"),
        when(col("tot") === 0, lit(0.0))
          .otherwise(round(col("cents").cast("double") / col("tot").cast("double"), 4))
          .as("rev_share"),
        when(col("tot") === 0, lit(0.0))
          .otherwise(round(col("cents").cast("double") * 7
            / col("tot").cast("double"), 4)).as("rev_index"))
      .orderBy("dow")
  }

  /** q_spearman: Spearman rank correlation between the daily view and
    * click volumes — "do busy view days co-move with busy click days"
    * measured on ranks, so one outlier day cannot swamp the statistic
    * the way it can q_trend's Pearson-style OLS. With ranks forced to a
    * total order (ties broken by day), ρ has the closed form
    * 1 − 6·Σd²/(n(n²−1)): Σd² is an exact integer, the single division
    * is the only double. The rank windows are unpartitioned BUT
    * calendar-bounded (≤ n_days rows — the day grid, never the fact),
    * the same boundedness class as q_cusum's per-type day frames.
    *
    * Scale shape: one partial-aggregable collapse of events to the
    * daily grain, then two windows + one aggregate over the day-grid
    * frame. At 100 TB the day grid is still tiny (years ≈ thousands of
    * rows); nothing fact-sized is sorted. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("nv"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("nc"))
    val ranked = daily
      .withColumn("rv", row_number().over(Window.orderBy(col("nv"), col("day"))))
      .withColumn("rc", row_number().over(Window.orderBy(col("nc"), col("day"))))
    val d = (col("rv") - col("rc")).cast("long")
    val n = col("n_days").cast("double")
    ranked
      .agg(count(lit(1)).as("n_days"), sum(d * d).as("sum_d2"))
      .select(col("n_days"), col("sum_d2"),
        when(col("n_days") <= 1, lit(0.0))
          .otherwise(round(lit(1.0) - lit(6.0) * col("sum_d2").cast("double")
            / (n * (n * n - lit(1.0))), 6)).as("rho"))
  }

  /** q_theilsen: Theil–Sen trend of daily click revenue, per event
    * type — the slope estimate that is the MEDIAN of all pairwise
    * slopes (y_j − y_i)/(t_j − t_i), robust to ~29% outlier days where
    * q_trend's least-squares line is dragged by one bad day. The
    * intercept is the companion median of residuals y_i − m·t_i. Each
    * slope is one IEEE division of exact integers (cents over epoch-day
    * gaps); `percentile` is the same linear-interpolation definition as
    * DuckDB's quantile_cont, so the medians compare exactly.
    *
    * Scale shape: the pair frame is a theta self-join of the DAILY
    * per-type series (calendar-bounded: 30 days → ≤435 pairs per type,
    * broadcast-hinted to keep the boundedness visible in the plan),
    * never the fact; the fact is touched once by the partial-aggregable
    * daily collapse. Years of days at 100 TB ≈ 10⁵–10⁶ pairs per type —
    * still a dimension frame. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("t"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("v"))
    val slopes = daily.select(col("event_type"), col("t").as("t1"), col("v").as("v1"))
      .join(broadcast(daily.select(col("event_type").as("et2"),
        col("t").as("t2"), col("v").as("v2"))),
        col("event_type") === col("et2") && col("t1") < col("t2"))
      .select(col("event_type"),
        ((col("v2") - col("v1")).cast("double")
          / (col("t2") - col("t1")).cast("double")).as("slope"))
    val m = slopes.groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("slope_med"))
    daily.join(m, "event_type")
      .groupBy(col("event_type"), col("n_pairs"), col("slope_med"))
      .agg(expr("percentile(v - slope_med * t, 0.5)").as("icept_med"))
      .select(col("event_type"), col("n_pairs"),
        round(col("slope_med"), 4).as("sen_slope"),
        round(col("icept_med"), 2).as("sen_intercept"))
      .orderBy("event_type")
  }

  /** q_bootstrap: bootstrap confidence interval for mean daily revenue,
    * with a DETERMINISTIC hash resampler — draw i of resample b picks
    * day (((b·1000003 + i)·2654435761) mod 999983) mod n (the Knuth
    * constant Curation.splitOf already uses, routed through an
    * intermediate prime so the draw is not an affine bijection), so
    * the "random" draw is exact
    * integer arithmetic both engines reproduce bit-for-bit: no RNG
    * state, no seed plumbing, rerunnable anywhere. Each resample mean
    * is an exact cents sum over n draws; the grand mean divides the
    * exact Σ of those sums ONCE (no double is ever summed); the CI
    * bounds are `percentile` (≡ quantile_cont) over the 200 resample
    * means.
    *
    * Scale shape: the fact collapses once to the daily frame; the
    * draw grid is B×n_days rows of pure integer arithmetic JOINED back
    * to the broadcast-sized daily frame on the day index — at 100 TB
    * (years of days, B=200) that is ~10⁵ grid rows, a dimension frame.
    * Bootstrapping FACT-grain statistics at scale would instead use
    * poissonized per-row multipliers; for a daily-mean CI this exact
    * grid is the right (and cheaper) shape. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
      .withColumn("i", row_number().over(Window.orderBy("day")).cast("long") - 1)
    val tot = daily.agg(count(lit(1)).as("n_days"))
    val draws = tot
      .select(col("n_days"), explode(sequence(lit(0L), lit(199L))).as("b"))
      .select(col("n_days"), col("b"),
        explode(sequence(lit(0L), col("n_days") - 1)).as("i"))
      .select(col("n_days"), col("b"),
        // the hash routes through an intermediate PRIME modulus before
        // % n: a bare affine map ((C+i)·K mod n) over consecutive i is a
        // BIJECTION of the day set — every "resample" would be a
        // permutation of all days and the CI collapses to a point
        pmod(pmod((col("b") * lit(1000003L) + col("i")) * lit(2654435761L),
          lit(999983L)), col("n_days")).as("idx"))
    val resamples = draws
      .join(broadcast(daily.select(col("i").as("idx"), col("x"))), "idx")
      .groupBy("b", "n_days").agg(sum(col("x")).as("sum_x"))
      .withColumn("mean_b", col("sum_x").cast("double") / col("n_days"))
    resamples
      .groupBy("n_days")
      .agg(count(lit(1)).as("n_boot"), sum(col("sum_x")).as("grand"),
        expr("percentile(mean_b, 0.025)").as("lo"),
        expr("percentile(mean_b, 0.975)").as("hi"))
      .select(col("n_days"), col("n_boot"),
        round(col("grand").cast("double")
          / (col("n_boot") * col("n_days")).cast("double"), 4).as("boot_mean_cents"),
        round(col("lo"), 4).as("ci_lo_cents"),
        round(col("hi"), 4).as("ci_hi_cents"))
  }

  /** q_km: Kaplan–Meier survival curve for time-to-first-purchase —
    * every user is anchored at their first event, observed at their
    * first purchase or right-censored at the observation window's end
    * (the standard incomplete-data estimator naive conversion rates get
    * wrong: censored users are at-risk until they drop out, not
    * failures). S(t) = Π_{t_i ≤ t} (1 − d_i/n_i) evaluated as
    * exp(Σ ln((n−d)/n)) over the ORDERED event-time frame — each ln
    * input an exact integer ratio, the cumulative sum running in frame
    * order on both engines, so the product is bit-deterministic without
    * a product aggregate (which Spark lacks).
    *
    * Scale shape: one shuffle collapses events to per-user (first-event,
    * first-purchase) — partial-aggregable min/max. Everything after
    * lives on the duration-value frame (≤ days in the window): the
    * at-risk counts are one cumulative window, the survival product a
    * second over the same ordering. Nothing fact-sized is windowed. */
  def kaplanMeier(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val perUser = ev.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase", to_date(col("ts")))).as("tp"))
    val mx = ev.agg(max(to_date(col("ts"))).as("mxd"))
    val dur = perUser.crossJoin(broadcast(mx))
      .select(
        when(col("tp").isNotNull, datediff(col("tp"), col("t0")))
          .otherwise(datediff(col("mxd"), col("t0"))).cast("long").as("t"),
        when(col("tp").isNotNull, 1L).otherwise(0L).as("observed"))
    val perT = dur.groupBy("t")
      .agg(sum(col("observed")).as("d"), count(lit(1)).as("leaving"))
    val wBefore = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = dur.agg(count(lit(1)).as("n_users"))
    perT.crossJoin(broadcast(tot))
      .withColumn("n_risk",
        col("n_users") - coalesce(sum(col("leaving")).over(wBefore), lit(0L)))
      .filter(col("d") > 0)
      // the terminal time can take every remaining at-risk user (n = d):
      // its factor is an exact 0 and ln(0) is engine-divergent (DuckDB
      // errors, Spark nulls) — so the zero is carried as a flag and the
      // ln-sum runs over the safe rows only (sum skips the guarded null
      // identically on both engines)
      .withColumn("term", when(col("d") < col("n_risk"),
        log((col("n_risk") - col("d")) / col("n_risk").cast("double"))))
      .withColumn("zeroed",
        max(when(col("d") === col("n_risk"), 1L).otherwise(0L)).over(wCum))
      .withColumn("surv", when(col("zeroed") === 1, lit(0.0))
        .otherwise(round(exp(sum(col("term")).over(wCum)), 6)))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("d_events"),
        col("surv").as("survival"))
      .orderBy("t_days")
  }

  /** q_stl: additive seasonal decomposition of daily revenue —
    * trend (centered 7-day moving average), day-of-week seasonal
    * component (mean detrended value per dow), remainder; the
    * classical-decomposition core of STL, the "is Monday really down
    * or is the whole series down" separation q_seasonality's static
    * profile can't give. Determinism: the 7-day trend window sums
    * INTEGER cents; the detrended series is kept as the scaled integer
    * 7·x − trend7 so the per-dow seasonal mean is an exact integer sum
    * with one division — no double is ever summed (the Analytics
    * header rule); remainder arithmetic is per-row fixed-order.
    *
    * Scale shape: one collapse to the daily frame; the MA window and
    * the dow aggregate both run over calendar-bounded frames. Interior
    * days only (the 3-day edges have no centered window), matching the
    * oracle row-for-row. */
  def stlDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("x"))
    val w7 = Window.orderBy("day").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("n_win", count(lit(1)).over(w7))
      .withColumn("trend7", sum(col("x")).over(w7))
      .filter(col("n_win") === 7)
      .withColumn("det7", lit(7L) * col("x") - col("trend7"))
      .withColumn("dow", (dayofweek(col("day")) - 1).cast("long"))
    val seasonal = trended.groupBy("dow")
      .agg(sum(col("det7")).as("det7_sum"), count(lit(1)).as("n_dow"))
      .select(col("dow"),
        (col("det7_sum").cast("double")
          / (lit(7.0) * col("n_dow"))).as("seasonal_raw"))
    trended.join(broadcast(seasonal), "dow")
      .select(col("day"), col("x").as("cents"),
        round(col("trend7") / lit(7.0), 4).as("trend"),
        round(col("seasonal_raw"), 4).as("seasonal"),
        round(col("det7") / lit(7.0) - col("seasonal_raw"), 4).as("remainder"))
      .orderBy("day")
  }

  /** q_holt: Holt's linear (double-exponential) smoothing of each
    * type's daily revenue — q_ema plus an explicit trend state, the
    * next rung on the forecasting ladder (catches the drifting mean
    * EMA lags behind): l_t = α·x_t + (1−α)(l_{t−1}+b_{t−1}),
    * b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, α=0.3, β=0.1, initialized
    * l₁=x₁, b₁=0. Two coupled recurrences — inexpressible as a window
    * frame — run by q_ema's sorted-array left fold, so every float op
    * happens in one fixed order and the doubles are bit-identical to
    * the oracle's recursive CTE. The l_t expression is repeated
    * textually inside b_t (both here and in the oracle) so both
    * recurrences see the SAME rounded intermediate. */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("cents")))).as("s"))
      .select(col("event_type"), explode(expr(
        """aggregate(s,
          |  cast(array() as array<struct<day:string, l:double, b:double>>),
          |  (acc, x) -> array_append(acc, if(size(acc) = 0,
          |    named_struct('day', x.day, 'l', cast(x.cents as double), 'b', 0d),
          |    named_struct('day', x.day,
          |      'l', 0.3d * x.cents + 0.7d * (element_at(acc, size(acc)).l
          |             + element_at(acc, size(acc)).b),
          |      'b', 0.1d * ((0.3d * x.cents + 0.7d * (element_at(acc, size(acc)).l
          |             + element_at(acc, size(acc)).b))
          |             - element_at(acc, size(acc)).l)
          |           + 0.9d * element_at(acc, size(acc)).b))))
          |""".stripMargin)).as("e"))
      .select(col("event_type"), col("e.day").as("day"),
        round(col("e.l"), 6).as("holt_level"),
        round(col("e.b"), 6).as("holt_trend"),
        round(col("e.l") + col("e.b"), 6).as("forecast_next"))
      .orderBy("event_type", "day")
  }

  /** q_series_match: time-series subsequence similarity search — for
    * every 7-day window of the purchase revenue series, the best
    * z-normalized match among all 7-day windows of every OTHER event
    * type (the Matrix-Profile-style nearest-subsequence join behind
    * "which series has seen this shape before"). Z-normalized distance
    * is monotone in Pearson r (d² = 2n(1−r)), so the match score IS the
    * q_xcorr correlation, computed under its exact discipline: every
    * sum an integer (cents; products decimal-widened), ONE double
    * expression at the end. The ranking key rounds r to 1e-8 before the
    * (skey desc, type, day) order — the weightedSample grid argument: a
    * 1-ulp cross-engine wobble flips a rank only if the true value sits
    * within ~1e-16 of a grid boundary; ties themselves break on
    * (type, day) identically on both sides.
    *
    * Scale shape: windows are CALENDAR-bounded (one per day per type,
    * built by one type-partitioned frame window over the daily
    * aggregate), so the candidate×query pair frame is |calendar|² at
    * worst — a dimension product, never |fact|; the query side is
    * broadcast. Constant (zero-variance) windows are filtered on both
    * sides — r is undefined there (documented, the q_xcorr CASE). */
  def seriesMatch(spark: SparkSession, dir: String): DataFrame = {
    val wDay = Window.partitionBy("event_type").orderBy("day")
    val wFrame = wDay.rowsBetween(Window.currentRow, 6)
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
    val wins = daily
      .withColumn("arr", collect_list("cents").over(wFrame))
      .withColumn("s", sum("cents").over(wFrame).cast("decimal(38,0)"))
      .withColumn("ss",
        sum((col("cents").cast("decimal(38,0)") * col("cents"))).over(wFrame))
      .filter(size(col("arr")) === 7)
      .withColumn("v", lit(7) * col("ss") - col("s") * col("s"))
      .filter(col("v") > 0)
      .select(col("event_type"), col("day"), col("arr"), col("s"), col("v"))
    val q = wins.filter(col("event_type") === "purchase")
      .select(col("day").as("q_day"), col("arr").as("q_arr"),
        col("s").as("q_s"), col("v").as("q_v"))
    val c = wins.filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("m_type"), col("day").as("m_day"),
        col("arr").as("m_arr"), col("s").as("m_s"), col("v").as("m_v"))
    val sxy = aggregate(
      zip_with(col("q_arr"), col("m_arr"),
        (x, y) => (x.cast("decimal(19,0)") * y).cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)"), (acc, p) => acc + p)
    val r = (lit(7) * col("sxy") - col("q_s") * col("m_s")).cast("double") /
      (sqrt(col("q_v").cast("double")) * sqrt(col("m_v").cast("double")))
    val wBest = Window.partitionBy("q_day")
      .orderBy(col("skey").desc, col("m_type"), col("m_day"))
    c.crossJoin(broadcast(q))
      .withColumn("sxy", sxy)
      .withColumn("r", r)
      .withColumn("skey", round(col("r"), 8))
      .withColumn("rk", row_number().over(wBest))
      .filter(col("rk") === 1)
      .select(col("q_day"), col("m_type"), col("m_day"),
        round(col("r"), 6).as("best_r"))
      .orderBy("q_day")
  }
}
