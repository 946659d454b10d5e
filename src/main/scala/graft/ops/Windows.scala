package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** SURVEY.md §2.5 — window functions.
  *
  * Scale posture: every window partitions by a real key (custkey,
  * user_id, suppkey) — one shuffle by that key, then per-partition
  * sorted evaluation. No global (unpartitioned) windows anywhere: a
  * `Window.orderBy` without partitionBy funnels the planet through one
  * task and is banned in this codebase.
  *
  * Determinism: window ORDER BY always ends in a unique key so frame
  * contents are identical across engines; frames are written explicitly
  * (ROWS …) rather than relying on default RANGE frames.
  */
object Windows {

  /** rank / dense_rank / row_number per customer by price. */
  def winRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"))
      .orderBy($"o_custkey", $"rn")
  }

  /** lag / lead / first / last over per-user event time. */
  def winLagLead(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"value",
        lag($"ts", 1).over(w).as("prev_ts"),
        lead($"value", 1).over(w).as("next_value"),
        first($"value").over(wAll).as("first_value"),
        last($"value").over(wAll).as("running_last"))
      .orderBy($"user_id", $"ts", $"event_id")
  }

  /** Running total + 3-row moving average (explicit ROWS frames).
    * Sums go through decimal: sliding-window engines may combine
    * partials in different orders (segment trees vs linear). */
  def winFrameRows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val mov = w.rowsBetween(-2, Window.currentRow)
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        sum(Det.dec($"o_totalprice")).over(run).cast(DoubleType)
          .as("running_total"),
        (sum(Det.dec($"o_totalprice")).over(mov).cast(DoubleType)
          / count(lit(1)).over(mov)).as("moving_avg"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** RANGE frame on a numeric order key: peers within 10k price below. */
  def winFrameRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_totalprice")
      .rangeBetween(-10000, Window.currentRow)
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        count(lit(1)).over(w).as("n_near"),
        sum(Det.dec($"o_totalprice")).over(w).cast(DoubleType).as("sum_near"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Per-group top-k pattern: top-3 parts by revenue per supplier.
    * Revenue stays decimal through the rank so ordering is exact. */
  def winTopkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // one shuffle, reused across stages: HashPartitioning(suppkey)
    // satisfies both the (suppkey, partkey) aggregation's clustered
    // distribution (subset rule) and the window's partitionBy — without
    // the repartition Catalyst would exchange twice.
    val rev = Tables(spark, sfDir, "lineitem")
      .repartition($"l_suppkey")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .as("rev_dec"))
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"rev_dec".desc, $"l_partkey".asc)
    rev.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select($"l_suppkey", $"l_partkey", $"rev_dec".cast(DoubleType)
        .as("revenue"), $"rk")
      .orderBy($"l_suppkey", $"rk")
  }

  /** Per-group top-k via the native bounded-heap aggregate
    * (graft.functions.TopKAgg) — same result as [[winTopkPerGroup]]'s
    * window formulation, different physical shape. The window sorts
    * every group's FULL row set after the shuffle (O(n log n) rows
    * through the exchange); the aggregate keeps a k-element heap per
    * group, combines map-side, and moves only k (score,id) pairs per
    * group across the wire. At 100 TB with hot groups that is the
    * difference between shuffling the corpus and shuffling k·|groups|
    * pairs. Revenue is cast to double BEFORE the heap so the aggregate
    * orders on exactly the value the oracle orders on. */
  def winTopkAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.functions.TopKAgg.register(spark)
    val rev = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_suppkey", $"l_partkey")
      .agg(sum(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
        .cast(DoubleType).as("revenue"))
    rev.groupBy($"l_suppkey")
      .agg(call_function("topk_agg", $"revenue", $"l_partkey", lit(3))
        .as("top"))
      .select($"l_suppkey", posexplode($"top"))
      .select($"l_suppkey", $"col.id".as("l_partkey"),
        $"col.score".as("revenue"), ($"pos" + 1).as("rk"))
      .orderBy($"l_suppkey", $"rk")
  }

  /** ntile / percent_rank / cume_dist. */
  def winDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"c_acctbal", $"c_custkey")
    Tables(spark, sfDir, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal",
        ntile(4).over(w).as("quartile"),
        Det.r4(percent_rank().over(w)).as("pct_rank"),
        Det.r4(cume_dist().over(w)).as("cume"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }

  /** ROLLING MEDIAN + exact rolling sum over each user's last five
    * events — the smoothing/outlier-robust statistics a metrics or
    * anomaly pipeline computes over sliding frames. The median is an
    * exact percentile over a ≤5-row frame (r4-rounded: interpolation
    * is the one legitimately order-dependent double op); the rolling
    * sum goes through the decimal pipeline so windowed tree-vs-
    * sequential accumulation order cannot change the surfaced double.
    * Per-user partitioning, unique (tus, event_id) ordering, explicit
    * ROWS frame — the standing window rules. */
  def winMedianRolling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
      .rowsBetween(-4, Window.currentRow)
    Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"),
        $"value")
      .withColumn("med_5", Det.r4(expr("percentile(value, 0.5)").over(w)))
      .withColumn("sum_5",
        sum(Det.dec($"value")).over(w).cast(DoubleType))
      .filter($"user_id" % 7 === 0)
      .select($"user_id", $"event_id", $"med_5", $"sum_5")
      .orderBy($"user_id", $"event_id")
  }

  /** SHARE-OF-TOTAL + running concentration per nation — each
    * nation's revenue share of its REGION and the running cumulative
    * share down the region's revenue ranking (the "how many nations
    * until 80%?" curve).
    *
    * The windows here run over the NATION CENSUS (≤25 rows — the
    * aggregate of the fact join), never over the fact table: the
    * "global window" ban in this file's scaladoc is about corpora;
    * a domain-bounded census is metadata scale, the same exemption
    * [[graft.ops.Quality.statsChi2]]'s margin grid uses.
    *
    * Determinism: revenue is an exact decimal sum; shares divide two
    * exact-sum doubles (identical IEEE); the running share sums ≤25
    * exact decimal values inside the window — exact, order pinned by
    * (revenue DESC, nation) with the unique nation tiebreak. */
  def winShareOfTotal(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(sum(Det.dec($"o_totalprice")).as("rev_dec"))
    val named = rev
      .join(broadcast(Tables(spark, sfDir, "nation")),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_regionkey".as("regionkey"), $"n_name".as("nation"),
        $"rev_dec")
    val wAll = Window.partitionBy($"regionkey")
    val wRun = Window.partitionBy($"regionkey")
      .orderBy($"rev_dec".desc, $"nation")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    named
      .withColumn("region_total", sum($"rev_dec").over(wAll))
      .withColumn("running", sum($"rev_dec").over(wRun))
      .select($"regionkey", $"nation",
        $"rev_dec".cast(DoubleType).as("revenue"),
        ($"rev_dec".cast(DoubleType)
          / $"region_total".cast(DoubleType)).as("share"),
        ($"running".cast(DoubleType)
          / $"region_total".cast(DoubleType)).as("running_share"))
      .orderBy($"regionkey", $"revenue".desc, $"nation")
  }

  /** ROLLING 7-DAY CORRELATION between daily revenue and daily order
    * count — the co-movement monitor ("is revenue tracking volume, or
    * is price mix drifting?"). Exact to the bit WITHOUT r4: the five
    * window sums (Σx, Σy, Σxy, Σx², Σy²) are int64 over integer
    * daily dollars (cents DIV 100 — floor division, identical in
    * both engines) and counts, so n·Σxy − ΣxΣy and the variance
    * factors are exact integers; only the final
    * num / √(dx·dy) touches floats (casts + one sqrt + one division
    * of identical operands). Zero-variance windows yield NULL.
    *
    * Scale posture: windows run over the DAY CENSUS (calendar-
    * domain-bounded — the metadata-scale exemption this file's
    * scaladoc carves out for [[winShareOfTotal]]); the corpus is
    * reduced by one partial-agged pass before any window. */
  def winRollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as long)) DIV 100")
        .as("x"),
        count(lit(1)).as("y"))
    val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum($"x").over(w))
      .withColumn("sy", sum($"y").over(w))
      .withColumn("sxy", sum($"x" * $"y").over(w))
      .withColumn("sxx", sum($"x" * $"x").over(w))
      .withColumn("syy", sum($"y" * $"y").over(w))
      .filter($"n" === 7)
      .withColumn("dx", $"n" * $"sxx" - $"sx" * $"sx")
      .withColumn("dy", $"n" * $"syy" - $"sy" * $"sy")
      .select($"day", $"x".as("revenue_usd"), $"y".as("n_orders"),
        when($"dx" > 0 && $"dy" > 0,
          ($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType)
            / sqrt($"dx".cast(DoubleType) * $"dy".cast(DoubleType)))
          .as("corr7"))
      .orderBy($"day")
  }

  /** TIME-RANGE window frame — trailing 7 CALENDAR DAYS per user
    * (RANGE frame on the integer day index, not a row count): per
    * event, how many events and how many purchases the user produced
    * in the preceding week. The rows-vs-range distinction that
    * matters on event streams: a burst of same-day events must all
    * see the same trailing window.
    *
    * Determinism: the RANGE frame is defined by the day VALUE, so
    * same-day tie order inside a user cannot change any frame —
    * results are layout-invariant with no tiebreak column needed in
    * the ORDER BY; all aggregates are integer counts.
    *
    * Scale posture: one shuffle on user_id; frame evaluation is the
    * standard per-partition sliding aggregation. */
  def winFrameRangeTime(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id")
      .orderBy(datediff(to_date($"ts"), lit("1970-01-01").cast("date")))
      .rangeBetween(-6, Window.currentRow)
    Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type",
        count(lit(1)).over(w).as("n_7d"),
        count(when($"event_type" === "purchase", 1)).over(w)
          .as("n_purchases_7d"))
      .orderBy($"event_id")
  }

  /** VALUE window functions with IGNORE NULLS — first/last/nth over
    * each user's event stream, where the "value" only exists on
    * purchase events (NULL elsewhere): `last(…, ignoreNulls)` over a
    * running frame is the LAST-KNOWN-VALUE carry-forward (the
    * observe-then-propagate pattern gap-fill, SCD reads, and ticker
    * joins all reduce to); first/nth over the full frame are the
    * per-user "entry price" / "second observation" reads.
    *
    * Determinism: per-user partitioning with unique (tus, event_id)
    * ordering totalizes every frame; NULL handling is pinned by the
    * census columns (n_events vs n_priced).
    *
    * Scale posture: both windows share ONE user_id partitioning —
    * Catalyst plans a single exchange + sort and evaluates all four
    * functions in one Window operator (no per-function shuffles). */
  def winValueFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val full = ord.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"),
        when($"event_type" === "purchase", $"value").as("pval"))
      .select($"user_id", $"event_id",
        last($"pval", ignoreNulls = true).over(run).as("last_price"),
        first($"pval", ignoreNulls = true).over(full).as("entry_price"),
        nth_value($"pval", 2, ignoreNulls = true).over(full)
          .as("second_price"),
        count($"pval").over(full).as("n_priced"),
        count(lit(1)).over(full).as("n_events"))
      .orderBy($"user_id", $"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_win_value_funcs" -> winValueFuncs,
    "q_win_frame_range_time" -> winFrameRangeTime,
    "q_win_rolling_corr" -> winRollingCorr,
    "q_win_share_of_total" -> winShareOfTotal,
    "q_win_rank" -> winRank,
    "q_win_median_rolling" -> winMedianRolling,
    "q_win_lag_lead" -> winLagLead,
    "q_win_frame_rows" -> winFrameRows,
    "q_win_frame_range" -> winFrameRange,
    "q_win_topk_per_group" -> winTopkPerGroup,
    "q_win_topk_agg" -> winTopkAgg,
    "q_win_distribution" -> winDistribution
  )
}
