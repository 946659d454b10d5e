package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream table — the
  * funnel/cohort operators an analytics engine is expected to answer
  * (the reference forwarded arbitrary SQL of this shape to Oracle;
  * here they are first-class declarative plans).
  *
  * Scale posture: everything partitions on `user_id` — no window over
  * the full event stream is ever required. The funnel's fold holds
  * O(one user's events) per key (see its scaladoc for the hot-key
  * trade-off); retention is pure conditional aggregation.
  */
object Analytics {

  /** Three-stage ordered funnel view → click → purchase: a user
    * reaches stage k only with a strictly-later event than stage k-1.
    * Output: per-stage user counts (stage 0 = never viewed).
    *
    * ONE shuffle: per-user events are collected and time-sorted into an
    * array, and a single left-to-right fold runs the funnel state
    * machine — vs the textbook formulation (three conditional MIN aggs
    * + three joins) this replaces six user_id exchanges with one.
    * Equal-timestamp ties cannot flip the result: stage advances
    * require STRICTLY later timestamps, and stage 1 takes the earliest
    * view regardless of sort position among its ties.
    *
    * Trade-off, stated honestly: the fold's per-key state is O(that
    * user's events) — on corpora where a single bot/service user can
    * hold an unbounded share of the stream, pre-filter those keys or
    * fall back to the chained conditional-MIN formulation (the DuckDB
    * oracle twin of this query IS that formulation, proven equal),
    * whose per-key state is O(1) at the cost of the extra exchanges. */
  /** Per-user funnel stage from an events DF (user_id, ts, event_type)
    * — the fold core, exposed for the differential property test. */
  /** The greedy-earliest funnel fold, shared by the unbounded and the
    * conversion-window variants — ONE state-machine definition, the
    * window bound spliced in as an extra predicate so the two keys
    * cannot drift (the DuckDB twins are built the same way). */
  private def funnelFold(events: DataFrame,
      windowBound: String): DataFrame = {
    import events.sparkSession.implicits._
    // no type pre-filter: users whose events are ALL other types must
    // still appear as stage 0 (non-funnel types fall to the ELSE arm)
    events
      .groupBy($"user_id")
      .agg(collect_list(struct($"ts", $"event_type".as("tp"))).as("evs"))
      .select($"user_id", expr(
        s"""aggregate(
           |  array_sort(evs),
           |  named_struct('stage', 0, 't', cast(null as timestamp)),
           |  (acc, e) -> CASE
           |    WHEN acc.stage = 0 AND e.tp = 'view'
           |      THEN named_struct('stage', 1, 't', e.ts)
           |    WHEN acc.stage = 1 AND e.tp = 'click' AND e.ts > acc.t
           |         $windowBound
           |      THEN named_struct('stage', 2, 't', e.ts)
           |    WHEN acc.stage = 2 AND e.tp = 'purchase' AND e.ts > acc.t
           |         $windowBound
           |      THEN named_struct('stage', 3, 't', e.ts)
           |    ELSE acc END,
           |  acc -> acc.stage)""".stripMargin).as("stage"))
  }

  def funnelStages(events: DataFrame): DataFrame =
    funnelFold(events, windowBound = "")

  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    funnelStages(Tables(spark, sfDir, "events"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  /** CONVERSION-WINDOW funnel — the product-analytics semantics: each
    * stage must follow the previous within 1 hour, or the user stalls
    * at the reached stage. Same greedy-earliest-anchor state machine
    * as [[funnelStages]] (the anchor is the user's FIRST view; a later
    * view is never re-armed — which is also exactly what the
    * conditional-MIN oracle computes, so the two definitions agree by
    * construction), same ONE user_id exchange. */
  private[graft] def funnelStagesWindowed(events: DataFrame): DataFrame =
    funnelFold(events,
      windowBound = "AND e.ts <= acc.t + INTERVAL 1 HOUR")

  def eventsFunnelWindowed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    funnelStagesWindowed(Tables(spark, sfDir, "events"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  /** The HOT-KEY-SAFE funnel: same greedy-earliest state machine as
    * [[funnelStages]], but with O(1) state per user instead of
    * O(that user's events) — the fallback the fold's scaladoc promises
    * for corpora where one bot/service user holds an unbounded share
    * of the stream.
    *
    * Shape: secondary sort. ONE hash exchange on user_id, then a
    * per-partition EXTERNAL sort on (user_id, ts, event_type) —
    * Spark's sort spills to disk, so a billion-event user costs disk,
    * never heap — then a single forward scan runs the state machine
    * across each user's contiguous, time-ordered run. Event-time ties
    * order by event_type exactly like the fold's array_sort on
    * struct(ts, tp), so the two formulations agree bit-for-bit
    * (differential property test + shared oracle). */
  private[graft] def funnelStagesBounded(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select($"user_id".cast("long"), unix_micros($"ts").as("tus"),
        $"event_type")
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"tus", $"event_type")
      .as[(Long, Long, String)]
      .mapPartitions { it =>
        val in = it.buffered
        new Iterator[(Long, Int)] {
          def hasNext: Boolean = in.hasNext
          def next(): (Long, Int) = {
            val user = in.head._1
            var stage = 0
            var t = 0L
            while (in.hasNext && in.head._1 == user) {
              val (_, ts, tp) = in.next()
              if (stage == 0 && tp == "view") { stage = 1; t = ts }
              else if (stage == 1 && tp == "click" && ts > t) {
                stage = 2; t = ts
              } else if (stage == 2 && tp == "purchase" && ts > t) {
                stage = 3; t = ts
              }
            }
            (user, stage)
          }
        }
      }
      .toDF("user_id", "stage")
  }

  def eventsFunnelBounded(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    funnelStagesBounded(Tables(spark, sfDir, "events"))
      .groupBy($"stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"stage")
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; n_active = distinct users of that cohort active
    * `week_offset` weeks later. */
  def retentionCohort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val first = e.groupBy($"user_id")
      .agg(date_trunc("week", min($"ts")).as("cohort_week"))
    e.join(first, "user_id")
      .select($"user_id", $"cohort_week",
        (datediff(date_trunc("week", $"ts"), $"cohort_week") / 7)
          .cast("int").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("n_active"))
      .orderBy($"cohort_week", $"week_offset")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_events_funnel" -> eventsFunnel,
    "q_events_funnel_bounded" -> eventsFunnelBounded,
    "q_events_funnel_windowed" -> eventsFunnelWindowed,
    "q_retention_cohort" -> retentionCohort
  )
}
