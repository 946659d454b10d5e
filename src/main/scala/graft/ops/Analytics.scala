package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over the `events` stream table — the
  * funnel/cohort operators an analytics engine is expected to answer
  * (the reference forwarded arbitrary SQL of this shape to Oracle;
  * here they are first-class declarative plans).
  *
  * Scale posture: both operators are built from per-user conditional
  * MIN aggregations and equi-joins on `user_id` — every stage
  * hash-partitions on the same key, so at 100 TB the plan is a chain
  * of co-partitioned aggregations with no data explosion; no window
  * over the full event stream is ever required.
  */
object Analytics {

  /** Three-stage ordered funnel view → click → purchase: a user
    * reaches stage k only with a strictly-later event than stage k-1.
    * Output: per-stage user counts (stage 0 = never viewed). */
  def eventsFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, sfDir, "events")
    val users = e.select($"user_id").distinct()
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("tv"))
    val c = e.filter($"event_type" === "click")
      .join(v, "user_id").filter($"ts" > $"tv")
      .groupBy($"user_id").agg(min($"ts").as("tc"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, "user_id").filter($"ts" > $"tc")
      .groupBy($"user_id").agg(min($"ts").as("tp"))
    users
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select($"user_id",
        when($"tp".isNotNull, 3).when($"tc".isNotNull, 2)
          .when($"tv".isNotNull, 1).otherwise(0).as("stage"))
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
    "q_retention_cohort" -> retentionCohort
  )
}
