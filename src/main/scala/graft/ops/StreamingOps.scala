package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.11 — batch/stream-unified event-time queries.
  *
  * Each transform takes the events DataFrame as input so the SAME code
  * runs in batch (declared `queries` entries, DuckDB-matched) and under
  * `readStream` (exercised in the streaming test suite with watermarks).
  * This is the Structured Streaming model: one declarative plan, two
  * execution modes. The reference's closest analogue is the chunked
  * `fetchmany` cursor loop in `quickWrite` [pub: desdb/desdb.py].
  *
  * Scale posture: all aggregations key on (window × type) or user_id —
  * state is bounded by key cardinality × open windows; watermarks (in
  * the streaming tests) bound it in time as well.
  */
object StreamingOps {

  /** 1-hour tumbling windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("sum_value"))

  /** 1-hour windows sliding every 15 minutes (4 windows per event). */
  def sliding(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("sum_value"))

  /** Per-user session windows, 30-minute inactivity gap. Session end =
    * last event + gap (Spark semantics; the oracle's gaps-and-islands
    * formulation replicates the half-open boundary: a new session
    * starts when the gap is ≥ 30 min, never >). */
  def session(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))

  /** Exact dedup keeping the first event by (ts, event_id) per
    * (user_id, event_type). Batch form uses row_number (deterministic
    * under ties); the streaming form is dropDuplicates with watermark,
    * exercised in the test suite. */
  def dedupFirst(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
  }

  /** Interval-bounded self-join: per purchase, clicks by the same user
    * in the preceding hour. This is the batch twin of a stream-stream
    * join — under `readStream` the same plan needs watermarks on both
    * sides and the time bound caps join state (exercised in
    * StreamingSpec); in batch it is an equi-join on user_id with a
    * range predicate, which AQE plans as a regular hash join. */
  def clicksBeforePurchase(events: DataFrame): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), col("ts").as("pts"))
    val c = events.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    p.join(c, col("pu") === col("cu")
        && col("cts") <= col("pts")
        && col("cts") > col("pts") - expr("INTERVAL 1 HOUR"), "left")
      .groupBy(col("event_id"), col("pu"), col("pts"))
      .agg(count(col("cts")).as("n_clicks_1h"))
      .select(col("event_id"), col("pu").as("user_id"),
        col("pts").as("ts"), col("n_clicks_1h"))
  }

  /** Streaming source for events-shaped directories (schema pinned from
    * the directory's existing files — streaming sources require an
    * explicit schema), so every transform above runs unchanged under
    * `readStream`. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir)

  // ---- declared batch-query forms ---------------------------------------

  def streamTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    tumbling(Tables(spark, sfDir, "events"))
      .orderBy($"window_start", $"event_type")
  }

  def streamSliding(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sliding(Tables(spark, sfDir, "events"))
      .orderBy($"window_start", $"event_type")
  }

  def streamSession(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    session(Tables(spark, sfDir, "events"))
      .orderBy($"user_id", $"session_start")
  }

  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    dedupFirst(Tables(spark, sfDir, "events"))
      .orderBy($"user_id", $"event_type")
  }

  def streamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    clicksBeforePurchase(Tables(spark, sfDir, "events"))
      .orderBy($"event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumbling" -> streamTumbling,
    "q_stream_sliding" -> streamSliding,
    "q_stream_session" -> streamSession,
    "q_stream_dedup" -> streamDedup,
    "q_stream_join" -> streamJoin
  )
}
