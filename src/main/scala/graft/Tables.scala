package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access for the driver-generated parquet corpus
  * (`/root/testdata/sf*`; see TESTDATA.md / FIXTURES.md).
  *
  * Scale posture: these are plain parquet scans — no `.cache()`, no
  * driver-side materialization — so every query plan starts from a
  * `FileSourceScanExec` that Catalyst can prune columns from and push
  * filters into. On a real cluster the same code reads a partitioned
  * table of any size; nothing here assumes the data fits anywhere.
  */
object Tables {

  /** Lineage truncation for iterative/reused intermediates.
    * `localCheckpoint` (memory-backed, fast) by default; set
    * `spark.graft.checkpointDir` to a durable path on a real cluster
    * and these become fault-tolerant `checkpoint()`s instead. */
  def truncate(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption("spark.graft.checkpointDir") match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint()
      case None => df.localCheckpoint()
    }
  }
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Plan-object cache: DataFrames are immutable lazy plans, so reusing
  // one skips the parquet footer read/schema inference that
  // spark.read.parquet pays per call (72 queries × 10 tables adds up in
  // the bench loop). Keyed by session so a stopped session's plans are
  // never resurrected.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, sfDir, name), load(spark, sfDir, name))

  private def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
      // read natively. Read it as raw nanos and truncate to micros with
      // integer division (`div`, not `/` — ns epoch values exceed 2^53,
      // double division would lose precision). Truncation matches
      // DuckDB's `cast(ts_ns as timestamp)` semantics exactly.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for `spark.sql` entry points). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
