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
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view (for `spark.sql` entry points). */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
