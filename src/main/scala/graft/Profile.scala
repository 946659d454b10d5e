package graft

import org.apache.spark.sql.SparkSession

/** Per-query plan/timing inspector (not part of the driver contract).
  *
  * Usage: runMain graft.Profile <sfDir> <queryKey> [reps]
  * Prints the formatted physical plan once, then wall-clock per rep of
  * `fn(spark, sfDir).count()` — the same protocol Bench uses, so a
  * number here is directly comparable to a BENCH_r{N}.json entry.
  */
object Profile {
  /** Exploratory sub-plans for isolating stage costs; not part of the
    * driver contract. */
  private val adhoc: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = {
    import org.apache.spark.sql.functions._
    Map(
      "x_shingles" -> ((s, dir) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .repartition(32)
          .select($"doc_id", split($"text", " ").as("toks"))
          .select($"doc_id", explode(expr(
            """array_distinct(CASE WHEN size(toks) >= 3
              |  THEN transform(sequence(1, size(toks) - 2),
              |       i -> array_join(slice(toks, i, 3), ' '))
              |  ELSE array() END""".stripMargin + ")")).as("shingle"))
      }),
      "x_cand" -> ((s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sh = adhoc("x_shingles")(s, dir).localCheckpoint()
        val freq = sh.groupBy($"shingle").agg(count(lit(1)).as("f"))
        val wDoc = Window.partitionBy($"doc_id")
        val prefix = sh.join(freq, "shingle")
          .withColumn("rn", row_number().over(wDoc.orderBy($"f", $"shingle")))
          .withColumn("n_sh", count(lit(1)).over(wDoc))
          .filter($"rn" <= $"n_sh" - ceil($"n_sh" * 0.6) + 1)
          .select($"doc_id", $"shingle")
        prefix.select($"doc_id".as("doc_a"), $"shingle")
          .join(prefix.select($"doc_id".as("doc_b"), $"shingle"), "shingle")
          .filter($"doc_a" < $"doc_b")
          .select($"doc_a", $"doc_b").distinct()
      }),
      "x_prefix" -> ((s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val sh = adhoc("x_shingles")(s, dir).localCheckpoint()
        val freq = sh.groupBy($"shingle").agg(count(lit(1)).as("f"))
        val wDoc = Window.partitionBy($"doc_id")
        sh.join(freq, "shingle")
          .withColumn("rn", row_number().over(wDoc.orderBy($"f", $"shingle")))
          .withColumn("n_sh", count(lit(1)).over(wDoc))
          .filter($"rn" <= $"n_sh" - ceil($"n_sh" * 0.6) + 1)
          .select($"doc_id", $"shingle")
      }),
      "x_shingle_join" -> ((s, dir) => {
        import s.implicits._
        val sh = adhoc("x_shingles")(s, dir)
        sh.select($"doc_id".as("doc_a"), $"shingle")
          .join(sh.select($"doc_id".as("doc_b"), $"shingle"), "shingle")
          .filter($"doc_a" < $"doc_b")
          .groupBy($"doc_a", $"doc_b").agg(count(lit(1)).as("common"))
      })
    )
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val key = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val fn = adhoc.getOrElse(key, SparkEntry.queries(key))
      fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"rep $i: $sec%.3f s ($n rows)")
      }
    } finally spark.stop()
  }
}
