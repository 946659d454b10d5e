package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: run EVERY query once at the smallest SF so JIT +
    // first-codegen + first-broadcast cost never lands inside a
    // measured rep (each query is only measured once)
    try {
      val w = "/root/testdata/sf0.001"
      SparkEntry.queries.foreach { case (_, fn) =>
        try { fn(spark, w).count() } catch { case _: Throwable => () }
      }
      System.gc()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      // a failed query reports -1, NOT its time-to-failure — otherwise
      // failures are indistinguishable from fast successes
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // untimed: drop dead localCheckpoint blocks + broadcast refs so a
      // heavy query's garbage isn't paid for by whoever runs next
      System.gc()
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
