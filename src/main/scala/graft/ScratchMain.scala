package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary round-14 debug harness — deleted before commit
object ScratchMain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.debug.maxToStringFields", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    HarnessLog.quiet()
    import spark.implicits._
    (1 to 3).foreach { i =>
      val df = ops.Analytics.intervalsConcurrency(spark, dir)
      df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/scratch_iv_$i")
      val back = spark.read.parquet(s"/tmp/scratch_iv_$i")
        .selectExpr("cast(day as string)", "peak_concurrency")
        .as[(String, Long)].collect().toSeq.sorted
      println(s"== write run $i: ${back.slice(13, 17)}")
    }
    val df2 = ops.Analytics.intervalsConcurrency(spark, dir)
    df2.coalesce(1).write.mode("overwrite").parquet("/tmp/scratch_iv_plan")
    println(df2.queryExecution.executedPlan.toString)
    // the census + both cumsum variants
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800000000L
    val w = Window.partitionBy($"user_id").orderBy($"tus", $"event_id")
    val marked = Tables(spark, dir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("tus"))
      .withColumn("new_session",
        when(lag($"tus", 1).over(w).isNull ||
          $"tus" - lag($"tus", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("sid", sum($"new_session").over(w))
    val iv = marked.groupBy($"user_id", $"sid")
      .agg(min($"tus").as("s_us"), max($"tus").as("e_us"))
    val census = iv.select($"s_us".as("tus"), lit(1L).as("st"), lit(0L).as("en"))
      .unionAll(iv.select($"e_us".as("tus"), lit(0L).as("st"), lit(1L).as("en")))
      .groupBy($"tus").agg(sum($"st").as("s"), sum($"en").as("e"))
      .withColumn("net", $"s" - $"e")
    val got = ops.TwoPass.cumsum(census, "tus", Seq("net"))
      .select($"tus", $"cum_net").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val ref = ops.TwoPass.cumsumFoldRetired(census, "tus", Seq("net"))
      .select($"tus", $"cum_net").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val diffs = got.zip(ref).filter { case (a, b) => a != b }
    println(s"== cumsum diff: n=${got.size} nDiff=${diffs.size} first=${diffs.take(5)}")
    spark.stop()
  }
}
