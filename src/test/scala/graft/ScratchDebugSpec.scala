package graft

import org.apache.spark.sql.functions._

class ScratchDebugSpec extends SparkSpec {
  import spark.implicits._

  private def census(dir: String) = {
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
    iv.select($"s_us".as("tus"), lit(1L).as("st"), lit(0L).as("en"))
      .unionAll(iv.select($"e_us".as("tus"), lit(0L).as("st"),
        lit(1L).as("en")))
      .groupBy($"tus").agg(sum($"st").as("s"), sum($"en").as("e"))
      .withColumn("net", $"s" - $"e")
  }

  test("scratch: cumsum vs retired on the concurrency census sf0.01") {
    val dir = "/root/testdata/sf0.01"
    val got = ops.TwoPass.cumsum(census(dir), "tus", Seq("net"))
      .select($"tus", $"cum_net").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val ref = ops.TwoPass.cumsumFoldRetired(census(dir), "tus", Seq("net"))
      .select($"tus", $"cum_net").as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val diffs = got.zip(ref).filter { case (a, b) => a != b }
    if (diffs.nonEmpty) {
      println(s"n=${got.size} nDiff=${diffs.size} first=${diffs.take(5)}")
      val df = ops.TwoPass.cumsum(census(dir), "tus", Seq("net"))
      df.collect()
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    assert(diffs.isEmpty)
  }
}
