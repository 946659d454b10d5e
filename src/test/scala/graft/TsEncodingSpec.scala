package graft

import org.apache.spark.sql.functions._

/** The round-6 driver-gate regression, pinned: `events.ts` has shipped
  * in different parquet physical layouts across testdata generations
  * (36 keys failed the round-5 driver bench on the change). Tables
  * normalizes BY OBSERVED TYPE; this suite lands the same events slice
  * in all three encodings and asserts the loader returns identical
  * micros-precision instants for each.
  */
class TsEncodingSpec extends SparkSpec {
  import spark.implicits._

  test("Tables.load normalizes native / NTZ / nanos-long events.ts") {
    val base = Tables(spark, sfDir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .limit(500)
    val want = base.select($"event_id", unix_micros($"ts"))
      .as[(Long, Long)].collect().sorted.toSeq

    def land(suffix: String)(df: org.apache.spark.sql.DataFrame): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_tsenc_$suffix").toString
      df.write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    // (a) native session-zoned micros timestamp
    val nativeDir = land("native")(base)
    // (b) TIMESTAMP_NTZ (parquet micros, isAdjustedToUTC=false)
    val ntzDir = land("ntz")(
      base.withColumn("ts",
        $"ts".cast(org.apache.spark.sql.types.TimestampNTZType)))
    // (c) the nanos-epoch LONG shape the legacy flag surfaces for
    // parquet TIMESTAMP(NANOS)
    val nanosDir = land("nanos")(
      base.withColumn("ts", expr("unix_micros(ts) * 1000L")))

    Seq("native" -> nativeDir, "ntz" -> ntzDir, "nanos" -> nanosDir)
      .foreach { case (label, dir) =>
        val got = Tables(spark, dir, "events")
        assert(got.schema("ts").dataType ===
          org.apache.spark.sql.types.TimestampType, label)
        val rows = got.select($"event_id", unix_micros($"ts"))
          .as[(Long, Long)].collect().sorted.toSeq
        assert(rows === want, s"$label encoding diverged")
      }
  }
}
