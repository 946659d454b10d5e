package graft

/** Degenerate-input sweep: every declared query must run (build AND
  * execute) against a schema-identical corpus with ZERO rows in every
  * table. A library user points the engine at an empty partition or a
  * fully-filtered source on day one; construction-time driver actions
  * (IVF centroid training, BPE argmax, edit-band derivation, sketch
  * probes) are where naive `.head()`/`.collect()(0)` calls crash. */
class EmptyCorpusSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    // raw read (events.ts stays a nanos long — the shape Tables.load
    // expects to find on disk), NOT through Tables' transformed view
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: survives an all-empty corpus") {
      val rows = fn(spark, emptyDir).count()
      assert(rows >= 0)
    }
  }
}
