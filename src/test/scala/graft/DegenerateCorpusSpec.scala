package graft

import org.apache.spark.sql.functions._

/** Maximum-duplication sweep: every declared query must run against a
  * corpus where ALL documents are IDENTICAL — the worst case for every
  * dedup operator (every doc pairs with every other at similarity 1,
  * every shingle is corpus-universal, every LSH bucket holds the whole
  * corpus). Bounded at 200 docs so the all-pairs outputs stay ~20 k
  * rows; the point is that nothing crashes, over-merges into a driver
  * payload, or degenerates into an unplanned cross product. */
class DegenerateCorpusSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dupDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.names.foreach {
      case "documents" =>
        val text = (1 to 50).map(i => s"tok$i").mkString(" ")
        (0 until 200).map(i =>
            (i.toLong, text, "en", s"src${i % 20}", text.length.toLong))
          .toDF("doc_id", "text", "lang", "source", "n_chars")
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      case t =>
        spark.read.parquet(s"$sfDir/$t.parquet")
          .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name: survives an all-identical-documents corpus") {
      assert(fn(spark, dupDir).count() >= 0)
    }
  }

  test("dedup semantics on the degenerate corpus are the expected ones") {
    // exact dedup: ONE survivor holding all 200 copies
    val ex = graft.ops.LlmOps.dedupExact(spark, dupDir)
      .as[(Long, Long)].collect()
    assert(ex.toSeq === Seq((0L, 200L)))
    // near-dup pairs: the full C(200,2) at jaccard 1.0 — present, not
    // silently truncated
    val nd = graft.ops.LlmOps.dedupNgramJaccard(spark, dupDir)
    assert(nd.count() === 200L * 199 / 2)
    assert(nd.agg(min($"jaccard")).as[Double].collect()(0) === 1.0)
    // prefix-filtered formulation returns the same pair set
    assert(graft.ops.LlmOps.dedupJaccardPrefix(spark, dupDir).count()
      === 200L * 199 / 2)
  }
}
