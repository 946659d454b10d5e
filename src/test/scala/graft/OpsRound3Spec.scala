package graft

import org.apache.spark.sql.functions._

/** Round-3 additions: sequence packing differential + the fused
  * fixpoint-probe helper. */
class OpsRound3Spec extends SparkSpec {
  import spark.implicits._

  test("q_pack_chunks matches an in-driver concat-and-chunk replay") {
    val budget = 256
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source", size(split($"text", " ")).as("n"))
      .as[(Long, String, Int)].collect()
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val start = cum
        cum += n
        ((src, start / budget), (id, n))
      }
    }.groupBy(_._1).map { case ((src, chunk), rows) =>
      (src, chunk, rows.size.toLong, rows.map(_._2._2.toLong).sum,
        rows.map(_._2._1).min, rows.map(_._2._1).max)
    }.toSet
    val got = graft.ops.LlmOps.packChunks(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("chunk ids are dense per source (no empty context windows)") {
    val chunks = graft.ops.LlmOps.packChunks(spark, sfDir)
      .groupBy($"source")
      .agg(min($"chunk").as("lo"), max($"chunk").as("hi"),
        countDistinct($"chunk").as("n"))
      .as[(String, Long, Long, Long)].collect()
    chunks.foreach { case (src, lo, hi, n) =>
      assert(lo === 0L, s"$src first chunk")
      // concat-and-chunk leaves no gap: every 256-token window that
      // starts inside the concatenated stream contains ≥1 doc start
      // only when docs are shorter than the budget; long docs may skip
      // ids, so assert coverage is monotone-bounded, not exact
      assert(n <= hi + 1, src)
    }
  }

  test("truncateCountTrue counts flagged rows inside the checkpoint job and drops the flag") {
    val df = spark.range(10).toDF("id").withColumn("f", $"id" % 3 === 0)
    val (cp, n) = Tables.truncateCountTrue(df, "f")
    assert(n === 4) // ids 0, 3, 6, 9 (single local job — no retries)
    assert(cp.columns.toSeq === Seq("id"))
    assert(cp.count() === 10)
    // null flags do not count
    val dfn = spark.range(4).toDF("id")
      .withColumn("f", when($"id" === 0, lit(true)))
    val (_, m) = Tables.truncateCountTrue(dfn, "f")
    assert(m === 1)
  }
}
