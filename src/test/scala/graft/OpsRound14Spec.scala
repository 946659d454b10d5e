package graft

import org.apache.spark.sql.functions._

/** Round-9-session keys: the MAXDF-capped shingle miner (the
  * stop-shingle mitigation the BENCH_sf1 measurement motivates).
  * The file-materialization key's resume/repair behavior lives in
  * SourcesSpec; the DuckDB oracle gate covers both keys' value-level
  * hashes. */
class OpsRound14Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_dedup_ngram_capped ----------------------------------------------

  test("capped miner: subset of uncapped pairs with identical exact jaccard") {
    val uncapped = ops.LlmOps.dedupNgramJaccard(spark, sfDir)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val capped = ops.LlmOps.dedupNgramCapped(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    assert(capped.nonEmpty)
    // candidate pruning can only DROP pairs, never add or distort:
    // every capped pair exists uncapped with the same exact jaccard
    capped.foreach { case (a, b, j) =>
      assert(uncapped.contains((a, b)), s"pair ($a,$b) not in uncapped")
      assert(uncapped((a, b)) === j, s"pair ($a,$b) jaccard drifted")
    }
    // and on this corpus the cap costs no recall at J >= 0.6 (real
    // near-dups share tail shingles; the head-only-overlap pair the
    // cap could miss sits far below threshold)
    assert(capped.length === uncapped.size,
      s"recall loss: ${uncapped.size - capped.length} of ${uncapped.size}")
  }

  test("capped miner drops head shingles from candidate generation") {
    // adversarial corpus: 40 "tail" docs where pairs (2k, 2k+1) are
    // true near-dups sharing replica-private tail shingles, plus 10
    // "head-only" docs whose ENTIRE shingle set is corpus-frequent
    // (df > the max(5, 0.001*N) cap). Uncapped mining pairs the
    // head-only docs all-to-all (the Σdf² blow-up in miniature); the
    // cap removes exactly those candidates and keeps every true
    // tail-sharing near-dup — the documented, deliberate tradeoff.
    val head = "x y z w"
    val tailDocs = (0L until 40L).map { i =>
      val tail = (0 until 11).map(j => s"t${i / 2}_$j").mkString(" ")
      (i, s"$head $tail")
    }
    val headOnly = (100L until 110L).map(i => (i, head))
    val docs = (tailDocs ++ headOnly).toDF("doc_id", "text")
    val uncapped = ops.LlmOps.dedupNgramJaccardOn(docs)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    val capped = ops.LlmOps.dedupNgramCappedOn(docs)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    val trueDups = (0L until 40L by 2).map(i => (i, i + 1)).toSet
    val headPairs = (for {
      a <- 100L until 110L; b <- (a + 1) until 110L
    } yield (a, b)).toSet
    assert(uncapped === trueDups ++ headPairs,
      "uncapped must pair the head-only docs all-to-all")
    assert(capped === trueDups,
      "cap must drop head-only pairs and keep every tail near-dup")
  }
}
