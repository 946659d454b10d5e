package graft

import org.apache.spark.sql.functions._

/** Round-8 additions: retrieval evaluation (NDCG@10, ANN recall@10,
  * MMR rerank), robust dispersion (median/MAD), 2-D skyline, and the
  * frequency-based boilerplate screen — each pinned against an
  * independent in-driver replay of its definition (the oracle gate
  * covers the SQL-expressible ones; the replays pin the SEMANTICS so a
  * refactor can't silently change the definition while still matching
  * a co-evolved oracle). */
class OpsRound8Spec extends SparkSpec {
  import spark.implicits._

  private def vecs(): Map[Long, (Array[Float], Int)] =
    Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()
      .map { case (id, e, l) => id -> ((e, l)) }.toMap

  // Same rounding as the engine's Det.r4 (Spark round = BigDecimal
  // HALF_UP over the double's shortest decimal representation)
  private def r4d(s: Double): Double = java.math.BigDecimal.valueOf(s)
    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    r4d(s)
  }

  // ---- q_sim_rerank_mmr --------------------------------------------------

  test("q_sim_rerank_mmr matches an independent greedy replay") {
    val got = ops.Eval.simRerankMmr(spark, sfDir)
      .as[(Int, Long, Double, Double, Double)].collect().sortBy(_._1)
    val v = vecs()
    val qe = v(0L)._1
    val pool = v.toSeq.filter(_._1 != 0L)
      .map { case (id, (e, _)) => (id, e, cos(e, qe)) }
      .sortBy { case (id, _, rel) => (-rel, id) }
      .take(20)
    var chosen = Vector.empty[(Long, Array[Float])]
    val expect = (1 to 5).map { step =>
      val (id, e, rel, pen, score) = pool
        .filterNot { case (id, _, _) => chosen.exists(_._1 == id) }
        .map { case (id, e, rel) =>
          val pen =
            if (chosen.isEmpty) 0.0 else chosen.map(c => cos(e, c._2)).max
          val score = r4d(0.7 * rel - 0.3 * pen)
          (id, e, rel, pen, score)
        }
        .minBy { case (id, _, _, _, score) => (-score, id) }
      chosen :+= ((id, e))
      (step, id, rel, pen, score)
    }
    assert(got.toSeq === expect)
    assert(got.length === 5)
  }

  // ---- q_eval_ndcg -------------------------------------------------------

  test("q_eval_ndcg matches an in-driver metric replay") {
    val got = ops.Eval.evalNdcg(spark, sfDir)
      .select($"qid", $"ndcg").as[(Long, Option[Double])].collect().toMap
    val v = vecs()
    val w = Array(1.000000, 0.630930, 0.500000, 0.430677, 0.386853,
      0.356207, 0.333333, 0.315465, 0.301030, 0.289065)
    val qids = v.keys.filter(_ % 50 == 0).toSeq.sorted
    assert(got.keySet === qids.toSet)
    qids.foreach { qid =>
      val (qe, ql) = v(qid)
      def rel(l: Int) = if (l == ql) 2 else if (l % 5 == ql % 5) 1 else 0
      val corpus = v.toSeq.filter(_._1 != qid)
      val top = corpus
        .map { case (id, (e, l)) => (id, l, cos(e, qe)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(10)
      val rels = top.map { case (_, l, _) => rel(l) }
      // ideal top-10 over the WHOLE judged corpus, not the retrieved 10
      val idealRels = corpus.map { case (id, (_, l)) => (rel(l), id) }
        .sortBy { case (r, id) => (-r, id) }.take(10).map(_._1)
      def gain(r: Int) = if (r == 2) 3.0 else if (r == 1) 1.0 else 0.0
      val dcg = rels.zipWithIndex.map { case (r, i) => gain(r) * w(i) }.sum
      val idcg = idealRels.zipWithIndex
        .map { case (r, i) => gain(r) * w(i) }.sum
      val expect = if (idcg > 0) Some(dcg / idcg) else None
      (got(qid), expect) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9,
          s"qid=$qid got=$g expect=$e")
        case (g, e) => assert(g.isEmpty === e.isEmpty)
      }
    }
  }

  // ---- q_eval_recall_ann -------------------------------------------------

  test("q_eval_recall_ann: recall is hits over 10 and within [0,1]") {
    val rows = ops.Eval.evalRecallAnn(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nExact, nHit, recall) =>
      assert(nExact === 10L)
      assert(nHit >= 0L && nHit <= 10L)
      assert(recall === nHit.toDouble / nExact)
    }
    // the sign-hash index must be better than random for SOME query:
    // identical leading-sign vectors cluster, so at least one query
    // recovers at least one exact neighbor through its cell
    assert(rows.map(_._3).sum > 0, "ANN recall identically zero")
  }

  // ---- q_agg_mad ---------------------------------------------------------

  test("q_agg_mad matches an exact in-driver median/MAD replay") {
    val got = ops.Aggregates.aggMad(spark, sfDir)
      .as[(String, Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val data = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_extendedprice")
      .as[(String, Double)].collect().groupBy(_._1)
    def median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    data.foreach { case (flag, rows) =>
      val xs = rows.map(_._2)
      val med = median(xs)
      val mad = median(xs.map(x => math.abs(x - med)))
      val out = xs.count(x => math.abs(x - med) > 3 * 1.4826 * mad)
      val g = got(flag)
      assert(g._2 === xs.length)
      assert(g._3 === med, s"median $flag")
      assert(g._4 === mad, s"mad $flag")
      assert(g._5 === out.toLong, s"outliers $flag")
    }
  }

  // ---- q_skyline_pareto --------------------------------------------------

  test("q_skyline_pareto equals the O(n^2) dominance definition") {
    val got = ops.Analytics.skylinePareto(spark, sfDir)
      .as[(Long, Int, Double)].collect().map(_._1).toSet
    val parts = Tables(spark, sfDir, "part")
      .select($"p_partkey", $"p_size", $"p_retailprice")
      .as[(Long, Int, Double)].collect()
    val expect = parts.filter { case (_, s, p) =>
      !parts.exists { case (_, s2, p2) =>
        s2 >= s && p2 <= p && (s2 > s || p2 < p) }
    }.map(_._1).toSet
    assert(got === expect)
    assert(got.nonEmpty)
  }

  // ---- q_text_boilerplate ------------------------------------------------

  test("q_text_boilerplate: fractions are consistent and screen fires") {
    val rows = ops.LlmOps.textBoilerplate(spark, sfDir)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(rows.length === nDocs) // right join keeps boilerplate-free docs
    rows.foreach { case (_, nSegs, nBoiler, nToks, bToks, frac) =>
      assert(nBoiler <= nSegs)
      assert(bToks <= nToks)
      assert(frac === bToks.toDouble / nToks)
    }
    // the synthetic corpus repeats 10-token runs across docs, so the
    // screen must catch something — and not everything
    val caught = rows.count(_._3 > 0)
    assert(caught > 0, "no boilerplate found")
    assert(caught < nDocs, "everything flagged as boilerplate")
  }
}
