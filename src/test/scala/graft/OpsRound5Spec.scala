package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmOps

/** Round-5 additions: never-split FFD packing, BPE encode, product
  * quantization, and the stream-stream OUTER join twin — each pinned
  * against a driver-side reference replay (the omit keys) or its
  * structural invariants (the oracled key). */
class OpsRound5Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_pack_bestfit ----------------------------------------------------

  private def ffdReference(cap: Int): Seq[(String, Int, Long, Long, Long)] = {
    // (source, bin, n_docs, n_tokens, first_doc) exactly as the key
    // aggregates it, from a sequential driver FFD over the same order
    val docs = Tables(spark, sfDir, "documents")
      .select($"source", size(split($"text", " ")).as("n_tokens"), $"doc_id")
      .as[(String, Int, Long)].collect()
      .groupBy(_._1)
    docs.toSeq.flatMap { case (src, rows) =>
      val ordered = rows.sortBy { case (_, n, id) => (-n, id) }
      val loads = scala.collection.mutable.ArrayBuffer.empty[Int]
      val stats = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Long)] // n_docs, n_tokens, first_doc
      ordered.foreach { case (_, n, id) =>
        var b = 0
        while (b < loads.length && loads(b) + n > cap) b += 1
        if (b == loads.length) {
          loads += n; stats += ((1L, n.toLong, id))
        } else {
          loads(b) += n
          val (d, t, f) = stats(b)
          stats(b) = (d + 1, t + n, math.min(f, id))
        }
      }
      stats.zipWithIndex.map { case ((d, t, f), b) => (src, b, d, t, f) }
    }.sortBy(r => (r._1, r._2))
  }

  test("q_pack_bestfit matches a driver-side FFD replay bit-for-bit") {
    val got = LlmOps.packBestfit(spark, sfDir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    val want = ffdReference(256)
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q_pack_bestfit packing invariants hold") {
    val cap = 256
    val bins = LlmOps.packBestfit(spark, sfDir)
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    // every multi-doc bin fits; an oversized doc is a singleton bin
    bins.foreach { case (src, b, nDocs, nTok, _) =>
      assert(nDocs == 1 || nTok <= cap, s"$src bin $b: $nDocs docs $nTok tok")
    }
    // per source: no document lost, and bin count meets the trivial
    // lower bound ceil(total/cap) (the cheap half of FFD <= 11/9 OPT)
    val perSource = bins.groupBy(_._1)
    val docTotals = Tables(spark, sfDir, "documents")
      .groupBy($"source").agg(count(lit(1)).as("n"),
        sum(size(split($"text", " "))).as("tok"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    perSource.foreach { case (src, rows) =>
      val (nDocs, nTok) = docTotals(src)
      assert(rows.map(_._3).sum === nDocs, s"$src lost docs")
      assert(rows.map(_._4).sum === nTok, s"$src lost tokens")
      // regular (<= cap) bins must meet the trivial lower bound over
      // the tokens they carry — oversized singleton bins sit outside
      // the bound's premise that a bin holds at most cap
      val (over, regular) = rows.partition(_._4 > cap)
      val regularTok = regular.map(_._4).sum
      assert(regular.length >= math.ceil(regularTok.toDouble / cap).toInt,
        s"$src: ${regular.length} regular bins below lower bound")
      over.foreach(r => assert(r._3 === 1L, s"$src: oversized bin not singleton"))
    }
  }

  // ---- q_bpe_encode ------------------------------------------------------

  test("q_bpe_encode matches a driver-side encoder replay bit-for-bit") {
    val merges = LlmOps.bpeTrain(spark, sfDir)
      .orderBy($"step").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    assert(merges.nonEmpty)
    def encodeLen(w: String): Int = {
      var syms: Vector[String] = w.toCharArray.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { x =>
          if (out.nonEmpty && out.last == l && x == r)
            out(out.length - 1) = l + r
          else out += x
        }
        syms = out.toVector
      }
      syms.length
    }
    val want = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .map { case (id, text) =>
        val ws = text.split(" ").filter(_.nonEmpty)
        (id, ws.length, ws.map(_.length).sum, ws.map(encodeLen).sum)
      }.sortBy(_._1)
    val got = LlmOps.bpeEncode(spark, sfDir)
      .as[(Long, Int, Int, Int)].collect().toSeq
    assert(got === want)
    // merges actually fired somewhere: the corpus compresses
    assert(got.map(_._4.toLong).sum < got.map(_._3.toLong).sum)
    // and token count never exceeds character count
    got.foreach { case (id, _, nc, nt) =>
      assert(nt <= nc, s"doc $id: $nt tokens > $nc chars")
    }
  }

  // ---- q_embed_pq --------------------------------------------------------

  test("q_embed_pq assigns every vector in every subspace, codes in range") {
    val assigned = LlmOps.embedPqAssigned(spark, sfDir, iters = 2)
      .select($"vec_id", $"m", $"code").as[(Long, Int, Int)].collect().toSeq
    val nVecs = Tables(spark, sfDir, "embeddings").count()
    assert(assigned.length === nVecs * 8)
    assert(assigned.map(r => (r._1, r._2)).distinct.length === assigned.length)
    assigned.foreach { case (_, m, code) =>
      assert(m >= 0 && m < 8 && code >= 0 && code < 16)
    }
    // the declared key is exactly the aggregate of this assignment
    val agg = LlmOps.embedPq(spark, sfDir)
      .as[(Int, Int, Long, Double)].collect().toSeq
    assert(agg.map(_._3).sum === nVecs * 8)
  }

  test("q_embed_pq Lloyd iterations never increase the total residual") {
    def residual(iters: Int): Double =
      LlmOps.embedPqAssigned(spark, sfDir, iters)
        .agg(sum($"d2")).as[Double].collect()(0)
    val r0 = residual(0)
    val r1 = residual(1)
    val r2 = residual(2)
    val eps = 1e-6
    assert(r1 <= r0 * (1 + eps) + eps, s"iter1 $r1 > iter0 $r0")
    assert(r2 <= r1 * (1 + eps) + eps, s"iter2 $r2 > iter1 $r1")
    // and training genuinely helps over the raw init codebook
    assert(r2 < r0)
  }

  // ---- q_sim_ann_pq ------------------------------------------------------

  test("q_sim_ann_pq re-ranks exactly and recalls the brute-force top-5") {
    val pq = LlmOps.simAnnPq(spark, sfDir)
      .as[(Long, Double)].collect().toSeq
    assert(pq.length === 5)
    assert(pq.map(_._2) === pq.map(_._2).sorted.reverse)
    val exact = LlmOps.simCosineTopk(spark, sfDir)
      .as[(Long, Double)].collect().toSeq
    // the emitted sim is the EXACT cosine (the re-rank leaves nothing
    // approximate in the output): wherever ids overlap, values match
    val exactMap = exact.toMap
    pq.foreach { case (id, s) =>
      exactMap.get(id).foreach(es => assert(es === s, s"vec $id sim drift"))
    }
    val top5 = exact.take(5).map(_._1).toSet
    val recall = pq.map(_._1).count(top5) / 5.0
    assert(recall >= 0.6, s"recall@5 = $recall (pq=${pq.map(_._1)}, exact=$top5)")
  }

  // ---- q_knn_graph_bucketed ----------------------------------------------

  test("q_knn_graph_bucketed matches a brute-force in-cell top-3 for every vector") {
    val g = LlmOps.knnGraphBucketed(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(g.nonEmpty)
    // reference: driver-side buckets + exact left-to-right dot, HALF_UP
    // round(4) — the Det.r4 contract
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
    def bucket(e: Seq[Float]): Long =
      (1 to 8).map(i => if (e(i - 1) > 0) 1L << (i - 1) else 0L).sum
    def sim(a: Seq[Float], b: Seq[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      BigDecimal(acc).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = vecs.groupBy(v => bucket(v._2))
    val expected = byCell.values.flatMap { cell =>
      cell.flatMap { case (v, e) =>
        cell.filter(_._1 != v)
          .map { case (n, ne) => (v, n, sim(e, ne)) }
          .sortBy { case (_, n, s) => (-s, n) }
          .take(3).zipWithIndex
          .map { case ((_, n, s), i) => (v, n, s, i + 1) }
      }
    }.toSeq.sortBy(r => (r._1, r._4))
    assert(g === expected)
  }

  // ---- q_shuffle_deterministic --------------------------------------------

  test("q_shuffle_deterministic is the seeded knuth permutation in shard order") {
    val s = LlmOps.shuffleDeterministic(spark, sfDir)
      .as[(Int, Long, String, Long)].collect().toSeq
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(s.length.toLong === nDocs)
    assert(s.map(_._2).distinct.length === s.length) // a permutation
    s.foreach { case (shard, id, _, hk) =>
      assert(BigInt(hk) ===
        (BigInt(id) + 42) * BigInt(2654435761L) % BigInt(4294967296L))
      assert(shard === (hk % 8).toInt)
    }
    assert(s === s.sortBy(t => (t._1, t._4, t._2)))
    // the permutation actually mixes: no long identity run survives
    assert(s.map(_._2).take(20) !== (0L until 20L).toSeq)
  }

  // ---- q_stream_join_outer ----------------------------------------------

  test("q_stream_join_outer emits every click once, nulls for unconverted") {
    val out = graft.ops.StreamingOps.streamJoinOuter(spark, sfDir)
    val rows = out.as[(Long, Long, java.sql.Timestamp,
      Option[Long], Option[java.sql.Timestamp])].collect().toSeq
    val nClicks = Tables(spark, sfDir, "events")
      .filter($"event_type" === "click").count()
    assert(rows.length === nClicks)
    assert(rows.map(_._1).distinct.length === rows.length)
    // both row shapes exist, and every match is a real purchase by the
    // same user inside [ts, ts + 1h)
    assert(rows.exists(_._4.isEmpty))
    assert(rows.exists(_._4.isDefined))
    val purchases = Tables(spark, sfDir, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
      .as[(Long, Long, java.sql.Timestamp)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach {
      case (_, user, ts, Some(pid), Some(pts)) =>
        val (pu, realTs) = purchases(pid)
        assert(pu === user)
        assert(realTs === pts)
        assert(!pts.before(ts) && pts.getTime < ts.getTime + 3600L * 1000)
      case (_, _, _, None, pts) => assert(pts.isEmpty)
      case other => fail(s"half-null purchase columns: $other")
    }
  }
}
