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

  // ---- q_sessionize_gap --------------------------------------------------

  test("q_sessionize_gap matches a driver-side sessionization replay") {
    val gap = 1800000000L
    val evs = Tables(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id")
      .as[(Long, Long, Long)].collect()
    val sessions = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val acc = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[Long]]
      var prev = Long.MinValue
      sorted.foreach { case (_, t, _) =>
        if (acc.isEmpty || t - prev > gap) {
          acc += scala.collection.mutable.ArrayBuffer(t)
        } else acc.last += t
        prev = t
      }
      acc.map(s => (s.length.toLong, s.max - s.min))
    }
    val want = sessions.groupBy(_._1).map { case (n, xs) =>
      (n, xs.size.toLong, xs.map(_._2).sum.toDouble / xs.size / 1000000.0)
    }.toSeq.sortBy(_._1)
    val got = graft.ops.Analytics.sessionizeGap(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === want)
    // no event lost: histogram weights sum back to the corpus size
    assert(got.map(r => r._1 * r._2).sum === evs.length.toLong)
  }

  // ---- q_events_attribution ----------------------------------------------

  test("q_events_attribution matches a driver-side last-touch replay") {
    val touch = Set("view", "click", "signup")
    val evs = Tables(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    val credited = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      var last: String = null
      rows.sortBy(r => (r._2, r._3)).flatMap { case (_, _, _, tp, v) =>
        val out = if (tp == "purchase")
          Some((if (last == null) "direct" else last, v)) else None
        if (touch(tp)) last = tp
        out
      }
    }
    val want = credited.groupBy(_._1).map { case (ch, xs) =>
      // mirror Det.dsum: double → decimal(27,4) HALF_UP, exact sum,
      // exact cast back to double
      val sum = xs.map(x => BigDecimal(x._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum
      (ch, xs.size.toLong, sum.toDouble)
    }.toSeq.sortBy(_._1)
    val got = graft.ops.Analytics.eventsAttribution(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.map(_._2).sum ===
      evs.count(_._4 == "purchase").toLong)
  }

  // ---- q_ids_contiguous --------------------------------------------------

  test("q_ids_contiguous assigns exactly the global-sort ranks") {
    val expected = Tables(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect().sorted.zipWithIndex
      .collect { case (id, i) if id % 37 == 0 => (id, i.toLong) }.toSeq
    val got = graft.ops.Ids.idsContiguous(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
  }

  // ---- q_quality_constraints ---------------------------------------------

  test("q_quality_constraints: clean corpus, correct denominators") {
    val rows = graft.ops.Quality.qualityConstraints(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.length === 9)
    val byName = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byName.keySet.forall(_.matches("[a-z]+\\.[a-z_]+")))
    // the generated corpus satisfies every declared constraint
    rows.foreach { case (n, _, v) => assert(v === 0L, s"$n violated") }
    for ((t, checks) <- Seq(
        "documents" -> Seq("documents.lang_accepted",
          "documents.nchars_consistent", "documents.text_nonempty"),
        "events" -> Seq("events.ts_in_range", "events.type_accepted",
          "events.value_nonneg"))) {
      val n = Tables(spark, sfDir, t).count()
      checks.foreach(c => assert(byName(c)._1 === n, c))
    }
    assert(byName("orders.pk_unique")._1 ===
      Tables(spark, sfDir, "orders").count())
    assert(byName("lineitem.fk_orders")._1 ===
      Tables(spark, sfDir, "lineitem").count())
    assert(byName("customer.fk_nation")._1 ===
      Tables(spark, sfDir, "customer").count())
  }

  test("q_quality_constraints fuses same-table checks into one scan") {
    val plan = graft.ops.Quality.qualityConstraints(spark, sfDir)
      .queryExecution.optimizedPlan
    // identify table leaves by their signature columns: within this
    // plan only documents carries n_chars, only events event_type
    def scansWith(colName: String): Int =
      plan.collectLeaves().count(_.output.exists(_.name == colName))
    // three documents checks, three events checks — one scan each
    assert(scansWith("n_chars") === 1)
    assert(scansWith("event_type") === 1)
  }

  // ---- q_compact_small_files ---------------------------------------------

  test("q_compact_small_files leaves exactly one file per directory") {
    val out = graft.sources.Sources.compactSmallFiles(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    out.foreach { case (src, _, _, nFiles) =>
      assert(nFiles === 1L, s"$src not compacted")
    }
    def parquetFiles(sub: String): Map[String, Int] = {
      val root = java.nio.file.Paths.get(
        s"${graft.ops.Relational.scratchRoot}/compact/$sub")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .toSeq.groupBy(_.getParent.getFileName.toString)
        .map { case (d, fs) => d -> fs.size }
    }
    val small = parquetFiles("small")
    val compacted = parquetFiles("compacted")
    // compaction strictly reduced the file population and every
    // compacted directory holds exactly one file
    assert(compacted.values.forall(_ === 1))
    assert(small.values.sum > compacted.values.sum)
    assert(small.exists(_._2 > 1))
  }

  // ---- q_scd2_intervals --------------------------------------------------

  test("q_scd2_intervals: intervals tile each history, runs alternate") {
    val rows = graft.ops.Analytics.scd2Intervals(spark, sfDir)
      .as[(Long, Long, String, java.sql.Timestamp,
        Option[java.sql.Timestamp], Long)].collect().toSeq
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (cust, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.length.toLong))
      // exactly one open (current) interval per customer, at the end
      assert(sorted.init.forall(_._5.isDefined))
      assert(sorted.last._5.isEmpty)
      sorted.sliding(2).foreach {
        case Seq((_, _, s1, f1, Some(t1), _), (_, _, s2, f2, _, _)) =>
          assert(s1 !== s2, s"cust $cust: adjacent runs share status")
          assert(t1 === f2, s"cust $cust: intervals do not tile")
          assert(!f1.after(f2))
        case _ => ()
      }
      // every order of the sampled customer is accounted for
      val nOrders = Tables(spark, sfDir, "orders")
        .filter($"o_custkey" === cust).count()
      assert(rs.map(_._6).sum === nOrders)
    }
  }

  // ---- q_ts_gapfill ------------------------------------------------------

  test("q_ts_gapfill: full grid, gaps carry the last observed value") {
    val rows = graft.ops.Analytics.tsGapfill(spark, sfDir)
      .as[(String, java.sql.Date, Double, Int)].collect().toSeq
    val types = Tables(spark, sfDir, "events")
      .select($"event_type").distinct().as[String].collect().toSet
    assert(rows.length === types.size * 31)
    // at the test SF some days are genuinely empty — the fill fires
    assert(rows.exists(_._4 == 1))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2.toString)
      assert(sorted.map(_._2.toString) ===
        (1 to 31).map(d => f"2024-01-$d%02d"))
      // a filled day repeats the previous surfaced value (0 at head)
      sorted.zipWithIndex.foreach { case ((_, _, v, filled), i) =>
        if (filled == 1)
          assert(v === (if (i == 0) 0.0 else sorted(i - 1)._3))
      }
    }
  }

  // ---- q_win_median_rolling ----------------------------------------------

  test("q_win_median_rolling matches a driver-side frame replay") {
    val evs = Tables(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id", $"value")
      .as[(Long, Long, Long, Double)].collect()
    val want = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.indices.map { i =>
        val frame = sorted.slice(math.max(0, i - 4), i + 1).map(_._4)
        val s = frame.sorted
        val pos = (s.length - 1) * 0.5
        val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
        val med = lo + (hi - lo) * (pos - pos.toInt)
        val sum = frame.map(v => BigDecimal(v)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        (u, sorted(i)._3,
          BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble, sum)
      }
    }.filter(_._1 % 7 == 0).sortBy(r => (r._1, r._2))
    val got = graft.ops.Windows.winMedianRolling(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  // ---- q_join_bloom_prejoin ----------------------------------------------

  test("q_join_bloom_prejoin: bloom prunes rows but never matches") {
    val dimKeys = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey").as[Long].collect().toSet
    val factKeys = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey").as[Long].collect().toSeq
    val bf = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .stat.bloomFilter("o_orderkey", 100000L, 0.01)
    // no false negatives: every true match passes the filter
    factKeys.filter(dimKeys).foreach(k => assert(bf.mightContainLong(k)))
    // and the filter genuinely prunes the non-matching majority
    val passed = factKeys.count(bf.mightContainLong)
    assert(passed < factKeys.length)
    assert(passed >= factKeys.count(dimKeys))
    // the key's aggregate equals the plain exact join
    val got = graft.ops.Relational.joinBloomPrejoin(spark, sfDir)
      .as[(Long, Double)].collect().head
    val exact = (factKeys.count(dimKeys).toLong,
      Tables(spark, sfDir, "lineitem")
        .filter($"l_orderkey".isInCollection(dimKeys))
        .agg(Det.dsum($"l_quantity")).as[Double].collect().head)
    assert(got === exact)
  }

  // ---- q_source_badrecords -----------------------------------------------

  test("q_source_badrecords quarantines exactly the truncated lines") {
    val rows = graft.sources.Sources.sourceBadRecords(spark, sfDir)
      .as[(Option[String], Long, Long, Option[Long])].collect().toSeq
    val total = Tables(spark, sfDir, "documents").count()
    val nCorrupt = Tables(spark, sfDir, "documents")
      .filter($"doc_id" % 13 === 0).count()
    assert(rows.map(_._2).sum === total)
    val (nullGroup, goodGroups) = rows.partition(_._1.isEmpty)
    assert(nullGroup.length === 1)
    assert(nullGroup.head._2 === nCorrupt)
    assert(nullGroup.head._3 === nCorrupt) // all its rows are bad
    assert(nullGroup.head._4.isEmpty)      // no chars parsed from them
    goodGroups.foreach { case (_, _, nBad, sum) =>
      assert(nBad === 0L); assert(sum.isDefined)
    }
  }

  // ---- q_multimodal_audio ------------------------------------------------

  test("q_multimodal_audio: real WAV payloads decode to the PCM recipe") {
    val payloads = graft.ops.LlmOps.wavPayload(spark, sfDir).collect()
    assert(payloads.nonEmpty)
    payloads.foreach { case (_, bytes) =>
      // a genuine RIFF/WAVE container, not raw PCM
      assert(new String(bytes.take(4), "US-ASCII") === "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    }
    val got = graft.ops.LlmOps.multimodalAudio(spark, sfDir)
      .as[(Long, Int, Int, Long, Double)].collect().toSeq
    val chars = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect().toMap
    assert(got.map(_._1) === got.map(_._1).sorted)
    got.foreach { case (id, n, rate, peak, meanAbs) =>
      assert(n === chars(id).toInt * 4)
      assert(rate === 8000)
      val sams = (0 until n).map(i =>
        math.abs((id * 31L + i.toLong * 7L) % 4096L - 2048L))
      assert(peak === sams.max)
      assert(meanAbs === sams.sum.toDouble / n)
    }
  }

  // ---- q_agg_incremental -------------------------------------------------

  test("q_agg_incremental: snapshot+delta merge equals full recompute") {
    val got = graft.ops.Aggregates.aggIncremental(spark, sfDir)
      .as[(String, Long, Long, Double)].collect().toSeq
    val want = Tables(spark, sfDir, "documents")
      .groupBy($"source")
      .agg(count(lit(1)).as("n"), sum($"n_chars").cast("long").as("s"))
      .select($"source", $"n", $"s",
        ($"s".cast("double") / $"n").as("a"))
      .orderBy($"source")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // the landed snapshot really is the partial form (no avg stored)
    val snap = spark.read.parquet(
      s"${graft.ops.Relational.scratchRoot}/snapshot_agg")
    assert(snap.columns.toSet === Set("source", "n_docs", "sum_chars"))
    assert(snap.count() > 0)
  }

  // ---- q_graph_pagerank --------------------------------------------------

  test("q_graph_pagerank matches a driver-side fixed-point replay") {
    val scale = 1000000000000L
    val edges = graft.ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect().toSeq
    val nodes = Tables(spark, sfDir, "embeddings")
      .select($"vec_id").as[Long].collect().toSeq
    val n = nodes.length.toLong
    val init = scale / n
    val base = (init * 15L) / 100L
    val od = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to 10) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / od(src) }.sum
      }
      r = nodes.map(v => v -> (base + 85L * in.getOrElse(v, 0L) / 100L))
        .toMap
    }
    val want = r.toSeq.sortBy { case (v, rk) => (-rk, v) }.take(20)
    val got = graft.ops.LlmOps.graphPagerank(spark, sfDir)
      .as[(Long, Long)].collect().toSeq
    assert(got === want)
    // conservation: leaked dangling/rounding mass only ever shrinks
    // the total, never grows it
    assert(r.values.sum <= scale)
    assert(r.values.forall(_ >= base))
  }

  // ---- q_text_winnow -----------------------------------------------------

  /** The shipped per-token code: 48-bit md5 slice (content hash —
    * see winnowSel's scaladoc for why the cheap (char, length) code
    * was retired). */
  private def tokenCode(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q_text_winnow matches a driver-side winnowing replay") {
    val (k, w, m) = (4, 4, 1000000007L)
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val want = docs.map { case (id, text) =>
      val codes = text.split(" ").filter(_.nonEmpty).map(tokenCode)
      val grams = codes.sliding(k).filter(_.length == k)
        .map(_.foldLeft(0L)((a, c) => (a * 131 + c) % m)).toArray
      val sel = grams.sliding(w).filter(_.length == w)
        .map(_.min).toArray.distinct
      (id, grams.length, sel.length,
        if (sel.isEmpty) None else Some(sel.min),
        if (sel.isEmpty) None else Some(sel.max), sel.sum)
    }.sortBy(_._1).toSeq
    val got = graft.ops.LlmOps.textWinnow(spark, sfDir)
      .as[(Long, Int, Int, Option[Long], Option[Long], Long)]
      .collect().toSeq
    assert(got === want)
    assert(got.exists(_._3 > 0))
  }

  test("q_text_winnow guarantee: every w-window contributes a pick") {
    // winnowing's coverage property — each window of w consecutive
    // gram hashes contains at least one selected fingerprint, so any
    // shared run of >= w+k-1 tokens across docs must share a pick
    val (k, w, m) = (4, 4, 1000000007L)
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val sels = graft.ops.LlmOps.textWinnow(spark, sfDir)
      .select($"doc_id", $"n_grams").as[(Long, Int)].collect().toMap
    docs.foreach { case (id, text) =>
      val codes = text.split(" ").filter(_.nonEmpty).map(tokenCode)
      val grams = codes.sliding(k).filter(_.length == k)
        .map(_.foldLeft(0L)((a, c) => (a * 131 + c) % m)).toArray
      assert(sels(id) === grams.length)
      if (grams.length >= w) {
        val sel = grams.sliding(w).map(_.min).toSet
        grams.sliding(w).foreach(win => assert(win.exists(sel)))
      }
    }
  }
}
