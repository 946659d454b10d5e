package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: snapshot diff, interval concurrency, ABC/Pareto,
  * column profiling, linear attribution, SCD2 point-in-time lookup,
  * PSI drift, bloom-screened dedup, shingle novelty, classifier
  * scoring, sky density, clustering coefficient, perceptual hash —
  * each pinned against an independent in-driver replay or its
  * structural invariants. */
class OpsRound7Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_snapshot_diff ---------------------------------------------------

  test("q_snapshot_diff: status census matches the edit arithmetic") {
    val rows = ops.Relational.snapshotDiff(spark, sfDir)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val keys = Tables(spark, sfDir, "orders")
      .select($"o_orderkey").as[Long].collect()
    val added = keys.count(_ % 17 == 0)
    val removed = keys.count(_ % 13 == 0)
    val changed = keys.count(k => k % 13 != 0 && k % 11 == 0)
    assert(rows("added")._2 === added)
    assert(rows("removed")._2 === removed)
    assert(rows("changed")._2 === changed)
    assert(rows("unchanged")._2 === keys.length - removed - changed)
    // every changed row drifts by exactly +100.00
    assert(rows("changed")._3 === 100.0 * changed)
  }

  // ---- q_intervals_open --------------------------------------------------

  test("q_intervals_open: peak days match naive stabbing counts") {
    val top = ops.Analytics.intervalsOpen(spark, sfDir)
      .as[(java.sql.Date, Long, Long)].collect()
    assert(top.length === 20)
    val ivs = Tables(spark, sfDir, "orders")
      .select(to_date($"o_orderdate").as("s"),
        date_add(to_date($"o_orderdate"),
          (lit(1) + $"o_orderkey" % 28).cast("int")).as("e"))
      .as[(java.sql.Date, java.sql.Date)].collect()
    top.foreach { case (day, _, open) =>
      val naive = ivs.count { case (s, e) =>
        !day.before(s) && day.before(e)
      }
      assert(open === naive, s"day $day")
    }
    // peaks are sorted descending with day tiebreak
    assert(top.map(_._3).toSeq === top.map(_._3).sortBy(-_).toSeq)
  }

  // ---- q_abc_pareto ------------------------------------------------------

  test("q_abc_pareto: classes partition the catalog, shares sum to 1") {
    val rows = ops.Analytics.abcPareto(spark, sfDir)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSet === Set("A", "B", "C"))
    val nParts = Tables(spark, sfDir, "lineitem")
      .select($"l_partkey").distinct().count()
    assert(rows.map(_._2).sum === nParts)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3)
    // the head class concentrates revenue: mean revenue per A part
    // strictly exceeds mean revenue per C part
    val byClass = rows.map(r => r._1 -> r).toMap
    assert(byClass("A")._3 / byClass("A")._2 >
      byClass("C")._3 / byClass("C")._2)
  }

  // ---- q_profile_columns -------------------------------------------------

  test("q_profile_columns: PK and domain facts hold") {
    val p = ops.Quality.profileColumns(spark, sfDir)
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    val n = Tables(spark, sfDir, "documents").count()
    assert(p.keySet ===
      Set("doc_id", "lang", "source", "n_chars", "text"))
    p.values.foreach { r => assert(r._2 === n); assert(r._3 === 0L) }
    assert(p("doc_id")._4 === n) // PK: distinct == rows
    assert(p("lang")._4 === 5L)
    assert(p("lang")._5 === "de" && p("lang")._6 === "zh")
  }

  // ---- q_attrib_linear ---------------------------------------------------

  test("q_attrib_linear matches an in-driver floor-cent replay") {
    val got = ops.Analytics.attribLinear(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    val evs = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts"),
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)].collect()
    val touches = evs.filter(e =>
      Set("view", "click", "signup")(e._4))
    val credit = scala.collection.mutable.Map
      .empty[String, (Set[Long], Long)].withDefaultValue((Set.empty, 0L))
    evs.filter(_._4 == "purchase").foreach {
      case (eid, uid, tus, _, value) =>
        val cents = BigDecimal(value).setScale(2).*(100).toLongExact
        val w = touches.filter(t => t._2 == uid &&
          t._3 >= tus - 3600000000L && t._3 < tus)
        if (w.isEmpty) {
          val (ids, c) = credit("direct")
          credit("direct") = (ids + eid, c + cents)
        } else {
          val n = w.length
          w.groupBy(_._4).foreach { case (ch, g) =>
            val (ids, c) = credit(ch)
            credit(ch) = (ids + eid, c + (cents * g.length) / n)
          }
        }
    }
    val expect = credit.map { case (ch, (ids, c)) =>
      (ch, ids.size.toLong, c.toDouble / 100.0)
    }.toSet
    assert(got === expect)
  }

  // ---- q_join_scd2_pit ---------------------------------------------------

  test("q_join_scd2_pit census matches an in-driver interval replay") {
    val got = ops.Analytics.joinScd2Pit(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val orders = Tables(spark, sfDir, "orders")
      .select($"o_custkey", $"o_orderkey", to_date($"o_orderdate"),
        $"o_orderstatus")
      .as[(Long, Long, java.sql.Date, String)].collect()
    val custs = Tables(spark, sfDir, "customer")
      .select($"c_custkey").as[Long].collect()
    val base = java.time.LocalDate.parse("1996-01-01")
    val statusAt = orders.groupBy(_._1).map { case (ck, os) =>
      val sorted = os.sortBy(o => (o._3.toLocalDate.toEpochDay, o._2))
      ck -> sorted
    }
    val expect = custs.map { ck =>
      val asOf = base.plusDays(ck % 1800)
      statusAt.get(ck) match {
        case None => "none"
        case Some(hist) =>
          // last order at-or-before asOf determines the open interval
          val prior = hist.filter(!_._3.toLocalDate.isAfter(asOf))
          if (prior.isEmpty) "none" else prior.last._4
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got === expect)
  }

  // ---- q_stats_drift_psi -------------------------------------------------

  test("q_stats_drift_psi: bins conserve counts, total sums terms") {
    val rows = ops.Quality.statsDriftPsi(spark, sfDir)
      .as[(Int, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.length === 10)
    val n = Tables(spark, sfDir, "events").count()
    assert(rows.map(r => r._2 + r._3).sum === n)
    val total = rows.map(r => BigDecimal(r._6)).sum.toDouble
    assert(math.abs(total - rows.head._7) < 1e-9)
    rows.foreach(r => assert(r._7 === rows.head._7))
  }

  // ---- q_dedup_bloom_screen ----------------------------------------------

  test("q_dedup_bloom_screen equals the exact NOT EXISTS split") {
    val got = ops.LlmOps.dedupBloomScreen(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSet
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    val corpus = docs.filter(_._1 % 10 != 7).map(_._3).toSet
    val batch = docs.filter(_._1 % 10 == 7) ++
      docs.filter(_._1 % 10 == 3).map(d => (d._1 + 1000000L, d._2, d._3))
    val expect = batch.groupBy(_._2).map { case (lang, g) =>
      val dup = g.count(d => corpus(d._3))
      (lang, g.length.toLong, dup.toLong, (g.length - dup).toLong)
    }.toSet
    assert(got === expect)
    // every replayed doc is a guaranteed duplicate
    val replayed = docs.count(_._1 % 10 == 3)
    assert(got.toSeq.map(_._3).sum >= replayed)
  }

  // ---- q_text_novelty ----------------------------------------------------

  test("q_text_novelty: bounded, and the corpus-min doc is fully novel") {
    val rows = ops.LlmOps.textNovelty(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._3 <= r._2)
      assert(r._4 >= 0.0 && r._4 <= 1.0)
    }
    // doc_id 0 is the corpus minimum and in the %7 slice: every one of
    // its shingles first occurs there
    rows.find(_._1 === 0L).foreach(r => assert(r._4 === 1.0))
  }

  // ---- q_classify_linear -------------------------------------------------

  test("q_classify_linear matches an in-driver hash/weight replay") {
    val got = ops.Quality.classifyLinear(spark, sfDir)
      .as[(Long, Int, Long, Double, Boolean)].collect()
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.length === docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    got.take(50).foreach { case (id, nTok, scoreInt, score, label) =>
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      assert(nTok === toks.length)
      val expect = toks.map { t =>
        val hex = md.digest(t.getBytes("UTF-8")).take(6)
          .map(b => f"$b%02x").mkString
        val bucket = java.lang.Long.parseLong(hex, 16) % 64
        ((bucket * 2654435761L) % 201) - 100
      }.sum
      assert(scoreInt === expect, s"doc $id")
      assert(score === scoreInt.toDouble / math.max(nTok, 1))
      assert(label === (scoreInt > 0))
    }
  }

  // ---- q_spatial_density -------------------------------------------------

  test("q_spatial_density conserves objects on the 24x8 grid") {
    val rows = ops.Spatial.spatialDensity(spark, sfDir)
      .as[(Int, Int, Long, Long)].collect()
    assert(rows.map(_._3).sum === Tables(spark, sfDir, "part").count())
    rows.foreach { r =>
      assert(r._1 >= 0 && r._1 <= 23)
      assert(r._2 >= 0 && r._2 <= 7)
    }
  }

  // ---- q_graph_clustering ------------------------------------------------

  test("q_graph_clustering matches a naive neighbor-pair count") {
    val rows = ops.LlmOps.graphClustering(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    // rebuild the undirected kNN edge set independently of the wedge
    // machinery under test, then count closed neighbor pairs naively
    val und = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select(least($"vec_id", $"nbr_id"), greatest($"vec_id", $"nbr_id"))
      .distinct().as[(Long, Long)].collect().toSet
    val nbrs = und.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(rows.map(_._1).toSet === nbrs.keySet)
    rows.foreach { case (node, deg, nTri, cc) =>
      val ns = nbrs(node).toSeq.sorted
      assert(deg === ns.length)
      val closed = (for {
        i <- ns.indices; j <- (i + 1) until ns.length
        if und((math.min(ns(i), ns(j)), math.max(ns(i), ns(j))))
      } yield 1).sum
      assert(nTri === closed, s"node $node")
      val expectCc =
        if (deg < 2) 0.0 else (2.0 * closed) / (deg * (deg - 1))
      assert(cc === expectCc)
      assert(cc >= 0.0 && cc <= 1.0)
    }
  }

  // ---- q_events_heatmap --------------------------------------------------

  test("q_events_heatmap conserves events on the week grid") {
    val rows = ops.Analytics.eventsHeatmap(spark, sfDir)
      .as[(Int, Int, Long, Double)].collect()
    assert(rows.map(_._3).sum === Tables(spark, sfDir, "events").count())
    rows.foreach { r =>
      assert(r._1 >= 0 && r._1 <= 6)
      assert(r._2 >= 0 && r._2 <= 23)
    }
  }

  // ---- q_ts_twa ----------------------------------------------------------

  test("q_ts_twa matches an in-driver step-integral replay") {
    val got = ops.Analytics.tsTwa(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    val evs = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts"), $"value")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1)
    got.foreach { case (uid, n, span, twa) =>
      val series = evs(uid).sortBy(e => (e._3, e._2))
      assert(n === series.length)
      assert(span === series.last._3 - series.head._3)
      val area = series.sliding(2).collect { case Array(a, b) =>
        BigDecimal(a._4).setScale(2) * BigDecimal(b._3 - a._3)
      }.sum
      assert(math.abs(twa - area.toDouble / span) < 1e-3, s"user $uid")
    }
    // single-event users (zero span) are excluded
    assert(got.length === evs.count(_._2.length > 1))
  }

  // ---- q_mix_epochs ------------------------------------------------------

  test("q_mix_epochs: capped allocation inside the 2x token budget") {
    val rows = ops.LlmOps.mixEpochs(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-2)
    rows.foreach(r => assert(r._5 > 0.0 && r._5 <= 4.0))
    val total = rows.map(_._3).sum
    val planned = rows.map(r => r._5 * r._3).sum
    assert(planned <= 2.0 * total + total * 1e-3)
  }

  // ---- q_dedup_url -------------------------------------------------------

  test("q_dedup_url: variant triples collapse, unique pages survive") {
    val rows = ops.LlmOps.dedupUrl(spark, sfDir)
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    val ids = Tables(spark, sfDir, "documents")
      .select($"doc_id").as[Long].collect()
    val nUnique = ids.count(_ % 4 == 3)
    val nTriples = ids.filter(_ % 4 != 3).map(_ / 4).distinct.length
    assert(rows(1L)._2 === nUnique)
    // the %4∈{0,1,2} ids of each block collapse to one canonical URL
    assert(rows.filterNot(_._1 == 1L).values.map(_._2).sum === nTriples)
    assert(rows(1L)._3.startsWith("https://www.example.com/docs/u"))
  }

  // ---- q_stream_topk -----------------------------------------------------

  test("q_stream_topk: ranks within each window's pre-aggregate") {
    val rows = ops.StreamingOps.streamTopk(spark, sfDir)
      .as[(java.sql.Timestamp, Int, String, Long, Double)].collect()
    rows.groupBy(_._1).values.foreach { w =>
      val sorted = w.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length))
      assert(sorted.length <= 3)
      // revenue non-increasing down the ranks
      assert(sorted.map(_._5).toSeq ===
        sorted.map(_._5).sortBy(x => -x).toSeq)
    }
  }

  // ---- q_join_incremental ------------------------------------------------

  test("q_join_incremental merge equals the full-join recompute") {
    val got = ops.Aggregates.joinIncremental(spark, sfDir)
      .as[(String, Long, Double)].collect().toSet
    val full = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey")
      .join(Tables(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_orders"),
        Det.dsum($"o_totalprice").as("revenue"))
      .as[(String, Long, Double)].collect().toSet
    assert(got === full)
  }

  // ---- q_chunk_overlap ---------------------------------------------------

  test("q_chunk_overlap: stride/window arithmetic and coverage hold") {
    val rows = ops.LlmOps.chunkOverlap(spark, sfDir)
      .as[(Long, Int, Int, Int, String)].collect()
    val nToks = Tables(spark, sfDir, "documents")
      .select($"doc_id",
        expr("size(filter(split(text, ' '), t -> t <> ''))"))
      .as[(Long, Int)].collect().toMap
    rows.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nToks(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === sorted.indices)
      assert(sorted.length === (n - 1) / 24 + 1)
      sorted.foreach { case (_, idx, start, len, _) =>
        assert(start === idx * 24)
        assert(len === math.min(32, n - start))
      }
      // only the FINAL chunk can fall under stride+1 tokens: any
      // earlier chunk has n - start >= 25 by the start formula
      sorted.init.foreach(c => assert(c._4 >= 25))
      assert(sorted.last._4 >= 1)
    }
    // every non-empty doc is covered
    assert(rows.map(_._1).distinct.length ===
      nToks.count(_._2 > 0))
  }

  // ---- q_sim_matryoshka --------------------------------------------------

  test("q_sim_matryoshka: full ranking with sane prefix overlap") {
    val rows = ops.LlmOps.simMatryoshka(spark, sfDir)
      .as[(Long, Double, Double, Boolean)].collect()
    assert(rows.length === 10)
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(x => -x).toSeq)
    // the prefix flag matches an independently computed prefix top-10
    val v = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect()
    val qe = v.find(_._1 == 0L).get._2
    def dot16(a: Array[Float]) =
      (0 until 16).map(i => a(i).toDouble * qe(i).toDouble).sum
    val prefTop = v.filter(_._1 != 0L)
      .map(t => (t._1, BigDecimal(dot16(t._2))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    rows.foreach(r => assert(r._4 === prefTop(r._1), s"vec ${r._1}"))
  }

  // ---- q_events_stickiness -----------------------------------------------

  test("q_events_stickiness matches a naive trailing-28-day count") {
    val rows = ops.Analytics.eventsStickiness(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Double)].collect()
    val ud = Tables(spark, sfDir, "events")
      .select(to_date($"ts"), $"user_id").distinct()
      .as[(java.sql.Date, Long)].collect()
    rows.foreach { case (day, dau, mau, st) =>
      val d = day.toLocalDate
      val naiveDau = ud.filter(_._1.toLocalDate == d).map(_._2).toSet.size
      val naiveMau = ud.filter { u =>
        val x = u._1.toLocalDate
        !x.isAfter(d) && !x.isBefore(d.minusDays(27))
      }.map(_._2).toSet.size
      assert(dau === naiveDau && mau === naiveMau, s"day $day")
      assert(st === dau.toDouble / mau)
      assert(st > 0.0 && st <= 1.0)
    }
  }

  // ---- q_events_forecast_naive -------------------------------------------

  test("q_events_forecast_naive: scored days and MAPE are consistent") {
    val rows = ops.Analytics.eventsForecastNaive(spark, sfDir)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._2 > 0)
      assert(r._3 >= 0.0)
    }
  }

  // ---- q_quality_lexicon -------------------------------------------------

  test("q_quality_lexicon matches an in-driver term scan") {
    val got = ops.Quality.qualityLexicon(spark, sfDir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    val lex = Set("dup", "stream", "hash")
    val docs = Tables(spark, sfDir, "documents")
      .select($"lang", $"text").as[(String, String)].collect()
    val expect = docs.groupBy(_._1).map { case (lang, g) =>
      val stats = g.map { d =>
        val toks = d._2.split(" ").filter(_.nonEmpty)
        (toks.count(lex), lex.count(toks.toSet))
      }
      val flagged = stats.count(_._1 > 0)
      (lang, g.length.toLong, flagged.toLong,
        stats.map(_._1).sum.toLong, stats.map(_._2).max.toLong,
        flagged.toDouble / g.length)
    }.toSet
    assert(got === expect)
  }

  // ---- q_sample_negatives ------------------------------------------------

  test("q_sample_negatives: reproducible, resolvable, never self") {
    val rows = ops.LlmOps.sampleNegatives(spark, sfDir)
      .as[(Long, Int, Long, Boolean)].collect()
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val src = docs.toMap
    val n = docs.length
    val anchors = docs.map(_._1).filter(_ % 10 == 5)
    assert(rows.length === anchors.length * 3)
    rows.foreach { case (a, j, neg, same) =>
      val raw = (a * 2654435761L + j * 1000003L) % n
      val expect = if (raw == a) (raw + 1) % n else raw
      assert(neg === expect)
      assert(neg !== a)
      assert(same === (src(neg) == src(a)))
    }
  }

  // ---- q_ab_test ---------------------------------------------------------

  test("q_ab_test matches an in-driver two-proportion replay") {
    val r = ops.Analytics.abTestProportions(spark, sfDir)
      .as[(Long, Long, Long, Long, Double, Double, Double, Boolean)]
      .collect().head
    val conv = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
      .groupBy(_._1).map { case (u, es) =>
        u -> (if (es.exists(_._2 == "purchase")) 1L else 0L)
      }
    val (as, bs) = conv.partition(_._1 % 2 == 0)
    assert((r._1, r._2, r._3, r._4) ===
      ((as.size.toLong, as.values.sum, bs.size.toLong, bs.values.sum)))
    val (pa, pb) = (r._2.toDouble / r._1, r._4.toDouble / r._3)
    val pp = (r._2 + r._4).toDouble / (r._1 + r._3)
    val se = math.sqrt(pp * (1 - pp) * (1.0 / r._1 + 1.0 / r._3))
    val z = if (se > 0) (pa - pb) / se else 0.0
    assert(math.abs(r._7 - z) < 1e-3)
    assert(r._8 === (math.abs(z) > 1.96))
  }

  // ---- q_sim_ann_filtered ------------------------------------------------

  test("q_sim_ann_filtered: filtered, populated, correctly scored") {
    val rows = ops.LlmOps.simAnnFiltered(spark, sfDir)
      .as[(Long, Int, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 5)
    rows.foreach(r => assert(r._2 < 5))
    assert(rows.map(_._3).toSeq === rows.map(_._3).sortBy(x => -x).toSeq)
    val v = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])]
      .collect().toMap
    val qe = v(0L)
    rows.foreach { case (id, _, sim) =>
      val d = (0 until 64).map(i => v(id)(i).toDouble * qe(i).toDouble).sum
      assert(math.abs(sim - d) < 1e-3, s"vec $id")
    }
  }

  // ---- q_text_bigram_lm --------------------------------------------------

  test("q_text_bigram_lm matches an in-driver add-one LM replay") {
    val got = ops.LlmOps.textBigramLm(spark, sfDir)
      .as[(Long, Long, Double, Double)].collect()
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map(d => d._1 -> d._2.split(" ").filter(_.nonEmpty).toSeq).toMap
    val uni = docs.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val vocab = uni.size.toLong
    val bg = docs.values.flatMap(_.sliding(2).filter(_.length == 2)
      .map(p => (p(0), p(1)))).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(got.length === docs.count(_._2.length >= 2))
    got.take(40).foreach { case (id, n, avg, ppl) =>
      val toks = docs(id)
      assert(n === toks.length - 1)
      val nlps = toks.sliding(2).filter(_.length == 2).map { p =>
        -math.log((bg((p(0), p(1))) + 1).toDouble /
          (uni(p(0)) + vocab))
      }.toSeq
      val expect = nlps.sum / n
      assert(math.abs(avg - expect) < 1e-3, s"doc $id")
      assert(math.abs(ppl - math.exp(expect)) < 1e-2)
    }
  }

  // ---- q_delete_compact --------------------------------------------------

  test("q_delete_compact: policy and file-measured counts agree") {
    val rows = graft.sources.Sources.deleteCompact(spark, sfDir)
      .as[(Long, Long, Long, Double, String, Long, Long)].collect()
    val keys = Tables(spark, sfDir, "orders")
      .select($"o_orderkey").as[Long].collect()
    val byFg = keys.groupBy(_ % 8)
    assert(rows.map(_._1).toSet === byFg.keySet)
    var sawRewrite = false
    var sawKeep = false
    rows.foreach { case (fg, n, nt, _, action, after, resid) =>
      val ks = byFg(fg)
      val del = ks.count(k => k % 10 == 3 || (fg == 2 && (k / 8) % 3 == 0))
      assert(n === ks.length && nt === del)
      if (nt.toDouble / n > 0.2) {
        sawRewrite = true
        assert(action === "rewrite" && after === n - nt && resid === 0L)
      } else {
        sawKeep = true
        assert(action === "keep" && after === n && resid === nt)
      }
    }
    assert(sawRewrite && sawKeep)
  }

  // ---- q_multimodal_phash ------------------------------------------------

  test("q_multimodal_phash matches the generator-arithmetic replay") {
    val got = ops.LlmOps.multimodalPhash(spark, sfDir)
      .as[(String, Long, Long)].collect().toSet
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars".cast("int"))
      .as[(Long, Int)].collect()
    def phash(id: Long, nChars: Int): String = {
      val (w, h, g) = (8 + nChars % 24, 8 + (id % 24).toInt,
        ((id * 37 + nChars) % 190).toInt)
      val mx = math.max(w, h)
      val (ow, oh) = if (mx <= 8) (w, h) else (w * 8 / mx, h * 8 / mx)
      val n = ow * oh
      val px = Array.tabulate(oh, ow)((j, i) =>
        g + (i * w / ow) + (j * h / oh))
      val sum = px.map(_.map(_.toLong).sum).sum
      val bits = (for (j <- 0 until oh; i <- 0 until ow)
        yield if (px(j)(i).toLong * n > sum) '1' else '0').mkString
      s"${ow}x$oh:$bits"
    }
    val expect = docs.map(d => (phash(d._1, d._2), d._1))
      .groupBy(_._1).map { case (p, g) =>
        (p, g.map(_._2).min, g.length.toLong)
      }.toSet
    assert(got === expect)
    // the hash genuinely buckets: fewer groups than images
    assert(got.size < docs.length)
  }
}
