package graft

import org.apache.spark.sql.functions._

/** Round-6 additions: latest-wins CDC apply, salted two-stage
  * aggregation, rolling 7-day distinct users, and the order-independent
  * table fingerprint — each pinned against an independent in-suite
  * formulation plus its structural invariants. */
class OpsRound6Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_cdc_apply -------------------------------------------------------

  private lazy val cdcResult =
    ops.Relational.cdcApply(spark, sfDir)
      .as[(Long, Double, String)].collect()
  private lazy val origPrice: Map[Long, Double] =
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_totalprice").as[(Long, Double)]
      .collect().toMap

  test("q_cdc_apply: deletes drop, inserts land, untouched keys keep") {
    val byKey = cdcResult.map(r => r._1 -> r).toMap
    assert(byKey.size === cdcResult.length) // key-unique output
    origPrice.keys.foreach { k =>
      (k % 10) match {
        case 2 | 3 => assert(!byKey.contains(k), s"deleted key $k present")
        case 8 | 9 =>
          assert(byKey(k)._2 === origPrice(k) && byKey(k)._3 === "N",
            s"insert $k wrong")
        case 4 | 5 | 6 | 7 =>
          assert(byKey(k)._2 === origPrice(k), s"untouched $k changed")
        case _ => ()
      }
    }
  }

  test("q_cdc_apply: latest sequence wins over earlier updates") {
    val byKey = cdcResult.map(r => r._1 -> r).toMap
    origPrice.keys.foreach { k =>
      (k % 10) match {
        // seq-2 update (+200) must override the seq-1 update (+100)
        case 0 => assert(byKey(k)._2 === origPrice(k) + 200.0)
        case 1 => assert(byKey(k)._2 === origPrice(k) + 100.0)
        case _ => ()
      }
    }
  }

  // ---- q_agg_skew_salted -------------------------------------------------

  test("q_agg_skew_salted equals the plain one-stage groupBy") {
    val salted = ops.Skew.aggSkewSalted(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val plain = Tables(spark, sfDir, "events")
      .select(when($"user_id" % 10 < 7, lit("hot"))
        .otherwise(concat(lit("u"), $"user_id")).as("k"), $"value")
      .groupBy($"k")
      .agg(count(lit(1)).as("n"),
        sum(Det.dec($"value")).cast("double").as("sum_value"))
      .orderBy($"k")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted === plain)
  }

  test("q_agg_skew_salted plans two aggregation exchanges (key+salt, key)") {
    val plan = finalPlan(ops.Skew.aggSkewSalted(spark, sfDir))
    val finalSection = plan.split("Initial Plan").head
    // partial/final HashAggregate pairs for each stage → 4 aggregates
    assert("HashAggregate".r.findAllIn(finalSection).size >= 4, plan)
  }

  // ---- q_events_wau ------------------------------------------------------

  test("q_events_wau matches the range-join formulation and bounds dau") {
    val wau = ops.Analytics.eventsWau(spark, sfDir)
      .as[(java.sql.Date, Long)].collect().toSeq
    val ud = Tables(spark, sfDir, "events")
      .select(to_date($"ts").as("d"), $"user_id").distinct()
    val byRangeJoin = ud.select($"d".as("day")).distinct()
      .join(ud, ud("d").between(date_sub($"day", 6), $"day"))
      .groupBy($"day").agg(countDistinct($"user_id").as("wau"))
      .orderBy($"day").as[(java.sql.Date, Long)].collect().toSeq
    assert(wau === byRangeJoin)
    val dau = ud.groupBy($"d".as("day"))
      .agg(countDistinct($"user_id").as("dau"))
      .as[(java.sql.Date, Long)].collect().toMap
    wau.foreach { case (day, w) => assert(w >= dau(day)) }
  }

  // ---- q_dedup_embedding_incr --------------------------------------------

  test("q_dedup_embedding_incr is exactly the cross-split slice of the ANN key") {
    val incr = ops.LlmOps.dedupEmbeddingIncremental(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    // sides are pure: batch left, corpus right — never batch² / corpus²
    incr.foreach { case (b, c, _) =>
      assert(b % 20 == 0 && c % 20 != 0)
    }
    // the pair set (unordered) equals the ANN result restricted to
    // pairs straddling the batch/corpus split — same cells, same
    // verify, so this is an exact equality, not a recall bound
    val ann = ops.LlmOps.dedupEmbeddingAnn(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val annCross = ann.collect {
      case (a, b, s) if (a % 20 == 0) != (b % 20 == 0) =>
        (math.min(a, b), math.max(a, b), s)
    }.toSet
    val incrUnordered = incr.map { case (b, c, s) =>
      (math.min(b, c), math.max(b, c), s)
    }.toSet
    assert(incrUnordered === annCross)
  }

  // ---- q_dedup_priority --------------------------------------------------

  test("q_dedup_priority keeps the (priority, doc_id)-minimal copy per text") {
    val kept = ops.LlmOps.dedupPriority(spark, sfDir)
      .as[(Long, String, Long)].collect().toSeq
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"source", $"text").as[(Long, String, String)]
      .collect().toSeq
    def prio(src: String) = src.drop(3).toInt % 3
    val expected = docs.groupBy(_._3).map { case (_, rows) =>
      val win = rows.minBy { case (id, src, _) => (prio(src), id) }
      (win._1, win._2, rows.size.toLong)
    }.toSeq.sortBy(_._1)
    assert(kept === expected)
    assert(kept.map(_._3).sum === docs.size) // every copy accounted for
  }

  // ---- q_dedup_winnow ----------------------------------------------------

  test("q_dedup_winnow: sparse index, valid similarities, exact on clones") {
    // the sparsity claim: selected fingerprints are a strict minority
    // of the full gram stream (the w=4 winnowing guarantee ⇒ ≈1/4)
    val stats = ops.LlmOps.textWinnow(spark, sfDir)
      .agg(sum($"n_selected").cast("long"), sum($"n_grams").cast("long"))
      .as[(Long, Long)].collect().head
    assert(stats._1 * 2 < stats._2,
      s"selected ${stats._1} of ${stats._2} grams — not sparse")
    ops.LlmOps.dedupWinnow(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().foreach {
        case (a, b, common, wj) =>
          assert(a < b && common > 0 && wj >= 0.5 && wj <= 1.0)
      }
    // two identical documents must pair at exactly 1.0
    val dir = java.nio.file.Files.createTempDirectory("graft_wn").toString
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq((1L, text, "en", "src1", text.length.toLong),
        (2L, text, "en", "src2", text.length.toLong),
        (3L, "completely different words entirely here now", "en",
          "src3", 44L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = ops.LlmOps.dedupWinnow(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2, p._4)) === Seq((1L, 2L, 1.0)))
  }

  // ---- q_events_anomaly --------------------------------------------------

  test("q_events_anomaly: z-scores recompute from the daily grid") {
    val rows = ops.Analytics.eventsAnomaly(spark, sfDir)
      .select($"event_type", $"day", $"revenue", $"mean7", $"sd7", $"z",
        $"is_anomaly")
      .as[(String, java.sql.Date, Double, Double, Double, Option[Double],
        Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, rev, mean7, sd7, z, anom) =>
      z match {
        case Some(zv) =>
          assert(sd7 > 0)
          assert(math.abs(zv - math.floor((rev - mean7) / sd7 * 1e4 + 0.5) / 1e4)
            < 1e-9 || math.abs(zv - (rev - mean7) / sd7) < 1e-3)
          assert(anom === (math.abs(zv) > 2.0))
        case None =>
          assert(!anom)
      }
    }
    // the frame is strictly historical: the first 3 days per type are
    // excluded (n_prior >= 3 needs at least 3 PRIOR days)
    val firstDays = Tables(spark, sfDir, "events")
      .groupBy($"event_type").agg(min(to_date($"ts")).as("d0"))
      .as[(String, java.sql.Date)].collect().toMap
    rows.foreach { case (tp, day, _, _, _, _, _) =>
      assert(day.toLocalDate.isAfter(
        firstDays(tp).toLocalDate.plusDays(2)))
    }
  }

  // ---- q_source_time_travel ----------------------------------------------

  test("q_source_time_travel: as-of reads are partition-pruned snapshots") {
    val df = sources.Sources.sourceTimeTravel(spark, sfDir)
    val plan = finalPlan(df)
    // each as-of branch must push its generation into PartitionFilters
    // (a pruned snapshot scan, not a filter over the whole history)
    assert("PartitionFilters:[^\\n]*gen[^\\n]* = 1".r
      .findFirstIn(plan).nonEmpty, plan)
    assert("PartitionFilters:[^\\n]*gen[^\\n]* = 2".r
      .findFirstIn(plan).nonEmpty, plan)
    // generation 2 dropped the %10 in {2,3} keys: strictly fewer rows
    val n = df.groupBy($"generation")
      .agg(sum($"n").cast("long").as("rows"))
      .as[(Int, Long)].collect().toMap
    assert(n(2) < n(1) && n(2) > 0)
  }

  // ---- q_table_fingerprint -----------------------------------------------

  test("q_table_fingerprint is layout-independent and content-sensitive") {
    val base = ops.Quality.tableFingerprint(spark, sfDir)
      .as[(String, Long, BigDecimal, Long)].collect().toSeq

    // layout independence: rewrite the corpus shuffled into many small
    // files; the fingerprint of every table must not move
    val dir = java.nio.file.Files.createTempDirectory("graft_fp").toString
    Tables.names.foreach { t =>
      val df = spark.read.parquet(s"$sfDir/$t.parquet")
      df.repartition(7, pmod(hash(df.columns.map(col): _*), lit(7)))
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val shuffled = ops.Quality.tableFingerprint(spark, dir)
      .as[(String, Long, BigDecimal, Long)].collect().toSeq
    assert(shuffled === base)

    // content sensitivity: editing ONE row's payload moves both the
    // sum and the xor fingerprint of exactly that table. Fresh dir —
    // overwriting in place would invalidate the Tables plan cache's
    // file listing for `dir`.
    val dir2 = java.nio.file.Files.createTempDirectory("graft_fp2").toString
    Seq("orders", "lineitem").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir2/$t.parquet")
    }
    spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("text",
        when($"doc_id" === 0, concat($"text", lit("!"))).otherwise($"text"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val edited = ops.Quality.tableFingerprint(spark, dir2)
      .as[(String, Long, BigDecimal, Long)].collect()
      .map(r => r._1 -> r).toMap
    val baseMap = base.map(r => r._1 -> r).toMap
    assert(edited("documents")._2 === baseMap("documents")._2) // same rows
    assert(edited("documents")._3 !== baseMap("documents")._3)
    assert(edited("documents")._4 !== baseMap("documents")._4)
    assert(edited("orders") === baseMap("orders"))
    assert(edited("lineitem") === baseMap("lineitem"))
  }

  // ---- q_events_transitions ----------------------------------------------

  test("q_events_transitions: mass conservation and conditional rows") {
    val rows = ops.Analytics.eventsTransitions(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // Σ n over the grid = Σ_users (events_user - 1): every adjacency
    // counted exactly once
    val perUser = Tables(spark, sfDir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    assert(rows.map(_._3).sum === perUser.map(_._2 - 1).sum)
    // P(next | prev) sums to 1 per prev
    rows.groupBy(_._1).values.foreach { g =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  // ---- q_graph_triangles -------------------------------------------------

  test("q_graph_triangles matches a driver-side naive enumeration") {
    val und = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select(least($"vec_id", $"nbr_id").as("lo"),
        greatest($"vec_id", $"nbr_id").as("hi"))
      .distinct().as[(Long, Long)].collect().toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = und.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val want = scala.collection.mutable.Map[Long, Long]()
    for ((a, b) <- und; c <- adj.getOrElse(b, Set.empty[Long])
         if und((a, c))) { // a < b < c by construction of (lo, hi)
      Seq(a, b, c).foreach(n => want(n) = want.getOrElse(n, 0L) + 1L)
    }
    val got = ops.LlmOps.graphTriangles(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    assert(got === want.toMap)
    assert(got.nonEmpty, "corpus kNN graph should close some triangles")
  }

  // ---- q_text_segment_clean ----------------------------------------------

  test("q_text_segment_clean keeps exactly one copy of every segment") {
    val rows = ops.LlmOps.textSegmentClean(spark, sfDir)
      .as[(Long, Long, Long, String)].collect().toSeq
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    assert(rows.map(_._1) === docs.map(_._1).sorted)
    // driver replay: global first-occurrence over (doc_id, seg_idx)
    val segsByDoc = docs.sortBy(_._1).map { case (id, text) =>
      id -> text.split(" ", -1).grouped(10).map(_.mkString(" ")).toVector
    }
    val seen = scala.collection.mutable.Set[String]()
    val wantKept = segsByDoc.map { case (id, segs) =>
      id -> segs.filter(seen.add)
    }.toMap
    rows.foreach { case (id, nSegs, nKept, clean) =>
      assert(nSegs === segsByDoc.toMap.apply(id).size)
      assert(nKept === wantKept(id).size)
      assert(clean === wantKept(id).mkString(" "))
      assert(nKept <= nSegs)
    }
    // total kept = number of DISTINCT segments corpus-wide
    assert(rows.map(_._3).sum === seen.size)
    assert(rows.exists(r => r._3 < r._2),
      "corpus should contain at least one repeated segment")
  }

  // ---- q_sim_hybrid_rrf --------------------------------------------------

  test("q_sim_hybrid_rrf fuses the two channel rankings exactly") {
    val sparse = ops.LlmOps.textBm25(spark, sfDir)
      .select($"doc_id", $"bm25").as[(Long, Double)].collect().toSeq
      .sortBy { case (id, s) => (-s, id) }.map(_._1).zipWithIndex
      .map { case (id, i) => id -> (i + 1) }.toMap
    val dense = ops.LlmOps.simCosineTopk(spark, sfDir)
      .as[(Long, Double)].collect().toSeq // top-10 of the same ordering
    val got = ops.LlmOps.simHybridRrf(spark, sfDir)
      .as[(Long, Option[Int], Option[Int], Double)].collect().toSeq
    assert(got.size === 10)
    got.foreach { case (id, rs, rd, rrf) =>
      assert(rs.nonEmpty || rd.nonEmpty)
      rs.foreach(r => assert(sparse(id) === r))
      rd.foreach(r => assert(r >= 1 && r <= 20))
      val want = rs.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - want) < 1e-4)
    }
    // dense ranks agree with the brute-force top-10 prefix
    dense.zipWithIndex.foreach { case ((id, _), i) =>
      got.find(_._1 == id).flatMap(_._3).foreach(r => assert(r === i + 1))
    }
    // fused order is non-increasing in rrf with doc_id tiebreak
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1))
    case _ => ()
    }
  }

  // ---- q_dedup_semantic_keep ---------------------------------------------

  test("q_dedup_semantic_keep matches a driver-side union-find over ANN pairs") {
    val pairs = ops.LlmOps.dedupEmbeddingAnn(spark, sfDir)
      .select($"vec_a", $"vec_b").as[(Long, Long)].collect().toSeq
    val vecs = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"label").as[(Long, Int)].collect().toSeq
    val parent = scala.collection.mutable.Map(vecs.map(v => v._1 -> v._1): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val comp = vecs.map(v => v._1 -> find(v._1)).toMap
    val sizes = comp.values.groupBy(identity).view.mapValues(_.size.toLong)
    val want = vecs.filter(v => comp(v._1) == v._1)
      .map(v => (v._1, v._2, sizes(v._1))).sortBy(_._1)
    val got = ops.LlmOps.dedupSemanticKeep(spark, sfDir)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got === want)
    // every vector is accounted for exactly once across kept clusters
    assert(got.map(_._3).sum === vecs.size)
    assert(got.exists(_._3 > 1), "some semantic cluster should be non-trivial")
  }

  test("ANN pair MINING plan stays BNL-free with SHUFFLE_HASH verify") {
    // the declared keys consume the memoized pairs, so the sweep sees a
    // scan — this pins the LIVE mining plan instead
    val plan = finalPlan(ops.LlmOps.mineAnnPairs(spark, sfDir))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
    assert(plan.contains("ShuffledHashJoin"), plan.take(600))
  }

  // ---- q_delete_rewrite --------------------------------------------------

  test("q_delete_rewrite prunes untouched file groups and drops victims") {
    val summary = sources.Sources.deleteRewrite(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    // content: exactly the victims gone
    val want = Tables(spark, sfDir, "orders")
      .filter(!$"o_orderkey".between(200, 499))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        Det.dsum($"o_totalprice").as("s"))
      .orderBy($"o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    assert(summary === want)
    // surgical rewrite: ONLY fg=0 was rewritten — every other group is
    // served from its original landed directory
    val root = java.nio.file.Paths.get(
      s"${ops.Relational.scratchRoot}/delete_rewrite")
    val rewritten = java.nio.file.Files.list(root.resolve("rewritten"))
      .toArray.map(_.toString).filter(_.contains("fg="))
    assert(rewritten.map(_.split("fg=").last.toLong).toSeq === Seq(0L))
    val untouched = java.nio.file.Files.list(root.resolve("table"))
      .toArray.map(_.toString).filter(_.contains("fg="))
      .filterNot(_.endsWith("fg=0"))
    assert(untouched.nonEmpty)
    // and the committed view really reads those original files
    val after = spark.read.parquet(
      s"${ops.Relational.scratchRoot}/delete_rewrite/table")
    val plan = finalPlan(after.filter(!$"fg".between(0, 0)))
    assert(plan.contains("PartitionFilters"), plan)
  }

  // ---- q_basket_pairs ----------------------------------------------------

  test("q_basket_pairs: supports and lift recompute from the baskets") {
    val got = ops.Analytics.basketPairs(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.size === 20)
    val baskets = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .as[(Long, Long)].collect().toSeq
    val nOrders = Tables(spark, sfDir, "orders").count()
    val itemN = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val supp = baskets.groupBy(_._1).values.flatMap { items =>
      val v = items.map(_._2).toSeq.sorted
      for (i <- v.indices; j <- (i + 1) until v.size) yield (v(i), v(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (a, b, s, lift) =>
      assert(a < b && s >= 3)
      assert(supp((a, b)) === s)
      val wantLift = (s * nOrders).toDouble / (itemN(a) * itemN(b))
      assert(lift === wantLift)
    }
    // top-20 really is the support-descending head
    val cut = got.map(_._3).min
    assert(supp.values.count(_ > cut) <= 20)
  }

  // ---- q_events_churn ----------------------------------------------------

  test("q_events_churn: conservation against the (user, week) activity set") {
    val got = ops.Analytics.eventsChurn(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty)
    val uw = Tables(spark, sfDir, "events")
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("w"))
      .distinct().as[(Long, java.sql.Date)].collect().toSeq
    val byUser = uw.groupBy(_._1).view
      .mapValues(_.map(_._2.toLocalDate).sortBy(_.toEpochDay)).toMap
    val wantChurn = uw.map { case (u, w0) =>
      val w = w0.toLocalDate
      val later = byUser(u).filter(_.isAfter(w))
      (w0, later.isEmpty || later.head.isAfter(w.plusDays(7)))
    }.groupBy(_._1).view.mapValues(v =>
      (v.size.toLong, v.count(_._2).toLong)).toMap
    got.foreach { case (week, active, churned, rate) =>
      val (wa, wc) = wantChurn(week)
      assert(active === wa && churned === wc)
      assert(rate === wc.toDouble / wa)
    }
    assert(got.map(_._2).sum === uw.size)
    // the corpus's final week churns everyone by construction
    assert(got.last._3 === got.last._2 && got.last._4 === 1.0)
  }

  // ---- q_delete_vectors --------------------------------------------------

  test("q_delete_vectors: scattered tombstones merge out on read") {
    val got = sources.Sources.deleteVectors(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    val want = Tables(spark, sfDir, "orders")
      .filter($"o_orderkey" % 10 =!= 3)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), Det.dsum($"o_totalprice").as("s"))
      .orderBy($"o_orderstatus")
      .as[(String, Long, Double)].collect().toSeq
    assert(got === want)
    // the data files were NOT rewritten: the landed table still holds
    // every key, tombstones live in their own small sidecar
    val root = s"${ops.Relational.scratchRoot}/delete_mor"
    assert(spark.read.parquet(s"$root/table").count() ===
      Tables(spark, sfDir, "orders").count())
    val nTomb = spark.read.parquet(s"$root/tombstones").count()
    assert(nTomb > 0 && nTomb ===
      Tables(spark, sfDir, "orders")
        .filter($"o_orderkey" % 10 === 3).count())
  }

  // ---- q_customer_rfm ----------------------------------------------------

  test("q_customer_rfm: segments recompute from per-customer medians") {
    val cust = Tables(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg(datediff(to_date(max($"o_orderdate")), lit("1970-01-01"))
          .cast("long").as("r"),
        count(lit(1)).as("f"),
        Det.dsum($"o_totalprice").as("m"))
      .as[(Long, Long, Long, Double)].collect().toSeq
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      val pos = (n - 1) * 0.5
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val (mr, mf, mm) = (median(cust.map(_._2.toDouble)),
      median(cust.map(_._3.toDouble)), median(cust.map(_._4)))
    val want = cust.groupBy { c =>
      (if (c._2 > mr) "R+" else "R-") + (if (c._3 > mf) "F+" else "F-") +
        (if (c._4 > mm) "M+" else "M-")
    }.view.mapValues(g => (g.size.toLong,
      g.map(c => BigDecimal(c._4).setScale(4)).sum.toDouble)).toMap
    val got = ops.Analytics.customerRfm(spark, sfDir)
      .as[(String, Long, Double)].collect().toSeq
    assert(got.map(_._1) === got.map(_._1).sorted)
    got.foreach { case (seg, n, rev) =>
      val (wn, wrev) = want(seg)
      assert(n === wn, seg)
      assert(math.abs(rev - wrev) < 1e-6, seg)
    }
    assert(got.map(_._2).sum === cust.size)
  }

  // ---- q_agg_histogram ---------------------------------------------------

  test("q_agg_histogram: bins partition the value range exactly") {
    val got = ops.Aggregates.aggHistogram(spark, sfDir)
      .as[(Int, Long, Double, Double)].collect().toSeq
    val vals = Tables(spark, sfDir, "events")
      .select($"value").as[Double].collect().toSeq
    val (vmin, vmax) = (vals.min, vals.max)
    val w = (vmax - vmin) / 10.0
    val want = vals.groupBy(v =>
      math.min(math.floor((v - vmin) / w), 9).toInt)
      .view.mapValues(_.size.toLong).toMap
    assert(got.map(g => g._1 -> g._2).toMap === want)
    assert(got.map(_._2).sum === vals.size)
    got.foreach { case (bin, _, lo, hi) =>
      assert(lo < hi && bin >= 0 && bin <= 9)
    }
  }

  // ---- q_text_pmi --------------------------------------------------------

  test("q_text_pmi matches a driver-side skip-gram replay") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"text").as[String].collect().toSeq
    val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
    val uni = scala.collection.mutable.Map[String, Long]()
    docs.foreach { text =>
      val t = text.split(" ", -1)
      t.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1L)
      for (i <- t.indices; d <- 1 to 2 if i + d < t.length) {
        val k = if (t(i) <= t(i + d)) (t(i), t(i + d)) else (t(i + d), t(i))
        pairCounts(k) = pairCounts.getOrElse(k, 0L) + 1L
      }
    }
    val tTotal = uni.values.sum
    val pTotal = pairCounts.values.sum
    val want = pairCounts.toSeq.collect { case ((a, b), nab) if nab >= 5 =>
      val pmi = math.log(
        nab.toDouble * tTotal * tTotal /
          (pTotal.toDouble * uni(a) * uni(b)))
      (a, b, nab,
        BigDecimal(pmi).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
    val got = ops.LlmOps.textPmi(spark, sfDir)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  // ---- q_agg_hll_rollup --------------------------------------------------

  test("q_agg_hll_rollup: merged estimate = direct sketch, error bounded") {
    val rows = ops.Aggregates.aggHllRollup(spark, sfDir)
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.nonEmpty && rows.exists(_._1 == "ALL"))
    rows.foreach { case (day, est, exact) =>
      assert(math.abs(est - exact).toDouble / exact <= 0.05,
        s"$day: est $est vs exact $exact")
    }
    // union of daily sketches ≡ one direct sketch over all events
    // (register-wise max is associative) — the mergeability claim
    val direct = Tables(spark, sfDir, "events")
      .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("est"))
      .as[Long].collect().head
    assert(rows.find(_._1 == "ALL").get._2 === direct)
  }

  // ---- q_join_asof_tolerance ---------------------------------------------

  test("q_join_asof_tolerance = as-of with stale matches nulled") {
    val base = ops.Relational.joinAsof(spark, sfDir)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSeq
    val got = ops.Relational.joinAsofTolerance(spark, sfDir)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp])]
      .collect().toSeq
    val want = base.map { case (id, u, ts, click) =>
      (id, u, ts,
        click.filter(c => ts.getTime - c.getTime <= 10 * 60 * 1000))
    }
    assert(got === want)
    // the bound actually bites on this corpus: some match is dropped
    assert(got.count(_._4.isEmpty) > base.count(_._4.isEmpty))
  }

  // ---- q_fingerprint_incremental -----------------------------------------

  test("q_fingerprint_incremental merge equals the direct fingerprint") {
    val inc = ops.Quality.fingerprintIncremental(spark, sfDir)
      .as[(String, Long, BigDecimal, Long)].collect().head
    val direct = ops.Quality.tableFingerprint(spark, sfDir)
      .filter($"table_name" === "orders")
      .as[(String, Long, BigDecimal, Long)].collect().head
    assert(inc === direct)
  }

  // ---- q_spatial_cone / q_spatial_zones_join -----------------------------

  test("q_spatial_cone pushes the bounding box into the parquet scan") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = ops.Spatial.spatialCone(spark, sfDir)
    df.collect()
    // read the scan's PushedFilters from the node metadata — the plan
    // STRING truncates the filter list at an arbitrary position
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val pushed = scans(df.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("PushedFilters", "")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ra,155.0)"), pushed)
    assert(pushed.contains("LessThanOrEqual(ra,205.0)"), pushed)
    assert(pushed.contains("GreaterThanOrEqual(dec,-25.0)"), pushed)
    // every returned row is genuinely inside the cone
    df.as[(Long, Double, Double, Double)].collect().foreach {
      case (_, ra, dec, d2) =>
        val dra = math.min(math.abs(ra - 180.0), 360.0 - math.abs(ra - 180.0))
        assert(dra * dra + dec * dec <= 625.0 + 1e-9)
        assert(d2 <= 625.0001)
    }
  }

  test("q_spatial_zones_join equals the all-pairs crossmatch (band lossless)") {
    val got = ops.Spatial.spatialZonesJoin(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    // naive all-pairs replay over the derived catalogs
    val a = ops.Spatial.partCatalog(spark, sfDir)
      .as[(Long, Double, Double)].collect()
    val b = Tables(spark, sfDir, "supplier")
      .select($"s_suppkey", ($"s_suppkey" * 211.7) % 360.0,
        ($"s_suppkey" * 53.77) % 120.0 - 60.0)
      .as[(Long, Double, Double)].collect()
    val want = (for {
      (ai, ara, adec) <- a; (bi, bra, bdec) <- b
      dra = math.min(math.abs(ara - bra), 360.0 - math.abs(ara - bra))
      d2 = dra * dra + (adec - bdec) * (adec - bdec)
      if d2 <= 9.0
    } yield (ai, bi)).toSeq.sorted
    assert(got.map(p => (p._1, p._2)).sorted === want)
    assert(got.nonEmpty)
    got.foreach { case (_, _, d2) => assert(d2 >= 0.0 && d2 <= 9.0001) }
  }

  // ---- q_pipeline_curation_v2 --------------------------------------------

  test("q_pipeline_curation_v2 matches a driver-side stage-by-stage replay") {
    val passedIds = ops.Quality.qualityGopher(spark, sfDir)
      .filter($"passes").select($"doc_id").as[Long].collect().toSet
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"source", $"text")
      .as[(Long, String, String, String)].collect().toSeq
      .filter(d => passedIds(d._1)).sortBy(_._1)
    // segment rewrite WITHIN the survivors
    val seen = scala.collection.mutable.Set[String]()
    val cleaned = docs.map { case (id, lang, src, text) =>
      val segs = text.split(" ", -1).grouped(10).map(_.mkString(" ")).toVector
      val kept = segs.filter(seen.add)
      (id, lang, src, segs.size, kept.size, kept.mkString(" "))
    }
    val majority = cleaned.filter(c => c._5 * 2 > c._4)
    // exact dedup of the rewritten text, min doc_id canonical
    val canon = majority.groupBy(_._6).map(_._2.minBy(_._1)._1).toSet
    val fin = majority.filter(c => canon(c._1))
    val want = fin.groupBy(c => (c._2, c._3)).map { case ((lang, src), g) =>
      (lang, src, g.size.toLong,
        g.map(_._6.split(" ", -1).length.toLong).sum)
    }.toSeq.sortBy(t => (t._1, t._2))
    val got = ops.LlmOps.pipelineCurationV2(spark, sfDir)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    // the gates actually bite: fewer docs than passed, fewer than total
    assert(got.map(_._3).sum < passedIds.size)
  }

  // ---- q_agg_mode / q_events_pop -----------------------------------------

  test("q_agg_mode: pinned tie-break matches a driver-side histogram") {
    val got = ops.Aggregates.aggMode(spark, sfDir)
      .as[(String, Int, Long)].collect().toSeq
    val counts = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_quantity".cast("int"))
      .as[(String, Int)].collect().toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (flag, qty, n) =>
      assert(counts((flag, qty)) === n)
      val better = counts.collect {
        case ((f, q), c) if f == flag && (c > n || (c == n && q < qty)) => q
      }
      assert(better.isEmpty, s"$flag: $better beats ($qty, $n)")
    }
    assert(got.map(_._1) === got.map(_._1).sorted && got.nonEmpty)
  }

  test("q_events_pop: pct change recomputes from the daily grid") {
    val rows = ops.Analytics.eventsPop(spark, sfDir)
      .as[(String, java.sql.Date, Double, Option[Double], Option[Double])]
      .collect().toSeq
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.values.foreach { g =>
      val s = g.sortBy(_._2.toLocalDate.toEpochDay)
      assert(s.head._4.isEmpty && s.head._5.isEmpty) // first day: no prior
      s.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._4.contains(a._3))
          val want = BigDecimal((b._3 - a._3) / a._3)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          assert(b._5.contains(want))
        case _ => ()
      }
    }
  }

  // ---- q_spatial_best_match ----------------------------------------------

  test("q_spatial_best_match is the per-object argmin of the pair report") {
    val pairs = ops.Spatial.spatialZonesJoin(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    val want = pairs.groupBy(_._1).map { case (a, g) =>
      val best = g.minBy(p => (p._3, p._2))
      (a, best._2, best._3)
    }.toSeq.sortBy(_._1)
    val got = ops.Spatial.spatialBestMatch(spark, sfDir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.map(_._1).distinct.size === got.size) // one row per object
  }

  // ---- q_embed_outliers --------------------------------------------------

  test("q_embed_outliers: distances and flags recompute from centroids") {
    val rows = ops.LlmOps.embedOutliers(spark, sfDir)
      .as[(Long, Int, Double, Boolean)].collect().toSeq
    val vecs = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding")
      .as[(Long, Int, Array[Float])].collect().toSeq
    assert(rows.map(_._1) === vecs.map(_._1).sorted)
    val cent = vecs.groupBy(_._2).view.mapValues { g =>
      val n = g.size
      (0 until 64).map(i =>
        (g.map(v => BigDecimal(v._3(i).toDouble).setScale(10,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / n)).toArray
    }.toMap
    val d2ById = vecs.map { case (id, label, e) =>
      val c = cent(label)
      var acc = 0.0
      (0 until 64).foreach { i =>
        val t = e(i).toDouble - c(i); acc += t * t
      }
      id -> acc
    }.toMap
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val pos = (s.size - 1) * 0.5
      val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
      lo + (hi - lo) * (pos - pos.toInt)
    }
    val medByLabel = vecs.groupBy(_._2).view
      .mapValues(g => median(g.map(v => d2ById(v._1)))).toMap
    rows.foreach { case (id, label, d2r, flag) =>
      assert(math.abs(d2r - d2ById(id)) < 1e-3, id)
      assert(flag === (d2ById(id) > medByLabel(label) * 4), id)
    }
    // exactly half-ish of each label sits below its median — the
    // threshold is rank-anchored, so SOME flags must be false
    assert(rows.exists(!_._4))
  }

  // ---- q_events_journeys -------------------------------------------------

  test("q_events_journeys: session paths replay from the raw stream") {
    val got = ops.Analytics.eventsJourneys(spark, sfDir)
      .as[(String, Long)].collect().toSeq
    assert(got.size === 10)
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect().toSeq
    val paths = ev.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      s.foreach { e =>
        if (prev != Long.MinValue && e._2 - prev > 1800000000L)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4
        prev = e._2
      }
      sessions.map(_.mkString(">"))
    }.toSeq
    val want = paths.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case (p, n) => (p, n) }
      .sortBy { case (p, n) => (-n, p) }.take(10)
    assert(got === want)
    // journeys and the histogram key must agree on the session count
    val histo = ops.Analytics.sessionizeGap(spark, sfDir)
      .agg(sum($"n_sessions").cast("long")).as[Long].collect().head
    assert(paths.size.toLong === histo)
  }

  // ---- q_quality_gopher --------------------------------------------------

  test("q_quality_gopher: verdicts recompute from the features") {
    val rows = ops.Quality.qualityGopher(spark, sfDir)
      .as[(Long, Int, Double, Int, Double, Boolean, Boolean, Boolean,
        Boolean, Boolean)].collect().toSeq
    assert(rows.nonEmpty)
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, nw, mwl, nstop, ttr, okW, okM, okS, okT, p) =>
      val toks = docs(id).split(" ").filter(_.nonEmpty)
      assert(nw === toks.length)
      assert(nstop === toks.count(t => t == "a" || t == "the"))
      val mwlRaw = toks.map(_.length).sum.toDouble / toks.length
      val ttrRaw = toks.distinct.length.toDouble / toks.length
      assert(math.abs(mwl - mwlRaw) < 1e-4 && math.abs(ttr - ttrRaw) < 1e-4)
      assert(okW === (nw >= 20 && nw <= 90))
      assert(okM === (mwlRaw >= 4.0 && mwlRaw <= 5.0))
      assert(okS === (nstop >= 1))
      assert(okT === (ttrRaw >= 0.4))
      assert(p === (okW && okM && okS && okT))
    }
    // the rules discriminate on this corpus: both outcomes occur
    assert(rows.exists(_._10) && rows.exists(!_._10))
  }
}
