package graft

import org.apache.spark.sql.functions._

/** Round-9 additions: gaps-and-islands, OHLC resampling, directional
  * association rules, null-safe join, TPC-H Q3 shape, bitmap exact
  * distinct, k-anonymity audit, balanced sampling, embedding health,
  * curriculum staging, transformWithState latest-wins, and gap
  * percentiles. Each is pinned either against an independent
  * formulation of its definition or against the structural invariant
  * the operator exists to guarantee (the DuckDB oracle gate covers the
  * value-level hash for all twelve). */
class OpsRound9Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_agg_bitmap_distinct --------------------------------------------

  test("bitmap distinct rollup equals the built-in count(distinct)") {
    val got = ops.Aggregates.aggBitmapDistinct(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val want = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === want)
    assert(got.values.sum > 0)
  }

  // ---- q_join_null_safe --------------------------------------------------

  test("null-safe join plans a hash join (never a nested loop) and " +
    "matches the null group") {
    val df = ops.Relational.joinNullSafe(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash-based join, got:\n$plan")
    assert(!plan.contains("NestedLoop"), s"nested loop in:\n$plan")
    val rows = df.as[(Option[String], Long, Long, Double)].collect()
    // the nullified group ('1-URGENT' → null) must appear AND match
    val nullRow = rows.find(_._1.isEmpty)
    assert(nullRow.nonEmpty, "null key group missing — null-safe match failed")
    // self-census invariant: every group's n_orders equals its dim_n
    rows.foreach { case (k, n, dimN, _) => assert(n === dimN, s"group $k") }
  }

  // ---- q_win_gap_islands -------------------------------------------------

  test("island lengths sum back to the distinct (user, day) count") {
    val isl = ops.Analytics.winGapIslands(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val totalDays = Tables(spark, sfDir, "events")
      .select($"user_id", to_date($"ts")).distinct().count()
    assert(isl.map(r => r._1 * r._2).sum === totalDays)
    assert(isl.map(_._1).distinct.length === isl.length, "dup lengths")
  }

  // ---- q_ts_ohlc ---------------------------------------------------------

  test("OHLC bars: open/close picked by the (ts, event_id) total order") {
    val bars = ops.Analytics.tsOhlc(spark, sfDir)
      .as[(java.sql.Date, String, Double, Double, Double, Double, Long,
        Double)].collect()
    assert(bars.nonEmpty)
    bars.foreach { case (d, tp, o, h, l, c, vol, _) =>
      assert(l <= o && o <= h, s"open outside [low, high] for $d/$tp")
      assert(l <= c && c <= h, s"close outside [low, high] for $d/$tp")
      assert(vol >= 1)
    }
    // volumes sum to the event count — every event lands in one bar
    assert(bars.map(_._7).sum ===
      Tables(spark, sfDir, "events").count())
    // independent replay of one bar's open/close via a driver sort
    val (d0, t0) = (bars.head._1, bars.head._2)
    val evs = Tables(spark, sfDir, "events")
      .filter(to_date($"ts") === lit(d0) && $"event_type" === t0)
      .select($"ts", $"event_id", $"value")
      .as[(java.sql.Timestamp, Long, Double)].collect()
      .sortBy(e => (e._1.getTime, e._2))
    assert(bars.head._3 === evs.head._3, "open mismatch")
    assert(bars.head._6 === evs.last._3, "close mismatch")
  }

  // ---- q_basket_rules ----------------------------------------------------

  test("rule confidence is support/count(ante) and both directions of " +
    "a pair share support") {
    val rules = ops.Analytics.basketRules(spark, sfDir)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rules.nonEmpty)
    val itemN = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
      .groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .as[(Long, Long)].collect().toMap
    rules.foreach { case (a, _, s, conf, _) =>
      assert(conf === s.toDouble / itemN(a))
      assert(conf > 0.0 && conf <= 1.0)
    }
  }

  // ---- q_sample_balanced -------------------------------------------------

  test("balanced sample keeps exactly min-class-size docs per class, " +
    "deterministically") {
    val sel = ops.LlmOps.sampleBalanced(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    val classN = Tables(spark, sfDir, "documents")
      .groupBy($"lang").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    val cap = classN.values.min
    assert(sel.length === classN.size, "a class vanished")
    sel.foreach { case (lang, n, _, _) => assert(n === cap, s"class $lang") }
    // second run = identical member checksums (determinism)
    val again = ops.LlmOps.sampleBalanced(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === sel.sortBy(_._1).toSeq)
  }

  // ---- q_mix_curriculum --------------------------------------------------

  test("curriculum stages partition the corpus and are ordered by length") {
    val stages = ops.LlmOps.mixCurriculum(spark, sfDir)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stages.map(_._1).toSeq === Seq(1, 2, 3, 4))
    assert(stages.map(_._2).sum ===
      Tables(spark, sfDir, "documents").count())
    // stage k's max length never exceeds stage k+1's min length
    stages.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._5 <= hi._4,
        s"stage ${lo._1} max ${lo._5} > stage ${hi._1} min ${hi._4}")
      case _ => ()
    }
  }

  // ---- q_state_cdc_latest ------------------------------------------------

  test("transformWithState latest-wins equals the rank-window pick") {
    import org.apache.spark.sql.expressions.Window
    val got = ops.StreamingOps.stateCdcLatest(spark, sfDir)
      .select($"user_id", $"last_event_id").as[(Long, Long)]
      .collect().sorted.toSeq
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts".desc, $"event_id".desc)
    val want = Tables(spark, sfDir, "events")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"user_id", $"event_id").as[(Long, Long)]
      .collect().sorted.toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  // ---- q_anonymize_kanon -------------------------------------------------

  test("k-anonymity audit counts reconcile with the class census") {
    val Array((nClasses, nSmall, atRisk, minK, nRows)) =
      ops.Quality.anonymizeKanon(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(nRows === Tables(spark, sfDir, "customer").count())
    assert(nSmall <= nClasses)
    assert(atRisk < nSmall * 5, "at-risk rows exceed k×small-classes bound")
    assert(minK >= 1)
  }

  // ---- q_embed_health ----------------------------------------------------

  test("embedding health: per-label counts cover the corpus and " +
    "min <= avg <= max") {
    val rows = ops.LlmOps.embedHealth(spark, sfDir)
      .as[(Int, Long, Long, Double, Long, Long)].collect()
    assert(rows.map(_._2).sum ===
      Tables(spark, sfDir, "embeddings").count())
    rows.foreach { case (l, n, nz, avg, mn, mx) =>
      assert(mn <= avg + 1e-9 && avg <= mx + 1e-9, s"label $l")
      assert(nz >= 0 && nz <= n)
    }
  }

  // ---- q_dedup_crossfield ------------------------------------------------

  test("crossfield entities match a driver union-find over both keys") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .as[(Long, String, String, String, Long)].collect()
    // independent union-find on (title-prefix, signature) alternate keys
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    docs.groupBy(d => d._2.split(" ", -1).take(4).mkString(" "))
      .values.foreach(g => g.map(_._1).sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => union(a, b); case _ => () })
    docs.groupBy(d => (d._3, d._4, d._5))
      .values.foreach(g => g.map(_._1).sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => union(a, b); case _ => () })
    val want = docs.map(_._1).groupBy(find).values
      .filter(_.length >= 2)
      .map(g => (g.min, g.length.toLong, g.sum)).toSeq.sortBy(_._1)
    val got = ops.LlmOps.dedupCrossfield(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === want)
    assert(got.nonEmpty)
  }

  // ---- q_stats_chi2 ------------------------------------------------------

  test("chi-square statistic matches a driver replay over the full grid") {
    val Array((n, nCells, chi2)) = ops.Quality.statsChi2(spark, sfDir)
      .as[(Long, Long, Double)].collect()
    val cells = Tables(spark, sfDir, "orders")
      .groupBy($"o_orderpriority", $"o_orderstatus")
      .agg(count(lit(1)).as("n")).as[(String, String, Long)].collect()
    val rt = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ct = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val total = cells.map(_._3).sum
    val obs = cells.map(c => (c._1, c._2) -> c._3).toMap
    val contribs = for { r <- rt.keys.toSeq; c <- ct.keys.toSeq } yield {
      val e = (rt(r) * ct(c)).toDouble / total
      val o = obs.getOrElse((r, c), 0L)
      (o - e) * (o - e) / e
    }
    val want = java.math.BigDecimal.valueOf(contribs.sum)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(n === total)
    assert(nCells === rt.size.toLong * ct.size)
    assert(math.abs(chi2 - want) < 2e-4, s"chi2 $chi2 vs replay $want")
  }

  // ---- q_events_overlap --------------------------------------------------

  test("period overlap counts reconcile with the user census") {
    val Array((aOnly, bOnly, both, nUsers, jac)) =
      ops.Analytics.eventsOverlap(spark, sfDir)
        .as[(Long, Long, Long, Long, Double)].collect()
    assert(nUsers ===
      Tables(spark, sfDir, "events").select($"user_id").distinct().count())
    assert(aOnly + bOnly + both <= nUsers)
    assert(jac === both.toDouble / (aOnly + bOnly + both))
  }

  // ---- q_embed_dim_drift -------------------------------------------------

  test("dim drift covers all 64 lanes and drift = |mean_lo - mean_hi|") {
    val rows = ops.LlmOps.embedDimDrift(spark, sfDir)
      .as[(Int, Double, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq === (1 to 64))
    rows.foreach { case (d, lo, hi, drift) =>
      assert(drift === math.abs(lo - hi), s"dim $d") }
  }

  // ---- q_ids_hash_surrogate ----------------------------------------------

  test("hash surrogate audit: key count covers the table, ids unique " +
    "unless collisions reported") {
    val Array((nKeys, nIds, nColl, nRowsColl, _)) =
      ops.Ids.idsHashSurrogate(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].collect()
    assert(nKeys === Tables(spark, sfDir, "customer").count())
    assert(nIds + nRowsColl - nColl === nKeys)
  }

  // ---- q_join_local_volume -----------------------------------------------

  test("local-volume plan broadcasts the pruned nation dim and stays " +
    "equi-joined") {
    val df = ops.Relational.joinLocalVolume(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast in:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"non-equi fallback in:\n$plan")
    assert(df.count() >= 1)
  }

  // ---- q_sim_knn_classify ------------------------------------------------

  test("kNN classify evaluates exactly the vectors that have neighbors") {
    val rows = ops.LlmOps.simKnnClassify(spark, sfDir)
      .as[(Int, Long, Long, Double)].collect()
    val withNbrs = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id").distinct().count()
    assert(rows.map(_._2).sum === withNbrs)
    rows.foreach { case (l, n, c, acc) =>
      assert(c <= n && acc === c.toDouble / n, s"label $l") }
  }

  // ---- q_graph_degree_stats ----------------------------------------------

  test("degree histogram mass equals the symmetrized edge count") {
    val hist = ops.LlmOps.graphDegreeStats(spark, sfDir)
      .as[(Long, Long)].collect()
    val e = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id")
    val undCount = e.unionAll(e.select($"nbr_id", $"vec_id"))
      .distinct().count()
    assert(hist.map(r => r._1 * r._2).sum === undCount)
  }

  // ---- q_vocab_prune_oov -------------------------------------------------

  test("pruned vocab reaches 90% coverage and OOV rates reconcile") {
    val rows = ops.LlmOps.vocabPruneOov(spark, sfDir)
      .as[(String, Long, Long, Double)].collect()
    val toks = Tables(spark, sfDir, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .as[String].collect()
    val total = toks.length.toLong
    assert(rows.map(_._2).sum === total)
    // global OOV mass is at most 10% + the boundary token's width
    val oov = rows.map(_._3).sum
    val topFreq = toks.groupBy(identity).values.map(_.length).max
    assert(oov <= total / 10 + topFreq,
      s"oov $oov exceeds the 10% + boundary bound")
    rows.foreach { case (l, n, o, r) =>
      assert(r === o.toDouble / n, s"lang $l") }
  }

  // ---- q_cohort_revenue --------------------------------------------------

  test("cohort LTV triangle: age-0 actives cover every user, revenue " +
    "mass is conserved") {
    val cells = ops.Analytics.cohortRevenue(spark, sfDir)
      .as[(java.sql.Date, Int, Long, Double)].collect()
    val nUsers = Tables(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(cells.filter(_._2 == 0).map(_._3).sum === nUsers)
    assert(cells.forall(_._2 >= 0))
    val totalRev = Tables(spark, sfDir, "events")
      .agg(graft.Det.dsum($"value")).as[Double].head()
    assert(math.abs(cells.map(_._4).sum - totalRev) < 1e-6)
  }

  // ---- q_join_shipping_priority ------------------------------------------

  test("shipping-priority plan pushes both date filters into the scans") {
    val df = ops.Relational.joinShippingPriority(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("TakeOrderedAndProject"),
      s"expected pushed filters + top-k operator:\n$plan")
    assert(df.count() === 10)
  }
}
