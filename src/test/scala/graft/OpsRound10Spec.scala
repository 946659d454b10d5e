package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: TPC-H Q10/Q17 shapes, two-sample KS drift,
  * Borda rank fusion, multi-source BFS over the kNN graph, and the
  * cluster-size census. Each key is replayed in the driver from raw
  * parquet (or pinned against the structural invariant it exists to
  * guarantee); the DuckDB oracle gate covers the value-level hash. */
class OpsRound10Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_join_returned_revenue -------------------------------------------

  test("returned-revenue top-20 is revenue-sorted and matches a driver " +
    "replay of the winner") {
    val rows = ops.Relational.joinReturnedRevenue(spark, sfDir)
      .as[(Long, String, String, Double, Double)].collect()
    assert(rows.length === 20)
    val revs = rows.map(_._5)
    assert(revs.sameElements(revs.sortBy(-_)), "not revenue-descending")
    // driver replay of the top customer's exact revenue from raw parquet
    val top = rows.head
    val want = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("1996-10-01").cast("date")
        && $"o_orderdate" < lit("1997-01-01").cast("date"))
      .join(Tables(spark, sfDir, "lineitem")
        .filter($"l_returnflag" === "R"),
        $"o_orderkey" === $"l_orderkey")
      .filter($"o_custkey" === top._1)
      .agg(Det.dsumDec(Det.dec($"l_extendedprice")
        * (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount"))))
      .as[Double].head()
    assert(top._5 === want, s"top customer ${top._1} revenue")
  }

  // ---- q_subquery_avg_correlated -----------------------------------------

  test("Q17 integer cross-multiplied cut equals the exact-rational " +
    "0.2*avg cut replayed in the driver") {
    val got = ops.Relational.subqueryAvgCorrelated(spark, sfDir)
      .as[(Long, Double)].head()
    val lines = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
        .filter($"p_brand" === "Brand#12").select($"p_partkey"),
        $"l_partkey" === $"p_partkey")
      .select($"l_partkey", $"l_quantity".cast("long"))
      .as[(Long, Long)].collect()
    val stats = lines.groupBy(_._1).map { case (k, ls) =>
      k -> (ls.map(_._2).sum, ls.length.toLong)
    }
    // exact rational comparison: qty < sum/(5*cnt)  ⇔  5*qty*cnt < sum
    val want = lines.count { case (k, q) =>
      val (s, c) = stats(k); 5L * q * c < s
    }
    assert(got._1 === want.toLong)
    assert(got._2 > 0.0)
  }

  // ---- q_stats_ks --------------------------------------------------------

  test("two-pass KS statistic equals a driver replay over sorted cents") {
    val (na, nb, d, at) = ops.Quality.statsKs(spark, sfDir)
      .as[(Long, Long, Double, Double)].head()
    val vals = Tables(spark, sfDir, "orders")
      .select(round($"o_totalprice" * 100).cast("long"),
        ($"o_orderkey" % 2 === 0))
      .as[(Long, Boolean)].collect()
    val wantNa = vals.count(_._2).toLong
    val wantNb = vals.length - wantNa
    assert(na === wantNa && nb === wantNb)
    var ca = 0L; var cb = 0L; var best = 0L; var bestAt = Long.MaxValue
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (v, g) =>
      ca += g.count(_._2); cb += g.count(!_._2)
      val gap = math.abs(ca * wantNb - cb * wantNa)
      if (gap > best) { best = gap; bestAt = v }
    }
    assert(d === best.toDouble / (wantNa * wantNb).toDouble)
    assert(at === bestAt.toDouble / 100.0)
    assert(d >= 0.0 && d <= 1.0)
  }

  // ---- q_rank_fusion_borda -----------------------------------------------

  test("Borda fusion: integer points bounded by the channel lists") {
    val rows = ops.LlmOps.rankFusionBorda(spark, sfDir)
      .as[(Long, Option[Int], Option[Int], Int)].collect()
    assert(rows.length === 10)
    assert(rows.map(_._1).distinct.length === 10, "dup ids")
    val pts = rows.map(_._4)
    assert(pts.sameElements(pts.sortBy(-(_: Int))), "not points-sorted")
    rows.foreach { case (id, rs, rd, b) =>
      val want = rs.map(21 - _).getOrElse(0) + rd.map(21 - _).getOrElse(0)
      assert(b === want && b >= 1 && b <= 40, s"id $id")
    }
  }

  // ---- q_graph_bfs -------------------------------------------------------

  test("multi-source BFS hops equal a driver BFS over the same edges") {
    val got = ops.LlmOps.graphBfs(spark, sfDir)
      .as[(Long, Int)].collect().toMap
    val e = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect()
    val adj = (e ++ e.map(p => (p._2, p._1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val seeds = Tables(spark, sfDir, "embeddings")
      .filter($"vec_id" % 100 === 0).select($"vec_id")
      .as[Long].collect()
    val want = scala.collection.mutable.Map[Long, Int]()
    var frontier = seeds.toSet
    frontier.foreach(want(_) = 0)
    var hop = 0
    while (hop < 20 && frontier.nonEmpty) {
      hop += 1
      frontier = frontier.flatMap(adj.getOrElse(_, Array.empty[Long]))
        .filterNot(want.contains)
      frontier.foreach(want(_) = hop)
    }
    assert(got === want.toMap)
    // triangle inequality: every non-seed reached node has a
    // neighbor one hop closer
    got.foreach { case (id, h) =>
      if (h > 0) assert(adj(id).exists(n => got.get(n).contains(h - 1)),
        s"node $id at hop $h has no hop-${h - 1} neighbor")
    }
  }

  // ---- q_agg_having ------------------------------------------------------

  test("Q18 having-cut rows all exceed 300 and match a driver recount") {
    val rows = ops.Aggregates.aggHaving(spark, sfDir)
      .as[(String, Long, Long, java.sql.Date, Double, Long)].collect()
    assert(rows.nonEmpty && rows.forall(_._6 > 300))
    val prices = rows.map(_._5)
    assert(prices.sameElements(prices.sortBy(-(_: Double))))
    // independent count of qualifying orders (unlimited)
    val want = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey").agg(sum($"l_quantity".cast("long")).as("s"))
      .filter($"s" > 300).count()
    assert(rows.length === math.min(want, 100L).toInt)
  }

  // ---- q_agg_minmax_by ---------------------------------------------------

  test("max_by/min_by agree with a rank-window replay") {
    val got = ops.Aggregates.aggMinmaxBy(spark, sfDir)
      .as[(String, Long, Long, Double, Long, Double)].collect()
    val c = Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"c_acctbal")
      .as[(String, Long, Double)].collect().groupBy(_._1)
    got.foreach { case (n, cnt, tc, tb, lc, lb) =>
      val g = c(n)
      assert(cnt === g.length.toLong, n)
      val top = g.maxBy(r => (r._3, r._2))
      val low = g.minBy(r => (r._3, r._2))
      assert((tc, tb) === (top._2, top._3), s"$n top")
      assert((lc, lb) === (low._2, low._3), s"$n low")
    }
  }

  // ---- q_subquery_exists -------------------------------------------------

  test("Q4 EXISTS decorrelates to a semi join, census mass matches") {
    val df = ops.Generators.subqueryExists(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    val want = Tables(spark, sfDir, "orders")
      .join(Tables(spark, sfDir, "lineitem"),
        $"o_orderkey" === $"l_orderkey"
          && $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .count()
    assert(df.as[(String, Long)].collect().map(_._2).sum === want)
  }

  // ---- q_events_resurrected ----------------------------------------------

  test("resurrection gaps replay from the raw (user, day) stream") {
    val got = ops.Analytics.eventsResurrected(spark, sfDir)
      .as[(Int, Long, Long)].collect()
    val days = Tables(spark, sfDir, "events")
      .select($"user_id", to_date($"ts")).distinct()
      .as[(Long, java.sql.Date)].collect()
    val gaps = days.groupBy(_._1).toSeq.flatMap { case (u, ds) =>
      val sorted = ds.map(_._2.toLocalDate).sorted
      sorted.zip(sorted.drop(1))
        .map { case (a, b) =>
          (u, java.time.temporal.ChronoUnit.DAYS.between(a, b).toInt) }
        .filter(_._2 >= 3)
    }
    val want = gaps.groupBy(_._2).map { case (g, xs) =>
      (g, xs.length.toLong, xs.map(_._1).distinct.length.toLong) }
    assert(got.toSet === want.toSet)
  }

  // ---- q_langid_confusion ------------------------------------------------

  test("confusion matrix mass equals the per-doc prediction census") {
    val m = ops.LlmOps.langidConfusion(spark, sfDir)
      .as[(String, String, Long)].collect()
    val perDoc = ops.LlmOps.textLangid(spark, sfDir)
      .groupBy($"lang", $"pred").count()
      .as[(String, String, Long)].collect()
    assert(m.toSet === perDoc.toSet)
    assert(m.map(_._3).sum === Tables(spark, sfDir, "documents").count())
  }

  // ---- q_text_compress_proxy ---------------------------------------------

  test("compressibility proxy: repetitive text scores below prose") {
    val rows = ops.LlmOps.textCompressProxy(spark, sfDir)
      .as[(Long, String, Int, Int, Double)].collect()
    rows.foreach { case (id, _, n, d, r) =>
      assert(d <= n && r === d.toDouble / n && r > 0.0, s"doc $id") }
    // a purely repetitive synthetic doc must score strictly below the
    // corpus median (the separation the filter exists to provide)
    val spread = Tables.spread(Tables(spark, sfDir, "documents"))
    val rep = spread
      .withColumn("text", concat(lit("spam "),
        expr("repeat('buy now ', 50)")))
      .select(expr("size(array_distinct(transform(" +
        "sequence(1, length(text) - 3), i -> substring(text, i, 4))))" +
        " / cast(size(transform(sequence(1, length(text) - 3), " +
        "i -> substring(text, i, 4))) as double)").as("r"))
      .agg(min($"r")).as[Double].head()
    val median = rows.map(_._5).sorted.apply(rows.length / 2)
    assert(rep < median, s"repetitive $rep !< median $median")
  }

  // ---- q_join_disjunctive ------------------------------------------------

  test("Q19 disjunction plans ONE equi hash join (no BNL/cartesian) " +
    "and matches a filter-after-join replay") {
    val df = ops.Relational.joinDisjunctive(spark, sfDir)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the common equi key extracted into a hash join:\n$plan")
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"disjunction degraded to a non-equi join:\n$plan")
    val (n, rev) = df.as[(Long, Double)].head()
    val want = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), $"l_partkey" === $"p_partkey")
      .filter(
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 20)
          && $"l_quantity".between(1, 20)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25)
          && $"l_quantity".between(10, 30)) ||
        ($"p_brand" === "Brand#21" && $"p_size".between(1, 30)
          && $"l_quantity".between(20, 45)))
      .count()
    assert(n === want && n > 0 && rev > 0.0)
  }

  // ---- q_intervals_concurrency -------------------------------------------

  test("sweep-line peak concurrency equals a driver sweep over the " +
    "same session intervals") {
    val got = ops.Analytics.intervalsConcurrency(spark, sfDir)
      .as[(java.sql.Date, Long, java.sql.Timestamp)].collect()
    // rebuild the intervals with the shared 30-min rule, sweep in the
    // driver: starts before ends at equal microseconds
    val ev = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts"))
      .as[(Long, Long, Long)].collect()
    val ivs = ev.groupBy(_._1).values.flatMap { g =>
      val sorted = g.map(r => (r._3, r._2)).sorted.toSeq
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head._1))
      sorted.sliding(2).foreach { pair =>
        if (pair.length == 2) {
          val (a, b) = (pair(0)._1, pair(1)._1)
          if (b - a > 1800000000L)
            sessions += scala.collection.mutable.ArrayBuffer(b)
          else sessions.last += b
        }
      }
      sessions.map(s => (s.min, s.max))
    }.toSeq
    val points = ivs.flatMap { case (s, e) => Seq((s, 1L, 0L), (e, 0L, 1L)) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (t, ps) => (t, ps.map(_._2).sum, ps.map(_._3).sum) }
    var net = 0L
    val peaks = points.map { case (t, s, e) =>
      net += s - e; (t, net + e)
    }
    val wantByDay = peaks
      .groupBy { case (t, _) =>
        java.time.Instant.ofEpochSecond(t / 1000000L)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate
      }
      .map { case (d, ps) =>
        val best = ps.maxBy { case (t, p) => (p, -t) }
        (d.toString, best._2, best._1)
      }.toSet
    val gotSet = got.map(r =>
      (r._1.toString, r._2,
        r._3.toInstant.getEpochSecond * 1000000L
          + r._3.toInstant.getNano / 1000L)).toSet
    assert(gotSet === wantByDay)
    assert(got.forall(_._2 >= 1))
  }

  // ---- q_sim_ann_beam ----------------------------------------------------

  test("beam-search ANN equals a driver replay with identical rounding " +
    "and total orders") {
    val got = ops.LlmOps.simAnnBeam(spark, sfDir)
      .as[(Long, Double)].collect()
    assert(got.length === 10)
    val sims = got.map(_._2)
    assert(sims.sameElements(sims.sortBy(-(_: Double))))
    // driver replay from raw parquet
    val vecs = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect().toMap
    val e = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect()
    val adj = (e ++ e.map(p => (p._2, p._1))).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val qe = vecs(0L)
    def r4(x: Double): Double = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def sim(id: Long): Double = {
      var acc = 0.0
      val v = vecs(id)
      var i = 0
      while (i < v.length) { acc += v(i).toDouble * qe(i).toDouble; i += 1 }
      r4(acc)
    }
    val ord = Ordering.by[(Long, Double), (Double, Long)] {
      case (id, s) => (-s, id)
    }
    var visited = vecs.keys.filter(_ % 100 == 0).toSeq
      .map(id => (id, sim(id))).sorted(ord).take(8).toMap
    for (_ <- 1 to 4) {
      val beam = visited.toSeq.sorted(ord).take(8).map(_._1)
      val cand = beam.flatMap(adj.getOrElse(_, Array.empty[Long]))
        .distinct.filterNot(visited.contains)
      visited = visited ++ cand.map(id => (id, sim(id)))
    }
    val want = visited.toSeq.sorted(ord).take(10)
    assert(got.toSeq === want)
  }

  // ---- TwoPass -----------------------------------------------------------

  test("TwoPass.cumsum equals the naive window cumsum and survives " +
    "a different partition count") {
    val base = Tables(spark, sfDir, "orders")
      .select(($"o_orderkey" % 997).as("k"))
      .groupBy($"k").agg(count(lit(1)).as("n"))
    val want = base
      .withColumn("cum_n", sum($"n").over(
        org.apache.spark.sql.expressions.Window.orderBy($"k")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .select($"k", $"n", $"cum_n")
      .collect().map(_.toString).sorted.toSeq
    Seq(1, 3, 8, 17).foreach { p =>
      val got = ops.TwoPass.cumsum(base, "k", Seq("n"), nParts = p)
        .select($"k", $"n", $"cum_n")
        .collect().map(_.toString).sorted.toSeq
      assert(got === want, s"nParts=$p diverged")
    }
  }

  // ---- q_dedup_threshold_sweep -------------------------------------------

  test("threshold sweep is monotone and anchored at the mining floor") {
    val rows = ops.LlmOps.dedupThresholdSweep(spark, sfDir)
      .as[(Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    // monotone non-increasing in both counts as the threshold rises
    rows.sliding(2).foreach {
      case Array((t1, p1, v1), (t2, p2, v2)) =>
        assert(t1 < t2 && p1 >= p2 && v1 >= v2, s"not monotone at $t2")
      case _ => ()
    }
    // the 0.4 row IS the full mined pair set
    val all = ops.LlmOps.dedupEmbeddingAnn(spark, sfDir).count()
    assert(rows.find(_._1 == 0.4).map(_._2).contains(all))
  }

  // ---- q_shard_manifest --------------------------------------------------

  test("shard manifest: contiguous id ranges, byte mass conserved, " +
    "every shard but the last crosses the budget line") {
    val rows = ops.LlmOps.shardManifest(spark, sfDir)
      .as[(Long, Long, Long, Long, Long)].collect()
    val (nDocs, totBytes) = Tables(spark, sfDir, "documents")
      .agg(count(lit(1)), sum($"n_chars".cast("long") + 64L))
      .as[(Long, Long)].head()
    assert(rows.map(_._2).sum === nDocs)
    assert(rows.map(_._3).sum === totBytes)
    // shards are contiguous in doc_id: ranges don't interleave
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._1 < b._1 && a._5 < b._4,
          s"shards ${a._1}/${b._1} interleave")
      case _ => ()
    }
    // offset sharding: every shard's START offset is below its
    // budget multiple and the next shard starts past it
    val cum = rows.map(_._3).scanLeft(0L)(_ + _)
    rows.zipWithIndex.foreach { case ((sid, _, _, _, _), i) =>
      assert(cum(i) / 65536 === sid, s"shard $sid offset ${cum(i)}")
    }
  }

  // ---- q_dedup_cluster_stats ---------------------------------------------

  test("cluster-size census mass equals the corpus") {
    val hist = ops.LlmOps.dedupClusterStats(spark, sfDir)
      .as[(Long, Long, Long)].collect()
    val nDocs = Tables(spark, sfDir, "documents").count()
    assert(hist.map(_._3).sum === nDocs)
    hist.foreach { case (sz, nc, nd) =>
      assert(nd === sz * nc, s"size $sz") }
    // the census must agree with the labels it summarizes
    val nClusters = ops.LlmOps.dedupCluster(spark, sfDir)
      .select($"component").distinct().count()
    assert(hist.map(_._2).sum === nClusters)
  }
}
