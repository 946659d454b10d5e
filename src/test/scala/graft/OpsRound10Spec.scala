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
