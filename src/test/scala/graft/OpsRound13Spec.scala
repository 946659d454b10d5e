package graft

import org.apache.spark.sql.functions._

/** Round-12 wave H: the last TPC-H classics (Q6 revenue cut, Q9
  * profit, Q11 important stock, Q20 part promotion), the robust/
  * higher-moment statistics pack (Spearman, HHI, skew/kurtosis), the
  * MATCH_RECOGNIZE-shape sequence pattern, chunk-level paragraph
  * dedup, and bounded-radius spatial kNN. Every nontrivial formula is
  * replayed in the driver from raw parquet with an independent
  * (usually brute-force) formulation; the DuckDB oracle gate covers
  * the value-level hash. */
class OpsRound13Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_agg_revenue_cut (Q6) --------------------------------------------

  test("revenue cut matches an exact BigDecimal driver fold") {
    val (rev, n) = ops.Aggregates.aggRevenueCut(spark, sfDir)
      .as[(Double, Long)].head()
    val rows = Tables(spark, sfDir, "lineitem")
      .select($"l_extendedprice", $"l_discount", $"l_quantity",
        year($"l_shipdate").as("y"))
      .as[(Double, Double, Double, Int)].collect()
      .filter(r => r._4 == 1997 && r._2 >= 0.05 && r._2 <= 0.07
        && r._3 < 24)
    assert(n === rows.length.toLong)
    val want = rows.map(r =>
      BigDecimal(r._1).setScale(2) * BigDecimal(r._2).setScale(2)).sum
    assert(math.abs(rev - want.toDouble) < 1e-9)
  }

  // ---- q_join_product_profit (Q9) ----------------------------------------

  test("product profit matches a brute-force BigDecimal replay") {
    val got = ops.Relational.joinProductProfit(spark, sfDir)
      .as[(String, Int, Double, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val retail = Tables(spark, sfDir, "part")
      .filter($"p_name".contains("widget"))
      .select($"p_partkey", $"p_retailprice").as[(Long, Double)]
      .collect().toMap
    val supNation = Tables(spark, sfDir, "supplier")
      .join(Tables(spark, sfDir, "nation"),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey", $"n_name").as[(Long, String)].collect().toMap
    val orderYear = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", year($"o_orderdate")).as[(Long, Int)]
      .collect().toMap
    val want = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey",
        $"l_extendedprice", $"l_discount", $"l_quantity")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .filter(r => retail.contains(r._2))
      .groupBy(r => (supNation(r._3), orderYear(r._1)))
      .map { case (k, rs) =>
        val s = rs.map { r =>
          BigDecimal(r._4).setScale(2) *
            (BigDecimal(1) - BigDecimal(r._5).setScale(2)) -
            BigDecimal("0.6") * BigDecimal(retail(r._2)).setScale(2) *
              BigDecimal(r._6.toLong)
        }.sum
        k -> (s.toDouble, rs.length.toLong)
      }
    assert(got.keySet === want.keySet)
    want.foreach { case (k, (s, n)) =>
      assert(got(k)._2 === n, k)
      assert(math.abs(got(k)._1 - s) < 1e-6, k)
    }
  }

  // ---- q_agg_important_stock (Q11) ---------------------------------------

  test("important stock keeps exactly the parts above the global gate") {
    val got = ops.Relational.aggImportantStock(spark, sfDir)
      .as[(Long, Double)].collect()
    val supKeys = Tables(spark, sfDir, "supplier")
      .join(Tables(spark, sfDir, "nation")
        .filter($"n_regionkey" === 0),
        $"s_nationkey" === $"n_nationkey")
      .select($"s_suppkey").as[Long].collect().toSet
    val retail = Tables(spark, sfDir, "part")
      .select($"p_partkey", $"p_retailprice").as[(Long, Double)]
      .collect().toMap
    val perPart = Tables(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity")
      .as[(Long, Long, Double)].collect()
      .filter(r => supKeys.contains(r._2))
      .groupBy(_._1)
      .map { case (p, rs) =>
        p -> rs.map(r => BigDecimal(retail(p)).setScale(2)
          * BigDecimal(r._3.toLong)).sum
      }
    val total = perPart.values.sum
    val nParts = perPart.size
    val want = perPart.filter(_._2 * nParts > total * 2)
      .map { case (p, v) => p -> v.toDouble }
    assert(got.map(_._1).toSet === want.keySet)
    got.foreach { case (p, v) =>
      assert(math.abs(v - want(p)) < 1e-9, p)
    }
    // ordered by value desc then partkey
    assert(got.sortBy(r => (-r._2, r._1)).toSeq === got.toSeq)
  }

  // ---- q_subquery_part_promotion (Q20) -----------------------------------

  test("part promotion threshold replays as integer cross-multiplication") {
    val got = ops.Relational.subqueryPartPromotion(spark, sfDir)
      .as[(Long, String, Long, Long)].collect()
    val promo = Tables(spark, sfDir, "part")
      .filter($"p_type" === "PROMO").select($"p_partkey")
      .as[Long].collect().toSet
    val vol = Tables(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_suppkey", $"l_quantity",
        year($"l_shipdate")).as[(Long, Long, Double, Int)].collect()
      .filter(r => promo.contains(r._1))
      .groupBy(_._2)
      .map { case (s, rs) =>
        s -> (rs.filter(_._4 == 1997).map(_._3.toLong).sum,
          rs.map(_._3.toLong).sum)
      }
    val want = vol.filter { case (_, (r, t)) => r * 5 > t }
    assert(got.map(_._1).toSet === want.keySet)
    got.foreach { case (s, _, r, t) =>
      assert((r, t) === want(s), s)
    }
    assert(got.nonEmpty)
  }

  // ---- q_stats_spearman ----------------------------------------------------

  test("Spearman rho matches a driver midrank replay") {
    val (n, rho) = ops.Quality.statsSpearman(spark, sfDir)
      .as[(Long, Double)].head()
    val rows = Tables(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("long"),
        round($"l_extendedprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
    assert(n === rows.length.toLong)
    def midranks(xs: Array[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      xs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v)
        val hi = sorted.lastIndexWhere(_ == v)
        v -> (lo + hi + 2) / 2.0 // 1-based midrank
      }.toMap
    }
    val rq = midranks(rows.map(_._1))
    val rp = midranks(rows.map(_._2))
    val pairs = rows.map(r => (rq(r._1), rp(r._2)))
    val nn = pairs.length.toDouble
    val mq = pairs.map(_._1).sum / nn
    val mp = pairs.map(_._2).sum / nn
    val cov = pairs.map(p => (p._1 - mq) * (p._2 - mp)).sum
    val vq = pairs.map(p => (p._1 - mq) * (p._1 - mq)).sum
    val vp = pairs.map(p => (p._2 - mp) * (p._2 - mp)).sum
    assert(math.abs(rho - cov / math.sqrt(vq * vp)) < 1e-3)
  }

  // ---- q_stats_hhi ---------------------------------------------------------

  test("HHI matches an exact BigInt cents replay") {
    val (nGroups, hhi, effN) = ops.Quality.statsHhi(spark, sfDir)
      .as[(Long, Double, Double)].head()
    val custNation = Tables(spark, sfDir, "customer")
      .join(Tables(spark, sfDir, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name").as[(Long, String)].collect().toMap
    val census = Tables(spark, sfDir, "orders")
      .select($"o_custkey", round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(r => custNation(r._1))
      .map { case (_, rs) => rs.map(r => BigInt(r._2)).sum }
    assert(nGroups === census.size.toLong)
    val s1 = census.sum
    val s2 = census.map(v => v * v).sum
    val wantHhi = 10000.0 * s2.toDouble / (s1.toDouble * s1.toDouble)
    assert(math.abs(hhi - wantHhi) < 1e-3)
    assert(math.abs(effN - s1.toDouble * s1.toDouble / s2.toDouble) < 1e-3)
  }

  // ---- q_stats_moments -----------------------------------------------------

  test("population skew/kurtosis match a direct central-moment replay") {
    val rows = ops.Quality.statsMoments(spark, sfDir)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val base = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_quantity")
      .as[(String, Double)].collect().groupBy(_._1)
    rows.foreach { case (flag, n, mean, v, skew, kurt) =>
      val xs = base(flag).map(_._2)
      assert(n === xs.length.toLong, flag)
      val mu = xs.sum / xs.length
      val c2 = xs.map(x => math.pow(x - mu, 2)).sum / xs.length
      val c3 = xs.map(x => math.pow(x - mu, 3)).sum / xs.length
      val c4 = xs.map(x => math.pow(x - mu, 4)).sum / xs.length
      assert(math.abs(mean - mu) < 1e-3, flag)
      assert(math.abs(v - c2) < 1e-2, flag)
      assert(math.abs(skew - c3 / math.pow(c2, 1.5)) < 1e-3, flag)
      assert(math.abs(kurt - (c4 / (c2 * c2) - 3.0)) < 1e-3, flag)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_events_pattern ----------------------------------------------------

  test("sequence pattern counts match java.util.regex on driver strings") {
    val got = ops.Analytics.eventsPattern(spark, sfDir)
      .as[(Long, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val seqs = Tables(spark, sfDir, "events")
      .select($"user_id", unix_micros($"ts"), $"event_id",
        substring($"event_type", 1, 1))
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1)
      .map { case (u, es) =>
        u -> es.sortBy(e => (e._2, e._3)).map(_._4).mkString
      }
    assert(got.keySet === seqs.keySet)
    def count(p: String, s: String): Int = {
      val m = java.util.regex.Pattern.compile(p).matcher(s)
      Iterator.continually(m.find()).takeWhile(identity).size
    }
    seqs.foreach { case (u, s) =>
      val (nEv, nConv, nErr) = got(u)
      assert(nEv === s.length, u)
      assert(nConv === count("v[^p]*p", s), u)
      assert(nErr === count("e+", s), u)
    }
  }

  // ---- q_dedup_paragraph ---------------------------------------------------

  test("paragraph dedup keeps first occurrence and reassembles in order") {
    val got = ops.LlmOps.dedupParagraph(spark, sfDir)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy(_._1)
    // driver replay of the exact chunker + first-claim rule
    val allChunks = docs.flatMap { case (id, text) =>
      val t = text.split(" ", -1)
      (0 to (t.length - 1) / 20).map { i =>
        (id, i, t.slice(i * 20, i * 20 + 20).mkString(" "))
      }
    }
    val keeper = allChunks.groupBy(_._3)
      .map { case (c, occ) => c -> occ.map(o => o._1 * 100000 + o._2).min }
    val kept = allChunks.filter(c => keeper(c._3) == c._1 * 100000 + c._2)
      .groupBy(_._1)
    assert(got.keySet === docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val total = (text.split(" ", -1).length - 1) / 20 + 1
      val mine = kept.getOrElse(id, Array.empty[(Long, Int, String)])
        .sortBy(_._2)
      val (nChunks, nKept, dedup) = got(id)
      assert(nChunks === total.toLong, id)
      assert(nKept === mine.length.toLong, id)
      assert(dedup === mine.map(_._3).mkString(" "), id)
    }
    // the rule actually fires on this corpus (some chunk repeats)
    assert(got.values.exists(v => v._2 < v._1),
      "expected at least one cross-doc duplicate chunk")
  }

  // ---- q_stats_cramers_v ---------------------------------------------------

  test("Cramér's V matches a driver chi-square replay") {
    val (n, dof, chi2, v) = ops.Quality.statsCramersV(spark, sfDir)
      .as[(Long, Long, Double, Double)].head()
    val rows = Tables(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_orderstatus")
      .as[(String, String)].collect()
    assert(n === rows.length.toLong)
    val rs = rows.map(_._1).distinct.sorted
    val cs = rows.map(_._2).distinct.sorted
    assert(dof === ((rs.length - 1) * (cs.length - 1)).toLong)
    val cells = rows.groupBy(identity).map { case (k, v0) => k -> v0.length }
    val rt = rows.groupBy(_._1).map { case (k, v0) => k -> v0.length }
    val ct = rows.groupBy(_._2).map { case (k, v0) => k -> v0.length }
    val chi = (for (r <- rs; c <- cs) yield {
      val exp = rt(r).toDouble * ct(c) / rows.length
      val obs = cells.getOrElse((r, c), 0).toDouble
      (obs - exp) * (obs - exp) / exp
    }).sum
    assert(math.abs(chi2 - chi) < 1e-2)
    val wantV = math.sqrt(chi / (rows.length.toDouble *
      (math.min(rs.length, cs.length) - 1)))
    assert(math.abs(v - wantV) < 1e-3)
  }

  // ---- q_ts_seasonal -------------------------------------------------------

  test("weekday seasonal indices replay from an exact day census") {
    val got = ops.Analytics.tsSeasonal(spark, sfDir)
      .as[(Int, Long, Double, Double)].collect()
    val anchor = java.time.LocalDate.parse("1995-01-02")
    val daily = Tables(spark, sfDir, "orders")
      .select(to_date($"o_orderdate").cast("string"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (d, rs) =>
        d -> rs.map(r => BigInt(r._2)).sum
      }
    val byDow = daily.groupBy { case (d, _) =>
      (((java.time.temporal.ChronoUnit.DAYS.between(anchor,
        java.time.LocalDate.parse(d)) % 7) + 7) % 7).toInt
    }
    val gCents = daily.values.sum
    val gDays = daily.size
    assert(got.map(_._1).toSet === byDow.keySet)
    got.foreach { case (dow, nDays, meanRev, idx) =>
      val ds = byDow(dow)
      assert(nDays === ds.size.toLong, dow)
      val cents = ds.values.sum
      assert(math.abs(meanRev - cents.toDouble / (ds.size * 100.0))
        < 1e-2, dow)
      val wantIdx = (BigDecimal(cents) * gDays).toDouble /
        (BigDecimal(ds.size) * BigDecimal(gCents)).toDouble
      assert(math.abs(idx - wantIdx) < 1e-3, dow)
    }
    // indices average to ~1 by construction (weighted by day counts)
    assert(got.nonEmpty)
  }

  // ---- q_sink_text_roundtrip -----------------------------------------------

  test("text roundtrip census equals the original-table census") {
    val got = ops.Relational.sinkTextRoundtrip(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
    val want = Tables(spark, sfDir, "documents")
      .groupBy($"lang")
      .agg(count(lit(1)), sum(length($"text").cast("long")),
        sum($"doc_id"))
      .as[(String, Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq === want.sortBy(_._1).toSeq)
  }

  // ---- q_spatial_knn -------------------------------------------------------

  test("bounded-radius kNN equals the brute-force top-3 per supplier") {
    val got = ops.Spatial.spatialKnn(spark, sfDir)
      .as[(Long, Int, Long, Double)].collect()
    val parts = Tables(spark, sfDir, "part").select($"p_partkey")
      .as[Long].collect()
      .map(k => (k, (k * 137.508) % 360.0, (k * 97.13) % 120.0 - 60.0))
    val sups = Tables(spark, sfDir, "supplier").select($"s_suppkey")
      .as[Long].collect()
      .map(k => (k, (k * 211.7) % 360.0, (k * 53.77) % 120.0 - 60.0))
    def d2(a: (Long, Double, Double), b: (Long, Double, Double)) = {
      val dra = math.min(math.abs(a._2 - b._2), 360.0 - math.abs(a._2 - b._2))
      dra * dra + (a._3 - b._3) * (a._3 - b._3)
    }
    val want = sups.flatMap { s =>
      parts.map(p => (s._1, p._1, d2(p, s))).filter(_._3 <= 9.0)
        .sortBy(t => (t._3, t._2)).take(3).zipWithIndex
        .map { case ((sid, pid, d), i) => (sid, i + 1, pid, d) }
    }
    assert(got.length === want.length)
    got.sortBy(r => (r._1, r._2)).zip(want.sortBy(r => (r._1, r._2)))
      .foreach { case (g, w) =>
        assert((g._1, g._2, g._3) === ((w._1, w._2, w._3)))
        assert(math.abs(g._4 - w._4) < 1e-3)
      }
    assert(got.nonEmpty)
  }
}
