package graft

import org.apache.spark.sql.functions._

/** Round-12 additions: the remaining TPC-H classics — Q7 cross-nation
  * volume, Q8 market share, Q13 count distribution, Q15 scalar-max
  * gate, Q18 grouped-HAVING gate, and the adapted Q21 strictly-last
  * supplier. Each is replayed in the driver from raw parquet with an
  * independent (usually brute-force) formulation; the DuckDB oracle
  * gate covers the value-level hash. */
class OpsRound12Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_join_nation_volume (Q7) -----------------------------------------

  test("nation volume covers exactly the ordered cross pairs") {
    val rows = ops.Relational.joinNationVolume(spark, sfDir)
      .as[(String, String, Int, Double)].collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r._1, r._2)).distinct.toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"),
      ("NATION_7", "NATION_3"))), "only the two ordered pairs appear")
    assert(rows.forall(r => r._3 == 1996 || r._3 == 1997),
      "ship-year cut respected")
    assert(rows.forall(_._4 > 0))
    // ordered output: pair, then year
    assert(rows.sortBy(r => (r._1, r._2, r._3)).toSeq === rows.toSeq)
  }

  // ---- q_join_market_share (Q8) ------------------------------------------

  test("market share is a true share and matches a two-query replay") {
    val rows = ops.Relational.joinMarketShare(spark, sfDir)
      .as[(Int, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (y, share, n) =>
      assert(share >= 0.0 && share <= 1.0, s"year $y")
      assert(n > 0)
    }
    // replay one year brute-force: numerator / denominator from scratch
    val (y0, share0, _) = rows.head
    val base = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part")
        .filter($"p_type" === "PROMO"), $"l_partkey" === $"p_partkey")
      .join(Tables(spark, sfDir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(Tables(spark, sfDir, "nation")
        .select($"n_nationkey".as("snk"), $"n_name".as("supp_nation")),
        $"s_nationkey" === $"snk")
      .join(Tables(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables(spark, sfDir, "nation")
        .join(Tables(spark, sfDir, "region")
          .filter($"r_name" === "ASIA"), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as("cnk")), $"c_nationkey" === $"cnk")
      .filter(year($"o_orderdate") === y0)
      .select($"supp_nation",
        (Det.dec($"l_extendedprice") *
          (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
          .as("rev"))
      .as[(String, BigDecimal)].collect()
    val num = base.filter(_._1 == "NATION_9").map(_._2).sum
    val den = base.map(_._2).sum
    assert(share0 === num.toDouble / den.toDouble)
  }

  // ---- q_agg_count_distribution (Q13) ------------------------------------

  test("count distribution sums back to the customer census") {
    val rows = ops.Relational.aggCountDistribution(spark, sfDir)
      .as[(Long, Long)].collect()
    val nCust = Tables(spark, sfDir, "customer").count()
    assert(rows.map(_._2).sum === nCust,
      "every customer lands in exactly one count bucket")
    val nOrd = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" =!= "1-URGENT").count()
    assert(rows.map(r => r._1 * r._2).sum === nOrd,
      "count-weighted buckets sum to the filtered order census")
    // output sorted by custdist desc then count desc
    assert(rows.sortBy(r => (-r._2, -r._1)).toSeq === rows.toSeq)
  }

  // ---- q_join_top_supplier (Q15) -----------------------------------------

  test("top supplier equals the argmax of a brute-force revenue map") {
    val rows = ops.Relational.joinTopSupplier(spark, sfDir)
      .as[(Long, String, Double)].collect()
    assert(rows.nonEmpty)
    val revBySupp = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1997-04-01").cast("timestamp"))
      .select($"l_suppkey",
        (Det.dec($"l_extendedprice") *
          (lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")))
          .as("rev"))
      .as[(Long, BigDecimal)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val mx = revBySupp.values.max
    val want = revBySupp.filter(_._2 == mx).keySet
    assert(rows.map(_._1).toSet === want)
    rows.foreach(r => assert(r._3 === mx.toDouble))
  }

  // ---- q_subquery_in_grouped (Q18) ---------------------------------------

  test("grouped-HAVING gate keeps exactly the >180-quantity orders") {
    val rows = ops.Relational.subqueryInGrouped(spark, sfDir)
      .as[(String, Long, Long, java.sql.Date, Double, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 100)
    val qty = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_quantity".cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    rows.foreach { case (_, _, ok, _, _, tq) =>
      assert(qty(ok) === tq, s"order $ok")
      assert(tq > 180)
    }
    // descending totalprice with orderkey tiebreak
    val prices = rows.map(r => (r._5, r._3))
    assert(prices.sortBy(p => (-p._1, p._2)).toSeq === prices.toSeq)
  }

  // ---- q_agg_corr --------------------------------------------------------

  test("covar_samp/var identity reproduces the regr slope") {
    val corrRows = ops.Aggregates.aggCorr(spark, sfDir)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val regrRows = ops.Aggregates.aggRegr(spark, sfDir)
      .as[(String, Double, Double, Double, Long)].collect()
    regrRows.foreach { case (flag, slope, _, _, n) =>
      val (_, _, covS, _, nc) = corrRows(flag)
      assert(nc === n)
      // slope = covar_samp / var_samp(x) — replay var from raw rows
      val xs = Tables(spark, sfDir, "lineitem")
        .filter($"l_returnflag" === flag)
        .select($"l_quantity").as[Double].collect()
      val mx = xs.sum / xs.length
      val varx = xs.map(x => (x - mx) * (x - mx)).sum / (xs.length - 1)
      assert(math.abs(covS / varx - slope) < 1e-2, flag)
    }
  }

  // ---- q_agg_string ------------------------------------------------------

  test("listagg equals the sorted distinct census") {
    val rows = ops.Aggregates.aggString(spark, sfDir)
      .as[(String, String, Long, Long)].collect()
    val base = Tables(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_orderstatus")
      .as[(String, String)].collect()
    rows.foreach { case (p, csv, nd, n) =>
      val g = base.filter(_._1 == p).map(_._2)
      assert(csv === g.distinct.sorted.mkString(","), p)
      assert(nd === g.distinct.length.toLong, p)
      assert(n === g.length.toLong, p)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_stats_ttest -----------------------------------------------------

  test("Welch t matches a driver replay from raw cents") {
    val (na, nb, ma, mb, t, df) = ops.Quality.statsTtest(spark, sfDir)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    val cents = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
    val (a, b) = cents.partition(_._1 % 2 == 0)
    assert(na === a.length.toLong && nb === b.length.toLong)
    def stats(xs: Array[Long]) = {
      val n = xs.length.toDouble
      val m = xs.map(BigInt(_)).sum.toDouble / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (nad, mad, vad) = stats(a.map(_._2))
    val (nbd, mbd, vbd) = stats(b.map(_._2))
    assert(math.abs(ma - mad / 100.0) < 1e-6)
    assert(math.abs(mb - mbd / 100.0) < 1e-6)
    val se2 = vad / nad + vbd / nbd
    assert(math.abs(t - (mad - mbd) / math.sqrt(se2)) < 1e-3)
    val dfW = se2 * se2 /
      (math.pow(vad / nad, 2) / (nad - 1)
        + math.pow(vbd / nbd, 2) / (nbd - 1))
    assert(math.abs(df - dfW) < 1e-1)
  }

  // ---- q_stats_iqr_outliers ----------------------------------------------

  test("IQR fences and outlier counts match a sorted-array replay") {
    val rows = ops.Quality.statsIqrOutliers(spark, sfDir)
      .as[(String, Long, Long, Double, Double)].collect()
    val base = Tables(spark, sfDir, "customer")
      .select($"c_mktsegment", $"c_acctbal")
      .as[(String, Double)].collect().groupBy(_._1)
    def pct(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < xs.length) xs(lo) * (1 - frac) + xs(lo + 1) * frac
      else xs(lo)
    }
    rows.foreach { case (seg, n, nOut, fLo, fHi) =>
      val xs = base(seg).map(_._2).sorted
      assert(n === xs.length.toLong, seg)
      val q1 = pct(xs, 0.25); val q3 = pct(xs, 0.75)
      val lo = q1 - (q3 - q1) * 1.5; val hi = q3 + (q3 - q1) * 1.5
      assert(math.abs(fLo - lo) < 1e-3, seg)
      assert(math.abs(fHi - hi) < 1e-3, seg)
      assert(nOut === xs.count(x => x < lo || x > hi).toLong, seg)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_win_value_funcs -------------------------------------------------

  test("IGNORE NULLS carry-forward matches a per-user sequential fold") {
    val rows = ops.Windows.winValueFuncs(spark, sfDir)
      .select($"user_id", $"event_id", $"last_price", $"entry_price",
        $"second_price", $"n_priced", $"n_events")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double],
        Long, Long)].collect()
    val raw = Tables(spark, sfDir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts"),
        when($"event_type" === "purchase", $"value"))
      .as[(Long, Long, Long, Option[Double])].collect()
      .groupBy(_._1)
      .map { case (u, v) =>
        u -> v.sortBy(e => (e._3, e._2))
      }
    val byKey = rows.map(r => (r._1, r._2) -> r).toMap
    raw.foreach { case (u, seq) =>
      val priced = seq.flatMap(_._4)
      var last: Option[Double] = None
      seq.foreach { case (_, eid, _, pv) =>
        last = pv.orElse(last)
        val r = byKey((u, eid))
        assert(r._3 === last, s"last_price u=$u e=$eid")
        assert(r._4 === priced.headOption, s"entry u=$u")
        assert(r._5 === priced.drop(1).headOption, s"second u=$u")
        assert(r._6 === priced.length.toLong)
        assert(r._7 === seq.length.toLong)
      }
    }
  }

  // ---- q_regex_funcs / q_text_readability --------------------------------

  test("regex pack matches java.util.regex on every doc") {
    val rows = ops.Scalars.regexFuncs(spark, sfDir)
      .as[(Long, String, Int, String, Boolean)].collect()
    val texts = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val pLong = java.util.regex.Pattern.compile("[A-Za-z]{9,}")
    rows.foreach { case (id, first, n, masked, has3) =>
      val t = texts(id)
      val m = pLong.matcher(t)
      val all = Iterator.continually(m.find()).takeWhile(identity)
        .map(_ => m.group()).toList
      assert(first === all.headOption.getOrElse(""), id)
      assert(n === all.length, id)
      assert(masked === t.replaceAll("[0-9]+", "#").take(40), id)
      assert(has3 === ("[0-9]{3}".r.findFirstIn(t).isDefined), id)
    }
  }

  test("flesch formula replays from driver regex counts") {
    val rows = ops.LlmOps.textReadability(spark, sfDir)
      .as[(Long, Long, Long, Long, Double)].collect()
    val texts = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, w, s, y, f) =>
      val t = texts(id)
      def cnt(p: String) = {
        val m = java.util.regex.Pattern.compile(p).matcher(t)
        Iterator.continually(m.find()).takeWhile(identity).size
      }
      assert(w === cnt("[A-Za-z0-9]+").toLong, id)
      assert(s === math.max(cnt("[.!?]+"), 1).toLong, id)
      assert(y === cnt("[aeiouAEIOU]+").toLong, id)
      val want = 206.835 - 1.015 * (w.toDouble / s) -
        84.6 * (y.toDouble / w)
      assert(math.abs(f - want) < 1e-3, id)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_join_waiting_supplier (Q21 adapted) -----------------------------

  test("waiting supplier counts equal a brute-force per-order replay") {
    val rows = ops.Relational.joinWaitingSupplier(spark, sfDir)
      .as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val li = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val guilty = li.groupBy(_._1).flatMap { case (_, lines) =>
      val bySupp = lines.groupBy(_._2)
        .map { case (s, v) => s -> v.map(_._3.getTime).max }
      if (bySupp.size < 2) None
      else {
        val gm = bySupp.values.max
        val atMax = bySupp.filter(_._2 == gm).keys.toSeq
        if (atMax.size == 1) Some(atMax.head) else None
      }
    }
    val counts = guilty.groupBy(identity).map { case (k, v) => k -> v.size }
    val names = Tables(spark, sfDir, "supplier")
      .select($"s_suppkey", $"s_name").as[(Long, String)].collect().toMap
    val wantTop = counts.toSeq
      .map { case (k, n) => (names(k), n.toLong) }
      .sortBy { case (nm, n) => (-n, nm) }.take(rows.length)
    assert(rows.toSeq === wantTop)
  }
}
