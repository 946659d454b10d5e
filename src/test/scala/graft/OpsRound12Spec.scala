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
