package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: TPC-H Q12/Q14/Q16/Q22/Q2 shapes, the
  * inequality / rank-sum / Benford / mutual-information statistics,
  * census ACF/EMA time series, power-user concentration, DSIR
  * importance weights, Zipf fit, kNN link prediction, and the id
  * split census. Each key is replayed in the driver from raw parquet
  * (or pinned against the invariant it exists to guarantee); the
  * DuckDB oracle gate covers the value-level hash. */
class OpsRound11Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_stats_gini ------------------------------------------------------

  test("gini equals a driver replay over sorted customer cents") {
    val (n, total, gini) = ops.Quality.statsGini(spark, sfDir)
      .as[(Long, Double, Double)].head()
    val cents = Tables(spark, sfDir, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .select($"c").as[Long].collect().sorted
    assert(n === cents.length.toLong)
    val t = cents.map(BigInt(_)).sum
    assert(total === (BigDecimal(t) / 100).toDouble)
    val s2 = cents.zipWithIndex
      .map { case (x, i) => BigInt(2) * (i + 1) * x }.sum
    val want = (BigDecimal(s2) / (BigDecimal(n) * BigDecimal(t))).toDouble -
      (n + 1).toDouble / n.toDouble
    // replay divides in BigDecimal (different rounding than the
    // engine's IEEE path) — compare to float tolerance, not bits
    assert(math.abs(gini - want) < 1e-12)
    assert(gini > 0.0 && gini < 1.0)
  }

  // ---- q_stats_mannwhitney -----------------------------------------------

  test("Mann-Whitney U equals a driver midrank replay") {
    val (na, nb, ua, mu, z) = ops.Quality.statsMannWhitney(spark, sfDir)
      .as[(Long, Long, Double, Double, Double)].head()
    val vals = Tables(spark, sfDir, "orders")
      .select(round($"o_totalprice" * 100).cast("long"),
        $"o_orderkey" % 2 === 0)
      .as[(Long, Boolean)].collect()
    val wantNa = vals.count(_._2).toLong
    assert(na === wantNa && nb === vals.length - wantNa)
    // midrank sum over arm A, doubled to stay integral
    var pooled = 0L; var r2 = 0L
    vals.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, g) =>
      val da = g.count(_._2); val dn = g.length
      r2 += da.toLong * (pooled + (pooled + dn) + 1)
      pooled += dn
    }
    val wantU = (r2 - na * (na + 1)).toDouble / 2.0
    assert(ua === wantU)
    assert(mu === na.toDouble * nb / 2.0)
    val sigma = math.sqrt(na.toDouble * nb * (na + nb + 1) / 12.0)
    assert(z === (wantU - mu) / sigma)
  }

  // ---- q_stats_benford ---------------------------------------------------

  test("Benford digit census covers 1..9 and counts match a replay") {
    val rows = ops.Quality.statsBenford(spark, sfDir)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === (1 to 9))
    val cents = Tables(spark, sfDir, "orders")
      .select(round($"o_totalprice" * 100).cast("long")).as[Long].collect()
    val want = cents.groupBy(_.toString.head.asDigit).view.mapValues(_.length)
    rows.foreach { case (d, obs, exp, chi) =>
      assert(obs === want(d).toLong, s"digit $d")
      assert(exp > 0 && chi >= 0)
    }
    assert(rows.map(_._2).sum === cents.length.toLong)
  }

  // ---- q_stats_mutual_info -----------------------------------------------

  test("mutual information is non-negative and matches a driver replay") {
    val (n, nCells, mi) = ops.Quality.statsMutualInfo(spark, sfDir)
      .as[(Long, Long, Double)].head()
    val cells = Tables(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_orderstatus")
      .as[(String, String)].collect()
    assert(n === cells.length.toLong)
    val byCell = cells.groupBy(identity).view.mapValues(_.length)
    assert(nCells === byCell.size.toLong)
    val byR = cells.groupBy(_._1).view.mapValues(_.length)
    val byC = cells.groupBy(_._2).view.mapValues(_.length)
    val want = byCell.map { case ((r, c), o) =>
      (o.toDouble / n) * (math.log(o.toDouble * n /
        (byR(r).toDouble * byC(c))) / math.log(2.0))
    }.sum
    // mi_bits is r4-rounded by the engine → half-ulp-of-1e-4 tolerance
    assert(math.abs(mi - want) < 6e-5)
    assert(mi >= 0.0)
  }

  // ---- q_ts_acf ----------------------------------------------------------

  test("ACF lag-1 equals a driver Pearson replay on the day census") {
    val rows = ops.Analytics.tsAcf(spark, sfDir)
      .as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === (1 to 7))
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(Det.dsum($"o_totalprice").as("r"))
      .as[(java.sql.Date, Double)].collect()
      .map { case (d, r) => d.toLocalDate.toEpochDay -> r }.toMap
    val pairs = daily.toSeq.flatMap { case (d, x) =>
      daily.get(d + 1).map(y => (x, y)) }
    assert(rows.head._2 === pairs.length.toLong)
    val n = pairs.length.toDouble
    val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
    val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    assert(math.abs(rows.head._3 - cov / (sx * sy)) < 1e-3)
    rows.foreach(r => assert(r._3 >= -1.0001 && r._3 <= 1.0001))
  }

  // ---- q_ts_ema ----------------------------------------------------------

  test("EMA equals an exact driver replay of the dyadic-weight fold") {
    val got = ops.Analytics.tsEma(spark, sfDir)
      .as[(java.sql.Date, Double)].collect()
      .map { case (d, e) => d.toLocalDate.toEpochDay -> e }.toMap
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate.toEpochDay -> c }.toMap
    assert(got.keySet === daily.keySet)
    daily.keys.take(50).foreach { t =>
      var num = 0L; var den = 0L
      (0 to 19).foreach { k =>
        daily.get(t - k).foreach { c =>
          num += c * (1L << (19 - k)); den += (1L << (19 - k)) * 100L
        }
      }
      assert(got(t) === num.toDouble / den.toDouble, s"day $t")
    }
  }

  // ---- q_events_power_users ----------------------------------------------

  test("power-user share equals the rank-window replay it replaces") {
    val (nUsers, totalEv, k, thr, topEv, share) =
      ops.Analytics.eventsPowerUsers(spark, sfDir)
        .as[(Long, Long, Long, Long, Long, Double)].head()
    val cnts = Tables(spark, sfDir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
      .select($"user_id", $"c").as[(Long, Long)].collect()
    assert(nUsers === cnts.length.toLong)
    assert(totalEv === cnts.map(_._2).sum)
    val wantK = cnts.length / 10
    assert(k === wantK.toLong)
    // explicit rank formulation: top-k users by (cnt desc, user_id)
    val top = cnts.sortBy { case (u, c) => (-c, u) }.take(wantK)
    assert(thr === top.last._2, "threshold = smallest top-decile count")
    assert(topEv === top.map(_._2).sum)
    assert(share === topEv.toDouble / totalEv.toDouble)
    // the top decile's share can't be below its user share (they are
    // the LARGEST counts): share ≥ k/n, with equality only if uniform
    assert(share * nUsers >= k.toDouble && share <= 1.0)
  }

  // ---- q_win_share_of_total ----------------------------------------------

  test("per-region shares sum to 1 and running share ends at 1") {
    val rows = ops.Windows.winShareOfTotal(spark, sfDir)
      .as[(Int, String, Double, Double, Double)].collect()
    rows.groupBy(_._1).foreach { case (rk, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-9, s"region $rk shares")
      assert(math.abs(g.last._5 - 1.0) < 1e-12, s"region $rk running")
      // running share is the prefix sum of shares in the emitted order
      var acc = 0.0
      g.foreach { r => acc += r._3; assert(r._5 > 0 && r._5 <= 1 + 1e-12) }
    }
    assert(rows.nonEmpty)
  }

  // ---- q_agg_filtered ----------------------------------------------------

  test("Q12 predicated counts match an unconditional replay") {
    val got = ops.Relational.aggFiltered(spark, sfDir)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val j = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp")
        && $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
      .join(Tables(spark, sfDir, "orders"), $"l_orderkey" === $"o_orderkey")
      .select($"l_returnflag", $"o_orderpriority")
      .as[(String, String)].collect()
    val want = j.groupBy(_._1).view.mapValues { g =>
      val hi = g.count(p => p._2 == "1-URGENT" || p._2 == "2-HIGH")
      (hi.toLong, (g.length - hi).toLong)
    }
    assert(got === want.toMap)
  }

  // ---- q_join_promo_share ------------------------------------------------

  test("promo share is a percentage and matches an exact decimal replay") {
    val (pct, n) = ops.Relational.joinPromoShare(spark, sfDir)
      .as[(Double, Long)].head()
    val j = Tables(spark, sfDir, "lineitem")
      .filter($"l_shipdate" >= lit("1997-09-01").cast("timestamp")
        && $"l_shipdate" < lit("1997-10-01").cast("timestamp"))
      .join(Tables(spark, sfDir, "part"), $"l_partkey" === $"p_partkey")
      .select($"p_type", $"l_extendedprice", $"l_discount")
      .as[(String, Double, Double)].collect()
    assert(n === j.length.toLong)
    def cents(p: Double, d: Double): BigDecimal =
      BigDecimal(p).setScale(2) * (1 - BigDecimal(d).setScale(2))
    val promo = j.filter(_._1 == "PROMO").map(r => cents(r._2, r._3)).sum
    val all = j.map(r => cents(r._2, r._3)).sum
    assert(pct === 100.0 * promo.toDouble / all.toDouble)
    assert(pct > 0 && pct < 100)
  }

  // ---- q_agg_parts_suppliers ---------------------------------------------

  test("Q16 head row's distinct-supplier count matches a replay") {
    val rows = ops.Relational.aggPartsSuppliers(spark, sfDir)
      .as[(String, String, Int, Long)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._4).sameElements(rows.map(_._4).sortBy(-_)))
    val (brand, tpe, size, cnt) = rows.head
    val bad = Tables(spark, sfDir, "supplier")
      .filter($"s_acctbal" < 0).select($"s_suppkey").as[Long].collect().toSet
    val want = Tables(spark, sfDir, "lineitem")
      .join(Tables(spark, sfDir, "part"), $"l_partkey" === $"p_partkey")
      .filter($"p_brand" === brand && $"p_type" === tpe && $"p_size" === size)
      .select($"l_suppkey").as[Long].collect()
      .filterNot(bad).distinct.length
    assert(cnt === want.toLong)
  }

  // ---- q_subquery_global_avg_anti ----------------------------------------

  test("Q22 gate: every reported segment census matches a driver replay") {
    val got = ops.Relational.subqueryGlobalAvgAnti(spark, sfDir)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val cust = Tables(spark, sfDir, "customer")
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
      .as[(Long, String, Double)].collect()
    val withOrders = Tables(spark, sfDir, "orders")
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
      .select($"o_custkey").distinct().as[Long].collect().toSet
    val pos = cust.filter(_._3 > 0)
    val avg = (pos.map(c => BigDecimal(c._3).setScale(2)).sum /
      pos.length).toDouble
    val want = cust
      .filter(c => c._3 > avg && !withOrders(c._1))
      .groupBy(_._2).view.mapValues { g =>
        (g.length.toLong,
          g.map(c => BigDecimal(c._3).setScale(2)).sum.toDouble)
      }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (seg, (n, tot)) =>
      assert(n === want(seg)._1, seg)
      assert(math.abs(tot - want(seg)._2) < 1e-6, seg)
    }
  }

  // ---- q_join_min_cost_supplier ------------------------------------------

  test("Q2 argmin: head part's best quote/supplier match a replay") {
    val rows = ops.Relational.joinMinCostSupplier(spark, sfDir)
      .as[(Long, Double, Long, Long)].collect()
    assert(rows.length === 15)
    val (pk, quote, sk, nsup) = rows.head
    val quotes = Tables(spark, sfDir, "lineitem")
      .filter($"l_partkey" === pk)
      .select($"l_suppkey", $"l_extendedprice")
      .as[(Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    assert(nsup === quotes.size.toLong)
    val best = quotes.values.min
    assert(quote === best)
    assert(sk === quotes.filter(_._2 == best).keys.min,
      "tie resolves to smallest suppkey")
  }

  // ---- q_quality_dsir ----------------------------------------------------

  test("DSIR scores: English docs rank above non-English on average") {
    val scored = ops.LlmOps.qualityDsir(spark, sfDir)
      .join(Tables(spark, sfDir, "documents").select($"doc_id", $"lang"),
        "doc_id")
      .select($"lang" === "en", $"dsir_score")
      .as[(Boolean, Double)].collect()
    val en = scored.filter(_._1).map(_._2)
    val rest = scored.filterNot(_._1).map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length,
      "target-language docs must score higher under the target model")
  }

  test("DSIR replay: one doc's score is the sum of its bigram weights") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    def bigrams(t: String): Seq[String] = {
      val w = t.split(" ", -1); w.dropRight(1).zip(w.drop(1))
        .map(p => p._1 + " " + p._2).toSeq
    }
    val all = docs.flatMap(d => bigrams(d._3).map(b => (b, d._2 == "en")))
    val tgt = all.filter(_._2).groupBy(_._1).view.mapValues(_.length)
    val tot = all.groupBy(_._1).view.mapValues(_.length)
    val probe = docs.filter(_._3.split(" ", -1).length >= 2).head
    val want = bigrams(probe._3).map { b =>
      val t = tgt.getOrElse(b, 0); val a = tot(b)
      math.log((t + 1).toDouble / (a - t + 1).toDouble)
    }.sum
    val got = ops.LlmOps.qualityDsir(spark, sfDir)
      .filter($"doc_id" === probe._1)
      .select($"dsir_score").as[Double].head()
    assert(math.abs(got - math.rint(want * 1e4) / 1e4) < 2e-4)
  }

  // ---- q_text_zipf -------------------------------------------------------

  test("Zipf fit: slope is negative and matches a driver OLS replay") {
    val (n, slope, intercept) = ops.LlmOps.textZipf(spark, sfDir)
      .as[(Long, Double, Double)].head()
    assert(slope < 0, "frequency must fall with rank")
    val freq = Tables(spark, sfDir, "documents")
      .select(explode(split($"text", " ")).as("t"))
      .filter($"t" =!= "").groupBy($"t").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect()
      .sortBy { case (t, c) => (-c, t) }.take(100)
    // sf0.001's vocabulary is under 100 tokens — the head is the
    // whole census there, the top-100 everywhere else
    assert(n === freq.length.toLong)
    val m = freq.length.toDouble
    val pts = freq.zipWithIndex.map { case ((_, c), i) =>
      (math.log((i + 1).toDouble), math.log(c.toDouble)) }
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val wantSlope = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(slope - wantSlope) < 1e-3)
    assert(math.abs(intercept - (sy - wantSlope * sx) / m) < 1e-3)
  }

  // ---- q_graph_jaccard_neighbors -----------------------------------------

  test("link prediction: pairs are non-adjacent and jaccard is exact") {
    val edges = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect()
    val adj = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .toSet
    val nbrs = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = ops.LlmOps.graphJaccardNeighbors(spark, sfDir)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, common, jac) =>
      assert(a < b)
      assert(!adj((a, b)), s"($a,$b) already adjacent")
      // common counts co-listing: |{h : a∈in(h) ∧ b∈in(h)}| — replay
      // from the out-neighbor sets' intersection
      val want = (nbrs(a) intersect nbrs(b)).size
      assert(common === want.toLong, s"($a,$b) common")
      assert(jac === common.toDouble /
        (nbrs(a).size + nbrs(b).size - common).toDouble)
    }
  }

  // ---- q_ts_cusum ----------------------------------------------------------

  test("declarative CUSUM equals the sequential recursion it replaces") {
    val got = ops.Analytics.tsCusum(spark, sfDir)
      .as[(java.sql.Date, Long, Long)].collect()
      .map(r => r._1.toLocalDate.toEpochDay -> r._3).toMap
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("c"))
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, c) => d.toLocalDate.toEpochDay -> c }
      .sortBy(_._1)
    val k = daily.map(_._2).sum / daily.length
    // the textbook sequential fold: S_t = max(0, S_{t-1} + x_t - k)
    var s = 0L
    val folded = daily.map { case (d, x) =>
      s = math.max(0L, s + x - k); d -> s
    }.toMap
    got.foreach { case (d, v) =>
      assert(v === folded(d), s"day $d")
    }
    assert(got.values.toSeq.sorted.reverse ===
      folded.values.toSeq.sorted.reverse.take(got.size),
      "reported rows are the global top-10 alarms")
  }

  // ---- q_win_rolling_corr --------------------------------------------------

  test("rolling 7-day corr matches a driver Pearson replay") {
    val rows = ops.Windows.winRollingCorr(spark, sfDir)
      .as[(java.sql.Date, Long, Long, Option[Double])].collect()
    val daily = Tables(spark, sfDir, "orders")
      .groupBy(to_date($"o_orderdate").as("d"))
      .agg(expr("sum(cast(round(o_totalprice * 100) as long)) DIV 100")
        .as("x"), count(lit(1)).as("y"))
      .as[(java.sql.Date, Long, Long)].collect()
      .sortBy(_._1.toLocalDate.toEpochDay)
    assert(rows.length === daily.length - 6)
    val byDay = daily.zipWithIndex.map { case (r, i) => r._1 -> i }.toMap
    rows.take(40).foreach { case (d, x, y, corr) =>
      val i = byDay(d)
      val win = daily.slice(i - 6, i + 1)
      assert(win.length === 7)
      assert(x === win.last._2 && y === win.last._3)
      val n = 7L
      val sx = win.map(_._2).sum; val sy = win.map(_._3).sum
      val sxy = win.map(r => r._2 * r._3).sum
      val sxx = win.map(r => r._2 * r._2).sum
      val syy = win.map(r => r._3 * r._3).sum
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (dx > 0 && dy > 0)
        assert(corr.get ===
          (n * sxy - sx * sy).toDouble /
            math.sqrt(dx.toDouble * dy.toDouble), s"day $d")
      else assert(corr.isEmpty, s"day $d: zero-variance window")
    }
  }

  // ---- q_except_all / q_intersect_all --------------------------------------

  test("EXCEPT ALL multiset census equals multiplicity arithmetic") {
    val got = ops.Relational.exceptAllKeys(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val lines = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    val urgent = Tables(spark, sfDir, "orders")
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey").as[Long].collect().toSet
    val want = lines.toSeq
      .map { case (k, n) => n - (if (urgent(k)) 1 else 0) }
      .filter(_ > 0)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got === want)
  }

  test("INTERSECT ALL keeps min multiplicity per value") {
    val got = ops.Relational.intersectAllKeys(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    val per = Tables(spark, sfDir, "lineitem")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect()
    val a = per.filter(_._1 % 2 == 0).groupBy(_._2).view.mapValues(_.length)
    val b = per.filter(_._1 % 2 != 0).groupBy(_._2).view.mapValues(_.length)
    val want = (a.keySet intersect b.keySet).map { n =>
      n -> math.min(a(n), b(n)).toLong
    }.toMap
    assert(got === want)
  }

  // ---- q_union_byname --------------------------------------------------------

  test("unionByName aligns by NAME and null-fills the missing columns") {
    val rows = ops.Relational.unionByNameEvolved(spark, sfDir)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val o = Tables(spark, sfDir, "orders")
    val nEven = o.filter($"o_orderkey" % 2 === 0).count()
    val nOdd = o.count() - nEven
    assert(rows("v1")._2 === nEven && rows("v2")._2 === nOdd)
    // v1 carries priority (no status); v2 the reverse — the null-fill
    assert(rows("v1")._3 === nEven && rows("v1")._4 === 0L)
    assert(rows("v2")._3 === 0L && rows("v2")._4 === nOdd)
  }

  // ---- q_agg_boolean -------------------------------------------------------

  test("boolean aggregates match per-group predicate replays") {
    val rows = ops.Aggregates.aggBoolean(spark, sfDir)
      .as[(String, String, Boolean, Boolean, Long, Long)].collect()
    val base = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_linestatus", $"l_discount",
        $"l_quantity", $"l_tax")
      .as[(String, String, Double, Double, Double)].collect()
      .groupBy(r => (r._1, r._2))
    rows.foreach { case (rf, ls, allD, anyQ, nTax, nLines) =>
      val g = base((rf, ls))
      assert(allD === g.forall(_._3 <= 0.10))
      assert(anyQ === g.exists(_._4 >= 49))
      assert(nTax === g.count(_._5 > 0.05).toLong)
      assert(nLines === g.length.toLong)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_anonymize_ldiversity ----------------------------------------------

  test("l-diversity rollup matches a driver census replay") {
    val (nc, nl, risk, minL, nRows) =
      ops.Quality.anonymizeLdiversity(spark, sfDir)
        .as[(Long, Long, Long, Long, Long)].head()
    val cust = Tables(spark, sfDir, "customer")
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000.0).cast("long"))
      .as[(Int, String, Long)].collect()
    val classes = cust.groupBy(c => (c._1, c._2)).view.mapValues { g =>
      (g.length, g.map(_._3).distinct.length)
    }.toMap
    assert(nc === classes.size.toLong)
    assert(nl === classes.values.count(_._2 < 3).toLong)
    assert(risk === classes.values.filter(_._2 < 3).map(_._1).sum.toLong)
    assert(minL === classes.values.map(_._2).min.toLong)
    assert(nRows === cust.length.toLong)
  }

  // ---- q_join_asof_forward -------------------------------------------------

  test("forward as-of equals a driver next-purchase scan") {
    val got = ops.Relational.joinAsofForward(spark, sfDir)
      .select($"event_id", $"next_purchase_ts")
      .as[(Long, Option[java.sql.Timestamp])].collect().toMap
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .as[(Long, Long, java.sql.Timestamp, String)].collect()
    val purchasesByUser = ev.filter(_._4 == "purchase")
      .groupBy(_._2).view.mapValues(_.map(_._3.getTime).sorted.toSeq).toMap
    val clicks = ev.filter(_._4 == "click")
    assert(got.size === clicks.length)
    clicks.foreach { case (id, u, ts, _) =>
      val want = purchasesByUser.getOrElse(u, Seq.empty[Long])
        .find(_ >= ts.getTime)
      assert(got(id).map(_.getTime) === want, s"click $id")
    }
  }

  // ---- q_events_cooccur ------------------------------------------------------

  test("co-occurrence lift matches a driver basket replay") {
    val rows = ops.Analytics.eventsCooccur(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val ed = Tables(spark, sfDir, "events")
      .select($"user_id", to_date($"ts"), $"event_type")
      .as[(Long, java.sql.Date, String)].collect().distinct
    val n = ed.map(r => (r._1, r._2)).distinct.length
    val singles = ed.groupBy(_._3).view.mapValues(_.length)
    val byBasket = ed.groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sorted)
    rows.foreach { case (ta, tb, nd, lift) =>
      assert(ta < tb)
      val want = byBasket.values.count(ts => ts.contains(ta) && ts.contains(tb))
      assert(nd === want.toLong, s"($ta,$tb)")
      assert(lift === (nd * n).toDouble /
        (singles(ta).toLong * singles(tb)).toDouble)
    }
  }

  // ---- q_win_frame_range_time -------------------------------------------------

  test("7-day RANGE frame counts match a driver replay (same-day peers)") {
    val rows = ops.Windows.winFrameRangeTime(spark, sfDir)
      .as[(Long, Long, java.sql.Timestamp, String, Long, Long)].collect()
    val byUser = rows.groupBy(_._2)
    byUser.take(10).foreach { case (_, g) =>
      val days = g.map(r => r._1 ->
        r._3.toLocalDateTime.toLocalDate.toEpochDay).toMap
      g.foreach { case (id, _, _, _, n7, np7) =>
        val d = days(id)
        val win = g.filter(r => {
          val rd = days(r._1); rd >= d - 6 && rd <= d
        })
        assert(n7 === win.length.toLong, s"event $id")
        assert(np7 === win.count(_._4 == "purchase").toLong, s"event $id")
      }
    }
    assert(rows.length === Tables(spark, sfDir, "events").count())
  }

  // ---- q_agg_regr ----------------------------------------------------------

  test("regression aggregates match a driver OLS replay") {
    val rows = ops.Aggregates.aggRegr(spark, sfDir)
      .as[(String, Double, Double, Double, Long)].collect()
    val base = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_extendedprice")
      .as[(String, Double, Double)].collect().groupBy(_._1)
    rows.foreach { case (flag, slope, intercept, r2, n) =>
      val g = base(flag)
      assert(n === g.length.toLong)
      val xs = g.map(_._2); val ys = g.map(_._3)
      val mx = xs.sum / n; val my = ys.sum / n
      val sxy = xs.zip(ys).map(p => (p._1 - mx) * (p._2 - my)).sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val syy = ys.map(y => (y - my) * (y - my)).sum
      val wSlope = sxy / sxx
      assert(math.abs(slope - wSlope) < 1e-3, flag)
      assert(math.abs(intercept - (my - wSlope * mx)) < 1e-2, flag)
      assert(math.abs(r2 - sxy * sxy / (sxx * syy)) < 1e-3, flag)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_agg_bitwise -------------------------------------------------------

  test("bitwise aggregates equal a driver fold") {
    val rows = ops.Aggregates.aggBitwise(spark, sfDir)
      .as[(String, Long, Long, Long, Long)].collect()
    val base = Tables(spark, sfDir, "orders")
      .select($"o_orderpriority", $"o_orderkey")
      .as[(String, Long)].collect().groupBy(_._1)
    rows.foreach { case (p, and, or, xor, n) =>
      val ks = base(p).map(_._2)
      assert(and === ks.reduce(_ & _), p)
      assert(or === ks.reduce(_ | _), p)
      assert(xor === ks.reduce(_ ^ _), p)
      assert(n === ks.length.toLong, p)
    }
    assert(rows.nonEmpty)
  }

  // ---- q_scalar_encode -----------------------------------------------------

  test("encode pack matches JDK digests on a sample row") {
    val row = ops.LlmOps // reuse nothing; direct call
    val r = ops.Scalars.encodeFuncs(spark, sfDir)
      .as[(Long, String, String, String, String, Int)].head()
    val text = Tables(spark, sfDir, "documents")
      .filter($"doc_id" === r._1).select($"text").as[String].head()
    def hexOf(alg: String): String =
      java.security.MessageDigest.getInstance(alg)
        .digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(r._2 === hexOf("MD5"))
    assert(r._3 === hexOf("SHA-256"))
    assert(r._4 === java.lang.Long.toHexString(r._1).toUpperCase)
    assert(r._5 === java.util.Base64.getEncoder.encodeToString(
      text.take(12).getBytes("UTF-8")))
    assert(r._6 === java.lang.Long.bitCount(r._1))
  }

  // ---- q_date_arith --------------------------------------------------------

  test("month arithmetic clamps end-of-month like java.time") {
    val rows = ops.Scalars.dateArith(spark, sfDir)
      .as[(Long, java.sql.Date, java.sql.Date, java.sql.Date, Int)]
      .collect()
    val src = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", to_date($"o_orderdate"))
      .as[(Long, java.sql.Date)].collect().toMap
    rows.take(200).foreach { case (k, p3, eom, ms, mi) =>
      val d = src(k).toLocalDate
      assert(p3.toLocalDate === d.plusMonths(3), k)
      assert(eom.toLocalDate ===
        d.withDayOfMonth(d.lengthOfMonth), k)
      assert(ms.toLocalDate === d.withDayOfMonth(1), k)
      assert(mi === d.getYear * 12 + d.getMonthValue, k)
    }
  }

  // ---- q_explode_outer -----------------------------------------------------

  test("posexplode_outer preserves empty-array parents as null rows") {
    val rows = ops.Generators.explodeOuter(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    val total = Tables(spark, sfDir, "documents").count()
    assert(rows.length.toLong === total,
      "every document survives the outer explode")
    rows.foreach { case (id, nRows, nToks, nNull) =>
      if (nToks == 0) assert(nRows === 1L && nNull === 1L, id)
      else assert(nRows === nToks && nNull === 0L, id)
    }
    assert(rows.exists(_._4 == 1L),
      "corpus must contain at least one no-long-token doc (else the " +
        "outer path is untested)")
  }

  // ---- q_split_train_test ------------------------------------------------

  test("split census: fractions sum to 1 per lang, counts to the corpus") {
    val rows = ops.LlmOps.splitTrainTest(spark, sfDir)
      .as[(String, String, Long, Double)].collect()
    val total = Tables(spark, sfDir, "documents").count()
    assert(rows.map(_._3).sum === total)
    rows.groupBy(_._1).foreach { case (lang, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-12, lang)
      assert(g.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    }
    // membership is id-deterministic: replay one lang's train count
    val want = Tables(spark, sfDir, "documents")
      .filter($"lang" === "en" && $"doc_id" % 100 < 80).count()
    assert(rows.find(r => r._1 == "en" && r._2 == "train")
      .map(_._3).getOrElse(0L) === want)
  }
}
