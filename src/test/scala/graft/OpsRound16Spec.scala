package graft

import org.apache.spark.sql.functions._

/** Round-10-session wave A: Kendall τ-b, classifier calibration +
  * average precision, CCNet perplexity terciles, feature-hashing
  * census, Adamic–Adar link prediction, linear gap interpolation.
  * Each test replays the declared result imperatively from collected
  * inputs (the DuckDB oracle gate covers the value-level hashes). */
class OpsRound16Spec extends SparkSpec {
  import spark.implicits._

  private def r4d(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  // ---- q_stats_kendall -----------------------------------------------------

  test("kendall tau-b matches the O(n²) pairwise replay") {
    val pts = Tables(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("long"),
        floor($"l_extendedprice" / 1000).cast("long"))
      .as[(Long, Long)].collect()
    var c = 0L; var d = 0L
    var i = 0
    while (i < pts.length) {
      var j = i + 1
      while (j < pts.length) {
        val s = (pts(i)._1 - pts(j)._1).sign * (pts(i)._2 - pts(j)._2).sign
        if (s > 0) c += 1 else if (s < 0) d += 1
        j += 1
      }
      i += 1
    }
    val n = pts.length.toLong
    val n1 = pts.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1))
      .sum
    val n2 = pts.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1))
      .sum
    val expected = r4d(2.0 * (c - d)
      / math.sqrt((n * (n - 1) - n1).toDouble * (n * (n - 1) - n2).toDouble))
    val row = ops.Quality.statsKendall(spark, sfDir).collect().head
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === c)
    assert(row.getLong(2) === d)
    assert(row.getDouble(3) === expected)
  }

  test("kendall is ±1 on perfectly monotone toy inputs") {
    // the grid machinery must reduce to the textbook value when every
    // pair is concordant / discordant: 20 tie-free points with pb a
    // strictly increasing (then decreasing) function of qv
    val up = (1L to 20L).map(q => (q, 2 * q)).toDF("qv", "pb")
    val upRow = ops.Quality.statsKendallOn(up).collect().head
    assert(upRow.getLong(0) === 20L)
    assert(upRow.getLong(1) === 190L) // all C(20,2) pairs concordant
    assert(upRow.getLong(2) === 0L)
    assert(upRow.getDouble(3) === 1.0)
    val down = (1L to 20L).map(q => (q, -2 * q)).toDF("qv", "pb")
    val downRow = ops.Quality.statsKendallOn(down).collect().head
    assert(downRow.getLong(1) === 0L)
    assert(downRow.getLong(2) === 190L)
    assert(downRow.getDouble(3) === -1.0)
  }

  test("kendall on the corpus stays in [-1, 1] and ties shrink C+D") {
    val row = ops.Quality.statsKendall(spark, sfDir).collect().head
    val tau = row.getDouble(3)
    assert(tau >= -1.0 && tau <= 1.0)
    // the banded domains carry heavy ties, so C+D < n(n−1)/2 strictly
    val n = row.getLong(0)
    assert(row.getLong(1) + row.getLong(2) < n * (n - 1) / 2)
  }

  // ---- q_eval_calibration --------------------------------------------------

  test("calibration bins match the integer-binned replay") {
    val docs = ops.Quality.classifierScores(spark, sfDir)
      .select($"score_int", greatest($"n_tokens", lit(1)).as("nt"),
        ($"lang" === "en").as("truth"))
      .as[(Long, Long, Boolean)].collect()
    val byBin = docs.groupBy { case (si, nt, _) =>
      math.min(9L, (si + 100L * nt) / (20L * nt))
    }
    val got = ops.Eval.evalCalibration(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === byBin.keySet)
    byBin.foreach { case (bin, rows) =>
      val (n, np, conf, acc) = got(bin)
      assert(n === rows.length.toLong)
      assert(np === rows.count(_._3).toLong)
      // mirror the op's tree exactly: per-doc conf quantized by EXACT
      // integer HALF_UP of the rational p/q (the r4-on-double form
      // flips on true decimal half-ties like 0.25375 — the r11 x10
      // gate finding), exact long sum → ONE divide → r4
      val confSum4 = rows.map { case (si, nt, _) =>
        (20000L * (si + 100L * nt) + 200L * nt) / (400L * nt) }.sum
      assert(conf === r4d(confSum4.toDouble / (rows.length * 10000.0)))
      assert(acc === r4d(np.toDouble / n))
    }
  }

  // ---- q_eval_pr_auc -------------------------------------------------------

  test("average precision matches the sorted-threshold replay") {
    val scored = ops.Quality.classifierScores(spark, sfDir)
      .select($"score", ($"lang" === "en").as("pos"))
      .as[(Double, Boolean)].collect()
    val census = scored.groupBy(_._1).map { case (s, g) =>
      (s, g.count(_._2).toLong, g.length.toLong) }
      .toSeq.sortBy(-_._1)
    var cumP = 0L; var cumA = 0L
    var apNum = BigDecimal(0)
    census.foreach { case (_, np, na) =>
      cumP += np; cumA += na
      apNum += BigDecimal(np) * BigDecimal(r4d(cumP.toDouble / cumA))
    }
    val totP = census.map(_._2).sum
    val row = ops.Eval.evalPrAuc(spark, sfDir).collect().head
    assert(row.getLong(0) === totP)
    assert(row.getLong(1) === census.map(_._3).sum - totP)
    assert(row.getDouble(2) === r4d((apNum / totP).toDouble))
    // AP of a real ranking sits between prevalence (random) and 1
    assert(row.getDouble(2) >= row.getDouble(3) - 0.05)
    assert(row.getDouble(2) <= 1.0)
  }

  // ---- q_stats_kruskal -------------------------------------------------------

  test("kruskal-wallis H matches the pooled-midrank replay") {
    val pts = Tables(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("long"), $"l_returnflag")
      .as[(Long, String)].collect()
    // pooled doubled midranks per distinct value
    val census = pts.groupBy(_._1).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    var cum = 0L
    val dr = census.map { case (v, n) =>
      cum += n; (v, 2 * cum - n + 1) }.toMap
    val groups = pts.groupBy(_._2)
    val n = pts.length.toLong
    val sumT = groups.values.map { g =>
      val d = g.map(p => dr(p._1)).sum.toDouble
      d * d / (4.0 * g.length)
    }.sum
    val h = 12.0 / (n.toDouble * (n + 1)) * sumT - 3.0 * (n + 1)
    val tie3 = census.map { case (_, t) => t.toDouble * t * t - t }.sum
    val corr = 1.0 - tie3 / (n.toDouble * n * n - n)
    val row = ops.Quality.statsKruskal(spark, sfDir).collect().head
    assert(Set(row.getLong(0), row.getLong(1), row.getLong(2)) ===
      groups.values.map(_.length.toLong).toSet)
    assert(math.abs(row.getDouble(3) - h) < 2e-4)
    assert(math.abs(row.getDouble(4) - h / corr) < 2e-4)
  }

  // ---- q_eval_brier ----------------------------------------------------------

  test("brier score matches the exact-decimal replay") {
    val docs = ops.Quality.classifierScores(spark, sfDir)
      .select($"score", ($"lang" === "en").as("truth"))
      .as[(Double, Boolean)].collect()
    val sq = docs.map { case (s, t) =>
      val p = BigDecimal(r4d((s + 100.0) / 200.0))
      val d = p - (if (t) 1 else 0)
      d * d
    }.sum
    val np = docs.count(_._2).toLong
    val row = ops.Eval.evalBrier(spark, sfDir).collect().head
    assert(row.getLong(0) === docs.length.toLong)
    assert(row.getLong(1) === np)
    assert(row.getDouble(2) === r4d(sq.toDouble / docs.length))
    val prev = np.toDouble / docs.length
    assert(row.getDouble(3) === r4d(prev * (1.0 - prev)))
    // a ranking-useful classifier should beat the no-skill reference
    assert(row.getDouble(2) <= row.getDouble(3) + 0.1)
  }

  // ---- q_eval_lift -----------------------------------------------------------

  test("lift table matches the sorted-census replay") {
    val scored = ops.Quality.classifierScores(spark, sfDir)
      .select($"score", ($"lang" === "en").as("pos"))
      .as[(Double, Boolean)].collect()
    val census = scored.groupBy(_._1).map { case (s, g) =>
      (s, g.count(_._2).toLong, g.length.toLong) }.toSeq.sortBy(-_._1)
    val nTotal = scored.length.toLong
    var cumAll = 0L
    val cells = census.map { case (_, np, na) =>
      cumAll += na
      ((cumAll - 1) * 10 / nTotal, np, na)
    }
    val byDecile = cells.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, g) => (d, g.map(_._3).sum, g.map(_._2).sum) }
    val totPos = census.map(_._2).sum
    var cd = 0L; var cp = 0L
    val expected = byDecile.map { case (d, nd, np) =>
      cd += nd; cp += np
      (d, nd, np, r4d(cp.toDouble / totPos),
        r4d((cp.toDouble / cd) / (totPos.toDouble / nTotal)))
    }
    val got = ops.Eval.evalLift(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq === expected)
    // capture is monotone and ends at 1.0
    assert(got.last._4 === 1.0)
    assert(got.map(_._4).sliding(2).forall(w => w(0) <= w(1)))
  }

  // ---- q_quality_ccnet -----------------------------------------------------

  test("ccnet terciles match the per-lang sorted replay") {
    val nlp = ops.LlmOps.textPerplexity(spark, sfDir)
      .select($"doc_id", round($"avg_neg_logprob" * 10000).cast("long"))
      .as[(Long, Long)].collect().toMap
    val langs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val expected = langs.groupBy(_._2).flatMap { case (lang, docs) =>
      val census = docs.map(d => nlp(d._1)).groupBy(identity)
        .map { case (v, g) => (v, g.size.toLong) }.toSeq.sortBy(_._1)
      val nLang = census.map(_._2).sum
      var cum = 0L
      census.map { case (v, n) =>
        cum += n
        val bucket = if (cum * 3 <= nLang) "head"
          else if (cum * 3 <= nLang * 2) "middle" else "tail"
        ((lang, bucket), (n, v * n))
      }.groupBy(_._1).map { case (k, g) =>
        (k, (g.map(_._2._1).sum, g.map(_._2._2).sum)) }
    }
    val got = ops.LlmOps.qualityCcnet(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (n, s)) =>
      assert(got(k)._1 === n, s"n_docs for $k")
      assert(got(k)._2 === r4d(s.toDouble / (10000.0 * n)),
        s"mean_neg_logprob for $k")
    }
  }

  test("ccnet tercile counts differ by at most one tie cell per lang") {
    val rows = ops.LlmOps.qualityCcnet(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val total = bs.map(_._3).sum
      bs.foreach { case (_, _, n) =>
        // whole-cell assignment: a bucket can deviate from n/3 only by
        // the mass of its boundary tie cells — sanity-bound it loosely
        assert(n > 0, s"$lang has an empty tercile")
        assert(n <= total, s"$lang bucket exceeds lang total")
      }
    }
  }

  // ---- q_text_hashing_trick ------------------------------------------------

  test("feature-hashing census matches the md5-prefix replay") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def bucket(t: String): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md5.substring(0, 8), 16) % 64
    }
    val toks = docs.flatMap { case (id, text) =>
      text.split(" ").filter(_.nonEmpty).map(t => (bucket(t), id, t)) }
    val expected = toks.groupBy(_._1).map { case (b, g) =>
      (b, (g.length.toLong, g.map(_._2).distinct.length.toLong,
        g.map(_._3).distinct.length.toLong)) }
    val got = ops.LlmOps.textHashingTrick(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
  }

  // ---- q_graph_adamic_adar ---------------------------------------------------

  test("adamic-adar scores match the replay over the kNN edges") {
    val e = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect()
    val indeg = e.groupBy(_._2).map { case (h, g) => (h, g.length) }
    val w = indeg.collect { case (h, d) if d >= 2 =>
      (h, math.floor(1000000.0 / math.log(d.toDouble)).toLong) }.toMap
    val byHub = e.groupBy(_._2)
    val adj = e.map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val pairs = byHub.toSeq.flatMap { case (h, g) =>
      val nodes = g.map(_._1).distinct.sorted
      for (i <- nodes.indices; j <- (i + 1) until nodes.length)
        yield ((nodes(i), nodes(j)), h)
    }.groupBy(_._1).collect {
      case (p, hs) if !adj.contains(p) =>
        (p, hs.length.toLong, hs.map(x => w(x._2)).sum)
    }.toSeq
    val top = pairs.sortBy { case ((a, b), _, aa) => (-aa, a, b) }.take(20)
    val got = ops.LlmOps.graphAdamicAdar(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === top)
  }

  // ---- q_join_asof_nearest ---------------------------------------------------

  test("nearest as-of picks the closer side, ties backward") {
    val ev = Tables(spark, sfDir, "events")
      .select($"event_id", $"user_id", unix_micros($"ts"), $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val clicksByUser = ev.filter(_._4 == "click")
      .groupBy(_._2).view.mapValues(_.map(_._3).sorted)
      .toMap
    val expected = ev.filter(_._4 == "purchase").sortBy(_._1).map {
      case (id, u, t, _) =>
        val cs = clicksByUser.getOrElse(u, Array.empty[Long])
        val prev = cs.filter(_ <= t).lastOption
        val next = cs.find(_ > t)
        val (nearest, dist, dir) = (prev, next) match {
          case (None, None) => (None, None, "none")
          case (Some(p), None) => (Some(p), Some(t - p), "backward")
          case (None, Some(nx)) => (Some(nx), Some(nx - t), "forward")
          case (Some(p), Some(nx)) =>
            if (t - p <= nx - t) (Some(p), Some(t - p), "backward")
            else (Some(nx), Some(nx - t), "forward")
        }
        (id, nearest, dist, dir)
    }
    val got = ops.Relational.joinAsofNearest(spark, sfDir)
      .select($"event_id", unix_micros($"nearest_click_ts"),
        $"distance_us", $"direction")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getString(3)))
    assert(got.toSeq === expected.toSeq)
  }

  // ---- q_stats_cohens_kappa ----------------------------------------------------

  test("cohen's kappa matches the 2x2 replay") {
    val docs = ops.Quality.classifierScores(spark, sfDir)
      .select(($"score_int" > 0).as("a"),
        ($"n_tokens" >= 20 && $"n_tokens" <= 90).as("b"))
      .as[(Boolean, Boolean)].collect()
    val n11 = docs.count(d => d._1 && d._2).toLong
    val n10 = docs.count(d => d._1 && !d._2).toLong
    val n01 = docs.count(d => !d._1 && d._2).toLong
    val n00 = docs.count(d => !d._1 && !d._2).toLong
    val n = docs.length.toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01).toDouble
      + (n01 + n00) * (n10 + n00).toDouble) / (n * n)
    val row = ops.Quality.statsCohensKappa(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3)) === ((n11, n10, n01, n00)))
    assert(math.abs(row.getDouble(6) - (po - pe) / (1.0 - pe)) < 2e-4)
    assert(row.getDouble(6) >= -1.0 && row.getDouble(6) <= 1.0)
  }

  // ---- q_graph_assortativity ---------------------------------------------------

  test("assortativity matches the symmetrized-edge Pearson replay") {
    val e = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select($"vec_id", $"nbr_id").as[(Long, Long)].collect()
    val und = e.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .distinct
    val both = und ++ und.map(p => (p._2, p._1))
    val deg = both.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val m = both.length.toDouble
    val sx = both.map(p => deg(p._1)).sum.toDouble
    val sxx = both.map(p => deg(p._1) * deg(p._1)).sum.toDouble
    val sxy = both.map(p => deg(p._1) * deg(p._2)).sum.toDouble
    val r = (m * sxy - sx * sx) / (m * sxx - sx * sx)
    val row = ops.LlmOps.graphAssortativity(spark, sfDir).collect().head
    assert(row.getLong(0) === und.length.toLong)
    assert(math.abs(row.getDouble(1) - r) < 2e-4)
    assert(row.getDouble(1) >= -1.0 && row.getDouble(1) <= 1.0)
  }

  // ---- q_dedup_phash_hamming -------------------------------------------------

  test("phash hamming pairs are exactly the brute-force near set") {
    val vocab = ops.LlmOps.multimodalPhash(spark, sfDir)
      .select($"phash", $"keep_id", $"n_images")
      .as[(String, Long, Long)].collect()
    def split(p: String) = {
      val i = p.indexOf(':'); (p.substring(0, i), p.substring(i + 1))
    }
    // brute-force ground truth over the distinct-hash vocabulary
    val expected = (for {
      a <- vocab; b <- vocab
      if a._2 < b._2
      (da, ba) = split(a._1); (db, bb) = split(b._1)
      if da == db
      h = ba.zip(bb).count { case (x, y) => x != y }
      if h >= 1 && h <= 3
    } yield (a._2, b._2, h, a._3, b._3))
      .sortBy { case (ka, kb, h, _, _) => (h, ka, kb) }
    val got = ops.LlmOps.dedupPhashHamming(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected.toSeq)
    assert(got.nonEmpty)  // the fixture exercises the near band
  }

  // ---- q_graph_kcore ---------------------------------------------------------

  test("6-round k-core equals true fixpoint peeling") {
    // rebuild the op's own top-5 edge derivation imperatively
    val emb = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding", $"label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def bucket(e: Array[Float]): Long =
      (0 until 8).map(i => if (e(i) > 0) 1L << i else 0L).sum
    def r4d(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val byBucket = emb.groupBy(v => bucket(v._2))
    val edges = emb.flatMap { case (id, e) =>
      byBucket(bucket(e)).filter(_._1 != id)
        .map { case (nid, ne) =>
          var s = 0.0; var i = 0
          while (i < e.length) { s += e(i).toDouble * ne(i).toDouble; i += 1 }
          (nid, r4d(s))
        }
        .sortBy { case (nid, sim) => (-sim, nid) }
        .take(5).map(p => (id, p._1))
    }
    var cur = edges.flatMap(p => Seq((p._1, p._2), (p._2, p._1))).distinct
    var stable = false
    var rounds = 0
    while (!stable) {
      rounds += 1
      val keep = cur.groupBy(_._1).collect {
        case (n, g) if g.size >= 4 => n }.toSet
      val nxt = cur.filter(p => keep(p._1) && keep(p._2))
      stable = nxt.length == cur.length
      cur = nxt
    }
    assert(rounds <= 6, s"fixpoint took $rounds rounds — raise the bound")
    val expected = cur.groupBy(_._1).view
      .mapValues(_.size.toLong).toMap
    val got = ops.LlmOps.graphKcore(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  // ---- q_stats_levene --------------------------------------------------------

  test("brown-forsythe W matches the integer-median replay") {
    val pts = Tables(spark, sfDir, "lineitem")
      .select($"l_returnflag", $"l_quantity".cast("long"))
      .as[(String, Long)].collect()
    val groups = pts.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def med2(xs: Array[Long]): Long =
      xs((xs.length + 1) / 2 - 1) + xs(xs.length / 2 + 1 - 1)
    val z = groups.map { case (f, xs) =>
      val m2 = med2(xs); (f, xs.map(x => math.abs(2 * x - m2))) }
    val ordered = Seq("A", "N", "R").map(z(_))
    val ns = ordered.map(_.length.toLong)
    val szs = ordered.map(_.sum)
    val szzs = ordered.map(_.map(v => BigInt(v) * v).sum)
    val b1 = (szs, ns).zipped.map((s, n) =>
      s.toDouble * s.toDouble / n.toDouble).sum
    val within = (szzs, szs, ns).zipped.map((zz, s, n) =>
      zz.toDouble - s.toDouble * s.toDouble / n.toDouble).sum
    val szt = szs.map(_.toDouble).sum
    val n = ns.sum.toDouble
    val w = ((n - 3.0) / 2.0) * ((b1 - szt * szt / n) / within)
    val row = ops.Quality.statsLevene(spark, sfDir).collect().head
    assert(row.getLong(0) === ns.sum)
    assert(math.abs(row.getDouble(2) - w) < 2e-4)
  }

  // ---- q_ts_interpolate ------------------------------------------------------

  test("interpolation preserves observations and fills gaps linearly") {
    val hourly = Tables(spark, sfDir, "events")
      .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
      .agg((sum($"value".cast(org.apache.spark.sql.types
        .DecimalType(27, 4))) * 10000).cast("long").as("q"))
      .as[(String, java.sql.Timestamp, Long)].collect()
      .map(t => ((t._1, t._2.getTime / 3600000), t._3)).toMap
    val rows = ops.Analytics.tsInterpolate(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime / 3600000,
        r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    // (1) every actual bucket survives bit-identically, flagged 0
    rows.filter(_._4 == 0).foreach { case (t, hh, v, _) =>
      assert(hourly((t, hh)).toDouble / 10000.0 === v) }
    // (2) gaps are flagged and linearly interpolated between the
    //     nearest observations in exact integer arithmetic
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, series) =>
      val s = series.sortBy(_._2)
      // dense grid: consecutive hours, endpoints observed
      assert(s.head._4 == 0 && s.last._4 == 0)
      s.sliding(2).foreach(w => assert(w(1)._2 - w(0)._2 === 1))
      s.filter(_._4 == 1).foreach { case (_, hh, v, _) =>
        val prev = s.filter(x => x._2 < hh && x._4 == 0).maxBy(_._2)
        val next = s.filter(x => x._2 > hh && x._4 == 0).minBy(_._2)
        val pv = hourly((t, prev._2)); val nv = hourly((t, next._2))
        val expected = (pv * (next._2 - hh) + nv * (hh - prev._2)) /
          (next._2 - prev._2)
        assert(v === expected.toDouble / 10000.0,
          s"interpolated $t@$hh")
      }
    }
    // the fixture actually exercises interpolation
    assert(rows.exists(_._4 == 1))
  }
}
