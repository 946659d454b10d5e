package graft

import org.apache.spark.sql.functions._

/** Round-9-session wave 2: classifier evaluation (AUC + confusion),
  * LPA community detection, embedding whitening, volume-weighted
  * percentiles. Each test is a driver replay (recompute the answer
  * imperatively from collected inputs, compare exactly) or a closed
  * identity; the DuckDB oracle gate covers the value-level hashes. */
class OpsRound15Spec extends SparkSpec {
  import spark.implicits._

  // ---- q_stats_auc ---------------------------------------------------------

  test("auc matches the brute-force pairwise P(pos > neg) + ties/2") {
    val scores = ops.Quality.classifierScores(spark, sfDir)
      .select($"score", ($"lang" === "en").as("pos"))
      .as[(Double, Boolean)].collect()
    val pos = scores.filter(_._2).map(_._1)
    val neg = scores.filterNot(_._2).map(_._1)
    assert(pos.nonEmpty && neg.nonEmpty)
    // O(P·N) driver replay of the probabilistic definition
    var num2 = 0L
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val expected = BigDecimal(num2.toDouble / (2.0 * pos.length * neg.length))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = ops.Quality.statsAuc(spark, sfDir).collect().head
    assert(row.getLong(0) === pos.length.toLong)
    assert(row.getLong(1) === neg.length.toLong)
    assert(row.getDouble(2) === expected)
  }

  test("auc is 1.0 / 0.5 on separable / constant toy corpora") {
    // separable: every positive scores above every negative
    def toy(rows: Seq[(Long, String, String)]) =
      rows.toDF("doc_id", "lang", "text")
        .withColumn("n_chars", length($"text").cast("long"))
        .withColumn("source", lit("s"))
    // separate dirs per toy corpus: overwriting parquet under a path a
    // prior query in this session already listed trips Spark's cached
    // file-listing (FILE_NOT_EXIST on the replaced part files)
    val dir = java.nio.file.Files.createTempDirectory("graft_auc").toString
    val dir2 = java.nio.file.Files.createTempDirectory("graft_auc2").toString
    // reuse the real op end-to-end by landing a corpus where 'en'
    // docs repeat a high-weight token and others a low-weight one:
    // find two single tokens of opposite classifier sign first
    val w = (t: String) => {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(md5.substring(0, 12), 16) % 64
      ((bucket * 2654435761L) % 201) - 100
    }
    val tokens = (0 until 100).map(i => s"tok$i")
    val hi = tokens.find(w(_) > 0).get
    val lo = tokens.find(w(_) < 0).get
    toy((0L until 10L).map(i =>
      (i, if (i < 5) "en" else "de", if (i < 5) hi else lo)))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = ops.Quality.statsAuc(spark, dir).collect().head
    assert(r.getDouble(2) === 1.0)
    // constant score: AUC collapses to the tie term 0.5
    toy((0L until 10L).map(i =>
      (i, if (i < 5) "en" else "de", hi)))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val r2 = ops.Quality.statsAuc(spark, dir2).collect().head
    assert(r2.getDouble(2) === 0.5)
  }

  // ---- q_eval_confusion ----------------------------------------------------

  test("confusion matrix replays from the scores and metrics check out") {
    val s = ops.Quality.classifierScores(spark, sfDir)
      .select(($"score_int" > 0).as("pred"), ($"lang" === "en").as("truth"))
      .as[(Boolean, Boolean)].collect()
    val tp = s.count(x => x._1 && x._2).toLong
    val fp = s.count(x => x._1 && !x._2).toLong
    val fn = s.count(x => !x._1 && x._2).toLong
    val tn = s.count(x => !x._1 && !x._2).toLong
    val row = ops.Eval.evalConfusion(spark, sfDir).collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      === ((tp, fp, fn, tn)))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(4) === r4(tp.toDouble / (tp + fp)))
    assert(row.getDouble(5) === r4(tp.toDouble / (tp + fn)))
    assert(row.getDouble(6) === r4(2.0 * tp / (2 * tp + fp + fn)))
    assert(row.getDouble(7) === r4((tp + tn).toDouble / s.length))
  }

  // ---- q_graph_label_prop --------------------------------------------------

  test("label propagation replays 3 synchronous mode rounds exactly") {
    val und = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .select(least($"vec_id", $"nbr_id").as("lo"),
        greatest($"vec_id", $"nbr_id").as("hi"))
      .distinct().as[(Long, Long)].collect()
    val nodes = Tables(spark, sfDir, "embeddings")
      .select($"vec_id").as[Long].collect().sorted
    val nbrs = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lbl = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lbl = nodes.map { n =>
        n -> (nbrs.get(n) match {
          case None => lbl(n)
          case Some(ns) =>
            // mode of neighbor labels, ties to the smallest label
            ns.groupBy(lbl).map { case (l, xs) => (l, xs.length) }
              .toSeq.minBy { case (l, c) => (-c, l) }._1
        })
      }.toMap
    }
    val expected = lbl.values.groupBy(identity)
      .map { case (c, xs) => (c, xs.size.toLong,
        lbl.collect { case (n, l) if l == c => n }.min) }
      .toSeq.sortBy(_._1)
    val got = ops.LlmOps.graphLabelProp(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // census covers the node set exactly
    assert(got.map(_._2).sum === nodes.length.toLong)
  }

  // ---- q_embed_whiten ------------------------------------------------------

  test("whitened dims have ~zero mean and unit variance; replay exact") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val n = emb.length
    val dims = emb.head._2.length
    val q = emb.map { case (id, v) =>
      id -> v.map(x => math.floor(x.toDouble * 10000).toLong) }
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = {
      val mu = Array.tabulate(dims) { d =>
        q.map(_._2(d)).sum.toDouble / n }
      val sd = Array.tabulate(dims) { d =>
        val s2 = q.map(v => v._2(d) * v._2(d)).sum.toDouble / n
        math.sqrt(math.max(s2 - mu(d) * mu(d), 0.0)) }
      q.map { case (id, v) =>
        id -> Array.tabulate(dims) { d =>
          if (sd(d) > 0) r4((v(d) - mu(d)) / sd(d)) else 0.0 } }.toMap
    }
    val got = ops.LlmOps.embedWhiten(spark, sfDir)
      .select($"vec_id", $"whitened_q", $"wnorm")
      .as[(Long, String, Double)].collect()
      .map { case (id, s, norm) =>
        // whitened_q serializes round(w*1e4) ints — decode back to w
        (id, s.split(',').map(_.toLong / 10000.0), norm) }
    assert(got.length === n)
    got.foreach { case (id, w, norm) =>
      assert(w.toSeq === expected(id).toSeq, s"vec $id")
      // wnorm folds the UNSERIALIZED doubles; the 1e-4 lattice decode
      // is exact here because r4-rounded w has no residue below 1e-4
      assert(norm === r4(math.sqrt(
        w.foldLeft(0.0)((a, x) => a + x * x))))
    }
    // post-hoc sanity: each dim's whitened mean ~0, variance ~1
    // (rounding noise only)
    for (d <- 0 until dims) {
      val col = got.map(_._2(d))
      val m = col.sum / n
      assert(math.abs(m) < 0.01, s"dim $d mean $m")
      val v = col.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(v - 1.0) < 0.05, s"dim $d var $v")
    }
  }

  // ---- q_embed_pca_power ---------------------------------------------------

  test("power-iteration PC replays exactly and captures max variance") {
    val emb = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val n = emb.length
    val d = emb.head._2.length
    val q = emb.map(_._2.map(x => math.floor(x.toDouble * 10000).toLong))
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // exact-long covariance moments, then the same 4 rounds
    val s = Array.tabulate(d)(i => q.map(_(i)).sum)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val sij = q.map(v => v(i) * v(j)).sum
      sij.toDouble / n - (s(i).toDouble / n) * (s(j).toDouble / n)
    }
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 4) {
      // fold in ascending j order — the op's declared fold order
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(0.0)((acc, j) => acc + cov(i)(j) * v(j)))
      val m = w.map(math.abs).max
      v = w.map(_ / m)
    }
    val nrm = math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
    val expected = v.map(x => r4(x / nrm))
    val got = ops.LlmOps.embedPcaPower(spark, sfDir)
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq === expected.toSeq)
    // the found direction carries more variance than any single axis
    // (the whole point of the diagnostic): vᵀCv >= max_i C_ii
    val u = v.map(_ / nrm)
    val rayleigh = (0 until d).map(i =>
      u(i) * (0 until d).map(j => cov(i)(j) * u(j)).sum).sum
    val maxAxis = (0 until d).map(i => cov(i)(i)).max
    assert(rayleigh >= maxAxis * 0.999,
      s"rayleigh $rayleigh < max axis variance $maxAxis")
  }

  // ---- q_files_gc ----------------------------------------------------------

  test("gc deletes exactly the planted orphans and re-runs identically") {
    val dir = sources.Sources.filesLandDir(sfDir)
    val run1 = sources.Sources.filesGc(spark, sfDir)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(run1.nonEmpty)
    // every reported orphan is the planted fixture, marked deleted,
    // and actually gone from disk
    run1.foreach { case (rel, n, deleted) =>
      assert(rel.startsWith("orphan_") && rel.endsWith(".txt"), rel)
      val id = rel.stripPrefix("orphan_").stripSuffix(".txt").toLong
      assert(id % 499 === 0L)
      assert(n === s"orphan $id\n".getBytes("UTF-8").length.toLong)
      assert(deleted)
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, rel)))
    }
    // catalog-listed files survive the GC
    val survivors = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir)).toArray.map(_.toString)
    assert(survivors.nonEmpty)
    assert(survivors.forall(p => !p.contains("orphan_")))
    // idempotent replay: the fixture replants, the manifest repeats
    val run2 = sources.Sources.filesGc(spark, sfDir)
      .as[(String, Long, Boolean)].collect().toSeq
    assert(run2 === run1)
  }

  // ---- q_agg_weighted_percentile -------------------------------------------

  test("weighted percentiles replay: smallest length covering the mass") {
    val docs = Tables(spark, sfDir, "documents")
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val lens = xs.map(_._2).sorted
      val total = lens.sum
      def pick(num: Long, den: Long): Long = {
        var cum = 0L
        lens.find { l => cum += l; cum * den >= total * num }.get
      }
      (src, total, pick(1, 2), pick(9, 10))
    }.toSeq.sortBy(_._1)
    val got = ops.Aggregates.aggWeightedPercentile(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    // the weighted p50 sits at or above the unweighted median: long
    // docs carry more mass than count
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val lens = xs.map(_._2).sorted
      val unweightedMed = lens(lens.length / 2)
      val wp50 = got.find(_._1 == src).get._3
      assert(wp50 >= unweightedMed, s"$src: $wp50 < $unweightedMed")
    }
  }
}
