package graft

import graft.ops.{Analytics, Graph, LlmOps}
import org.apache.spark.sql.functions._

/** Round-2 operators: graph components, prefix-filtered Jaccard,
  * curation sampling/mixing/masking, funnel/retention analytics. */
class OpsRound2Spec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels every node with its component min") {
    val nodes = (0L to 9L).toDF("id")
    // two components {0,1,2,3} (path) and {5,6,7} (triangle); 4,8,9 singletons
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (5L, 6L), (6L, 7L), (5L, 7L))
      .toDF("src", "dst")
    val got = Graph.connectedComponents(nodes, edges)
      .orderBy($"id").as[(Long, Long)].collect()
    assert(got === Seq(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 9L))
  }

  test("q_dedup_cluster components are consistent with the pair graph") {
    val pairs = LlmOps.dedupNgramJaccard(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect()
    val comp = LlmOps.dedupCluster(spark, sfDir)
      .as[(Long, Long)].collect().toMap
    // every near-dup pair shares a component; component is the min id
    pairs.foreach { case (a, b) =>
      assert(comp(a) === comp(b), s"pair ($a,$b) split across components")
    }
    comp.foreach { case (id, c) => assert(c <= id) }
  }

  test("prefix-filtered Jaccard equals the single-pass formulation") {
    val a = LlmOps.dedupNgramJaccard(spark, sfDir).collect().toSeq
    val b = LlmOps.dedupJaccardPrefix(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("stratified sample hits the per-language rates") {
    val full = Tables(spark, sfDir, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val got = LlmOps.sampleStratified(spark, sfDir)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    // systematic rate: key-mod and language are only independent-ish,
    // so allow sampling noise around the target at this tiny sf
    assert(math.abs(got("en") - full("en") / 5.0) <= 0.5 * full("en") / 5.0)
    assert(math.abs(got("zh") - full("zh") / 2.0) <= 0.5 * full("zh") / 2.0)
    assert(got("de") === full("de"))
  }

  test("funnel stages are monotonically shrinking") {
    val byStage = Analytics.eventsFunnel(spark, sfDir)
      .as[(Int, Long)].collect().toMap
    val reach3 = byStage.getOrElse(3, 0L)
    val reach2 = reach3 + byStage.getOrElse(2, 0L)
    val reach1 = reach2 + byStage.getOrElse(1, 0L)
    assert(reach3 <= reach2 && reach2 <= reach1)
    assert(byStage.values.sum ===
      Tables(spark, sfDir, "events").select($"user_id").distinct().count())
  }

  test("retention cohort week 0 covers every cohort user") {
    val r = Analytics.retentionCohort(spark, sfDir)
    assert(r.filter($"week_offset" === 0).count() > 0)
    // offsets are never negative (first week is by definition minimal)
    assert(r.filter($"week_offset" < 0).count() === 0)
  }

  test("pii mask removes every digit") {
    val masked = LlmOps.textPiiMask(spark, sfDir)
    assert(masked.filter($"masked_text".rlike("[0-9]")).count() === 0)
  }

  test("IVF ANN recall vs brute-force top-5 is >= 3/5") {
    val truth = LlmOps.simCosineTopk(spark, sfDir).limit(5)
      .select($"vec_id").as[Long].collect().toSet
    val got = LlmOps.simAnnIvf(spark, sfDir)
      .select($"vec_id").as[Long].collect().toSet
    assert(got.size === 5)
    assert((truth intersect got).size >= 3,
      s"IVF recall too low: truth=$truth got=$got")
  }

  test("partitioned sink read-back prunes to one partition directory") {
    import graft.ops.Relational
    val df = Relational.sinkPartitionedPrune(spark, sfDir)
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    // the event_type predicate must be a PARTITION filter (pruned at
    // file listing), not a post-scan data filter — an empty
    // "PartitionFilters: []" would mean pruning regressed
    assert(scan.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("event_type")
        && l.contains("purchase")), scan.take(800))
    // and the files actually READ (scan metric) are exactly the
    // purchase directory's files — fewer than the table's total
    val pruned = spark.read.parquet(s"${Relational.scratchRoot}/sink_part")
      .filter($"event_type" === "purchase")
    pruned.collect()
    val numFilesRead = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.get
    def parquetFiles(d: java.io.File): Int =
      Option(d.listFiles).toSeq.flatten
        .count(_.getName.endsWith(".parquet"))
    val root = new java.io.File(s"${Relational.scratchRoot}/sink_part")
    val purchase = parquetFiles(
      new java.io.File(root, "event_type=purchase"))
    val total = Option(root.listFiles).toSeq.flatten
      .filter(_.isDirectory).map(parquetFiles).sum
    assert(numFilesRead === purchase.toLong, s"read $numFilesRead")
    assert(purchase < total, "pruning proved nothing: one partition only")
  }

  test("token entropy bounds: 0 <= H <= ln(n_distinct)") {
    val rows = LlmOps.textEntropy(spark, sfDir)
      .select($"entropy", $"n_distinct").as[(Double, Long)].collect()
    rows.foreach { case (h, nd) =>
      // entropy is reported rounded to 4 decimals → allow ±5e-5
      assert(h >= 0.0 && h <= math.log(nd.toDouble) + 5e-5, s"H=$h nd=$nd")
    }
  }

  test("durable truncate checkpoints under the configured dir and follows overrides") {
    val d1 = s"/tmp/graft_cp_${java.util.UUID.randomUUID()}"
    val d2 = s"/tmp/graft_cp_${java.util.UUID.randomUUID()}"
    try {
      spark.conf.set("spark.graft.checkpointDir", d1)
      val out = Tables.truncate(spark.range(10).toDF("v"))
      assert(out.count() === 10)
      def parent(p: String): String =
        new org.apache.hadoop.fs.Path(p).getParent.toUri.getPath
      val cp1 = spark.sparkContext.getCheckpointDir.get
      assert(parent(cp1) === d1, cp1)
      // reconfigured dir must override the previous one, not be ignored
      spark.conf.set("spark.graft.checkpointDir", d2)
      Tables.truncate(spark.range(3).toDF("v")).count()
      val cp2 = spark.sparkContext.getCheckpointDir.get
      assert(parent(cp2) === d2, cp2)
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      Seq(d1, d2).foreach(d => org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(d)))
    }
  }

  test("NOT IN with a nullable list is empty (three-valued logic)") {
    Tables.registerViews(spark, sfDir)
    // same query as q_subquery_not_in but with a NULL injected into the
    // list: x NOT IN (..., NULL) is never TRUE, so zero rows — the
    // classic SQL trap, and exactly what null-aware anti join encodes
    val n = spark.sql(
      """SELECT count(*) AS n FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT CASE WHEN o_totalprice > 300000 THEN o_custkey END
        |  FROM orders)""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 0L)
  }

  test("int8 quantization error is bounded by one step") {
    val bad = LlmOps.embedQuantize(spark, sfDir)
      .filter($"mean_abs_err" > $"scale" / 127.0 + 1e-9).count()
    assert(bad === 0)
  }
}
