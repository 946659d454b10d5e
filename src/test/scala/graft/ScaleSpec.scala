package graft

import java.nio.file.Files

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Scale-mechanics tests (SURVEY §4): partition pruning on a
  * partitioned copy of the corpus (the testdata itself is single-file),
  * and salted-join equivalence for skew mitigation. */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("partition pruning: year-partitioned scan reads only one partition") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables(spark, sfDir, "orders")
      .withColumn("o_year", year($"o_orderdate"))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"o_year" === 1997)
    val plan = finalPlan(pruned)
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"), plan.take(600))
    // and the row count matches the unpartitioned predicate
    val expect = Tables(spark, sfDir, "orders")
      .filter(year($"o_orderdate") === 1997).count()
    assert(pruned.count() === expect)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    val n = 4
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .write.mode("overwrite").bucketBy(n, "o_custkey")
      .sortBy("o_custkey").saveAsTable("orders_b")
    Tables(spark, sfDir, "customer")
      .select($"c_custkey", $"c_name")
      .write.mode("overwrite").bucketBy(n, "c_custkey")
      .sortBy("c_custkey").saveAsTable("customer_b")
    // force SMJ so the exchange (or its absence) is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          $"o_custkey" === $"c_custkey")
      val plan = finalPlan(joined)
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n${plan.take(800)}")
      assert(joined.count() === Tables(spark, sfDir, "orders").count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("AQE splits a skewed sort-merge join partition") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // one hot key holding ~500k rows vs 32 cold keys
    val left = spark.range(0, 600000)
      .select(when(col("id") % 6 =!= 0, lit(0L)).otherwise(col("id") % 33)
        .as("k"), col("id").as("v"))
    val right = spark.range(0, 33).select(col("id").as("k"),
      (col("id") * 10).as("w"))
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "10KB")
    val saved = confs.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = left.join(right, "k")
      val plan = finalPlan(joined)
      assert(plan.contains("skew=true"),
        s"expected AQE skew split:\n${plan.take(900)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("z-order layout skips files on a trailing-dimension box; linear cannot") {
    // 20k uniform 2-d points, written 16-files two ways: range-
    // partitioned by x (the linear "sorted by leading column" layout)
    // and range-partitioned by zvalue(x, y). A y-only box predicate
    // (top two y bits zero) is the pruning case linear layouts lose:
    // every x-range file contains all y values, while only z-buckets
    // whose interleaved y bits match can hold matching rows.
    val pts = spark.range(0, 20000).select(
      (pmod(hash($"id" * 2 + 1), lit(65536))).as("x"),
      (pmod(hash($"id" * 7 + 3), lit(65536))).as("y"))
    val zdir = Files.createTempDirectory("graft_zorder").toString
    val ldir = Files.createTempDirectory("graft_linear").toString
    pts.withColumn("z", graft.ops.Layout.zvalue($"x", $"y"))
      .repartitionByRange(16, $"z")
      .write.mode("overwrite").parquet(zdir)
    pts.repartitionByRange(16, $"x")
      .write.mode("overwrite").parquet(ldir)
    def filesHit(dir: String): Long =
      spark.read.parquet(dir).filter($"y" < 16384)
        .select(input_file_name()).distinct().count()
    val (zHit, lHit) = (filesHit(zdir), filesHit(ldir))
    // linear: all 16 files contain small-y rows; z-order: only the
    // buckets whose y15=y14=0 slice (~1/4 of the space) can. Range
    // boundaries come from SAMPLING (seeded by RDD id, so they shift
    // a little run to run) — assert the structural gap with slop, not
    // an exact count: ≤ 10 of 16 is still a 6-file skip the linear
    // layout can never produce
    assert(lHit === 16, s"linear layout unexpectedly pruned: $lHit")
    assert(zHit <= 10, s"z-order should prune most files, hit $zHit of 16")
    assert(zHit < lHit, s"z-order must beat linear: $zHit vs $lHit")
  }

  test("salted join equals the plain equi-join") {
    val o = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val cRenamed = Tables(spark, sfDir, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val plain = o.join(cRenamed, "o_custkey")
      .select($"o_orderkey", $"c_name")
    val salted = Skew.saltedJoin(o, cRenamed, "o_custkey")
      .select($"o_orderkey", $"c_name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("spread widens narrow scans but passes shuffled plans through") {
    // session shuffle partitions = 4 (SparkSpec); region is one tiny
    // parquet file → a 1-partition scan-shaped plan → widened
    val narrow = Tables(spark, sfDir, "region").select($"r_regionkey")
    assert(Tables.spread(narrow).rdd.getNumPartitions === 4)
    // a plan that already went through a shuffle keeps its parallelism
    // untouched (and is never probed — probing would materialize its
    // query stages under AQE)
    val wide = spark.range(0, 1000).toDF("id").repartition(8)
    assert(Tables.spread(wide).rdd.getNumPartitions === 8)
  }
}
