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
}
