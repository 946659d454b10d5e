package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-LAYOUT management: multi-dimensional clustering via Z-order
  * (Morton) interleaving — the lakehouse technique for making file
  * statistics (parquet min/max) prune on MORE than the leading sort
  * column. A table range-partitioned by z-value keeps every file's
  * span bounded in EVERY interleaved dimension: the top 2b z-bits pin
  * the top b bits of each dimension, so a predicate box on either
  * dimension eliminates most files outright — where a linear sort
  * order prunes only its leading column and a trailing-column
  * predicate has to open every file.
  *
  * Everything here is exact integer arithmetic (shifts, masks,
  * integer division) — deterministic, codegen'd end to end, and
  * reproducible bit-for-bit in the DuckDB oracle with the same
  * operators.
  */
object Layout {

  /** Morton-interleave two 16-bit dimensions into one 32-bit z-value:
    * x occupies the odd (higher) bit of each pair, y the even. A
    * static 32-term shift/mask expression tree — whole-stage codegen
    * compiles it to straight-line long arithmetic, no UDF. */
  def zvalue(x: Column, y: Column): Column = {
    val xi = x.cast("long")
    val yi = y.cast("long")
    (0 until 16).map { i =>
      shiftleft(shiftright(xi, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(yi, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Scale a non-negative integer column onto the full 16-bit domain:
    * floor(v * 65536 / (max + 1)). The double quotient truncated to
    * long equals exact integer floor-division here (numerator < 2^32,
    * so the quotient's distance to the next integer, ≥ 1/(max+1), is
    * far above double ulp) — and matches DuckDB's integer `//`. The
    * max arrives as a (broadcast) one-row column, so the scaling
    * adapts to any corpus size without driver-side collection. */
  private def scale16(v: Column, max: Column): Column =
    ((v.cast("long") * 65536L) / (max.cast("long") + 1L)).cast("long")

  /** Declared key: z-order the orders table on (custkey, order day)
    * and report per-z-bucket extents. The top 6 z-bits form 64
    * buckets, which pin the top 3 bits of BOTH dimensions — so each
    * bucket provably spans ≤ 1/8 of the custkey domain AND ≤ 1/8 of
    * the date domain (the clustering guarantee a z-ordered file
    * layout gives min/max pruning; property-tested in the suite, and
    * demonstrated against a linear layout's file counts in
    * ScaleSpec). */
  def layoutZorder(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey",
        datediff($"o_orderdate", to_date(lit("1992-01-01"))).as("day"))
    val dom = o.agg(max($"o_custkey").as("max_ck"), max($"day").as("max_day"))
    val z = o.crossJoin(broadcast(dom))
      .select($"o_orderkey",
        scale16($"o_custkey", $"max_ck").as("x16"),
        scale16($"day", $"max_day").as("y16"))
      .withColumn("zval", zvalue($"x16", $"y16"))
    z.groupBy(shiftright($"zval", 26).as("z_bucket"))
      .agg(count(lit(1)).as("n"),
        min($"x16").as("min_x"), max($"x16").as("max_x"),
        min($"y16").as("min_y"), max($"y16").as("max_y"))
      .orderBy($"z_bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder" -> layoutZorder
  )
}
