package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 — aggregations.
  *
  * Scale notes: every query here is a single hash-aggregate over a
  * parquet scan — Catalyst plans partial (map-side) + final aggregation,
  * so the shuffle carries only per-group partials, never raw rows. Group
  * cardinality is tiny relative to input (flags, nations), so the final
  * exchange is O(groups × partitions) regardless of table size.
  */
object Aggregates {

  /** Flagship: TPC-H Q1 pricing summary (scan → filter → hash-agg → sort).
    * Reference analogue: arbitrary SQL forwarded to Oracle by
    * `Connection.quick` [pub: desdb/desdb.py — see SURVEY §0 for grade]. */
  def q1(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = Tables(spark, sfDir, "lineitem")
    // decimal money arithmetic: exact in both engines (see Det scaladoc)
    val price = Det.dec($"l_extendedprice")
    val disc1 = lit(1).cast("decimal(4,2)") - Det.dec($"l_discount")
    val tax1 = lit(1).cast("decimal(4,2)") + Det.dec($"l_tax")
    l.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Det.dsum($"l_quantity").as("sum_qty"),
        Det.dsum($"l_extendedprice").as("sum_base_price"),
        Det.dsumDec(price * disc1).as("sum_disc_price"),
        Det.dsumDec(price * disc1 * tax1).as("sum_charge"),
        Det.davg($"l_quantity").as("avg_qty"),
        Det.davg($"l_extendedprice").as("avg_price"),
        Det.davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg_hash_q1" -> q1
  )
}
