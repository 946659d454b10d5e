package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the validation gate a
  * corpus passes before training (the Deequ/expectations pattern):
  * uniqueness, referential integrity, null/emptiness, domain
  * membership, consistency and range checks, each reported as
  * (check_name, n_checked, n_violations).
  *
  * Scale posture: all single-table constraints on the same table are
  * FUSED into ONE aggregate pass — 5,000 or 5 billion rows, the
  * documents table is scanned once for its three checks, not three
  * times (the optimization that makes constraint suites affordable at
  * 100 TB). Referential checks are conditional counts over a left
  * join, so Catalyst/AQE pick broadcast for dimension-sized right
  * sides; nothing ever materializes a violation row set — counts only.
  */
object Quality {

  private def fused(df: DataFrame, checks: (String, Column)*): DataFrame = {
    val agg0 = count(lit(1)).cast("long").as("n_checked")
    val aggs = checks.zipWithIndex.map { case ((_, viol), i) =>
      count(when(viol, lit(1))).cast("long").as(s"c$i")
    }
    // unpivot the one aggregated row into one row per check — a
    // single subtree, so the table is provably scanned exactly once
    df.agg(agg0, aggs: _*)
      .select(explode(array(checks.zipWithIndex.map { case ((n, _), i) =>
        struct(lit(n).as("check_name"), col("n_checked"),
          col(s"c$i").as("n_violations"))
      }: _*)).as("c"))
      .select(col("c.check_name"), col("c.n_checked"),
        col("c.n_violations"))
  }

  /** The declared suite over documents / events / orders / lineitem /
    * customer. Zero violations expected on the generated corpus except
    * where the check is deliberately strict (ts upper bound). */
  def qualityConstraints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables(spark, sfDir, "documents")
    val events = Tables(spark, sfDir, "events")
    val orders = Tables(spark, sfDir, "orders")

    val docChecks = fused(docs,
      "documents.lang_accepted" ->
        !$"lang".isin("de", "en", "es", "fr", "zh"),
      "documents.nchars_consistent" -> (length($"text") =!= $"n_chars"),
      "documents.text_nonempty" ->
        ($"text".isNull || length($"text") === 0))

    val eventChecks = fused(events,
      "events.ts_in_range" ->
        ($"ts" < to_timestamp(lit("2024-01-01")) ||
          $"ts" >= to_timestamp(lit("2024-02-01"))),
      "events.type_accepted" ->
        !$"event_type".isin("view", "click", "purchase", "signup",
          "error"),
      "events.value_nonneg" -> ($"value" < 0.0))

    // PK uniqueness = rows minus distinct keys, still one pass
    val ordersPk = orders
      .agg(count(lit(1)).cast("long").as("n_checked"),
        (count(lit(1)) - countDistinct($"o_orderkey")).cast("long")
          .as("n_violations"))
      .select(lit("orders.pk_unique").as("check_name"), $"n_checked",
        $"n_violations")

    // FK: every lineitem must resolve to an order; count-only left join
    val liFk = Tables(spark, sfDir, "lineitem").select($"l_orderkey")
      .join(orders.select($"o_orderkey").distinct(),
        $"l_orderkey" === $"o_orderkey", "left")
      .agg(count(lit(1)).cast("long").as("n_checked"),
        count(when($"o_orderkey".isNull, lit(1))).cast("long")
          .as("n_violations"))
      .select(lit("lineitem.fk_orders").as("check_name"), $"n_checked",
        $"n_violations")

    val custFk = Tables(spark, sfDir, "customer").select($"c_nationkey")
      .join(Tables(spark, sfDir, "nation").select($"n_nationkey"),
        $"c_nationkey" === $"n_nationkey", "left")
      .agg(count(lit(1)).cast("long").as("n_checked"),
        count(when($"n_nationkey".isNull, lit(1))).cast("long")
          .as("n_violations"))
      .select(lit("customer.fk_nation").as("check_name"), $"n_checked",
        $"n_violations")

    docChecks.unionAll(eventChecks).unionAll(ordersPk).unionAll(liFk)
      .unionAll(custFk)
      .orderBy($"check_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quality_constraints" -> qualityConstraints
  )
}
