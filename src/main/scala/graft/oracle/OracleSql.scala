package graft.oracle

import graft.Det.Sql._

/** DuckDB-runnable ANSI SQL twins of every hash-matched query key
  * (SURVEY.md §2, "Oracle? yes" rows). Column aliases MUST match the
  * Spark side exactly — the driver sorts columns by name before hashing.
  */
object OracleSql {

  val all: Map[String, String] = Map(
    "q_agg_hash_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  ${dsumDec(s"${dec("l_extendedprice")} * (1 - ${dec("l_discount")})")} AS sum_disc_price,
         |  ${dsumDec(s"${dec("l_extendedprice")} * (1 - ${dec("l_discount")}) * (1 + ${dec("l_tax")})")} AS sum_charge,
         |  ${davg("l_quantity")} AS avg_qty,
         |  ${davg("l_extendedprice")} AS avg_price,
         |  ${davg("l_discount")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
