package graft.oracle

import graft.Det.Sql._

/** DuckDB-runnable ANSI SQL twins of every hash-matched query key
  * (SURVEY.md §2, "Oracle? yes" rows). Column aliases MUST match the
  * Spark side exactly — the driver sorts columns by name before hashing.
  */
object OracleSql {

  private val relational: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin,

    "q_source_range" ->
      """SELECT count(*) AS n_rows, cast(sum(x) as bigint) AS total
        |FROM range(1, 1001) t(x)""".stripMargin,

    "q_sink_csv_roundtrip" ->
      s"""SELECT l_returnflag, count(*) AS n,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_price
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_sink_json_roundtrip" ->
      s"""SELECT o_orderstatus, count(*) AS n,
         |  ${dsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_filter_predicates" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 30
        |  AND l_returnflag IN ('A', 'N')
        |  AND (l_linestatus LIKE 'F%' OR l_discount < 0.05)
        |  AND NOT (l_tax > 0.07)
        |  AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag, l_linestatus""".stripMargin,

    "q_project_compute" ->
      """SELECT o_orderkey, o_totalprice,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  o_totalprice * 0.1 AS tithe
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_cast_decimal" ->
      """SELECT o_orderkey,
        |  cast(o_totalprice as decimal(12,2)) AS price_dec,
        |  cast(substring(o_orderpriority, 1, 1) as int) AS prio_num,
        |  cast(o_orderdate as date) AS odate
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_join_inner" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |  ${dsum("o_totalprice")} AS sum_price
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT p_brand, count(*) AS n,
         |  ${dsumDec(s"${dec("l_extendedprice")} * (1 - ${dec("l_discount")})")} AS revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE p_size <= 10
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_left_outer" ->
      """SELECT c_nationkey,
        |  count(DISTINCT c_custkey) AS n_cust,
        |  count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_no_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_join_full_outer" ->
      """SELECT
        |  cast(sum(CASE WHEN a.o_custkey IS NOT NULL AND b.c_custkey IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_both,
        |  cast(sum(CASE WHEN b.c_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_orders_only,
        |  cast(sum(CASE WHEN a.o_custkey IS NULL THEN 1 ELSE 0 END) as bigint) AS n_customer_only
        |FROM (SELECT DISTINCT o_custkey FROM orders) a
        |FULL OUTER JOIN customer b ON a.o_custkey = b.c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,

    "q_join_theta" ->
      s"""SELECT p_brand, count(*) AS n, ${dsum("l_quantity")} AS sum_qty
         |FROM part JOIN lineitem
         |  ON p_partkey = l_partkey AND l_quantity > p_size
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_join_range_interval" ->
      s"""SELECT cast(year(l_shipdate) as int) AS yr, count(*) AS n,
         |  ${dsum("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  AND l_shipdate >= o_orderdate
         |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         |GROUP BY 1 ORDER BY yr""".stripMargin,

    "q_join_asof" ->
      """SELECT p.event_id, p.user_id, cast(p.ts as timestamp) AS ts,
        |  cast((SELECT max(c.ts) FROM events c
        |        WHERE c.user_id = p.user_id AND c.event_type = 'click'
        |          AND c.ts <= p.ts) as timestamp) AS last_click_ts
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,

    "q_join_multiway_star" ->
      s"""SELECT n_name,
         |  ${dsumDec(s"${dec("l_extendedprice")} * (1 - ${dec("l_discount")})")} AS revenue,
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin,

    "q_sort_multikey" ->
      """SELECT l_returnflag, l_shipdate, l_orderkey, l_linenumber,
        |  nullif(l_discount, 0.0) AS disc_n
        |FROM lineitem
        |ORDER BY l_returnflag ASC, l_shipdate DESC,
        |  disc_n ASC NULLS FIRST, l_orderkey ASC, l_linenumber ASC""".stripMargin,

    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,

    "q_union_all" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, 'high' AS tag FROM orders WHERE o_totalprice > 350000
        |  UNION ALL
        |  SELECT o_orderkey, 'low' AS tag FROM orders WHERE o_totalprice < 20000
        |) ORDER BY tag, o_orderkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT * FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |) ORDER BY c_custkey""".stripMargin,

    "q_intersect" ->
      """SELECT * FROM (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  INTERSECT
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate < TIMESTAMP '1999-01-01'
        |) ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      """SELECT * FROM (
        |  SELECT c_custkey FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 200000
        |) ORDER BY c_custkey""".stripMargin
  )

  val all: Map[String, String] = relational ++ Map(
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
