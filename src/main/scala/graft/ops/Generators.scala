package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.9 (pivot / unpivot / generators) + §2.10 (subqueries).
  *
  * Scale posture: pivot uses an EXPLICIT value list (never the
  * values-discovery scan), explode runs inside codegen (`GenerateExec`),
  * and the shingle generator is a typed flatMap — per-row fan-out with
  * no driver involvement. Subqueries go through `spark.sql` to exercise
  * the EP1 SQL entry point and Catalyst's decorrelation rules.
  */
object Generators {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** users × event_type count matrix. Explicit pivot values — at scale
    * the implicit variant would add a distinct-scan job first. */
  def pivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .groupBy($"user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes)
      .orderBy($"user_id")
  }

  /** Melt the pivot matrix back to long form (Dataset.unpivot). */
  def unpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    pivot(spark, sfDir)
      .unpivot(Array($"user_id"), EventTypes.map(col).toArray,
        "event_type", "n")
      .orderBy($"user_id", $"event_type")
  }

  /** Tokenize → explode → per-language top-5 terms. */
  def explodeTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = Tables(spark, sfDir, "documents")
      .select($"lang", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"lang", $"token")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"token".asc)
    counts.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 5)
      .orderBy($"lang", $"rk")
  }

  /** Custom generator (typed UDTF path): 3-gram word shingles per doc,
    * summarized as total + distinct counts. flatMap fans out inside the
    * task — the generator itself never shuffles. */
  def udtfShingles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split(" ", -1).sliding(3).collect {
          case w if w.length == 3 => (id, w.mkString(" "))
        }
      }
      .toDF("doc_id", "shingle")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        countDistinct($"shingle").as("n_distinct"))
      .orderBy($"doc_id")
  }

  /** Scalar subquery via the SQL entry point (EP1): orders above the
    * global average price (average computed exactly in decimal). */
  def subqueryScalar(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > (
        |  SELECT cast(sum(cast(o_totalprice as decimal(27,4))) as double)
        |         / count(*) FROM orders)
        |ORDER BY o_orderkey""".stripMargin)
  }

  /** Null-aware NOT IN subquery: customers with no big order. Spark
    * plans single-column NOT IN as a null-aware anti join (NAAJ) —
    * the broadcast build carries a hasNull flag so three-valued logic
    * costs one boolean check, not a per-row null scan. The subquery
    * column here is non-null, so rows actually return (a nullable
    * NOT IN list would legally empty the result — the classic trap,
    * exercised in the suite instead of the declared query). */
  def subqueryNotIn(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Correlated LATERAL subquery with ORDER+LIMIT: per-nation top-2
    * customers by balance — the "top-n per row of the outer relation"
    * idiom. Catalyst decorrelates the limit into a partitioned
    * row_number under the hood, so this plans like the window top-k
    * pattern, not one subquery execution per outer row. */
  def lateralTopn(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT n_name, c.c_custkey, c.c_acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
  }

  /** Correlated subquery (Catalyst decorrelates): customers counted by
    * how many of their orders exceed 1.2× their own average. */
  def subqueryInCorrelated(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT c_custkey, n_above FROM (
        |  SELECT c_custkey,
        |    (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > 1.2 * (
        |        SELECT cast(sum(cast(o2.o_totalprice as decimal(27,4))) as double)
        |               / count(*)
        |        FROM orders o2 WHERE o2.o_custkey = o.o_custkey)) AS n_above
        |  FROM customer c)
        |WHERE n_above > 0
        |ORDER BY c_custkey""".stripMargin)
  }

  /** TPC-H Q4 "order priority checking" shape — the EXISTS correlated
    * subquery (orders having at least one lineitem shipped > 60 days
    * after the order date), counted by priority. Expressed through
    * the SQL entry point so Catalyst's RewritePredicateSubquery turns
    * the EXISTS into a LEFT SEMI join — the decorrelation a user's
    * hand-written SQL relies on.
    *
    * Scale posture: the semi join hashes on orderkey with the date
    * inequality riding as a residual (never a standalone theta
    * join); the priority census is a domain-bounded partial agg. */
  def subqueryExists(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.registerViews(spark, sfDir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAYS)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** OUTER explode — `posexplode_outer` keeps the parent row (with
    * NULL position/element) when its array is EMPTY, where plain
    * explode silently DROPS it: the generator variant that matters
    * when absence is the signal (docs with no long tokens are the
    * interesting rows for a quality audit, not the discardable ones).
    * Census proves the preserved-null contract: total rows =
    * Σ max(1, arity), null rows = docs with no match. */
  def explodeOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val longToks = filter(split($"text", " "), t => length(t) >= 12)
    Tables(spark, sfDir, "documents")
      .select($"doc_id", posexplode_outer(longToks).as(Seq("pos", "tok")))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_rows"),
        count($"tok").as("n_long_tokens"),
        count(when($"tok".isNull, 1)).as("n_null_rows"))
      .orderBy($"doc_id")
  }

  /** DEEP-NESTED SEMI-STRUCTURED ROUNDTRIP — the one modern-ingest
    * shape the map/json scalar key and the outer-explode key bracket
    * but never compose (VERDICT r11 #8): an array-of-struct JSON
    * column is parsed against a PINNED schema (`from_json` — schema
    * inference is a one-time `schema_of_json` step a production
    * pipeline pins, never a per-batch scan; OpsRound18Spec asserts the
    * pinned schema IS what inference yields), positionally exploded
    * with OUTER semantics (`posexplode_outer` — null and empty item
    * lists keep their parent row), aggregated at the exploded grain,
    * and RE-NESTED (position-sorted `collect_list` of structs) with an
    * exact array<struct> equality check against the parsed original.
    *
    * Fixture: the JSON is BUILT deterministically from lineitem by
    * identical string concatenation in both engines (one
    * `{"ln":…,"qty":…}` element per line, element order pinned by line
    * number); orders ≡ 0 (mod 50) get `[]`, orders ≡ 3 (mod 97) get
    * NULL — the absent-vs-empty distinction every ingest audit needs.
    *
    * Scale posture: parse + explode are row-local codegen'd generators
    * (no UDF); the re-nest and census are ONE partial-agged hash agg
    * on o_orderkey whose exchange the final join reuses; element order
    * inside the re-nest is a per-group array_sort, never a window. */
  def jsonNestedRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val itemSchema = "array<struct<ln:int,qty:int>>"
    val items = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("o_orderkey"), $"l_linenumber",
        concat(lit("{\"ln\":"), $"l_linenumber",
          lit(",\"qty\":"), $"l_quantity".cast("int"), lit("}")).as("e"))
      .groupBy($"o_orderkey")
      .agg(concat(lit("["),
        array_join(transform(
          array_sort(collect_list(struct($"l_linenumber".as("n"), $"e"))),
          x => x("e")), ","),
        lit("]")).as("items"))
    val src = Tables(spark, sfDir, "orders").select($"o_orderkey")
      .join(items, Seq("o_orderkey"), "left")
      .select($"o_orderkey",
        when($"o_orderkey" % 50 === 0, lit("[]"))
          .when($"o_orderkey" % 97 === 3, lit(null))
          .otherwise($"items").as("j"))
    val parsed = src.select($"o_orderkey", $"j",
      from_json($"j", itemSchema, Map.empty[String, String]).as("arr"))
    val ex = parsed.select($"o_orderkey",
      posexplode_outer($"arr").as(Seq("pos", "item")))
    val stats = ex.filter($"pos".isNotNull)
      .groupBy($"o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"item.qty").cast("long").as("qty_sum"),
        transform(array_sort(collect_list(struct($"pos", $"item"))),
          x => x("item")).as("ren"))
    parsed.join(stats, Seq("o_orderkey"), "left")
      .select($"o_orderkey",
        $"j".isNotNull.as("has_json"),
        coalesce($"n_items", lit(0L)).as("n_items"),
        $"qty_sum",
        when($"arr".isNull || size($"arr") === 0, $"ren".isNull)
          .otherwise($"ren" <=> $"arr").as("roundtrip_ok"))
      .orderBy($"o_orderkey")
  }

  /** VARIANT SHRED — Spark 4's open semi-structured type driven
    * end-to-end (VERDICT r12 #7, the one modern surface the inventory
    * bracketed but never touched: `q_map_json_funcs` parses to
    * MapType, `q_json_nested_roundtrip` pins a static schema — this
    * key goes schema-LESS through VARIANT): the deterministic JSON
    * fixture of [[jsonNestedRoundtrip]] gains a typed header
    * (`{"cust":N,"items":[…]}`), is parsed by `parse_json` into a
    * VARIANT column, the header comes back through typed
    * `variant_get(v, '$.cust', 'bigint')`, the item array is shredded
    * by the `variant_explode` LATERAL table function, and the
    * shredded aggregates are compared for exact parity with the
    * PINNED-SCHEMA string path (`from_json` + a row-local HOF fold)
    * in the emitted `shred_ok` flag. The DuckDB twin recomputes every
    * value RELATIONALLY (no JSON at all), so the hash gate
    * differentially verifies the whole VARIANT pipeline — parse,
    * typed get, explode, aggregate — against first-principles truth,
    * and `shred_ok` must hash TRUE on every row for the two engine
    * pipelines to agree.
    *
    * Scale posture: UDF-free throughout (parse_json / variant_get are
    * codegen'd expressions, variant_explode is a Generate), one
    * partial-agged hash agg at the exploded grain keyed o_orderkey,
    * left joins back on the same key. Null/empty discipline mirrors
    * the roundtrip key: orders ≡ 0 (mod 50) carry an EMPTY item list,
    * ≡ 3 (mod 97) a NULL document (the %50 rule wins on overlap) —
    * absent docs report n_items 0 / null sums, and the null VARIANT
    * flows through variant_get as SQL NULL, not an error. */
  def variantShred(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val items = Tables(spark, sfDir, "lineitem")
      .select($"l_orderkey".as("o_orderkey"), $"l_linenumber",
        concat(lit("{\"ln\":"), $"l_linenumber",
          lit(",\"qty\":"), $"l_quantity".cast("int"), lit("}")).as("e"))
      .groupBy($"o_orderkey")
      .agg(concat(lit("["),
        array_join(transform(
          array_sort(collect_list(struct($"l_linenumber".as("n"), $"e"))),
          x => x("e")), ","),
        lit("]")).as("items"))
    val src = Tables(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
      .join(items, Seq("o_orderkey"), "left")
      .select($"o_orderkey",
        when($"o_orderkey" % 50 === 0,
            concat(lit("{\"cust\":"), $"o_custkey", lit(",\"items\":[]}")))
          .when($"o_orderkey" % 97 === 3, lit(null))
          .otherwise(concat(lit("{\"cust\":"), $"o_custkey",
            lit(",\"items\":"), coalesce($"items", lit("[]")), lit("}")))
          .as("doc"))
    val parsed = src.select($"o_orderkey", $"doc",
      parse_json($"doc").as("v"),
      from_json($"doc",
        "struct<cust:bigint,items:array<struct<ln:int,qty:int>>>",
        Map.empty[String, String]).as("s"))
    parsed.createOrReplaceTempView("graft_variant_shred_src")
    // the VARIANT shred: LATERAL variant_explode over the extracted
    // item array (zero rows for null/empty — the left join restores
    // those parents), typed qty extraction per element
    val ex = spark.sql(
      """SELECT o_orderkey,
        |  count(e.pos) AS n_items_v,
        |  sum(variant_get(e.value, '$.qty', 'bigint')) AS qty_sum_v
        |FROM graft_variant_shred_src,
        |  LATERAL variant_explode(variant_get(v, '$.items')) AS e
        |GROUP BY o_orderkey""".stripMargin)
    parsed
      .select($"o_orderkey", $"doc".isNotNull.as("has_doc"),
        expr("variant_get(v, '$.cust', 'bigint')").as("cust"),
        $"s.cust".as("cust_s"),
        coalesce(size($"s.items"), lit(0)).cast("long").as("n_items_s"),
        when(size($"s.items") > 0,
          aggregate($"s.items", lit(0L), (acc, x) => acc + x("qty")))
          .as("qty_sum_s"))
      .join(ex, Seq("o_orderkey"), "left")
      .select($"o_orderkey", $"has_doc", $"cust",
        coalesce($"n_items_v", lit(0L)).as("n_items"),
        $"qty_sum_v".as("qty_sum"),
        (($"cust" <=> $"cust_s") &&
          (coalesce($"n_items_v", lit(0L)) <=> $"n_items_s") &&
          ($"qty_sum_v" <=> $"qty_sum_s")).as("shred_ok"))
      .orderBy($"o_orderkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_variant_shred" -> variantShred,
    "q_json_nested_roundtrip" -> jsonNestedRoundtrip,
    "q_explode_outer" -> explodeOuter,
    "q_subquery_exists" -> subqueryExists,
    "q_pivot" -> pivot,
    "q_unpivot" -> unpivot,
    "q_explode_tokens" -> explodeTokens,
    "q_udtf_shingles" -> udtfShingles,
    "q_subquery_scalar" -> subqueryScalar,
    "q_subquery_not_in" -> subqueryNotIn,
    "q_lateral_topn" -> lateralTopn,
    "q_subquery_in_correlated" -> subqueryInCorrelated
  )
}
