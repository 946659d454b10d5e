package graft.ops

import graft.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.8 — scalar function packs (string / date / math /
  * array / map-json / conditional-null).
  *
  * All of these are row-local `functions._` expressions — fully
  * codegen'd, no shuffle beyond the final presentation sort. Per-row
  * double arithmetic is IEEE-identical across engines; only libm-backed
  * transcendentals (ln, log10) get a round(…,4) guard since they are
  * not correctly-rounded and may differ in the last ulp.
  */
object Scalars {

  /** String pack. Reference analogue: the printf-style path-template
    * formatting in DESFiles [pub: desdb/files.py — SURVEY §0]. */
  def strFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "customer")
      .select($"c_custkey",
        substring($"c_name", 1, 8).as("name_head"),
        upper($"c_mktsegment").as("seg_upper"),
        lower($"c_name").as("name_lower"),
        trim(concat(lit("  "), $"c_mktsegment", lit("  "))).as("seg_trim"),
        lpad($"c_custkey".cast(StringType), 8, "0").as("key_padded"),
        concat_ws("-", $"c_mktsegment", $"c_custkey".cast(StringType))
          .as("seg_key"),
        element_at(split($"c_name", "#"), 2).as("name_num"),
        regexp_extract($"c_name", "([0-9]+)", 1).as("digits"),
        regexp_replace($"c_name", "0+", "0").as("squeezed"),
        length($"c_name").as("name_len"))
      .orderBy($"c_custkey")
  }

  /** Date/timestamp pack (UTC session pinned; see build.sbt). */
  def dateFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey",
        year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mo"),
        dayofmonth($"o_orderdate").as("dom"),
        date_trunc("month", $"o_orderdate").as("month_start"),
        date_add($"o_orderdate".cast(DateType), 30).as("plus30"),
        datediff(lit("1998-01-01").cast(DateType),
          $"o_orderdate".cast(DateType)).as("days_to_98"),
        date_format($"o_orderdate", "yyyy-MM").as("ym"),
        unix_timestamp($"o_orderdate").as("epoch_s"))
      .orderBy($"o_orderkey")
  }

  /** Math pack. pow kept to integer exponents (exact); ln/log10 get r4. */
  def mathFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "part")
      .select($"p_partkey",
        abs($"p_retailprice" - 1000.0).as("abs_off"),
        floor($"p_retailprice").cast(LongType).as("price_floor"),
        ceil($"p_retailprice").cast(LongType).as("price_ceil"),
        pow($"p_size", 2).cast(LongType).as("size_sq"),
        Det.r4(sqrt($"p_retailprice")).as("price_sqrt"),
        Det.r4(log($"p_retailprice")).as("price_ln"),
        Det.r4(log10($"p_retailprice")).as("price_log10"),
        ($"p_partkey" % 7).as("key_mod7"),
        signum($"p_size" - 25).cast(IntegerType).as("size_sign"),
        greatest($"p_size", lit(25)).as("size_hi"),
        least($"p_size", lit(25)).as("size_lo"))
      .orderBy($"p_partkey")
  }

  /** Array pack over the embedding vectors, incl. higher-order
    * transform/aggregate for the L2 norm (dot-product building block —
    * the float lanes are cast to double inside the lambda so both
    * engines accumulate in double). */
  def arrayFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "embeddings")
      .select($"vec_id",
        size($"embedding").as("n_dims"),
        Det.r4(element_at($"embedding", 1).cast(DoubleType)).as("first_elem"),
        Det.arrStr(slice($"embedding", 1, 4)).as("head4"),
        Det.r4(aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)))
          .as("norm_sq"),
        Det.r4(aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast(DoubleType))).as("sum_elems"),
        array_contains(sequence(lit(1), $"label" + 1), 3).as("label_ge2"))
      .orderBy($"vec_id")
  }

  /** JSON/map pack over events.props. */
  def mapJsonFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        element_at(from_json($"props", MapType(StringType, IntegerType)),
          "k").as("k_val"),
        array_join(
          map_keys(from_json($"props", MapType(StringType, IntegerType))),
          ",").as("prop_keys"))
      .orderBy($"event_id")
  }

  /** Conditional/null pack: coalesce, nullif, nvl, nanvl, null-safe =. */
  def conditionalNull(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val segN = nullif($"c_mktsegment", lit("BUILDING"))
    Tables(spark, sfDir, "customer")
      .select($"c_custkey",
        coalesce(segN, lit("<none>")).as("seg_or_none"),
        nullif($"c_mktsegment", lit("BUILDING")).as("seg_nullif"),
        expr("nvl(nullif(c_mktsegment, 'BUILDING'), 'fallback')")
          .as("seg_nvl"),
        nanvl(sqrt($"c_acctbal"), lit(-1.0)).as("sqrt_or_neg1"),
        (segN <=> nullif($"c_mktsegment", lit("AUTOMOBILE"))).as("ns_eq"))
      .orderBy($"c_custkey")
  }

  /** DataFrameNaFunctions surface: drop / fill over synthesized nulls
    * (the corpus is null-free, so nulls come from nullif). */
  def naFunctions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withNulls = Tables(spark, sfDir, "customer")
      .select($"c_custkey",
        nullif($"c_mktsegment", lit("BUILDING")).as("seg"),
        nullif($"c_acctbal", lit(0.0)).as("bal"))
    val filled = withNulls.na.fill(Map("seg" -> "<missing>", "bal" -> -1.0))
    val dropped = withNulls.na.drop(Seq("seg"))
    filled.agg(
      count(lit(1)).as("n_total"),
      sum(when($"seg" === "<missing>", 1).otherwise(0)).cast("long")
        .as("n_filled_seg"),
      Det.dsum($"bal").as("sum_bal_filled"))
      .crossJoin(dropped.agg(count(lit(1)).as("n_after_drop")))
  }

  /** HASH / ENCODING pack — md5, sha2-256, hex, base64, bit_count:
    * the content-addressing toolbox every dedup/fingerprint/sharding
    * pipeline leans on (the fingerprint and surrogate-key keys build
    * on md5; this surfaces the primitives as first-class scalars).
    * All row-local, codegen'd, exact; cross-engine equivalence
    * (case, padding, two's-complement popcount) probed and pinned by
    * the oracle. */
  def encodeFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id",
        md5($"text".cast(BinaryType)).as("md5_hex"),
        sha2($"text".cast(BinaryType), 256).as("sha256_hex"),
        hex($"doc_id").as("id_hex"),
        base64(substring($"text", 1, 12).cast(BinaryType)).as("head_b64"),
        bit_count($"doc_id").as("id_popcount"))
      .orderBy($"doc_id")
  }

  /** MONTH-ARITHMETIC pack — add_months (end-of-month clamped),
    * last_day, month-start truncation, and month distance on the
    * calendar lattice: the fiscal-calendar scalar surface
    * [[dateFuncs]]'s day-level pack doesn't cover. Clamping
    * semantics (Jan 31 + 1 month = Feb 28) verified identical in
    * both engines. */
  def dateArith(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = $"o_orderdate".cast(DateType)
    Tables(spark, sfDir, "orders")
      .select($"o_orderkey",
        add_months(d, 3).as("plus3m"),
        last_day(d).as("eom"),
        trunc(d, "month").as("month_start"),
        (year(d) * 12 + month(d)).as("month_index"))
      .orderBy($"o_orderkey")
  }

  /** REGEX scalar pack — extract / extract-all / replace / match over
    * document text: the pattern toolbox of every log parser and text
    * cleaner. Patterns stay inside the character-class + bounded-
    * quantifier fragment where Java regex (Spark) and RE2 (the oracle
    * engine) agree exactly — no backrefs, no lookaround, no lazy
    * quantifiers (the dialect-divergent features are the documented
    * no-go zone for cross-engine pipelines). No-match extract yields
    * '' in both engines (pinned by the oracle). All row-local,
    * codegen'd. */
  def regexFuncs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables(spark, sfDir, "documents")
      .select($"doc_id",
        regexp_extract($"text", "([A-Za-z]{9,})", 1).as("first_long"),
        size(regexp_extract_all($"text", lit("[A-Za-z]{9,}"), lit(0)))
          .as("n_long"),
        regexp_replace($"text", "[0-9]+", "#").as("masked_head"),
        $"text".rlike("[0-9]{3}").as("has_3digits"))
      .withColumn("masked_head", substring($"masked_head", 1, 40))
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_regex_funcs" -> regexFuncs,
    "q_scalar_encode" -> encodeFuncs,
    "q_date_arith" -> dateArith,
    "q_na_functions" -> naFunctions,
    "q_str_funcs" -> strFuncs,
    "q_date_funcs" -> dateFuncs,
    "q_math_funcs" -> mathFuncs,
    "q_array_funcs" -> arrayFuncs,
    "q_map_json_funcs" -> mapJsonFuncs,
    "q_conditional_null" -> conditionalNull
  )
}
