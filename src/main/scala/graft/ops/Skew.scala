package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4 / builder prompt: "skewed keys → salting
  * or AQE skew-join"). AQE's OptimizeSkewedJoin handles sort-merge
  * skew automatically at runtime; explicit salting is the tool when a
  * hot key must spread across reducers deterministically — e.g. a
  * power-law user_id joining a per-user dimension.
  *
  * `saltedJoin` replicates the (small) right side `salt`-ways and
  * scatters the left side across the replicas with a HASH-derived salt
  * (not rand() — determinism rule §7.6.6), so one hot key occupies
  * `salt` reducers instead of one. Result equals a plain inner
  * equi-join row-for-row (asserted in the test suite).
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    // deterministic per-row salt: hash of the whole left row
    val saltCol: Column = pmod(hash(left.columns.map(col): _*), lit(salt))
    val saltedLeft = left.withColumn("__salt", saltCol)
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Declared skew showcase: 70 % of events collapse onto one hot key,
    * then join a per-key dimension through [[saltedJoin]] — the hot
    * key occupies 16 reducers instead of one. Result (and oracle) is
    * the plain inner join's aggregate, proving salting is semantics-
    * preserving. */
  def joinSkewSalted(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val e = graft.Tables(spark, sfDir, "events")
      .select($"event_id",
        when($"user_id" % 10 < 7, 0L).otherwise($"user_id").as("k"),
        $"value")
    val dim = e.select($"k").distinct()
      .withColumn("w", ($"k" % 97 + 1).cast("int"))
    Skew.saltedJoin(e, dim, "k", salt = 16)
      .agg(count(lit(1)).as("n"),
        graft.Det.dsumDec(graft.Det.dec($"value") * $"w").as("weighted"))
  }

  /** Salted TWO-STAGE aggregation — the hot-group-by companion to
    * [[saltedJoin]]. 70 % of events collapse onto one hot key; the
    * partial stage groups on (key, salt) so the hot key's pre-
    * aggregation spreads across 32 reducers, and the final stage
    * re-groups the ≤32 partials per key. Exactly equal to the plain
    * groupBy (the oracle IS the plain GROUP BY; equality also pinned
    * in the suite).
    *
    * Honest framing: for algebraic aggregates Spark's map-side partial
    * aggregation already bounds each reducer's input to
    * one-partial-per-map-task, so plain sum/count rarely need this.
    * The pattern earns its keep when the partial state is LARGE
    * (collect/distinct/sketch payloads) or map-side combine is
    * ineffective (pre-shuffled inputs, high group cardinality per
    * task) — there, (key, salt) partials are what keeps any single
    * reducer's state bounded. The salt is hash-derived from the row
    * (determinism rule §7.6.6), never rand(). */
  def aggSkewSalted(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val e = graft.Tables(spark, sfDir, "events")
      .select($"event_id",
        when($"user_id" % 10 < 7, lit("hot"))
          .otherwise(concat(lit("u"), $"user_id")).as("k"),
        $"value")
    e.withColumn("__salt", pmod(xxhash64($"event_id"), lit(32)))
      .groupBy($"k", $"__salt")
      .agg(count(lit(1)).as("pn"),
        sum(graft.Det.dec($"value")).as("psum"))
      .groupBy($"k")
      .agg(graft.Det.lsum($"pn").as("n"),
        sum($"psum").cast("double").as("sum_value"))
      .orderBy($"k")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      DataFrame] = Map(
    "q_join_skew_salted" -> joinSkewSalted,
    "q_agg_skew_salted" -> aggSkewSalted)
}
