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

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
      DataFrame] = Map("q_join_skew_salted" -> joinSkewSalted)
}
