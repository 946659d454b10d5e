package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SURVEY.md §2.1 design-only rows: the reference's connection +
  * schema-introspection surface, re-expressed on Spark.
  *
  * Reference analogues [pub: desdb/desdb.py — SURVEY §0 grades]:
  *  - `Connection.__init__` / DSN handling → `jdbc()` below. The live
  *    DES Oracle is unreachable from this environment (zero egress), so
  *    this is a tested-shape interface, not a tested connection: it
  *    builds the standard `spark.read.jdbc` plan with predicate
  *    pushdown and partitioned parallel reads — at cluster scale the
  *    partitionColumn split is what turns one Oracle cursor into N
  *    parallel range scans.
  *  - `describe(table)` / catalog-view queries → Spark catalog calls.
  */
object Sources {

  /** JDBC read slot. `pushDownPredicate` is on by default — filters on
    * the resulting DataFrame reach the remote database as WHERE
    * clauses; `partitionColumn` shards the read into `numPartitions`
    * range-bounded cursors. */
  def jdbc(spark: SparkSession, url: String, table: String,
      user: String, password: String,
      partitionColumn: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("user", user)
      .option("password", password)
    partitionColumn.fold(base) { case (col, lower, upper, n) =>
      base.option("partitionColumn", col)
        .option("lowerBound", lower)
        .option("upperBound", upper)
        .option("numPartitions", n)
    }.load()
  }

  /** desdb `describe`: column name/type/nullability of any registered
    * table or view. */
  def describe(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $table")

  /** desdb table listing (the `all_tables` query analogue). */
  def listTables(spark: SparkSession): DataFrame =
    spark.sql("SHOW TABLES")
}
