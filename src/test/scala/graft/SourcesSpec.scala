package graft

import graft.sources.Sources

/** Schema-introspection surface (SURVEY §2.1 design rows). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("describe exposes name/type/nullability like desdb describe()") {
    Tables.registerViews(spark, sfDir)
    val cols = Sources.describe(spark, "lineitem")
      .select($"col_name", $"data_type").as[(String, String)].collect().toMap
    assert(cols("l_orderkey") === "bigint")
    assert(cols("l_quantity") === "double")
    assert(cols("l_returnflag") === "string")
  }

  test("listTables sees every registered table") {
    Tables.registerViews(spark, sfDir)
    val names = Sources.listTables(spark)
      .select($"tableName").as[String].collect().toSet
    assert(Tables.names.toSet.subsetOf(names))
  }

  test("GraftExtensions registers vec_dot without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
