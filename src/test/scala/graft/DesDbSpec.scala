package graft

/** The reference-API facade: every entry point a desdb user calls,
  * driven end-to-end against the corpus. */
class DesDbSpec extends SparkSpec {
  import spark.implicits._

  lazy val db = new DesDb(spark, sfDir)

  test("quick runs arbitrary SQL over the registered catalog") {
    val n = db.quick("SELECT count(*) AS n FROM region").as[Long].head()
    assert(n === 5L)
  }

  test("describe returns the table's columns") {
    val cols = db.describe("lineitem")
      .select($"col_name").as[String].collect().toSet
    assert(cols.contains("l_orderkey") && cols.contains("l_shipdate"))
  }

  test("listTables sees every corpus table") {
    val ts = db.listTables().select($"tableName").as[String].collect().toSet
    assert(Tables.names.toSet.subsetOf(ts))
  }

  test("desUrl expands the red_image template") {
    assert(db.desUrl("20130305", "DECam_00001234", 7) ===
      "/desdata/OPS/red/20130305/red/DECam_00001234/DECam_00001234_07.fits")
  }

  test("srclist resolves a parent hierarchy through the facade") {
    val nodes = Seq(1L, 10L, 100L).toDF("id")
    val edges = Seq((1L, 10L), (10L, 100L)).toDF("child", "parent")
    val got = db.srclist(nodes, edges)
      .orderBy($"leaf").as[(Long, Long, Int)].collect()
    assert(got === Seq((1L, 100L, 2), (10L, 100L, 1), (100L, 100L, 0)))
  }

  test("desUrl over the full template catalog") {
    assert(db.desUrl("red_cat", Map("RUN" -> "20130305",
      "EXPNAME" -> "DECam_00001234", "CCD" -> "07")) ===
      "/desdata/OPS/red/20130305/red/DECam_00001234/DECam_00001234_07_cat.fits")
    assert(db.desUrl("meds", Map("RUN" -> "20130305",
      "TILENAME" -> "DES0347-5540", "BAND" -> "z", "MEDSCONF" -> "y3v02")) ===
      "/desdata/meds/y3v02/20130305/DES0347-5540-z-meds-y3v02.fits")
  }

  test("saveTable registers in the external catalog, visible to a NEW session") {
    db.saveTable(db.quick("SELECT r_regionkey, r_name FROM region"),
      "des_catalog_probe")
    // temp views are session-scoped; saved tables live in the shared
    // external catalog — the durable-catalog analogue of desdb's
    // all_tables. A fresh session (no registerViews) still sees it.
    val fresh = spark.newSession()
    assert(fresh.catalog.tableExists("des_catalog_probe"))
    assert(fresh.table("des_catalog_probe").count() === 5L)
    assert(!fresh.catalog.tableExists("region")) // temp views did NOT leak
    spark.sql("DROP TABLE des_catalog_probe")
  }

  test("quickWrite streams csv to stdout") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      db.quickWrite("SELECT r_name FROM region ORDER BY r_name", "csv")
    }
    val lines = out.toString.trim.linesIterator.toSeq
    assert(lines.head === "r_name" && lines.size === 6)
  }

  test("srclistUntil stops at the stop set, not the absolute root") {
    import spark.implicits._
    // 3 <- 2 <- 1 <- 0 with stop at 1: leaf 3 resolves to 1 (depth 2),
    // while the plain srclist walks through to 0 (depth 3)
    val nodes = Seq(0L, 1L, 2L, 3L).toDF("id")
    val edges = Seq((1L, 0L), (2L, 1L), (3L, 2L)).toDF("child", "parent")
    val stops = Seq(1L).toDF("id")
    val until = db.srclistUntil(nodes, edges, stops)
      .as[(Long, Long, Int)].collect().toMap2
    assert(until(3L) === (1L, 2))
    val full = db.srclist(nodes, edges)
      .as[(Long, Long, Int)].collect().toMap2
    assert(full(3L) === (0L, 3))
  }

  test("catalog() exposes the DSv2 connector through the facade") {
    import spark.implicits._
    val cat = db.catalog()
    assert(cat.count() === 320)
    assert(cat.filter($"run" === "run2").rdd.getNumPartitions === 1)
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
