package graft

import graft.ops.DesFiles
import org.apache.spark.sql.functions._

/** FIXTURES.md "DES-analogue micro-fixtures": the despath template and
  * the lineage resolver exercised on realistically-shaped DES metadata
  * (image parent-id chains ending at filetype='red', zero-padded ccds,
  * and a deliberate cycle for the guard) — not only on the TPC-H
  * derivation. */
class DesFixtureSpec extends SparkSpec {
  import spark.implicits._

  // image: 3 lineage levels → red; ids: coadd 30 → remap 2x → red 1x
  private lazy val image = Seq(
    (30L, 20L, "coadd"), (20L, 10L, "remap"), (10L, 0L, "red"),
    (31L, 21L, "coadd"), (21L, 11L, "remap"), (11L, 0L, "red")
  ).toDF("id", "parentid", "filetype")

  test("srclist resolution walks coadd chains to their red roots") {
    val nodes = image.select($"id")
    // an edge applies only while the child is not yet a 'red' file —
    // desdb's loop stops exactly at filetype='red'
    val edges = image.filter($"filetype" =!= "red")
      .select($"id".as("child"), $"parentid".as("parent"))
    val out = DesFiles.resolveToRoots(nodes, edges, maxDepth = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set(
      (30L, 10L, 2), (20L, 10L, 1), (10L, 10L, 0),
      (31L, 11L, 2), (21L, 11L, 1), (11L, 11L, 0)))
  }

  test("cycle guard trips on cyclic parent links") {
    val cyc = Seq((100L, 101L), (101L, 100L)).toDF("child", "parent")
    val nodes = cyc.select($"child".as("id"))
    assertThrows[IllegalArgumentException] {
      DesFiles.resolveToRoots(nodes, cyc, maxDepth = 5).count()
    }
  }

  test("despath template formats DES red-image paths with padded ccd") {
    assert(DesFiles.redImagePath("/desdata", "20130305", "DECam_00211482", 7)
      === "/desdata/OPS/red/20130305/red/DECam_00211482/DECam_00211482_07.fits")
    // location-fixture row through the UDF-backed declared query shape
    val loc = Seq((1L, "20130305", "DECam_00211482", 62, "i"))
      .toDF("id", "run", "exposurename", "ccd", "band")
    val paths = loc.select(
      concat(lit("/desdata/OPS/red/"), $"run", lit("/red/"), $"exposurename",
        lit("/"), $"exposurename", lit("_"),
        lpad($"ccd".cast("string"), 2, "0"), lit(".fits")).as("p"))
      .as[String].collect()
    assert(paths.head.endsWith("DECam_00211482_62.fits"))
  }
}
