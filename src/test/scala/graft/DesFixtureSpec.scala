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

  test("resolveUntil stops at filetype='red' even when deeper parents exist") {
    val nodes = image.select($"id")
    // FULL edge set — including the red files' own parents (→ 0), which
    // desdb never follows because its loop stops AT filetype='red'
    val edges = image.select($"id".as("child"), $"parentid".as("parent"))
    val stops = image.filter($"filetype" === "red").select($"id")
    val out = DesFiles.resolveUntil(nodes, edges, stops, maxDepth = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(out === Set(
      (30L, 10L, 2), (20L, 10L, 1), (10L, 10L, 0),
      (31L, 11L, 2), (21L, 11L, 1), (11L, 11L, 0)))
    // contrast: the stop-free walk on the same edges runs past red to
    // the absolute root (parentid 0 is outside the node set → dead end)
    val plain = DesFiles.resolveToRoots(nodes, edges, maxDepth = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(plain.contains((30L, 0L, 3)) && plain.contains((10L, 0L, 1)))
  }

  test("template table formats coadd and meds paths; unknown vars fail loudly") {
    assert(DesFiles.desPath("coadd_image", Map("DESDATA" -> "/desdata",
      "RUN" -> "20130305", "TILENAME" -> "DES0347-5540", "BAND" -> "i"))
      === "/desdata/OPS/coadd/20130305/coadd/DES0347-5540_i.fits")
    assert(DesFiles.desPath("coadd_cat", Map("DESDATA" -> "/desdata",
      "RUN" -> "20130305", "TILENAME" -> "DES0347-5540", "BAND" -> "i"))
      === "/desdata/OPS/coadd/20130305/coadd/DES0347-5540_i_cat.fits")
    assert(DesFiles.desPath("meds", Map("DESDATA" -> "/desdata",
      "MEDSCONF" -> "y3v02", "RUN" -> "20130305",
      "TILENAME" -> "DES0347-5540", "BAND" -> "i"))
      === "/desdata/meds/y3v02/20130305/DES0347-5540-i-meds-y3v02.fits")
    assert(DesFiles.desPath("red_bkg", Map("DESDATA" -> "/d",
      "RUN" -> "r", "EXPNAME" -> "e", "CCD" -> "07"))
      === "/d/OPS/red/r/red/e/e_07_bkg.fits")
    assertThrows[RuntimeException] {
      DesFiles.desPath("meds", Map("DESDATA" -> "/desdata"))
    }
    assertThrows[RuntimeException] {
      DesFiles.desPath("not_a_filetype", Map.empty)
    }
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
