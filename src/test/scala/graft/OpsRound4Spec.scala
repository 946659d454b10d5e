package graft

import org.apache.spark.sql.functions._
import graft.ops.LlmOps

/** Round-4 additions: real-PNG multimodal decode. */
class OpsRound4Spec extends SparkSpec {
  import spark.implicits._

  test("multimodal payloads are genuine PNGs and ImageIO round-trips the gradient") {
    // reconstruct the payload exactly as the operators do, then check
    // (a) PNG signature, (b) decoded dims/samples match the recipe —
    // i.e., the encode→decode path is a real lossless codec round-trip
    val rows = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars".cast("int"))
      .as[(Long, Int)].collect().take(25)
    assert(rows.nonEmpty)
    rows.foreach { case (id, nChars) =>
      val w = 8 + nChars % 24
      val h = 8 + (id % 24).toInt
      val g = ((id * 37 + nChars) % 190).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, g + x + y)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes = bos.toByteArray
      // PNG signature: 89 50 4E 47 0D 0A 1A 0A
      assert((bytes(0) & 0xff) === 0x89 && bytes(1) === 'P'
        && bytes(2) === 'N' && bytes(3) === 'G', s"doc $id: not a PNG")
      val back = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(back.getWidth === w && back.getHeight === h)
      for (y <- 0 until h; x <- 0 until w)
        assert(back.getRaster.getSample(x, y, 0) === g + x + y,
          s"doc $id sample ($x,$y) corrupted in codec round-trip")
    }
  }

  test("q_hierarchy_srclist_cte: native recursion equals the driver loop") {
    val loop = graft.ops.DesFiles.hierarchySrclist(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    val cte = graft.ops.DesFiles.hierarchySrclistCte(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(cte === loop)
    assert(loop.nonEmpty)
    // the native plan actually recursed (UnionLoop execution), i.e.
    // this is engine recursion, not a rewrite to the driver loop
    val plan = graft.ops.DesFiles.hierarchySrclistCte(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("UnionLoop") || plan.contains("CTERelation"),
      s"expected a recursive node in:\n${plan.take(400)}")
  }

  test("q_hierarchy_srclist_doubling equals the level walk, incl. a deep chain") {
    val loop = graft.ops.DesFiles.hierarchySrclist(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    val dbl = graft.ops.DesFiles.hierarchySrclistDoubling(spark, sfDir)
      .as[(Long, Long, Int)].collect().toSeq
    assert(dbl === loop)
    // depth > 2^3: a 12-link chain forces the terminal-capped squaring
    // to compose short terminal jumps correctly (the corpus only
    // reaches depth ~4 at sf0.001, which would mask an off-by-one in
    // the cap logic) — driven through the OPERATOR's shared core, not
    // a replica
    val nodes = (0L to 12L).toDF("id")
    val edges = (1L to 12L).map(i => (i, i - 1)).toDF("child", "parent")
    val got = graft.ops.DesFiles.resolveByDoubling(nodes, edges)
      .as[(Long, Long, Int)].collect()
      .map { case (l, r, d) => l -> ((r, d)) }.toMap
    (0L to 12L).foreach { i =>
      assert(got(i) === ((0L, i.toInt)),
        s"node $i should reach root 0 at depth $i")
    }
  }

  test("q_state_running_tws plans TransformWithState and equals the mapGroups twin") {
    val tws = graft.ops.StreamingOps.stateRunningTws(spark, sfDir)
    assert(tws.queryExecution.executedPlan.toString
      .contains("TransformWithState"),
      "expected the v2 arbitrary-state operator in the physical plan")
    val a = tws.collect().toSeq
    val b = graft.ops.StreamingOps.stateRunning(spark, sfDir).collect().toSeq
    assert(a === b, "state-API twins diverged")
    assert(a.nonEmpty)
  }

  test("q_multimodal_binary stats come from the decoded raster") {
    val got = LlmOps.multimodalBinary(spark, sfDir)
      .as[(Long, Int, Int, Int, Double)].collect()
    val chars = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars".cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(got.length === chars.size)
    got.foreach { case (id, w, h, nPx, mean) =>
      val nChars = chars(id)
      assert(w === 8 + nChars % 24 && h === 8 + (id % 24).toInt)
      assert(nPx === w * h)
      val g = ((id * 37 + nChars) % 190).toInt
      // gradient mean has the closed form g + (w-1)/2 + (h-1)/2,
      // exactly representable (a multiple of 0.5)
      assert(mean === g + (w - 1) / 2.0 + (h - 1) / 2.0,
        s"doc $id: decoded mean diverges from the gradient")
    }
  }

  test("q_multimodal_features: resized band means match a scalar replay") {
    val got = LlmOps.multimodalFeatures(spark, sfDir)
      .as[(Long, Int, Int, Double, Double, Double, Double)].collect()
    val chars = Tables(spark, sfDir, "documents")
      .select($"doc_id", $"n_chars".cast("int"))
      .as[(Long, Int)].collect().toMap
    got.foreach { case (id, ow, oh, f0, f1, f2, f3) =>
      val nChars = chars(id)
      val (w, h) = (8 + nChars % 24, 8 + (id % 24).toInt)
      val g = ((id * 37 + nChars) % 190).toInt
      val mx = math.max(w, h)
      val (ew, eh) = if (mx <= 16) (w, h) else (w * 16 / mx, h * 16 / mx)
      assert((ow, oh) === (ew, eh))
      val fs = Seq(f0, f1, f2, f3)
      for (d <- 0 until 4) {
        val (lo, hi) = (d * oh / 4, (d + 1) * oh / 4)
        assert(hi > lo, s"doc $id band $d empty (oh=$oh)")
        val sum = (for (j <- lo until hi; i <- 0 until ow)
          yield g + (i * w / ow) + (j * h / oh)).map(_.toLong).sum
        assert(fs(d) === sum.toDouble / ((hi - lo) * ow),
          s"doc $id band $d mean mismatch")
      }
    }
  }
}
