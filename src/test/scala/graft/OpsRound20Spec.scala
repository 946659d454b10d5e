package graft

import org.apache.spark.sql.functions._

/** Round-13 optimization wave (r13 = the first OPTIMIZATION round):
  * every rewrite here changes an operator's PHYSICAL shape while the
  * declared result must stay bit-identical — so each test pins the new
  * shape against the retired formulation run side by side on the same
  * corpus, not against a re-derivation that could share a bug.
  *
  *  - q_embed_pca_power: GramAgg census + driver-side 64×64 power
  *    iteration vs the exploded-census distributed iteration.
  *  - knnGraphBucketed: bounded-heap topk_agg selection vs the
  *    row_number window (ties included — the corpus has score ties).
  *  - GramAgg cell/sum census vs the posexplode census it replaces,
  *    including short (non-64) vectors where the fixed DIV-64 cell
  *    mapping is deliberately length-blind.
  */
class OpsRound20Spec extends SparkSpec {
  import spark.implicits._

  test("pca power: driver replay is bit-identical to the exploded" +
    " distributed formulation") {
    val fast = ops.LlmOps.embedPcaPower(spark, sfDir)
      .as[(Int, Double)].collect().toSeq
    val qarr = Tables(spark, sfDir, "embeddings")
      .select($"vec_id", expr(
        "transform(embedding, x ->" +
          " cast(floor(cast(x as double) * 10000) as bigint))").as("qv"))
    val ref = ops.LlmOps.embedPcaPowerExploded(spark, qarr)
      .as[(Int, Double)].collect().toSeq
    assert(fast === ref) // Double equality: bit-exact, not approximate
    assert(fast.nonEmpty && fast.map(_._1) === (1 to fast.size))
  }

  test("knn graph: topk_agg selection equals the row_number window" +
    " rung for rung") {
    import org.apache.spark.sql.expressions.Window
    val got = ops.LlmOps.knnGraphBucketed(spark, sfDir)
      .as[(Long, Long, Double, Int)].collect().toSeq
    val v = Tables(spark, sfDir, "embeddings")
      .withColumn("bucket", ops.LlmOps.bucketExpr)
    val a = v.select($"vec_id", $"embedding", $"bucket")
    val b = v.select($"vec_id".as("nbr_id"), $"embedding".as("ne"),
      $"bucket")
    val ref = a.hint("shuffle_hash").join(b, Seq("bucket"))
      .filter($"vec_id" =!= $"nbr_id")
      .select($"vec_id", $"nbr_id",
        Det.r4(graft.functions.VectorExpressions.vecDot(spark)(
          $"embedding", $"ne")).as("sim"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"sim".desc, $"nbr_id")))
      .filter($"rk" <= 3)
      .orderBy($"vec_id", $"rk")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("gram_agg census equals the posexplode census, fixed-64 cell" +
    " mapping included, on short non-64 vectors") {
    graft.functions.GramAgg.register(spark)
    // 3 rows of length-9 vectors: flatten positions 0..80 cross the
    // DIV-64 boundary, so cells (0, 0..63) AND (1, 0..16) must appear
    // exactly like the exploded form's length-blind mapping
    val qarr = Seq(
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L),
      Seq(9L, 8L, 7L, 6L, 5L, 4L, 3L, 2L, 1L),
      Seq(2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L, 2L)).toDF("qv")
    val g = qarr.agg(call_function("gram_agg", $"qv").as("g"))
      .select($"g.sawNull", $"g.cells", $"g.sums").collect()(0)
    assert(!g.getBoolean(0))
    import org.apache.spark.sql.Row
    val cells = g.getSeq[Row](1)
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val refCells = qarr.select(posexplode(expr(
      "flatten(transform(qv, x -> transform(qv, y -> x * y)))"))
      .as(Seq("idx", "p")))
      .select(expr("idx DIV 64").cast("int").as("i"),
        pmod($"idx", lit(64)).cast("int").as("j"), $"p")
      .groupBy($"i", $"j")
      .agg(sum($"p").as("sij"), count(lit(1)).as("nn"))
      .as[(Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(cells === refCells)
    assert(cells.keySet.exists(_._1 == 1), "expected cells past DIV-64")
    val sums = g.getSeq[Row](2)
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val refSums = qarr.select(posexplode($"qv").as(Seq("pos", "q")))
      .groupBy($"pos").agg(sum($"q").as("s"))
      .as[(Int, Long)].collect().toMap
    assert(sums === refSums)
  }

  test("gram_agg flags null elements so the caller can fall back") {
    graft.functions.GramAgg.register(spark)
    val qarr = Seq(Seq[java.lang.Long](1L, null, 3L)).toDF("qv")
    val g = qarr.agg(call_function("gram_agg", $"qv").as("g"))
      .select($"g.sawNull").collect()(0)
    assert(g.getBoolean(0))
  }
}
