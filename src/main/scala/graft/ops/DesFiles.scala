package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** SURVEY.md §2.13 / §2.3 — the two DES-specific operators of the
  * reference, re-expressed Spark-first.
  *
  * Reference analogues [pub: desdb — SURVEY §0 citation grades; the
  * reference mount was empty this session, so file-level only]:
  *  - `DESFiles.url/dir/name` + its printf-style template table
  *    [pub: desdb/files.py]: a pure function from typed file coordinates
  *    (filetype, run, exposurename, ccd) to a path under $DESDATA.
  *  - `Coadd._get_srclist` [pub: desdb/files.py]: client-driven
  *    parent-id recursion over the image table until filetype='red'.
  */
object DesFiles {

  /** The DESFiles template for a 'red_image' path, as a Scala function.
    * Kept total and allocation-light — it runs once per row. */
  def redImagePath(root: String, run: String, expname: String,
      ccd: Int): String =
    f"$root/OPS/red/$run/red/$expname/${expname}_$ccd%02d.fits"

  private val redImagePathUdf =
    udf((run: String, expname: String, ccd: Int) =>
      redImagePath("/desdata", run, expname, ccd))

  /** DESFiles port applied to synthetic coordinates derived from orders.
    * Two implementations side by side: a registered Scala UDF (the §2.13
    * UDF surface) and an equivalent built-in `concat`/`lpad` pipeline
    * (codegen-friendly, Catalyst-foldable — the form to prefer at scale;
    * the UDF column exists to prove the UDF path works and matches). */
  def udfDespath(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val coords = Tables(spark, sfDir, "orders")
      .select($"o_orderkey",
        concat(lit("2013"), lpad(($"o_orderkey" % 500).cast("string"), 4, "0"))
          .as("run"),
        concat(lit("DECam_"), lpad(($"o_orderkey" % 100).cast("string"), 8, "0"))
          .as("expname"),
        (($"o_orderkey" % 62) + 1).cast(IntegerType).as("ccd"))
    coords
      .withColumn("path_udf", redImagePathUdf($"run", $"expname", $"ccd"))
      .withColumn("path_builtin",
        concat(lit("/desdata/OPS/red/"), $"run", lit("/red/"), $"expname",
          lit("/"), $"expname", lit("_"),
          lpad($"ccd".cast("string"), 2, "0"), lit(".fits")))
      .orderBy($"o_orderkey")
  }

  /** desdb's signature operation: resolve a multi-level parent-id
    * hierarchy to its roots — `Coadd._get_srclist`'s per-level queries
    * become one distributed join per level (EP3′ in SURVEY §3.2).
    *
    * Synthetic hierarchy: node ids are o_orderkey values, parent(id) =
    * id div 10; an id is a root when its parent is itself (id 0) or not
    * present in the node set. Spark has no recursive CTE, so this is a
    * driver loop to fixpoint: each level is ONE join over the whole
    * frontier (never a per-row query), `localCheckpoint()` truncates
    * lineage so plans don't grow with depth (on a real cluster use
    * `checkpoint()` to HDFS for fault tolerance). Depth is bounded by
    * log₁₀(max id) ≈ 6, plus a hard cap as a cycle guard.
    */
  def hierarchySrclist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nodes = Tables(spark, sfDir, "orders").select($"o_orderkey".as("id"))
    // child → parent edges, only where the parent exists and differs
    val edges = nodes
      .withColumn("parent", expr("id div 10"))
      .filter($"parent" =!= $"id")
      .join(nodes.select($"id".as("pid")), $"parent" === $"pid", "left_semi")
      .select($"id".as("child"), $"parent")
    // NOT broadcastEdges and NOT pre-spread: each level's fixpoint
    // check is its own action, so a broadcast edge DF would re-collect
    // per level, and a pinned 32-way repartition keeps 32 tasks alive
    // for the tiny late frontiers — both measured slower than plain
    // per-level shuffle joins, which parallelize from level 1 anyway.
    resolveToRoots(nodes, edges, maxDepth = 20).orderBy($"leaf")
  }

  /** Generic parent-chasing core (shared by the declared query and the
    * DES-shaped fixture tests): walk every node of `nodes` ("id") up
    * the `edges` ("child" → "parent") relation until no edge applies;
    * returns (leaf, root, depth). One distributed join per level; lazy
    * resolved parts (the union is depth-many cheap joins over the
    * checkpointed frontiers); `maxDepth` is the cycle guard. */
  def resolveToRoots(nodes: DataFrame, edges0: DataFrame,
      maxDepth: Int, broadcastEdges: Boolean = false): DataFrame = {
    import nodes.sparkSession.implicits._
    val edgesCp = edges0.transform(graft.Tables.truncate)
    val edges = if (broadcastEdges) broadcast(edgesCp) else edgesCp
    var frontier = nodes
      .select($"id".as("leaf"), $"id".as("cur"), lit(0).as("depth"))
    val resolved = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var level = 0
    while (level < maxDepth && !frontier.isEmpty) {
      val j = frontier.join(edges, frontier("cur") === edges("child"), "left")
      resolved += j.filter($"parent".isNull)
        .select($"leaf", $"cur".as("root"), $"depth")
      frontier = j.filter($"parent".isNotNull)
        .select($"leaf", $"parent".as("cur"), ($"depth" + 1).as("depth"))
        .transform(graft.Tables.truncate)
      level += 1
    }
    require(frontier.isEmpty, s"hierarchy deeper than cycle guard $maxDepth")
    resolved.reduceOption(_ unionByName _)
      // empty nodes → empty (leaf, root, depth) result, not empty.reduce
      .getOrElse(frontier.select($"leaf", $"cur".as("root"), $"depth"))
      .select($"leaf", $"root", $"depth".cast(IntegerType).as("depth"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_despath" -> udfDespath,
    "q_hierarchy_srclist" -> hierarchySrclist
  )
}
