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

  /** The reference's DESFiles template table — the major file types of
    * its `_fs` dict [pub: desdb/files.py DESFiles], as `${VAR}` path
    * templates under `${DESDATA}`. ONE source of truth: the pure-Scala
    * formatter ([[desPath]], the facade surface) and the codegen'd
    * Column expression ([[desPathCol]], the declared-query surface)
    * are both derived from these strings, so they cannot drift. */
  val templates: Map[String, String] = Map(
    "red_image"   -> "${DESDATA}/OPS/red/${RUN}/red/${EXPNAME}/${EXPNAME}_${CCD}.fits",
    "red_cat"     -> "${DESDATA}/OPS/red/${RUN}/red/${EXPNAME}/${EXPNAME}_${CCD}_cat.fits",
    "red_bkg"     -> "${DESDATA}/OPS/red/${RUN}/red/${EXPNAME}/${EXPNAME}_${CCD}_bkg.fits",
    "coadd_image" -> "${DESDATA}/OPS/coadd/${RUN}/coadd/${TILENAME}_${BAND}.fits",
    "coadd_cat"   -> "${DESDATA}/OPS/coadd/${RUN}/coadd/${TILENAME}_${BAND}_cat.fits",
    "meds"        -> "${DESDATA}/meds/${MEDSCONF}/${RUN}/${TILENAME}-${BAND}-meds-${MEDSCONF}.fits")

  private val varRx = """\$\{([A-Z]+)\}""".r

  /** Template → alternating Left(literal) / Right(var-name) segments. */
  private def segments(filetype: String): List[Either[String, String]] = {
    val t = templates.getOrElse(filetype,
      sys.error(s"unknown DES filetype '$filetype' (have: ${templates.keys.toSeq.sorted.mkString(", ")})"))
    val out = List.newBuilder[Either[String, String]]
    var pos = 0
    varRx.findAllMatchIn(t).foreach { m =>
      if (m.start > pos) out += Left(t.substring(pos, m.start))
      out += Right(m.group(1))
      pos = m.end
    }
    if (pos < t.length) out += Left(t.substring(pos))
    out.result()
  }

  /** `DESFiles.url(filetype, **kwargs)`: pure template expansion. Kept
    * total and allocation-light — it runs once per row in UDF form. */
  def desPath(filetype: String, vars: Map[String, String]): String =
    segments(filetype).map {
      case Left(s) => s
      case Right(v) => vars.getOrElse(v,
        sys.error(s"missing template var $v for filetype $filetype"))
    }.mkString

  /** The same template as a codegen-friendly Catalyst `concat` — the
    * form the declared queries use (no UDF in the hot path). */
  def desPathCol(filetype: String,
      vars: Map[String, org.apache.spark.sql.Column]): org.apache.spark.sql.Column =
    concat(segments(filetype).map {
      case Left(s) => lit(s)
      case Right(v) => vars(v)
    }: _*)

  /** 'red_image' expansion with the reference's %02i ccd padding. */
  def redImagePath(root: String, run: String, expname: String,
      ccd: Int): String =
    desPath("red_image", Map("DESDATA" -> root, "RUN" -> run,
      "EXPNAME" -> expname, "CCD" -> f"$ccd%02d"))

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

  /** DESFiles over the FULL template catalog: every (coordinate row ×
    * filetype) expanded through [[templates]] — the query a desdb user
    * runs to locate all products of an exposure/tile at once. The path
    * column is one CASE over codegen'd concats (no UDF); coordinates
    * are derived deterministically from orders like [[udfDespath]],
    * plus tile/band/medsconf for the coadd and meds templates. */
  def udfDespathMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = array(Seq("g", "r", "i", "z", "Y").map(lit): _*)
    val coords = Tables(spark, sfDir, "orders")
      .select($"o_orderkey",
        concat(lit("2013"), lpad(($"o_orderkey" % 500).cast("string"), 4, "0"))
          .as("run"),
        concat(lit("DECam_"), lpad(($"o_orderkey" % 100).cast("string"), 8, "0"))
          .as("expname"),
        (($"o_orderkey" % 62) + 1).cast(IntegerType).as("ccd"),
        concat(lit("DES"), lpad(($"o_orderkey" % 300).cast("string"), 4, "0"),
          lit("-5540")).as("tilename"),
        element_at(bands, (($"o_orderkey" % 5) + 1).cast(IntegerType))
          .as("band"))
    val vars = Map(
      "DESDATA" -> lit("/desdata"),
      "RUN" -> col("run"),
      "EXPNAME" -> col("expname"),
      "CCD" -> lpad(col("ccd").cast("string"), 2, "0"),
      "TILENAME" -> col("tilename"),
      "BAND" -> col("band"),
      "MEDSCONF" -> lit("y3v02"))
    val filetypes = templates.keys.toSeq.sorted
    coords
      .withColumn("filetype", explode(array(filetypes.map(lit): _*)))
      .withColumn("path", coalesce(filetypes.map(ft =>
        when($"filetype" === ft, desPathCol(ft, vars))): _*))
      .select($"o_orderkey", $"filetype", $"path")
      .orderBy($"o_orderkey", $"filetype")
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

  /** [[hierarchySrclist]] with desdb's STOP-PREDICATE semantics as a
    * hash-verified declared query: the walk halts at the first
    * ancestor carrying the stop attribute (here: o_orderkey % 7 == 0,
    * standing in for `filetype='red'`) instead of at the absolute
    * root. Same orders-derived hierarchy and edge set as the plain
    * walk, so the two keys differ exactly by the stop rule. */
  def hierarchySrclistStop(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nodes = Tables(spark, sfDir, "orders").select($"o_orderkey".as("id"))
    val edges = nodes
      .withColumn("parent", expr("id div 10"))
      .filter($"parent" =!= $"id")
      .join(nodes.select($"id".as("pid")), $"parent" === $"pid", "left_semi")
      .select($"id".as("child"), $"parent")
    val stops = nodes.filter($"id" % 7 === 0)
    resolveUntil(nodes, edges, stops, maxDepth = 20).orderBy($"leaf")
  }

  /** NATIVE recursive-CTE twin of [[hierarchySrclist]]: Spark 4.1
    * executes `WITH RECURSIVE` directly (UnionLoop iterative
    * execution), so the same parent-chase is expressed as one SQL
    * statement instead of the driver loop — and hash-matches the
    * identical DuckDB oracle. Trade-off vs [[resolveToRoots]], from
    * comparing the plans: the native loop re-plans the step query per
    * iteration and carries the whole accumulated union, while the
    * driver loop checkpoints per level and fuses its convergence probe
    * into the checkpoint job, which also gives fault-tolerant lineage
    * truncation on a real cluster — so the driver loop remains the
    * scale path and this key documents the engine-native alternative
    * (SURVEY §7.5 probe closed: recursion IS available in Spark 4.1). */
  def hierarchySrclistCte(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nodes = Tables(spark, sfDir, "orders").select($"o_orderkey".as("id"))
    // materialize the edge set ONCE: the recursion's step query is
    // re-executed per level, and an edges CTE (a nodes⨯nodes
    // self-join) would be re-joined from scratch each level AND again
    // for the root filter — checkpointing it first makes every level
    // a single frontier⨝edges hash join over a small materialized
    // relation (measured ~3.5 s → ~2.9 s steady at sf0.1; the rest is
    // the engine loop's per-level re-planning — the documented cost
    // the driver-loop key avoids)
    val edges = nodes.withColumn("parent", expr("id div 10"))
      .filter($"parent" =!= $"id")
      .join(nodes.select($"id".as("pid")), $"parent" === $"pid", "left_semi")
      .select($"id".as("child"), $"parent")
      .transform(graft.Tables.truncate)
    // per-call unique view names, dropped right after spark.sql —
    // analysis is eager, so the returned plan holds the RESOLVED
    // relations and needs no catalog entry at execution time; a
    // fixed-name view left behind would be a session side effect
    // pointing at checkpoint blocks the harness later frees
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val (nv, ev) = (s"srclist_nodes_$tag", s"srclist_edges_$tag")
    nodes.createOrReplaceTempView(nv)
    edges.createOrReplaceTempView(ev)
    try spark.sql(
      s"""WITH RECURSIVE walk AS (
         |  SELECT id AS leaf, id AS cur, 0 AS depth FROM $nv
         |  UNION ALL
         |  SELECT w.leaf, e.parent AS cur, w.depth + 1 AS depth
         |  FROM walk w JOIN $ev e ON w.cur = e.child)
         |SELECT leaf, cur AS root, depth FROM walk w
         |WHERE NOT EXISTS (SELECT 1 FROM $ev e WHERE e.child = w.cur)
         |ORDER BY leaf""".stripMargin)
    finally {
      spark.catalog.dropTempView(nv)
      spark.catalog.dropTempView(ev)
    }
  }

  /** [[hierarchySrclist]] by POINTER DOUBLING — O(log depth) rounds
    * instead of O(depth): the jump relation starts as the 1-step
    * parent map and is SQUARED each round (terminal-capped left
    * self-join: a node whose remaining chain is shorter than the jump
    * length keeps its root pointer and accumulated depth), so after
    * ceil(log₂(maxDepth)) squarings every non-root maps directly to
    * its root with its true depth, and ONE final left join labels all
    * nodes. At depth ≈ 7 this is 5 fixed jobs vs the level walk's
    * 7 data-dependent ones (bench-equal at sf0.1, job-overhead
    * dominated); at a 100-deep chain it is 7 rounds vs 100 — the same
    * log-rounds idea as [[Graph.connectedComponents]]'s label
    * shortcutting, applied to the reference's signature op. Cycle
    * safety: rounds are FIXED (no data-dependent loop), so a cyclic
    * input cannot hang — it just yields ≤ 2^rounds-step positions
    * (the acyclic contract is the same one the level walk's maxDepth
    * guard enforces). Hash-matches the identical srclist oracle. */
  def hierarchySrclistDoubling(spark: SparkSession, sfDir: String)
      : DataFrame = {
    import spark.implicits._
    val nodes = Tables(spark, sfDir, "orders").select($"o_orderkey".as("id"))
    val edges = nodes
      .withColumn("parent", expr("id div 10"))
      .filter($"parent" =!= $"id")
      .join(nodes.select($"id".as("pid")), $"parent" === $"pid", "left_semi")
      .select($"id".as("child"), $"parent")
    // round count DERIVED from the edge law, not a constant (r13):
    // parent = id div 10 strips one decimal digit per step, so chain
    // depth ≤ digits(max id) and ceil(log₂(digits)) squarings suffice —
    // 3 rounds for any corpus with ids < 10⁸ vs the generic default's
    // 5. The bound is mathematical (a div-10 chain from a d-digit id
    // dies within d steps whatever the corpus), so this stays
    // scale-ADAPTIVE: a 10¹⁶-id corpus gets 4 rounds, never fewer than
    // the chain needs. One 1-row max() aggregate (parquet column
    // stats-cheap) buys 2 fewer checkpointed self-join rounds per run.
    val maxId = nodes.agg(max($"id")).as[Option[Long]].collect()(0)
      .getOrElse(0L)
    val digits = math.max(1, maxId.toString.length)
    // ceil(log2(digits)), floored at 1: 2^rounds ≥ digits ≥ chain depth
    val rounds =
      math.max(1, 32 - Integer.numberOfLeadingZeros(digits - 1))
    resolveByDoubling(nodes, edges, rounds).orderBy($"leaf")
  }

  /** The doubling core — shared by the declared key and the
    * deep-chain spec (which drives it with a 12-link synthetic chain
    * the corpus depth can't reach). `nodes`: one column "id";
    * `edges`: ("child", "parent"). Returns (leaf, root, depth). */
  private[graft] def resolveByDoubling(nodes: DataFrame,
      edges: DataFrame, rounds: Int = 5): DataFrame = {
    import nodes.sparkSession.implicits._
    var jump = edges
      .select($"child".as("from"), $"parent".as("to"), lit(1).as("d"))
      .transform(graft.Tables.truncate)
    // default 2^5 = 32 ≥ the level walk's maxDepth guard of 20; callers
    // with a tighter depth bound (the declared key derives one from its
    // div-10 edge law) pass fewer rounds — the RESULT is identical once
    // 2^rounds covers the true depth, extra rounds are no-op squarings
    for (_ <- 1 to rounds) {
      // rename the probe side wholesale: a self-join of one truncated
      // plan needs disjoint attribute names, not alias qualifiers
      val b = jump.select($"from".as("bfrom"), $"to".as("bto"),
        $"d".as("bd"))
      jump = jump.join(b, $"to" === $"bfrom", "left")
        .select($"from", coalesce($"bto", $"to").as("to"),
          ($"d" + coalesce($"bd", lit(0))).as("d"))
        .transform(graft.Tables.truncate)
    }
    nodes.join(jump, nodes("id") === jump("from"), "left")
      .select(nodes("id").as("leaf"),
        coalesce($"to", nodes("id")).as("root"),
        coalesce($"d", lit(0)).as("depth"))
  }

  /** Generic parent-chasing core (shared by the declared query and the
    * DES-shaped fixture tests): walk every node of `nodes` ("id") up
    * the `edges` ("child" → "parent") relation until no edge applies;
    * returns (leaf, root, depth). One distributed join per level — the
    * frontier-emptiness probe that drives the loop is FUSED into each
    * level's checkpoint job ([[graft.Tables.truncateCountTrue]]), so a
    * level costs one Spark job, not checkpoint + isEmpty; lazy
    * resolved parts (the union is depth-many cheap joins over the
    * checkpointed frontiers); `maxDepth` is the cycle guard. */
  def resolveToRoots(nodes: DataFrame, edges0: DataFrame,
      maxDepth: Int, broadcastEdges: Boolean = false): DataFrame =
    resolveCore(nodes, edges0, None, maxDepth, broadcastEdges)

  /** [[resolveToRoots]] with a STOP predicate — the reference's actual
    * srclist semantics [pub: desdb/files.py Coadd._get_srclist]: the
    * walk up the parent chain stops at the FIRST ancestor whose id is
    * in `stopIds` (desdb stops where `filetype='red'`), not at the
    * absolute root. A node that is itself a stop node resolves to
    * itself at depth 0; a chain that dead-ends without meeting a stop
    * node resolves to its root exactly like [[resolveToRoots]].
    * `stopIds`: one column "id"; broadcast per level (the stop set is
    * a filetype slice of the catalog — dimension-sized). */
  def resolveUntil(nodes: DataFrame, edges0: DataFrame, stopIds: DataFrame,
      maxDepth: Int, broadcastEdges: Boolean = false): DataFrame =
    resolveCore(nodes, edges0, Some(stopIds), maxDepth, broadcastEdges)

  private def resolveCore(nodes: DataFrame, edges0: DataFrame,
      stopIds: Option[DataFrame], maxDepth: Int,
      broadcastEdges: Boolean): DataFrame = {
    import nodes.sparkSession.implicits._
    // the stop attribute is resolved ONCE, up front: edges carry
    // whether their parent is a stop node, the level-0 frontier whether
    // the node itself is — so each level is ONE frontier⨝edges join
    // plus filters, with no per-level stop joins or broadcast builds
    // distinct: a duplicated id in the stop set must test MEMBERSHIP,
    // not fan the left joins out once per duplicate row
    val stampSet = stopIds.map(_.select($"id".as("sid")).distinct())
    val stamped = stampSet match {
      case Some(st) =>
        edges0.join(st, edges0("parent") === $"sid", "left")
          .select($"child", $"parent", $"sid".isNotNull.as("p_stop"))
      case None => edges0.select($"child", $"parent", lit(false).as("p_stop"))
    }
    val edgesCp = stamped.transform(graft.Tables.truncate)
    val edges = if (broadcastEdges) broadcast(edgesCp) else edgesCp
    var frontier = (stampSet match {
      case Some(st) =>
        nodes.join(st, nodes("id") === $"sid", "left")
          .select(nodes("id").as("leaf"), nodes("id").as("cur"),
            lit(0).as("depth"), $"sid".isNotNull.as("at_stop"))
      case None => nodes.select($"id".as("leaf"), $"id".as("cur"),
        lit(0).as("depth"), lit(false).as("at_stop"))
    })
    // no up-front emptiness probe: an empty node set just runs ONE
    // level whose fused count comes back 0 (same empty result), while
    // every non-empty corpus saves a full Spark job per rep (r13 —
    // guide §2.4, remove actions that only re-derive what the loop's
    // own first round proves anyway)
    var frontierLive = true
    val resolved = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var level = 0
    while (level < maxDepth && frontierLive) {
      // a frontier node carrying the stop attribute resolves to itself
      // (level 0 reads the raw nodes⨝stops plan; levels ≥ 1 read the
      // previous round's checkpointed blocks)
      resolved += frontier.filter($"at_stop")
        .select($"leaf", $"cur".as("root"), $"depth")
      val walking = frontier.filter(!$"at_stop")
      // checkpoint the WHOLE level join — dead-end rows included — so
      // the level's frontier⨝edges join executes exactly once, inside
      // this checkpoint job. The pre-r13 shape checkpointed only the
      // continuation and left each level's dead-end branch (filter
      // parent IS NULL over the raw join) lazy in `resolved`, so the
      // final action RE-RAN every level's join a second time —
      // measured at sf0.1 as roughly half the key's cost. The fused
      // count ("live" = rows that keep walking) still drives the loop
      // in the same single job per level.
      val (cp, live) = graft.Tables.truncateCountTrue(
        walking.join(edges, walking("cur") === edges("child"), "left")
          .select($"leaf", $"cur", $"depth", $"parent", $"p_stop")
          .withColumn("live", $"parent".isNotNull),
        "live")
      resolved += cp.filter($"parent".isNull)
        .select($"leaf", $"cur".as("root"), $"depth")
      frontier = cp.filter($"parent".isNotNull)
        .select($"leaf", $"parent".as("cur"), ($"depth" + 1).as("depth"),
          $"p_stop".as("at_stop"))
      frontierLive = live > 0
      level += 1
    }
    require(!frontierLive, s"hierarchy deeper than cycle guard $maxDepth")
    resolved.reduceOption(_ unionByName _)
      // empty nodes → empty (leaf, root, depth) result, not empty.reduce
      .getOrElse(frontier.select($"leaf", $"cur".as("root"), $"depth"))
      .select($"leaf", $"root", $"depth".cast(IntegerType).as("depth"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_despath" -> udfDespath,
    "q_udf_despath_multi" -> udfDespathMulti,
    "q_hierarchy_srclist" -> hierarchySrclist,
    "q_hierarchy_srclist_stop" -> hierarchySrclistStop,
    "q_hierarchy_srclist_cte" -> hierarchySrclistCte,
    "q_hierarchy_srclist_doubling" -> hierarchySrclistDoubling
  )
}
