package graft

import org.apache.spark.sql.functions._

/** Round-11 wave: the durable-checkpoint leg through a multi-round
  * iterative operator (VERDICT r10 ask #7) and the screened
  * containment-prefix miner's recall/equivalence probes (ask #1). */
class OpsRound17Spec extends SparkSpec {
  import spark.implicits._

  test("pagerank under spark.graft.checkpointDir: durable rounds, " +
    "same result, subdir reclaimed") {
    // baseline on the localCheckpoint path (no conf set)
    val expected = ops.LlmOps.graphPagerank(spark, sfDir).collect().toSeq
    val dir = s"/tmp/graft_cp_${java.util.UUID.randomUUID()}"
    try {
      spark.conf.set("spark.graft.checkpointDir", dir)
      val got = ops.LlmOps.graphPagerank(spark, sfDir).collect().toSeq
      assert(got === expected,
        "durable-checkpoint run diverged from the localCheckpoint run")
      // the loop's truncations must have gone through the RELIABLE
      // path: the run's UUID subdir holds rdd-* checkpoint data
      val cp = spark.sparkContext.getCheckpointDir.get
      assert(new org.apache.hadoop.fs.Path(cp).getParent.toUri.getPath
        === new org.apache.hadoop.fs.Path(dir).toUri.getPath, cp)
      val sub = new java.io.File(new java.net.URI(
        if (cp.contains(":")) cp else s"file:$cp"))
      val rdds = Option(sub.listFiles).toSeq.flatten
        .filter(_.getName.startsWith("rdd-"))
      assert(rdds.nonEmpty,
        s"no rdd-* checkpoint dirs under $cp — the durable path never ran")
      // reclaim = the shutdown hook's body; assert it leaves nothing
      Tables.reclaimCheckpoint(cp, spark.sparkContext.hadoopConfiguration)
      assert(!sub.exists, s"$cp not reclaimed")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
