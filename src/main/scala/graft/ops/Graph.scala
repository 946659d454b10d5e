package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed iterative graph primitives used by the dedup-cluster
  * operators. Spark has no recursive CTE, so fixpoint iteration lives
  * in a driver loop of whole-relation joins — the same pattern as
  * [[DesFiles.resolveToRoots]]: one distributed job per round, lineage
  * truncated between rounds, never a per-row driver query.
  */
object Graph {

  /** Connected components by min-label propagation WITH label
    * shortcutting: each round also treats the current (id → component)
    * links as edges, so a label reaches 2^round hops — O(log diameter)
    * rounds instead of O(diameter), the property that makes long chains
    * tractable at scale (same idea as the star-contraction CC
    * algorithms used on web-scale graphs).
    *
    * `nodes`: one column `id`; `edges`: columns `src`, `dst`
    * (undirected — pass each pair once, both directions are derived;
    * every endpoint must appear in `nodes`, or the stray id surfaces
    * as an extra labeled row). Returns (id, component) where
    * `component` is the minimum node id in the component — a
    * deterministic canonical representative.
    *
    * Each round is ONE Spark job: one shuffle join on the propagation
    * key + one min-aggregation that ALSO carries the previous label,
    * with convergence (any label changed?) counted by an accumulator
    * INSIDE the round's checkpoint-materialization job
    * ([[graft.Tables.truncateCountTrue]]) — no separate convergence
    * action, no extra join, no extra shuffle.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIters: Int = 25): DataFrame = {
    import nodes.sparkSession.implicits._
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .transform(graft.Tables.truncate)
    var labels = nodes.select($"id", $"id".as("component"))
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // shortcut links: component representative <-> member
      val links = labels.filter($"id" =!= $"component")
        .select($"id".as("src"), $"component".as("dst"))
      val allE = und
        .union(links)
        .union(links.select($"dst".as("src"), $"src".as("dst")))
      // null-safe <=>: an id that first appears this round (edge
      // endpoint missing from `nodes`) has prev = null and MUST count
      // as a change, or the loop would declare convergence with split
      // components
      val next = allE.join(labels.withColumnRenamed("id", "src"), "src")
        .select($"dst".as("id"), $"component", lit(false).as("is_old"))
        .union(labels.select($"id", $"component", lit(true).as("is_old")))
        .groupBy($"id")
        .agg(min($"component").as("component"),
          min(when($"is_old", $"component")).as("prev"))
        .withColumn("changed", !($"component" <=> $"prev"))
        .select($"id", $"component", $"changed")
      val (cp, changes) = graft.Tables.truncateCountTrue(next, "changed")
      converged = changes == 0
      labels = cp
      iter += 1
    }
    require(converged, s"components not converged within $maxIters rounds")
    labels
  }
}
