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

  /** Connected components by min-label propagation.
    *
    * `nodes`: one column `id`; `edges`: columns `src`, `dst`
    * (undirected — pass each pair once, both directions are derived).
    * Returns (id, component) where `component` is the minimum node id
    * in the component — a deterministic canonical representative.
    *
    * Rounds needed = graph diameter (≤ `maxIters` guard). Each round is
    * a shuffle join on `id` + a min-aggregation — at 100 TB both sides
    * hash-partition on the same key, and near-dup graphs are forests of
    * small cliques, so the frontier collapses after 2–3 rounds.
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
      // candidate labels flowing across edges, merged with current
      val proposals = und.join(labels, und("src") === labels("id"))
        .select($"dst".as("id"), $"component")
        .union(labels)
        .groupBy($"id").agg(min($"component").as("component"))
        .transform(graft.Tables.truncate)
      val changed = proposals.as("n")
        .join(labels.as("o"), $"n.id" === $"o.id")
        .filter($"n.component" =!= $"o.component")
        .limit(1).count()
      labels = proposals
      converged = changed == 0
      iter += 1
    }
    require(converged, s"components not converged within $maxIters rounds")
    labels
  }
}
