package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-CORE decomposition of an undirected simple graph — the density
  * TIER signal completing the graph-curation kit ([[Triangles]] local
  * density, [[PageRank]] authority, this one cohesion): the k-core is
  * the maximal subgraph where every node keeps degree >= k, the
  * classic definition of a "tightly-knit group" — spam farms and
  * template mills survive deep cores that organic content falls out
  * of.
  *
  * Algorithm: iterative PEELING — drop every node whose current degree
  * is < k, restrict the edge set to survivors, repeat to fixpoint.
  * Deterministic and exact-integer (a node's survival is a pure
  * function of the graph), and PEELING IS IDEMPOTENT AT THE FIXPOINT:
  * once stable, further rounds are no-ops — so a SQL oracle that
  * unrolls MORE rounds than the engine needed computes the identical
  * result (d86 unrolls a fixed budget; the operator FAILS LOUDLY if it
  * hasn't converged within `maxIterations`, never returns a
  * half-peeled set — the connectedComponents discipline).
  *
  * Scale shape per round: one degree aggregate + two semi-joins to
  * restrict the edge frame, lineage truncated per round
  * (localCheckpoint). Rounds are typically few (single digits) — each
  * round must delete at least one node to continue.
  *
  * @return the k-core's nodes as (id, core_degree) — degree WITHIN the
  *         core; empty frame if the graph has no k-core */
object KCore {

  /** A [[kCore]] result: the core's nodes plus the number of peeling
    * rounds the fixpoint took — carried IN the result rather than a
    * ThreadLocal side-channel (round-15 finding: a concurrent runner
    * reading another query's round count would gate on the wrong
    * value; per-call results cannot cross-read by construction). */
  final case class KCoreResult(nodes: DataFrame, rounds: Int)

  /** [[kCoreWithRounds]] for callers that only want the nodes. */
  def kCore(edges: DataFrame, k: Int,
            idCol1: String = "id1", idCol2: String = "id2",
            maxIterations: Int = 30): DataFrame =
    kCoreWithRounds(edges, k, idCol1, idCol2, maxIterations).nodes

  def kCoreWithRounds(edges: DataFrame, k: Int,
            idCol1: String = "id1", idCol2: String = "id2",
            maxIterations: Int = 30): KCoreResult = {
    require(k >= 1, s"k must be >= 1: $k")
    require(maxIterations >= 1, s"maxIterations must be >= 1: $maxIterations")
    var e = edges
      .select(least(col(idCol1), col(idCol2)).as("u"),
        greatest(col(idCol1), col(idCol2)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var iters = 0
    // carried across rounds: counting the prior round's (already
    // localCheckpointed) frame again would be a redundant job per round
    var eCount = e.count()
    while (!converged && iters < maxIterations) {
      iters += 1
      val keep = e.select(col("u").as("id"))
        .unionByName(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("d"))
        .where(col("d") >= k)
        .select(col("id"))
      val pruned = e
        .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint()
      // converged when no edge was dropped (node survival is a pure
      // function of the edge set, so stable edges => stable nodes)
      val prunedCount = pruned.count()
      converged = prunedCount == eCount
      eCount = prunedCount
      e = pruned
    }
    if (!converged) throw new IllegalStateException(
      s"kCore did not converge in $maxIterations rounds — raise it")
    KCoreResult(
      e.select(col("u").as("id"))
        .unionByName(e.select(col("v").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("core_degree")),
      iters)
  }
}
