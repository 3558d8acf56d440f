package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-supervised LABEL PROPAGATION over an undirected graph — the
  * graph twin of k-NN weak labeling (s22/s27 vote over embedding
  * neighbors; this votes over EDGE neighbors): a small trusted seed set
  * (human-labeled quality tiers, known-language docs, curated topic
  * tags) spreads across a similarity/near-dup graph, labeling the
  * unlabeled mass at the cost of a few joins instead of a model.
  *
  * Deterministic by construction, so the result is cross-engine
  * gateable (d82): each round every NON-seed node takes the MAJORITY
  * label among its currently-labeled neighbors — counts are exact
  * integers, ties break to the SMALLEST label (what SQL's
  * `ORDER BY c DESC, label` row_number picks), a node with no labeled
  * neighbor keeps its current label (possibly null), and seeds are
  * CLAMPED (their label never changes — the semi-supervised contract;
  * free-running LPA oscillates and is order-dependent, exactly what a
  * gateable operator cannot be). Fixed `iters` rounds — curation uses
  * 2-5; each covers one more hop of graph distance from the seeds.
  *
  * Scale shape per round: the symmetric edge frame joins the current
  * (node, label) frame — ids and small labels only, never payloads —
  * then one (node, label) count aggregate and one per-node top-1
  * window; lineage truncates per round (localCheckpoint — the
  * iterative-loop discipline of [[PageRank]] and connectedComponents).
  * The node universe is edge endpoints ∪ seeds; a seed outside the
  * graph keeps its label and influences nothing.
  *
  * @param edges undirected pairs (`idCol1`, `idCol2`) — symmetrized
  *              internally; duplicates weight the vote
  * @param seeds (`seedIdCol`, `seedLabelCol`) — clamped
  * @return (node, label) for every node in the universe; label null
  *         where no seed is reachable within `iters` hops */
object LabelPropagation {

  def propagateLabels(edges: DataFrame, seeds: DataFrame,
                      iters: Int,
                      idCol1: String = "id1", idCol2: String = "id2",
                      seedIdCol: String = "id",
                      seedLabelCol: String = "label"): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    import org.apache.spark.storage.StorageLevel
    val sym = edges.select(col(idCol1).as("a"), col(idCol2).as("b"))
      .unionByName(edges.select(col(idCol2).as("a"), col(idCol1).as("b")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val seed = seeds.select(col(seedIdCol).as("node"),
        col(seedLabelCol).as("__slab")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = sym.select(col("a").as("node")).distinct()
      .unionByName(seed.select(col("node"))).distinct()
      .join(seed, Seq("node"), "left")
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = nodes.select(col("node"), col("__slab").as("label"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      // majority label among labeled neighbors: exact counts, ties to
      // the smallest label — one aggregate + one per-node top-1 window
      val votes = sym
        .join(labels.select(col("node").as("b"), col("label").as("__nl")),
          Seq("b"))
        .where(col("__nl").isNotNull)
        .groupBy(col("a").as("node"), col("__nl"))
        .agg(count(lit(1)).as("__c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node"))
        .orderBy(col("__c").desc, col("__nl").asc)
      val pick = votes
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("node"), col("__nl"))
      val prev = labels
      labels = nodes
        .join(labels.select(col("node"), col("label")), Seq("node"))
        .join(pick, Seq("node"), "left")
        // seeds clamp; others take the vote, else keep what they had
        .select(col("node"),
          coalesce(col("__slab"), col("__nl"), col("label")).as("label"))
        .localCheckpoint()
      prev.unpersist(blocking = true)
    }
    Seq(sym, seed, nodes).foreach(_.unpersist(blocking = true))
    labels
  }
}
