package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact TRIANGLE COUNTING and local clustering coefficient over an
  * undirected graph — the density signal the link-analysis trio
  * ([[PageRank]] authority, [[LabelPropagation]] labels) does not
  * measure: spam cliques in a near-dup/citation graph have high local
  * clustering (everybody links everybody), organic bridges low, so
  * per-node LCC is a first-class curation feature next to rank.
  *
  * Deterministic and exact-integer throughout (triangle counts are
  * integers; LCC is one final division), so the result is cross-engine
  * gateable (d84's oracle re-derives the same orientation in SQL).
  *
  * Algorithm — DEGREE-ORDERED EDGE ORIENTATION, the standard
  * all-pairs-free construction: canonicalize edges (self-loops drop,
  * duplicates collapse), then orient every edge from its lower endpoint
  * to its higher under the total order (degree, id). Every triangle
  * {u,v,w} has exactly ONE lowest-order vertex, so it is found exactly
  * once: as a wedge (u→v, u→w) whose closing edge (v,w) exists in the
  * oriented set. Out-degrees under this orientation are O(√m), which
  * bounds the wedge fan-out per node — a hot celebrity node of degree
  * 10^6 generates no 10^12-pair explosion because its edges all point
  * INTO it (classic result; GraphFrames/Trino count triangles the same
  * way).
  *
  * Scale shape: one distinct (shuffle on the canonical pair), one
  * degree aggregate, two id-keyed joins to attach endpoint degrees, one
  * wedge self-join on the oriented source, one equi-join of wedges
  * against oriented edges on the closing pair (pre-filtered by a
  * broadcast Bloom filter over the oriented edge set, so the closing
  * exchange carries surviving wedges instead of all of them), and one
  * per-node count of exploded triangle corners. Triangle rows — not
  * wedges — are the only data multiplied (×3 corners). No stage is
  * quadratic in a node's raw degree.
  *
  * @return one row per node of the simple graph:
  *         (id, degree, triangles, lcc) with
  *         lcc = 2·triangles / (degree·(degree−1)), 0.0 when degree < 2 */
object Triangles {

  /** @param stageSecs when set, receives ("orient", secs) after the
    *        oriented frame MATERIALIZES (forced via count — the persist
    *        is otherwise lazy and the first consumer would be charged
    *        the build) and ("wedge", secs) after the wedge join +
    *        per-node counts land; the r15 ScaleBench finding (318s
    *        first run vs 131s rerun on the same graph) was unreadable
    *        precisely because the committed number mixed input
    *        re-materialization into the operator's cost. Default None:
    *        no extra job, behavior unchanged. */
  def triangleCounts(edges: DataFrame,
                     idCol1: String = "id1",
                     idCol2: String = "id2",
                     stageSecs: Option[(String, Double) => Unit] = None)
      : DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val t0 = System.nanoTime()
    // canonical simple graph: unordered pair, self-loops out, dups out
    val canon = edges
      .select(least(col(idCol1), col(idCol2)).as("u"),
        greatest(col(idCol1), col(idCol2)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = canon.select(col("u").as("id"))
      .unionByName(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // orient low -> high under (degree, id); ties cannot survive the
    // id tiebreak (ids are distinct by the u != v filter)
    def lower(du: Column, u: Column, dv: Column, v: Column): Column =
      du < dv || (du === dv && u < v)
    val withDeg = canon
      .join(deg.select(col("id").as("u"), col("degree").as("__du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("degree").as("__dv")), Seq("v"))
    val oriented = withDeg.select(
        when(lower(col("__du"), col("u"), col("__dv"), col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(lower(col("__du"), col("u"), col("__dv"), col("v")),
          col("v")).otherwise(col("u")).as("dst"),
        when(lower(col("__du"), col("u"), col("__dv"), col("v")),
          col("__dv")).otherwise(col("__du")).as("__dd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one count serves both the stage-split materialization and the
    // Bloom sizing below (ADVICE r17: it used to run twice when
    // stageSecs was set)
    var countedEdges: Option[Long] = None
    stageSecs.foreach { cb =>
      countedEdges = Some(oriented.count()) // force the persist so the stage split is real
      cb("orient", (System.nanoTime() - t0) / 1e9)
    }
    val tW = System.nanoTime()
    // wedges at the lowest-order corner: both dst endpoints outrank
    // src, so the closing edge — if present — is oriented between them
    // under the same order; emit the pair already in that order so ONE
    // equi-join closes it
    val e1 = oriented.select(col("src"), col("dst").as("x"),
      col("__dd").as("__dx"))
    val e2 = oriented.select(col("src"), col("dst").as("y"),
      col("__dd").as("__dy"))
    val wedges = e1.join(e2, Seq("src"))
      .where(lower(col("__dx"), col("x"), col("__dy"), col("y")))
      .select(col("src"), col("x"), col("y"))
    // Bloom pre-filter (optimization guide §3.2): wedges outnumber edges
    // by the orientation's out-degree fan-out (Σ C(outdeg,2) vs m — r17
    // measured 377MB of wedge shuffle against 13MB of edges at the d84
    // gate), and only the closing-edge survivors matter downstream. A
    // broadcast Bloom filter over xxhash64(src,dst) of the oriented edge
    // set drops definitely-non-closing wedges BEFORE the (x,y) exchange;
    // false positives only cost a little extra shuffle — the exact
    // left-semi join below is unchanged, so the result is identical.
    // Skipped above `graft.triangles.bloomMaxEdges` (default 200M ≈
    // 240MB broadcast at 1% fpp): at that scale the filter itself stops
    // fitting comfortably in executor memory, and the plain shuffled
    // semi-join is the robust path. The configured cap is additionally
    // clamped to what the DRIVER can hold (the filter aggregates on the
    // driver before broadcasting — ADVICE r17): 1% fpp costs ~9.6
    // bits/item, and the clamp allows at most ~1/16 of the driver's max
    // heap, so a default-config run near the cap degrades to the
    // shuffled semi-join instead of OOMing during stat.bloomFilter.
    val spark = edges.sparkSession
    val memMaxEdges = Runtime.getRuntime.maxMemory / 16 * 10 / 12 // bytes/16 ÷ ~1.2 B/item
    val bloomMax = math.min(
      spark.conf.get("graft.triangles.bloomMaxEdges", "200000000").toLong,
      memMaxEdges)
    val edgeCount = countedEdges.getOrElse(oriented.count())
    val wedgesPruned =
      if (edgeCount > 0 && edgeCount <= bloomMax) {
        val bf = oriented.stat.bloomFilter(
          xxhash64(col("src"), col("dst")), edgeCount, 0.01)
        val bfB = spark.sparkContext.broadcast(bf)
        val mightClose = udf((h: Long) => bfB.value.mightContainLong(h))
        wedges.where(mightClose(xxhash64(col("x"), col("y"))))
      } else wedges
    val triangles = wedgesPruned
      .join(oriented.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y"), "left_semi")
    // every triangle credits all three corners
    val perNode = triangles
      .select(explode(array(col("src"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    val out = deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles").cast("double") /
            (col("degree") * (col("degree") - 1)).cast("double"))
          .otherwise(lit(0.0)))
    val materialized = out.localCheckpoint()
    stageSecs.foreach(_("wedge", (System.nanoTime() - tW) / 1e9))
    Seq(oriented, deg, canon).foreach(_.unpersist(blocking = true))
    materialized
  }

  /** DEGREE ASSORTATIVITY (Newman's r) of the simple undirected graph —
    * the companion global signal to per-node LCC: spam link farms are
    * strongly assortative (hubs citing hubs), organic content graphs
    * mildly disassortative, so one number flags a manipulated corpus
    * slice before any per-node work.
    *
    * r = Pearson correlation of (deg(u), deg(v)) over the DIRECTED
    * doubling of the edge set (each edge contributes (x,y) and (y,x) —
    * the standard symmetric form, so Σx = Σy and the formula collapses
    * to three sums). Every sum is EXACT decimal arithmetic over
    * integer degrees — M·Σxy, (Σx)², M·Σx² stay inside decimal(38,0)
    * up to ~10^9 edges of degree ~10^6 — with ONE double division at
    * the end, so the result is cross-engine bit-exact (d85).
    *
    * Scale shape: one distinct, one degree aggregate, two id-keyed
    * joins to attach endpoint degrees, one global 4-sum aggregate
    * (map-side partial). Returns ONE row (m_edges, assortativity);
    * assortativity is NULL for a degree-regular graph (denominator 0 —
    * guarded identically in the oracle, never a fabricated value). */
  def degreeAssortativity(edges: DataFrame,
                          idCol1: String = "id1",
                          idCol2: String = "id2"): DataFrame = {
    val canon = edges
      .select(least(col(idCol1), col(idCol2)).as("u"),
        greatest(col(idCol1), col(idCol2)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = canon.select(col("u").as("id"))
      .unionByName(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
    // both orientations from ONE join pass: the union form planned the
    // canon⋈deg⋈deg subtree twice (r17 plan audit: 20 broadcast
    // exchanges, 886-line plan for a 1-row aggregate); exploding the
    // two orientations from a single attached frame emits the identical
    // row multiset — the three sums below are order-independent exact
    // decimals, so the result is bit-identical
    val doubled = canon
      .join(deg.select(col("id").as("u"), col("d").as("__du")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("d").as("__dv")), Seq("v"))
      .select(explode(array(
          struct(col("__du").as("x"), col("__dv").as("y")),
          struct(col("__dv").as("x"), col("__du").as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    doubled.agg(
        count(lit(1)).as("m2"),
        sum(dec(col("x"))).as("sx"),
        // cast BEFORE multiplying: long·long would overflow first
        sum(dec(col("x")) * dec(col("y"))).as("sxy"),
        sum(dec(col("x")) * dec(col("x"))).as("sx2"))
      .withColumn("__num",
        dec(col("m2")) * col("sxy") - col("sx") * col("sx"))
      .withColumn("__den",
        dec(col("m2")) * col("sx2") - col("sx") * col("sx"))
      .select(
        (col("m2") / 2).cast("long").as("m_edges"),
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise(col("__num").cast("double") /
            col("__den").cast("double")).as("assortativity"))
  }
}
