package graft

/** Physical-plan regression guards: the 100TB properties (pushdown,
  * pruning, broadcast choice, top-k short-circuit, partial aggregation)
  * asserted on the actual planned queries, so a refactor that silently
  * drops one fails the suite rather than only showing up at scale.
  */
class PlanAuditSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filter pushed to parquet + map-side partial aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
    assert(p.contains("partial_sum"))
  }

  test("q02: column-pruned scan (no unused columns read)") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity"))
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q05: dimension tables broadcast, no cartesian product") {
    val p = plan("q05_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "supplier/nation/region should broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q07: anti-join with the date filter pushed down") {
    val p = plan("q07_anti_join")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"))
  }

  test("q10: global sort+limit plans as TakeOrderedAndProject") {
    val p = plan("q10_sort_limit")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Sort ["), "full sort materialization instead of top-k")
  }

  test("q24: 1-row threshold broadcast (never shuffles the fact side), " +
    "anti-join on the filtered order keys, pushed order filter") {
    val p = plan("q24_inactive_high_balance")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the 1-row scalar threshold must broadcast")
    assert(p.contains("LeftAnti"))
    assert(p.contains("GreaterThan(o_totalprice"),
      "big-order filter should reach the orders scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q31: EXISTS with a cross-table date conjunct plans as ONE " +
    "left-semi join (non-equi predicate rides the join, no cartesian); " +
    "order date window pushed to the scan; priority histogram partial") {
    val p = plan("q31_late_ship_priority")
    assert(p.contains("LeftSemi"))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "the date window must reach the orders scan")
    assert(p.contains("partial_count"),
      "the priority histogram must partially aggregate map-side")
  }

  test("q32: both filters sit on their own scans (never cross the " +
    "join); conditional CASE sums partially aggregate") {
    val p = plan("q32_priority_class_mix")
    assert(p.contains("Not(EqualTo(l_returnflag,N))"),
      "returnflag filter must reach the lineitem scan")
    // the pushed-filter list is TRUNCATED in toString, so the shipdate
    // window is asserted via the scan-side Filter predicate instead
    assert(p.contains("l_shipdate#") && p.contains(">= 1996-01-01"),
      "shipdate window must sit on the lineitem branch below the join")
    assert(p.contains("partial_sum"),
      "both CASE sums must partially aggregate map-side")
    assert(!p.contains("CartesianProduct"))
  }

  test("q33: nation dim broadcasts; the global top-20 plans as " +
    "TakeOrderedAndProject (per-partition heap, no full sort); " +
    "returned-flag and date filters reach their scans") {
    val p = plan("q33_returned_revenue_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("BroadcastHashJoin"), "nation must broadcast")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      "returned-items filter must reach the lineitem scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "order date window must reach the orders scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q34: the cross-side OR-of-ANDs yields EXTRACTED per-side " +
    "disjunctions pushed to both scans (quantity-band union on " +
    "lineitem, brand/size disjunction on part); the exact predicate " +
    "rides the broadcast join; revenue sum partial") {
    val p = plan("q34_disjunctive_revenue")
    assert(p.contains(
      "PushedFilters: [IsNotNull(l_partkey), Or(Or(And(GreaterThanOrEqual(l_quantity"),
      "the quantity-band union must reach the lineitem scan")
    assert(p.contains("Or(Or(And(EqualTo(p_brand"),
      "the brand/size disjunction must reach the part scan")
    assert(p.contains("BroadcastHashJoin"), "part must broadcast")
    assert(p.contains("partial_sum"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q27: red-part filter broadcasts into a semi-join, supplier " +
    "semi-joins the winners, no cartesian") {
    val p = plan("q27_qualified_suppliers")
    assert(p.contains("LeftSemi"))
    assert(p.contains("BroadcastHashJoin"),
      "the red-part key list should broadcast into the lineitem scan")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_sum"),
      "the per-(part,supp) sums must partially aggregate map-side")
  }

  test("q30: NOT-LIKE lands below the outer join (a filter above it " +
    "would drop zero-order customers); both aggregations stay partial; " +
    "the custkey shuffle is reused — no exchange between join and the " +
    "per-customer count") {
    val qe = SparkEntry.queries("q30_order_histogram")(spark, dir)
      .queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("LeftOuter"))
    // the priority filter must sit on the orders SCAN side, not above
    // the join: in the optimized plan the Filter's child subtree
    // contains the orders relation and no Join
    val opt = qe.optimizedPlan
    val filterBelowJoin = opt.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.condition.sql.toLowerCase.contains("orderpriority") =>
        f.collect {
          case _: org.apache.spark.sql.catalyst.plans.logical.Join => ()
        }.isEmpty
    }
    assert(filterBelowJoin == Seq(true),
      s"NOT-LIKE must pre-filter the orders input, not the join output:\n$opt")
    assert(p.contains("partial_count"),
      "both the per-customer count and the histogram must partially aggregate")
    // shuffle reuse: exactly 2 exchanges (customer side + orders side of
    // the custkey join); the groupBy(c_custkey) rides the join's
    // partitioning and the histogram agg exchanges only its partial rows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 3, s"expected <=3 hash exchanges, got $exchanges:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q35: the RANGE-frame window runs over the |days|-sized daily " +
    "aggregate, never the orders scan; one scan, partial daily sums") {
    val qe = SparkEntry.queries("q35_moving_revenue")(spark, dir)
      .queryExecution
    val p = qe.executedPlan.toString
    assert("FileScan".r.findAllIn(p).length == 1,
      "one orders scan only — no second pass for the window input")
    assert(p.contains("RangeFrame"),
      "the 7-day frame must be a value-based RANGE frame, not ROWS")
    // the Window's logical subtree must contain the day-level Aggregate:
    // a window planned directly over the scan would sort |orders| rows
    // instead of |days|
    val windowOverAgg = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window =>
        w.collectFirst {
          case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
        }.nonEmpty
    }
    assert(windowOverAgg == Seq(true),
      s"window must consume the daily aggregate:\n${qe.optimizedPlan}")
    assert(p.contains("partial_sum"),
      "the daily totals must partially aggregate map-side")
  }

  test("q36: the explicit-value-list pivot plans as pivotfirst " +
    "aggregation over ONE scan — no value-discovery pass, no extra " +
    "exchange beyond the two aggregation levels") {
    val p = plan("q36_priority_pivot")
    assert("FileScan".r.findAllIn(p).length == 1,
      "a discovery-mode pivot would add a distinct-values scan")
    assert(p.contains("pivotfirst"),
      "the listed form must plan as the pivotfirst aggregate")
    assert(p.contains("partial_sum") && p.contains("partial_pivotfirst"),
      "both aggregation levels must keep map-side partials")
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      "only the (yr, priority) and yr aggregation exchanges")
    assert(!p.contains("CartesianProduct"))
  }

  test("q37: the widest classic join tree (part, supplier, both nation " +
    "roles, region, customer, orders) runs as broadcast hash joins with " +
    "zero cartesians; type/region/date filters reach their scans") {
    val p = plan("q37_market_share")
    assert(!p.contains("CartesianProduct"))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 6,
      "every dimension of the Q8 tree must broadcast")
    assert(p.contains("EqualTo(p_type,ECONOMY)"),
      "part type filter must reach the part scan")
    assert(p.contains("EqualTo(r_name,ASIA)"),
      "region filter must reach the region scan")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "the order-date window must reach the orders scan")
    assert(p.contains("partial_sum"),
      "both conditional volume sums must partially aggregate map-side")
  }

  test("q38: part's name LIKE prunes before the broadcast; the profit " +
    "tree joins without cartesians and keeps partial aggregation") {
    val p = plan("q38_nation_profit")
    assert(p.contains("StringContains(p_name,rod)"),
      "the LIKE filter must reach the part scan, shrinking the broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_sum"))
  }

  test("q39: the correlated-min retention plans as ONE p_partkey " +
    "exchange carrying both the window MIN and the filter; all dims " +
    "broadcast; the size filter reaches the part scan") {
    val p = plan("q39_cheapest_supplier")
    assert(p.contains("Window") && p.contains("min(unit_price"),
      "the per-part minimum must be a window, not a self-join")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no second pass over the offers for the scalar subquery")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4)
    assert(p.contains("LessThanOrEqual(p_size,3)"),
      "part size filter must reach the part scan")
    // one data exchange (p_partkey) + the final presentation sort only
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"the window and the filter must share ONE partkey exchange:\n$p")
  }

  test("q40: the cross-role OR yields derived per-side IN-lists pushed " +
    "into BOTH nation scans; the exact pair predicate rides the " +
    "broadcast join; volume sums stay partial") {
    val p = plan("q40_shipping_volume")
    assert("Or\\(EqualTo\\(n_name,NATION_1[89]\\),EqualTo\\(n_name,NATION_1[89]\\)\\)".r
      .findAllIn(p).length == 2,
      "each nation role must get its derived IN-list at its own scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      "ship-date window must reach the lineitem scan")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 5)
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_sum"))
  }

  test("q43: the date-crossover predicates sit on their OWN scans " +
    "(ordered-before on orders, shipped-after on lineitem); customer " +
    "broadcasts; the top-10 plans as TakeOrderedAndProject") {
    val p = plan("q43_shipping_priority")
    assert(p.contains("LessThan(o_orderdate"),
      "the before-cutoff filter must reach the orders scan")
    assert(p.contains("GreaterThan(l_shipdate"),
      "the after-cutoff filter must reach the lineitem scan")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"),
      "the segment filter must reach the customer scan")
    assert(p.contains("BroadcastHashJoin"), "customer must broadcast")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_sum"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q41: the HAVING subquery decorrelates to one aggregate feeding " +
    "a LEFT SEMI join that reuses the orderkey partitioning; customer " +
    "broadcasts; the top-100 plans as TakeOrderedAndProject") {
    val p = plan("q41_large_volume_orders")
    assert(p.contains("LeftSemi"))
    assert(p.contains("TakeOrderedAndProject"),
      "the global top-100 must not be a full sort")
    assert(p.contains("partial_sum"),
      "the big-order aggregate must partially aggregate map-side")
    assert(!p.contains("CartesianProduct"))
    // the semi-join and the threshold aggregate share the l_orderkey
    // exchange; the per-order re-aggregation adds one more — orders
    // joins on the same key, so <=3 hash exchanges total
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 3,
      s"semi-join must reuse the aggregate's orderkey partitioning:\n$p")
  }

  test("q42: NOT IN over a non-null key plans as a broadcast LEFT ANTI; " +
    "brand/type/size filters reach the part scan; the distinct count " +
    "stays a two-level partial aggregate") {
    val p = plan("q42_supplier_part_counts")
    assert(p.contains("LeftAnti"))
    // the pushed-filter list is TRUNCATED in toString (the q32 note) —
    // assert via the scan-side Filter node instead
    assert(p.contains("NOT (p_brand"),
      "brand exclusion must sit on the part scan branch")
    assert(p.contains("IN (1,4,9,14,19,23,36,45)"),
      "the size IN-list must sit on the part scan branch")
    assert(p.contains("BroadcastHashJoin"), "part must broadcast")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    assert(p.contains("partial_count(distinct"),
      "the supplier count must keep the distinct partial aggregate")
  }

  test("m53: the dedup-insert micro-batch broadcasts the static " +
    "dimension (the stream side never shuffles for the enrichment) " +
    "and anti-joins only the sink's key projection") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val batch = docs
      .select(graft.llm.Dedup.exactKey(org.apache.spark.sql.functions
        .col("text")).as("fp"))
      .withColumn("grp", org.apache.spark.sql.functions
        .substring(org.apache.spark.sql.functions.col("fp"), 1, 1))
    val dim = spark.range(16).selectExpr("lower(hex(id)) AS grp",
      "concat('grp_', lower(hex(id))) AS lbl")
    val existing = spark.range(4).selectExpr(
      "concat('k', id) AS fp", "'x' AS lbl", "'0' AS grp")
    val qe = graft.streaming.Incremental
      .dedupInsertBatch(batch, "fp", dim, "grp", Some(existing))
      .queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the 16-row dimension must broadcast into the stream batch")
    assert(p.contains("LeftAnti"),
      "sink keys must anti-join (the DEDUP_INSERT filter)")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"))
    // the enrichment join sits BELOW any exchange on the stream side:
    // the only hash exchange is the dropDuplicates aggregation on fp
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 1,
      s"enrichment must not shuffle the stream side:\n$p")
    // the anti-join's build side reads only the key column of the sink
    val anti = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.joinType.sql == "LEFT ANTI" => j.right.output.map(_.name)
    }
    assert(anti == Seq(Seq("fp")),
      s"anti-join must see only the sink's key projection, got $anti")
  }

  test("q28: part dim broadcasts; conditional sums keep map-side " +
    "partial aggregation") {
    val p = plan("q28_promo_share")
    assert(p.contains("BroadcastHashJoin"), "part is the broadcast dim")
    assert(p.contains("partial_sum"))
    assert(!p.contains("CartesianProduct"))
  }

  test("domainCap keepOnly: rank filter plans as WindowGroupLimit (per-" +
    "partition top-k short-circuit; a mega-domain never materializes)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "concat('http://h', doc_id % 3, '.ex.com/p') AS url")
    val p = graft.llm.Web.domainCap(docs, "doc_id", "url", 10, "pa",
      keepOnly = true).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.linesIterator.take(12).mkString("\n"))
  }

  test("q25: the 1-row global broadcast + nation dim broadcast; grouped " +
    "aggregation stays partial/map-side") {
    val p = plan("q25_national_balance_share")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "the global scalar must broadcast")
    assert(p.contains("BroadcastHashJoin"), "nation should broadcast")
    assert(p.contains("partial_sum"))
  }

  test("q26: the date window reaches the lineitem scan; the 1-row max " +
    "broadcasts; no cartesian product") {
    val p = plan("q26_top_supplier")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") &&
      p.contains("LessThan(l_shipdate"), "shipdate window not pushed")
    // the rev = (SELECT MAX...) equality plans as a broadcast HASH join
    // on the 1-row max — even tighter than BNLJ
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      "both the max scalar and the supplier dim should broadcast")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"))
  }

  test("d01: single scan with partial aggregation (map-side md5+combine)") {
    val p = plan("d01_exact_dedup")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(p.contains("partial_"))
  }

  test("s01: query side broadcast (corpus never shuffles for scoring)") {
    val p = plan("s01_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
  }

  test("s02: probe side broadcast; corpus scanned+hashed exactly once") {
    val p = plan("s02_ann_topk")
    assert(p.contains("BroadcastHashJoin"), "bucket equi-join should broadcast the probes")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the probe fan-out (Generate/explode) must be on the (small) query
    // side only — one corpus FileScan, no corpus-side explode blowup
    assert("FileScan".r.findAllIn(p).length == 2, "corpus + query scans only")
  }

  test("s04: IVF cell assignment is map-side (no shuffle between scan and join)") {
    val p = plan("s04_ivf_topk")
    assert(p.contains("BroadcastHashJoin"), "probes should broadcast into the cell join")
    assert(!p.contains("CartesianProduct"),
      "cell assignment must not plan as a centroid cross join")
  }

  test("d10: fp equi-joins only — no cartesian, no broadcast-nested-loop") {
    // the public operator checkpoints its result (cache hygiene), which
    // would reduce the returned plan to an RDD scan and make this guard
    // vacuous — audit the lazy form's live join plan instead
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (scored, f0) = graft.llm.Dedup.winnowingOverlapPairsLazy(
      docs, "doc_id", "text", minSim = 0.3, maxBucketSize = Some(64))
    try {
      val p = scored.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "winnowing overlap pairing degenerated to an all-pairs join")
      assert(p.contains("InMemoryTableScan"),
        "fp frame no longer persisted across its consumers")
    } finally { f0.unpersist(blocking = true); () }
  }

  test("m02: fork counts keep map-side partial aggregation") {
    val p = SparkEntry.queries("m02_fork_counts")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_"), "fork counts lost map-side combine")
  }

  test("d22: repetition signals are one scan, no shuffle, pruned to " +
    "(doc_id, text)") {
    val p = plan("d22_repetition")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange"), s"repetition signals must be map-side:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to the two used columns:\n$p")
  }

  test("d39: filter funnel is one scan, no shuffle, pruned to " +
    "(doc_id, text)") {
    val p = plan("d39_filter_funnel")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange"), s"funnel must be map-side:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to the two used columns:\n$p")
  }

  test("d40: stratum overlap scans (text, lang) once — every other " +
    "consumer reads the persisted hash-key frame; no cartesian on the " +
    "gram join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (out, sg) = graft.llm.Dedup.stratumOverlapLazy(
      docs, "text", "lang", 8)
    try {
      out.collect()
      val p = out.queryExecution.executedPlan.toString
      // every consumer (totals x2 via the cross, both shared-join sides)
      // must read the persisted hash-key frame — the cache materializes
      // the corpus tokenize exactly once by construction (FileScan
      // string counts are useless here: each InMemoryTableScan prints
      // its cached-definition subtree, and AQE prints initial + final)
      assert("InMemoryTableScan".r.findAllIn(p).length >= 3,
        s"consumers should read the cached sg frame:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"gram join must stay an equi-join:\n$p")
    } finally { sg.unpersist(blocking = true); () }
  }

  test("d23: decontamination broadcasts the bench keys; the zero-hit " +
    "rejoin scans ids only") {
    val p = plan("d23_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      "bench shingle keys should broadcast into the hit join")
    // the left-join side that restores zero-hit docs must read just the
    // id column — at 100TB that second scan is a sliver, and this guard
    // keeps it one
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"zero-hit rejoin reads more than doc_id:\n$p")
  }

  test("d25: containment pairing keeps d10's equi-join-only shape") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (scored, f0) = graft.llm.Dedup.winnowingOverlapPairsLazy(
      docs, "doc_id", "text", 0.6, maxBucketSize = Some(64), containment = true)
    try {
      val p = scored.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "containment pairing degenerated to an all-pairs join")
    } finally { f0.unpersist(blocking = true); () }
  }

  test("d42: shard id is map-side — the ONLY exchange is " +
    "hashpartitioning(shard) for the in-shard window") {
    val p = plan("d42_shard_assign")
    assert(p.contains("Exchange hashpartitioning(shard"),
      s"in-shard window must partition by shard:\n$p")
    assert("Exchange hashpartitioning\\((?!shard)".r.findFirstIn(p).isEmpty,
      s"unexpected exchange on a non-shard key:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("d44: chunking is one pruned scan, zero exchanges") {
    val p = plan("d44_chunk_windows")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange"), s"chunking must be map-side:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to the two used columns:\n$p")
  }

  test("d47: repeat schedule is one pruned scan, zero exchanges") {
    val p = plan("d47_repeat_schedule")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(!p.contains("Exchange"), s"repeat schedule must be map-side:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned to the two used columns:\n$p")
  }

  test("d46: scorecard is one scan through the fp window into the " +
    "source aggregate — exchanges only on fp and source") {
    val p = plan("d46_source_scorecard")
    assert("FileScan".r.findAllIn(p).length == 1)
    assert(p.contains("Exchange hashpartitioning(fp"),
      s"dup window must partition by fp:\n$p")
    assert(p.contains("Exchange hashpartitioning(source"),
      s"report aggregate must partition by source:\n$p")
    assert("Exchange hashpartitioning\\((?!fp|source)".r.findFirstIn(p).isEmpty,
      s"unexpected exchange on another key:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("s14: rerank joins stay equi/broadcast — no cartesian ever forms") {
    val p = plan("s14_rerank_retrieval")
    assert(p.contains("BroadcastHashJoin"),
      "candidate/vector joins should broadcast the small side")
    assert(!p.contains("CartesianProduct"))
  }

  test("s07: quantized top-k broadcasts queries like the float tier") {
    val p = plan("s07_quantized_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("s09: BM25 semi-joins the broadcast query terms BELOW the " +
    "(doc, term) aggregation — only query-term rows shuffle") {
    val p = plan("s09_bm25_topk")
    // the left-semi term filter must be a broadcast join (never shuffles
    // the exploded corpus for it) and sit under the tf groupBy exchange
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"query-term prune missing or not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
    val semiIdx = p.indexOf("LeftSemi")
    val aggIdx = p.indexOf("partial_count")
    assert(semiIdx >= 0 && aggIdx >= 0 && semiIdx > aggIdx,
      "semi-join should appear below (deeper than) the tf aggregation " +
        s"in the plan tree print:\n$p")
  }

  test("d34: diversity take — cell assignment rides the scan (no " +
    "exchange before the window) and the rank prunes map-side") {
    val p = plan("d34_diversity_take")
    assert(p.contains("WindowGroupLimit"),
      s"per-cell take lost the map-side top-k heap:\n$p")
    // embeddings feed exactly one scan and never shuffle: the only
    // exchange is the (id, cell) window partitioning
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"expected exactly one exchange (the cell window):\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("m28: matching bucketed tables join with ZERO exchange (broadcast " +
    "disabled — the co-located layout, not the planner, removes the shuffle)") {
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // AQE's plan printing hides the final shape until execution; the
      // static plan is what the guard reads
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = SparkEntry.queries("m28_bucketed_join")(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge join over buckets:\n$p")
      // no exchange anywhere below the join: both scans are bucketed
      assert(!p.substring(joinIdx).contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$p")
      assert(p.contains("SelectedBucketsCount"),
        s"scans are not bucket-aware:\n$p")
      // and the layout round-trips the data (the oracle also gates this)
      assert(df.collect().nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("d58: the PassJoin candidate join is a hash-key equi join — no " +
    "cartesian anywhere, the only nested-loop is the bounded short-" +
    "string broadcast path") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val (verified, base) = graft.llm.Dedup.editNearDupPairsLazy(
      docs, "doc_id", "text", k = 8)
    try {
      val p = verified.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), p)
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).length == 1,
        "exactly one BNLJ: the <= k-char short path")
      assert(p.contains("__key"), "candidate join must ride the hashed segment key")
    } finally base.unpersist(blocking = true)
  }

  test("m55: the changelog folds map-side (WindowGroupLimit top-1 per " +
    "key), the touched-key anti-join broadcasts, the base never shuffles") {
    val p = plan("m55_cdc_apply")
    assert(p.contains("WindowGroupLimit"),
      "latest-event extraction must keep a per-partition top-1, not sort the log")
    assert(p.contains("LeftAnti"))
    assert("BroadcastHashJoin .*LeftAnti".r.findFirstIn(p).isDefined ||
      p.contains("BroadcastHashJoin"), "touched keys must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("m56: every mutation-side join broadcasts; change detection is " +
    "null-safe (<=> in the plan); the dimension scan is column-pruned") {
    val p = plan("m56_scd2_merge")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      "update batch / changed keys must broadcast against the dimension")
    assert(p.contains("<=>"), "tracked-column compare must be null-safe")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("s_comment"), "dimension scan reads unused columns")
  }

  test("s22: the vote rides the s01 top-k shape — map-side " +
    "WindowGroupLimit for both the top-k and the argmax, partial count, " +
    "label join broadcast") {
    val p = plan("s22_knn_classify")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "top-k and vote argmax must both keep per-partition heaps")
    assert(p.contains("partial_count"))
    assert(p.contains("BroadcastHashJoin"), "label join must broadcast")
  }

  test("m57: the state merge reuses the aggregation partitioning — one " +
    "exchange per side, map-side partials, full-outer merge join") {
    val p = plan("m57_agg_maintenance")
    assert(p.contains("FullOuter"))
    assert("Exchange hashpartitioning".r.findAllIn(p).length <= 2,
      "the merge must not add an exchange beyond the two aggregations")
    assert(p.contains("partial_sum") && p.contains("partial_min"))
  }

  test("d85: degree assortativity is equi-joins + ONE map-side-combined " +
    "global aggregate — no cartesian product anywhere") {
    val s = spark; import s.implicits._
    val base = tmpDir("d85-plan")
    (1L to 40L).map(i => (i, i % 7 + 100L)).toDF("id1", "id2")
      .write.parquet(base + "/edges")
    val out = graft.operators.Triangles.degreeAssortativity(
      s.read.parquet(base + "/edges"))
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"),
      s"assortativity must never plan a cartesian product:\n$p")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"the 4-sum aggregate must partial-aggregate map-side:\n$p")
  }

  test("d80: the incremental CC output plan never shuffles history — " +
    "the prior relabel is ONE broadcast join over the label scan") {
    // the operator's lazy output (the d80 query checkpoint-truncates,
    // which would hide the plan): a parquet-backed prior labeling with
    // a small batch folded in. Any shuffle Exchange here means the
    // historical labeling moved — the exact cost the operator exists
    // to avoid; only the batch-bounded remap may broadcast.
    val s = spark; import s.implicits._
    val base = tmpDir("d80-plan")
    Seq((1L, 1L), (2L, 1L), (5L, 5L), (9L, 9L)).toDF("id", "cluster")
      .write.parquet(base + "/prior")
    val prior = s.read.parquet(base + "/prior")
    val out = graft.llm.Dedup.incrementalConnectedComponents(prior,
      Seq((2L, 5L)).toDF("id1", "id2"))
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"the remap must apply as a broadcast join:\n$p")
    assert("Exchange (hash|range|single)".r.findAllIn(p).isEmpty,
      s"history must not shuffle in the fold's output plan:\n$p")
  }

  test("d89: exact-span detection is a gram aggregate + LEFT-SEMI back-" +
    "join + one per-doc window — no cartesian, nothing pairwise in the " +
    "sharing-document count") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val docs = Seq((1L, "a b c d e f"), (2L, "z a b c d q"))
      .toDF("doc_id", "text")
    // the internal plan builder: the public operator returns a
    // materialized frame (its executed plan is a checkpoint scan), and
    // THIS is the plan that materialization executes
    val toks = docs.select(col("doc_id").as("id"),
      split(col("text"), " ").as("t"))
    for (fp <- Seq(false, true)) {
      val p = graft.llm.Dedup.exactSpanPlan(toks, k = 3, minDocs = 2,
        fingerprintGrams = fp).queryExecution.executedPlan.toString
      assert(p.contains("LeftSemi"),
        s"duplicated positions must select via a semi-join (fp=$fp):\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"span detection must never pair documents (fp=$fp):\n$p")
    }
  }

  test("d93: contamination marking is a LEFT-SEMI probe against the " +
    "distinct benchmark gram set — no cartesian, nothing pairwise in " +
    "the contaminated-document count") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions.{col, split}
    val toks = Seq((1L, "a b c d e f"))
      .toDF("doc_id", "text")
      .select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
    val bench = Seq((0L, "z a b c d z")).toDF("doc_id", "text")
      .select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
    for (fp <- Seq(false, true)) {
      val p = graft.llm.Dedup.contaminationSpanPlan(toks, bench, k = 3,
        fingerprintGrams = fp).queryExecution.executedPlan.toString
      assert(p.contains("LeftSemi"),
        s"contaminated positions must select via a semi-join (fp=$fp):\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"),
        s"contamination marking must never pair documents (fp=$fp):\n$p")
    }
  }

  test("d90: span removal is ONE equi-join — the corpus token stream " +
    "never explodes (no Generate on the document side)") {
    val s = spark; import s.implicits._
    val docs = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val cuts = Seq((1L, 0L, 2L)).toDF("id", "span_start", "span_end")
    val p = graft.llm.Dedup.removeSpans(docs, "doc_id", "text", cuts)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Generate"),
      s"removeSpans must filter positionally, never explode:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"removeSpans joins on the doc id only:\n$p")
    assert("SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin".r
      .findAllIn(p).length == 1,
      s"exactly one equi-join applies the cut lists:\n$p")
  }

  test("d88: one BPE training round is a map-side-combined pair " +
    "aggregate + a driver-bounded top-1 — TakeOrderedAndProject, " +
    "never a full sort") {
    val s = spark; import s.implicits._
    val words = Seq(("abab", 3L), ("ab", 2L)).toDF("word", "freq")
    // the round's argmax plan, exactly as trainMerges builds it
    import org.apache.spark.sql.functions._
    val w = words.select(expr("regexp_extract_all(word, '.', 0)")
      .as("sym"), col("freq").cast("long").as("freq"))
    val round = w.select(explode(zip_with(
        slice(col("sym"), lit(1), size(col("sym")) - 1),
        slice(col("sym"), lit(2), size(col("sym")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("cnt"))
      .orderBy(col("cnt").desc, col("l").asc, col("r").asc).limit(1)
    val p = round.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"the per-round argmax must be a top-1, not a global sort:\n$p")
    assert(p.contains("partial_sum"),
      s"pair counts must combine map-side:\n$p")
  }
}
