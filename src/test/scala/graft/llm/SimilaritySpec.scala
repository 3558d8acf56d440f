package graft.llm

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {

  test("planeWeights vary within every plane and differ across planes") {
    val ws = Similarity.planeWeights(64, 8)
    ws.zipWithIndex.foreach { case (w, p) =>
      assert(w.distinct.length == 2, s"plane $p is constant — bucketing degenerates")
    }
    assert(ws.map(_.toSeq).distinct.length == 8, "identical planes waste bits")
    // roughly balanced signs (avalanche property, not 90/10 splits)
    ws.foreach { w =>
      val pos = w.count(_ > 0)
      assert(pos >= 16 && pos <= 48, s"skewed plane: $pos/64 positive")
    }
  }

  test("srpBucket spreads real embeddings over many buckets") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val n = emb.select(Similarity.srpBucket(col("embedding"), 64, 8).as("b"))
      .agg(countDistinct(col("b"))).head().getLong(0)
    // 500 vectors into 256 possible buckets: degenerate hashing gives <=2
    assert(n > 32, s"only $n distinct buckets — hashing degenerate")
  }

  test("srpBucket (SignBits) is bit-identical to the composable HOF form") {
    val s = spark; import s.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val fast = emb.select(col("vec_id"),
      Similarity.srpBucket(col("embedding"), 64, 8).as("b"))
    val ref = emb.select(col("vec_id"),
      Similarity.srpBucketHof(col("embedding"), 64, 8).as("b"))
    assert(fast.orderBy("vec_id").collect().toSeq ==
      ref.orderBy("vec_id").collect().toSeq)
    // null / mismatched-dim vectors map to bucket 0 on both surfaces
    val edge = Seq(Tuple1(Option.empty[Array[Float]]),
      Tuple1(Some(Array(1.0f, -2.0f)))).toDF("embedding")
    val fastE = edge.select(Similarity.srpBucket(col("embedding"), 64, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    val refE = edge.select(Similarity.srpBucketHof(col("embedding"), 64, 8).as("b"))
      .collect().map(_.getLong(0)).toSeq
    assert(fastE == refE && fastE == Seq(0L, 0L))
  }

  test("writeSrpLayout: probe read prunes bucket partitions at the source") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = 4 // 16 partitions; radius-1 probe must touch exactly 5
    val path = tmpDir("srp-layout") + "/corpus"
    Similarity.writeSrpLayout(emb, dim = 64, planes = planes, path = path)
    val bucketDirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("bucket="))
    assert(bucketDirs.length > 2, s"expected multiple bucket partitions, got ${bucketDirs.toSeq}")
    assert(spark.read.parquet(path).count() == emb.count())
    // local bucket twin is bit-identical to the column form
    val one = emb.filter(col("vec_id") === 7)
      .select(col("embedding"), Similarity.srpBucket(col("embedding"), 64, planes).as("b"))
      .head()
    val qvec = one.getSeq[Float](0).map(_.toDouble).toArray
    assert(Similarity.srpBucketLocal(qvec, planes) == one.getLong(1))
    // the probe read lists only (planes+1) of the 2^planes partition
    // dirs at radius 1 — partition pruning, the persisted-ANN 100TB win
    val probe = Similarity.readSrpProbes(spark, path, qvec, planes, probeRadius = 1)
    val scan = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    val present = Similarity
      .probeBucketValues(Similarity.srpBucketLocal(qvec, planes), planes, 1)
      .map(b => s"bucket=$b").count(bucketDirs.contains)
    assert(scan.selectedPartitions.partitionCount == present,
      s"expected $present pruned partitions, scanned ${scan.selectedPartitions.partitionCount}")
    assert(present <= planes + 1)
    val planStr = probe.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains("bucket"),
      "bucket filter did not register as a partition filter")
    // every probed row really is within Hamming radius 1 of the query bucket
    val qb = Similarity.srpBucketLocal(qvec, planes)
    val far = probe.where(
      org.apache.spark.sql.functions.bit_count(col("bucket").bitwiseXOR(qb)) > 1).count()
    assert(far == 0)
  }

  test("srpBucket survives dim=768 (codegen-size regression)") {
    val s = spark; import s.implicits._
    val vecs = Seq.tabulate(4)(i => Tuple1(Array.tabulate(768)(j => ((i + j) % 7 - 3).toFloat)))
    val df = vecs.toDF("embedding")
    val out = df.select(Similarity.srpBucket(col("embedding"), 768, 16).as("b")).collect()
    assert(out.length == 4)
  }

  test("zero/NaN vectors never rank: padding rows drop from top-k and " +
    "near-dup pairs instead of scoring NaN-first") {
    val s = spark; import s.implicits._
    // vec 99 is all-zero (a padding/failed-embed row): its cosine with
    // anything is 0/0 = NaN, which Spark's sort puts ABOVE every real
    // score — it must be dropped, not returned as everyone's neighbor
    val rows = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 1.0)),
      (99L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(rows, rows.where(col("vec_id") === 1), 2)
      .collect().map(r => r.getInt(3) -> r.getLong(1)).toMap
    assert(top == Map(1 -> 2L, 2 -> 3L), s"got $top")
    // the zero vector itself has no real scores -> no output rows at all
    val zq = Similarity.bruteForceTopK(rows, rows.where(col("vec_id") === 99), 2)
    assert(zq.count() == 0)
    val pairs = Similarity.embeddingNearDups(rows, threshold = 0.0,
      dim = 2, planes = 4, probeRadius = 2)
    assert(!pairs.select("id1", "id2").collect()
      .exists(r => r.getLong(0) == 99L || r.getLong(1) == 99L),
      "zero vector must not pair with bucket-mates")
  }

  test("rerankTopK over the FULL candidate list equals bruteForceTopK " +
    "bit-exactly; a partial list restricts results to it") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val allCands = queries.select(col("vec_id").as("query_id"))
      .crossJoin(emb.select(col("vec_id").as("corpus_id")))
    val rer = Similarity.rerankTopK(allCands, emb, queries, k = 5)
      .collect().map(_.toSeq).toSet
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(_.toSeq).toSet
    assert(rer == brute, "full-list rerank must degenerate to brute force")
    val s = spark; import s.implicits._
    val partial = Seq((0L, 7L), (0L, 8L), (0L, 9L)).toDF("query_id", "corpus_id")
    val out = Similarity.rerankTopK(partial, emb, queries, k = 5).collect()
    assert(out.nonEmpty &&
      out.forall(r => Set(7L, 8L, 9L).contains(r.getLong(1))))
  }

  test("bruteForceTopK ranks by cosine with deterministic tie-break") {
    val s = spark; import s.implicits._
    // query 0 = (1,0); corpus: 1=(2,0) cos=1, 2=(1,1) cos=.707, 3=(0,1) cos=0
    val vecs = Seq(
      (0L, Array(1f, 0f)), (1L, Array(2f, 0f)),
      (2L, Array(1f, 1f)), (3L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L))
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-12)
    assert(out.map(_.getInt(3)).toSeq == Seq(1, 2))
  }

  test("annTopK only scores same-bucket candidates and never pairs a query with itself") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.annTopK(emb, emb.limit(20), k = 3, dim = 64, planes = 4).cache()
    assert(out.where(col("query_id") === col("corpus_id")).count() == 0)
    assert(out.groupBy("query_id").count().agg(max("count")).head().getLong(0) <= 3)
    out.unpersist()
  }

  private def recallVsBrute(ann: org.apache.spark.sql.DataFrame,
                            brute: org.apache.spark.sql.DataFrame): Double = {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bf = pairs(brute)
    pairs(ann).intersect(bf).size.toDouble / bf.size
  }

  test("multi-probe annTopK recall >= 0.8 on clustered vectors at (planes=8, radius=1)") {
    // The near-dup regime ANN exists for: 60 clusters x 8 members, members
    // within ~12 degrees of their center (pair cosine ~0.98). On UNIFORM
    // random vectors (like the synthetic embeddings table, max pair cosine
    // 0.51) no sublinear method can reach high recall — there is no
    // locality to exploit — so the 0.8 gate runs on clustered data and the
    // real table gets a monotonicity gate below.
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 64
    val centers = Array.fill(60)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 60; m <- 0 until 8) yield
      ((c * 8 + m).toLong, centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    val df = rows.toDF("vec_id", "embedding").cache()
    val queries = df.filter(col("vec_id") % 24 === 0) // 20 queries
    val brute = Similarity.bruteForceTopK(df, queries, k = 5)
    val ann = Similarity.annTopK(df, queries, k = 5, dim = dim,
      planes = 8, probeRadius = 1)
    val r = recallVsBrute(ann, brute)
    assert(r >= 0.8, s"multi-probe recall $r < 0.8 at (planes=8, radius=1)")
    df.unpersist()
  }

  test("probe radius is a monotone recall knob on the real embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, k = 5)
    val recalls = Seq(0, 1, 2).map { rad =>
      recallVsBrute(
        Similarity.annTopK(emb, queries, k = 5, dim = 64, planes = 8,
          probeRadius = rad), brute)
    }
    info(s"recall @ radius 0/1/2 on sf0.001 embeddings: ${recalls.mkString(", ")}")
    assert(recalls(1) > recalls(0), s"radius 1 did not improve recall: $recalls")
    assert(recalls(2) >= recalls(1), s"radius 2 regressed recall: $recalls")
    emb.unpersist()
  }

  test("cosineFast (codegen'd expression) is bit-identical to the HOF fold") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1")).limit(40)
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2")).limit(40)
    val pairs = a.crossJoin(b).where(col("id1") =!= col("id2"))
    val diffs = pairs.select(
      Similarity.cosine(col("v1"), col("v2")).as("slow"),
      Similarity.cosineFast(col("v1"), col("v2")).as("fast"))
      .where(col("slow") =!= col("fast")) // bitwise-exact double equality
      .count()
    assert(diffs == 0, s"$diffs pairs diverged between fold and codegen cosine")
    // null element poisons the result like the fold does
    val s = spark; import s.implicits._
    val withNull = Seq((Array(1.0f, 2.0f), Array[java.lang.Float](1.0f, null)))
      .toDF("x", "y")
    assert(withNull.select(Similarity.cosineFast(col("x"), col("y"))).head().isNullAt(0))
  }

  test("staged-norm scoring (dotFast/normFast) is bit-identical to cosineFast") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id1"), col("embedding").as("v1"),
      Similarity.normFast(col("embedding")).as("n1")).limit(40)
    val b = emb.select(col("vec_id").as("id2"), col("embedding").as("v2"),
      Similarity.normFast(col("embedding")).as("n2")).limit(40)
    val diffs = a.crossJoin(b).where(col("id1") =!= col("id2"))
      .select(Similarity.cosineFast(col("v1"), col("v2")).as("fused"),
        (Similarity.dotFast(col("v1"), col("v2")) / (col("n1") * col("n2"))).as("staged"))
      .where(col("fused") =!= col("staged")) // bitwise-exact double equality
      .count()
    assert(diffs == 0, s"$diffs pairs diverged between fused and staged cosine")
  }

  test("suggestedPlanes tracks corpus growth and clamps") {
    assert(Similarity.suggestedPlanes(500, 2) == 8)        // 500/2^8 ~ 2
    assert(Similarity.suggestedPlanes(1000000, 64) == 14)  // 1M/2^14 ~ 61
    assert(Similarity.suggestedPlanes(10, 64) == 4)        // clamp low
    assert(Similarity.suggestedPlanes(Long.MaxValue, 1) == 30) // clamp high
  }

  test("writeSrpQuantizedLayout: partition-pruned probe read, int8 bytes, " +
    "buckets identical to the float layout") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = 4
    val path = tmpDir("srpq-layout") + "/corpus"
    Similarity.writeSrpQuantizedLayout(emb, dim = 64, planes = planes, path = path)
    val back = spark.read.parquet(path)
    assert(back.count() == emb.count())
    assert(back.schema("q").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false) ||
      back.schema("q").dataType.simpleString == "array<tinyint>")
    // float and quantized layouts bucket IDENTICALLY (bucketing is from
    // the float vector in both)
    val floatBuckets = emb.select(col("vec_id"),
        Similarity.srpBucket(col("embedding"), 64, planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val qBuckets = back.select(col("vec_id"), col("bucket").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(qBuckets == floatBuckets)
    // probe read prunes partitions exactly like the float layout
    val qvec = emb.filter(col("vec_id") === 7).select(col("embedding"))
      .head().getSeq[Float](0).map(_.toDouble).toArray
    val probe = Similarity.readSrpQuantizedProbes(spark, path, qvec, planes)
    val scan = probe.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f
    }.head
    assert(scan.selectedPartitions.partitionCount <= planes + 1)
    assert(probe.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("quantizeInt8: hand-computed codes, zero-vector to zeros, " +
    "negative half-up rounding") {
    val s = spark; import s.implicits._
    // max|x| = 2.54 -> scale = 0.02; codes floor(x/0.02 + 0.5)
    val r = Seq(Tuple1(Array(2.54f, -2.54f, 1.27f, 0.01f, -0.01f, 0f)))
      .toDF("v").select(Similarity.quantizeInt8(col("v")).as("z"))
      .select(col("z.scale"), col("z.q")).head()
    assert(math.abs(r.getDouble(0) - 0.02) < 1e-9)
    // 0.01f/scale is 0.4999... in float32 (0.01f < 0.01 exactly), so the
    // half-up floor lands at 0 — the float-representation-faithful answer
    assert(r.getSeq[Byte](1) == Seq[Byte](127, -127, 64, 0, 0, 0),
      s"got ${r.getSeq[Byte](1)}")
    val z = Seq(Tuple1(Array(0f, 0f))).toDF("v")
      .select(Similarity.quantizeInt8(col("v")).getField("q")).head()
    assert(z.getSeq[Byte](0) == Seq[Byte](0, 0), "zero vector -> zero codes")
  }

  test("bruteForceTopKQuantized: close to float ranks on real embeddings, " +
    "zero vectors never rank, deterministic") {
    val s = spark; import s.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
    val qz = Similarity.bruteForceTopKQuantized(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    val fl = Similarity.bruteForceTopK(emb, queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // int8 at dim 64 preserves neighbor structure: top-10 overlap >= 8/10
    val overlap = qz.keys.map(_._1).toSeq.distinct.map { q =>
      val a = (1 to 10).flatMap(i => qz.get((q, i))).toSet
      val b = (1 to 10).flatMap(i => fl.get((q, i))).toSet
      (a intersect b).size
    }
    assert(overlap.forall(_ >= 8), s"overlaps: $overlap")
    // zero-vector padding never ranks (same hygiene as the float path)
    val withZero = emb.unionByName(
      Seq((99999L, Array.fill(64)(0f), 0)).toDF("vec_id", "embedding", "label"))
    val ranked = Similarity.bruteForceTopKQuantized(withZero, queries, k = 10)
      .where(col("corpus_id") === 99999L).count()
    assert(ranked == 0L)
  }

  test("dotInt (codegen'd DotProductInt) equals the interpreted HOF fold " +
    "and poisons on null elements") {
    val s = spark; import s.implicits._
    // Seq[Byte], not Array[Byte]: the latter encodes as BINARY
    val df = Seq(
      (Seq[Byte](127, -127, 3), Seq[Byte](1, 2, -3)),
      (Seq[Byte](0, 0, 0), Seq[Byte](5, 5, 5))).toDF("a", "b")
    val rows = df.select(
      Similarity.dotInt(col("a"), col("b")).as("fast"),
      Similarity.dotIntHof(col("a"), col("b")).as("slow")).collect()
    assert(rows.forall(r => r.getLong(0) == r.getLong(1)))
    assert(rows.head.getLong(0) == 127L - 254L - 9L)
    // null element -> null result (fold-poison, like DotProduct)
    val withNull = spark.sql("SELECT array(1L, NULL, 3L) AS a, array(1L, 1L, 1L) AS b")
    assert(withNull.select(Similarity.dotInt(col("a"), col("b"))).head().isNullAt(0))
  }

  test("PQ: codes hit the obvious codebook cells on separated data; ADC " +
    "distance equals the hand-assembled table-lookup sum") {
    val s = spark; import s.implicits._
    // dim 4, m=2 subspaces of 2; two well-separated blobs per subspace so
    // the fitted ksub=2 codebooks are unambiguous
    val rows = Seq(
      (0L, Array(0f, 0f, 10f, 10f)), (1L, Array(0.1f, -0.1f, 10.1f, 9.9f)),
      (2L, Array(10f, 10f, 0f, 0f)), (3L, Array(9.9f, 10.1f, 0.1f, -0.1f)))
    val df = rows.toDF("vec_id", "embedding").cache()
    val cbs = Similarity.fitPqCodebooks(df, m = 2, ksub = 2, dim = 4)
    val coded = Similarity.withPqCodes(df, cbs, "embedding")
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getInt(3))).toMap
    // ids 0/1 share both cells; 2/3 share both cells; the two groups differ
    assert(coded(0L) == coded(1L) && coded(2L) == coded(3L) && coded(0L) != coded(2L))
    val out = Similarity.pqTopK(df, df.where($"vec_id" === 0L), k = 3, cbs)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // the twin (id 1) must rank 1; hand-assemble its ADC distance
    assert(out.head._1 == 1L, s"got $out")
    def sq(q: Array[Float], c: Array[Double]): Double =
      q.zip(c).map { case (x, y) => (x.toDouble - y) * (x.toDouble - y) }.sum
    val q = rows.head._2
    val (c0, c1) = coded(1L)
    val exp = sq(q.slice(0, 2), cbs(0)(c0).toArray) + sq(q.slice(2, 4), cbs(1)(c1))
    assert(math.abs(out.head._2 - exp) < 1e-9, s"adist ${out.head._2} != $exp")
  }

  test("PQ top-10 overlap vs exact brute force >= 6/10 on clustered vectors " +
    "(4x16 codebooks over dim 64)") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 64
    val centers = Array.fill(40)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for (c <- 0 until 40; m <- 0 until 8) yield
      ((c * 8 + m).toLong, centers(c).map(x => x + 0.15f * rnd.nextGaussian().toFloat))
    val df = rows.toDF("vec_id", "embedding").cache()
    val queries = df.filter(col("vec_id") % 32 === 0)
    val cbs = Similarity.fitPqCodebooks(df, m = 4, ksub = 16, dim = dim)
    val pq = Similarity.pqTopK(df, queries, k = 10, cbs)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    // brute force ranks by cosine DESC; on this corpus vectors are not
    // normalized, so compare against exact L2 ranking instead: compute
    // it from the same frame with the full-precision distance
    val exact = df.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
      .crossJoin(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
      .where(col("corpus_id") =!= col("query_id"))
      .withColumn("d", Similarity.dotFast(col("cv"), col("cv"))
        - lit(2.0) * Similarity.dotFast(col("cv"), col("qv"))
        + Similarity.dotFast(col("qv"), col("qv")))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d").asc, col("corpus_id").asc)))
      .where(col("rank") <= 10)
      .select(col("query_id"), col("corpus_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getInt(2)) -> r.getLong(1)).toMap
    val overlaps = pq.keys.map(_._1).toSeq.distinct.map { q =>
      val a = (1 to 10).flatMap(i => pq.get((q, i))).toSet
      val b = (1 to 10).flatMap(i => exact.get((q, i))).toSet
      (a intersect b).size
    }
    assert(overlaps.forall(_ >= 6), s"PQ overlaps vs exact L2: $overlaps")
  }

  test("cosine of identical vectors is 1.0 exactly enough") {
    val s = spark; import s.implicits._
    val df = Seq(Tuple1(Array(0.3f, -0.4f, 0.5f))).toDF("v")
    val c = df.select(Similarity.cosine(col("v"), col("v"))).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("stratumCentroidMatrix: hand-exact integer sums, cosine of sum " +
    "vectors, counts per stratum, partitioning independence") {
    val s = spark; import s.implicits._
    val embs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),  // stratum u: sums (2^20, 2^20)
      (3L, Array(1f, 0f))                        // stratum v: sums (2^20, 0)
    ).toDF("vec_id", "embedding")
    val strata = Seq((1L, "u"), (2L, "u"), (3L, "v"))
      .toDF("doc_id", "lang")
    def run(e: org.apache.spark.sql.DataFrame) =
      Similarity.stratumCentroidMatrix(e, strata, "vec_id", "doc_id", "lang")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val out = run(embs)
    assert(out.keySet == Set(("u", "v")))
    val (na, nb, cos) = out(("u", "v"))
    assert((na, nb) == ((2L, 1L)))
    // cos((1,1),(1,0)) = 1/sqrt(2), computed exactly as the fold does
    assert(math.abs(cos - 1.0 / math.sqrt(2.0)) < 1e-15, s"got $cos")
    assert(run(embs.repartition(7)) == out, "exact integer sums make the " +
      "matrix independent of partitioning")
  }

  test("semdedupPrune: within-cell duplicate neighborhoods keep the row " +
    "farthest from the centroid; zero vectors never dominate or drop; " +
    "partitioning-independent") {
    val s = spark; import s.implicits._
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val rows = Seq(
      (1L, Array(1f, 0f)),   // cell 0, cdist 0 — dominated by 2 (same dir)
      (2L, Array(2f, 0f)),   // cell 0, cdist 1 — the keeper (farthest)
      (3L, Array(0f, 1f)),   // cell 1, alone -> keep
      (99L, Array(0f, 0f))   // zero norm: cos NaN -> null, untouched
    ).toDF("vec_id", "embedding")
    val out = Similarity.semdedupPrune(rows, cents, threshold = 0.40)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((0, false)), s"got ${out(1L)}")
    assert(out(2L) == ((0, true)), s"got ${out(2L)}")
    assert(out(3L) == ((1, true)), s"got ${out(3L)}")
    assert(out(99L)._2, s"zero vector must survive: got ${out(99L)}")
    // equidistant ties break to min id: both at cdist 0 from centroid 1
    val tied = Seq((5L, Array(0f, 1f)), (6L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val t = Similarity.semdedupPrune(tied, cents, threshold = 0.40)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(t == Map(5L -> true, 6L -> false), s"got $t")
    // deterministic under any partitioning (the dominated rule iterates
    // nothing and samples nothing)
    val a = Similarity.semdedupPrune(rows, cents, 0.40)
      .collect().map(_.toSeq).toSet
    val b = Similarity.semdedupPrune(rows.repartition(7), cents, 0.40)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("ivf recall curve: probing ALL cells recovers brute force exactly " +
    "(recall 1.0), fewer cells never increase recall") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val exact = Similarity.bruteForceTopK(emb, q, k = 5)
    val cents = Similarity.fitCentroids(emb, nlist = 8)
    def meanRecall(np: Int): Double = {
      val r = Similarity.annRecallAtK(
        Similarity.ivfTopKLiteral(emb, q, k = 5, cents, nprobe = np), exact)
        .agg(sum(col("n_hit")).cast("double") / sum(col("n_exact")).cast("double"))
        .head().getDouble(0)
      r
    }
    assert(meanRecall(8) == 1.0, "all-cell probe must equal brute force")
    val curve = Seq(1, 2, 4, 8).map(meanRecall)
    assert(curve.sliding(2).forall { case Seq(a, b) => a <= b },
      s"recall must be non-decreasing in nprobe: $curve")
  }

  test("semanticDispersion: hand-checked variance, singleton stratum is 0, " +
    "partition-order independent") {
    val s = spark; import s.implicits._
    // A: (1,0) and (3,0) -> centroid (2,0), mean sq dist = 1.0 exactly
    // (integer-valued coords quantize exactly at any scale)
    val embs = Seq((1L, Array(1f, 0f)), (2L, Array(3f, 0f)),
      (3L, Array(5f, 5f))).toDF("vec_id", "embedding")
    val strata = Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("id", "st")
    val out = Similarity.semanticDispersion(embs, strata,
      "vec_id", "id", "st", scaleBits = 12)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(4))).toMap
    assert(out == Map("A" -> (2L, 1.0), "B" -> (1L, 0.0)), s"got $out")
    val again = Similarity.semanticDispersion(embs.repartition(5), strata,
      "vec_id", "id", "st", scaleBits = 12)
      .collect().map(_.toSeq).toSet
    assert(again == Similarity.semanticDispersion(embs, strata,
      "vec_id", "id", "st", scaleBits = 12).collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException](Similarity.semanticDispersion(
      embs, strata, "vec_id", "id", "st", scaleBits = 0))
  }

  test("centroidDriftAgainstSnapshot: hand-checked shift, newest snapshot " +
    "pins and retires, ref-only strata drop") {
    val s = spark; import s.implicits._
    val store = java.nio.file.Files
      .createTempDirectory("cent-snap").toString + "/store"
    val strata = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "x"))
      .toDF("id", "st")
    // v1 reference: x = {(1,0)} centroid (1,0); y = {(5,5)}
    assert(Similarity.writeCentroidSnapshot(
      Seq((1L, Array(1f, 0f)), (3L, Array(5f, 5f)))
        .toDF("vec_id", "embedding"),
      strata, "vec_id", "id", "st", store, scaleBits = 4) == 1L)
    // v2 reference: x = {(3,0)} centroid (3,0) — a refresh
    assert(Similarity.writeCentroidSnapshot(
      Seq((4L, Array(3f, 0f))).toDF("vec_id", "embedding"),
      strata, "vec_id", "id", "st", store, scaleBits = 4) == 2L)
    // current: x = {(1,0),(0,1)} centroid (0.5, 0.5); y absent from v2
    val cur = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val v2 = Similarity.centroidDriftAgainstSnapshot(s, cur, strata,
      "vec_id", "id", "st", store, scaleBits = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // vs v2 centroid (3,0): diff (-2.5, 0.5) -> shift_sq = 6.5; y
    // (ref-only in v2? y absent) must not appear
    assert(v2 == Map("x" -> ((2L, 1L, 6.5))), s"got $v2")
    // pinning the RETIRED v1 yields the v1 shift — proof the default
    // really read the newest: vs (1,0) diff (-0.5, 0.5) -> 0.5; y is
    // ref-only (no current vectors) and drops via the inner join
    val v1 = Similarity.centroidDriftAgainstSnapshot(s, cur, strata,
      "vec_id", "id", "st", store, scaleBits = 4, version = Some(1L))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(v1 == Map("x" -> 0.5), s"got $v1")
  }

  test("annRecallAtK: hand-built lists score exactly; ground truth vs " +
    "itself is 1.0 everywhere; unretrieved queries score 0") {
    val s = spark; import s.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L))
      .toDF("query_id", "corpus_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L))
      .toDF("query_id", "corpus_id")
    val got = Similarity.annRecallAtK(approx, exact)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // q1: 2 of 3 true neighbors surfaced (the spurious 99 neither helps
    // nor hurts); q2 never retrieved -> recall 0
    assert(got == Map(1L -> (3L, 2L, 2.0 / 3), 2L -> (1L, 0L, 0.0)),
      s"got $got")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val bf = Similarity.bruteForceTopK(emb, q, k = 5)
    val self = Similarity.annRecallAtK(bf, bf).collect()
    assert(self.length == 5 && self.forall(_.getDouble(3) == 1.0))
  }

  test("truncatedRerankTopK: full-prefix/full-candidate run degenerates to " +
    "brute force bit-exactly; truncated stage keeps k per query") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 5)
    val ref = Similarity.bruteForceTopK(emb, q, k = 5)
      .collect().map(_.toSeq).toSet
    val degen = Similarity.truncatedRerankTopK(emb, q, k = 5,
      prefixDims = 64, candidates = emb.count().toInt)
      .collect().map(_.toSeq).toSet
    assert(degen == ref, "full-dim full-candidate run must equal brute force")
    val out = Similarity.truncatedRerankTopK(emb, q, k = 5,
      prefixDims = 16, candidates = 20).collect()
    val perQ = out.groupBy(_.getLong(0))
    assert(perQ.size == 5 && perQ.values.forall(_.length == 5))
    perQ.values.foreach(rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
    // stage-2 scores are EXACT full-dim cosines: every reported (q, c)
    // score matches the brute-force score for that pair
    val bfAll = Similarity.bruteForceTopK(emb, q, k = emb.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.foreach(r => assert(bfAll((r.getLong(0), r.getLong(1))) == r.getDouble(2)))
    intercept[IllegalArgumentException](
      Similarity.truncatedRerankTopK(emb, q, k = 5, prefixDims = 16,
        candidates = 3))
  }

  test("rrfFuse: agreement dominates, single-list docs contribute one term") {
    val s = spark; import s.implicits._
    // query 1: doc 10 is rank 3 lexical AND rank 3 semantic; doc 11 is
    // rank 1 lexical only; doc 12 is rank 1 semantic only. RRF puts the
    // agreed doc first: 2/63 > 1/61.
    val lex = Seq((1L, 11L, 1), (1L, 10L, 3)).toDF("query_id", "corpus_id", "rank")
    val sem = Seq((1L, 12L, 1), (1L, 10L, 3)).toDF("query_id", "corpus_id", "rank")
    val out = Similarity.rrfFuse(lex, sem, k = 5).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getDouble(4), r.getInt(5)))
    assert(out.map(_._1).toSeq == Seq(10L, 11L, 12L), s"got ${out.toSeq}")
    assert(math.abs(out(0)._2 - 2.0 / 63) < 1e-15)
    assert(math.abs(out(1)._2 - 1.0 / 61) < 1e-15)
    // 11 and 12 have the SAME fused score — tie broke by corpus_id
    assert(out(1)._2 == out(2)._2 && out(1)._1 < out(2)._1)
    assert(out.map(_._3).toSeq == Seq(1, 2, 3))
  }

  test("rrfFuse: k caps per query, missing ranks surface as nulls") {
    val s = spark; import s.implicits._
    val lex = Seq.tabulate(8)(i => (1L, i.toLong, i + 1))
      .toDF("query_id", "corpus_id", "rank")
    val sem = Seq((1L, 100L, 1), (2L, 7L, 1)).toDF("query_id", "corpus_id", "rank")
    val out = Similarity.rrfFuse(lex, sem, k = 3)
    val q1 = out.where(col("query_id") === 1).collect()
    assert(q1.length == 3)
    // per-query top-3 by fused score: doc 0 (lex rank 1, 1/61) ties the
    // sem-only doc 100 (sem rank 1, 1/61) — tie breaks by corpus_id —
    // then doc 1 (lex rank 2, 1/62)
    val q1top = out.where(col("query_id") === 1).orderBy("rank")
      .collect().map(r => (r.getLong(1), r.isNullAt(2), r.isNullAt(3)))
    assert(q1top.toSeq == Seq((0L, false, true), (100L, true, false),
      (1L, false, true)), s"got ${q1top.toSeq}")
    // query 2 exists only in the semantic list — still fused, rank 1
    val q2 = out.where(col("query_id") === 2).collect()
    assert(q2.length == 1 && q2(0).getLong(1) == 7L && q2(0).getInt(5) == 1)
  }

  test("mmrRerankQuantized: matches an independently-replayed greedy over " +
    "the collected int8 codes; rank 1 is the pure-relevance argmax") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(31)
    val rows = (0L until 30L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val df = rows.toDF("vec_id", "embedding")
    val (pool, take) = (20, 6)
    val got = Similarity.mmrRerankQuantized(df,
        df.where(org.apache.spark.sql.functions.col("vec_id") === 0L),
        pool, take)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // independent replay: quantize via the library, dot/select in plain
    // Scala re-written from the definition
    val q = Similarity.quantizeForStorage(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Byte](1).toArray, r.getLong(2)))).toMap
    def dot(a: Array[Byte], b: Array[Byte]): Long =
      a.zip(b).map { case (x, y) => x.toLong * y.toLong }.sum
    val (qq, _) = q(0L)
    val cand = q.toSeq.filter { case (id, (_, n2)) => id != 0L && n2 > 0 }
      .map { case (id, (code, _)) => (id, code, dot(code, qq)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(pool)
    var sel = Vector.empty[(Long, Array[Byte])]
    val expect = (1 to take).map { r =>
      val scored = cand.filter(c => !sel.exists(_._1 == c._1)).map {
        case (id, code, rel) =>
          val div = if (sel.isEmpty) 0L else sel.map(s => dot(code, s._2)).max
          (id, rel, 2L * rel - div)
      }
      val (id, rel, mmr) = scored.minBy { case (id, _, m) => (-m, id) }
      sel = sel :+ ((id, cand.find(_._1 == id).get._2))
      (r, id, rel, mmr)
    }
    assert(got == expect, s"got $got want $expect")
    val relMax = cand.head
    assert(got.head == ((1, relMax._1, relMax._3, 2 * relMax._3)))
    assert(got.map(_._2).distinct.size == take, "selected ids must be distinct")
  }

  test("mmrRerankQuantized: rejects a multi-row query frame (the greedy " +
    "loop pools rel scores into ONE cut — mixing queries would mis-rank)") {
    val s = spark; import s.implicits._
    val df = (0L until 10L).map(i =>
      (i, Array.fill(4)((i + 1).toFloat))).toDF("vec_id", "embedding")
    val twoQueries = df.where(col("vec_id") < 2)
    val e = intercept[IllegalArgumentException](
      Similarity.mmrRerankQuantized(df, twoQueries, pool = 5, take = 2))
    assert(e.getMessage.contains("exactly 1"), e.getMessage)
    // an all-zero query quantizes away (n2 = 0) — also not "exactly 1"
    val zeroQuery = df.where(col("vec_id") === 0)
      .select(col("vec_id"), transform(col("embedding"), _ => lit(0.0f))
        .as("embedding"))
    intercept[IllegalArgumentException](
      Similarity.mmrRerankQuantized(df, zeroQuery, pool = 5, take = 2))
  }

  test("knnClassify: majority label wins; count ties break to the " +
    "smaller label; the vote is over exactly the k nearest") {
    val s = spark; import s.implicits._
    // mirror-symmetric corpus on two axes: labels 1 (x) and 2 (y)
    val corpus = Seq(
      (10L, Array(1f, 0f), 1), (11L, Array(0.9f, 0.1f), 1),
      (20L, Array(0f, 1f), 2), (21L, Array(0.1f, 0.9f), 2))
      .toDF("vec_id", "embedding", "label")
    val queries = Seq(
      (1L, Array(1f, 0.05f)), // x-ish: 2 of the 3 nearest are label 1
      (2L, Array(0.6f, 0.6f))) // on the mirror axis: k=4 splits 2-2
      .toDF("vec_id", "embedding")
    val k3 = Similarity.knnClassify(corpus, queries.where(col("vec_id") === 1),
      k = 3).head()
    assert((k3.getLong(0), k3.getInt(1), k3.getLong(2)) == ((1L, 1, 2L)), s"$k3")
    val k4 = Similarity.knnClassify(corpus, queries.where(col("vec_id") === 2),
      k = 4).head()
    // 2 votes each at k=4: the smaller label (1) must win deterministically
    assert((k4.getLong(0), k4.getInt(1), k4.getLong(2)) == ((2L, 1, 2L)), s"$k4")
  }

  test("hardNegativesTopK: the nearest SAME-label vector is excluded by " +
    "the per-query condition; null-labeled rows never pair") {
    val s = spark; import s.implicits._
    val corpus = Seq(
      (10L, Array(1f, 0f), Option(1)),      // same label as the query:
      (11L, Array(0.95f, 0.05f), Option(1)),// nearest two — must not rank
      (20L, Array(0.7f, 0.7f), Option(2)),  // the true hard negative
      (30L, Array(0.9f, 0.1f), Option.empty[Int])) // null label: never pairs
      .toDF("vec_id", "embedding", "label")
    val q = Seq((1L, Array(1f, 0.02f), Option(1)))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegativesTopK(corpus, q, k = 3)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.toSeq == Seq((20L, 1)),
      s"only the other-label vector may rank: ${got.mkString(",")}")
  }

  test("ANN-tier hard negatives / kNN classify: with nprobe = nlist " +
    "(every cell probed) both degenerate BIT-EXACTLY to their exact " +
    "tier — the recall knob is explicit, not hidden; null-labeled " +
    "rows still never pair; a partial probe only loses candidates, " +
    "never admits a same-label pair") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(7)
    val corpus = (10L until 60L).map(i =>
        (i, Array.fill(8)(rnd.nextFloat()), Option((i % 3).toInt)))
      .toDF("vec_id", "embedding", "label")
    val queries = (0L until 5L).map(i =>
        (i, Array.fill(8)(rnd.nextFloat()), Option((i % 3).toInt)))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.fitCentroids(corpus, nlist = 4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    // full probe == exact tier, including the float score
    assert(rows(Similarity.hardNegativesTopKIvf(corpus, queries, 5,
        cents, nprobe = 4)) ==
      rows(Similarity.hardNegativesTopK(corpus, queries, 5)))
    assert(rows(Similarity.knnClassifyIvf(corpus, queries, 5,
        cents, nprobe = 4)) ==
      rows(Similarity.knnClassify(corpus, queries, 5)))
    // a partial probe never admits a same-label (or null-label) pair
    val labels = corpus.collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    val withNull = corpus.unionByName(
      Seq((99L, Array.fill(8)(0.5f), Option.empty[Int]))
        .toDF("vec_id", "embedding", "label"))
    val partial = Similarity.hardNegativesTopKIvf(withNull, queries, 5,
      cents, nprobe = 1).collect()
    val qLabels = (0L until 5L).map(i => i -> (i % 3).toInt).toMap
    partial.foreach { r =>
      val (qid, cid) = (r.getLong(0), r.getLong(1))
      assert(cid != 99L, "a null-labeled row must never pair")
      assert(labels(cid) != qLabels(qid),
        s"same-label pair admitted at nprobe=1: $qid -> $cid")
    }
  }

  test("ivfTopKQuantizedTrained: with nprobe = nlist the trained probe " +
    "degenerates to the quantized brute-force top-k; nprobe bounds " +
    "enforced") {
    val s = spark; import s.implicits._
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 40L)
      .map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val queries = corpus.where(col("vec_id") < 5)
    val cents = Similarity.fitKmeansInt8(corpus, k = 4, iters = 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = rows(Similarity.ivfTopKQuantizedTrained(corpus, queries,
      k = 3, cents, nprobe = 4))
    val brute = rows(Similarity.bruteForceTopKQuantized(corpus, queries,
      k = 3))
    assert(full == brute,
      "nprobe = nlist must scan every cell and equal brute force")
    intercept[IllegalArgumentException](
      Similarity.ivfTopKQuantizedTrained(corpus, queries, k = 3, cents,
        nprobe = 5))
    corpus.unpersist(blocking = true)
  }

  test("fitKmeansInt8: converges to the obvious clusters, is " +
    "partitioning-invariant, keeps empty clusters' previous centroids, " +
    "and the integer fold kernel matches its HOF reference") {
    val s = spark; import s.implicits._
    // two tight groups far apart in 2-D; scale chosen so int8
    // quantization keeps them well separated
    val pts = Seq(
      (1L, Array(100f, 100f)), (2L, Array(98f, 102f)), (3L, Array(101f, 99f)),
      (10L, Array(-100f, -100f)), (11L, Array(-99f, -101f)),
      (12L, Array(-102f, -98f))).toDF("vec_id", "embedding")
    val assign = Similarity.kmeansAssignInt8(pts, k = 2, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val groupA = Seq(1L, 2L, 3L).map(assign).toSet
    val groupB = Seq(10L, 11L, 12L).map(assign).toSet
    assert(groupA.size == 1 && groupB.size == 1 && groupA != groupB,
      s"the two far-apart groups must land in distinct cells: $assign")
    // bit-exact under a different partitioning (the determinism claim)
    val assign7 = Similarity.kmeansAssignInt8(pts.repartition(7),
      k = 2, iters = 3).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assign7 == assign)
    // duplicate seed vectors: the higher-indexed duplicate centroid gets
    // no points (ties go to the smaller index) and must CARRY unchanged
    val dup = Seq((1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(50f, 50f))).toDF("vec_id", "embedding")
    val cents = Similarity.fitKmeansInt8(dup, k = 3, iters = 2)
    assert(cents.length == 3)
    val zeros = cents.count(_.forall(_ == 0L))
    assert(zeros >= 2, // the duplicate (0,0) seed survives as-is
      s"an empty cluster must keep its previous centroid: ${cents.map(_.toSeq).toSeq}")
    intercept[IllegalArgumentException](
      Similarity.fitKmeansInt8(dup, k = 4, iters = 1)) // k > corpus
    // kernel parity: the codegen'd integer fold == the HOF formulation,
    // including null poison and length mismatch
    val mat = Seq(Seq(1L, -2L, 3L), Seq(0L, 0L, 0L))
    def hof(v: org.apache.spark.sql.Column) = array(mat.map(row =>
      aggregate(zip_with(v, typedlit(row), (x, c) => (x - c) * (x - c)),
        lit(0L), (acc, d) => acc + d)): _*)
    def kernel(v: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftColumnBridge.column(
        graft.functions.IntVectorLiteralFold(
          org.apache.spark.sql.GraftColumnBridge.expression(v), mat))
    val vecs = Seq(
      (1L, Some(Seq(Some(4L), Some(-5L), Some(6L)))),
      (2L, Some(Seq(Some(1L), None, Some(2L)))),      // null element
      (3L, Some(Seq(Some(1L), Some(2L)))),            // length mismatch
      (4L, Option.empty[Seq[Option[Long]]]))          // null array
      .toDF("id", "v")
    val both = vecs.select(col("id"), kernel(col("v")).as("k"),
      hof(col("v")).as("h")).collect()
    both.foreach { r =>
      if (r.getLong(0) == 4L)
        // a NULL array: the kernel is null-safe (null in -> null out,
        // the documented semantics); the HOF form instead yields an
        // array of null elements — callers treat both as "no fold"
        assert(r.isNullAt(1), s"kernel must be null-safe: $r")
      else {
        assert(!r.isNullAt(1) && !r.isNullAt(2), s"non-null arrays: $r")
        assert(r.getSeq[Any](1) == r.getSeq[Any](2), s"fold parity: $r")
      }
    }
  }
}
