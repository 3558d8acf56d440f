package graft.sinks

import graft.SparkTestBase
import graft.core.RunState
import org.apache.hadoop.io.Text
import org.apache.spark.sql.types._

class SinkDepthSpec extends SparkTestBase {

  test("sequence-file round-trip with LZ4 compression") {
    val s = spark; import s.implicits._
    val df = (1 to 50).map(i => (i.toLong, s"line-$i")).toDF("k", "v")
    val out = tmpDir("seq") + "/data"
    Sinks.writeSequenceFile(df, out, "k", "v")
    val back = spark.sparkContext
      .sequenceFile(out, classOf[Text], classOf[Text])
      .map { case (k, v) => (k.toString.toLong, v.toString) }
      .collect().sortBy(_._1)
    assert(back.length == 50)
    assert(back.head == ((1L, "line-1")))
    assert(back.last == ((50L, "line-50")))
  }

  test("sequence-file works uncompressed too") {
    val s = spark; import s.implicits._
    val df = Seq((1L, "x")).toDF("k", "v")
    val out = tmpDir("sequnc") + "/data"
    Sinks.writeSequenceFile(df, out, "k", "v", compressionCodec = None)
    assert(spark.sparkContext.sequenceFile(out, classOf[Text], classOf[Text]).count() == 1)
  }

  test("SinkStats: rolling history capped at 8, learned avg drives parallelism") {
    val rs = new RunState(tmpDir("stats"))
    val stats = new SinkStats(rs, "mytable")
    assert(!stats.isStatHistoryAvailable)
    assert(SinkStats.writeParallelism(1000000, stats.avgRecordSize, 1 << 30) == 200,
      "no history -> fallback parallelism")
    (1 to 10).foreach(i => stats.recordRun(i * 100L))
    assert(stats.history.size == 8)
    assert(stats.history.head == 300L, "oldest runs evicted")
    assert(stats.avgRecordSize == (300 to 1000 by 100).sum / 8)
    // 10M records x 650B avg / 1GB target => ~7 writers
    val p = SinkStats.writeParallelism(10000000L, stats.avgRecordSize, 1L << 30)
    assert(p == math.ceil(10000000L * stats.avgRecordSize / (1L << 30).toDouble).toInt)
  }

  test("SinkStats survive RunState commit/reload (cross-run learning)") {
    val dir = tmpDir("stats2")
    val rs = new RunState(dir)
    new SinkStats(rs, "t").recordRun(512L)
    rs.commit()
    val stats = new SinkStats(new RunState(dir), "t")
    assert(stats.avgRecordSize == 512L)
  }

  test("SinkStats.recordRunFromPath learns from actual output bytes") {
    val s = spark; import s.implicits._
    val out = tmpDir("statspath")
    (1 to 1000).map(i => (i.toLong, s"payload-$i")).toDF("id", "p")
      .coalesce(1).write.mode("overwrite").parquet(out)
    val rs = new RunState(tmpDir("stats3"))
    val stats = new SinkStats(rs, "t")
    stats.recordRunFromPath(out, 1000)
    assert(stats.avgRecordSize > 0)
  }

  test("Hudi commit-metadata options carry and recover the checkpoint") {
    val base = Sinks.hudiOptions("tbl", "id", "ds", Sinks.Upsert)
    val state = Map("kafka:events:0" -> "150", "watermark" -> "2024-06-01")
    val opts = HudiCommitMeta.optionsWithCheckpoint(base, state)
    assert(opts(HudiCommitMeta.KeyPrefixOption) == HudiCommitMeta.DefaultPrefix)
    assert(opts("graft.checkpoint.kafka:events:0") == "150")
    assert(opts("hoodie.datasource.write.operation") == "upsert")
    // commit metadata (as Hudi would store it) round-trips
    val commitMeta = opts.filter(_._1.startsWith(HudiCommitMeta.DefaultPrefix))
    assert(HudiCommitMeta.extractCheckpoint(commitMeta) == state)
  }

  test("CQL DDL: create/alter/insert statements from StructType") {
    val schema = Cql.TableSchema(
      keyspace = "ks", table = "events",
      fields = StructType(Seq(
        StructField("user_id", LongType),
        StructField("ts", TimestampType),
        StructField("kind", StringType),
        StructField("payload", BinaryType))),
      partitionKeys = Seq("user_id"),
      clusteringKeys = Seq("ts" -> "DESC"))
    assert(schema.createTableCql ==
      "CREATE TABLE IF NOT EXISTS ks.events (user_id bigint, ts timestamp, " +
        "kind text, payload blob, PRIMARY KEY ((user_id), ts)) " +
        "WITH CLUSTERING ORDER BY (ts DESC)")
    // live table missing `payload` -> one ALTER; matching columns silent
    val alters = schema.alterTableCql(Map(
      "user_id" -> "bigint", "ts" -> "timestamp", "kind" -> "text"))
    assert(alters == Seq("ALTER TABLE ks.events ADD payload blob"))
    // incompatible type is a hard failure (schema is source of truth)
    intercept[IllegalStateException](
      schema.alterTableCql(Map("user_id" -> "text")))
    assert(schema.insertCql(ttlSeconds = Some(3600), writeTimestampMicros = Some(99L)) ==
      "INSERT INTO ks.events (user_id, ts, kind, payload) VALUES (?, ?, ?, ?) " +
        "USING TTL 3600 AND TIMESTAMP 99")
    assert(schema.columnsQueryCql.contains("system_schema.columns"))
  }

  test("writeInBatches: slices by global index, paces, preserves all rows") {
    val s = spark; import s.implicits._
    val df = (1 to 25).map(i => (i.toLong, s"r$i")).toDF("id", "v")
    val sizes = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val outs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t0 = System.nanoTime()
    val n = Sinks.writeInBatches(df, recordsPerBatch = 10, minBatchMillis = 150) {
      (batch, id) =>
        sizes += ((id, batch.count()))
        outs ++= batch.select("id").collect().map(_.getLong(0))
        assert(!batch.columns.contains("__graft_batch"))
    }
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(n == 3)
    assert(sizes.toSeq == Seq((0L, 10L), (1L, 10L), (2L, 5L)))
    assert(outs.sorted.toSeq == (1L to 25L))
    assert(elapsedMs >= 300, s"pacing skipped: ${elapsedMs}ms") // 2 inter-batch waits
  }

  test("CQL DDL: key validation and unsupported types fail fast") {
    intercept[IllegalArgumentException](Cql.TableSchema("ks", "t",
      StructType(Seq(StructField("a", LongType))), partitionKeys = Seq("missing")))
    intercept[IllegalArgumentException](
      Cql.cqlType(ArrayType(StringType)))
  }
}
