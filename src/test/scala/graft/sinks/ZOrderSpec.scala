package graft.sinks

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {

  private val dims = Seq(ZOrder.Dim("x", 0L, 99L), ZOrder.Dim("y", 0L, 99L))

  test("zbin/zValue column expressions match the driver-side twins " +
    "value-for-value (including clamped out-of-domain inputs)") {
    val s = spark; import s.implicits._
    val rows = Seq.tabulate(200)(i => (i.toLong * 7 % 103 - 2, i.toLong * 13 % 105 - 1))
    val df = rows.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(Seq(
        ZOrder.zbin(col("x"), 0L, 99L, 5),
        ZOrder.zbin(col("y"), 0L, 99L, 5)), 5))
    val got = df.select(col("x"), col("y"), col("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      val want = ZOrder.zValueLocal(Seq(
        ZOrder.zbinLocal(x, 0L, 99L, 5),
        ZOrder.zbinLocal(y, 0L, 99L, 5)), 5)
      assert(got((x, y)) == want, s"($x, $y)")
    }
  }

  test("readRect: zbucket IN prunes partition dirs at the file listing, " +
    "result equals the plain filter, full-domain rect touches every bucket") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val s = spark; import s.implicits._
    val data = Seq.tabulate(4000)(i =>
      (i.toLong, i.toLong * 31 % 100, i.toLong * 17 % 100)).toDF("id", "x", "y")
    val path = tmpDir("zorder-layout")
    ZOrder.writeZOrderLayout(data, path, dims, bits = 5, zBuckets = 32)
    val rect = Seq((10L, 20L), (40L, 60L))
    val out = ZOrder.readRect(spark, path, dims, rect, bits = 5, zBuckets = 32)
    val expected = data
      .where(col("x").between(10, 20) && col("y").between(40, 60))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(out.select(col("id")).collect().map(_.getLong(0)).toSet == expected)
    val scan = out.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    val pruned = scan.selectedPartitions.partitionCount
    assert(pruned > 0 && pruned < 32,
      s"expected a strict partition subset, scanned $pruned of 32")
    assert(scan.partitionFilters.exists(_.references.map(_.name)
      .exists(_ == "zbucket")), "zbucket filter not a partition filter")
    // a rect covering the whole domain must admit every bucket
    assert(ZOrder.bucketsForRect(dims, Seq((0L, 99L), (0L, 99L)), 5, 32)
      .length == 32)
  }
}
