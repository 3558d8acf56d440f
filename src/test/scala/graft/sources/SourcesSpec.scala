package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.types._
import java.io.File
import java.nio.file.{Files, Paths}
import java.time.LocalDate

/** Partition discovery + file-source semantics, mirroring
  * TestHDFSPartitionManager / TestHDFSDatePartitionManager
  * (marmaray/src/test/java/.../metadata/) and the JSON corrupt-record
  * channel (JSONFileSourceDataConverter).
  */
class SourcesSpec extends SparkTestBase {

  private def mkdirs(base: String, names: String*): Unit =
    names.foreach(n => new File(base, n).mkdirs())

  test("listPartitions: hidden/underscore dirs dropped, sorted") {
    val base = tmpDir("parts")
    mkdirs(base, "ds=2024-01-02", "ds=2024-01-01", ".hidden", "_SUCCESS_dir", "ds=2024-01-03")
    assert(Sources.listPartitions(spark, base) ==
      Seq("ds=2024-01-01", "ds=2024-01-02", "ds=2024-01-03"))
  }

  test("nextPartition: first strictly greater than checkpoint; None when exhausted") {
    val base = tmpDir("parts")
    mkdirs(base, "p=a", "p=b", "p=c")
    assert(Sources.nextPartition(spark, base, None).map(_.partition).contains("p=a"))
    assert(Sources.nextPartition(spark, base, Some("p=a")).map(_.partition).contains("p=b"))
    assert(Sources.nextPartition(spark, base, Some("p=c")).isEmpty)
    assert(Sources.nextPartition(spark, tmpDir("empty"), None).isEmpty)
  }

  test("nextDatePartition: start-date floor applies, checkpoint still wins") {
    val base = tmpDir("dparts")
    mkdirs(base, "ds=2024-01-01", "ds=2024-02-01", "ds=2024-03-01", "other=x")
    val start = Some(LocalDate.of(2024, 2, 1))
    assert(Sources.nextDatePartition(spark, base, "ds", None, start)
      .map(_.partition).contains("ds=2024-02-01"))
    assert(Sources.nextDatePartition(spark, base, "ds", Some("ds=2024-02-01"), start)
      .map(_.partition).contains("ds=2024-03-01"))
    // non-matching partition key never surfaces
    assert(Sources.nextDatePartition(spark, base, "nope", None, None).isEmpty)
  }

  test("json source: malformed lines land in the corrupt-record channel") {
    val dir = tmpDir("json")
    Files.write(Paths.get(dir, "a.json"),
      """{"id": 1, "name": "ok"}
        |not json at all
        |{"id": 3, "name": "fine"}
        |""".stripMargin.getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sources.json(spark, dir, schema).cache()
    assert(df.count() == 3)
    assert(df.filter(df(Sources.CorruptCol).isNotNull).count() == 1)
    assert(df.filter(df(Sources.CorruptCol).isNull).count() == 2)
    df.unpersist()
  }

  test("json source: extension filter skips other files") {
    val dir = tmpDir("jsonext")
    Files.write(Paths.get(dir, "a.json"), """{"id": 1}""".getBytes)
    Files.write(Paths.get(dir, "b.txt"), """{"id": 2}""".getBytes)
    val schema = StructType(Seq(StructField("id", LongType)))
    assert(Sources.json(spark, dir, schema, extension = Some("json")).count() == 1)
  }

  test("csv source reads header files with explicit schema") {
    val dir = tmpDir("csv")
    Files.write(Paths.get(dir, "a.csv"), "id,name\n1,x\n2,y\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sources.csv(spark, dir, schema)
    assert(df.count() == 2)
    assert(df.where("name = 'x'").count() == 1)
  }
}
