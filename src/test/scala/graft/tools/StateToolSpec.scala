package graft.tools

import graft.core.RunState
import org.scalatest.funsuite.AnyFunSuite

/** StateTool — the marmaray-tools metadata printer/pruner equivalent.
  * Pure-FS tool: no SparkSession needed. */
class StateToolSpec extends AnyFunSuite {

  private def dir() = java.nio.file.Files.createTempDirectory("statetool").toString

  private def captureOut(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos))(body)
    bos.toString("UTF-8")
  }

  test("print and get read the latest committed state") {
    val d = dir()
    val rs = new RunState(d)
    rs.set("orders.last_run", "2026-08-12")
    rs.set("events.offset", "42")
    rs.commit()
    val printed = captureOut(StateTool.main(Array("print", d)))
    assert(printed.contains("orders.last_run\t2026-08-12"))
    assert(printed.contains("events.offset\t42"))
    assert(captureOut(StateTool.main(Array("get", d, "events.offset"))).trim == "42")
  }

  test("unset removes a key via a new committed checkpoint") {
    val d = dir()
    val rs = new RunState(d)
    rs.set("a", "1"); rs.set("b", "2"); rs.commit()
    captureOut(StateTool.main(Array("unset", d, "a")))
    val reloaded = new RunState(d)
    assert(reloaded.get("a").isEmpty && reloaded.get("b").contains("2"))
    assert(reloaded.checkpoints.size == 2, "unset must add a checkpoint, not rewrite history")
  }

  test("prune keeps only the newest N checkpoints, state intact") {
    val d = dir()
    val rs = new RunState(d, retain = 100)
    (1 to 6).foreach { i => rs.set("k", i.toString); rs.commit() }
    assert(new RunState(d).checkpoints.size == 6)
    captureOut(StateTool.main(Array("prune", d, "2")))
    val after = new RunState(d)
    assert(after.checkpoints.size <= 2)
    assert(after.get("k").contains("6"), "prune must preserve the latest state")
  }

  test("benchkeys lists snapshot versions with the newest marked LIVE; " +
    "benchkeys-prune retires the oldest") {
    // the store contract is directory-level (version=N dirs of parquet
    // files); the listing/prune path is pure-FS, so a fabricated layout
    // exercises it without a SparkSession — same as Dedup.benchKeyVersions
    val d = dir() + "/keys"
    (1 to 3).foreach { v =>
      val p = java.nio.file.Paths.get(d, s"version=$v")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve("part-0.parquet"), s"stub$v")
    }
    val listed = captureOut(StateTool.main(Array("benchkeys", d))).trim.split("\n").toSeq
    assert(listed.size == 3)
    assert(listed.head.startsWith("version=1\tfiles=1"))
    assert(listed.last.startsWith("version=3") && listed.last.endsWith("\tLIVE"))
    assert(!listed.head.endsWith("LIVE"))
    val pruned = captureOut(StateTool.main(Array("benchkeys-prune", d, "2")))
    assert(pruned.contains("removed versions [1]"))
    val after = captureOut(StateTool.main(Array("benchkeys", d))).trim.split("\n").toSeq
    assert(after.size == 2 && after.head.startsWith("version=2"))
  }

  test("layouts lists layout-store versions with the newest LIVE; " +
    "layouts-prune retires the oldest") {
    val d = dir() + "/store"
    (1 to 3).foreach { v =>
      val p = java.nio.file.Paths.get(d, s"version=$v", "postings")
      java.nio.file.Files.createDirectories(p)
      java.nio.file.Files.writeString(p.resolve("part-0.parquet"), s"stub$v")
    }
    val listed = captureOut(StateTool.main(Array("layouts", d))).trim.split("\n").toSeq
    assert(listed.size == 3)
    assert(listed.last.startsWith("version=3") && listed.last.endsWith("\tLIVE"))
    val pruned = captureOut(StateTool.main(Array("layouts-prune", d, "1")))
    assert(pruned.contains("removed versions [1,2]"))
    val after = captureOut(StateTool.main(Array("layouts", d))).trim.split("\n").toSeq
    assert(after.size == 1 && after.head.startsWith("version=3"))
    assert(after.head.contains("\tphysical"),
      "a manifest-free version must list as physical")
  }

  test("layouts shows the manifest owned/inherited split; layouts-frag " +
    "reports entries over the file threshold (pure FS, no Spark)") {
    val d = dir() + "/store"
    // v1: physical, day=0 with 3 stub files, day=1 with 1
    for ((day, n) <- Seq((0, 3), (1, 1))) {
      val p = java.nio.file.Paths.get(d, "version=1", s"day=$day")
      java.nio.file.Files.createDirectories(p)
      (0 until n).foreach(i => java.nio.file.Files.writeString(
        p.resolve(s"part-$i.parquet"), s"stub$i"))
    }
    // v2: manifested — owns day=1, inherits day=0 from v1
    val v2 = java.nio.file.Paths.get(d, "version=2", "day=1")
    java.nio.file.Files.createDirectories(v2)
    java.nio.file.Files.writeString(v2.resolve("part-0.parquet"), "stub")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(d, "version=2", "_manifest.json"),
      """{"day=0":1,"day=1":2}""")
    val listed = captureOut(StateTool.main(Array("layouts", d)))
      .trim.split("\n").toSeq
    assert(listed.last.contains("owned=1") &&
      listed.last.contains("inherited=1"), listed.mkString("|"))
    val frag = captureOut(StateTool.main(Array("layouts-frag", d, "2")))
    assert(frag.contains("day=0") && frag.contains("files=3"), frag)
    assert(!frag.contains("day=1"))
    val clean = captureOut(StateTool.main(Array("layouts-frag", d, "8")))
    assert(clean.contains("nothing to compact"), clean)
  }

  test("versions lists checkpoint files oldest first") {
    val d = dir()
    val rs = new RunState(d)
    rs.set("x", "1"); rs.commit()
    rs.set("x", "2"); rs.commit()
    val lines = captureOut(StateTool.main(Array("versions", d))).trim.split("\n").toSeq
    assert(lines.size == 2 && lines == lines.sorted)
    assert(lines.forall(_.startsWith("state-")))
  }
}
