package graft.core

import graft.SparkTestBase
import java.io.File

/** Checkpoint-manager semantics, mirroring TestHDFSMetadataManager
  * (marmaray/src/test/java/.../metadata/TestHDFSMetadataManager.java):
  * staged-until-commit, atomic files, prune-to-retain, reload-latest.
  */
class RunStateSpec extends SparkTestBase {

  test("staged values are invisible until commit") {
    val dir = tmpDir("runstate")
    val rs = new RunState(dir)
    rs.set("topic/p0", "42")
    assert(new RunState(dir).get("topic/p0").isEmpty, "uncommitted state leaked")
    rs.commit()
    assert(new RunState(dir).get("topic/p0").contains("42"))
  }

  test("latest commit wins on reload; older values carried forward") {
    val dir = tmpDir("runstate")
    val rs = new RunState(dir)
    rs.set("a", "1"); rs.set("b", "x"); rs.commit()
    rs.set("a", "2"); rs.commit()
    val fresh = new RunState(dir)
    assert(fresh.get("a").contains("2"))
    assert(fresh.get("b").contains("x"))
  }

  test("prunes to the newest `retain` checkpoint files; no temp files left") {
    val dir = tmpDir("runstate")
    val rs = new RunState(dir, retain = 5)
    (1 to 8).foreach { i => rs.set("seq", i.toString); rs.commit() }
    val files = new File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("state-")) == 5, files.mkString(","))
    assert(!files.exists(_.startsWith(".tmp")), "temp file leaked")
    assert(new RunState(dir).get("seq").contains("8"))
  }

  test("remove drops a key from the staged view and the next commit") {
    val dir = tmpDir("runstate")
    val rs = new RunState(dir)
    rs.set("gone", "1"); rs.set("kept", "2"); rs.commit()
    rs.remove("gone"); rs.commit()
    val fresh = new RunState(dir)
    assert(fresh.get("gone").isEmpty)
    assert(fresh.get("kept").contains("2"))
  }

  test("values containing tabs/newlines are rejected or survive") {
    val dir = tmpDir("runstate")
    val rs = new RunState(dir)
    // the serde is line/tab-delimited; offset JSON is the main payload and
    // contains neither, but a value with a tab must not corrupt other keys
    rs.set("json", """{"0":123,"1":456}"""); rs.commit()
    assert(new RunState(dir).get("json").contains("""{"0":123,"1":456}"""))
  }
}
