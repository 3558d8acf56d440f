package graft.core

import graft.SparkTestBase
import java.nio.file.{Files, Paths}

class ConfigSpec extends SparkTestBase {

  private val base = Config.fromMap(Map(
    "sink.parallelism" -> "200",
    "sink.target_file_size" -> "1073741824",
    "source.max_messages" -> "1000000",
    "scopes.orders_table.sink.parallelism" -> "1024",
    "scopes.orders_table.source.max_messages" -> "5000000",
    "scopes.small_table.sink.parallelism" -> "8"))

  test("scope overlay: selected scope wins, others ignored, scope defs removed") {
    val noScope = base.withScope(None)
    assert(noScope.getInt("sink.parallelism").contains(200))
    assert(!noScope.props.keys.exists(_.startsWith("scopes.")))

    val orders = base.withScope(Some("orders_table"))
    assert(orders.getInt("sink.parallelism").contains(1024))
    assert(orders.getLong("source.max_messages").contains(5000000L))
    // non-overridden base key survives
    assert(orders.getLong("sink.target_file_size").contains(1073741824L))
    // the other scope's values never leak
    assert(base.withScope(Some("small_table")).getInt("sink.parallelism").contains(8))
  }

  test("subset strips the prefix; scopeNames enumerates scopes") {
    val sink = base.withScope(Some("orders_table")).subset("sink")
    assert(sink.getInt("parallelism").contains(1024))
    assert(base.scopeNames == Set("orders_table", "small_table"))
  }

  test("fromFile parses key=value lines with comments; ++ overlays") {
    val dir = tmpDir("config")
    Files.write(Paths.get(dir, "app.conf"),
      """# engine config
        |sink.parallelism = 64
        |
        |scopes.big.sink.parallelism = 2048
        |""".stripMargin.getBytes)
    val cfg = Config.fromFile(s"$dir/app.conf")
    assert(cfg.withScope(Some("big")).getInt("sink.parallelism").contains(2048))
    val merged = cfg ++ Config.fromMap(Map("sink.parallelism" -> "32"))
    assert(merged.getInt("sink.parallelism").contains(32))
  }
}
