package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets

/** Flat dotted-key configuration with scope overriding — the reference's
  * Configuration + ConfigScopeResolver (common/configuration/Configuration
  * .java:106, ConfigScopeResolver.java:35-95): a base property set plus
  * named scopes whose keys overlay the base when the scope is selected
  * (the reference's per-table/per-environment override mechanism).
  *
  * Keys under `scopes.<name>.` are the overlay for scope `<name>`; all
  * other keys are base. `withScope("prod")` returns base ++ overlay with
  * the scope prefix stripped. Driver-side only, O(KB).
  */
final case class Config(props: Map[String, String]) {
  import Config.ScopePrefix

  def get(key: String): Option[String] = props.get(key)
  def getOrElse(key: String, default: String): String = props.getOrElse(key, default)
  def getLong(key: String): Option[Long] = get(key).flatMap(_.toLongOption)
  def getInt(key: String): Option[Int] = get(key).flatMap(_.toIntOption)
  def getBoolean(key: String): Option[Boolean] = get(key).flatMap(_.toBooleanOption)

  /** Keys under `prefix.`, with the prefix stripped (Configuration
    * .getPropertiesWithPrefix analog). */
  def subset(prefix: String): Config = {
    val p = if (prefix.endsWith(".")) prefix else prefix + "."
    Config(props.collect { case (k, v) if k.startsWith(p) => k.stripPrefix(p) -> v })
  }

  /** Base properties with the named scope's overrides applied; scope
    * definitions themselves are removed from the result
    * (ConfigScopeResolver.java:35-95 semantics). */
  def withScope(scope: Option[String]): Config = {
    val base = props.filterNot { case (k, _) => k.startsWith(ScopePrefix) }
    scope match {
      case None => Config(base)
      case Some(s) =>
        Config(base ++ subset(s"$ScopePrefix$s").props)
    }
  }

  def scopeNames: Set[String] =
    props.keySet.collect {
      case k if k.startsWith(ScopePrefix) =>
        k.stripPrefix(ScopePrefix).takeWhile(_ != '.')
    }

  def ++(other: Config): Config = Config(props ++ other.props)
}

object Config {
  val ScopePrefix = "scopes."

  val empty: Config = Config(Map.empty[String, String])

  def fromMap(m: Map[String, String]): Config = Config(m)

  /** Load `key=value` lines (comments with #, blanks ignored) from any
    * Hadoop-compatible FS — the YAML-file role of the reference config. */
  def fromFile(path: String, hadoopConf: Configuration = new Configuration()): Config = {
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    val in = new BufferedReader(new InputStreamReader(fs.open(p), StandardCharsets.UTF_8))
    try {
      val props = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .flatMap { l =>
          l.split("=", 2) match {
            case Array(k, v) => Some(k.trim -> v.trim)
            case _           => None
          }
        }.toMap
      Config(props)
    } finally in.close()
  }
}
