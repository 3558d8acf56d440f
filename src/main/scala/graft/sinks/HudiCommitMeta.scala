package graft.sinks

/** Checkpoints embedded in the Hudi commit file — the reference's
  * HoodieBasedMetadataManager (common/metadata/HoodieBasedMetadataManager
  * .java:58,152) + HoodieSink.commit's extra-metadata path
  * (HoodieSink.java:264-295): run state rides in the SAME atomic commit as
  * the data, so sink write + checkpoint advance are one transaction (no
  * window where data landed but the checkpoint didn't).
  *
  * Expressed at the Hudi Spark-datasource option level: options carrying
  * the configured key prefix are copied verbatim into the commit's extra
  * metadata by Hudi (`hoodie.datasource.write.commitmeta.key.prefix`).
  * Reading the checkpoint back is a parse of the latest commit's metadata
  * map. No Hudi jar ships in this environment, so the option/parse layer
  * is what's testable here; `Sinks.writeHudi` consumes the result as-is.
  */
object HudiCommitMeta {

  val KeyPrefixOption = "hoodie.datasource.write.commitmeta.key.prefix"
  val DefaultPrefix = "graft.checkpoint."

  /** Hudi write options carrying `state` into the commit metadata. */
  def optionsWithCheckpoint(base: Map[String, String], state: Map[String, String],
                            prefix: String = DefaultPrefix): Map[String, String] = {
    require(prefix.nonEmpty, "commit-metadata key prefix must be non-empty")
    base ++ state.map { case (k, v) => s"$prefix$k" -> v } +
      (KeyPrefixOption -> prefix)
  }

  /** Recover the checkpoint map from a commit's extra metadata
    * (HoodieBasedMetadataManager.java:152 readMetadataInfo analog). */
  def extractCheckpoint(commitExtraMetadata: Map[String, String],
                        prefix: String = DefaultPrefix): Map[String, String] =
    commitExtraMetadata.collect {
      case (k, v) if k.startsWith(prefix) => k.stripPrefix(prefix) -> v
    }
}
