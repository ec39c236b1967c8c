package graft.meta

import java.io.FileInputStream
import java.util.Properties

import scala.jdk.CollectionConverters._

/** Typed engine configuration — the Spark-native form of the
  * reference's two config layers (SURVEY.md §2.9 O5/O6): the INI
  * settings file (include/scripts/settings.txt:1-33 — entity list :5,
  * delimiter :3, partition levels :7-10, metadata table name :20-21)
  * and the pydantic env-backed settings (include/scripts/utils/
  * config.py:10-24), loaded once into an immutable case class.
  *
  * Precedence: environment overrides > properties file > defaults —
  * mirroring pydantic BaseSettings' env-first behavior.
  */
final case class GraftConfig(
    entities: Seq[String],
    delimiter: String,
    filePartitionLevels: Int,
    rawRoot: String,
    metadataPath: String)

object GraftConfig {

  /** Defaults mirror settings.txt values. */
  val defaults: GraftConfig = GraftConfig(
    entities = Seq("bundesliga_match_scores", "frenchligue1_match_scores",
      "laliga_match_scores", "premierleague_match_scores",
      "seriea_match_scores"),
    delimiter = ",",
    filePartitionLevels = 3,
    rawRoot = "data/raw",
    metadataPath = "data/meta")

  def load(propertiesPath: Option[String] = None,
      env: Map[String, String] = sys.env): GraftConfig = {
    val props = new Properties()
    propertiesPath.foreach { p =>
      val in = new FileInputStream(p)
      try props.load(in) finally in.close()
    }
    def get(key: String, default: => String): String =
      env.getOrElse(s"GRAFT_${key.toUpperCase}",
        Option(props.getProperty(key)).getOrElse(default))

    GraftConfig(
      entities = get("entities", defaults.entities.mkString(","))
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      delimiter = get("delimiter", defaults.delimiter),
      filePartitionLevels =
        get("file_partition_levels", defaults.filePartitionLevels.toString).toInt,
      rawRoot = get("raw_root", defaults.rawRoot),
      metadataPath = get("metadata_path", defaults.metadataPath))
  }

  /** All effective settings as a map (diagnostics / report sink). */
  def describe(c: GraftConfig): Map[String, String] = Map(
    "entities" -> c.entities.mkString(","),
    "delimiter" -> c.delimiter,
    "file_partition_levels" -> c.filePartitionLevels.toString,
    "raw_root" -> c.rawRoot,
    "metadata_path" -> c.metadataPath)
}
