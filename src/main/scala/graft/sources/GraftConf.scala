package graft.sources

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Typed INI-style configuration with per-key fallbacks — the engine's
  * analog of the reference's config surface (GraphConf,
  * /root/reference/riot_graphs/rg.py:368-414 and config.ini): sectioned
  * `key = value` pairs, `#`/`;` comments, typed getters (`get`,
  * `getInt`, `getBoolean`) that either fall back or fail with a clear
  * "config error" naming the missing key (ref rg.py:412-414's
  * SystemExit). Keys the Spark engine consumes map 1:1 onto the
  * reference's: the InfluxDB connection block becomes the store
  * directory, `batch_size` bounds sink batches, `[riot]`/`[github]`
  * become the artifact/commit/dim table paths.
  */
final class GraftConf(entries: Map[(String, String), String]) {

  def get(section: String, key: String): String =
    entries.getOrElse((section, key),
      throw new IllegalArgumentException(
        s"Config error: missing [$section] $key"))

  def get(section: String, key: String, fallback: String): String =
    entries.getOrElse((section, key), fallback)

  def getOption(section: String, key: String): Option[String] =
    entries.get((section, key))

  def getInt(section: String, key: String, fallback: Int): Int =
    entries.get((section, key)).map { v =>
      try v.trim.toInt
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"Config error: [$section] $key is not an int: ${v.trim}")
      }
    }.getOrElse(fallback)

  def getBoolean(section: String, key: String, fallback: Boolean): Boolean =
    entries.get((section, key)).map(_.trim.toLowerCase)
      .map {
        case "true" | "yes" | "on" | "1" => true
        case "false" | "no" | "off" | "0" => false
        case other => throw new IllegalArgumentException(
          s"Config error: [$section] $key is not a boolean: $other")
      }.getOrElse(fallback)
}

object GraftConf {

  /** Parse INI text: `[section]` headers, `key = value` (or `key: value`)
    * entries, blank lines and `#`/`;` comments ignored. Later duplicate
    * keys win (configparser semantics). */
  def parseString(text: String): GraftConf = {
    var section = "main"
    val entries = scala.collection.mutable.LinkedHashMap
      .empty[(String, String), String]
    text.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("#") && !line.startsWith(";")) {
        if (line.startsWith("[") && line.endsWith("]")) {
          section = line.substring(1, line.length - 1).trim
        } else {
          val idx = {
            val eq = line.indexOf('=')
            val co = line.indexOf(':')
            if (eq < 0) co else if (co < 0) eq else math.min(eq, co)
          }
          if (idx > 0) {
            entries((section, line.take(idx).trim)) =
              line.drop(idx + 1).trim
          }
        }
      }
    }
    new GraftConf(entries.toMap)
  }

  def load(path: String): GraftConf =
    parseString(Files.readAllLines(Paths.get(path)).asScala.mkString("\n"))
}
