package graft

import java.nio.file.{Files, Paths}

/** Minimal YAML-subset loader for pipeline configs — the analog of the
  * reference's Jackson-YAML `MapConfiguration.build`
  * (`MapConfiguration.java:28-67`, `example.yml`). Supports exactly the
  * shape that config uses: `key: value` pairs, one level of nesting by
  * two-space indentation, full-line and trailing `#` comments (YAML starts
  * a comment at `#` preceded by whitespace) and blank lines. No external
  * dependency (the sandbox resolves none beyond Spark).
  *
  * Reference keys → engine config: `tilesThreshold` → threshold,
  * `tileSize`/`tileBufferSize`/`maxZoom` → ditto, `hbase.keySaltModulus` →
  * saltModulo, `targetDirectory` → workDir, and `hiveDB` selects the
  * catalog CTAS barrier (`MapPipeline.CatalogBarrier`) exactly as the
  * reference checkpoints through its Hive database.
  */
object ConfigLoader {

  /** Parse a reference-shaped YAML string into dotted flat keys
    * (`hbase.keySaltModulus`).
    */
  def parseYaml(text: String): Map[String, String] = {
    var section: Option[String] = None
    val out = Map.newBuilder[String, String]
    for (raw <- text.linesIterator if !raw.trim.startsWith("#") && raw.trim.nonEmpty) {
      val indented = raw.startsWith(" ")
      val line = raw.trim
      val ci = line.indexOf(':')
      if (ci > 0) {
        val k = line.substring(0, ci).trim
        val rawV = line.substring(ci + 1)
        // trailing comment: '#' preceded by whitespace (YAML rule) — a bare
        // '#' inside a value (e.g. a URL fragment) is kept
        val cut = rawV.indexOf(" #")
        val v = (if (cut >= 0) rawV.substring(0, cut) else rawV).trim
        if (v.isEmpty && !indented) section = Some(k) // nested-section header
        else if (v.nonEmpty) {
          if (indented && section.isDefined) out += (s"${section.get}.$k" -> v)
          else { section = None; out += (k -> v) }
        }
      }
    }
    out.result()
  }

  def load(path: String): Map[String, String] =
    parseYaml(Files.readString(Paths.get(path)))

  /** Reference-keyed map → `MapPipeline.Config`. `workDirOverride` replaces
    * `targetDirectory` (e.g. a local path instead of the config's HDFS URI).
    */
  def toPipelineConfig(kv: Map[String, String],
                       workDirOverride: Option[String] = None): MapPipeline.Config = {
    def int(k: String, dflt: Int): Int = kv.get(k).map(_.trim.toInt).getOrElse(dflt)
    MapPipeline.Config(
      workDir = workDirOverride.orElse(kv.get("targetDirectory")).getOrElse(
        throw new IllegalArgumentException("targetDirectory (or override) required")),
      tileSize = int("tileSize", 512),
      bufferSize = int("tileBufferSize", 64),
      maxZoom = int("maxZoom", 16),
      saltModulo = int("hbase.keySaltModulus", 10),
      threshold = kv.get("tilesThreshold").map(_.trim.toLong).getOrElse(250000L),
      barrier = kv.get("hiveDB").map(db => MapPipeline.CatalogBarrier(db)))
  }
}
