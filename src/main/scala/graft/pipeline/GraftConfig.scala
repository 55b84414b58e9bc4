package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Config lifecycle (reference E1): the reference loads a 3-level TOML file
  * (`[base]` content settings, `[pinecone]`/`[openai]` store + embedder
  * credentials — `vectrekker/main.py:19-53`) from `~/.vectrekker/config.toml`
  * and env-var overrides. The Spark engine needs no credentials (local
  * embedder, parquet-backed index), so the sections become: `[base]` scan
  * settings (same keys and defaults as the reference where they exist),
  * `[index]` where the vector/state tables live, `[embedder]` the hashing
  * embedder's dimension.
  *
  * Parsed with a minimal TOML-subset reader (sections, `key = value` with
  * string/int/bool values, `#` comments) — the full TOML grammar buys
  * nothing here and the environment has zero extra dependencies. Unknown
  * keys fail loudly (a typo'd key silently falling back to a default is the
  * classic config footgun).
  */
final case class GraftConfig(
    contentFolder: String,
    contentRegex: String = ".*\\.md$",     // main.py:21 default
    dimensionSize: Int = 64,               // main.py:22 has 1536 (ada-002); hashing default
    metric: String = "cosine",             // main.py:23 default
    maxTokens: Int = 8191,                 // main.py:175 guard
    indexPath: String,
    statePath: String)

object GraftConfig {

  /** `~/.vectrekker`-style default location, under `.graft`. */
  def defaultPath: Path = Paths.get(System.getProperty("user.home"), ".graft", "config.toml")

  def load(path: Path): GraftConfig = {
    val sections = parseToml(Files.readAllLines(path).asScala.toSeq)
    def section(name: String) = sections.getOrElse(name, Map.empty[String, String])
    val base  = section("base")
    val index = section("index")
    val emb   = section("embedder")
    val known = Map(
      "base"     -> Set("content_folder", "content_regex", "metric", "max_tokens"),
      "index"    -> Set("path", "state_path"),
      "embedder" -> Set("dimension_size"))
    sections.foreach { case (sec, kvs) =>
      require(known.contains(sec), s"config: unknown section [$sec] (known: ${known.keys.mkString(", ")})")
      val unknown = kvs.keySet -- known(sec)
      require(unknown.isEmpty, s"config: unknown key(s) ${unknown.mkString(", ")} in [$sec]")
    }
    def required(m: Map[String, String], sec: String, k: String): String =
      m.getOrElse(k, throw new IllegalArgumentException(s"config: missing required key '$k' in [$sec]"))
    GraftConfig(
      contentFolder = required(base, "base", "content_folder"),
      contentRegex  = base.getOrElse("content_regex", ".*\\.md$"),
      dimensionSize = emb.get("dimension_size").map(_.toInt).getOrElse(64),
      metric        = base.getOrElse("metric", "cosine"),
      maxTokens     = base.get("max_tokens").map(_.toInt).getOrElse(8191),
      indexPath     = required(index, "index", "path"),
      statePath     = required(index, "index", "state_path"))
  }

  /** Sections → key → raw value (quotes stripped). */
  private[pipeline] def parseToml(lines: Seq[String]): Map[String, Map[String, String]] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    var current: Option[String] = None
    lines.map(_.trim).zipWithIndex.foreach { case (line0, i) =>
      // a section header may carry a trailing comment: "[base]  # settings"
      val line = if (line0.startsWith("[")) line0.split("#", 2).head.trim else line0
      if (line.isEmpty || line.startsWith("#")) ()
      else if (line.startsWith("[") && line.endsWith("]")) {
        val name = line.substring(1, line.length - 1).trim
        require(name.nonEmpty, s"config line ${i + 1}: empty section name")
        current = Some(name)
        out.getOrElseUpdate(name, scala.collection.mutable.LinkedHashMap.empty)
      } else line.split("=", 2) match {
        case Array(k, v) =>
          val sec = current.getOrElse(
            throw new IllegalArgumentException(s"config line ${i + 1}: key outside any [section]"))
          val vt = v.trim
          val value =
            if (vt.startsWith("\"")) { // quoted: comment chars inside are literal
              val end = vt.indexOf('"', 1)
              require(end > 0, s"config line ${i + 1}: unterminated string")
              // fail-loudly contract: anything after the closing quote other
              // than a comment is a typo (e.g. a stray token, or an escape
              // attempt — escapes are unsupported), not silently-ignored text
              val rest = vt.substring(end + 1).trim
              require(rest.isEmpty || rest.startsWith("#"),
                s"config line ${i + 1}: unexpected text after closing quote: '$rest'")
              vt.substring(1, end)
            } else vt.split("#", 2).head.trim // bare: strip trailing comment
          out(sec).put(k.trim, value)
        case _ =>
          throw new IllegalArgumentException(s"config line ${i + 1}: expected key = value, got '$line'")
      }
    }
    out.map { case (k, v) => k -> v.toMap }.toMap
  }

  /** Build the [[Sync]] this config describes. */
  def sync(cfg: GraftConfig): Sync = {
    require(cfg.metric == "cosine", s"config: only the cosine metric is implemented, got '${cfg.metric}'")
    new Sync(cfg.contentFolder, cfg.statePath, cfg.indexPath,
      HashingEmbedder(cfg.dimensionSize), cfg.contentRegex, cfg.maxTokens)
  }
}
