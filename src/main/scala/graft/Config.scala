package graft

import java.nio.file.{Files, Path, Paths}

/** Data-root resolution (`config.py:11-83`): normalize a user-supplied
  * base path to the pipeline's output folder, with the same three-step
  * preference order and legacy-layout compatibility as the reference.
  */
object Config {

  val DataRootEnvVar = "QUANTLAB_DATA_ROOT"
  val DefaultDataRootName = "quantlab_data"
  val PipelineSubdirName = "quantlab_data_pipeline"
  val LegacyDataDirs: Seq[String] =
    Seq("data_processed", "data_meta", "data_raw", "reference")

  /** Base directory preference order (`config.py:16-40`):
    * env QUANTLAB_DATA_ROOT → sibling `quantlab_data` of the project root
    * (marked by build.sbt, the JVM analog of pyproject.toml) → cwd.
    */
  private def defaultBaseRoot(env: Map[String, String]): Path =
    env.get(DataRootEnvVar) match {
      case Some(root) if root.nonEmpty => Paths.get(root).toAbsolutePath.normalize
      case _ =>
        val cwd = Paths.get("").toAbsolutePath
        val projectRoot = Iterator.iterate(cwd)(_.getParent)
          .takeWhile(_ != null)
          .find(p => Files.exists(p.resolve("build.sbt")))
        projectRoot match {
          case Some(repo) if repo.getParent != null =>
            repo.getParent.resolve(DefaultDataRootName).normalize
          case _ => cwd.resolve(DefaultDataRootName).normalize
        }
    }

  /** Append the pipeline subdir unless the base already IS the subdir or
    * already looks like a data root (`config.py:43-53`).
    */
  private def pipelineRoot(base: Path): Path =
    if (base.getFileName != null &&
      base.getFileName.toString == PipelineSubdirName) base
    else if (LegacyDataDirs.exists(m => Files.exists(base.resolve(m)))) base
    else base.resolve(PipelineSubdirName).normalize

  /** `config.py:73-79`: None → full default resolution; a given root is
    * normalized through the same legacy/subdir rules.
    */
  def resolveDataRoot(root: Option[String] = None,
      env: Map[String, String] = sys.env): Path =
    root match {
      case Some(r) => pipelineRoot(Paths.get(r).toAbsolutePath.normalize)
      case None => pipelineRoot(defaultBaseRoot(env))
    }

  // ----- S4: YAML configuration (`config.py:82-90`, `wrds_ingestion.py:57-96`)

  /** Minimal YAML-subset reader (no dependencies, by design — the sbt
    * build has no YAML library and the config surface only uses this
    * shape): top-level `key: value` pairs and one-level nested sections
    * of `key: value` pairs, with `#` comments, blank lines and optional
    * single/double quoting. Exactly the shape of the reference's
    * `wrds_field_map.yml` / `wrds_credentials.yml` / `fred_credentials.yml`
    * (`config/wrds_field_map.yml:1-11`).
    *
    * Returns top-level scalars under their key and each section as a
    * nested `Map[String, String]`.
    */
  def loadYaml(path: Path): Map[String, Any] = {
    def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 &&
        ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }
    def stripComment(line: String): String = {
      // a # starts a comment unless inside quotes. A quote only OPENS at
      // a value boundary (line start or after ':' + spaces) — a mid-word
      // apostrophe (password `o'brien#1`) is a literal character, not a
      // state toggle, or it would disable comment stripping for the rest
      // of the line and corrupt credential values (ADVICE.md round 2).
      var quote: Char = 0    // 0 = outside any quoted run
      var boundary = true    // position where a quote may legally open
      val sb = new StringBuilder
      for (c <- line) {
        if (quote != 0) {
          sb += c
          if (c == quote) { quote = 0; boundary = false }
        } else if ((c == '\'' || c == '"') && boundary) {
          quote = c; sb += c
        } else if (c == '#') {
          return sb.toString
        } else {
          sb += c
          if (c == ':') boundary = true
          else if (c != ' ' && c != '\t') boundary = false
        }
      }
      sb.toString
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    var section: Option[String] = None
    Files.readAllLines(path).forEach { raw =>
      val line = stripComment(raw)
      if (line.trim.nonEmpty) {
        val indented = line.head == ' ' || line.head == '\t'
        line.indexOf(':') match {
          case -1 => // not key:value — outside the supported subset; skip
          case i =>
            val key = unquote(line.substring(0, i))
            val value = unquote(line.substring(i + 1))
            if (!indented) {
              if (value.isEmpty) {
                section = Some(key)
                out(key) = Map.empty[String, String]
              } else {
                section = None
                out(key) = value
              }
            } else section.foreach { s =>
              out(s) = out(s).asInstanceOf[Map[String, String]] + (key -> value)
            }
        }
      }
    }
    out.toMap
  }

  /** Repo-local config dir (`<project>/config`, like the reference's
    * `Path(__file__).parents[3] / "config"`), discovered via the build.sbt
    * marker; falls back to `cwd/config`.
    */
  def defaultConfigDir: Path = {
    val cwd = Paths.get("").toAbsolutePath
    Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
      .find(p => Files.exists(p.resolve("build.sbt")))
      .getOrElse(cwd).resolve("config")
  }

  /** WRDS credentials from YAML if present (`wrds_ingestion.py:57-70`):
    * `username:` / `password:` keys; (None, None) when the file is absent.
    */
  def loadWrdsCredentials(path: Option[Path] = None): (Option[String], Option[String]) = {
    val p = path.getOrElse(defaultConfigDir.resolve("wrds_credentials.yml"))
    if (!Files.exists(p)) (None, None)
    else {
      val data = loadYaml(p)
      (data.get("username").map(_.toString), data.get("password").map(_.toString))
    }
  }

  /** WRDS → friendly field mapping section from
    * `config/wrds_field_map.yml` (`wrds_ingestion.py:73-81`); empty map
    * when the file or section is absent.
    */
  def loadFieldMapping(section: String, path: Option[Path] = None): Map[String, String] = {
    val p = path.getOrElse(defaultConfigDir.resolve("wrds_field_map.yml"))
    if (!Files.exists(p)) Map.empty
    else loadYaml(p).get(section) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, String]]
      case _ => Map.empty
    }
  }

  /** The fundamentals rename map [[graft.Ingest]] applies: the file-driven
    * mapping when `config/wrds_field_map.yml` provides one, else the
    * built-in [[Transforms.fundamentalsFieldMap]] constant — so a user
    * with a custom field map has the same hook the reference offers.
    */
  def fundamentalsFieldMap(path: Option[Path] = None): Map[String, String] = {
    val fromFile = loadFieldMapping("fundamentals", path)
    if (fromFile.nonEmpty) fromFile else Transforms.fundamentalsFieldMap
  }

  /** FRED API key: env `FRED_API_KEY` first, then
    * `config/fred_credentials.yml` `api_key:` (`wrds_ingestion.py:84-96`).
    */
  def loadFredApiKey(path: Option[Path] = None,
      env: Map[String, String] = sys.env): Option[String] =
    env.get("FRED_API_KEY").filter(_.nonEmpty).orElse {
      val p = path.getOrElse(defaultConfigDir.resolve("fred_credentials.yml"))
      if (!Files.exists(p)) None
      else Config.loadYaml(p).get("api_key").map(_.toString)
    }
}
