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
}
