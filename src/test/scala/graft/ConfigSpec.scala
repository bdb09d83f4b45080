package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/test_config.py:8-25` plus the env-var branch. */
class ConfigSpec extends AnyFunSuite {

  test("resolve_data_root appends the pipeline subdir (ref :9-11)") {
    val tmp = Files.createTempDirectory("graft-cfg")
    assert(Config.resolveDataRoot(Some(tmp.toString)) ==
      tmp.resolve(Config.PipelineSubdirName))
  }

  test("legacy layout passes through unchanged (ref :14-19)") {
    val legacy = Files.createTempDirectory("graft-cfg").resolve("legacy_root")
    Files.createDirectories(legacy.resolve("data_processed"))
    assert(Config.resolveDataRoot(Some(legacy.toString)) == legacy)
  }

  test("a path already at the pipeline subdir is idempotent (ref :22-25)") {
    val tmp = Files.createTempDirectory("graft-cfg")
      .resolve(Config.PipelineSubdirName)
    assert(Config.resolveDataRoot(Some(tmp.toString)) == tmp)
  }

  test("env var takes precedence for the default base root (config.py:27-29)") {
    val tmp = Files.createTempDirectory("graft-cfg-env")
    val resolved = Config.resolveDataRoot(None,
      env = Map(Config.DataRootEnvVar -> tmp.toString))
    assert(resolved == tmp.resolve(Config.PipelineSubdirName))
  }
}
