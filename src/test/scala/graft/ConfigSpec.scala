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

  // ----- S4: YAML subset reader + the three config loaders

  test("loadYaml parses scalars, sections, comments and quoting") {
    val p = Files.createTempDirectory("graft-yml").resolve("t.yml")
    Files.writeString(p,
      """# header comment
        |username: alice   # trailing comment
        |password: 's3#cret'
        |fundamentals:
        |  revt: revenue
        |  ni: "net_income"
        |
        |other: plain
        |""".stripMargin)
    val y = Config.loadYaml(p)
    assert(y("username") == "alice")
    assert(y("password") == "s3#cret") // '#' inside quotes is not a comment
    assert(y("fundamentals") ==
      Map("revt" -> "revenue", "ni" -> "net_income"))
    assert(y("other") == "plain")
  }

  test("wrds credentials load from YAML; absent file gives (None, None)") {
    val dir = Files.createTempDirectory("graft-cred")
    val p = dir.resolve("wrds_credentials.yml")
    Files.writeString(p, "username: bob\npassword: pw123\n")
    assert(Config.loadWrdsCredentials(Some(p)) == (Some("bob"), Some("pw123")))
    assert(Config.loadWrdsCredentials(Some(dir.resolve("missing.yml"))) ==
      (None, None))
  }

  test("fred api key: env wins, then YAML, then None") {
    val dir = Files.createTempDirectory("graft-fred")
    val p = dir.resolve("fred_credentials.yml")
    Files.writeString(p, "api_key: fromfile\n")
    assert(Config.loadFredApiKey(Some(p),
      env = Map("FRED_API_KEY" -> "fromenv")) == Some("fromenv"))
    assert(Config.loadFredApiKey(Some(p), env = Map.empty) == Some("fromfile"))
    assert(Config.loadFredApiKey(Some(dir.resolve("missing.yml")),
      env = Map.empty) == None)
  }

  test("file-driven field map feeds the fundamentals rename (S4 parity)") {
    val p = Files.createTempDirectory("graft-map").resolve("wrds_field_map.yml")
    Files.writeString(p,
      "fundamentals:\n  revt: custom_revenue_name\n  ni: net_income\n")
    val m = Config.fundamentalsFieldMap(Some(p))
    assert(m == Map("revt" -> "custom_revenue_name", "ni" -> "net_income"))
    // absent file falls back to the built-in constant
    val fallback = Config.fundamentalsFieldMap(
      Some(p.getParent.resolve("missing.yml")))
    assert(fallback == Transforms.fundamentalsFieldMap)
  }

  test("repo config/wrds_field_map.yml matches the built-in constant") {
    // the shipped hook file must stay in sync with the default the code
    // uses when the file is deleted
    assert(Config.fundamentalsFieldMap() == Transforms.fundamentalsFieldMap)
  }
}
