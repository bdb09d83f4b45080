package graft

/** CLI contract of [[IngestMain]] — flag parsing twins the reference's
  * argparse surface (`wrds_ingestion.py:1252-1267`), and the snapshot +
  * stub-macro path runs the whole 17-step DAG from the command line the
  * way an operator would (here against an empty snapshot: every source
  * degrades to its schema-correct empty frame, the same posture as the
  * degraded-warehouse IngestSpec case).
  */
class IngestMainSpec extends SparkSpec {

  test("parseArgs mirrors the reference flags with its defaults") {
    val a = IngestMain.parseArgs(Seq("--snapshot", "/tmp/snap"))
    assert(a.start == "2000-01-01" && a.end == "2025-01-01") // wrds_ingestion.py:19-20
    assert(!a.saveRaw && a.root.isEmpty && a.snapshot.contains("/tmp/snap"))
    val b = IngestMain.parseArgs(Seq("--root", "/data", "--start", "2010-01-01",
      "--end", "2011-01-01", "--save-raw", "--jdbc-url", "jdbc:derby:x",
      "--jdbc-opt", "user=u", "--jdbc-opt", "password=p",
      "--stub-macro", "--partition-panels"))
    assert(b.root.contains("/data") && b.saveRaw && b.partitionPanels)
    assert(b.jdbcOpts == Map("user" -> "u", "password" -> "p"))
    assert(b.stubMacro)
  }

  test("parseArgs fails loudly on unknown flags and missing sources") {
    intercept[IllegalArgumentException] {
      IngestMain.parseArgs(Seq("--snapshot", "/s", "--bogus"))
    }
    // argparse-style: exactly one source
    intercept[IllegalArgumentException] { IngestMain.parseArgs(Seq.empty) }
    intercept[IllegalArgumentException] {
      IngestMain.parseArgs(Seq("--snapshot", "/s", "--jdbc-url", "jdbc:x"))
    }
  }

  test("snapshot + stub-macro CLI run executes the DAG end-to-end") {
    val snap = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val root = java.nio.file.Files.createTempDirectory("graft-cli-root").toString
    val args = IngestMain.parseArgs(Seq("--snapshot", snap, "--stub-macro",
      "--root", root, "--start", "2020-01-01", "--end", "2020-12-31"))
    val equity = new graft.sources.SnapshotEquitySource(spark, args.snapshot.get)
    val result = Ingest.run(spark, equity,
      new graft.sources.StubMacroSource(spark),
      Config.resolveDataRoot(args.root).toString, args.start, args.end)
    assert(result.steps.nonEmpty)
    // the run must still produce the manifest + log sinks (K2/K4), even
    // with every warehouse table absent
    val base = new java.io.File(result.root)
    assert(base.exists, s"missing pipeline root ${result.root}")
    val logs = new java.io.File(base, "logs")
    assert(logs.exists && logs.listFiles().nonEmpty, "missing run log")
  }
}
