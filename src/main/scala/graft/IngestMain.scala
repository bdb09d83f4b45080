package graft

import org.apache.spark.sql.SparkSession

import graft.sources.{HttpMacroSource, JdbcEquitySource, SnapshotEquitySource,
  StubMacroSource}

/** CLI twin of the reference's module entry point
  * (`python -m data_pipeline.ingestion.wrds_ingestion`,
  * `wrds_ingestion.py:1252-1267`): the same flags with the same defaults —
  * `--root` (default via [[Config.resolveDataRoot]]'s env/`../quantlab_data`
  * resolution, `config.py:43-79`), `--start`/`--end`
  * (`wrds_ingestion.py:19-20`), `--save-raw` — plus the source selectors a
  * Spark deployment needs where the reference hard-wires a `wrds.Connection`:
  *
  *   - `--jdbc-url <url>` [`--jdbc-opt k=v` ...]: live warehouse through
  *     [[sources.JdbcEquitySource]] (the reference's WRDS posture);
  *   - `--snapshot <dir>`: a parquet snapshot of the warehouse tables
  *     through [[sources.SnapshotEquitySource]] (air-gapped replays);
  *   - `--fred-url <url>` / `--stub-macro`: macro series via
  *     [[sources.HttpMacroSource]] (default: the public FRED endpoint,
  *     as the reference) or the offline stub;
  *   - `--partition-panels`: write the big panels date-partitioned
  *     ([[Layout.writeDatePartitioned]]) — the 100 TB layout.
  */
object IngestMain {

  case class Args(root: Option[String] = None,
      start: String = "2000-01-01", end: String = "2025-01-01",
      saveRaw: Boolean = false, snapshot: Option[String] = None,
      jdbcUrl: Option[String] = None,
      jdbcOpts: Map[String, String] = Map.empty,
      fredUrl: Option[String] = None, stubMacro: Boolean = false,
      partitionPanels: Boolean = false)

  /** Pure argument parser (unit-tested without a session). Unknown flags
    * fail loudly, like argparse.
    */
  def parseArgs(argv: Seq[String]): Args = {
    def loop(rest: List[String], acc: Args): Args = rest match {
      case Nil => acc
      case "--root" :: v :: t => loop(t, acc.copy(root = Some(v)))
      case "--start" :: v :: t => loop(t, acc.copy(start = v))
      case "--end" :: v :: t => loop(t, acc.copy(end = v))
      case "--save-raw" :: t => loop(t, acc.copy(saveRaw = true))
      case "--snapshot" :: v :: t => loop(t, acc.copy(snapshot = Some(v)))
      case "--jdbc-url" :: v :: t => loop(t, acc.copy(jdbcUrl = Some(v)))
      case "--jdbc-opt" :: v :: t if v.contains('=') =>
        val Array(k, value) = v.split("=", 2)
        loop(t, acc.copy(jdbcOpts = acc.jdbcOpts + (k -> value)))
      case "--fred-url" :: v :: t => loop(t, acc.copy(fredUrl = Some(v)))
      case "--stub-macro" :: t => loop(t, acc.copy(stubMacro = true))
      case "--partition-panels" :: t => loop(t, acc.copy(partitionPanels = true))
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown or incomplete flag: $other")
    }
    val a = loop(argv.toList, Args())
    require(a.snapshot.isDefined ^ a.jdbcUrl.isDefined,
      "exactly one of --snapshot <dir> or --jdbc-url <url> is required")
    a
  }

  def main(argv: Array[String]): Unit = {
    val args = parseArgs(argv.toSeq)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-ingest")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val equity = (args.snapshot, args.jdbcUrl) match {
        case (Some(dir), _) => new SnapshotEquitySource(spark, dir)
        case (_, Some(url)) => new JdbcEquitySource(spark, url, args.jdbcOpts)
        case _ => throw new IllegalStateException("unreachable: parseArgs requires a source")
      }
      val macroSrc =
        if (args.stubMacro) new StubMacroSource(spark)
        else args.fredUrl.map(u => new HttpMacroSource(spark, u))
          .getOrElse(new HttpMacroSource(spark))
      val root = Config.resolveDataRoot(args.root).toString
      val result = Ingest.run(spark, equity, macroSrc, root,
        args.start, args.end, saveRaw = args.saveRaw,
        partitionPanels = args.partitionPanels)
      println(s"ingest complete: ${result.root}")
      result.steps.foreach { case (name, secs) =>
        println(f"  $name%-28s $secs%6.2f s")
      }
    } finally spark.stop()
  }
}
