package graft

import org.apache.spark.sql.functions._

import graft.sources.CorpusSource

/** JSONL corpus interchange: lossless round-trip against the parquet
  * documents table, and corrupt-line quarantine under the PERMISSIVE
  * contract (a crawled shard always contains broken lines; they must
  * land in the quarantine frame, never kill the read or leak nulls into
  * the clean frame).
  */
class CorpusSourceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("documents round-trip parquet -> JSONL -> parquet losslessly") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonl").toString
    try {
      val orig = Tables(spark, sf, "documents")
      CorpusSource.writeJsonl(orig, s"$tmp/docs", shards = 4)
      val (clean, corrupt) = CorpusSource.cleanAndCorrupt(
        CorpusSource.readJsonl(spark, s"$tmp/docs"))
      assert(corrupt.count() == 0)
      val a = orig.orderBy("doc_id").collect()
      val b = clean.orderBy("doc_id").collect()
      assert(a.length == b.length && a.nonEmpty)
      assert(a.zip(b).forall { case (x, y) => x == y })
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("malformed lines are quarantined, clean rows conform to the contract") {
    val tmp = java.nio.file.Files.createTempDirectory("jsonl-bad").toString
    try {
      val lines = Seq(
        """{"doc_id": 1, "text": "a b c", "lang": "en", "source": "s0", "n_chars": 5}""",
        """{"doc_id": 2, "text": "d e", "lang": "fr"}""", // missing cols -> nulls
        """{"doc_id": "not-a-number", "text": 7}""",      // type mismatch
        """this is not json at all""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/shard.jsonl"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      val (clean, corrupt) = CorpusSource.cleanAndCorrupt(
        CorpusSource.readJsonl(spark, s"$tmp/shard.jsonl"))
      val cleanRows = clean.orderBy("doc_id").collect()
      assert(cleanRows.length == 2)
      assert(cleanRows.map(_.getLong(0)).toSeq == Seq(1L, 2L))
      // partial doc conformed: missing columns are typed nulls
      assert(cleanRows(1).isNullAt(3) && cleanRows(1).isNullAt(4))
      // schema is the canonical contract, in order
      assert(clean.schema == CorpusSource.documentsSchema)
      val bad = corrupt.collect().map(_.getString(0))
      assert(bad.length == 2)
      assert(bad.exists(_.contains("not-a-number")) &&
        bad.exists(_.contains("not json")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("streaming JSONL reader parses and quarantines exactly like batch") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("jsonl-stream").toString
    try {
      val lines = Seq(
        """{"doc_id": 7, "text": "x y z", "lang": "de", "source": "s1", "n_chars": 5}""",
        """{"doc_id": 8, "text": "w v", "lang": "es", "source": "s2", "n_chars": 3}""",
        """broken { line""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$tmp/shard.jsonl"),
        String.join("\n", lines: _*).getBytes("UTF-8"))
      val (clean, corrupt) = CorpusSource.cleanAndCorrupt(
        CorpusSource.readJsonlStream(spark, tmp))
      val q1 = clean.writeStream.format("memory").queryName("jsonl_clean")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q1.awaitTermination(120000))
      val q2 = corrupt.writeStream.format("memory").queryName("jsonl_bad")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q2.awaitTermination(120000))
      val streamedClean = spark.table("jsonl_clean").orderBy("doc_id").collect()
      val (bClean, bBad) = CorpusSource.cleanAndCorrupt(
        CorpusSource.readJsonl(spark, tmp))
      assert(streamedClean.toSeq == bClean.orderBy("doc_id").collect().toSeq,
        "streamed clean rows must equal the batch parse row for row")
      assert(spark.table("jsonl_bad").collect().map(_.getString(0)).toSet ==
        bBad.collect().map(_.getString(0)).toSet)
      assert(streamedClean.length == 2 &&
        spark.table("jsonl_bad").count() == 1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
