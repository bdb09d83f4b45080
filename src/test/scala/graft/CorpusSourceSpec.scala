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
}
