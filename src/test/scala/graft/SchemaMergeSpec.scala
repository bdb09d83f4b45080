package graft

import org.apache.spark.sql.functions._
import graft.queries.Text

/** Schema evolution (pipeline_schema_merge): the widened epoch and the
  * original epoch must serve as ONE relation under the mergeSchema
  * read, with the old epoch's missing column surfacing as NULL — and
  * nothing else about the old rows changed.
  */
class SchemaMergeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("evolved read: old epoch nulls the new column, both epochs keep every row") {
    val audit = Text.pipelineSchemaMerge(spark, dir).collect()
      .map(r => r.getBoolean(0) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("tok_sum")))).toMap
    assert(audit.keySet == Set(true, false))
    val base = Tables(spark, dir, "documents")
    val (nOld, nNew) = (base.filter(col("doc_id") % 5 =!= 0).count(),
      base.filter(col("doc_id") % 5 === 0).count())
    assert(audit(false)._1 == nOld && audit(true)._1 == nNew,
      s"epoch row counts drifted: $audit")
    // the old epoch's extension is ALL null — its sum is exactly zero,
    // while the widened epoch's is positive (texts are non-empty)
    assert(audit(false)._2 == 0L && audit(true)._2 > 0L, s"got $audit")
  }
}
