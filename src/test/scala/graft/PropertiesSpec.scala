package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties for the crisp transform algebra
  * (SURVEY.md §5.3). Cases are drawn with a fixed seed (deterministic CI)
  * and evaluated in one Spark job per property — per-case Spark jobs would
  * be two orders of magnitude slower.
  */
class PropertiesSpec extends SparkSpec {

  import scala.jdk.CollectionConverters._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("delist compounding with dlret=0 is identity (up to one ulp)") {
    val rs = samples(Gen.chooseNum(-0.99, 5.0), 50)
    val rows = rs.zipWithIndex.map { case (r, i) =>
      Row(i.toLong, Timestamp.valueOf("2020-01-02 00:00:00"), "T", r)
    }
    val rets = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("asset_id", LongType),
        StructField("date", TimestampType), StructField("ticker", StringType),
        StructField("ret_1d", DoubleType))))
    val dl = spark.createDataFrame(
      rows.map(r => Row(r.getLong(0), r.getTimestamp(1), 0.0)).asJava,
      StructType(Seq(StructField("asset_id", LongType),
        StructField("date", TimestampType), StructField("dlret", DoubleType))))
    val out = Transforms.applyDelistReturns(rets, dl)
      .orderBy("asset_id").collect().map(_.getDouble(3))
    rs.zip(out).foreach { case (r, o) =>
      assert(math.abs(o - r) <= math.ulp(1.0 + math.abs(r)) * 2, s"r=$r o=$o")
    }
  }

  test("cusip normalization is idempotent and always <= 8 alnum chars") {
    val ss = samples(Gen.asciiPrintableStr, 100)
    val df = spark.createDataFrame(
      ss.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("c", StringType))))
    val once = df.select(col("id"), Transforms.normalizeCusip(col("c")).as("c"))
    val v1 = once.orderBy("id").collect().map(_.getString(1))
    val v2 = once.select(col("id"), Transforms.normalizeCusip(col("c")).as("c"))
      .orderBy("id").collect().map(_.getString(1))
    assert(v1.toSeq == v2.toSeq)
    assert(v1.forall(v => v.length <= 8 && v.forall(_.isLetterOrDigit)))
  }

  test("interval intersection is contained in both inputs") {
    val ts0 = Timestamp.valueOf("2000-01-01 00:00:00").getTime
    val day = 86400000L
    val genItv = for {
      a <- Gen.chooseNum(0L, 5000L); len <- Gen.chooseNum(0L, 2000L)
    } yield (new Timestamp(ts0 + a * day), new Timestamp(ts0 + (a + len) * day))
    val cases = samples(Gen.zip(genItv, genItv), 100)
    val rows = cases.zipWithIndex.map { case (((s1, e1), (s2, e2)), i) =>
      Row(i.toLong, s1, e1, s2, e2)
    }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("s1", TimestampType), StructField("e1", TimestampType),
        StructField("s2", TimestampType), StructField("e2", TimestampType))))
    val out = df.select(col("id"),
        greatest(col("s1"), col("s2")).as("s"), least(col("e1"), col("e2")).as("e"))
      .orderBy("id").collect()
    cases.zip(out).foreach { case (((s1, e1), (s2, e2)), r) =>
      val (s, e) = (r.getTimestamp(1), r.getTimestamp(2))
      if (!e.before(s)) { // non-empty intersection ⊆ both inputs
        assert(!s.before(s1) && !s.before(s2))
        assert(!e.after(e1) && !e.after(e2))
      }
    }
  }

  test("conformTo always yields exactly the canonical schema") {
    val gen = Gen.someOf(Seq("date", "ret", "factor_name", "extra_col"))
    samples(gen, 20).foreach { cols =>
      val fields = cols.map {
        case "date" => StructField("date", TimestampType)
        case "ret" => StructField("ret", DoubleType)
        case "factor_name" => StructField("factor_name", StringType)
        case other => StructField(other, StringType)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], StructType(fields.toSeq))
      val out = Schemas.conformTo(df, Schemas.styleFactorReturns)
      assert(out.schema == Schemas.styleFactorReturns)
    }
  }
}
