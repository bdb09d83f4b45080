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

  test("minhash_bands equals its HOF mirror on arbitrary unicode token arrays") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    // tokens: arbitrary unicode (no spaces — tokens are space-split by
    // construction), arrays spanning the short-edge cases around the
    // shingle width
    val genTok = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        Gen.alphaNumChar, Gen.oneOf('é', 'ß', '中', '文', 'λ', '€')))
        .map(_.mkString))
    val genArr = Gen.chooseNum(3, 40).flatMap(n => Gen.listOfN(n, genTok))
    val cases = samples(genArr, 60)
    val rows = cases.zipWithIndex.map { case (toks, i) => Row(i.toLong, toks) }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("toks", ArrayType(StringType)))))
    val both = df
      .withColumn("fast", expr("minhash_bands(toks, 3, 16, 4)"))
      .withColumn("sh", expr(
        "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
      .withColumn("hh", expr(
        """transform(sh, sg -> concat(
             md5(cast(sg AS BINARY)), md5(cast(concat(sg, '#') AS BINARY)),
             md5(cast(concat(sg, '##') AS BINARY)), md5(cast(concat(sg, '###') AS BINARY))))"""))
      .withColumn("slots", expr(
        "transform(sequence(0, 15), j -> array_min(transform(hh, x -> substring(x, 8*j + 1, 8))))"))
      .withColumn("fold", expr(
        "transform(sequence(0, 3), b -> md5(cast(concat(slots[4*b], slots[4*b+1], slots[4*b+2], slots[4*b+3]) AS BINARY)))"))
      .select("fast", "fold").collect()
    assert(both.length == 60)
    assert(both.forall(r => r.getSeq[String](0) == r.getSeq[String](1)))
  }

  test("ngram_stats matches a naive Scala count on arbitrary token arrays") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val genTok = Gen.chooseNum(1, 4).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar,
        Gen.oneOf('é', '中', 'λ'))).map(_.mkString))
    // small alphabet + short tokens → real collisions, so max_count > 1
    // paths are exercised; lengths span the short edges around n
    val genArr = Gen.chooseNum(0, 25).flatMap(n => Gen.listOfN(n, genTok))
    val cases = samples(genArr, 80)
    val rows = cases.zipWithIndex.map { case (toks, i) => Row(i.toLong, toks) }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("toks", ArrayType(StringType)))))
    for (n <- Seq(1, 2, 3)) {
      val got = df.withColumn("s", expr(s"ngram_stats(toks, $n)"))
        .orderBy("id").select("s.n_total", "s.n_distinct", "s.max_count")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = cases.map { toks =>
        val grams = toks.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.length)
        (grams.length.toLong, counts.size.toLong,
          if (counts.isEmpty) 0L else counts.values.max.toLong)
      }
      assert(got.toSeq == want, s"n=$n")
    }
  }

  test("minhash_xx_bands equals its HOF mirror on arbitrary token arrays") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val genTok = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.asciiPrintableChar).map(_.mkString))
    val genArr = Gen.chooseNum(3, 50).flatMap(n => Gen.listOfN(n, genTok))
    val cases = samples(genArr, 60)
    val rows = cases.zipWithIndex.map { case (toks, i) => Row(i.toLong, toks) }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("toks", ArrayType(StringType)))))
    val both = df
      .withColumn("fast", expr("minhash_xx_bands(toks, 3, 16, 4)"))
      .withColumn("th", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("shingles", expr(
        "transform(sequence(0, size(th) - 3), i -> xxhash64(th[i], th[i+1], th[i+2]))"))
      .withColumn("sig", expr(
        "transform(sequence(0, 15), j -> array_min(transform(shingles, s -> xxhash64(s, j))))"))
      .withColumn("fold", expr(
        "transform(sequence(0, 3), b -> xxhash64(sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))"))
      .select("fast", "fold").collect()
    assert(both.length == 60)
    assert(both.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("lsh_bucket equals the fold on arbitrary float vectors incl. specials") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    val genF = Gen.oneOf(
      Gen.chooseNum(-10.0f, 10.0f),
      Gen.oneOf(0.0f, -0.0f, Float.MaxValue, Float.MinPositiveValue,
        Float.PositiveInfinity, Float.NegativeInfinity))
    val genVec = Gen.chooseNum(1, 64).flatMap(n => Gen.listOfN(n, genF))
    val cases = samples(genVec, 60)
    val rows = cases.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("v", ArrayType(FloatType)))))
    val both = df
      .withColumn("fast", expr("lsh_bucket(v, 8)"))
      .withColumn("fold", expr(
        """aggregate(sequence(0, 7), 0L, (b, j) ->
             b + CASE WHEN (aggregate(sequence(0, size(v) - 1), 0D, (acc, d) ->
               acc + CAST(v[d] AS DOUBLE) * (CAST((j * 73 + d * 37) % 19 - 9 AS DOUBLE) / 9.0D))) > 0D
             THEN shiftleft(1L, j) ELSE 0L END)"""))
      .select("fast", "fold").collect()
    assert(both.length == 60)
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("lsh_bands equals the fold on arbitrary float vectors incl. specials") {
    graft.functions.TextFunctions.ensureRegistered(spark)
    // same generator family as the lsh_bucket property: finite range plus
    // the IEEE specials (±0, extremes, infinities — NaN-producing via
    // Inf × 0 plane terms is covered by the > 0D SQL semantics both sides
    // share); lengths below/at/above the 64-dim corpus shape
    val genF = Gen.oneOf(
      Gen.chooseNum(-10.0f, 10.0f),
      Gen.oneOf(0.0f, -0.0f, Float.MaxValue, Float.MinPositiveValue,
        Float.PositiveInfinity, Float.NegativeInfinity))
    // lengths straddle the 64-dim stride floor: above it the plane stride
    // must widen to size(v) or adjacent planes would share coefficients
    val genVec = Gen.chooseNum(1, 160).flatMap(n => Gen.listOfN(n, genF))
    val cases = samples(genVec, 60)
    val rows = cases.zipWithIndex.map { case (v, i) => Row(i.toLong, v) }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("v", ArrayType(FloatType)))))
    val both = df
      .withColumn("fast", expr("lsh_bands(v, 8, 3)"))
      .withColumn("fold", expr(
        """transform(sequence(0, 2), t ->
             aggregate(sequence(0, 7), 0L, (b, j) ->
               b + CASE WHEN aggregate(sequence(0, size(v) - 1), 0D, (acc, d) ->
                 acc + CAST(v[d] AS DOUBLE) *
                       CAST((CAST(t * 8 + j AS BIGINT) * greatest(64L, CAST(size(v) AS BIGINT)) + d) * 2654435761L % 1021L - 510L AS DOUBLE)
                         / 510.0D) > 0D
               THEN shiftleft(1L, j) ELSE 0L END))"""))
      .select("fast", "fold").collect()
    assert(both.length == 60)
    assert(both.forall(r => r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("md5-derived hash keys match an independent BigInteger reference") {
    // the two digest-to-integer primitives every oracle-exact hashed
    // operator leans on (decontamination keys, simhash token hashes,
    // shuffle-shard permutation, round-trip checksums) vs a reference
    // computed with MessageDigest + BigInteger — independent of both
    // Spark's conv() and the hand-built sign-fold
    val ss = samples(Gen.asciiPrintableStr.map(_.take(40)), 80)
      .filter(_.nonEmpty).distinct
    val df = spark.createDataFrame(
      ss.zipWithIndex.map { case (s, i) => Row(i.toLong, s) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("s", StringType))))
    val got = df
      .withColumn("hd", expr("md5(CAST(s AS BINARY))"))
      .withColumn("k60", expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)"))
      .withColumn("k64", expr(graft.queries.Text.md5SignedHash64Expr("hd")))
      .orderBy("id").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    ss.zip(got).foreach { case (s, r) =>
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      val want60 = new java.math.BigInteger(hex.take(15), 16).longValueExact()
      val want64 = new java.math.BigInteger(hex.take(16), 16).longValue() // wraps to signed
      assert(r.getAs[Long]("k60") == want60, s"k60 drift on '$s'")
      assert(r.getAs[Long]("k64") == want64, s"k64 drift on '$s'")
    }
  }

  test("paragraph chunking reassembles to the original token stream") {
    // the dd_paragraph / pipeline_prepare_corpus chunk expression must
    // partition the token stream exactly: concatenating the chunks in
    // pos order reproduces the document, and chunk sizes sum to size(toks)
    val genTok = Gen.chooseNum(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val genArr = Gen.chooseNum(1, 67).flatMap(n => Gen.listOfN(n, genTok))
    val cases = samples(genArr, 80)
    val rows = cases.zipWithIndex.map { case (toks, i) => Row(i.toLong, toks) }
    val df = spark.createDataFrame(rows.asJava,
      StructType(Seq(StructField("id", LongType),
        StructField("toks", ArrayType(StringType)))))
    val out = df.withColumn("chunks", expr(
        """transform(sequence(0, (size(toks) - 1) div 20),
          |  i -> concat_ws(' ', slice(toks, i * 20 + 1, 20)))""".stripMargin))
      .select(col("id"),
        concat_ws(" ", col("chunks")).as("rebuilt"),
        expr("aggregate(chunks, 0, (a, c) -> a + size(split(c, ' ')))").as("n"),
        concat_ws(" ", col("toks")).as("orig"),
        size(col("toks")).as("sz"))
      .orderBy("id").collect()
    assert(out.length == 80)
    out.foreach { r =>
      assert(r.getString(1) == r.getString(3), s"id=${r.getLong(0)} rebuilt != orig")
      assert(r.getInt(2) == r.getInt(4), s"id=${r.getLong(0)} token count drift")
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
