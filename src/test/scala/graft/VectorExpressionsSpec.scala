package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{GraftExtensions, VectorFunctions}

/** The codegen'd float_dot expression must agree bit-for-bit with the
  * interpreted higher-order-function fold, handle nulls, and register
  * through both the lazy path and SparkSessionExtensions.
  */
class VectorExpressionsSpec extends SparkSpec {

  test("float_dot equals the interpreted fold bit-for-bit") {
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = emb.as("a").filter("vec_id < 20")
    val b = emb.as("b").filter("vec_id >= 20 AND vec_id < 40")
    val pairs = a.crossJoin(b)
    val both = pairs.select(
      expr("float_dot(a.embedding, b.embedding)").as("fast"),
      expr("aggregate(sequence(0, 63), 0D, (acc, i) -> acc + CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))")
        .as("fold")).collect()
    assert(both.length == 400)
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("float_l2 equals the interpreted squared-L2 fold bit-for-bit") {
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    // centroid side is array<double> — the actual call shape (frozen/
    // retrained centroids are double arrays)
    val a = emb.as("a").filter("vec_id < 20")
    val b = emb.filter("vec_id >= 20 AND vec_id < 40").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid")).as("b")
    val both = a.crossJoin(b).select(
      expr("float_l2(a.embedding, b.centroid)").as("fast"),
      expr("""aggregate(sequence(0, 63), 0D, (a2, i2) ->
          a2 + (CAST(a.embedding[i2] AS DOUBLE) - b.centroid[i2]) * (CAST(a.embedding[i2] AS DOUBLE) - b.centroid[i2]))""")
        .as("fold")).collect()
    assert(both.length == 400)
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }

  test("float_l2 yields null on length mismatch and null elements, never a partial sum") {
    VectorFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      """SELECT
        |  float_l2(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS mismatch,
        |  float_l2(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS nullelem,
        |  float_l2(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS DOUBLE))) AS nullinput,
        |  float_l2(array(CAST(3.0 AS FLOAT), CAST(1.0 AS FLOAT)), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS good
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2))
    assert(rows.getDouble(3) == 5.0)
  }

  test("float_dot_fd equals the interpreted mixed-type dot fold bit-for-bit") {
    // r16-opt: the IVF coarse-assignment hot loop (ivfCosC — k
    // evaluations per corpus row) moved from the CodegenFallback fold to
    // the codegen'd FloatDoubleDot. Same left-to-right accumulation or
    // every IVF-family oracle hash drifts.
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val a = emb.as("a").filter("vec_id < 20")
    val b = emb.filter("vec_id >= 20 AND vec_id < 40").select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("centroid")).as("b")
    val both = a.crossJoin(b).select(
      expr("float_dot_fd(a.embedding, b.centroid)").as("fast"),
      expr("aggregate(sequence(0, 63), 0D, (acc, i) -> acc + CAST(a.embedding[i] AS DOUBLE) * b.centroid[i])")
        .as("fold")).collect()
    assert(both.length == 400)
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
    val edge = spark.sql(
      """SELECT
        |  float_dot_fd(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS mismatch,
        |  float_dot_fd(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE))) AS nullelem,
        |  float_dot_fd(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS DOUBLE))) AS nullinput,
        |  float_dot_fd(array(CAST(3.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), array(CAST(2.0 AS DOUBLE), CAST(5.0 AS DOUBLE))) AS dblgood
        |""".stripMargin).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    assert(edge.getDouble(3) == 11.0)
  }

  test("float_l2_sub equals the interpreted sliced fold bit-for-bit, float and double vectors") {
    // r16-opt: the PQ assignment hot loop — m·k evaluations per corpus
    // row in every PQ train/encode — moved from the CodegenFallback
    // aggregate(...) fold to the codegen'd FloatDoubleL2Sub. Same
    // left-to-right accumulation per slice or the PQ family's oracle
    // hashes drift. Exercises BOTH vector element types (float corpus
    // embeddings; double residual/rotated frames) and a column offset
    // (the `s * pqSubDims` encode shape).
    VectorFunctions.ensureRegistered(spark)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cents = emb.filter("vec_id >= 20 AND vec_id < 28")
      .select(col("vec_id").as("cid"),
        explode(expr("sequence(0, 3)")).as("s"), col("embedding"))
      .select(col("s"), col("cid"),
        expr("transform(sequence(0, 15), i -> CAST(embedding[i + s * 16] AS DOUBLE))")
          .as("centroid")).as("b")
    for (toDouble <- Seq(false, true)) {
      val a = (if (toDouble)
          emb.select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
        else emb).as("a").filter("vec_id < 20")
      val both = a.crossJoin(cents).select(
        expr("float_l2_sub(a.embedding, b.centroid, b.s * 16)").as("fast"),
        expr("""aggregate(sequence(0, 15), 0D, (a2, i2) ->
            a2 + (CAST(a.embedding[i2 + (b.s * 16)] AS DOUBLE) - b.centroid[i2]) * (CAST(a.embedding[i2 + (b.s * 16)] AS DOUBLE) - b.centroid[i2]))""")
          .as("fold")).collect()
      assert(both.length == 20 * 32)
      assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
    }
  }

  test("float_l2_sub null handling: out-of-range slice, null element, null input") {
    VectorFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      """SELECT
        |  float_l2_sub(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), 0) AS short,
        |  float_l2_sub(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(1.0 AS DOUBLE)), 2) AS past,
        |  float_l2_sub(array(CAST(1.0 AS FLOAT), NULL), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), 0) AS nullelem,
        |  float_l2_sub(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS DOUBLE)), 0) AS nullinput,
        |  float_l2_sub(array(CAST(9.0 AS FLOAT), CAST(3.0 AS FLOAT), CAST(1.0 AS FLOAT)), array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)), 1) AS good
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1) && rows.isNullAt(2) &&
      rows.isNullAt(3))
    assert(rows.getDouble(4) == 5.0)
  }

  test("corr_moments5 equals the five interpreted moment folds bit-for-bit") {
    // r16-opt: w7/w11's five per-row CodegenFallback folds became one
    // codegen'd five-accumulator loop. Each sum's addition order must
    // match its standalone fold exactly or the w-family hashes drift.
    // Frames are built like the real callers': windowed collect_lists
    // of exact-descale doubles.
    VectorFunctions.ensureRegistered(spark)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(expr("vec_id % 7")).orderBy("vec_id").rowsBetween(-29, 0)
    val fr = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"),
        expr("CAST(CAST(embedding[0] * 100 AS BIGINT) AS DOUBLE) / 100").as("x"),
        expr("CAST(CAST(embedding[1] * 100 AS BIGINT) AS DOUBLE) / 100").as("y"))
      .withColumn("fr", collect_list(struct(col("x"), col("y"))).over(w))
    val both = fr.select(
      expr("corr_moments5(fr)").as("m"),
      expr("aggregate(fr, 0D, (a, s) -> a + s.x)").as("sx"),
      expr("aggregate(fr, 0D, (a, s) -> a + s.y)").as("sy"),
      expr("aggregate(fr, 0D, (a, s) -> a + s.x * s.y)").as("sxy"),
      expr("aggregate(fr, 0D, (a, s) -> a + s.x * s.x)").as("sxx"),
      expr("aggregate(fr, 0D, (a, s) -> a + s.y * s.y)").as("syy")).collect()
    assert(both.length >= 100)
    both.foreach { r =>
      val m = r.getStruct(0)
      assert(m.getDouble(0) == r.getDouble(1) && m.getDouble(1) == r.getDouble(2)
        && m.getDouble(2) == r.getDouble(3) && m.getDouble(3) == r.getDouble(4)
        && m.getDouble(4) == r.getDouble(5))
    }
    // null semantics: null array -> NULL; null field -> NULL struct (the
    // documented whole-result deviation from per-sum fold nulling)
    val edge = spark.sql(
      """SELECT corr_moments5(CAST(NULL AS ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>)) AS n,
        |       corr_moments5(array(named_struct('x', 1.0D, 'y', CAST(NULL AS DOUBLE)))) AS nf,
        |       corr_moments5(array(named_struct('x', 3.0D, 'y', 4.0D))) AS ok
        |""".stripMargin).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1))
    val ok = edge.getStruct(2)
    assert(ok.getDouble(0) == 3.0 && ok.getDouble(1) == 4.0 &&
      ok.getDouble(2) == 12.0 && ok.getDouble(3) == 9.0 && ok.getDouble(4) == 16.0)
  }

  test("hadamard64 equals the interpreted rotation fold bit-for-bit") {
    // VERDICT r15 item 3: the OPQ rotation's 64²-flop-per-row fold is
    // now the codegen'd Hadamard64; every output element must carry the
    // EXACT double of the interpreted form (same ±v[j] accumulation
    // order, one /8.0) or the OPQ family's oracle hashes drift.
    VectorFunctions.ensureRegistered(spark)
    val v = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(expr("transform(embedding, x -> CAST(x AS DOUBLE) * 4.0D)")
        .as("embedding"))
    val both = v.select(
      expr("hadamard64(embedding)").as("fast"),
      expr(graft.queries.Similarity.opqRotFoldText("embedding")).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val fast = r.getSeq[Double](0)
      val fold = r.getSeq[Double](1)
      assert(fast.length == 64 && fast == fold)
    }
  }

  test("hadamard64 null handling: wrong length, null input, null element") {
    VectorFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      """SELECT hadamard64(CAST(array(1.0D, 2.0D) AS ARRAY<DOUBLE>)) AS short,
        |       hadamard64(CAST(NULL AS ARRAY<DOUBLE>)) AS nul
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }

  test("float_dot is null-intolerant: null input gives null, not garbage") {
    VectorFunctions.ensureRegistered(spark)
    val out = spark.sql(
      "SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))")
      .collect().head
    assert(out.isNullAt(0))
  }

  test("float_dot yields null on length mismatch and null elements, never a partial sum") {
    VectorFunctions.ensureRegistered(spark)
    val rows = spark.sql(
      """SELECT
        |  float_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(1 AS FLOAT))) AS mismatch,
        |  float_dot(array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(1 AS FLOAT), CAST(1 AS FLOAT))) AS nullelem
        |""".stripMargin).collect().head
    assert(rows.isNullAt(0), "length mismatch must be NULL")
    assert(rows.isNullAt(1), "null element must be NULL")
  }

  test("long_dot equals the interpreted zip_with fold and handles nulls") {
    VectorFunctions.ensureRegistered(spark)
    val quant = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT))")
        .as("qe"))
    val a = quant.as("a").filter("vec_id < 20")
    val b = quant.as("b").filter("vec_id >= 20 AND vec_id < 40")
    val both = a.crossJoin(b).select(
      expr("long_dot(a.qe, b.qe)").as("fast"),
      expr("aggregate(zip_with(a.qe, b.qe, (x, y) -> x * y), 0L, (acc, v) -> acc + v)")
        .as("fold")).collect()
    assert(both.length == 400)
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
    val edge = spark.sql(
      """SELECT long_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L)) AS n,
        |       long_dot(array(1L, 2L), array(1L)) AS mismatch,
        |       long_dot(array(1L, CAST(NULL AS BIGINT)), array(1L, 2L)) AS nullElem,
        |       long_dot(array(3L, -4L), array(5L, 7L)) AS ok
        |""".stripMargin).collect().head
    assert(edge.isNullAt(0) && edge.isNullAt(1) && edge.isNullAt(2))
    assert(edge.getLong(3) == -13L)
  }

  test("simhash64 equals the interpreted double-fold formulation") {
    VectorFunctions.ensureRegistered(spark)
    val both = Tables(spark, "/root/testdata/sf0.01", "documents")
      .filter(col("doc_id") < 200)
      .withColumn("hs", expr("transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"))
      .select(
        expr("simhash64(hs)").as("fast"),
        expr("""aggregate(sequence(0, 63), 0L, (acc, b) ->
                 acc + CASE WHEN aggregate(hs, 0L, (s, h) ->
                   s + CASE WHEN ((h >> b) & 1) = 1 THEN 1L ELSE -1L END) > 0
                 THEN shiftleft(1L, b) ELSE 0L END)""").as("fold"))
      .collect()
    assert(both.length == 200)
    assert(both.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("simhash64 null handling") {
    VectorFunctions.ensureRegistered(spark)
    val out = spark.sql(
      """SELECT simhash64(CAST(NULL AS ARRAY<BIGINT>)) AS a,
        |       simhash64(array(CAST(NULL AS BIGINT), 5L)) AS b,
        |       simhash64(array(CAST(0 AS BIGINT))) AS c""".stripMargin)
      .collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
    assert(out.getLong(2) == 0L) // all counters negative -> no bits set
  }

  test("vec_sum_slice equals the interpreted two-level-fold inner loop bit-for-bit") {
    VectorFunctions.ensureRegistered(spark)
    // the exact meanFold2 level-1 shape: vec_id-ordered buckets of
    // (vec_id, embedding) structs, summed per dimension slice — float
    // vectors, plus the sliced-offset case (the pqWarmBooks s * subDims)
    val emb = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
      .withColumn("_bkt", expr("vec_id div 7"))
      .groupBy("_bkt")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding"))))
        .as("_ms"))
    for (lo <- Seq(0, 16, 48); sub <- Seq(16, 8)) {
      val both = emb.select(
        expr(s"vec_sum_slice(_ms, $lo, $sub)").as("fast"),
        expr(
          s"""transform(sequence(0, ${sub - 1}), d ->
                aggregate(_ms, 0D, (acc, m) -> acc + CAST(m.embedding[d + ($lo)] AS DOUBLE)))""")
          .as("fold")).collect()
      assert(both.nonEmpty)
      assert(both.forall(r =>
        r.getSeq[Double](0) == r.getSeq[Double](1)),
        s"vec_sum_slice($lo, $sub) drifted from the interpreted fold")
    }
    // the level-2 shape: double-array partials
    val l2 = emb
      .withColumn("_ps", expr("vec_sum_slice(_ms, 0, 64)"))
      .groupBy()
      .agg(sort_array(collect_list(struct(col("_bkt"), col("_ps"))))
        .as("_parts"))
    val both2 = l2.select(
      expr("vec_sum_slice(_parts, 0, 64)").as("fast"),
      expr(
        """transform(sequence(0, 63), d ->
             aggregate(_parts, 0D, (acc, p) -> acc + p._ps[d]))""").as("fold"))
      .collect()
    assert(both2.forall(r => r.getSeq[Double](0) == r.getSeq[Double](1)))
    // null semantics: null array → null, null vec cell → null,
    // out-of-range slice → null (the float_l2_sub deviation: the ANSI
    // fold would throw)
    val nulls = spark.sql(
      """SELECT vec_sum_slice(CAST(NULL AS ARRAY<STRUCT<a: BIGINT, v: ARRAY<FLOAT>>>), 0, 2) AS a,
        |       vec_sum_slice(array(named_struct('a', 1L, 'v', array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)))), 0, 2) AS b,
        |       vec_sum_slice(array(named_struct('a', 1L, 'v', array(CAST(1.0 AS FLOAT)))), 0, 2) AS c
        |""".stripMargin).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1) && nulls.isNullAt(2))
  }

  test("ordered_sum_field equals the interpreted scalar fold bit-for-bit") {
    VectorFunctions.ensureRegistered(spark)
    val ds = Tables(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"),
        expr("CAST(vec_id AS DOUBLE) / 3.0 + float_dot(embedding, embedding)")
          .as("d"))
      .withColumn("_bkt", expr("vec_id div 11"))
      .groupBy("_bkt")
      .agg(sort_array(collect_list(struct(col("vec_id"), col("d"))))
        .as("_ds"))
    val both = ds.select(
      expr("ordered_sum_field(_ds)").as("fast"),
      expr("aggregate(_ds, 0D, (a, t) -> a + t.d)").as("fold")).collect()
    assert(both.nonEmpty)
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
    val nulls = spark.sql(
      """SELECT ordered_sum_field(CAST(NULL AS ARRAY<STRUCT<a: BIGINT, v: DOUBLE>>)) AS a,
        |       ordered_sum_field(array(named_struct('a', 1L, 'v', CAST(NULL AS DOUBLE)))) AS b,
        |       ordered_sum_field(CAST(array() AS ARRAY<STRUCT<a: BIGINT, v: DOUBLE>>)) AS c
        |""".stripMargin).collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    assert(nulls.getDouble(2) == 0.0)
  }

  test("every custom function resolves after idempotent registration") {
    // The production paths: lazy per-session registration (exercised
    // here, twice — must be idempotent) or GraftExtensions at session
    // build (same builders; injection exercised below). A fresh
    // withExtensions session can't be built inside the suite — the shared
    // SparkContext makes getOrCreate return the existing session.
    VectorFunctions.ensureRegistered(spark)
    VectorFunctions.ensureRegistered(spark)
    graft.functions.TextFunctions.ensureRegistered(spark)
    graft.functions.TextFunctions.ensureRegistered(spark)
    val row = spark.sql(
      """SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS fd,
        |       simhash64(array(CAST(0 AS BIGINT))) AS sh,
        |       size(minhash_bands(array('a','b','c','d'), 3, 16, 4)) AS mb,
        |       size(minhash_xx_bands(array('a','b','c','d'), 3, 16, 4)) AS mx,
        |       lsh_bucket(array(CAST(1.0 AS FLOAT)), 4) AS lb
        |""".stripMargin).collect().head
    assert(row.getDouble(0) == 4.0)
    assert(row.getInt(2) == 4 && row.getInt(3) == 4)
    // the extensions hook injects without error (it reuses the exact same
    // builders the lazy path just proved)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("Catalog registers views once per (session, dir) and on dir switch") {
    val dirA = "/root/testdata/sf0.001"
    val dirB = "/root/testdata/sf0.01"
    Catalog.registerAll(spark, dirA) // whatever state earlier suites left
    assert(!Catalog.registerAll(spark, dirA), "same dir must be a no-op")
    assert(Catalog.registerAll(spark, dirB), "dir switch must re-register")
    assert(Catalog.sql(spark, dirB, "SELECT count(*) AS n FROM region")
      .collect().head.getLong(0) > 0)
    assert(Catalog.registerAll(spark, dirA), "switch back must re-register")
  }
}
