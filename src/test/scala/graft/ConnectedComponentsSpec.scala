package graft

import org.apache.spark.sql.functions._

/** [[ConnectedComponents]] (alternating large-star/small-star) against an
  * independent driver-side union-find, on shapes that stress the
  * contraction: long chains (worst case for label propagation — the
  * algorithm must converge in O(log² n) rounds, not O(n)), stars,
  * multi-component forests, duplicate/self-loop edges, and a seeded
  * random graph.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def unionFind(n: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  private def runCc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = spark.createDataFrame(edges).toDF("src", "dst")
    ConnectedComponents.run(df, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.filter { n =>
      edges.exists(e => e._1 != e._2 && (e._1 == n || e._2 == n))
    }
    val expected = unionFind(nodes, edges.filter(e => e._1 != e._2))
    assert(runCc(edges) == expected)
  }

  test("chain graph contracts to its minimum (label propagation's worst case)") {
    check((1L until 64L).map(i => (i, i + 1)))
  }

  test("reversed chain and shuffled orientations give the same components") {
    check((1L until 64L).map(i => (i + 1, i)).reverse)
    check((1L until 64L).map(i => if (i % 2 == 0) (i, i + 1) else (i + 1, i)))
  }

  test("forest of disjoint components keeps components apart") {
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L)))
  }

  test("self-loops and duplicate edges are tolerated, isolated nodes dropped") {
    val got = runCc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)))
    // 5 only ever appears in a self-loop → not a member of any edge set
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("empty edge set yields an empty result") {
    val empty = spark.createDataFrame(
      Seq.empty[(Long, Long)]).toDF("src", "dst")
    assert(ConnectedComponents.run(empty, "src", "dst")
      .collect().isEmpty)
  }

  test("seeded random graph matches union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
    check(edges)
  }

  test("maxIter exhaustion fails loudly instead of returning wrong labels") {
    // a chain needs at least one contraction round; maxIter = 0 must
    // throw, never silently read components off the raw edge set
    val chain = spark.createDataFrame((1L until 10L).map(i => (i, i + 1)))
      .toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(chain, "src", "dst", maxIter = 0)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("high-degree hub (power-law shape) needs no per-node neighborhood buffer") {
    // star with 5,000 leaves — the shape that kills collect_list-based CC
    check((1L to 5000L).map(i => (0L, i)))
  }

  test("incremental CC: planted delta merges, joins, creates and skips clusters correctly") {
    val spark2 = spark
    import spark2.implicits._
    def toks(p: String) = (1 to 20).map(i => s"$p$i").mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-ccinc").toString
    // base (doc_id % 5 != 0): {1,2} cluster, 3 and 4 singletons
    // delta (doc_id % 5 == 0): 10 joins {1,2}; 5 pairs with base
    // singleton 3; 15 unique (absent); {20,30} a delta-only cluster
    Seq(
      (1L, toks("a")), (2L, toks("a") + " b1"), (3L, toks("u")),
      (4L, toks("v")),
      (10L, toks("a") + " c1"), (5L, toks("u") + " d1"),
      (15L, toks("w")), (20L, toks("x")), (30L, toks("x") + " e1"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("src1"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.queries.Text.ddCcIncremental(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("component"), r.getAs[Long]("cluster_size"))).toMap
    assert(rows.keySet == Set(1L, 2L, 10L, 3L, 5L, 20L, 30L),
      s"singletons 4/15 must be absent, everyone else labeled: ${rows.keySet}")
    assert(Seq(1L, 2L, 10L).forall(rows(_) == ((1L, 3L))),
      s"delta doc 10 must merge into the base {1,2} cluster: $rows")
    assert(Seq(3L, 5L).forall(rows(_) == ((3L, 2L))),
      s"delta doc 5 must pull base singleton 3 into a new cluster: $rows")
    assert(Seq(20L, 30L).forall(rows(_) == ((20L, 2L))),
      s"the delta-only pair must form its own cluster: $rows")
  }

  test("streamed delta edges + standing labels reproduce the batch incremental relabel") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.streaming.StreamingOps
    import graft.queries.Text
    val dir = "/root/testdata/sf0.001"
    val streamDir = java.nio.file.Files
      .createTempDirectory("graft-cc-stream").toString
    Tables(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(Text.incrementalDeltaMod)) === 0)
      .write.mode("overwrite").parquet(s"$streamDir/delta")
    val (bands, shingles) = StreamingOps.ccBaseSides(spark, dir)
    val q = StreamingOps.ccDeltaBaseEdges(
        StreamingOps.readDocumentsStream(spark, s"$streamDir/delta"),
        bands, shingles)
      .writeStream.format("memory").queryName("cc_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "stream did not drain within timeout")
    val base = Text.ensureCcBase(spark, dir)
    val star = spark.read.parquet(s"$base/labels")
      .select(col("id").as("id_a"), col("component").as("id_b"))
    val streamed = spark.table("cc_stream").distinct()
      .select(col("delta_id").as("id_a"), col("base_id").as("id_b"))
    val within = Text.ccWithinDeltaEdges(spark, dir)
    val comp = ConnectedComponents.run(
      star.unionByName(streamed).unionByName(within), "id_a", "id_b")
    val sizes = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
    val fromStream = comp.select(col("component"), col("id").as("doc_id"))
      .join(sizes, "component")
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"),
        Seq("doc_id"))
      .select("component", "doc_id", "lang", "cluster_size")
      .orderBy("component", "doc_id").collect()
    assert(fromStream.toSeq ==
      Text.ddCcIncremental(spark, dir).collect().toSeq,
      "streamed edges + contraction must equal the batch incremental row for row")
  }

  test("incremental CC equals the full recompute and never rewrites the standing labels") {
    val dir = "/root/testdata/sf0.001"
    val inc = graft.queries.Text.ddCcIncremental(spark, dir)
    assert(inc.collect().toSeq ==
      graft.queries.Text.ddDupClusters(spark, dir).collect().toSeq,
      "star(base) + delta edges must reproduce the full contraction row for row")
    val base = graft.queries.Text.ensureCcBase(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$base/labels/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    graft.queries.Text.ddCcIncremental(spark, dir).collect()
    graft.queries.Text.ddCcIncremental(spark, dir).collect()
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "two incremental serves must not rewrite the standing labels")
  }
}
