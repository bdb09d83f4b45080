package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal plumbing specs: binary payloads, typed metadata, frame
  * slicing, deterministic stub decode.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    .filter(col("doc_id") < 20)

  test("fromDocuments produces binary payloads with typed metadata") {
    val media = Multimodal.fromDocuments(docs)
    assert(media.schema("media").dataType.typeName == "binary")
    val m = media.orderBy("media_id").collect().head
    val meta = m.getStruct(m.fieldIndex("meta"))
    assert(meta.getAs[String]("format") == "fake/raw")
    assert(meta.getAs[Int]("width") >= 64 && meta.getAs[Int]("n_frames") == 4)
  }

  test("mm oracle precondition: doc_id < 100 texts are pure ASCII") {
    // The mm_decode_features / mm_frame_features DuckDB oracles equate
    // character-based length()/substring() with the Spark side's
    // byte-based semantics — valid only while the media-source docs are
    // ASCII. Enforce the precondition mechanically so a future testdata
    // change fails HERE with a clear message, not as an opaque hash
    // mismatch in the driver gate.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val nonAscii = Tables(spark, s"/root/testdata/$sf", "documents")
        .filter(org.apache.spark.sql.functions.col("doc_id") < 100)
        .filter("length(text) != octet_length(text)").count()
      assert(nonAscii == 0,
        s"$sf has $nonAscii non-ASCII docs under doc_id<100 — the mm oracles' char==byte assumption breaks")
    }
  }

  test("decodeStub is deterministic and reads real bytes") {
    val a = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
      .orderBy("media_id").collect()
    val b = Multimodal.decodeStub(Multimodal.fromDocuments(docs))
      .orderBy("media_id").collect()
    assert(a.toSeq == b.toSeq) // same input → same features
    val text = docs.orderBy("doc_id").collect().head.getAs[String]("text")
    val first = a.head
    assert(first.getAs[Int]("byte_len") == text.getBytes("UTF-8").length)
    // header = hex of the first 4 payload bytes
    assert(first.getAs[String]("header") ==
      text.getBytes("UTF-8").take(4).map("%02X".format(_)).mkString)
  }

  test("frameSample emits n_frames rows covering every payload byte") {
    val media = Multimodal.fromDocuments(docs)
    val frames = Multimodal.frameSample(media)
    val perDoc = frames.groupBy("media_id")
      .agg(count(lit(1)).as("n"), sum("frame_bytes").as("bytes"))
      .join(media.select(col("media_id"), length(col("media")).as("len")), "media_id")
      .collect()
    assert(perDoc.forall(_.getAs[Long]("n") == 4L))
    assert(perDoc.forall(r => r.getAs[Long]("bytes") == r.getAs[Int]("len").toLong))
  }

  test("resizeStub truncates payload and rewrites dimensions") {
    val media = Multimodal.fromDocuments(docs)
    val resized = Multimodal.resizeStub(media, 8, 8)
    val r = resized.select(length(col("media")).as("len"),
      col("meta.width"), col("meta.height")).collect()
    assert(r.forall(_.getAs[Int]("len") <= 64))
    assert(r.forall(x => x.getAs[Int]("width") == 8 && x.getAs[Int]("height") == 8))
  }

  test("frameDedup: a byte-identical later media loses every frame, keep-first") {
    val spark2 = spark
    import spark2.implicits._
    // media 1 and 5 share identical payloads -> media 5's 4 frames are
    // all duplicates; media 9 is unique and keeps everything
    val planted = Seq(
      (1L, "aaaa bbbb cccc dddd"),
      (5L, "aaaa bbbb cccc dddd"),
      (9L, "eeee ffff gggg hhhh"))
      .toDF("doc_id", "text")
    val r = Multimodal.frameDedup(Multimodal.fromDocuments(planted)).collect()
      .map(x => x.getAs[Long]("media_id") ->
        (x.getAs[Long]("n_frames"), x.getAs[Long]("n_dup_frames"),
          x.getAs[Long]("dup_bytes"))).toMap
    assert(r(1L) == ((4L, 0L, 0L)), "first occurrence keeps all frames")
    assert(r(5L)._1 == 4L && r(5L)._2 == 4L, "identical later media loses all")
    assert(r(5L)._3 == 19L, "reclaimed bytes = the full payload")
    assert(r(9L) == ((4L, 0L, 0L)))
  }

  test("simhashDedup: exact dups hit hamming 0, near-dups stay close, distinct media far") {
    val spark2 = spark
    import spark2.implicits._
    val base = "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj kkkk llll"
    val planted = Seq(
      (1L, base),
      (2L, base),                              // exact dup -> p0 pair
      (3L, base.replace("llll", "lxll")),      // near dup -> low hamming
      (9L, "zz11 yy22 xx33 ww44 vv55 uu66 tt77 ss88 rr99 qq00 pp12 oo34"))
      .toDF("doc_id", "text")
    val r = Multimodal.simhashDedup(Multimodal.fromDocuments(planted))
      .collect().head
    assert(r.getAs[Long]("n_media") == 4L)
    // the exact pair shares a signature: intra-cluster arithmetic fires
    assert(r.getAs[Long]("n_block_pairs") >= 1L)
    assert(r.getAs[Long]("n_close_pairs") >= 1L)
    assert(r.getAs[Int]("min_hamming") == 0,
      "byte-identical payloads must collide at hamming 0")
    // the near-dup lands in the same block as the base (one shingle of
    // twelve changed -> few vote flips) and within the close threshold
    assert(r.getAs[Long]("n_close_pairs") >= 3L,
      s"near-dup payloads should clear the hamming threshold: $r")
  }

  test("crossModalDedup: the vector path finds near-dup media BOTH digest paths miss") {
    val dir = "/root/testdata/sf0.001"
    val r = Multimodal.crossModalDedup(spark, dir).collect()
    assert(r.nonEmpty, "cross-modal probe returned no media pairs")
    // the catch: semantic near-dup pairs (cosine over the semdedup tau)
    // that share ZERO exact frame digests — the exact path is blind
    val caught = r.filter(x => x.getAs[Long]("n_close_links") > 0 &&
      x.getAs[Long]("n_shared_digests") == 0)
    info(s"vector-only near-dup media pairs: ${caught.length} of ${r.length}")
    assert(caught.nonEmpty,
      "no vector-found pair was invisible to exact frame digests")
    // and the simhash path misses them too: the best-cosine caught pair's
    // signatures are FAR apart (payloads are unrelated byte strings even
    // though their frame embeddings are neighbors — the re-encode model)
    val best = caught.maxBy(_.getAs[Double]("best_cosine"))
    val (ma, mb) = (best.getAs[Long]("media_a"), best.getAs[Long]("media_b"))
    val sigs = Multimodal.simhashSignatures(Multimodal.fromDocuments(
        Tables(spark, dir, "documents").filter(col("doc_id").isin(ma, mb))))
      .collect().map(x => x.getAs[Long]("media_id") -> x.getAs[Long]("simhash"))
      .toMap
    val hamming = java.lang.Long.bitCount(sigs(ma) ^ sigs(mb))
    info(s"pair ($ma,$mb) best_cosine=${best.getAs[Double]("best_cosine")} simhash hamming=$hamming")
    assert(hamming > Multimodal.simhashHammingClose,
      s"pair ($ma,$mb) would have been caught by simhash (hamming $hamming)")
  }

  test("frameDedup on the natural corpus: invariants hold; near-dups do NOT collide") {
    // the corpus's planted document duplicates are NEAR-duplicates, so
    // their quarter-payload byte slices never coincide exactly — exact
    // frame dedup correctly reports zero (which is WHY video pipelines
    // hash frames perceptually; a perceptual digest slots into the same
    // frame_md5 column). The mechanism is pinned by the planted
    // byte-identical test above; here the invariants and the
    // deliberate near-dup blindness are what must hold.
    val r = Multimodal.frameDedup(Multimodal.fromDocuments(
      Tables(spark, "/root/testdata/sf0.001", "documents"))).collect()
    assert(r.length == 500)
    r.foreach { x =>
      assert(x.getAs[Long]("n_frames") == 4L)
      assert(x.getAs[Long]("n_dup_frames") <= x.getAs[Long]("n_frames"))
      if (x.getAs[Long]("n_dup_frames") == 0)
        assert(x.getAs[Long]("dup_bytes") == 0)
    }
  }

  test("alignShingles (array-native, streaming-safe) equals the batch window shingles on the natural corpus") {
    import org.apache.spark.sql.expressions.Window
    val media = Multimodal.fromDocuments(
      Tables(spark, "/root/testdata/sf0.001", "documents"),
      Multimodal.alignFrames)
    val w = Window.partitionBy("media_id").orderBy("frame_idx")
    val batch = Multimodal.frameSample(media)
      .filter(col("frame_bytes") > 0)
      .withColumn("f1", lead("frame_md5", 1).over(w))
      .withColumn("f2", lead("frame_md5", 2).over(w))
      .filter(col("f2").isNotNull)
      .select(col("media_id"),
        md5(concat_ws(":", col("frame_md5"), col("f1"), col("f2"))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val arr = Multimodal.alignShingles(media)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(arr == batch,
      "array-native shingles drifted from the windowed batch definition")
    assert(arr.nonEmpty)
  }

  test("align-index refresh: merged row is the exact XOR/sum composition and the standing tables are served") {
    val dir = "/root/testdata/sf0.001"
    val base = Multimodal.ensureAlignIndex(spark, dir)
    val marker = new org.apache.hadoop.fs.Path(s"$base/shingles/_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t0 = fs.getFileStatus(marker).getModificationTime
    val rows = Multimodal.mmAlignRefresh(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("base", "delta", "merged"))
    val (b, d, m) = (rows("base"), rows("delta"), rows("merged"))
    Seq("n_media", "n_frames", "n_shingles").foreach { c =>
      assert(m.getAs[Long](c) == b.getAs[Long](c) + d.getAs[Long](c), c)
    }
    Seq("frame_xor", "shingle_xor").foreach { c =>
      assert(m.getAs[Long](c) == (b.getAs[Long](c) ^ d.getAs[Long](c)), c)
    }
    assert(b.getAs[Long]("n_media") > 0 && d.getAs[Long]("n_media") > 0)
    assert(fs.getFileStatus(marker).getModificationTime == t0,
      "a refresh audit must serve the standing tables, not rebuild them")
  }

  test("temporalAlign: a trimmed re-cut aligns at its shift, scattered shared frames do not") {
    val spark2 = spark
    import spark2.implicits._
    // 16 frames of 8 chars each (128-char payloads, fs = 8).
    // Media 1 = blocks B0..B15. Media 2 = a re-cut dropping the first
    // two blocks and appending two new ones: its frame j holds B(j+2)
    // for j = 0..13 — matches at offset ia−ib = +2, contiguous run 14.
    // Media 3 shares only B0 and B9 at scattered positions (runs of 1,
    // below the minimum run — must NOT pair with anyone).
    def b(i: Int) = f"block$i%03d" // 8 chars
    val m1 = (0 to 15).map(b).mkString
    val m2 = ((2 to 15).map(b) ++ Seq("newblk01", "newblk02")).mkString
    val m3 = (Seq(b(0)) ++ (100 to 107).map(b) ++ Seq(b(9)) ++
      (108 to 113).map(b)).mkString
    assert(Seq(m1, m2, m3).forall(_.length == 128))
    val media = graft.multimodal.Multimodal.fromDocuments(
      Seq((1L, m1), (2L, m2), (3L, m3)).toDF("doc_id", "text"),
      graft.multimodal.Multimodal.alignFrames)
    val rows = graft.multimodal.Multimodal.temporalAlign(media).collect()
    assert(rows.length == 1,
      s"exactly the re-cut pair must survive: ${rows.toSeq}")
    val r = rows.head
    assert(r.getAs[Long]("media_a") == 1L && r.getAs[Long]("media_b") == 2L)
    assert(r.getAs[Long]("offset") == 2L,
      s"the two-block trim must align at offset 2: $r")
    assert(r.getAs[Long]("longest_run") == 14L &&
      r.getAs[Long]("n_aligned") == 14L, s"run must span the shared cut: $r")
    assert(r.getAs[Double]("aligned_frac") == 14.0 / 16.0)
  }

  test("sceneCuts: scenes partition the frame grid; equal adjacent shots merge") {
    val spark2 = spark
    import spark2.implicits._
    val M = graft.multimodal.Multimodal
    // 4 source slices of 8 chars each (32-char payloads, fs = 8):
    // media 1 has four distinct shots; media 2 repeats its middle
    // slices (s1 == s2) so the cut detector must MERGE shots 1 and 2
    // into one 8-frame scene.
    val m1 = "shot000ashot001bshot002cshot003d"
    val m2 = "shot100asameshotsameshotshot103d"
    val media = M.fromDocuments(
      Seq((1L, m1), (2L, m2)).toDF("doc_id", "text"))
    val rows = M.sceneCuts(media).collect()
    val byMedia = rows.groupBy(_.getAs[Long]("media_id"))
    // scenes tile 0..15 contiguously for every media
    byMedia.foreach { case (id, sc) =>
      val sorted = sc.sortBy(_.getAs[Long]("scene_idx"))
      assert(sorted.head.getAs[Int]("start_frame") == 0)
      assert(sorted.last.getAs[Int]("end_frame") ==
        M.sceneSrcSlices * M.sceneRepeat - 1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Int]("start_frame") ==
            a.getAs[Int]("end_frame") + 1, s"media $id scenes not contiguous")
        case _ =>
      }
      assert(sorted.map(_.getAs[Long]("scene_frames")).sum ==
        M.sceneSrcSlices * M.sceneRepeat)
    }
    assert(byMedia(1L).length == 4, "distinct shots must each cut")
    val s2 = byMedia(2L).sortBy(_.getAs[Long]("scene_idx"))
    assert(s2.length == 3, s"equal adjacent shots must merge: ${s2.toSeq}")
    assert(s2(1).getAs[Long]("scene_frames") == 2L * M.sceneRepeat,
      "the merged scene must span both repeated shots")
  }
}
