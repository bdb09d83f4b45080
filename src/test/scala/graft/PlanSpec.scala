package graft

/** Plan-shape assertions — the scale contract, checked mechanically:
  * filters/projections reach the scans, no query degenerates into a
  * cartesian product, aggregates keep their map-side partial phase, and
  * every oracle entry has a runnable query.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("scan pushdown: s1 filter and projection reach the parquet scan") {
    val plan = SparkEntry.queries("s1_scan_project")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      "date filter not pushed to scan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate:timestamp"),
      "projection not pruned at scan")
  }

  test("no query plans a cartesian product or broadcast nested loop") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian product")
      // broadcast(q) cross joins in sim_* are tiny fixed-size query sets;
      // anything else looping is a bug
      if (!name.startsWith("sim_"))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"$name plans a BNLJ")
    }
  }

  test("first-non-null dedups keep the round-robin spread before the partial aggregate") {
    // the r10->r11 j6/j7 fix: the md5-seq projection + partial min_by
    // run at cluster width, not pinned to the single-row-group scan's one
    // partition — removing Tables.spread regresses these 3-4x silently
    // (the SortAggregate strategy itself is the measured winner and
    // stays; see Transforms.firstNonNullBy's scaladoc)
    for (name <- Seq("j6_mapping_validity", "j7_detail_mapping",
        "a3_consensus_dedup", "a4_ratings_dedup", "a5_dividends_agg")) {
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("RoundRobinPartitioning"),
        s"$name lost its Tables.spread exchange")
    }
  }

  test("dd_paragraph keep-first is a partial-aggregated min, not a window") {
    // the skew argument in ddParagraph's scaladoc: a hot paragraph must be
    // collapsed map-side (partial_min per partition), never funneled into
    // one WindowExec hash partition with no pre-reduction
    val plan = SparkEntry.queries("dd_paragraph")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), "keep-first lost its map-side combine")
    assert(!plan.contains("Window"), "keep-first fell back to a window")
  }

  test("dd_substring shuffles carry digests, never text or token arrays") {
    // the scaladoc's scale claim made physical: stride-1 occurrences are
    // projected to (digest, doc_id, pos) BEFORE the first exchange, the
    // corpus count keeps its map-side partial phase, and the run/cover
    // windows partition per doc — no shuffle may move the text or toks
    // attribute
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("dd_substring")(spark, dir)
        .queryExecution.executedPlan
      // Tables.spread's RoundRobin re-bucketing legitimately moves raw
      // text (it exists to spread the single-row-group scan BEFORE the
      // CPU-heavy stride-1 hashing); the ban is on KEY-partitioned
      // exchanges — the digest/count/window shuffles above the carve.
      val offenders = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case e: ShuffleExchangeLike
            if e.output.exists(a => a.name == "text" || a.name == "toks") &&
              !e.outputPartitioning.toString.contains("RoundRobin") => e
      })
      assert(offenders.isEmpty,
        "text/toks attribute reached a key-partitioned shuffle:\n" +
          offenders.map(_.toString).mkString("\n"))
      assert(plan.toString.contains("partial_count"),
        "shingle occurrence count lost its map-side combine")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("mm_temporal_align shuffles carry digests, never media bytes or text") {
    // the scaladoc's scale claim made physical: frames are digested in
    // the narrow frameSample pass, so every key-partitioned exchange
    // (the per-media shingle window, the candidate join, the per-pair
    // island rollup) moves only (ids, 16-byte digests, offsets)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("mm_temporal_align")(spark, dir)
        .queryExecution.executedPlan
      val offenders = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case e: ShuffleExchangeLike
            if e.output.exists(a => a.name == "media" || a.name == "text" ||
              a.name == "frame") &&
              !e.outputPartitioning.toString.contains("RoundRobin") => e
      })
      assert(offenders.isEmpty,
        "media/text/frame bytes reached a key-partitioned shuffle:\n" +
          offenders.map(_.toString).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("entry flagship plan: no cartesian, keeps partial aggregation") {
    val plan = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("partial_sum"))
  }

  test("u5_set_ops computes both memberships from one orders scan") {
    // VERDICT r7 item 6: the INTERSECT/EXCEPT form planned two filtered
    // orders scans and two aggregate pairs; the membership-flag form must
    // read orders exactly once (customer is the only other scan).
    import org.apache.spark.sql.execution.FileSourceScanExec
    val plan = SparkEntry.queries("u5_set_ops")(spark, dir).queryExecution.executedPlan
    var ordersScans = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case f: FileSourceScanExec
            if f.schema.fieldNames.contains("o_orderdate") => ordersScans += 1
        case _ => ()
      }
      p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(s.plan)
        case other => other.children.foreach(walk)
      }
    }
    walk(plan)
    assert(ordersScans == 1, s"expected one orders scan, saw $ordersScans")
  }

  test("q1 aggregate keeps its map-side partial phase") {
    val plan = SparkEntry.queries("q1_pricing_summary")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), "no partial aggregation before shuffle")
  }

  test("custom expressions stay inside whole-stage codegen") {
    // The debug codegen listing enumerates WholeStageCodegen subtrees;
    // the hot projections built on graft's custom expressions must appear
    // inside one — a CodegenFallback there would re-introduce round 1's
    // interpreted per-row cost.
    import org.apache.spark.sql.execution.debug.codegenString
    // AQE wraps the plan and only inserts WholeStageCodegen per stage at
    // execution; disable it for this static plan probe (suites run
    // serialized, so the conf flip is safe).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((query, exprName) <- Seq(
          "sim_lsh_buckets" -> "lsh_bucket",
          "dd_ngram_jaccard" -> "minhash_bands",
          "tx_langid" -> "lexicon_hits")) {
        val cg = codegenString(
          SparkEntry.queries(query)(spark, dir).queryExecution.executedPlan)
        assert(cg.contains(exprName),
          s"$exprName not inside any WholeStageCodegen subtree of $query")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("decontamination pushes the source predicate into both scans") {
    val plan = SparkEntry.queries("tx_decontaminate")(spark, dir)
      .queryExecution.executedPlan.toString
    // both the benchmark side and the train side must prune at the scan —
    // at 100 TB these filters select partitions, not post-scan rows
    assert(plan.contains("EqualTo(source,src0)"),
      s"benchmark-source filter not pushed:\n$plan")
    assert(plan.contains("Not(EqualTo(source,src0))"),
      s"train-source filter not pushed:\n$plan")
  }

  test("repetition gate reads only the two columns it needs") {
    val plan = SparkEntry.queries("tx_repetition")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<text:string,lang:string>"),
      s"documents scan must prune to (text, lang):\n$plan")
  }

  test("pack-chunks window is sharded, not single-partition") {
    val plan = SparkEntry.queries("tx_pack_chunks")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), "packing must use a running-sum window")
    assert("""windowspecdefinition\(lang#\d+, shard#\d+L""".r
      .findFirstIn(plan).isDefined,
      s"window must partition by (lang, shard):\n$plan")
  }

  test("shuffle-shard plans bounded aggregation, never a global window") {
    // the permutation must stay distributed: per-shard heads come from a
    // map-side-combined bounded CollectTopK buffer, not a row_number over
    // a single-partition global sort (the round-1 anti-pattern this
    // operator's scaladoc forswears)
    val plan = SparkEntry.queries("tx_shuffle_shard")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global window crept in:\n$plan")
    assert(plan.toLowerCase.contains("partial_collect_top_k"),
      s"heads lost their map-side bounded buffer:\n$plan")
  }

  test("bucketed fact-fact join plans zero shuffle exchanges") {
    // q3_bucketed's reason to exist: both join inputs are 8-bucket tables
    // on the order key, so the join consumes the buckets' partitioning and
    // the aggregate (grouping keys ⊇ bucket key) reuses it — no Exchange
    // anywhere. The flat twin shuffles; at 100 TB that shuffle IS the job.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = SparkEntry.queries("q3_bucketed")(spark, dir)
    df.collect() // let AQE finalize the plan it actually ran
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      val self = p match { case _: ShuffleExchangeExec => 1; case _ => 0 }
      val below = p match {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case o => o.children.map(shuffles).sum
      }
      self + below
    }
    val n = shuffles(df.queryExecution.executedPlan)
    assert(n == 0, s"bucketed join still shuffles ($n exchanges):\n" +
      df.queryExecution.executedPlan.toString)
  }

  test("ev_sequence_kleene reuses one keyed shuffle end-to-end") {
    // The scaladoc's scale claim, pinned: the stream window (user_id),
    // the anchor group-by (user_id, grp — a superset of the clustering,
    // so HashPartitioning(user_id) satisfies it), the anchor window
    // (user_id) and the final per-user rollup all consume the SAME
    // hash exchange. Event rows cross the wire exactly once; the only
    // other exchange is the deterministic ORDER BY's range partition.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.{HashPartitioning, RangePartitioning}
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("ev_sequence_kleene")(spark, dir)
        .queryExecution.executedPlan
      val ex = plan.collect { case e: ShuffleExchangeExec => e }
      val hash = ex.filter(_.outputPartitioning.isInstanceOf[HashPartitioning])
      assert(hash.length == 1,
        s"expected ONE keyed shuffle, got ${hash.length}:\n$plan")
      val keys = hash.head.outputPartitioning
        .asInstanceOf[HashPartitioning].expressions.map(_.sql.toLowerCase)
      assert(keys.exists(_.contains("user_id")) && keys.length == 1,
        s"keyed shuffle must cluster on user_id alone: $keys")
      assert(ex.filterNot(hash.contains)
          .forall(_.outputPartitioning.isInstanceOf[RangePartitioning]),
        s"unexpected non-range extra exchange:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sim_ivf_ann shuffles never carry an embedding") {
    // VERDICT r6 item 2: the r6 plan ranked cells through a row_number
    // window over the emb×centroids product, so the window's shuffle
    // carried k vector-holding rows per corpus vector. The rework makes
    // cell assignment a pure projection; corpus vectors may reach the
    // scorer only through scans and the streamed side of broadcast joins.
    // Broadcasts (few centroids / few query vectors) are the design and
    // stay allowed — the ban is on float-vector attributes in SHUFFLES.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StructType}
    def hasFloatVec(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => et == FloatType || hasFloatVec(et)
      case st: StructType => st.fields.exists(f => hasFloatVec(f.dataType))
      case _ => false
    }
    // static plan probe: disable AQE so exchanges appear in one tree (the
    // codegen test's pattern; suites run serialized, conf flip is safe)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("sim_ivf_ann")(spark, dir)
        .queryExecution.executedPlan
      val offenders = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case e: ShuffleExchangeLike
            if e.output.exists(a => hasFloatVec(a.dataType)) => e
      })
      assert(offenders.isEmpty,
        s"float-vector attributes in shuffle exchange(s):\n" +
          offenders.map(_.toString).mkString("\n"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("indexed/PQ/deleted search shuffles never carry a vector") {
    // The PQ story IS the byte budget: the corpus moves as (vec_id, s,
    // code) / (qid, vec_id, dist) rows; embeddings reach the plans only
    // through scans and broadcasts (codebooks, shortlist, query set).
    // The indexed and post-delete IVF searches are held to the same ban —
    // overlay/tombstone machinery must not reintroduce a vector shuffle.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StructType}
    def hasFloatVec(dt: DataType): Boolean = dt match {
      case ArrayType(et, _) => et == FloatType || hasFloatVec(et)
      case st: StructType => st.fields.exists(f => hasFloatVec(f.dataType))
      case _ => false
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq("sim_pq_adc", "sim_pq_adc_indexed", "sim_pq_rerank",
          "sim_ivfpq", "sim_ivfpq_indexed", "sim_ivf_ann_indexed",
          "sim_filtered_ann_indexed", "sim_filtered_ann_adaptive",
          "sim_ivf_ann_deleted", "sim_pq_upsert",
          "sim_pq_adc_deleted", "sim_bq_hamming",
          "sim_bq_hamming_indexed", "sim_ivf_ann_compacted",
          "sim_d4_prune").foreach { name =>
        val plan = SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan
        val offenders = (plan +: plan.subqueriesAll).flatMap(_.collect {
          case e: ShuffleExchangeLike
              if e.output.exists(a => hasFloatVec(a.dataType)) => e
        })
        assert(offenders.isEmpty,
          s"$name: float-vector attributes in shuffle exchange(s):\n" +
            offenders.map(_.toString).mkString("\n"))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("table-stats legs each read exactly one column") {
    // the ANALYZE pass's reason to union per-column legs: every leg's
    // scan must prune to its single column (a multi-distinct one-pass
    // form would Expand xN instead — the a8 lesson)
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val schemas = try {
      SparkEntry.queries("pipeline_table_stats")(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec if f.relation.location.rootPaths
            .exists(_.toString.contains("documents")) =>
            f.requiredSchema.fieldNames.toSeq
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(schemas.size == 5 && schemas.forall(_.size == 1),
      s"every stats leg must scan one pruned column: $schemas")
    assert(schemas.flatten.toSet ==
      Set("doc_id", "lang", "n_chars", "source", "text"))
  }

  test("indexed IVF probe prunes to the probed cell partitions") {
    // simIvfAnnIndexed's reason to exist: the inverted lists are partition
    // DIRECTORIES, so the probe's IN-list on the cell column must surface
    // as PartitionFilters at the scan and the scan must list fewer
    // partitions than the index holds — at 100 TB this pruning IS the
    // difference between reading nprobe lists and reading the corpus.
    import org.apache.spark.sql.execution.FileSourceScanExec
    // static plan probe: AQE hides scans inside unexecuted stages
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      SparkEntry.queries("sim_ivf_ann_indexed")(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec
              if f.relation.partitionSchema.fieldNames.contains("cell") => f
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.nonEmpty, "no scan over the cell-partitioned index")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"probe IN-list not a partition filter:\n$f")
      val selected = f.selectedPartitions.partitionCount
      // default: 5 queries x nprobe 2 -> at most 10 probed cells, and the
      // fixed corpus trains 8 cells of which the probes touch a strict
      // subset (measured: 4)
      assert(selected <= 8, s"selected $selected partitions")
      val total = f.relation.location.listFiles(Nil, Nil).length
      assert(selected < total,
        s"no pruning: selected $selected of $total partitions")
    }
  }

  test("deleted-search probes prune overlay and base index partitions") {
    // simIvfAnnDeleted reads TWO cell-partitioned tables (the compacted
    // overlay and the base index); both reads must keep the probe IN-list
    // as a PartitionFilter — merge-on-read must not cost a full-index
    // scan. (No strict selected<total here: the overlay holds ONLY
    // compacted cells, so a probe can legitimately touch all of them.)
    import org.apache.spark.sql.execution.FileSourceScanExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val scans = try {
      SparkEntry.queries("sim_ivf_ann_deleted")(spark, dir)
        .queryExecution.executedPlan.collect {
          case f: FileSourceScanExec
              if f.relation.partitionSchema.fieldNames.contains("cell") => f
        }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(scans.size >= 2,
      s"expected overlay + base cell-partitioned scans, saw ${scans.size}")
    scans.foreach { f =>
      assert(f.partitionFilters.exists(_.references.exists(_.name == "cell")),
        s"probe IN-list not a partition filter:\n$f")
      assert(f.selectedPartitions.partitionCount <= 8,
        s"selected ${f.selectedPartitions.partitionCount} partitions")
    }
  }

  test("salted aggregation keeps its two-phase shape") {
    // skew_salted_agg's whole point is TWO aggregation rounds — phase 1
    // keyed (event_type, __salt) fanning the hot key over 16 reducers,
    // phase 2 keyed event_type merging the partials. If an optimizer
    // change ever collapses them (possible only if it decided the salt is
    // deterministic — it isn't, and this pins that), the query silently
    // degrades to the one-reducer-per-hot-key plan salting exists to
    // avoid. The oracle gate can't see that: answers are identical.
    val plan = SparkEntry.queries("skew_salted_agg")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("""hashpartitioning\(event_type#\d+, __salt#\d+L""".r
      .findFirstIn(plan).isDefined,
      s"phase-1 exchange must partition by (event_type, __salt):\n$plan")
    val aggRounds = """keys=\[event_type#\d+\]""".r.findAllIn(plan).size
    assert(aggRounds >= 2, // partial + final of the merge phase
      s"phase-2 merge aggregate missing:\n$plan")
    assert(plan.contains("partial_sum"), "phase 1 lost its map-side combine")
  }

  test("salted join keeps its replicate shape") {
    // skew_salted_join must actually join on (key, __salt) against the
    // 8-way exploded dimension — if a refactor drops the salt from the
    // join keys, the query degrades to the plain hot-key join and the
    // oracle gate cannot see it (answers are identical by design).
    val plan = SparkEntry.queries("skew_salted_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert("""l_suppkey#\d+L?, __salt#\d+L""".r.findFirstIn(plan).isDefined,
      s"join must key on (l_suppkey, __salt):\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"exploded dimension must stay broadcast:\n$plan")
    assert(plan.toLowerCase.contains("explode"),
      s"dimension replicate (explode over the salt range) missing:\n$plan")
  }

  test("salted interval join spreads the hot nation key with no broadcast escape") {
    // j5_salted_overlap exists for the regime where NEITHER interval side
    // broadcasts (at 100 TB both are entity-sized) and the ~25-value
    // nation key makes every join group a hot key AQE cannot split. Pin
    // it in that regime: thresholds −1, the pair join must key on
    // (nationkey, __salt) with the 8-way supplier replicate, plan no
    // broadcast join — and the answer must equal the plain join's
    // row for row (the shared-oracle contract).
    val thresholds = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    thresholds.foreach(spark.conf.set(_, "-1"))
    try {
      val salted = SparkEntry.queries("j5_salted_overlap")(spark, dir)
      val plan = salted.queryExecution.executedPlan.toString
      assert("""nationkey#\d+, __salt#\d+L""".r.findFirstIn(plan).isDefined,
        s"pair join must key on (nationkey, __salt):\n$plan")
      assert(!plan.contains("BroadcastHashJoin"),
        s"no broadcast escape allowed in the pinned regime:\n$plan")
      assert(plan.toLowerCase.contains("explode"),
        s"supplier-side replicate (explode over the salt range) missing:\n$plan")
      val plain = SparkEntry.queries("j5_interval_overlap")(spark, dir)
        .collect().toSeq
      assert(salted.collect().toSeq == plain,
        "salting changed the interval-overlap answer")
    } finally thresholds.foreach(spark.conf.unset)
  }

  test("handler plans push asset and date predicates into the scan") {
    // fixture via the ingest synthetic source is overkill here; the
    // sf0.001 lineitem scan through an equivalent read-filter-project
    // chain suffices to pin the plan shape the handler produces
    val df = Tables(spark, dir, "lineitem")
      .filter(org.apache.spark.sql.functions.col("l_orderkey").isin(1L, 2L, 3L))
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(l_orderkey"))
  }

  test("ccnet composition shuffles never carry document text") {
    // the dup flag is digest-only and langid/LM are projections, so the
    // composed plan's exchanges must carry only (doc_id, scalar) rows —
    // at 100 TB the crawl text stays on the scan side everywhere
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("pipeline_ccnet")(spark, dir)
        .queryExecution.executedPlan
      val offenders = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case e: ShuffleExchangeLike
            if e.output.exists(_.name == "text") => e
      })
      assert(offenders.isEmpty,
        s"text crossed an exchange in pipeline_ccnet:\n${offenders.mkString("\n")}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("pagerank round shuffles carry only id/long pairs") {
    // every exchange in an ITERATION ROUND is (id, long) rows — no
    // vectors, no text, no wide structs; the Pregel contract that makes
    // the iteration bandwidth-bounded at any graph size. The served
    // query's checkpointed loop hides round exchanges from its own plan
    // (r10 review finding), so the pin runs on the factored
    // un-checkpointed round — the exact plan each iteration executes.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{LongType, IntegerType}
    import org.apache.spark.sql.functions.lit
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (edges, outdeg, nodes) =
        graft.queries.Similarity.pagerankInputs(spark, dir)
      val round = graft.queries.Similarity.pagerankRound(
        edges, outdeg, nodes, nodes.withColumn("rank", lit(1000000L)))
      val plan = round.queryExecution.executedPlan
      val shuffles = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case e: ShuffleExchangeLike => e
      })
      assert(shuffles.nonEmpty, "a round must actually exchange partials")
      val offenders = shuffles.filter(!_.output.forall(a =>
        a.dataType == LongType || a.dataType == IntegerType))
      assert(offenders.isEmpty,
        s"non-scalar attribute crossed a pagerank exchange:\n${offenders.mkString("\n")}")
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
  }

  test("dd_incremental shuffles never carry document text") {
    // The scaladoc's scale claim made an assertion: at 100 TB the base is
    // petabytes of text but only 8-byte digests may cross an exchange —
    // the projection to (doc_id, lang, hk) must happen below EVERY
    // shuffle, on both the digest-set side and the keep-first side.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("dd_incremental")(spark, dir)
        .queryExecution.executedPlan
      val offenders = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case e: ShuffleExchangeLike
            if e.output.exists(_.name == "text") => e
      })
      assert(offenders.isEmpty,
        s"document text in shuffle exchange(s):\n${offenders.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("tx_token_budget's only global window runs over the bounded aggregate") {
    // The decomposition claim: the corpus-sized running sum must be a
    // window PARTITIONED by the score; the single unpartitioned window
    // (the documented bounded-aggregate prefix pattern) may only see the
    // <= 1001 per-score totals, i.e. an aggregate must sit below it.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = SparkEntry.queries("tx_token_budget")(spark, dir)
        .queryExecution.executedPlan
      val windows = (plan +: plan.subqueriesAll).flatMap(_.collect {
        case w: WindowExec => w
      })
      assert(windows.nonEmpty, "no window in the token-budget plan")
      val (global, perScore) = windows.partition(_.partitionSpec.isEmpty)
      assert(global.size == 1,
        s"expected exactly one unpartitioned window, got ${global.size}")
      assert(global.head.child.collectFirst {
        case a: BaseAggregateExec => a
      }.nonEmpty, "the global window must run over the bucket aggregate")
      assert(perScore.nonEmpty &&
        perScore.forall(_.partitionSpec.nonEmpty),
        "the corpus-side running sum lost its score partitioning")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
