package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions for round-4 operators: the optimizer must
  * produce the scale shape the operator was designed around, not just
  * correct rows. (Same style as IndexSpec's dynamic-partition-pruning
  * assertion and TrainOps2Spec's no-broadcast-hint assertion.)
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  private def executedPlan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Flatten a physical tree, unwrapping AQE-planned subtrees (the
    * adaptive wrapper hides the real scans behind query stages).
    */
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val inner = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.inputPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ inner)
  }

  /** Every file scan in a physical tree whose root path contains one
    * of `frags` — the probe the partition-pruning audits share.
    */
  private def fileScans(pp: org.apache.spark.sql.execution.SparkPlan, frags: String*)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    allNodes(pp).collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec
          if sc.relation.location.rootPaths.exists(p =>
            frags.exists(p.toString.contains)) => sc
    }

  test("stream_interval_join is an equi-join on user, not a cartesian") {
    val plan = executedPlan("stream_interval_join")
    assert(!plan.toLowerCase.contains("cartesian"),
      s"interval join degenerated to a cartesian product:\n${plan.take(1500)}")
    // the user-key equality must be a join key (hash/sort-merge), with
    // the time interval as a post-join or join-condition filter
    assert(plan.contains("Join") || plan.contains("join"), plan.take(500))
  }

  test("etl_merge_upsert is one shuffle by key (window), no join") {
    val plan = executedPlan("etl_merge_upsert")
    assert(plan.contains("Window"), "merge must be a window, not a join")
    assert(!plan.contains("SortMergeJoin") && !plan.toLowerCase.contains("broadcasthashjoin"),
      s"merge-upsert must not join:\n${plan.take(1500)}")
  }

  test("etl_merge_upsert scan prunes to the referenced columns only") {
    val plan = executedPlan("etl_merge_upsert")
    val readSchema = "o_orderkey|o_custkey|o_orderdate|o_totalprice"
    // o_orderpriority / o_orderstatus must not be read
    assert(!plan.contains("o_orderpriority"),
      s"unpruned column o_orderpriority in scan:\n${plan.take(1500)}")
  }

  test("q_hierarchy rounds keep equi-joins (no broadcast of the full state)") {
    val plan = executedPlan("q_hierarchy")
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(1000))
  }

  test("q19_disjunctive pushes the quantity bounds into the parquet scan") {
    val plan = executedPlan("q19_disjunctive")
    // the OR-chain shares l_quantity ∈ [1,30]; at minimum the scan must
    // carry pushed filters rather than reading bare
    assert(plan.contains("PushedFilters: ["), s"no pushdown:\n${plan.take(1200)}")
    assert(!plan.contains("PushedFilters: []"),
      s"empty pushdown on the lineitem scan:\n${plan.take(1200)}")
  }

  test("q4_priority reads only the order columns it needs") {
    val plan = executedPlan("q4_priority")
    assert(!plan.contains("o_totalprice") && !plan.contains("o_orderstatus"),
      s"unpruned orders columns:\n${plan.take(1500)}")
  }

  test("q8_market_share broadcasts only bounded dimensions") {
    val optimized = SparkEntry.queries("q8_market_share")(spark, sf)
      .queryExecution.optimizedPlan.toString
    // static hints exist only on the three nation/region-derived frames
    // (region→asia, asia, supp-nation); the four linear-scale joins must
    // carry no ResolvedHint in the optimized plan
    val hints = "(?i)broadcast".r.findAllIn(optimized).length
    assert(hints <= 3, s"more broadcast hints than the three dimension sides:\n$optimized")
  }

  test("knn_graph block sub-split bounds pair counts on a skewed label") {
    val spark2 = spark
    import spark2.implicits._
    // 2000 same-label vectors: uncapped would self-join 2000² = 4M pairs;
    // the 512-cap must split into ≥4 sub-blocks. Uses the PRODUCTION
    // idSub key (md5 hash — a multinomial split, so the bound is
    // cap + slack, not the exact-equal partition a raw modulo gives)
    val sizes = Tables.embeddings(spark, sf)
      .groupBy(col("label")).agg(count(lit(1)).as("lsz"))
    val maxBlock = Tables.embeddings(spark, sf).join(broadcast(sizes), "label")
      .select(col("label"),
        graft.operators.TrainOps3.idSub(col("lsz")).as("sub"))
      .groupBy(col("label"), col("sub")).agg(count(lit(1)).as("sz"))
      .agg(max(col("sz"))).first().getLong(0)
    assert(maxBlock <= (graft.operators.TrainOps3.KNN_BLOCK_CAP * 1.25).toLong,
      s"sub-split failed: block of $maxBlock")
  }

  test("pipe_quality_funnel is one token shuffle + scalar aggregate (no rescans)") {
    val plan = executedPlan("pipe_quality_funnel")
    val scans = plan.split("\n").count(_.contains("Scan parquet"))
    assert(scans == 1, s"funnel must scan documents exactly once, saw $scans")
  }

  test("dedup_simhash plan carries no collect_list (star, not clique)") {
    val plan = SparkEntry.queries("dedup_simhash")(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("collect_list"),
      s"identical-hash groups must be rep→member stars, not array cliques:\n${plan.take(1200)}")
    graft.operators.Dedup.releaseCaches(blocking = true)
  }

  test("dedup_minhash_exact rides the same kernel-scored collapse/band plan") {
    val plan = SparkEntry.queries("dedup_minhash_exact")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("sig_agree_count") && plan.contains("md5_minhash_sig"),
      s"exact twin must score with the agreement kernel over md5 signatures:\n${plan.take(1200)}")
    assert(!plan.toLowerCase.contains("collect_list"),
      "identical-signature groups must star, not clique")
    graft.operators.Dedup.releaseCaches(blocking = true)
  }

  test("dedup_minhash scores candidates with the codegen'd agreement kernel") {
    val plan = SparkEntry.queries("dedup_minhash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("sig_agree_count"),
      s"est_jaccard must use the SigAgreeCount kernel, not interpreted zip_with:\n${plan.take(1200)}")
    assert(!plan.contains("zip_with"),
      "interpreted zip_with survives in the minhash scoring plan")
    graft.operators.Dedup.releaseCaches(blocking = true)
  }

  test("simhash hamming budget runs inside the chunk join, not above the distinct") {
    // The low-entropy top chunk of the 60-bit twin emits ~30M
    // candidate pairs at 500k signatures; if the budget drifts above
    // the pair distinct, every one of them is shuffled again.
    val plan = SparkEntry.queries("dedup_simhash_exact")(spark, sf)
      .queryExecution.optimizedPlan.toString
    val joinLines = plan.split("\n").filter(_.contains("Join"))
    assert(joinLines.exists(_.contains("hamming64")),
      s"hamming filter must be a chunk-join condition:\n${plan.take(1500)}")
    graft.operators.Dedup.releaseCaches(blocking = true)
  }

  test("dedup_simhash_exact scan prunes to doc_id and text") {
    val plan = SparkEntry.queries("dedup_simhash_exact")(spark, sf)
      .queryExecution.executedPlan.toString
    // lang / n_chars / source must never reach the parquet scan
    assert(!plan.contains("n_chars") && !plan.contains("source"),
      s"unpruned documents columns in scan:\n${plan.take(1200)}")
    graft.operators.Dedup.releaseCaches(blocking = true)
  }

  test("text_fingerprint_exact is a pure per-row projection up to the sort") {
    val physical = SparkEntry.queries("text_fingerprint_exact")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "(?i)exchange".r.findAllIn(physical).length
    assert(exchanges <= 1,
      s"per-row fingerprint must not shuffle before the final sort:\n${physical.take(1200)}")
    assert(physical.contains("md5_poly_fingerprint"), "kernel missing from plan")
  }

  test("text_entropy plan is shuffle-free up to the final sort") {
    val physical = SparkEntry.queries("text_entropy")(spark, sf)
      .queryExecution.executedPlan.toString
    // exactly one exchange: the range partitioning of the final orderBy
    val exchanges = "(?i)exchange".r.findAllIn(physical).length
    assert(exchanges <= 1,
      s"per-row entropy must not shuffle before the final sort ($exchanges exchanges):\n${physical.take(1500)}")
  }

  test("src_partitioned_scan prunes partitions on event_type before IO") {
    val plan = executedPlan("src_partitioned_scan")
    assert(plan.contains("PartitionFilters"), s"no partition filters:\n${plan.take(1500)}")
    // the event_type predicate must sit in PartitionFilters (directory
    // pruning), not in the post-scan Filter
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type"),
      s"event_type not a partition filter:\n${plan.take(1500)}")
  }

  test("shuffle_epoch rank is one range shuffle — no single-partition stage, no Window") {
    val plan = executedPlan("shuffle_epoch")
    // globalRowNumber's offsets are a broadcast theta-join over the
    // bounded counts frame, so NOTHING in the plan — data path or
    // metadata path — may demand a SinglePartition distribution
    assert(!plan.contains("SinglePartition"),
      s"global-order stage would serialize at scale:\n${plan.take(1500)}")
    // the rank itself is a projection over range-sorted slices
    // (monotonically_increasing_id low bits), not a Window operator —
    // the data takes exactly one shuffle, the range exchange
    assert(!plan.contains("Window"),
      s"rank must be projection-derived, not a window:\n${plan.take(1500)}")
    assert(plan.contains("rangepartitioning"),
      s"balanced range slices missing from plan:\n${plan.take(1500)}")
    graft.Caches.release(blocking = true)
  }

  test("dedup_embedding_exact scores with the codegen'd long-dot kernel") {
    val plan = executedPlan("dedup_embedding_exact")
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(1000))
    assert(plan.contains("long_dot_product"), "long_dot kernel missing from plan")
  }

  test("embedding dedup paths carry no window (collapse is probe-and-skip aggregation)") {
    // The identical-vector collapse used to be a Window over the raw
    // vector — a full-corpus sort paid on every run. It is now a
    // one-row probe + groupBy/equi-join taken only when duplicate
    // vectors exist; neither branch may reintroduce WindowExec below
    // the final top-50 ordering (which is a TakeOrderedAndProject,
    // not a window, on both paths).
    for (q <- Seq("dedup_embedding", "dedup_embedding_exact")) {
      val plan = executedPlan(q)
      assert(!plan.contains("Window"),
        s"$q: WindowExec reappeared in the collapse path:\n${plan.take(1500)}")
      assert(plan.contains("TakeOrderedAndProject"),
        s"$q: top-50 must be TakeOrderedAndProject, not a global sort:\n${plan.take(1200)}")
    }
  }

  test("sketch point queries broadcast the fixed-size sketch, never shuffle it") {
    for (q <- Seq("sketch_cms_exact", "sketch_bloom_exact")) {
      val plan = executedPlan(q)
      assert(plan.toLowerCase.contains("broadcast"),
        s"$q: sketch side must broadcast:\n${plan.take(1200)}")
      assert(!plan.toLowerCase.contains("cartesian"), s"$q: cartesian in plan")
    }
  }

  test("pipe_dedup_e2e composition stays join-keyed (no cartesian)") {
    val plan = executedPlan("pipe_dedup_e2e")
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(1200))
  }

  test("src_zorder_layout reads orders exactly once (conditional agg, not 3 scans)") {
    val plan = executedPlan("src_zorder_layout")
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"$scans scans — locality rows must share one pass:\n${plan.take(1200)}")
  }

  // --- round-11 operators ------------------------------------------------

  test("bm25_retrieval filters the token stream by a BROADCAST term set before any shuffle") {
    val plan = executedPlan("bm25_retrieval")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"term filter must be a broadcast join:\n${plan.take(1500)}")
    // no corpus-wide inverted index: the only SortMergeJoin-scale keys
    // allowed are the tiny matched-token frames, never the raw stream
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(1000))
  }

  test("quality_classifier is one scan + projection: ZERO exchanges in the final plan") {
    // the orderBy is the output contract; below it the scoring itself
    // must not shuffle. Count Exchange nodes excluding the final sort's
    // rangepartitioning.
    val plan = executedPlan("quality_classifier")
    val exchanges = "Exchange ".r.findAllIn(plan).size
    val rangeEx = "rangepartitioning".r.findAllIn(plan.toLowerCase).size
    assert(exchanges == rangeEx,
      s"scoring must be shuffle-free (found ${exchanges - rangeEx} non-sort exchanges):\n${plan.take(1500)}")
  }

  test("dedup_paragraph keeper is an aggregation with partial combine, not a window") {
    val plan = executedPlan("dedup_paragraph")
    // min(struct) keeper: viral chunks must hit map-side partial
    // aggregation; a Window over the chunk partition would serialize
    // the hottest chunk into one task
    assert(!plan.contains("Window ["), // final orderBy is a Sort, not Window
      s"keeper must not be a window:\n${plan.take(1500)}")
    assert(plan.contains("HashAggregate") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"), plan.take(800))
  }

  test("dedup_paragraph shuffles the fixed-width md5 chunk key, never the raw window text") {
    val plan = executedPlan("dedup_paragraph")
    // the groupBy/join key must be the 32-char md5 (ckey) — shuffling
    // the 10-token window strings themselves would dominate shuffle
    // bytes at corpus scale
    assert(plan.contains("hashpartitioning(ckey"),
      s"keeper shuffle must key on the md5 chunk key:\n${plan.take(1500)}")
    assert(!plan.contains("hashpartitioning(chunk"),
      s"raw chunk text must not be a shuffle key:\n${plan.take(1500)}")
  }

  test("dedup_paragraph_apply rebuild aggregates only the KEPT chunks behind the md5-key join") {
    val plan = executedPlan("dedup_paragraph_apply")
    // keeper stays the md5-keyed partial-combine aggregation; the
    // collect_list rebuild must sit above the keeper filter (state is
    // the surviving chunks of one doc, never a window over the corpus)
    assert(plan.contains("hashpartitioning(ckey"),
      s"keeper shuffle must key on the md5 chunk key:\n${plan.take(1500)}")
    assert(!plan.contains("Window ["),
      s"rebuild must be an aggregation, not a window:\n${plan.take(1500)}")
    assert(plan.contains("collect_list"), plan.take(800))
  }

  test("eval_retrieval grades TopK-bounded heads: both reductions are the bounded-heap operator") {
    val plan = executedPlan("eval_retrieval")
    val topks = "TopKPerGroup".r.findAllIn(plan).size
    assert(topks >= 2,
      s"both graded heads must reduce through TopKPerGroup (found $topks):\n${plan.take(1500)}")
    assert(!plan.toLowerCase.contains("cartesianproduct"),
      s"no unbroadcast cartesian in the eval composition:\n${plan.take(1200)}")
  }

  test("text_lm_bigram scores per bigram TYPE: the pair stream crosses exactly ONE join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
    val plan = SparkEntry.queries("text_lm_bigram")(spark, sf)
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    def keyNames(j: Join): Set[String] =
      j.condition.toSeq.flatMap(_.references.toSeq.map(_.name)).toSet
    // exactly one join touches w2 — the single (w1,w2)-keyed join the
    // corpus-scale pair stream crosses
    val pairJoins = joins.filter(j => keyNames(j).contains("w2"))
    assert(pairJoins.size == 1,
      s"pair stream must cross one (w1,w2) join, found ${pairJoins.size}:\n${plan.treeString.take(2000)}")
    // any w1-only join must be the vocab-scale c2⋈c1 enrichment: both
    // inputs aggregates (count tables), never the corpus pair stream —
    // the instance-level plan re-shuffled every bigram occurrence by
    // its first word (top key "the" = percent-scale skew)
    def core(p: LogicalPlan): LogicalPlan = p match {
      case u: Project => core(u.child)
      case u: Filter => core(u.child)
      case other => other
    }
    val w1Only = joins.filter(j => keyNames(j) == Set("w1"))
    assert(w1Only.nonEmpty, "expected the vocab-scale c2⋈c1 join")
    w1Only.foreach { j =>
      assert(core(j.left).isInstanceOf[Aggregate] && core(j.right).isInstanceOf[Aggregate],
        s"w1-only join must enrich count tables, not the pair stream:\n${j.treeString.take(1500)}")
    }
  }

  test("rag_context_pack's budget window runs on the TopK-bounded frame, never SinglePartition") {
    val plan = executedPlan("rag_context_pack")
    assert(plan.contains("TopKPerGroup"),
      s"candidate cut must be the bounded-heap operator:\n${plan.take(1200)}")
    // the budget window must be hash-partitioned by query (its input is
    // the ≤16-per-query TopK frame); the scalar stats aggregate is the
    // only legitimate SinglePartition (one row), so assert on the
    // window's own exchange rather than the whole plan
    val windowIdx = plan.indexOf("Window [")
    assert(windowIdx >= 0, plan.take(800))
    val below = plan.substring(windowIdx)
    val exIdx = below.indexOf("Exchange ")
    assert(exIdx >= 0 && below.substring(exIdx).startsWith("Exchange hashpartitioning(query_id"),
      s"pack window must consume a query-hash exchange:\n${below.take(800)}")
  }

  test("text_lm_bigram reads documents ONCE per count table branch with pruned columns") {
    val plan = executedPlan("text_lm_bigram")
    assert(!plan.contains("n_chars") && !plan.contains("lang"),
      s"unpruned documents columns:\n${plan.take(1500)}")
  }

  test("bpe_apply_batch tokenizes via a literal replace fold: no join before the explode") {
    // the merge table is driver-held; the only joins allowed are the
    // OOV vocabulary check and the final per-source rollup join
    val plan = executedPlan("bpe_apply_batch")
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(1000))
    assert(plan.contains("staticinvoke") || plan.contains("replace"),
      s"replace fold missing from the projection:\n${plan.take(800)}")
  }

  test("stream_bm25_gate probes the persisted term dictionary: no aggregation over a bare postings scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val lp = SparkEntry.queries("stream_bm25_gate")(spark, sf)
      .queryExecution.optimizedPlan
    def scansPath(p: LogicalPlan, frag: String): Boolean =
      p.collectLeaves().exists {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation => h.location.rootPaths.exists(_.toString.contains(frag))
          case _ => false
        }
        // the version-keyed dictionary cache surfaces as an
        // InMemoryRelation whose cached plan scans df_vN
        case m: org.apache.spark.sql.execution.columnar.InMemoryRelation =>
          m.cacheBuilder.cachedPlan.toString.contains(frag)
        case _ => false
      }
    // the df dictionary read must be in the plan at all (directly or
    // through the per-committed-version cache)...
    assert(scansPath(lp, "/df_v"),
      "gate must read the persisted df_vN dictionary, not rederive df")
    // ...and every aggregation that consumes postings must sit ABOVE a
    // join (i.e. the postings were term-restricted first). An Aggregate
    // whose subtree is a bare delta scan is the index-sized per-trigger
    // df recomputation this plan retired.
    val aggs = lp.collect {
      case a: Aggregate if scansPath(a.child, "/delta_v") => a
    }
    aggs.foreach { a =>
      assert(a.child.collect { case j: Join => j }.nonEmpty,
        s"aggregation over a bare postings scan (cost scales with the index, " +
          s"not the trigger):\n${a.toString.take(1200)}")
    }
  }

  test("stream_bm25_gate postings scans carry the literal bucket partition filter (no full-index read per trigger)") {
    val pp = SparkEntry.queries("stream_bm25_gate")(spark, sf)
      .queryExecution.executedPlan
    val postingScans = fileScans(pp, "/delta_v", "/compact_v")
    assert(postingScans.nonEmpty, "no postings scan found in the gate plan")
    postingScans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "bucket")),
        s"postings scan without a bucket PartitionFilter — the trigger reads " +
          s"the whole index:\n${sc.toString.take(600)}")
    }
  }

  test("ann_pq_exact: codebook/LUT joins broadcast; ADC sum combines map-side; long-dot codegen kernel") {
    val plan = executedPlan("ann_pq_exact")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(!plan.contains("SortMergeJoin"),
      s"PQ serve must never sort-merge (codebook and LUT are metadata-sized broadcasts):\n${plan.take(1500)}")
    assert("BroadcastHashJoin \\[s#\\d+L?, code_id#\\d+L?\\]".r.findFirstIn(plan).isDefined
        || plan.contains("BroadcastHashJoin [s, code_id]"),
      s"ADC lookup must be a broadcast join on (s, code_id):\n${plan.take(1500)}")
    assert(plan.contains("partial_sum"),
      "the (query, vector) score sum must partial-aggregate before its exchange")
    assert(plan.contains("long_dot_product"), "scoring must be the codegen'd kernel")
    assert(plan.contains("TopKPerGroup"), "top-k must be the bounded-heap operator")
  }

  test("ann_ivfpq_exact: ONE plan carries literal cent_id partition pruning AND map-side ADC combine") {
    val pp = SparkEntry.queries("ann_ivfpq_exact")(spark, sf)
      .queryExecution.executedPlan
    // the IVF half: the codes scan must read ONLY the probed cells —
    // a plan-time PartitionFilter on cent_id (directory elimination;
    // the unprobed bulk of the index is never opened)
    val codeScans = fileScans(pp, "/pq/codes")
    assert(codeScans.nonEmpty, "no PQ codes scan found in the serve plan")
    codeScans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "cent_id")),
        s"codes scan without a cent_id PartitionFilter — serve reads the " +
          s"whole index:\n${sc.toString.take(600)}")
    }
    // the PQ half, in the SAME plan: probes/LUT broadcast (never a
    // corpus-side shuffle join) and the ADC score sum partial-combines
    // map-side before its exchange
    val plan = pp.toString
    assert(!plan.contains("SortMergeJoin"),
      s"IVFADC serve must not sort-merge (probes and LUT are metadata-sized):\n${plan.take(1500)}")
    assert(plan.contains("partial_sum"),
      "the (query, vector) ADC sum must partial-aggregate before its exchange")
    assert(plan.contains("TopKPerGroup"), "top-k must be the bounded-heap operator")
  }

  test("ann_ivfpq_residual: probed-cell pruning and map-side combine survive the coarse-term rewrite") {
    val pp = SparkEntry.queries("ann_ivfpq_residual")(spark, sf)
      .queryExecution.executedPlan
    val codeScans = fileScans(pp, "/pqr/codes")
    assert(codeScans.nonEmpty, "no residual-PQ codes scan found in the serve plan")
    codeScans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "cent_id")),
        s"residual codes scan without a cent_id PartitionFilter:\n${sc.toString.take(600)}")
    }
    val plan = pp.toString
    assert(!plan.contains("SortMergeJoin"),
      s"residual IVFADC serve must not sort-merge:\n${plan.take(1500)}")
    // carrying cdot through the grouping key must not break the
    // map-side combine — the fine-term sum still partial-aggregates
    assert(plan.contains("partial_sum"),
      "the residual ADC sum must partial-aggregate before its exchange")
    assert(plan.contains("TopKPerGroup"), "top-k must be the bounded-heap operator")
  }

  test("stream_ivf_ingest: EVERY committed vdelta scan carries a literal cent_id PartitionFilter") {
    val pp = SparkEntry.queries("stream_ivf_ingest")(spark, sf)
      .queryExecution.executedPlan
    // the serve unions one scan per committed trigger; each must read
    // only the probed cells — directory elimination per delta, so the
    // unprobed bulk of the chain is never opened regardless of how
    // many triggers it absorbed
    val deltaScans = fileScans(pp, "/vdelta_")
    assert(deltaScans.size >= 4, s"expected one scan per trigger, got ${deltaScans.size}")
    deltaScans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "cent_id")),
        s"vdelta scan without a cent_id PartitionFilter:\n${sc.toString.take(600)}")
    }
    val plan = pp.toString
    assert(!plan.contains("SortMergeJoin"),
      s"streamed IVF serve must not sort-merge (probes are metadata-sized):\n${plan.take(1500)}")
    assert(plan.contains("TopKPerGroup"), "top-k must be the bounded-heap operator")
  }

  test("stream_ivf_gate: every committed chain scan carries a literal cent_id PartitionFilter; probes broadcast") {
    val pp = SparkEntry.queries("stream_ivf_gate")(spark, sf)
      .queryExecution.executedPlan
    // the gate reads only the probed cells of each committed segment —
    // directory elimination at plan time, so a trigger's cost tracks
    // the batch and the probed-cell mass, never the whole index
    val chainScans = fileScans(pp, "/vdelta_", "/vcompact_")
    assert(chainScans.nonEmpty, "no chain scan found in the gate plan")
    chainScans.foreach { sc =>
      assert(sc.partitionFilters.exists(_.references.exists(_.name == "cent_id")),
        s"chain scan without a cent_id PartitionFilter — the trigger reads " +
          s"the whole index:\n${sc.toString.take(600)}")
    }
    val plan = pp.toString
    assert(!plan.contains("SortMergeJoin"),
      s"gate serve must not sort-merge (probes are batch-sized broadcasts):\n${plan.take(1500)}")
    assert(plan.contains("long_dot_product"), "scoring must be the codegen'd kernel")
    assert(plan.contains("TopKPerGroup"), "top-1 must be the bounded-heap operator")
  }

  test("corpus_diff: full-outer SMJ keyed on doc_id carries hashed fixed-width rows, never text") {
    val plan = executedPlan("corpus_diff")
    assert(plan.contains("SortMergeJoin [doc_id") && plan.contains("FullOuter"),
      s"diff must be a full-outer merge on doc_id:\n${plan.take(1200)}")
    // nodes ABOVE the join (printed before it) must not reference the
    // text column: each side reduces to (doc_id, md5, len) below the
    // join, so the one shuffle is fixed-width at any document size
    val aboveJoin = plan.substring(0, plan.indexOf("SortMergeJoin"))
    assert(!aboveJoin.contains("text#"),
      s"document text crossed the diff join:\n${aboveJoin.take(1200)}")
  }

  test("ivf_skew_report: one cell-keyed aggregation; scalar totals broadcast, not joined") {
    val plan = executedPlan("ivf_skew_report")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(plan.contains("hashpartitioning(cent_id"),
      "per-cell counts must shuffle on cent_id")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the 1-row totals frame must broadcast:\n${plan.take(1500)}")
  }

  test("kmeans assignment pass: one codegen'd argmin projection — no join, no shuffle, no sort") {
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(least(greatest(CAST(x AS DOUBLE), -1D), 1D) * 1e6) AS BIGINT) + 1000000L)").as("kv"))
      .withColumn("vv", graft.functions.Expr.longDot(col("kv"), col("kv")))
    val cents = e.limit(20).select(col("vec_id").as("cent_id"), col("kv").as("cvec"))
    val plan = graft.operators.Retrain.kmAssign(e, cents)
      .queryExecution.executedPlan.toString
    // the centroid table rides the expression driver-local: the pass
    // must be a pure per-row projection — any join/exchange/sort means
    // the n×K candidate materialization crept back in
    assert(plan.contains("quant_assign"),
      s"assignment must be the codegen'd argmin expression:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), s"no join in the assignment pass:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange"), "assignment must not shuffle the corpus")
    assert(!plan.contains("Sort"), "assignment must not sort the corpus")
    // the struct is computed ONCE and both fields extracted from it
    assert("quant_assign".r.findAllIn(plan).size == 1,
      s"argmin kernel must be evaluated once per row:\n${plan.take(1500)}")
  }
}
