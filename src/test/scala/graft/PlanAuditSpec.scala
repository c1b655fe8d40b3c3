package graft

import org.apache.spark.sql.functions._

/** Physical-plan audits: assert the optimizations we rely on actually
  * appear in the plans — broadcast star joins, parquet filter/column
  * pushdown, true top-k, no extra shuffles.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("star join broadcasts the dimension, not the fact") {
    val p = plan(gates.ViewGates.viewTopCompanies(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p.take(500))
    assert(!p.contains("SortMergeJoin"))
  }

  test("filter + projection push down to the parquet scan") {
    val l = Tables(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "N")
      .select("l_orderkey", "l_quantity")
    val p = plan(l)
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,N)]"), p)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double"), p)
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan(gates.ViewGates.viewSkillsDemand(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("anti-join orphan check stays a join, no subquery materialization") {
    val p = plan(gates.ViewGates.viewAntiOrphans(spark, dir))
    assert(p.contains("LeftAnti"), p.take(800))
  }

  test("grouped aggregation has a map-side partial phase") {
    val p = plan(gates.ViewGates.viewMonthlyStats(spark, dir))
    // partial_ aggregate expressions indicate map-side combine
    assert(p.contains("partial_"), p.take(800))
  }

  test("carry-forward reads prune on the date filter") {
    val p = plan(gates.CoreGates.carryForward(spark, dir))
    assert(p.contains("PushedFilters"), p.take(500))
  }

  test("EVERY registered query has an oracle (no rows-only checks)") {
    // round-4 invariant: zero no_oracle rows in the driver's correctness
    // report — a new gate without an oracle entry fails here first
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("NO gate plan contains a cartesian product (brute-force baseline excepted)") {
    // The one sanctioned nested-loop is ann_topk's labeled brute-force
    // baseline (broadcast NLJ over a 5-row query side). The iterative
    // gates (cluster resolution, curation) are skipped: their driver
    // loops EXECUTE at plan-construction time and localCheckpoint
    // truncates the audited lineage to the final join anyway — their
    // constituent pipelines are audited via dedup_minhash and the join
    // shapes are key-equi by construction (LlmSpec covers semantics).
    // Every other registered query must plan joins with keys.
    val skip = Set("ann_topk", "dedup_clusters", "llm_clean_corpus",
      "split_by_cluster")
    for ((name, fn) <- SparkEntry.queries if !skip(name)) {
      val p = plan(fn(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n${p.take(800)}")
    }
  }

  test("NO gate plan contains an unpartitioned window (dim-delta sk_assign excepted)") {
    // VERDICT r4 guard: `WindowExec` with an empty partitionSpec moves its
    // whole input through ONE task — fatal on anything bigger than a
    // dimension delta. Allowlist: sk_assign (the dim-delta Keys.assign
    // case, thousands of rows by contract), active_users (its running
    // sum windows over the per-DAY delta frame — one row per calendar
    // day in the observed span, bounded regardless of event volume), and
    // hybrid_search (rank windows over each arm's ALREADY-LIMITED top-k
    // frame, <= kEach rows by construction); the driver-loop gates are
    // skipped for the same plan-construction reason as the cartesian
    // test.
    import org.apache.spark.sql.execution.window.WindowExec
    // eval_auc: its one window orders DISTINCT round-6 scores — a frame
    // bounded by the score lattice (<= 4e6 + 1 values in [-1, 1]), not
    // by corpus size
    val skip = Set("sk_assign", "active_users", "hybrid_search",
      "dedup_clusters", "llm_clean_corpus", "eval_auc", "split_by_cluster")
    for ((name, fn) <- SparkEntry.queries if !skip(name)) {
      val bad = fn(spark, dir).queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty, s"$name plans an unpartitioned window:\n${bad.mkString("\n")}")
    }
  }

  test("null-safe quantile join-back plans a broadcast HASH join, not a loop") {
    // EqualNullSafe is a hash-join key: if the <=> condition ever
    // degraded to BroadcastNestedLoopJoin, every row would probe every
    // group's quantiles — a scale killer the gate data wouldn't show
    for (name <- Seq("feature_robust", "feature_winsorize")) {
      val p = plan(SparkEntry.queries(name)(spark, dir))
      assert(p.contains("BroadcastHashJoin"), s"$name: " + p.take(800))
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name plans a loop join")
    }
  }

  test("keep-one-per-key window pushes a partial group limit below the shuffle") {
    // Spark's InferWindowGroupLimit rewrites `row_number() <= k` filters
    // into a map-side WindowGroupLimit(Partial) BEFORE the hash
    // exchange: each task ships at most k rows per key instead of the
    // whole table — the map-side-combine analogue for window dedup, and
    // the property that keeps dedupByPriority's shuffle proportional to
    // candidate survivors rather than input size at 100 TB. Pin it so a
    // refactor (e.g. selecting the rank column into the output, which
    // defeats the rewrite) cannot silently regress it.
    val p = SparkEntry.queries("dedup_priority")(spark, dir)
      .queryExecution.executedPlan.toString
    val iPartial = p.indexOf("row_number(), 1, Partial")
    val iFinal = p.indexOf("row_number(), 1, Final")
    assert(iPartial >= 0 && iFinal >= 0, s"WindowGroupLimit missing:\n${p.take(1200)}")
    // tree prints top-down: Final above the exchange, Partial below it
    assert(iPartial > iFinal, "partial limit is not below the final one")
  }

  test("top-3-per-group pushes a partial group limit below the shuffle") {
    // the general-k InferWindowGroupLimit shape (k = 1 pinned above)
    val p = SparkEntry.queries("topk_per_group")(spark, dir)
      .queryExecution.executedPlan.toString
    val iPartial = p.indexOf("row_number(), 3, Partial")
    val iFinal = p.indexOf("row_number(), 3, Final")
    assert(iPartial >= 0 && iFinal >= 0, s"WindowGroupLimit(3) missing:\n${p.take(1200)}")
    assert(iPartial > iFinal, "partial limit is not below the final one")
  }

  test("chunking and PII scrub are shuffle-free (narrow projections)") {
    val docs = Tables(spark, dir, "documents")
    val chunked = graft.llm.Chunking.chunk(docs, "doc_id", "text", 64, 48)
    assert(!plan(chunked).contains("Exchange"), plan(chunked).take(800))
    val scrubbed = docs.select(col("doc_id"),
      graft.llm.Privacy.redact(col("text")).as("clean"))
    assert(!plan(scrubbed).contains("Exchange"), plan(scrubbed).take(800))
  }

  test("repetition and keyword aggregations have map-side partial phases") {
    val docs = Tables(spark, dir, "documents")
    val rep = plan(graft.llm.Repetition.profile(docs, "doc_id", "text"))
    assert(rep.contains("partial_"), rep.take(800))
    val kw = plan(graft.llm.Keywords.tfidfTopK(docs, "doc_id", "text"))
    assert(kw.contains("partial_"), kw.take(800))
  }

  test("tfidf joins the df side broadcast (Zipf head terms never shuffle-join)") {
    val docs = Tables(spark, dir, "documents")
    val kw = plan(graft.llm.Keywords.tfidfTopK(docs, "doc_id", "text"))
    assert(kw.contains("BroadcastHashJoin"), kw.take(800))
    assert(!kw.contains("SortMergeJoin"), kw.take(800))
    // (broadcastDf = false is the escape hatch for dictionary-busting
    // vocabularies; not plan-asserted here because at fixture scale the
    // optimizer's size estimate auto-broadcasts the df agg anyway)
  }

  test("block packing has NO window at all: offsets are the two-pass cumsum") {
    // round 14: the per-shard running-sum window (parallelism capped at
    // nShards) was replaced by Cumsum.exclusivePerShard — the plan must
    // contain no WindowExec of any kind
    import org.apache.spark.sql.execution.window.WindowExec
    val docs = Tables(spark, dir, "documents")
    val ws = graft.llm.Packing.blocks(docs, "doc_id", "text", 256, 8)
      .queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(ws.isEmpty, ws.mkString("\n"))
  }

  test("rule batteries and span corruption plan as narrow scans") {
    val docs = Tables(spark, dir, "documents")
    for (df <- Seq(
        graft.llm.Gopher.profile(docs, "doc_id", "text"),
        graft.llm.C4.profile(docs, "doc_id", "text"),
        graft.llm.SpanCorrupt.spanCorrupt(docs, "doc_id", "text"))) {
      val p = plan(df)
      assert(!p.contains("Exchange"), p.take(600))
    }
  }

  test("sparse text classifier joins its model broadcast, not shuffled") {
    val docs = Tables(spark, dir, "documents")
    val model = graft.llm.Classify.textCentroidTrain(
      docs, "doc_id", "text", "lang", dim = 256)
    val p = plan(graft.llm.Classify.textCentroidPredict(
      docs, "doc_id", "text", model, dim = 256))
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("byte-level BPE encode is a narrow zero-shuffle scan") {
    val docs = Tables(spark, dir, "documents")
    val merges = Array(("t", "h"), ("Ġ", "t"))
    val p = plan(graft.llm.Bpe.encodeBytes(docs, "doc_id", "text", merges))
    assert(!p.contains("Exchange"), p.take(800))
    val p2 = plan(graft.llm.Bpe.decodeBytes(
      graft.llm.Bpe.encodeBytes(docs, "doc_id", "text", merges), "doc_id"))
    assert(!p2.contains("Exchange"), p2.take(800))
    // the RAW tier keeps the same shape: preTokenize runs inside the
    // same mapPartitions kernel, so no new boundary appears
    val p3 = plan(graft.llm.Bpe.encodeBytesRaw(docs, "doc_id", "text", merges))
    assert(!p3.contains("Exchange"), p3.take(800))
    val p4 = plan(graft.llm.Bpe.decodeBytes(
      graft.llm.Bpe.encodeBytesRaw(docs, "doc_id", "text", merges), "doc_id"))
    assert(!p4.contains("Exchange"), p4.take(800))
  }

  test("encoding-damage scan is a pure codegen'd projection, no shuffle") {
    val docs = Tables(spark, dir, "documents")
    val p = plan(graft.llm.TextStats.encodingScan(docs, "doc_id", "text"))
    assert(!p.contains("Exchange"), p.take(800))
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("UDF"),
      p.take(800))
  }

  test("whole-stage codegen covers the scalar-function chains") {
    // AQE wraps the plan and reports zero codegen subtrees before
    // execution — disable it for the static inspection only.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = gates.FunctionGates.funcSalary(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.CodegenMode)
      val found = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(p)
      assert(found.exists(_.group(1).toInt >= 1), p.take(300))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
