package graft.tools

import graft.ops.{Relational, TextOps}
import graft.query.Bm25Sql
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: dump physical plans of the hot paths and grep-check the
  * properties that matter at 100 TB — predicate pushdown reaching the scan,
  * column pruning, broadcast joins on dims, TakeOrderedAndProject for
  * top-k, whole-stage codegen coverage.
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // self-reported totals (the authoritative counting rule: one
    // assertion per want/reject string, one check group per check() call)
    var nChecks = 0
    var nAsserts = 0
    var nFailed = 0
    def check(name: String, plan: String, wants: Seq[String], rejects: Seq[String] = Nil): Unit = {
      println(s"\n===== $name =====")
      nChecks += 1
      nAsserts += wants.size + rejects.size
      wants.foreach { w =>
        val ok = plan.contains(w)
        if (!ok) nFailed += 1
        println(s"CHECK want '$w': " + (if (ok) "OK" else "MISSING"))
      }
      rejects.foreach { r =>
        val bad = plan.contains(r)
        if (bad) nFailed += 1
        println(s"CHECK reject '$r': " + (if (bad) "PRESENT(BAD)" else "OK"))
      }
      if (sys.env.contains("PLAN_FULL")) println(plan)
    }

    // 1. postings scan with term filter: pushdown must reach parquet
    val idx = graft.IndexCache.forDocuments(spark, sfDir)
    val postingsScan = spark.read.parquet(s"$idx/postings")
      .filter(col("term").isin("spark", "query"))
      .select("bucket", "term", "blocks")
    check("postings term filter", postingsScan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      wants = Seq("PushedFilters: [In(term", "ReadSchema"),
      rejects = Seq("PushedFilters: []"))

    // 2. relate join: dimension must broadcast
    check("relate join", Relational.relateJoin(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      wants = Seq("BroadcastHashJoin"),
      rejects = Seq("SortMergeJoin"))

    // 3. top orders: TakeOrderedAndProject (no global sort)
    check("top-k orders", Relational.topOrders(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      wants = Seq("TakeOrderedAndProject"))

    // 4. documents scan for token ops: column pruning to (doc_id, text)
    check("tokens column pruning", TextOps.tokens(TextOps.documents(spark, sfDir))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      wants = Seq("ReadSchema: struct<doc_id:bigint,text:string>"))

    // 5. bm25 oracle plan: hash aggregation end-to-end, broadcast joins,
    // window-group-limit for the rank filter (no full sort of the scored
    // set); the only object-hash aggregate is the collect_list fold
    check("bm25 sql", Bm25Sql.topK(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("HashAggregate", "WindowGroupLimit", "BroadcastHashJoin"),
      rejects = Seq("SortAggregate", "SortMergeJoin", "CartesianProduct"))

    // 6. ns filter pushdown into parquet scan
    check("ns filter pushdown", Relational.namespaceFilter(spark, sfDir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      wants = Seq("PushedFilters: [IsNotNull(event_type)"))

    // 7. IVF/near-dup centroid assignment must be NARROW: exactly one
    // Exchange (the bucket-pair join), none from a per-vector window
    val e = graft.ops.Similarity.embeddings(spark, sfDir)
    val ndPlan = graft.ops.Similarity.embeddingNearDups(e, minCosine = 0.35)
      .queryExecution.executedPlan.toString
    val nExch = ndPlan.linesIterator.count(_.contains("Exchange"))
    println(s"\n===== embed near-dup =====")
    println(s"CHECK exchanges == 1 (bucket join only): " +
      (if (nExch <= 1) "OK" else s"FAIL ($nExch)"))
    check("embed near-dup window-free", ndPlan, wants = Nil, rejects = Seq("Window"))

    // 8. search-surface plans: the tiny query/probe/prefix sides must
    // broadcast (no shuffle of the corpus against 6-row tables), the
    // filter-context semi-join must not sort-merge, and ranked outputs
    // must use WindowGroupLimit (rank pushdown), never a global sort
    val docsDf = TextOps.documents(spark, sfDir)
    check("filtered top-k", graft.query.SearchOps
      .filteredTopK(docsDf, graft.RefQueries.set, col("lang") === "en")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("BroadcastHashJoin", "WindowGroupLimit"),
      rejects = Seq("SortMergeJoin", "CartesianProduct"))
    check("fuzzy expansion", graft.query.SearchOps.fuzzyExpand(docsDf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("BroadcastNestedLoopJoin"),
      rejects = Seq("SortMergeJoin", "CartesianProduct"))
    check("prefix match", graft.query.SearchOps.prefixMatch(docsDf)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("BroadcastNestedLoopJoin"),
      rejects = Seq("SortMergeJoin", "CartesianProduct"))

    // 9. filter-context index query: exclusions must flow in as a cogrouped
    // Dataset (bucketed via the docs table), never as a driver-collected
    // set — the plan must show the CoGroup and a docId join, and the whole
    // query must build WITHOUT any action on the exclusion side
    val exDf = TextOps.documents(spark, sfDir).filter(col("lang") =!= "en")
      .select(col("doc_id").cast("long").as("docId"))
    val fi = graft.query.QueryEngine.topKWhere(spark, idx, graft.RefQueries.set, 10, exDf)
    check("filtered index cogroup", fi.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("CoGroup"),
      rejects = Seq("CartesianProduct"))

    // 9b. index-served DSL: the corpus (documents.parquet) must be GONE
    // from the plans — prefix reads StartsWith-pruned postings, fuzzy reads
    // the terms dictionary, constant_score reads postings only
    val fmt = org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    check("prefix via index (no corpus scan)",
      graft.query.IndexSearch.prefixMatch(spark, idx, graft.query.SearchOps.Prefixes)
        .queryExecution.explainString(fmt),
      wants = Seq("StringStartsWith(term"),
      rejects = Seq("documents.parquet"))
    check("fuzzy via terms dictionary (no corpus scan)",
      graft.query.IndexSearch.fuzzyExpand(spark, idx, graft.query.SearchOps.Fuzzies)
        .queryExecution.explainString(fmt),
      wants = Seq("BroadcastNestedLoopJoin"),
      rejects = Seq("documents.parquet", "SortMergeJoin", "CartesianProduct"))
    check("constant_score via index (no corpus scan)",
      graft.query.IndexSearch.constantScoreTopK(spark, idx, graft.RefQueries.set)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet"))

    // 9c. round-4 DSL: dis_max retrieval is the term-pruned scoredMatches
    // postings scan (corpus gone); the inclusion gate (range/terms filter)
    // must show the polarity CoGroup, never a collected set
    check("dis_max via scoredMatches (no corpus scan)",
      graft.query.IndexSearch.disMaxTopK(spark, idx, graft.RefQueries.set)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet"))
    val allowDf = TextOps.documents(spark, sfDir)
      .filter(col("n_chars").between(150, 400))
      .select(col("doc_id").cast("long").as("docId"))
    check("inclusion gate cogroup (range filter)",
      graft.query.QueryEngine.topKWithin(spark, idx, graft.RefQueries.set, 10, allowDf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("CoGroup"),
      rejects = Seq("CartesianProduct"))

    // 9d. suggester reads ONLY the term dictionary; span_near's positions
    // scan is term-pruned at the parquet reader
    check("term suggester via terms dictionary (no corpus scan)",
      graft.query.IndexSearch.termSuggest(spark, idx, graft.query.SearchOps.Fuzzies)
        .queryExecution.explainString(fmt),
      wants = Seq("BroadcastNestedLoopJoin"),
      rejects = Seq("documents.parquet", "SortMergeJoin", "CartesianProduct"))
    val posDir = graft.IndexCache.positionsForDocuments(spark, sfDir)
    check("span_near positions term pushdown",
      graft.index.Positions.spanNearMatch(spark, posDir, graft.query.SearchOps.SpanPairs)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))

    // 9e. query_string / multi_match / pipeline: the query_string index
    // compilation touches ONLY postings + positions (corpus gone); the
    // per-field multi_match reads two field indexes and no corpus (its
    // full-outer field combiner may sort-merge — both sides are
    // match-set-sized with uniform keys, the correct plan); decontamination
    // broadcasts the benchmark shingle set, never shuffling the corpus
    // against it
    check("query_string via index+positions (no corpus scan)",
      graft.query.QueryString.topKIndex(spark, idx, posDir)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    val srcIdx = graft.IndexCache.forField(spark, sfDir, "source")
    check("multi_match via per-field indexes (no corpus scan)",
      graft.query.IndexSearch.multiMatchTopK(spark, idx, srcIdx)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    check("ids GET pushdown into the docs table",
      graft.query.IndexSearch.idsLookup(spark, idx)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(docId"),
      rejects = Seq("documents.parquet"))
    check("decontaminate broadcasts the benchmark set",
      graft.ops.Pipeline.decontaminate(docsDf)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("simple")),
      wants = Seq("BroadcastHashJoin"),
      rejects = Seq("SortMergeJoin", "CartesianProduct"))

    // 9f. round-5 forward-index sidecar: significant_terms' foreground
    // incidence and _termvectors serve from the (docId, term, tf) sidecar —
    // the full-postings decode is GONE. Structural assertion: the sidecar
    // is scanned, the corpus is not, and EVERY remaining postings scan in
    // the plan is term-pruned (the un-pruned all-terms scan was the round-4
    // flagged plan).
    def scansPruned(plan: String, table: String, want: String): Boolean = {
      val chunks = plan.split("Scan parquet")
      chunks.drop(1).forall(c => !c.contains(s"/$table]") || c.contains(want))
    }
    val stPlan = graft.query.IndexSearch.significantTerms(spark, idx, graft.RefQueries.set)
      .queryExecution.explainString(fmt)
    check("significant_terms fg via forward sidecar (no corpus, sidecar scanned)",
      stPlan, wants = Seq("termvectors"), rejects = Seq("documents.parquet"))
    println("CHECK want 'every postings scan in sig-terms plan term-pruned': " +
      (if (scansPruned(stPlan, "postings", "In(term")) "OK" else "MISSING"))
    val tvPlan = graft.query.IndexSearch.termVectors(spark, idx)
      .queryExecution.explainString(fmt)
    check("_termvectors sidecar point read (In(docId) pushdown, postings cold)",
      tvPlan, wants = Seq("PushedFilters: [In(docId"),
      rejects = Seq("documents.parquet", "postings"))

    // 9g. scroll page: docId low-bound pushed to the docs scan (row-group
    // pruning), bucket visibility as a partition filter, TakeOrdered for
    // the page limit — deep pagination costs O(page), never O(corpus)
    val scrollCur = graft.query.Scroll.open(spark, idx)
    val scrollRows = graft.query.Scroll.pagePlan(spark, idx, scrollCur, 25)
    check("scroll page pushdown + TakeOrdered", scrollRows.queryExecution.explainString(fmt),
      wants = Seq("GreaterThan(docId", "PartitionFilters: [dbucket", "TakeOrderedAndProject"),
      rejects = Seq("documents.parquet", "Exchange rangepartitioning"))

    // 9h. round-5 extended query surface: every new index-served twin must
    // keep the postings/positions scan term-pruned and never touch the
    // corpus except via the bounded stored-field join (docs projected to
    // 2-3 columns, matched rows only — assert the posting scan is pruned).
    val rfPlan = graft.query.IndexSearch.rankFeature(spark, idx, graft.RefQueries.set, docsDf)
      .queryExecution.explainString(fmt)
    println("CHECK want 'rank_feature postings scans term-pruned': " +
      (if (scansPruned(rfPlan, "postings", "In(term")) "OK" else "MISSING"))
    val smPlan = graft.query.IndexSearch.samplerAgg(spark, idx, graft.RefQueries.set, docsDf)
      .queryExecution.explainString(fmt)
    println("CHECK want 'sampler postings scans term-pruned': " +
      (if (scansPruned(smPlan, "postings", "In(term")) "OK" else "MISSING"))
    check("intervals via positional sidecar (term-pruned, no corpus)",
      graft.index.Positions.intervalsMatch(spark, posDir, graft.query.SearchOps.IntervalRules)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    check("span_first via sidecar head positions (term-pruned, no corpus, no shuffle)",
      graft.index.Positions.spanFirstMatch(spark, posDir, graft.query.SearchOps.SpanFirstProbes)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "Exchange hashpartitioning"))
    check("span_or via sidecar position-list lengths (term-pruned, broadcast clauses, no corpus)",
      graft.index.Positions.spanOrMatch(spark, posDir, graft.query.SearchOps.SpanOrClauses)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term", "BroadcastHashJoin"),
      rejects = Seq("documents.parquet", "SortMergeJoin", "CartesianProduct"))
    check("span_not via sidecar exclusion windows (term-pruned, no corpus)",
      graft.index.Positions.spanNotMatch(spark, posDir, graft.query.SearchOps.SpanNotProbes)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    check("match_bool_prefix via postings (Or(In,StartsWith) pushdown, no corpus)",
      graft.query.IndexSearch.matchBoolPrefix(spark, idx, graft.query.SearchOps.PhrasePrefixes)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [Or("),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    check("simple_query_string via postings + positions sidecar (no corpus scan)",
      graft.query.QueryString.simpleCountIndex(spark, idx, posDir)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [Or("),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    // rrf hybrid: lexical leg from postings (term pushdown), knn leg from
    // the embeddings table with queries broadcast; the corpus text is never
    // scanned and the fusion join is over two top-window lists
    check("rrf hybrid via WAND + broadcast knn leg (no corpus scan)",
      graft.query.IndexSearch.rrfHybrid(spark, idx,
        spark.read.parquet(s"$sfDir/embeddings.parquet"), graft.RefQueries.set)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term", "BroadcastNestedLoopJoin"),
      rejects = Seq("documents.parquet"))
    // rank_eval: page from WAND, judgments from postings-only scoredMatches
    check("rank_eval via WAND page + postings judgments (no corpus scan)",
      graft.query.IndexSearch.rankEval(spark, idx, graft.RefQueries.set)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    // linear retriever: same two-index shape as rrf, scores instead of ranks
    check("linear retriever via WAND scores + broadcast knn leg (no corpus scan)",
      graft.query.IndexSearch.linearHybrid(spark, idx,
        spark.read.parquet(s"$sfDir/embeddings.parquet"), graft.RefQueries.set)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term", "BroadcastNestedLoopJoin"),
      rejects = Seq("documents.parquet"))
    // span_containing / span_within: three-term-pruned sidecar cogroup
    check("span_containing via sidecar cogroup (term-pruned, no corpus)",
      graft.index.Positions.spanContainMatch(spark, posDir,
        graft.query.SearchOps.SpanContainProbes, within = false)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    check("span_within via sidecar cogroup (term-pruned, no corpus)",
      graft.index.Positions.spanContainMatch(spark, posDir,
        graft.query.SearchOps.SpanContainProbes, within = true)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    // terms_enum: dictionary-only walk, prefix pushdown, no postings decode
    check("terms_enum via terms dictionary (StartsWith pushdown, no corpus, no postings)",
      graft.query.IndexSearch.termsEnum(spark, idx)
        .queryExecution.explainString(fmt),
      wants = Seq("StartsWith(term"),
      rejects = Seq("documents.parquet", "postings", "CartesianProduct"))
    // mget: docs-sidecar point read, In(docId) row-group pruning, misses kept
    check("mget via docs sidecar (In(docId) pushdown, no corpus)",
      graft.query.IndexSearch.mget(spark, idx)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(docId", "BroadcastHashJoin"),
      rejects = Seq("documents.parquet", "postings", "SortMergeJoin"))
    // geohash_grid: 32^5 possible cells — the top-n must be a distributed
    // heap (TakeOrderedAndProject), not a global window over the cell table
    check("geohash_grid top-n via TakeOrderedAndProject (no global cell window)",
      graft.ops.Geo.geohashGrid(graft.ops.Geo.events(spark, sfDir))
        .queryExecution.explainString(fmt),
      wants = Seq("TakeOrderedAndProject"),
      rejects = Seq("CartesianProduct"))
    // global agg: one O(1) global row broadcast onto per-query metrics
    check("global agg via postings match + docs-sidecar global (no corpus)",
      graft.query.IndexSearch.globalAgg(spark, idx, graft.RefQueries.set)
        .queryExecution.explainString(fmt),
      wants = Seq("PushedFilters: [In(term", "BroadcastNestedLoopJoin"),
      rejects = Seq("documents.parquet"))

    // combined_fields: BOTH per-field postings scans must be term-pruned
    // (In(term) pushdown), never a corpus scan — the blended statistics are
    // reconstructed from index data alone
    val cfSrcIdx = graft.IndexCache.forField(spark, sfDir, "source")
    val cfPlan = graft.query.IndexSearch.combinedFieldsTopK(spark, idx, cfSrcIdx)
      .queryExecution.explainString(fmt)
    check("combined_fields via two term-pruned per-field indexes (no corpus)",
      cfPlan,
      wants = Seq("PushedFilters: [In(term"),
      rejects = Seq("documents.parquet", "CartesianProduct"))
    // both field indexes' postings must appear (two distinct scans)
    println("CHECK want both field indexes scanned: " +
      (if (cfPlan.contains(idx) && cfPlan.contains(cfSrcIdx)) "OK" else "MISSING"))
    // span_multi: prefix expansion walks the terms DICTIONARY
    // (StartsWith-pruned), the match rides the positional sidecar — the
    // corpus and the postings stay untouched
    val smPosDir = graft.IndexCache.positionsForDocuments(spark, sfDir)
    check("span_multi via dictionary expansion + positional sidecar (no corpus)",
      graft.query.IndexSearch.spanMultiMatch(spark, idx, smPosDir)
        .queryExecution.explainString(fmt),
      wants = Seq("positions"),
      rejects = Seq("documents.parquet", "CartesianProduct"))

    // 10. urlmap recrawl lookup: partition pruning on urange must reach the
    // scan (streaming append O(batch) contract)
    val tmpIdx = java.nio.file.Files.createTempDirectory("plancheck-idx").toString
    graft.streaming.StreamIngest.appendBatch(spark,
      { import spark.implicits._
        spark.createDataset(graft.corpus.Corpus.synthetic(50, seed = 3L)) },
      tmpIdx, bucketSize = 64, snapshotId = 1)
    val pruned = spark.read.parquet(s"$tmpIdx/urlmap")
      .filter(col("urange").isin(1, 2, 3))
    check("urlmap partition pruning", pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")),
      wants = Seq("PartitionFilters: [urange"))

    println(s"\nPLANCHECK TOTAL: $nAsserts assertions in $nChecks checks, " +
      s"$nFailed failed" + (if (nFailed == 0) " — ALL OK" else ""))

    spark.stop()
  }
}
