package graft

import graft.ops.{Dedup, Geo, Multimodal, Relational, Similarity, TextOps}
import graft.query.{AggsExt, Bm25Sql, IndexSearch, QueryEngine, SearchOps}
import graft.sources.Discovery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), each with an exact DuckDB SQL oracle where the operator
  * is SQL-expressible. Binary posting blocks / WAND internals are covered
  * by `q_wand_topk` (which must equal the *relational* BM25 oracle —
  * the strongest cross-check) plus ScalaTest.
  */
object SparkEntry {

  /** range-filter fixture bounds on `n_chars` (corpus spans ~[48, 553]). */
  private val RangeLo = 150L
  private val RangeHi = 400L

  /** Flagship: WAND BM25 top-k over the inverted index on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    wandTopK(spark, "/root/testdata/sf0.001")

  private def wandTopK(spark: SparkSession, sfDir: String): DataFrame = {
    val idx = IndexCache.forDocuments(spark, sfDir)
    QueryEngine.topK(spark, idx, RefQueries.set, RefQueries.K).toDF()
      .select(col("queryId").as("query_id"), col("rank"),
        col("docId").as("doc_id"), round(col("score"), 4).as("score"))
      .orderBy("query_id", "rank")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- full-text core (the engine itself) ----
    "q_corpus_stats" -> ((s, d) => {
      val dl = TextOps.doclens(TextOps.documents(s, d))
      dl.agg(count(lit(1)).as("n_docs"), sum("doclen").as("total_tokens"),
        round(sum("doclen").cast("double") / count(lit(1)).cast("double") + lit(1.0e-9), 4).as("avgdl"))
    }),
    "q_term_df" -> ((s, d) =>
      TextOps.tokens(TextOps.documents(s, d))
        .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
        .orderBy("term")),
    "q_term_tf" -> ((s, d) =>
      TextOps.termFreqs(TextOps.documents(s, d)).orderBy("doc_id", "term")),
    "q_doclen" -> ((s, d) =>
      TextOps.doclens(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_bm25_topk" -> ((s, d) => Bm25Sql.topK(s, d)),
    "q_wand_topk" -> ((s, d) => wandTopK(s, d)),
    // ---- Unicode analysis chain (default analyzer) ----
    "q_tokenize_unicode" -> ((s, d) => {
      import s.implicits._
      val an = graft.textprep.TextPrep.Analyzer.Unicode
      UnicodeFixture.docs(s, d)
        .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
        .map { case (id, t) =>
          val toks = an.tokenize(t)
          (id, toks.length.toLong, toks.mkString(" "))
        }
        .toDF("doc_id", "doclen", "toks").orderBy("doc_id")
    }),
    "q_wand_unicode" -> ((s, d) => {
      // block-max WAND over the unicode-analyzed index; query text runs
      // through the index's RECORDED analyzer (IndexBuilder.analyzerOf)
      val idx = IndexCache.unicodeForDocuments(s, d)
      QueryEngine.topK(s, idx, UnicodeFixture.Queries, UnicodeFixture.K).toDF()
        .select(col("queryId").as("query_id"), col("rank"),
          col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("query_id", "rank")
    }),
    "q_bool_and" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      QueryEngine.topKAnd(s, idx, RefQueries.set, RefQueries.K).toDF()
        .select(col("queryId").as("query_id"), col("rank"),
          col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("query_id", "rank")
    }),
    "q_facet_counts" -> ((s, d) =>
      SearchOps.facetCounts(TextOps.documents(s, d), RefQueries.set, "lang")
        .orderBy("query_id", "lang")),
    "q_snippets" -> ((s, d) =>
      SearchOps.snippets(TextOps.documents(s, d), RefQueries.set, k = 3)
        .orderBy("query_id", "rank")),
    "q_should_match" -> ((s, d) =>
      SearchOps.shouldMatchTopK(TextOps.documents(s, d), RefQueries.set, m = 2)
        .orderBy("query_id", "rank")),
    "q_filtered_topk" -> ((s, d) =>
      SearchOps.filteredTopK(TextOps.documents(s, d), RefQueries.set, col("lang") === "en")
        .orderBy("query_id", "rank")),
    "q_filtered_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      // exclusions stay a Dataset end-to-end (bucketed inside topKWhere) —
      // no O(corpus) driver collect even for a broad filter
      val excluded = TextOps.documents(s, d).filter(col("lang") =!= "en")
        .select(col("doc_id").cast("long").as("docId"))
      QueryEngine.topKWhere(s, idx, RefQueries.set, RefQueries.K, excluded).toDF()
        .select(col("queryId").as("query_id"), col("rank"),
          col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("query_id", "rank")
    }),
    "q_search_after" -> ((s, d) =>
      SearchOps.searchAfterPage(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "page_rank")),
    "q_bool_not" -> ((s, d) =>
      SearchOps.mustNotTopK(TextOps.documents(s, d), RefQueries.set, banned = "customer")
        .orderBy("query_id", "rank")),
    "q_more_like_this" -> ((s, d) =>
      SearchOps.moreLikeThis(TextOps.documents(s, d), col("doc_id") < 5)
        .orderBy("seed_id", "rank")),
    "q_sort_by_field" -> ((s, d) =>
      SearchOps.sortByField(TextOps.documents(s, d), RefQueries.set, "n_chars")
        .orderBy("query_id", "rank")),
    "q_boost_match" -> ((s, d) =>
      SearchOps.boostedTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_constant_score" -> ((s, d) =>
      SearchOps.constantScoreTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_prefix_match" -> ((s, d) =>
      SearchOps.prefixMatch(TextOps.documents(s, d)).orderBy("prefix_id")),
    "q_fuzzy_expand" -> ((s, d) =>
      SearchOps.fuzzyExpand(TextOps.documents(s, d)).orderBy("query_id", "term")),
    "q_phrase_match" -> ((s, d) =>
      SearchOps.phraseCounts(TextOps.documents(s, d)).orderBy("phrase_id", "doc_id")),
    "q_phrase_index" -> ((s, d) => {
      // positional-index path; must equal the narrow relational twin above
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.phraseMatch(s, pos, SearchOps.Phrases)
        .orderBy("phrase_id", "doc_id")
    }),
    "q_index_termstats" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      // terms may hold several append segments — aggregate on read
      s.read.parquet(s"$idx/terms").groupBy("term")
        .agg(sum("df").as("df")).orderBy("term")
    }),
    "q_phrase_suggest" -> ((s, d) =>
      // ES phrase suggester: bigram-LM-ranked whole-phrase corrections
      SearchOps.phraseSuggest(TextOps.documents(s, d)).orderBy("probe_id", "rank")),
    "q_phrase_suggest_index" -> ((s, d) => {
      // dictionary (df, cf) + shingle sidecar; zero corpus access
      val idx = IndexCache.forDocuments(s, d)
      val big = IndexCache.bigramsForDocuments(s, d)
      IndexSearch.phraseSuggest(s, idx, big, SearchOps.PhraseProbes)
        .orderBy("probe_id", "rank")
    }),
    "q_completion_suggest" -> ((s, d) =>
      // ES completion suggester: autocomplete shortlist ranked by df
      SearchOps.completionSuggest(TextOps.documents(s, d)).orderBy("prefix_id", "rank")),
    "q_completion_index" -> ((s, d) => {
      // StartsWith-pruned term-dictionary scan; must equal the twin above
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.completionSuggest(s, idx, SearchOps.Prefixes)
        .orderBy("prefix_id", "rank")
    }),
    "q_span_near" -> ((s, d) =>
      // ES span_near (in_order, slop=3): narrow per-doc position-pair fold
      SearchOps.spanNearCounts(TextOps.documents(s, d)).orderBy("pair_id", "doc_id")),
    "q_span_near_index" -> ((s, d) => {
      // positional-sidecar twin; must equal the relational path above
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.spanNearMatch(s, pos, SearchOps.SpanPairs)
        .orderBy("pair_id", "doc_id")
    }),
    "q_term_suggest" -> ((s, d) =>
      // ES term suggester (did-you-mean): ranked correction shortlist
      SearchOps.termSuggest(TextOps.documents(s, d)).orderBy("query_id", "rank")),
    "q_suggest_index" -> ((s, d) => {
      // same suggester served from the index's term dictionary
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.termSuggest(s, idx, SearchOps.Fuzzies).orderBy("query_id", "rank")
    }),
    "q_rescore" -> ((s, d) =>
      // ES rescore: top-20 BM25 window reranked by exact-phrase bonus
      SearchOps.rescoreTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_rescore_index" -> ((s, d) => {
      // WAND retrieval window + positional-sidecar phrase secondary; must
      // hash-equal the relational twin above
      val idx = IndexCache.forDocuments(s, d)
      val pos = IndexCache.positionsForDocuments(s, d)
      IndexSearch.rescoreTopK(s, idx, pos, RefQueries.set)
        .orderBy("query_id", "rank")
    }),

    // ---- the same query DSL served FROM the index (IndexSearch) — each
    // entry shares its relational twin's oracle, so the driver hash-checks
    // index path ≡ full-scan path, the q_filtered_index pattern ----
    "q_bool_not_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.mustNotTopK(s, idx, RefQueries.set, banned = "customer").toDF()
        .select(col("queryId").as("query_id"), col("rank"),
          col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("query_id", "rank")
    }),
    "q_should_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      QueryEngine.topKShould(s, idx, RefQueries.set, RefQueries.K, m = 2).toDF()
        .select(col("queryId").as("query_id"), col("rank"),
          col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("query_id", "rank")
    }),
    "q_boost_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      QueryEngine.topKBoosted(s, idx, RefQueries.set, RefQueries.K, SearchOps.Boosts.toMap).toDF()
        .select(col("queryId").as("query_id"), col("rank"),
          col("docId").as("doc_id"), round(col("score"), 4).as("score"))
        .orderBy("query_id", "rank")
    }),
    "q_constant_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.constantScoreTopK(s, idx, RefQueries.set).orderBy("query_id", "rank")
    }),
    "q_facet_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.facetCounts(s, idx, RefQueries.set, TextOps.documents(s, d), "lang")
        .orderBy("query_id", "lang")
    }),
    "q_sort_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.sortByField(s, idx, RefQueries.set, TextOps.documents(s, d), "n_chars")
        .orderBy("query_id", "rank")
    }),
    "q_search_after_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.searchAfterPage(s, idx, RefQueries.set).orderBy("query_id", "page_rank")
    }),
    "q_mlt_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.moreLikeThis(s, idx,
        TextOps.documents(s, d).filter(col("doc_id") < 5).select("doc_id", "text"))
        .orderBy("seed_id", "rank")
    }),
    "q_prefix_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.prefixMatch(s, idx, SearchOps.Prefixes).orderBy("prefix_id")
    }),
    "q_fuzzy_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.fuzzyExpand(s, idx, SearchOps.Fuzzies).orderBy("query_id", "term")
    }),

    "q_snippets_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.snippets(s, idx, RefQueries.set, TextOps.documents(s, d), k = 3)
        .orderBy("query_id", "rank")
    }),

    // ---- ES aggregation DSL (histogram / stats / cardinality /
    // date_histogram) + multi-term rewrites (wildcard / regexp), each as a
    // relational form and an index-served twin sharing one oracle ----
    "q_histogram_agg" -> ((s, d) =>
      SearchOps.histogramAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "bucket_lo")),
    "q_histogram_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.histogramAgg(s, idx, RefQueries.set, TextOps.documents(s, d),
        "n_chars", 200L).orderBy("query_id", "bucket_lo")
    }),
    "q_stats_agg" -> ((s, d) =>
      SearchOps.statsAgg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_stats_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.statsAgg(s, idx, RefQueries.set, TextOps.documents(s, d), "n_chars")
        .orderBy("query_id")
    }),
    "q_cardinality_agg" -> ((s, d) =>
      SearchOps.cardinalityAgg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_cardinality_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.cardinalityAgg(s, idx, RefQueries.set, TextOps.documents(s, d), "source")
        .orderBy("query_id")
    }),
    "q_date_histogram" -> ((s, d) =>
      SearchOps.dateHistogram(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "day")),
    "q_date_histogram_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.dateHistogram(s, idx, RefQueries.set, SearchOps.crawlDay)
        .orderBy("query_id", "day")
    }),
    "q_wildcard_match" -> ((s, d) =>
      SearchOps.wildcardMatch(TextOps.documents(s, d)).orderBy("pattern_id")),
    "q_wildcard_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.wildcardMatch(s, idx, SearchOps.Wildcards).orderBy("pattern_id")
    }),
    "q_regexp_match" -> ((s, d) =>
      SearchOps.regexpMatch(TextOps.documents(s, d)).orderBy("pattern_id")),
    "q_regexp_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.regexpMatch(s, idx, SearchOps.Regexps).orderBy("pattern_id")
    }),

    // ---- dis_max / range filter / percentiles / top_hits /
    // match_phrase_prefix — relational + index-served twins sharing one
    // oracle each ----
    "q_dis_max" -> ((s, d) =>
      SearchOps.disMaxTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_dis_max_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.disMaxTopK(s, idx, RefQueries.set).orderBy("query_id", "rank")
    }),
    "q_range_filter" -> ((s, d) =>
      SearchOps.rangeTopK(TextOps.documents(s, d), RefQueries.set, "n_chars",
        RangeLo, RangeHi).orderBy("query_id", "rank")),
    "q_range_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.rangeTopK(s, idx, RefQueries.set, TextOps.documents(s, d),
        "n_chars", RangeLo, RangeHi).orderBy("query_id", "rank")
    }),
    "q_percentiles_agg" -> ((s, d) =>
      SearchOps.percentilesAgg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_percentiles_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.percentilesAgg(s, idx, RefQueries.set, TextOps.documents(s, d), "n_chars")
        .orderBy("query_id")
    }),
    "q_top_hits" -> ((s, d) =>
      SearchOps.topHitsAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "lang", "rank")),
    "q_top_hits_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.topHits(s, idx, RefQueries.set, TextOps.documents(s, d), "lang")
        .orderBy("query_id", "lang", "rank")
    }),
    "q_phrase_prefix" -> ((s, d) =>
      SearchOps.phrasePrefixCounts(TextOps.documents(s, d))
        .orderBy("phrase_id", "doc_id")),
    "q_phrase_prefix_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.phrasePrefixMatch(s, pos, SearchOps.PhrasePrefixes)
        .orderBy("phrase_id", "doc_id")
    }),
    "q_function_score" -> ((s, d) =>
      SearchOps.functionScoreTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_function_score_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.functionScoreTopK(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "rank")
    }),
    "q_bool_full" -> ((s, d) =>
      SearchOps.boolFullTopK(TextOps.documents(s, d)).orderBy("query_id", "rank")),
    "q_bool_full_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.boolFullTopK(s, idx).orderBy("query_id", "rank")
    }),
    "q_sig_terms" -> ((s, d) =>
      SearchOps.significantTerms(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_sig_terms_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.significantTerms(s, idx, RefQueries.set).orderBy("query_id", "rank")
    }),
    "q_collapse" -> ((s, d) =>
      SearchOps.collapseTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_collapse_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.collapseTopK(s, idx, RefQueries.set, TextOps.documents(s, d), "source")
        .orderBy("query_id", "rank")
    }),
    // ---- hybrid retrieval (ES 8 retriever: rrf) + ranking evaluation ----
    "q_rrf_hybrid" -> ((s, d) =>
      SearchOps.rrfHybrid(TextOps.documents(s, d), Similarity.embeddings(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_rrf_hybrid_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.rrfHybrid(s, idx, Similarity.embeddings(s, d), RefQueries.set)
        .orderBy("query_id", "rank")
    }),
    "q_rank_eval" -> ((s, d) =>
      SearchOps.rankEval(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id")),
    "q_rank_eval_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.rankEval(s, idx, RefQueries.set).orderBy("query_id")
    }),
    // ---- linear retriever (ES 8.16 weighted-score fusion) ----
    "q_linear_hybrid" -> ((s, d) =>
      SearchOps.linearHybrid(TextOps.documents(s, d), Similarity.embeddings(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_linear_hybrid_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.linearHybrid(s, idx, Similarity.embeddings(s, d), RefQueries.set)
        .orderBy("query_id", "rank")
    }),
    // ---- span_containing / span_within: the last span-family members ----
    "q_span_containing" -> ((s, d) =>
      SearchOps.spanContainCounts(TextOps.documents(s, d), within = false)
        .orderBy("probe_id", "doc_id")),
    "q_span_containing_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.spanContainMatch(s, pos, SearchOps.SpanContainProbes, within = false)
        .orderBy("probe_id", "doc_id")
    }),
    "q_span_within" -> ((s, d) =>
      SearchOps.spanContainCounts(TextOps.documents(s, d), within = true)
        .orderBy("probe_id", "doc_id")),
    "q_span_within_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.spanContainMatch(s, pos, SearchOps.SpanContainProbes, within = true)
        .orderBy("probe_id", "doc_id")
    }),
    // ---- _terms_enum / _mget APIs ----
    "q_terms_enum" -> ((s, d) =>
      SearchOps.termsEnum(TextOps.documents(s, d)).orderBy("probe_id", "rank")),
    "q_terms_enum_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.termsEnum(s, idx).orderBy("probe_id", "rank")
    }),
    "q_mget" -> ((s, d) =>
      SearchOps.mget(TextOps.documents(s, d)).orderBy("req_id")),
    "q_mget_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.mget(s, idx).orderBy("req_id")
    }),
    // ---- has_child / has_parent (ES parent-join) ----
    "q_has_child" -> ((s, d) => Relational.hasChild(s, d).orderBy("c_custkey")),
    "q_has_parent" -> ((s, d) => Relational.hasParent(s, d).orderBy("o_orderkey")),
    "q_nested_agg" -> ((s, d) =>
      SearchOps.nestedAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "lang")),
    "q_nested_agg_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.nestedAgg(s, idx, RefQueries.set, TextOps.documents(s, d), "lang", "n_chars")
        .orderBy("query_id", "lang")
    }),
    "q_terms_filter" -> ((s, d) =>
      SearchOps.termsFilterTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_terms_filter_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.termsFilterTopK(s, idx, RefQueries.set, TextOps.documents(s, d),
        "lang", SearchOps.TermsFilterLangs).orderBy("query_id", "rank")
    }),

    // ---- reference pipeline operators (monstache analogs) ----
    "q_version_dedup" -> ((s, d) => Relational.versionDedup(s, d).drop("ts")),
    "q_ns_filter" -> ((s, d) => Relational.namespaceFilter(s, d)),
    "q_relate_join" -> ((s, d) => Relational.relateJoin(s, d)),
    "q_relate_2hop" -> ((s, d) => Relational.relateTwoHop(s, d)),
    "q_tombstone_anti" -> ((s, d) => Relational.tombstoneAntiJoin(s, d)),
    "q_patch_lag" -> ((s, d) => Relational.patchHistory(s, d)),
    "q_time_machine" -> ((s, d) => Relational.timeMachine(s, d)),
    "q_bitpack_version" -> ((s, d) => Relational.bitpackVersions(s, d)),
    "q_top_orders" -> ((s, d) => Relational.topOrders(s, d)),
    "q_worker_partition" -> ((s, d) => Relational.workerPartition(s, d)),
    "q_json_path" -> ((s, d) => Relational.jsonPath(s, d)),
    "q_invalid_prune" -> ((s, d) => Relational.invalidPrune(s, d)),
    "q_canonical_encode" -> ((s, d) => Relational.canonicalEncode(s, d)),
    "q_merge_patch" -> ((s, d) => Relational.mergePatch(s, d)),
    "q_index_routing" -> ((s, d) => Relational.indexRouting(s, d)),
    "q_ns_discovery" -> ((s, d) =>
      Discovery.namespaceCounts(s, d, include = "^(nation|region|supplier)$", exclude = "^region$")),
    "q_transform_config" -> ((s, d) => {
      // F6/M7: the chain comes from the shipped config resource at runtime
      // (lowercase_text,strip_punct,drop_short for namespace `documents`)
      val cfg = graft.ops.Transforms.fromResource()
      graft.ops.Transforms(cfg, "documents", TextOps.documents(s, d))
        .select(col("doc_id"), md5(col("text")).as("text_hash"),
          length(col("text")).cast("bigint").as("n_chars_t"))
        .orderBy("doc_id")
    }),

    // ---- training-data pipeline: dedup ----
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(TextOps.documents(s, d)).orderBy("content_hash")),
    "q_dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(TextOps.documents(s, d), n = 3, minJaccard = 0.1)
        .orderBy("id_a", "id_b")),
    "q_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLshPairs(TextOps.documents(s, d), n = 3, k = 8, bands = 4,
        minEstJaccard = 0.25).orderBy("id_a", "id_b")),
    "q_chunk_dedup" -> ((s, d) =>
      Dedup.chunkDedup(TextOps.documents(s, d), w = 10).orderBy("doc_id")),
    "q_neardup_clusters" -> ((s, d) =>
      Dedup.connectedComponents(
        Dedup.minhashLshPairs(TextOps.documents(s, d), n = 3, k = 8, bands = 4,
          minEstJaccard = 0.25)).orderBy("doc_id")),
    "q_pii_redact" -> ((s, d) => {
      val docs = TextOps.documents(s, d)
      val withPii = docs.select(col("doc_id"), concat(
        col("text"), lit(" contact "), col("source"), (col("doc_id") % 97).cast("string"),
        lit("@crawl.example.com tel 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        when(col("doc_id") % 3 === 0, lit(" cc admin@site.example.org")).otherwise(lit(""))).as("text"))
      TextOps.piiRedact(withPii).orderBy("doc_id")
    }),
    "q_url_dedup" -> ((s, d) => {
      val docs = TextOps.documents(s, d)
      val pages = docs.select(col("doc_id"), concat(
        lit("HTTPS://WWW."), col("source"), lit(".Example.com/"),
        (col("doc_id") % 17).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=feed&ref="), col("doc_id").cast("string")).as("url"))
      Dedup.urlDedup(pages).orderBy("norm_url")
    }),
    "q_rep_signals" -> ((s, d) =>
      TextOps.repetitionSignals(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_quality_filter" -> ((s, d) =>
      TextOps.qualityFilter(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_top_terms" -> ((s, d) =>
      TextOps.topTerms(TextOps.documents(s, d)).orderBy("doc_id", "rank")),
    "q_pmi_pairs" -> ((s, d) =>
      TextOps.collocations(TextOps.documents(s, d)).orderBy("w1", "w2")),
    "q_source_report" -> ((s, d) =>
      TextOps.sourceReport(TextOps.documents(s, d)).orderBy("source")),
    "q_len_deciles" -> ((s, d) =>
      TextOps.lenDeciles(TextOps.documents(s, d)).orderBy("decile")),
    "q_sq8_topk" -> ((s, d) => {
      val emb = Similarity.embeddings(s, d)
      Similarity.sq8TopK(emb, emb.filter(col("vec_id") < 3)).orderBy("query_id", "rank")
    }),
    "q_sq8_ivf" -> ((s, d) => {
      // SQ8 quantization composed with IVF bucketing — the serving path
      // (memory AND compute scale); exact within the probed buckets
      val emb = Similarity.embeddings(s, d)
      Similarity.sq8IvfTopK(emb, emb.filter(col("vec_id") < 3)).orderBy("query_id", "rank")
    }),
    "q_simhash_pairs" -> ((s, d) =>
      // radius 3 with 4 disjoint 16-bit bands: candidate recall is COMPLETE
      // by pigeonhole (bands = maxHamming + 1)
      Dedup.simhashPairs(TextOps.documents(s, d), maxHamming = 3)
        .orderBy("id_a", "id_b")),

    // ---- training-data pipeline: similarity / text analysis ----
    "q_ann_cosine" -> ((s, d) => {
      val e = Similarity.embeddings(s, d)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 3), k = 10)
        .orderBy("query_id", "rank")
    }),
    "q_ann_ivf" -> ((s, d) => {
      val e = Similarity.embeddings(s, d)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 3), k = 10)
        .orderBy("query_id", "rank")
    }),
    "q_ann_recall" -> ((s, d) => {
      val e = Similarity.embeddings(s, d)
      Similarity.ivfRecall(e, e.filter(col("vec_id") < 3), k = 10)
        .orderBy("query_id")
    }),
    "q_embed_neardup" -> ((s, d) =>
      // threshold calibrated to the harness corpus (synthetic embeddings
      // are near-orthogonal; real near-dup corpora use ~0.9)
      Similarity.embeddingNearDups(Similarity.embeddings(s, d), minCosine = 0.35)
        .orderBy("id_a", "id_b")),
    "q_lang_quality" -> ((s, d) =>
      TextOps.qualityFeatures(TextOps.documents(s, d))
        .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
          round(col("mean_tok_len") + lit(1.0e-9), 4).as("mean_tok_len"),
          round(col("stop_ratio") + lit(1.0e-9), 4).as("stop_ratio"),
          round(col("punct_ratio") + lit(1.0e-9), 4).as("punct_ratio"), col("quality"))
        .orderBy("doc_id")),
    "q_token_counts" -> ((s, d) =>
      TextOps.tokenCounts(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_fingerprint" -> ((s, d) =>
      TextOps.fingerprints(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_lang_id" -> ((s, d) => TextOps.langId(TextOps.documents(s, d)).orderBy("doc_id")),

    // ---- multimodal plumbing ----
    "q_media_meta" -> ((s, d) =>
      // mixedPayload injects png/jpeg/riff magic prefixes on doc_id mod 4 =
      // 0/1/2 — all sniff branches run, the oracle predicts each analytically
      Multimodal.mediaMeta(Multimodal.mixedPayload(s, d))
        .select("doc_id", "byte_len", "magic", "kind").orderBy("doc_id")),
    "q_media_frames" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.mixedPayload(s, d)).orderBy("doc_id", "frame")),
    "q_media_oversize" -> ((s, d) =>
      // S7 max-file-size guard audit (monstache.go:1405-1433): per kind,
      // kept vs dropped under the 300-byte cap
      Multimodal.oversizeReport(Multimodal.mixedPayload(s, d), maxBytes = 300)
        .orderBy("kind")),
    "q_scroll_export" -> ((s, d) => {
      // snapshot-pinned scroll: a 3-page cursor chain over the docs table
      // (docId-ordered, pushdown-paged) ≡ the first 120 docs of a deep
      // export at the same snapshot
      val idx = IndexCache.forDocuments(s, d)
      graft.query.Scroll.export(s, idx, nPages = 3, pageSize = 40)
        .select(col("page"), col("docId").as("doc_id"),
          col("doclen").cast("long").as("doclen"))
        .orderBy("doc_id")
    }),
    "q_doc_meta_routing" -> ((s, d) => {
      // per-doc meta override channel (parseIndexMeta, monstache.go:1080-
      // 1103): per (target index, routing group) — doc count, number of
      // buckets the group landed in (= ceil(n/32): contiguous co-location),
      // and min/max LWW version (external override vs ts<<32 default).
      // routing is re-derived from doc_id (the fixture rule) — the BUCKETS
      // come from the built index, so co-location is verified physically.
      val base = IndexCache.docMetaForDocuments(s, d)
      val docs = s.read.parquet(s"$base/main/docs").withColumn("target", lit("main"))
        .unionByName(s.read.parquet(s"$base/alt/docs").withColumn("target", lit("alt")))
      docs.withColumn("did", regexp_extract(col("url"), "/(\\d+)$", 1).cast("long"))
        .withColumn("routing",
          when(col("did") % 2 === 0, concat(lit("r"), (col("did") % 5).cast("string")))
            .otherwise(lit("")))
        .groupBy("target", "routing")
        .agg(count(lit(1)).as("n_docs"),
          count_distinct(col("bucket")).as("n_buckets"),
          min("version").as("min_version"), max("version").as("max_version"))
        .orderBy("target", "routing")
    }),
    "q_media_dims" -> ((s, d) =>
      // REAL header parsing (PNG IHDR / JPEG SOF walk / GIF LSD): the
      // fixture encodes dims as pure doc_id arithmetic inside real headers,
      // so the oracle checks the parser against the format spec
      Multimodal.mediaDims(Multimodal.dimsPayload(s, d)).orderBy("doc_id")),
    "q_media_guard" -> ((s, d) =>
      // S7 guard IN the ingest path, content-omit semantics: oversized
      // payloads keep their row with NULL features and kind 'omitted'
      // (monstache.go:1423-1427 indexes the doc without the file field)
      Multimodal.guardedMeta(Multimodal.mixedPayload(s, d), maxBytes = 300)
        .orderBy("doc_id")),

    // ---- query_string: the end-user query language over the index ----
    "q_query_string" -> ((s, d) =>
      graft.query.QueryString.topK(TextOps.documents(s, d))
        .orderBy("query_id", "rank")),
    "q_query_string_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.query.QueryString.topKIndex(s, idx, pos).orderBy("query_id", "rank")
    }),

    // ---- multi-field + composite-agg surface ----
    "q_multi_match" -> ((s, d) =>
      SearchOps.multiMatchTopK(TextOps.documents(s, d)).orderBy("query_id", "rank")),
    "q_multi_match_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      val src = IndexCache.forField(s, d, "source")
      IndexSearch.multiMatchTopK(s, idx, src).orderBy("query_id", "rank")
    }),
    "q_percolate" -> ((s, d) =>
      SearchOps.percolate(TextOps.documents(s, d)).orderBy("doc_id", "query_id")),
    "q_ann_filtered" -> ((s, d) => {
      val e = Similarity.embeddings(s, d)
      Similarity.filteredBruteTopK(e, e.filter(col("vec_id") < 3),
        col("label") === 1, k = 10).orderBy("query_id", "rank")
    }),
    "q_ids_lookup" -> ((s, d) =>
      SearchOps.idsLookup(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_ids_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.idsLookup(s, idx).orderBy("doc_id")
    }),
    "q_composite_agg" -> ((s, d) =>
      SearchOps.compositeAggPage(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "page_rank")),
    "q_composite_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.compositeAggPage(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "page_rank")
    }),

    // ---- the full _search request (bool + filter + hits/highlight + aggs) ----
    "q_search_hits" -> ((s, d) =>
      graft.query.Search.execute(TextOps.documents(s, d))._1.orderBy("query_id", "rank")),
    "q_search_aggs" -> ((s, d) =>
      graft.query.Search.execute(TextOps.documents(s, d))._2.orderBy("query_id", "lang")),
    "q_search_hits_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      graft.query.Search.executeIndex(s, idx, TextOps.documents(s, d))._1
        .orderBy("query_id", "rank")
    }),
    "q_search_aggs_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      graft.query.Search.executeIndex(s, idx, TextOps.documents(s, d))._2
        .orderBy("query_id", "lang")
    }),

    // ---- training-shard pipeline: decontamination, balancing, packing ----
    "q_decontaminate" -> ((s, d) =>
      graft.ops.Pipeline.decontaminate(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_source_sample" -> ((s, d) =>
      graft.ops.Pipeline.sourceSample(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_seq_pack" -> ((s, d) =>
      graft.ops.Pipeline.seqPack(TextOps.documents(s, d)).orderBy("doc_id")),
    "q_unigram_nll" -> ((s, d) =>
      TextOps.unigramSurprisal(TextOps.documents(s, d)).orderBy("doc_id")),

    // ---- boosting / range + filters aggs / _count / _termvectors / _explain ----
    "q_boosting" -> ((s, d) =>
      SearchOps.boostingTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_boosting_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.boostingTopK(s, idx, RefQueries.set).orderBy("query_id", "rank")
    }),
    "q_range_agg" -> ((s, d) =>
      SearchOps.rangeAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "bucket")),
    "q_range_agg_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.rangeAgg(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "bucket")
    }),
    "q_filters_agg" -> ((s, d) =>
      SearchOps.filtersAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "filter_id")),
    "q_filters_agg_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.filtersAgg(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "filter_id")
    }),
    "q_count" -> ((s, d) =>
      SearchOps.countMatches(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_count_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.countMatches(s, idx, RefQueries.set).orderBy("query_id")
    }),
    "q_term_vectors" -> ((s, d) =>
      SearchOps.termVectors(TextOps.documents(s, d)).orderBy("doc_id", "term")),
    "q_term_vectors_index" -> ((s, d) => {
      // forward-index sidecar point-read (In(docId) pushdown) ≡ re-analyze twin
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.termVectors(s, idx).orderBy("doc_id", "term")
    }),
    "q_explain" -> ((s, d) =>
      SearchOps.explainScore(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "term")),
    "q_explain_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.explainScore(s, idx, RefQueries.set).orderBy("query_id", "term")
    }),
    "q_analyze" -> ((s, _) =>
      SearchOps.analyzeText(s).orderBy("text_id", "position")),

    // ---- extended aggregation DSL (metric / bucket / pipeline aggs) ----
    "q_ext_stats" -> ((s, d) =>
      AggsExt.extendedStats(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_weighted_avg" -> ((s, d) =>
      AggsExt.weightedAvg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_value_count" -> ((s, d) =>
      AggsExt.valueCountMissing(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_multi_terms" -> ((s, d) =>
      AggsExt.multiTerms(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "rank")),
    "q_rare_terms" -> ((s, d) =>
      AggsExt.rareTerms(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "rank")),
    "q_adjacency_matrix" -> ((s, d) =>
      AggsExt.adjacencyMatrix(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "key")),
    "q_bucket_selector" -> ((s, d) =>
      AggsExt.bucketSelector(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "rank")),
    "q_pipeline_aggs" -> ((s, d) =>
      AggsExt.pipelineAggs(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "day")),
    "q_top_metrics" -> ((s, d) =>
      AggsExt.topMetrics(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "rank")),
    "q_string_stats" -> ((s, d) =>
      AggsExt.stringStats(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    // ---- terms_set query: relational + index-served twins ----
    "q_terms_set" -> ((s, d) =>
      AggsExt.termsSet(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "doc_id")),
    "q_terms_set_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.termsSet(s, idx, RefQueries.set).orderBy("query_id", "doc_id")
    }),
    // ---- intervals query (ordered all_of + max_gaps): twins ----
    "q_intervals" -> ((s, d) =>
      SearchOps.intervalsCounts(TextOps.documents(s, d)).orderBy("rule_id", "doc_id")),
    "q_intervals_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.intervalsMatch(s, pos, SearchOps.IntervalRules)
        .orderBy("rule_id", "doc_id")
    }),
    // ---- pinned / span_first / auto_date_histogram ----
    "q_pinned" -> ((s, d) =>
      AggsExt.pinnedTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_pinned_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.pinnedTopK(s, idx, RefQueries.set).orderBy("query_id", "rank")
    }),
    "q_span_first" -> ((s, d) =>
      SearchOps.spanFirstCounts(TextOps.documents(s, d)).orderBy("probe_id", "doc_id")),
    "q_span_first_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.spanFirstMatch(s, pos, SearchOps.SpanFirstProbes)
        .orderBy("probe_id", "doc_id")
    }),
    "q_auto_date_histogram" -> ((s, d) =>
      AggsExt.autoDateHistogram(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "bucket")),
    // ---- sampler / diversified_sampler / distance_feature: twins ----
    "q_sampler_agg" -> ((s, d) =>
      AggsExt.samplerAgg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "lang")),
    "q_sampler_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.samplerAgg(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "lang")
    }),
    "q_diversified_sampler" -> ((s, d) =>
      AggsExt.diversifiedSamplerAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "lang")),
    "q_diversified_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.diversifiedSamplerAgg(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "lang")
    }),
    "q_distance_feature" -> ((s, d) =>
      AggsExt.distanceFeatureTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_distance_feature_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.distanceFeature(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "rank")
    }),
    // ---- matrix / quantile / sibling-pipeline aggs ----
    "q_matrix_stats" -> ((s, d) =>
      AggsExt.matrixStats(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_boxplot" -> ((s, d) =>
      AggsExt.boxplot(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_bucket_stats" -> ((s, d) =>
      AggsExt.bucketStats(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_serial_diff" -> ((s, d) =>
      AggsExt.serialDiffNormalize(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "day")),
    // ---- rank_feature + min_score: relational + index-served twins ----
    "q_rank_feature" -> ((s, d) =>
      AggsExt.rankFeatureTopK(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    "q_rank_feature_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.rankFeature(s, idx, RefQueries.set, TextOps.documents(s, d))
        .orderBy("query_id", "rank")
    }),
    // ---- geo surface over events ----
    "q_geo_bbox" -> ((s, d) =>
      Geo.boundingBox(Geo.events(s, d)).orderBy("event_type")),
    "q_geo_distance" -> ((s, d) =>
      Geo.geoDistance(Geo.events(s, d)).orderBy("center_id")),
    "q_geo_centroid" -> ((s, d) =>
      Geo.geoCentroid(Geo.events(s, d)).orderBy("event_type")),
    "q_geotile_grid" -> ((s, d) =>
      Geo.geotileGrid(Geo.events(s, d)).orderBy("rank")),
    "q_geo_bounds" -> ((s, d) =>
      Geo.geoBounds(Geo.events(s, d)).orderBy("event_type")),
    "q_geohash_grid" -> ((s, d) =>
      Geo.geohashGrid(Geo.events(s, d)).orderBy("rank")),
    "q_cumulative_cardinality" -> ((s, d) =>
      AggsExt.cumulativeCardinality(Geo.events(s, d)).orderBy("event_type", "day")),
    "q_global_agg" -> ((s, d) =>
      SearchOps.globalAgg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_global_agg_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.globalAgg(s, idx, RefQueries.set).orderBy("query_id")
    }),
    // ---- final aggregation-DSL batch: date_range, percentile_ranks,
    // bucket_script/percentiles_bucket, t_test, significant_text ----
    "q_date_range_agg" -> ((s, d) =>
      AggsExt.dateRangeAgg(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "key")),
    "q_percentile_ranks" -> ((s, d) =>
      AggsExt.percentileRanks(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "value")),
    "q_bucket_script" -> ((s, d) =>
      AggsExt.bucketScript(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "day")),
    "q_ttest" -> ((s, d) =>
      AggsExt.tTest(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_sig_text" -> ((s, d) =>
      SearchOps.significantText(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "rank")),
    // ---- span_or / span_not: relational + positional-sidecar twins ----
    "q_span_or" -> ((s, d) =>
      SearchOps.spanOrCounts(TextOps.documents(s, d)).orderBy("clause_id", "doc_id")),
    "q_span_or_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.spanOrMatch(s, pos, SearchOps.SpanOrClauses)
        .orderBy("clause_id", "doc_id")
    }),
    "q_span_not" -> ((s, d) =>
      SearchOps.spanNotCounts(TextOps.documents(s, d)).orderBy("probe_id", "doc_id")),
    "q_span_not_index" -> ((s, d) => {
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.index.Positions.spanNotMatch(s, pos, SearchOps.SpanNotProbes)
        .orderBy("probe_id", "doc_id")
    }),
    // ---- exists / match_bool_prefix / simple_query_string ----
    "q_exists" -> ((s, d) => Relational.existsQuery(s, d).orderBy("event_type")),
    "q_match_bool_prefix" -> ((s, d) =>
      SearchOps.matchBoolPrefix(TextOps.documents(s, d)).orderBy("probe_id", "doc_id")),
    "q_match_bool_prefix_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.matchBoolPrefix(s, idx, SearchOps.PhrasePrefixes)
        .orderBy("probe_id", "doc_id")
    }),
    "q_simple_query_string" -> ((s, d) =>
      graft.query.QueryString.simpleCount(TextOps.documents(s, d)).orderBy("query_id")),
    "q_simple_query_string_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      val pos = IndexCache.positionsForDocuments(s, d)
      graft.query.QueryString.simpleCountIndex(s, idx, pos).orderBy("query_id")
    }),

    // ---- rate / moving_percentiles / random_sampler /
    //      variable_width_histogram aggs ----
    "q_rate_agg" -> ((s, d) =>
      AggsExt.rateAgg(TextOps.documents(s, d), RefQueries.set).orderBy("query_id", "week")),
    "q_moving_percentiles" -> ((s, d) =>
      AggsExt.movingPercentiles(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "day")),
    "q_random_sampler" -> ((s, d) =>
      AggsExt.randomSampler(TextOps.documents(s, d), RefQueries.set).orderBy("query_id")),
    "q_var_width_histogram" -> ((s, d) =>
      AggsExt.variableWidthHistogram(TextOps.documents(s, d), RefQueries.set)
        .orderBy("query_id", "cluster")),
    // ---- frequent_item_sets / categorize_text ----
    "q_frequent_item_sets" -> ((s, d) =>
      AggsExt.frequentItemSets(Geo.events(s, d)).orderBy("t1", "t2")),
    "q_categorize_text" -> ((s, d) =>
      AggsExt.categorizeText(TextOps.documents(s, d)).orderBy("signature")),
    // ---- geo_distance rings aggregation ----
    "q_geo_distance_agg" -> ((s, d) =>
      Geo.distanceRings(Geo.events(s, d)).orderBy("center_id", "ring")),
    // ---- kNN similarity threshold (ES 8 knn.similarity) ----
    "q_ann_threshold" -> ((s, d) => {
      val e = Similarity.embeddings(s, d)
      Similarity.thresholdTopK(e, e.filter(col("vec_id") < 3), k = 10, minSim = 0.15)
        .orderBy("query_id", "rank")
    }),
    // ---- _field_caps ----
    "q_field_caps" -> ((s, d) =>
      SearchOps.fieldCaps(TextOps.documents(s, d)).orderBy("field")),
    // ---- _msearch: relational + index-served twins ----
    "q_msearch" -> ((s, d) =>
      SearchOps.msearch(TextOps.documents(s, d)).orderBy("request_id", "rank")),
    "q_msearch_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.msearchTopK(s, idx).orderBy("request_id", "rank")
    }),
    // ---- _search/template (mustache render + ranked search) ----
    "q_search_template" -> ((s, d) =>
      SearchOps.searchTemplate(TextOps.documents(s, d)).orderBy("template_id", "rank")),
    // ---- combined_fields (term-centric BM25F): twins ----
    "q_combined_fields" -> ((s, d) =>
      SearchOps.combinedFieldsTopK(TextOps.documents(s, d)).orderBy("query_id", "rank")),
    "q_combined_fields_index" -> ((s, d) => {
      val tIdx = IndexCache.forDocuments(s, d)
      val sIdx = IndexCache.forField(s, d, "source")
      IndexSearch.combinedFieldsTopK(s, tIdx, sIdx).orderBy("query_id", "rank")
    }),
    // ---- span_multi (prefix rewrite inside span_near): twins ----
    "q_span_multi" -> ((s, d) =>
      SearchOps.spanMultiCounts(TextOps.documents(s, d)).orderBy("probe_id", "doc_id")),
    "q_span_multi_index" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      val pos = IndexCache.positionsForDocuments(s, d)
      IndexSearch.spanMultiMatch(s, idx, pos).orderBy("probe_id", "doc_id")
    }),
    // ---- reverse_nested aggregation (parent counts per child bucket) ----
    "q_reverse_nested" -> ((s, d) =>
      Relational.reverseNested(s, d).orderBy("o_orderpriority")),
    // ---- has_child + inner_hits (top children inlined per parent) ----
    "q_inner_hits" -> ((s, d) =>
      Relational.innerHits(s, d).orderBy("c_custkey", "child_rank")),
    // ---- _validate/query (analyze + dictionary rewrite report) ----
    "q_validate_query" -> ((s, d) => {
      val idx = IndexCache.forDocuments(s, d)
      IndexSearch.validateQuery(s, idx).orderBy("query_id")
    })
  )

  // ------------------------------------------------------------- oracles

  /** Shared tokenizer CTE — semantics pinned to TextPrep.tokenize. */
  private val TOK =
    """tok AS (SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t FROM documents) WHERE t <> '')"""

  private val TF = """tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2)"""
  private val DL = """dl AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM tok GROUP BY 1)"""
  private val STATS = """stats AS (SELECT count(*)::BIGINT AS n, sum(doclen)::BIGINT AS tot FROM dl)"""

  private def bm25Sql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= ${RefQueries.K} ORDER BY query_id, rank""".stripMargin

  /** Conjunctive twin of bm25Sql: identical scoring, restricted to docs
    * matching EVERY term of the query (matched-term count == query arity).
    */
  private def boolAndSql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |qn AS (SELECT query_id, count(*)::BIGINT AS nt FROM q GROUP BY 1),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score,
       |    count(*)::BIGINT AS matched
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |conj AS (SELECT s.query_id, s.doc_id, s.score FROM scored s JOIN qn USING (query_id) WHERE s.matched = qn.nt),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM conj)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= ${RefQueries.K} ORDER BY query_id, rank""".stripMargin

  /** Shared scored-CTE block: exact BM25 per (query, doc) with the
    * matched-term count, plus query arity (qn) — the base of the
    * should-match / filtered / pagination oracles. Must stay textually in
    * lockstep with bm25Sql's scoring expression.
    */
  private def scoredCtes: String =
    s"""$TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |qn AS (SELECT query_id, count(*)::BIGINT AS nq FROM q GROUP BY 1),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score,
       |    max( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE)))) ) AS mx,
       |    count(*)::BIGINT AS matched
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2)""".stripMargin

  /** dis_max with tie_breaker 0.3: best single-term addend + 0.3 × the
    * rest — `mx + 0.3*(score - mx)` over the scored CTE's exact operands
    * (max is order-free and exact; the ordered sum is the shared fold).
    */
  private def disMaxSql: String =
    s"""WITH $scoredCtes,
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY (mx + 0.3*(score - mx)) DESC, doc_id ASC)::INT AS rank, doc_id, round(mx + 0.3*(score - mx), 4) AS score FROM scored)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** boosting query: positive BM25 ranking, docs containing the negative
    * term demoted ×0.5 (ES negative_boost — demote, never exclude).
    */
  private def boostingSql: String =
    s"""WITH $scoredCtes,
       |neg AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('${graft.query.SearchOps.BoostingNegative}')),
       |adj AS (SELECT s.query_id, s.doc_id, CASE WHEN n.doc_id IS NOT NULL THEN s.score * 0.5 ELSE s.score END AS bscore FROM scored s LEFT JOIN neg n ON s.doc_id = n.doc_id),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY bscore DESC, doc_id ASC)::INT AS rank, doc_id, round(bscore, 4) AS score FROM adj)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** range aggregation: matched docs into explicit ES-keyed buckets of
    * n_chars (*-150 / 150-400 / 400-*; from-inclusive, to-exclusive).
    */
  private def rangeAggSql: String =
    s"""WITH $scoredCtes,
       |m AS (SELECT DISTINCT query_id, doc_id FROM scored),
       |j AS (SELECT m.query_id, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id)
       |SELECT query_id, CASE WHEN n_chars < 150 THEN '*-150' WHEN n_chars < 400 THEN '150-400' ELSE '400-*' END AS bucket, count(*)::BIGINT AS n_docs
       |FROM j GROUP BY 1, 2 ORDER BY query_id, bucket""".stripMargin

  /** filters aggregation: named predicate buckets counted over each query's
    * match set in one conditional-sum pass.
    */
  private def filtersAggSql: String =
    s"""WITH $scoredCtes,
       |m AS (SELECT DISTINCT query_id, doc_id FROM scored),
       |j AS (SELECT m.query_id, d.lang, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |a AS (SELECT query_id,
       |  sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS en,
       |  sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)::BIGINT AS lng,
       |  sum(CASE WHEN lang = 'zh' AND n_chars < 200 THEN 1 ELSE 0 END)::BIGINT AS zh_short
       |  FROM j GROUP BY 1)
       |SELECT query_id, f.filter_id,
       |  CASE f.filter_id WHEN 'en' THEN en WHEN 'long' THEN lng ELSE zh_short END AS n_docs
       |FROM a CROSS JOIN (VALUES ('en'), ('long'), ('zh_short')) f(filter_id)
       |ORDER BY query_id, filter_id""".stripMargin

  /** _count: total match-any hits per query. */
  private def countSql: String =
    s"""WITH $scoredCtes
       |SELECT query_id, count(*)::BIGINT AS total FROM scored GROUP BY 1 ORDER BY query_id""".stripMargin

  /** _termvectors with term_statistics for the probed ids: per-doc tf from
    * re-analysis + corpus-wide df restricted to the probed docs' terms.
    */
  private def termVectorsSql: String = {
    val ids = graft.query.SearchOps.IdProbes.mkString(", ")
    s"""WITH $TOK, $TF,
       |probe AS (SELECT doc_id, term, tf FROM tf WHERE doc_id IN ($ids)),
       |dfp AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT DISTINCT term FROM probe) GROUP BY 1)
       |SELECT p.doc_id, p.term, p.tf, dfp.df FROM probe p JOIN dfp USING (term) ORDER BY doc_id, term""".stripMargin
  }

  /** _explain: per-term BM25 operand breakdown (tf, df, doclen, idf,
    * addend) for each query's rank-1 doc — the addends are the scored
    * CTE's own operands, so they sum to the ranked score bit-exactly.
    */
  private def explainSql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |rows0 AS (
       |  SELECT q.query_id, tf.doc_id, q.term, tf.tf, dft.df, dl.doclen,
       |    ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5)) AS idf,
       |    ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |      * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE)))) AS addend
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats),
       |sc AS (SELECT query_id, doc_id, sum(addend ORDER BY term) AS score FROM rows0 GROUP BY 1, 2),
       |top1 AS (SELECT query_id, doc_id FROM (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rnk FROM sc) WHERE rnk = 1)
       |SELECT r.query_id, r.doc_id, r.term, r.tf, r.df, r.doclen, round(r.idf, 4) AS idf, round(r.addend, 4) AS addend
       |FROM rows0 r JOIN top1 USING (query_id, doc_id) ORDER BY query_id, term""".stripMargin

  /** range filter context: ranking restricted to docs with n_chars in
    * [RangeLo, RangeHi]; scoring stays corpus-wide (ES filter semantics).
    */
  private def rangeSql: String =
    s"""WITH $scoredCtes,
       |inr AS (SELECT s.query_id, s.doc_id, s.score FROM scored s JOIN documents dc ON s.doc_id = dc.doc_id WHERE dc.n_chars BETWEEN $RangeLo AND $RangeHi),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM inr)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** percentiles over each query's match set: DuckDB quantile_cont ≡ Spark
    * exact `percentile` (same linear interpolation).
    */
  private def percentilesSql: String =
    s"""WITH $scoredCtes,
       |m AS (SELECT DISTINCT s.query_id, s.doc_id FROM scored s),
       |j AS (SELECT m.query_id, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id)
       |SELECT query_id, round(quantile_cont(n_chars, 0.25), 4) AS p25, round(quantile_cont(n_chars, 0.5), 4) AS p50, round(quantile_cont(n_chars, 0.75), 4) AS p75, round(quantile_cont(n_chars, 0.95), 4) AS p95 FROM j GROUP BY 1 ORDER BY query_id""".stripMargin

  /** top_hits: per (query, lang) bucket, the 2 best-scoring matched docs. */
  private def topHitsSql: String =
    s"""WITH $scoredCtes,
       |j AS (SELECT s.query_id, d.lang, s.doc_id, s.score FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
       |ranked AS (SELECT query_id, lang, row_number() OVER (PARTITION BY query_id, lang ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM j)
       |SELECT query_id, lang, rank, doc_id, score FROM ranked WHERE rank <= 2 ORDER BY query_id, lang, rank""".stripMargin

  /** match_phrase_prefix: exact lead chain + LIKE-prefix final position,
    * generated from the same probes the Spark twins tokenize.
    */
  private def phrasePrefixSql: String = {
    val ctes = graft.query.SearchOps.PhrasePrefixes.map { case (pid, ptext) =>
      val ws = graft.textprep.TextPrep.tokenize(ptext)
      val n = ws.length
      val lead = ws.dropRight(1)
      val prefix = ws.last
      val conds = (lead.zipWithIndex.map { case (w, j) =>
        if (j == 0) s"toks[i] = '$w'" else s"toks[i+$j] = '$w'"
      } :+ s"toks[i+${n - 1}] LIKE '$prefix%'").mkString(" AND ")
      s"""m_$pid AS (SELECT '$pid' AS phrase_id, doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n)
         |  WHERE $conds GROUP BY 1, 2)""".stripMargin
    }
    val union = graft.query.SearchOps.PhrasePrefixes.map { case (pid, _) => s"SELECT * FROM m_$pid" }
      .mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |${ctes.mkString(",\n")}
       |$union ORDER BY phrase_id, doc_id""".stripMargin
  }

  /** function_score (field_value_factor, modifier ln1p): BM25 × ln(1+field),
    * identical expression and operand doubles on both sides.
    */
  private def functionScoreSql: String =
    s"""WITH $scoredCtes,
       |j AS (SELECT s.query_id, s.doc_id, s.score * ln(1 + d.n_chars) AS fscore FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY fscore DESC, doc_id ASC)::INT AS rank, doc_id, round(fscore, 4) AS score FROM j)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Full bool query: must (all terms), should (adds score), must_not
    * (bans) — each group's sum in ascending term order, must + should.
    * Generated from `SearchOps.BoolQueries` with the shared tokenizer.
    */
  private def boolFullSql: String = {
    def vals(sel: ((String, String, String, String)) => (String, String)): String =
      graft.query.SearchOps.BoolQueries.map(sel).flatMap { case (qid, text) =>
        graft.textprep.TextPrep.tokenize(text).distinct.map(t => s"('$qid','$t')")
      }.mkString(", ")
    def addend(dft: String): String =
      s"""ln(1 + (stats.n - $dft.df + 0.5) / ($dft.df + 0.5))
         |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))""".stripMargin
    s"""WITH $TOK, $TF, $DL, $STATS,
       |qm(query_id, term) AS (VALUES ${vals(q => (q._1, q._2))}),
       |qs(query_id, term) AS (VALUES ${vals(q => (q._1, q._3))}),
       |qb(query_id, term) AS (VALUES ${vals(q => (q._1, q._4))}),
       |qmn AS (SELECT query_id, count(*)::BIGINT AS n_must FROM qm GROUP BY 1),
       |dftm AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qm) GROUP BY 1),
       |dfts AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qs) GROUP BY 1),
       |sm AS (SELECT qm.query_id, tf.doc_id,
       |  sum( ${addend("dftm")}
       |       ORDER BY qm.term ) AS must_score, count(*)::BIGINT AS must_matched
       |  FROM qm JOIN tf ON qm.term = tf.term JOIN dftm ON qm.term = dftm.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |ss AS (SELECT qs.query_id, tf.doc_id,
       |  sum( ${addend("dfts")}
       |       ORDER BY qs.term ) AS should_score
       |  FROM qs JOIN tf ON qs.term = tf.term JOIN dfts ON qs.term = dfts.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |bd AS (SELECT DISTINCT qb.query_id, tf.doc_id FROM qb JOIN tf ON qb.term = tf.term),
       |comb AS (SELECT m.query_id, m.doc_id, m.must_score + coalesce(s.should_score, 0.0) AS score
       |  FROM sm m JOIN qmn ON m.query_id = qmn.query_id AND m.must_matched = qmn.n_must
       |  LEFT JOIN ss s ON s.query_id = m.query_id AND s.doc_id = m.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM bd WHERE bd.query_id = m.query_id AND bd.doc_id = m.doc_id)),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM comb)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** query_string oracle: generated from the SAME parse both twins compile
    * from (`QueryString.parse` — the parser itself is spec-pinned in
    * QueryStringSpec), so this pins the clause COMPILATION: must/should
    * ordered-fold BM25 sums (boolFullSql's shape), per-probe phrase-gate
    * CTEs (phraseSql's counting pattern), banning, and the three candidate
    * kinds (must-anchored / phrase-anchored / pure-OR) unioned before one
    * shared ranking.
    */
  private def queryStringSql: String = {
    import graft.query.QueryString
    val qs = QueryString.QueryStrings
    val parsed = qs.map { case (qid, q) => (qid, QueryString.parse(q)) }
    def pairVals(sel: QueryString.Parsed => Seq[String]): String =
      parsed.flatMap { case (qid, p) => sel(p).map(t => s"('$qid','$t')") }.mkString(", ")
    val arities = parsed.collect { case (qid, p) if p.must.nonEmpty =>
      s"('$qid',${p.must.length}::BIGINT)"
    }.mkString(", ")
    val probes = QueryString.phraseProbes(qs)
    val probeCtes = probes.map { case (pid, ptext) =>
      val ws = graft.textprep.TextPrep.tokenize(ptext)
      val n = ws.length
      val conds = ws.zipWithIndex.map { case (w, j) =>
        if (j == 0) s"toks[i] = '$w'" else s"toks[i+$j] = '$w'"
      }.mkString(" AND ")
      val qid = pid.substring(0, pid.lastIndexOf('_'))
      s"""ph_$pid AS (SELECT '$pid' AS phrase_id, '$qid' AS query_id, doc_id
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n)
         |  WHERE $conds GROUP BY 3)""".stripMargin
    }
    val probeUnion = probes.map { case (pid, _) => s"SELECT * FROM ph_$pid" }
      .mkString(" UNION ALL ")
    val phVals = parsed.collect { case (qid, p) if p.phrases.nonEmpty =>
      s"('$qid',${p.phrases.length}::BIGINT)"
    }.mkString(", ")
    val qidsP = parsed.collect { case (qid, p) if p.kind == "P" => s"'$qid'" }.mkString(", ")
    val qidsS = parsed.collect { case (qid, p) if p.kind == "S" => s"'$qid'" }.mkString(", ")
    val phraseQids = parsed.collect { case (qid, p) if p.phrases.nonEmpty => s"'$qid'" }
      .mkString(", ")
    def addend(dft: String): String =
      s"""ln(1 + (stats.n - $dft.df + 0.5) / ($dft.df + 0.5))
         |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))""".stripMargin
    s"""WITH $TOK, $TF, $DL, $STATS,
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |qm(query_id, term) AS (VALUES ${pairVals(_.must)}),
       |qsh(query_id, term) AS (VALUES ${pairVals(_.should)}),
       |qb(query_id, term) AS (VALUES ${pairVals(_.not)}),
       |qmn(query_id, n_must) AS (VALUES $arities),
       |qpn(query_id, n_ph) AS (VALUES $phVals),
       |dftm AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qm) GROUP BY 1),
       |dfts AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qsh) GROUP BY 1),
       |sm AS (SELECT qm.query_id, tf.doc_id,
       |  sum( ${addend("dftm")}
       |       ORDER BY qm.term ) AS must_score, count(*)::BIGINT AS must_matched
       |  FROM qm JOIN tf ON qm.term = tf.term JOIN dftm ON qm.term = dftm.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |ss AS (SELECT qsh.query_id, tf.doc_id,
       |  sum( ${addend("dfts")}
       |       ORDER BY qsh.term ) AS should_score
       |  FROM qsh JOIN tf ON qsh.term = tf.term JOIN dfts ON qsh.term = dfts.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |bd AS (SELECT DISTINCT qb.query_id, tf.doc_id FROM qb JOIN tf ON qb.term = tf.term),
       |${probeCtes.mkString(",\n")},
       |phall AS (SELECT u.query_id, u.doc_id FROM ($probeUnion) u JOIN qpn ON u.query_id = qpn.query_id
       |  GROUP BY 1, 2 HAVING count(DISTINCT u.phrase_id) = max(qpn.n_ph)),
       |candm AS (SELECT sm.query_id, sm.doc_id, sm.must_score FROM sm JOIN qmn ON sm.query_id = qmn.query_id AND sm.must_matched = qmn.n_must),
       |candp AS (SELECT query_id, doc_id, 0.0 AS must_score FROM phall WHERE query_id IN ($qidsP)),
       |cands AS (SELECT query_id, doc_id, 0.0 AS must_score FROM ss WHERE query_id IN ($qidsS)),
       |cand AS (SELECT * FROM candm UNION ALL SELECT * FROM candp UNION ALL SELECT * FROM cands),
       |gated AS (SELECT c.* FROM cand c WHERE c.query_id NOT IN ($phraseQids)
       |  OR EXISTS (SELECT 1 FROM phall p WHERE p.query_id = c.query_id AND p.doc_id = c.doc_id)),
       |fin AS (SELECT g.query_id, g.doc_id, g.must_score + coalesce(s.should_score, 0.0) AS score
       |  FROM gated g LEFT JOIN ss s ON s.query_id = g.query_id AND s.doc_id = g.doc_id
       |  WHERE NOT EXISTS (SELECT 1 FROM bd WHERE bd.query_id = g.query_id AND bd.doc_id = g.doc_id)),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM fin)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** multi_match best_fields oracle: per-field BM25 corpora (the `text`
    * CTEs plus a parallel tok2/tf2/dl2/stats2 block over `source`), full
    * outer join, then the tie_breaker combination with the twins' exact
    * association. greatest() and the +/− chain are IEEE-exact on both
    * sides.
    */
  private def multiMatchSql: String = {
    val vals = graft.query.SearchOps.MultiQueries.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => s"('$qid','$t')")
    }.mkString(", ")
    def addend(tf: String, dft: String, dl: String, stats: String): String =
      s"""ln(1 + ($stats.n - $dft.df + 0.5) / ($dft.df + 0.5))
         |       * ($tf.tf * 2.2 / ($tf.tf + 1.2 * (0.25 + 0.75 * $dl.doclen / ($stats.tot::DOUBLE / $stats.n::DOUBLE))))""".stripMargin
    s"""WITH $TOK, $TF, $DL, $STATS,
       |tok2 AS (SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(source), '[^a-z0-9]+')) AS t FROM documents) WHERE t <> ''),
       |tf2 AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok2 GROUP BY 1, 2),
       |dl2 AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM tok2 GROUP BY 1),
       |stats2 AS (SELECT count(*)::BIGINT AS n, sum(doclen)::BIGINT AS tot FROM dl2),
       |q(query_id, term) AS (VALUES $vals),
       |dft1 AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |dft2 AS (SELECT term, count(*)::BIGINT AS df FROM tf2 WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |sa AS (SELECT q.query_id, tf.doc_id,
       |  sum( ${addend("tf", "dft1", "dl", "stats")}
       |       ORDER BY q.term ) AS s_text
       |  FROM q JOIN tf ON q.term = tf.term JOIN dft1 ON q.term = dft1.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |sb AS (SELECT q.query_id, tf2.doc_id,
       |  sum( ${addend("tf2", "dft2", "dl2", "stats2")}
       |       ORDER BY q.term ) AS s_src
       |  FROM q JOIN tf2 ON q.term = tf2.term JOIN dft2 ON q.term = dft2.term JOIN dl2 ON tf2.doc_id = dl2.doc_id CROSS JOIN stats2 GROUP BY 1, 2),
       |j AS (SELECT coalesce(a.query_id, b.query_id) AS query_id, coalesce(a.doc_id, b.doc_id) AS doc_id,
       |  coalesce(a.s_text, 0.0) AS v1, coalesce(b.s_src, 0.0) AS v2
       |  FROM sa a FULL OUTER JOIN sb b ON a.query_id = b.query_id AND a.doc_id = b.doc_id),
       |sc AS (SELECT query_id, doc_id, greatest(v1, v2) + 0.3 * (v1 + v2 - greatest(v1, v2)) AS score FROM j),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM sc)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Percolate oracle: one SELECT per stored query, generated from the
    * same fixture both sides compile (must-all + not-none over the doc's
    * token array).
    */
  private def percolateSql: String = {
    val parts = graft.query.SearchOps.StoredQueries.map { case (qid, must, not) =>
      val ms = graft.textprep.TextPrep.tokenize(must).distinct.toSeq
      val ns = graft.textprep.TextPrep.tokenize(not).distinct.toSeq
      val conds = (ms.map(t => s"list_contains(toks, '$t')") ++
        ns.map(t => s"NOT list_contains(toks, '$t')")).mkString(" AND ")
      s"SELECT doc_id, '$qid' AS query_id FROM arrs WHERE $conds"
    }
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents)
       |${parts.mkString("\nUNION ALL ")}
       |ORDER BY doc_id, query_id""".stripMargin
  }

  /** ids query / GET oracle: point rows with the index docs table's stored
    * columns (url as staged, token doclen, version 0); the absent probe id
    * drops out on both sides.
    */
  private def idsSql: String = {
    val ids = graft.query.SearchOps.IdProbes.mkString(", ")
    s"""WITH $TOK, $DL
       |SELECT d.doc_id, 'testdata://' || d.source || '/' || d.doc_id AS url,
       |  dl.doclen, 0::BIGINT AS version
       |FROM documents d JOIN dl ON d.doc_id = dl.doc_id
       |WHERE d.doc_id IN ($ids) ORDER BY d.doc_id""".stripMargin
  }

  /** Shared candidate CTE block of the _search request oracle (generated
    * from `Search.Fixture`): must group arity-gated, range filter, banning,
    * must + coalesce(should, 0) — both twins' exact association.
    */
  private def searchCandCtes: String = {
    val req = graft.query.Search.Fixture
    def vals(text: String) = graft.textprep.TextPrep.tokenize(text).distinct
      .map(t => s"('${req.queryId}','$t')").mkString(", ")
    val nMust = graft.textprep.TextPrep.tokenize(req.must).distinct.length
    def addend(dft: String): String =
      s"""ln(1 + (stats.n - $dft.df + 0.5) / ($dft.df + 0.5))
         |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))""".stripMargin
    s"""qm(query_id, term) AS (VALUES ${vals(req.must)}),
       |qsh(query_id, term) AS (VALUES ${vals(req.should)}),
       |qb(query_id, term) AS (VALUES ${vals(req.mustNot)}),
       |dftm AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qm) GROUP BY 1),
       |dfts AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM qsh) GROUP BY 1),
       |sm AS (SELECT qm.query_id, tf.doc_id,
       |  sum( ${addend("dftm")}
       |       ORDER BY qm.term ) AS must_score, count(*)::BIGINT AS must_matched
       |  FROM qm JOIN tf ON qm.term = tf.term JOIN dftm ON qm.term = dftm.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |ss AS (SELECT qsh.query_id, tf.doc_id,
       |  sum( ${addend("dfts")}
       |       ORDER BY qsh.term ) AS should_score
       |  FROM qsh JOIN tf ON qsh.term = tf.term JOIN dfts ON qsh.term = dfts.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats GROUP BY 1, 2),
       |bd AS (SELECT DISTINCT qb.query_id, tf.doc_id FROM qb JOIN tf ON qb.term = tf.term),
       |cand AS (SELECT sm.query_id, sm.doc_id, sm.must_score + coalesce(ss.should_score, 0.0) AS score
       |  FROM sm JOIN documents d ON sm.doc_id = d.doc_id
       |  LEFT JOIN ss ON ss.query_id = sm.query_id AND ss.doc_id = sm.doc_id
       |  WHERE sm.must_matched = $nMust AND d.${req.rangeField} BETWEEN ${req.rangeLo} AND ${req.rangeHi}
       |    AND NOT EXISTS (SELECT 1 FROM bd WHERE bd.query_id = sm.query_id AND bd.doc_id = sm.doc_id))""".stripMargin
  }

  /** _search hits oracle: ranked candidates + the highlight fetch phase
    * (snippetSql's window over the must ∪ should term set).
    */
  private def searchHitsSql: String = {
    val req = graft.query.Search.Fixture
    s"""WITH $TOK, $TF, $DL, $STATS,
       |$searchCandCtes,
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM cand),
       |top AS (SELECT * FROM ranked WHERE rank <= ${req.k}),
       |qt AS (SELECT query_id, list(term ORDER BY term) AS qterms FROM (SELECT * FROM qm UNION SELECT * FROM qsh) u GROUP BY 1),
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |snip AS (
       |  SELECT t.query_id, t.rank, t.doc_id, t.score, arrs.toks,
       |    greatest(1, list_min(list_filter(list_transform(qt.qterms, x -> list_position(arrs.toks, x)), p -> p IS NOT NULL AND p > 0)) - 3) AS st
       |  FROM top t JOIN arrs ON t.doc_id = arrs.doc_id JOIN qt ON t.query_id = qt.query_id)
       |SELECT query_id, rank, doc_id, score, array_to_string(toks[st:(st+7)], ' ') AS snippet
       |FROM snip ORDER BY query_id, rank""".stripMargin
  }

  /** _search aggregations oracle: the terms agg over the FULL filtered
    * match set (never just the returned page).
    */
  private def searchAggsSql: String = {
    val req = graft.query.Search.Fixture
    s"""WITH $TOK, $TF, $DL, $STATS,
       |$searchCandCtes
       |SELECT cand.query_id, d.${req.aggField}, count(*)::BIGINT AS n_docs
       |FROM cand JOIN documents d ON cand.doc_id = d.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Composite-aggregation page-2 oracle: bucket enumeration over
    * (lang, source) in key order, after_key = page-1's last key, page 2 =
    * strictly-after in tuple order — both twins' exact predicate.
    */
  private def compositeSql: String =
    s"""WITH $TOK, $TF,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf ON q.term = tf.term),
       |b AS (SELECT m.query_id, d.lang, d.source, count(*)::BIGINT AS n_docs FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2, 3),
       |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY lang ASC, source ASC) AS rn FROM b),
       |cur AS (SELECT query_id, lang AS a1, source AS a2 FROM r WHERE rn = 5),
       |p AS (SELECT r.query_id, r.lang, r.source, r.n_docs FROM r JOIN cur ON r.query_id = cur.query_id
       |  WHERE r.lang > cur.a1 OR (r.lang = cur.a1 AND r.source > cur.a2)),
       |pr AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY lang ASC, source ASC)::INT AS page_rank, lang, source, n_docs FROM p)
       |SELECT query_id, page_rank, lang, source, n_docs FROM pr WHERE page_rank <= 5 ORDER BY query_id, page_rank""".stripMargin

  /** significant_terms (JLH): overrepresentation of match-set terms vs the
    * corpus background; rates as plain double divisions, identical
    * expression on both sides; positive lift only.
    */
  private def sigTermsSql: String =
    s"""WITH $TOK, $TF,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf ON q.term = tf.term),
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |fgn AS (SELECT query_id, count(*)::BIGINT AS fg_n FROM m GROUP BY 1),
       |bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY 1),
       |bgn AS (SELECT count(DISTINCT doc_id)::BIGINT AS bg_n FROM dt),
       |fg AS (SELECT m.query_id, dt.term, count(*)::BIGINT AS fg_df FROM m JOIN dt ON m.doc_id = dt.doc_id GROUP BY 1, 2),
       |j AS (SELECT fg.query_id, fg.term, fg.fg_df, bg.bg_df,
       |  (fg.fg_df::DOUBLE / fgn.fg_n - bg.bg_df::DOUBLE / bgn.bg_n) * ((fg.fg_df::DOUBLE / fgn.fg_n) / (bg.bg_df::DOUBLE / bgn.bg_n)) AS jlh
       |  FROM fg JOIN fgn ON fg.query_id = fgn.query_id JOIN bg ON fg.term = bg.term CROSS JOIN bgn),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY jlh DESC, term ASC)::INT AS rank, term, fg_df, bg_df, round(jlh, 4) AS jlh FROM j WHERE jlh > 0)
       |SELECT query_id, rank, term, fg_df, bg_df, jlh FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Field collapsing: best doc per (query, source), then global top-10 of
    * the representatives.
    */
  private def collapseSql: String =
    s"""WITH $scoredCtes,
       |j AS (SELECT s.query_id, s.doc_id, s.score, d.source FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
       |g AS (SELECT *, row_number() OVER (PARTITION BY query_id, source ORDER BY score DESC, doc_id ASC) AS grank FROM j),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, source, round(score, 4) AS score FROM g WHERE grank = 1)
       |SELECT query_id, rank, doc_id, source, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** RRF hybrid retrieval: BM25 top-10 ranks fused with exact cosine top-10
    * ranks of the per-query request vector (query i ↦ embedding vec_id i) by
    * score = Σ 1/(60 + rank); lexical contribution added first, like the
    * Spark side. Ordered element sums keep the cosine bit-identical.
    */
  /** Request-vector kNN CTEs shared by the hybrid (rrf/linear) oracles:
    * per (query, corpus vector) the ordered-element dot product and both
    * norms — query i carrying embedding vec_id = i, exactly
    * `SearchOps.queryVectors`.
    */
  private def knnCtes: String = {
    val qv = RefQueries.set.zipWithIndex
      .map { case ((qid, _), i) => s"('$qid',$i)" }.mkString(", ")
    s"""qv(query_id, qvec_id) AS (VALUES $qv),
       |ev AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
       |pairs AS (
       |  SELECT qv.query_id, ev.vec_id AS doc_id,
       |    sum((ev.embedding[ev.i]::DOUBLE) * (qe.embedding[ev.i]::DOUBLE) ORDER BY ev.i) AS dp,
       |    sum((ev.embedding[ev.i]::DOUBLE) * (ev.embedding[ev.i]::DOUBLE) ORDER BY ev.i) AS na,
       |    sum((qe.embedding[ev.i]::DOUBLE) * (qe.embedding[ev.i]::DOUBLE) ORDER BY ev.i) AS nq2
       |  FROM ev CROSS JOIN qv JOIN embeddings qe ON qe.vec_id = qv.qvec_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  private def rrfSql: String = {
    s"""WITH $scoredCtes,
       |tr AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS text_rank FROM scored),
       |ttop AS (SELECT * FROM tr WHERE text_rank <= 10),
       |$knnCtes,
       |vtop AS (SELECT query_id, doc_id, knn_rank FROM (
       |  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq2)) DESC, doc_id ASC)::INT AS knn_rank FROM pairs) vr
       |  WHERE knn_rank <= 10),
       |fused AS (
       |  SELECT coalesce(t.query_id, v.query_id) AS query_id, coalesce(t.doc_id, v.doc_id) AS doc_id,
       |    coalesce(1.0 / (60 + t.text_rank), 0.0) + coalesce(1.0 / (60 + v.knn_rank), 0.0) AS rrf,
       |    coalesce(t.text_rank, 0) AS text_rank, coalesce(v.knn_rank, 0) AS knn_rank
       |  FROM ttop t FULL OUTER JOIN vtop v ON t.query_id = v.query_id AND t.doc_id = v.doc_id),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC)::INT AS rank, doc_id, round(rrf + 1.0e-9, 6) AS rrf, text_rank, knn_rank FROM fused)
       |SELECT query_id, rank, doc_id, rrf, text_rank, knn_rank FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** `_rank_eval`: precision/recall@10, MRR, binary-gain NDCG@10 of the
    * BM25 top-10 against the conjunctive (all-terms) judgment set. DCG and
    * IDCG sum in ascending rank/position order; gains written
    * ln(r+1)/ln(2.0) exactly as the Spark side evaluates them.
    */
  private def rankEvalSql: String =
    s"""WITH $scoredCtes,
       |ranked AS (SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank FROM scored),
       |topk AS (SELECT * FROM ranked WHERE rank <= 10),
       |rel AS (SELECT s.query_id, s.doc_id FROM scored s JOIN qn ON s.query_id = qn.query_id WHERE s.matched = qn.nq),
       |nrel AS (SELECT query_id, count(*)::BIGINT AS n_rel FROM rel GROUP BY 1),
       |hits AS (SELECT t.query_id, t.rank FROM topk t JOIN rel r ON t.query_id = r.query_id AND t.doc_id = r.doc_id),
       |hagg AS (SELECT query_id, count(*)::BIGINT AS n_hits, min(rank) AS min_rank,
       |  sum(1.0 / (ln(rank + 1.0) / ln(2.0)) ORDER BY rank) AS dcg FROM hits GROUP BY 1),
       |gains AS (SELECT unnest(generate_series(1, 10)) AS j),
       |idcg_t AS (SELECT m, sum(1.0 / (ln(j + 1.0) / ln(2.0)) ORDER BY j) AS idcg
       |  FROM (SELECT unnest(generate_series(1, 10)) AS m) sizes JOIN gains ON gains.j <= m GROUP BY m),
       |base AS (SELECT q.query_id, coalesce(n.n_rel, 0) AS n_rel, coalesce(h.n_hits, 0) AS n_hits,
       |    coalesce(h.min_rank, 0) AS min_rank, coalesce(h.dcg, 0.0) AS dcg
       |  FROM (SELECT DISTINCT query_id FROM q) q
       |  LEFT JOIN nrel n ON q.query_id = n.query_id
       |  LEFT JOIN hagg h ON q.query_id = h.query_id)
       |SELECT b.query_id, b.n_rel, b.n_hits,
       |  round(b.n_hits / 10.0 + 1.0e-9, 4) AS prec,
       |  round(CASE WHEN b.n_rel = 0 THEN 0.0 ELSE b.n_hits::DOUBLE / b.n_rel::DOUBLE END + 1.0e-9, 4) AS recall,
       |  round(CASE WHEN b.min_rank = 0 THEN 0.0 ELSE 1.0 / b.min_rank END + 1.0e-9, 4) AS mrr,
       |  round(CASE WHEN coalesce(i.idcg, 0.0) > 0 AND b.n_rel > 0 THEN b.dcg / i.idcg ELSE 0.0 END + 1.0e-9, 4) AS ndcg
       |FROM base b LEFT JOIN idcg_t i ON i.m = least(b.n_rel, 10)
       |ORDER BY query_id""".stripMargin

  /** Linear retriever (weighted min-max-normalized score fusion): BM25
    * top-10 and cosine top-10 each normalized over their own window
    * ((s−min)/(max−min), 1.0 when degenerate), fused 2·nt + 1·nk — the
    * lexical product first, like the Spark side. Legs' raw scores are the
    * ordered-fold BM25 and ordered-element cosine, so normalization sees
    * bit-identical inputs on both sides.
    */
  private def linearSql: String =
    s"""WITH $scoredCtes,
       |tr AS (SELECT query_id, doc_id, score, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS text_rank FROM scored),
       |ttop AS (SELECT * FROM tr WHERE text_rank <= 10),
       |tn AS (SELECT query_id, doc_id, text_rank, CASE WHEN mx = mn THEN 1.0 ELSE (score - mn) / (mx - mn) END AS nt
       |  FROM (SELECT *, min(score) OVER (PARTITION BY query_id) AS mn, max(score) OVER (PARTITION BY query_id) AS mx FROM ttop) t),
       |$knnCtes,
       |vr AS (SELECT query_id, doc_id, dp / (sqrt(na) * sqrt(nq2)) AS vscore,
       |  row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq2)) DESC, doc_id ASC)::INT AS knn_rank FROM pairs),
       |vtop AS (SELECT * FROM vr WHERE knn_rank <= 10),
       |vn AS (SELECT query_id, doc_id, knn_rank, CASE WHEN mx = mn THEN 1.0 ELSE (vscore - mn) / (mx - mn) END AS nk
       |  FROM (SELECT *, min(vscore) OVER (PARTITION BY query_id) AS mn, max(vscore) OVER (PARTITION BY query_id) AS mx FROM vtop) t),
       |fused AS (
       |  SELECT coalesce(t.query_id, v.query_id) AS query_id, coalesce(t.doc_id, v.doc_id) AS doc_id,
       |    2.0 * coalesce(t.nt, 0.0) + 1.0 * coalesce(v.nk, 0.0) AS lin,
       |    coalesce(t.text_rank, 0) AS text_rank, coalesce(v.knn_rank, 0) AS knn_rank
       |  FROM tn t FULL OUTER JOIN vn v ON t.query_id = v.query_id AND t.doc_id = v.doc_id),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY lin DESC, doc_id ASC)::INT AS rank, doc_id, round(lin + 1.0e-9, 6) AS lin, text_rank, knn_rank FROM fused)
       |SELECT query_id, rank, doc_id, lin, text_rank, knn_rank FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** span_containing / span_within oracle, shared by the relational and
    * sidecar twins: big spans = the span_near pair (i < j ≤ i + slop + 1,
    * extent [i, j]); `within = false` counts big spans holding a little
    * position, `within = true` counts little positions inside a big span.
    */
  private def spanContainSql(within: Boolean): String = {
    val probes = graft.query.SearchOps.SpanContainProbes
    val ctes = probes.map { case (pid, little, a, b, slop) =>
      val agg =
        if (within)
          s"""p_$pid AS (SELECT '$pid' AS probe_id, l.doc_id, count(*)::BIGINT AS n_matches
             |  FROM ll_$pid l WHERE EXISTS (SELECT 1 FROM sp_$pid s WHERE s.doc_id = l.doc_id AND l.i >= s.i AND l.i <= s.j)
             |  GROUP BY 2)""".stripMargin
        else
          s"""p_$pid AS (SELECT '$pid' AS probe_id, s.doc_id, count(*)::BIGINT AS n_matches
             |  FROM sp_$pid s WHERE EXISTS (SELECT 1 FROM ll_$pid l WHERE l.doc_id = s.doc_id AND l.i >= s.i AND l.i <= s.j)
             |  GROUP BY 2)""".stripMargin
      s"""sp_$pid AS (SELECT a.doc_id, a.i, b.i AS j
         |  FROM (SELECT doc_id, i FROM arridx WHERE toks[i] = '$a') a
         |  JOIN (SELECT doc_id, i FROM arridx WHERE toks[i] = '$b') b
         |    ON b.doc_id = a.doc_id AND b.i > a.i AND b.i <= a.i + ${slop + 1}),
         |ll_$pid AS (SELECT doc_id, i FROM arridx WHERE toks[i] = '$little'),
         |$agg""".stripMargin
    }
    val union = probes.map { case (pid, _, _, _, _) => s"SELECT * FROM p_$pid" }
      .mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM arrs WHERE len(toks) >= 1),
       |${ctes.mkString(",\n")}
       |$union ORDER BY probe_id, doc_id""".stripMargin
  }

  /** `_terms_enum` oracle: vocabulary df from the (doc, term) distinct,
    * prefix + search_after paging in lexicographic order.
    */
  private def termsEnumSql: String = {
    val vals = graft.query.SearchOps.TermsEnumProbes
      .map { case (pid, pfx, aft, sz) => s"('$pid','$pfx','$aft',$sz)" }.mkString(", ")
    s"""WITH $TOK,
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |dfv AS (SELECT term, count(*)::BIGINT AS df FROM dt GROUP BY 1),
       |p(probe_id, prefix, aft, sz) AS (VALUES $vals),
       |r AS (SELECT probe_id, term, df, sz,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY term ASC)::INT AS rank
       |  FROM dfv JOIN p ON starts_with(term, prefix) AND term > aft)
       |SELECT probe_id, rank, term, df FROM r WHERE rank <= sz ORDER BY probe_id, rank""".stripMargin
  }

  /** `_mget` oracle: every requested id yields a row; misses carry
    * found = false and doclen 0.
    */
  private def mgetSql: String = {
    val vals = graft.query.SearchOps.MgetRequests
      .map { case (rid, id) => s"('$rid',$id)" }.mkString(", ")
    s"""WITH $TOK,
       |dl AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM tok GROUP BY 1),
       |r(req_id, doc_id) AS (VALUES $vals)
       |SELECT r.req_id, r.doc_id::BIGINT AS doc_id, (d.doc_id IS NOT NULL) AS found,
       |  coalesce(dl.doclen, 0)::BIGINT AS doclen
       |FROM r LEFT JOIN documents d ON r.doc_id = d.doc_id
       |LEFT JOIN dl ON r.doc_id = dl.doc_id
       |ORDER BY r.req_id""".stripMargin
  }

  /** has_child oracle: parents with 2–5 open-order children, score_mode
    * sum over child totalprice.
    */
  private def hasChildSql: String =
    s"""SELECT c.c_custkey, c.c_mktsegment, x.n_children, x.child_score
       |FROM (SELECT o_custkey, count(*)::BIGINT AS n_children,
       |        round(sum(o_totalprice), 4) AS child_score
       |      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
       |      HAVING count(*) BETWEEN 2 AND 5) x
       |JOIN customer c ON c.c_custkey = x.o_custkey
       |ORDER BY c.c_custkey""".stripMargin

  /** has_parent oracle: orders whose parent customer matches the parent
    * query (BUILDING segment, balance > 1000).
    */
  private def hasParentSql: String =
    s"""SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus
       |FROM orders o
       |WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey
       |  AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 1000)
       |ORDER BY o.o_orderkey""".stripMargin

  /** Nested aggregation (terms bucket + stats sub-agg): per (query, lang),
    * doc count and n_chars stats over the match set.
    */
  private def nestedAggSql: String =
    s"""WITH $TOK, $TF,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf ON q.term = tf.term)
       |SELECT m.query_id, d.lang, count(*)::BIGINT AS n_docs, min(d.n_chars) AS min_chars, max(d.n_chars) AS max_chars, round(avg(d.n_chars::DOUBLE) + 1.0e-9, 4) + 0.0 AS avg_chars
       |FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2 ORDER BY query_id, lang""".stripMargin

  /** terms filter (value-list filter context): ranking restricted to docs
    * whose lang is in the fixture list; scoring stays corpus-wide.
    */
  private def termsFilterSql: String = {
    val vals = graft.query.SearchOps.TermsFilterLangs.map(v => s"'$v'").mkString(", ")
    s"""WITH $scoredCtes,
       |inr AS (SELECT s.query_id, s.doc_id, s.score FROM scored s JOIN documents d ON s.doc_id = d.doc_id WHERE d.lang IN ($vals)),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM inr)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  /** Boosted twin of bm25Sql: per-term boost multiplies each addend before
    * the ordered summation (same association as the Spark column:
    * `(idf * partial) * boost`); terms without a boost row default to 1.0.
    */
  private def boostSql: String = {
    val bvals = graft.query.SearchOps.Boosts
      .map { case (t, b) => s"('$t', $b::DOUBLE)" }.mkString(", ")
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |b(term, boost) AS (VALUES $bvals),
       |qb AS (SELECT q.query_id, q.term, coalesce(b.boost, 1.0::DOUBLE) AS boost FROM q LEFT JOIN b USING (term)),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT qb.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       * qb.boost
       |       ORDER BY qb.term ) AS score
       |  FROM qb JOIN tf ON qb.term = tf.term
       |  JOIN dft ON qb.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  private def shouldMatchSql: String =
    s"""WITH $scoredCtes,
       |ok AS (SELECT s.query_id, s.doc_id, s.score FROM scored s JOIN qn USING (query_id)
       |       WHERE s.matched >= least(2, qn.nq)),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM ok)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private def filteredTopkSql: String =
    s"""WITH $scoredCtes,
       |ok AS (SELECT s.query_id, s.doc_id, s.score FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |       WHERE d.lang = 'en'),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM ok)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Pagination oracle: page 2 ≡ global ranks k+1..2k (the cursor predicate
    * (score, doc_id) strictly-after rank k is exactly rank > k under the
    * total (score DESC, doc_id ASC) order).
    */
  private def searchAfterSql: String =
    s"""WITH $scoredCtes,
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT query_id, (rank - 10)::INT AS page_rank, doc_id, score FROM ranked
       |WHERE rank BETWEEN 11 AND 20 ORDER BY query_id, page_rank""".stripMargin

  private def mustNotSql: String =
    s"""WITH $scoredCtes,
       |banned AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'customer'),
       |ok AS (SELECT s.query_id, s.doc_id, s.score FROM scored s
       |       WHERE NOT EXISTS (SELECT 1 FROM banned b WHERE b.doc_id = s.doc_id)),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM ok)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** more_like_this oracle: seed-term selection (top-3 tf·idf, total
    * tiebreak) and BM25 scoring both reproduced; seed doc excluded.
    */
  private def mltSql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |dfall AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id, tf.term, tf.tf::DOUBLE * ln(stats.n::DOUBLE / dfall.df::DOUBLE) AS tfidf_raw
       |       FROM tf JOIN dfall USING (term) CROSS JOIN stats),
       |seedq AS (SELECT doc_id AS seed_id, term FROM
       |  (SELECT doc_id, term, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, term ASC) AS r FROM sc)
       |  WHERE r <= 3 AND doc_id < 5),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM seedq) GROUP BY 1),
       |scored AS (
       |  SELECT q.seed_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM seedq q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  WHERE tf.doc_id <> q.seed_id
       |  GROUP BY 1, 2),
       |ranked AS (SELECT seed_id, row_number() OVER (PARTITION BY seed_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT seed_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY seed_id, rank""".stripMargin

  private def sortByFieldSql: String =
    s"""WITH $TOK,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok ON q.term = tok.term),
       |r AS (SELECT m.query_id, row_number() OVER (PARTITION BY m.query_id ORDER BY d.n_chars DESC, m.doc_id ASC)::INT AS rank, m.doc_id, d.n_chars
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id)
       |SELECT query_id, rank, doc_id, n_chars FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private def prefixSql: String = {
    val vals = graft.query.SearchOps.Prefixes
      .map { case (id, p) => s"('$id','$p')" }.mkString(", ")
    s"""WITH $TOK,
       |p(prefix_id, prefix) AS (VALUES $vals),
       |pairs AS (SELECT DISTINCT doc_id, term FROM tok)
       |SELECT p.prefix_id, p.prefix, count(DISTINCT pairs.term)::BIGINT AS n_terms, count(DISTINCT pairs.doc_id)::BIGINT AS n_docs
       |FROM p JOIN pairs ON pairs.term LIKE p.prefix || '%'
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  /** Phrase-suggester oracle, generated from SearchOps.PhraseProbes:
    * per-slot top-3 edit-distance candidates (dist asc, df desc, term asc),
    * combinations scored by the Laplace-smoothed bigram LM — the score
    * expression is kept textually in lockstep with
    * SearchOps.phraseSuggestFrom (same left-fold association).
    */
  private def phraseSuggestSql: String = {
    val probes = graft.query.SearchOps.PhraseProbes
    val slotVals = probes.flatMap { case (pid, text) =>
      graft.textprep.TextPrep.tokenize(text).zipWithIndex
        .map { case (t, i) => s"('$pid',$i,'$t')" }
    }.mkString(", ")
    val per = probes.map { case (pid, text) =>
      val a = graft.textprep.TextPrep.tokenize(text).length
      val cands = (0 until a).map(i =>
        s"(SELECT term, cnt FROM cand WHERE probe_id='$pid' AND slot=$i) c$i")
      val frm = cands.head + cands.tail.map(" CROSS JOIN " + _).mkString + " CROSS JOIN tot"
      val bjoins = (1 until a).map(i =>
        s"LEFT JOIN big b$i ON b$i.w1 = c${i - 1}.term AND b$i.w2 = c$i.term").mkString("\n  ")
      val phrase = (0 until a).map(i => s"c$i.term").mkString(" || ' ' || ")
      val score = (s"ln((c0.cnt + 1.0) / (tot.t + tot.v))" +:
        (1 until a).map(i =>
          s"ln((coalesce(b$i.bcnt, 0) + 1.0) / (c${i - 1}.cnt + tot.v))")).mkString(" + ")
      s"""ph_$pid AS (SELECT '$pid' AS probe_id, $phrase AS phrase, $score AS score
         |  FROM $frm
         |  $bjoins)""".stripMargin
    }
    val union = probes.map { case (pid, _) => s"SELECT * FROM ph_$pid" }.mkString(" UNION ALL ")
    s"""WITH $TOK,
       |dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df, count(*)::BIGINT AS cnt FROM tok GROUP BY 1),
       |tot AS (SELECT sum(cnt)::BIGINT AS t, count(*)::BIGINT AS v FROM dict),
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |big AS (SELECT toks[i] AS w1, toks[i+1] AS w2, count(*)::BIGINT AS bcnt
       |        FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM arrs WHERE len(toks) >= 2)
       |        GROUP BY 1, 2),
       |slots(probe_id, slot, qterm) AS (VALUES $slotVals),
       |cand AS (SELECT probe_id, slot, term, cnt FROM (
       |  SELECT s.probe_id, s.slot, d.term, d.cnt,
       |    row_number() OVER (PARTITION BY s.probe_id, s.slot ORDER BY levenshtein(s.qterm, d.term) ASC, d.df DESC, d.term ASC) AS r
       |  FROM slots s JOIN dict d ON levenshtein(s.qterm, d.term) <= 1) WHERE r <= 3),
       |${per.mkString(",\n")},
       |allph AS ($union),
       |ranked AS (SELECT probe_id, row_number() OVER (PARTITION BY probe_id ORDER BY score DESC, phrase ASC)::INT AS rank, phrase, round(score + 1e-9, 4) + 0.0 AS score FROM allph)
       |SELECT probe_id, rank, phrase, score FROM ranked WHERE rank <= 3 ORDER BY probe_id, rank""".stripMargin
  }

  /** Completion-suggester oracle: dictionary completions per prefix probe,
    * ranked (df desc, term asc), top-3. All-integer columns.
    */
  private def completionSql: String = {
    val vals = graft.query.SearchOps.Prefixes
      .map { case (id, p) => s"('$id','$p')" }.mkString(", ")
    s"""WITH $TOK,
       |dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
       |p(prefix_id, prefix) AS (VALUES $vals),
       |cand AS (SELECT p.prefix_id, p.prefix, d.term, d.df FROM p JOIN dict d ON d.term LIKE p.prefix || '%'),
       |ranked AS (SELECT prefix_id, prefix, row_number() OVER (PARTITION BY prefix_id ORDER BY df DESC, term ASC)::INT AS rank, term, df FROM cand)
       |SELECT prefix_id, prefix, rank, term, df FROM ranked WHERE rank <= 3 ORDER BY prefix_id, rank""".stripMargin
  }

  /** span_near oracle, generated from SearchOps.SpanPairs (slop = 3): per
    * (pair, doc), ordered position pairs (i, j) with 0 < j−i ≤ slop+1.
    */
  private def spanNearSql: String = {
    val slop = 3
    val ctes = graft.query.SearchOps.SpanPairs.map { case (pid, a, b) =>
      s"""p_$pid AS (SELECT '$pid' AS pair_id, pa.doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, i FROM arridx WHERE toks[i] = '$a') pa
         |  JOIN (SELECT doc_id, i AS j FROM arridx WHERE toks[i] = '$b') pb
         |  ON pa.doc_id = pb.doc_id AND pb.j > pa.i AND pb.j <= pa.i + ${slop + 1}
         |  GROUP BY 1, 2)""".stripMargin
    }
    val union = graft.query.SearchOps.SpanPairs.map { case (pid, _, _) => s"SELECT * FROM p_$pid" }
      .mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM arrs WHERE len(toks) >= 1),
       |${ctes.mkString(",\n")}
       |$union ORDER BY pair_id, doc_id""".stripMargin
  }

  /** Term-suggester oracle: dictionary corrections at edit distance 1..2,
    * ranked (dist asc, df desc, term asc), top-3 per probe. Shared by the
    * relational and term-dictionary-served twins. All-integer columns.
    */
  private def suggestSql: String = {
    val vals = graft.query.SearchOps.Fuzzies
      .map { case (id, t) => s"('$id','$t')" }.mkString(", ")
    s"""WITH $TOK,
       |dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
       |f(query_id, qterm) AS (VALUES $vals),
       |cand AS (SELECT f.query_id, f.qterm, d.term, levenshtein(f.qterm, d.term)::BIGINT AS dist, d.df
       |         FROM f JOIN dict d ON levenshtein(f.qterm, d.term) BETWEEN 1 AND 2),
       |ranked AS (SELECT query_id, qterm, row_number() OVER (PARTITION BY query_id ORDER BY dist ASC, df DESC, term ASC)::INT AS rank, term, dist, df FROM cand)
       |SELECT query_id, qterm, rank, term, dist, df FROM ranked WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  private def fuzzySql: String = {
    val vals = graft.query.SearchOps.Fuzzies
      .map { case (id, t) => s"('$id','$t')" }.mkString(", ")
    s"""WITH $TOK,
       |dict AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1),
       |f(query_id, qterm) AS (VALUES $vals)
       |SELECT f.query_id, f.qterm, d.term, levenshtein(f.qterm, d.term)::BIGINT AS dist, d.df
       |FROM f JOIN dict d ON levenshtein(f.qterm, d.term) <= 1
       |ORDER BY query_id, term""".stripMargin
  }

  /** Shared match-set CTE prefix for the ES aggregation oracles: distinct
    * (query_id, doc_id) containing ANY query term.
    */
  private def matchedCtes: String =
    s"""$TOK,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok ON q.term = tok.term)""".stripMargin

  private def histogramSql: String =
    s"""WITH $matchedCtes
       |SELECT m.query_id, CAST(floor(d.n_chars / 200.0) AS BIGINT) * 200 AS bucket_lo, count(*)::BIGINT AS n_docs
       |FROM m JOIN documents d ON m.doc_id = d.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def statsAggSql: String =
    s"""WITH $matchedCtes
       |SELECT m.query_id, count(*)::BIGINT AS n_docs, min(d.n_chars) AS min_chars, max(d.n_chars) AS max_chars,
       |  sum(d.n_chars)::BIGINT AS sum_chars, round(avg(d.n_chars::DOUBLE) + 1e-9, 4) + 0.0 AS avg_chars
       |FROM m JOIN documents d ON m.doc_id = d.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private def cardinalitySql: String =
    s"""WITH $matchedCtes
       |SELECT m.query_id, count(DISTINCT d.source)::BIGINT AS n_distinct
       |FROM m JOIN documents d ON m.doc_id = d.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Calendar-day derivation mirrors `SearchOps.crawlDay`: integer-only
    * offset, then DATE + days (crosses the January/February boundary).
    */
  private def dateHistogramSql: String =
    s"""WITH $matchedCtes
       |SELECT m.query_id, strftime(DATE '2025-01-01' + CAST((m.doc_id * 786413 % 5184000) // 86400 AS INTEGER), '%Y-%m-%d') AS day, count(*)::BIGINT AS n_docs
       |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def wildcardSql: String = {
    val vals = graft.query.SearchOps.Wildcards
      .map { case (id, p) => s"('$id','$p')" }.mkString(", ")
    s"""WITH $TOK,
       |p(pattern_id, pattern) AS (VALUES $vals),
       |pairs AS (SELECT DISTINCT doc_id, term FROM tok)
       |SELECT p.pattern_id, p.pattern, count(DISTINCT pairs.term)::BIGINT AS n_terms, count(DISTINCT pairs.doc_id)::BIGINT AS n_docs
       |FROM p JOIN pairs ON pairs.term LIKE p.pattern
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  private def regexpSql: String = {
    val vals = graft.query.SearchOps.Regexps
      .map { case (id, p) => s"('$id','$p')" }.mkString(", ")
    s"""WITH $TOK,
       |p(pattern_id, pattern) AS (VALUES $vals),
       |pairs AS (SELECT DISTINCT doc_id, term FROM tok)
       |SELECT p.pattern_id, p.pattern, count(DISTINCT pairs.term)::BIGINT AS n_terms, count(DISTINCT pairs.doc_id)::BIGINT AS n_docs
       |FROM p JOIN pairs ON regexp_matches(pairs.term, p.pattern)
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  /** Snippet oracle: BM25 top-3 per query, window of 8 tokens from
    * max(1, firstHit-3), firstHit = lowest 1-based position of any query
    * term in the doc's token array.
    */
  private def snippetSql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id FROM scored),
       |qt AS (SELECT query_id, list(term ORDER BY term) AS qterms FROM q GROUP BY 1),
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |snip AS (
       |  SELECT r.query_id, r.rank, r.doc_id, arrs.toks,
       |    greatest(1, list_min(list_filter(list_transform(qt.qterms, t -> list_position(arrs.toks, t)), p -> p IS NOT NULL AND p > 0)) - 3) AS st
       |  FROM ranked r JOIN arrs ON r.doc_id = arrs.doc_id JOIN qt ON r.query_id = qt.query_id
       |  WHERE r.rank <= 3)
       |SELECT query_id, rank, doc_id, array_to_string(toks[st:(st+7)], ' ') AS snippet
       |FROM snip ORDER BY query_id, rank""".stripMargin

  /** match_phrase oracle, generated from SearchOps.Phrases so the fixture
    * set has exactly one definition.
    */
  private def phraseSql: String = {
    val ctes = graft.query.SearchOps.Phrases.map { case (pid, ptext) =>
      val ws = graft.textprep.TextPrep.tokenize(ptext)
      val n = ws.length
      val conds = ws.zipWithIndex.map { case (w, j) =>
        if (j == 0) s"toks[i] = '$w'" else s"toks[i+$j] = '$w'"
      }.mkString(" AND ")
      s"""m_$pid AS (SELECT '$pid' AS phrase_id, doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n)
         |  WHERE $conds GROUP BY 1, 2)""".stripMargin
    }
    val union = graft.query.SearchOps.Phrases.map { case (pid, _) => s"SELECT * FROM m_$pid" }
      .mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |${ctes.mkString(",\n")}
       |$union ORDER BY phrase_id, doc_id""".stripMargin
  }

  /** ES rescore oracle: BM25 top-20 window (the bm25Sql scored CTE), then
    * rerank that window ONLY by score + 0.5 × exact-phrase occurrences of
    * the full query text (phraseSql's counting pattern, one m_ CTE per
    * query). Shared verbatim by the relational and index-served twins.
    */
  private def rescoreSql: String = {
    val ctes = RefQueries.set.map { case (qid, text) =>
      val ws = graft.textprep.TextPrep.tokenize(text)
      val n = ws.length
      val conds = ws.zipWithIndex.map { case (w, j) =>
        if (j == 0) s"toks[i] = '$w'" else s"toks[i+$j] = '$w'"
      }.mkString(" AND ")
      s"""m_$qid AS (SELECT '$qid' AS phrase_id, doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n)
         |  WHERE $conds GROUP BY 1, 2)""".stripMargin
    }
    val union = RefQueries.set.map { case (qid, _) => s"SELECT * FROM m_$qid" }
      .mkString(" UNION ALL ")
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |win AS (SELECT query_id, doc_id, score,
       |        row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS brank FROM scored),
       |base AS (SELECT query_id, doc_id, score FROM win WHERE brank <= 20),
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |${ctes.mkString(",\n")},
       |ph AS ($union),
       |resc AS (SELECT b.query_id, b.doc_id, b.score + 0.5 * coalesce(ph.n_matches, 0) AS rescored
       |         FROM base b LEFT JOIN ph ON b.query_id = ph.phrase_id AND b.doc_id = ph.doc_id),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY rescored DESC, doc_id ASC)::INT AS rank, doc_id, round(rescored, 4) AS score FROM resc)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= ${RefQueries.K} ORDER BY query_id, rank""".stripMargin
  }

  private def shinglesSql(n: Int): String =
    s"""arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n),
       |sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM arridx)""".stripMargin

  /** Shared MinHash CTE block ending in `pairs` (verified LSH candidate
    * pairs with est_jaccard >= 0.25) — the base of both the pair oracle and
    * the connected-components cluster oracle.
    */
  private def minhashCtes: String = {
    val mhCols = (0 until 8).map(i =>
      s"min(cast('0x' || substr(md5('$i:' || shingle), 1, 8) AS UBIGINT))::BIGINT AS mh_$i").mkString(", ")
    val bandRows = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, mh_${2 * b}::VARCHAR || '_' || mh_${2 * b + 1}::VARCHAR AS key FROM sig").mkString(" UNION ALL ")
    val agree = (0 until 8).map(i => s"(CASE WHEN a.mh_$i = b.mh_$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""${shinglesSql(3)},
       |sig AS (SELECT doc_id, $mhCols FROM sh GROUP BY doc_id),
       |buckets AS ($bandRows),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id),
       |pairs AS (SELECT id_a, id_b, round(($agree) / 8.0, 4) AS est_jaccard
       |          FROM cand JOIN sig a ON id_a = a.doc_id JOIN sig b ON id_b = b.doc_id
       |          WHERE round(($agree) / 8.0, 4) >= 0.25)""".stripMargin
  }

  private def minhashSql: String =
    s"""WITH $minhashCtes
       |SELECT id_a, id_b, est_jaccard FROM pairs ORDER BY id_a, id_b""".stripMargin

  /** Cluster oracle: exact connected components of the pair graph via a
    * recursive reachability CTE — cluster = min reachable id.
    */
  private def clustersSql: String =
    s"""WITH RECURSIVE $minhashCtes,
       |edges AS (SELECT id_a AS a, id_b AS b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       |reach(id, r) AS (SELECT a, a FROM edges UNION SELECT e.b, reach.r FROM reach JOIN edges e ON reach.id = e.a)
       |SELECT id AS doc_id, min(r)::BIGINT AS cluster FROM reach GROUP BY 1 ORDER BY 1""".stripMargin

  /** PII fixture: deterministic contact tail appended to each doc (the
    * corpus itself is clean lowercase words). Regexes are injected from
    * TextOps so both sides share one definition.
    */
  private def piiSql: String =
    s"""WITH pii AS (SELECT doc_id,
       |  text || ' contact ' || source || (doc_id % 97)::TEXT || '@crawl.example.com tel 555-' ||
       |  lpad((doc_id % 10000)::TEXT, 4, '0') ||
       |  (CASE WHEN doc_id % 3 = 0 THEN ' cc admin@site.example.org' ELSE '' END) AS text
       |FROM documents)
       |SELECT doc_id,
       |  len(regexp_extract_all(text, '${TextOps.EmailRe}'))::BIGINT AS n_emails,
       |  len(regexp_extract_all(text, '${TextOps.PhoneRe}'))::BIGINT AS n_phones,
       |  md5(regexp_replace(regexp_replace(text, '${TextOps.EmailRe}', '[EMAIL]', 'g'), '${TextOps.PhoneRe}', '[PHONE]', 'g')) AS redacted_hash
       |FROM pii ORDER BY doc_id""".stripMargin

  /** Quality-filter oracle: rebuilds the rounded repetition signals and the
    * unrounded stopword ratio, then applies the identical first-failing-rule
    * CASE chain (thresholds are literals on both sides).
    */
  private def qualityFilterSql: String = {
    val stop = TextOps.StopwordsEn.map(w => s"'$w'").mkString(", ")
    s"""WITH $TOK,
       |tokagg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, count(DISTINCT term)::BIGINT AS n_distinct FROM tok GROUP BY 1),
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |gidx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM arrs WHERE len(toks) >= 2),
       |g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram FROM gidx),
       |gc AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM g GROUP BY 1, 2),
       |ga AS (SELECT doc_id, sum(cnt)::BIGINT AS n_grams, max(cnt)::BIGINT AS top_gram_cnt FROM gc GROUP BY 1),
       |rep AS (SELECT doc_id, n_tokens,
       |  round(1.0 - n_distinct::DOUBLE / n_tokens::DOUBLE + 1.0e-9, 4) AS dup_tok_ratio,
       |  round(coalesce(top_gram_cnt::DOUBLE / n_grams::DOUBLE, 0.0) + 1.0e-9, 4) AS top_2gram_frac
       |  FROM tokagg LEFT JOIN ga USING (doc_id)),
       |stops AS (SELECT doc_id, sum(CASE WHEN term IN ($stop) THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS stop_ratio FROM tok GROUP BY 1),
       |v AS (SELECT r.doc_id,
       |  CASE WHEN n_tokens < 20 THEN 'too_short'
       |       WHEN n_tokens > 5000 THEN 'too_long'
       |       WHEN dup_tok_ratio > 0.65 THEN 'repetitive'
       |       WHEN top_2gram_frac > 0.1 THEN 'boilerplate'
       |       WHEN stop_ratio < 0.001 THEN 'no_stopwords'
       |       ELSE 'ok' END AS reason
       |  FROM rep r JOIN stops USING (doc_id))
       |SELECT doc_id, (reason = 'ok') AS keep, reason FROM v ORDER BY doc_id""".stripMargin
  }

  /** URL fixture: mixed-case scheme/host, optional trailing slash, utm
    * query string; doc_id % 17 per source forces canonical collisions.
    */
  private def urlSql: String =
    s"""WITH pages AS (SELECT doc_id,
       |  'HTTPS://WWW.' || source || '.Example.com/' || (doc_id % 17)::TEXT ||
       |  (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
       |  '?utm_source=feed&ref=' || doc_id::TEXT AS url FROM documents),
       |norm AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(url), '^[a-z]+://', ''), '^www[.]', ''), '[?#].*$$', ''), '/+$$', '') AS norm_url FROM pages)
       |SELECT norm_url, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_doc_id
       |FROM norm GROUP BY 1 ORDER BY 1""".stripMargin

  /** SimHash oracle: reproduces the md5-derived 64-bit term hash, the
    * tf-weighted bit accumulation, the 4×16-bit banding, and the Hamming
    * filter — pair enumeration must be exact.
    */
  private def simhashSql: String = {
    val bits = (0 until 64).map(j =>
      s"sum(CASE WHEN (h >> $j) & 1 = 1 THEN tf ELSE -tf END) AS s$j").mkString(", ")
    val sig = (0 until 64).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${java.lang.Long.toUnsignedString(1L << j)}::UBIGINT ELSE 0::UBIGINT END)").mkString(" + ")
    val bands = (0 until 4).map(b =>
      s"SELECT doc_id, $b AS band, (simhash >> ${b * 16}) & 65535::UBIGINT AS key FROM sig").mkString(" UNION ALL ")
    s"""WITH $TOK, $TF,
       |h AS (SELECT doc_id, tf, ('0x' || substr(md5(term), 1, 16))::UBIGINT AS h FROM tf),
       |bits AS (SELECT doc_id, $bits FROM h GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sig AS simhash FROM bits),
       |buckets AS ($bands),
       |cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |         FROM buckets x JOIN buckets y ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id)
       |SELECT id_a, id_b, bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
       |FROM cand JOIN sig a ON id_a = a.doc_id JOIN sig b ON id_b = b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Refined-centroid CTE chain, shared by the IVF-family oracles: the 16
    * lowest-vec_id seeds, one deterministic Lloyd iteration with QUANTIZED
    * per-dimension sums (`floor(x*1e6+0.5)::BIGINT` — integer addition
    * commutes, so the mean is bit-identical to Spark's regardless of
    * reduction order), then the refined assignment. Produces `cents
    * (cent_id, cvec DOUBLE[])`, `assigned(vec_id, cent_id)` and
    * `cd(vec_id, cent_id, cdist)` over the refined centroids — the exact
    * twin of `Similarity.ivfCentroids` + `nearestCentroidCol`.
    */
  private val refinedCentsSql =
    """cents0 AS (SELECT vec_id AS cent_id, embedding AS cvec FROM embeddings ORDER BY vec_id ASC LIMIT 16),
      |a0i AS (SELECT e.vec_id, c0.cent_id, e.embedding AS ev, c0.cvec AS cv,
      |               unnest(generate_series(1, len(e.embedding))) AS i
      |        FROM embeddings e CROSS JOIN cents0 c0),
      |a0d AS (SELECT vec_id, cent_id,
      |          sum((ev[i]::DOUBLE) * (cv[i]::DOUBLE) ORDER BY i) /
      |          (sqrt(sum((ev[i]::DOUBLE) * (ev[i]::DOUBLE) ORDER BY i)) * sqrt(sum((cv[i]::DOUBLE) * (cv[i]::DOUBLE) ORDER BY i))) AS cdist
      |        FROM a0i GROUP BY 1, 2),
      |asg0 AS (SELECT vec_id, cent_id FROM
      |  (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cdist DESC, cent_id ASC) AS r FROM a0d)
      |  WHERE r = 1),
      |edim AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      |upd AS (SELECT a.cent_id, edim.i,
      |          sum(floor((edim.embedding[edim.i]::DOUBLE) * 1000000.0 + 0.5)::BIGINT) AS sq,
      |          count(*)::BIGINT AS n
      |        FROM asg0 a JOIN edim USING (vec_id) GROUP BY 1, 2),
      |cents AS (SELECT c0.cent_id,
      |            coalesce(cu.cvec, list_transform(c0.cvec, x -> x::DOUBLE)) AS cvec
      |          FROM cents0 c0 LEFT JOIN
      |            (SELECT cent_id, list(sq::DOUBLE / (n * 1000000.0) ORDER BY i) AS cvec FROM upd GROUP BY 1) cu
      |          USING (cent_id)),
      |cei AS (SELECT e.vec_id, cents.cent_id, e.embedding AS ev, cents.cvec AS cv,
      |               unnest(generate_series(1, len(e.embedding))) AS i
      |        FROM embeddings e CROSS JOIN cents),
      |cd AS (SELECT vec_id, cent_id,
      |         sum((ev[i]::DOUBLE) * (cv[i])  ORDER BY i) /
      |         (sqrt(sum((ev[i]::DOUBLE) * (ev[i]::DOUBLE) ORDER BY i)) * sqrt(sum((cv[i]) * (cv[i]) ORDER BY i))) AS cdist
      |       FROM cei GROUP BY 1, 2),
      |assigned AS (SELECT vec_id, cent_id FROM
      |  (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cdist DESC, cent_id ASC) AS crank FROM cd)
      |  WHERE crank = 1)""".stripMargin

  /** IVF oracle: exact SQL twin — same seeds + Lloyd-refined centroids,
    * same nearest-centroid assignment and 4-probe, same ordered-summation
    * cosine, same (cosine desc, vec_id asc) ranking.
    */
  private def ivfSql: String =
    s"""WITH $refinedCentsSql,
      |probed AS (SELECT vec_id AS query_id, cent_id FROM
      |  (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cdist DESC, cent_id ASC) AS crank FROM cd WHERE vec_id < 3)
      |  WHERE crank <= 4),
      |cand AS (SELECT p.query_id, a.vec_id FROM probed p JOIN assigned a ON p.cent_id = a.cent_id
      |         WHERE a.vec_id <> p.query_id),
      |pairsi AS (SELECT c.query_id, c.vec_id, q.embedding AS qv, e.embedding AS ev,
      |                  unnest(generate_series(1, len(e.embedding))) AS i
      |           FROM cand c
      |           JOIN embeddings q ON q.vec_id = c.query_id
      |           JOIN embeddings e ON e.vec_id = c.vec_id),
      |scored AS (SELECT query_id, vec_id,
      |             sum((ev[i]::DOUBLE) * (qv[i]::DOUBLE) ORDER BY i) /
      |             (sqrt(sum((ev[i]::DOUBLE) * (ev[i]::DOUBLE) ORDER BY i)) * sqrt(sum((qv[i]::DOUBLE) * (qv[i]::DOUBLE) ORDER BY i))) AS cosine_raw
      |           FROM pairsi GROUP BY 1, 2),
      |ranked AS (SELECT query_id, vec_id, cosine_raw,
      |             row_number() OVER (PARTITION BY query_id ORDER BY cosine_raw DESC, vec_id ASC)::INT AS rank
      |           FROM scored)
      |SELECT query_id, rank, vec_id, round(cosine_raw, 4) + 0.0 AS cosine
      |FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** Recall@10 oracle: IVF ranked set (refined centroids) left-joined onto
    * the brute-force exact ranked set, per query.
    */
  private def recallSql: String =
    s"""WITH $refinedCentsSql,
      |probed AS (SELECT vec_id AS query_id, cent_id FROM
      |  (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cdist DESC, cent_id ASC) AS crank FROM cd WHERE vec_id < 3)
      |  WHERE crank <= 4),
      |cand AS (SELECT p.query_id, a.vec_id FROM probed p JOIN assigned a ON p.cent_id = a.cent_id
      |         WHERE a.vec_id <> p.query_id),
      |pairsi AS (SELECT c.query_id, c.vec_id, q.embedding AS qv, e.embedding AS ev,
      |                  unnest(generate_series(1, len(e.embedding))) AS i
      |           FROM cand c
      |           JOIN embeddings q ON q.vec_id = c.query_id
      |           JOIN embeddings e ON e.vec_id = c.vec_id),
      |iscored AS (SELECT query_id, vec_id,
      |             sum((ev[i]::DOUBLE) * (qv[i]::DOUBLE) ORDER BY i) /
      |             (sqrt(sum((ev[i]::DOUBLE) * (ev[i]::DOUBLE) ORDER BY i)) * sqrt(sum((qv[i]::DOUBLE) * (qv[i]::DOUBLE) ORDER BY i))) AS c
      |           FROM pairsi GROUP BY 1, 2),
      |ivfr AS (SELECT query_id, vec_id FROM
      |  (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id ASC) AS r FROM iscored)
      |  WHERE r <= 10),
      |qv AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 3),
      |bfi AS (SELECT qv.query_id, e.vec_id, e.embedding AS ev, qv.qvec,
      |               unnest(generate_series(1, len(e.embedding))) AS i
      |        FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> qv.query_id),
      |bfs AS (SELECT query_id, vec_id,
      |          sum((ev[i]::DOUBLE) * (qvec[i]::DOUBLE) ORDER BY i) /
      |          (sqrt(sum((ev[i]::DOUBLE) * (ev[i]::DOUBLE) ORDER BY i)) * sqrt(sum((qvec[i]::DOUBLE) * (qvec[i]::DOUBLE) ORDER BY i))) AS c
      |        FROM bfi GROUP BY 1, 2),
      |bfr AS (SELECT query_id, vec_id FROM
      |  (SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id ASC) AS r FROM bfs)
      |  WHERE r <= 10)
      |SELECT b.query_id, count(*)::BIGINT AS n_exact, count(iv.vec_id)::BIGINT AS hits,
      |       round(count(iv.vec_id)::DOUBLE / count(*)::DOUBLE + 1.0e-9, 4) AS recall
      |FROM bfr b LEFT JOIN ivfr iv ON b.query_id = iv.query_id AND b.vec_id = iv.vec_id
      |GROUP BY 1 ORDER BY b.query_id""".stripMargin

  private def facetSql: String =
    s"""WITH $TOK,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, dt.doc_id
       |      FROM q JOIN (SELECT DISTINCT doc_id, term FROM tok) dt ON q.term = dt.term)
       |SELECT query_id, lang, count(*)::BIGINT AS n_docs
       |FROM m JOIN documents USING (doc_id)
       |GROUP BY 1, 2 ORDER BY query_id, lang""".stripMargin

  private def constantScoreSql: String =
    s"""WITH $TOK,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, dt.doc_id
       |      FROM q JOIN (SELECT DISTINCT doc_id, term FROM tok) dt ON q.term = dt.term),
       |r AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY doc_id ASC)::INT AS rank, doc_id FROM m)
       |SELECT query_id, rank, doc_id, 1.0::DOUBLE AS score FROM r
       |WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // ---- extended aggregation DSL (AggsExt) / geo / terms_set oracles ----

  private def extStatsSql: String =
    s"""WITH $matchedCtes,
       |a AS (SELECT m.query_id, count(*)::BIGINT AS n_docs,
       |             min(d.n_chars)::BIGINT AS min_chars, max(d.n_chars)::BIGINT AS max_chars,
       |             sum(d.n_chars)::BIGINT AS sum_chars, sum(d.n_chars * d.n_chars)::BIGINT AS sum_sq
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1)
       |SELECT query_id, n_docs, min_chars, max_chars, sum_chars, sum_sq,
       |       round(sum_chars::DOUBLE / n_docs + 1.0e-9, 4) + 0.0 AS avg_chars,
       |       round(sum_sq::DOUBLE / n_docs - (sum_chars::DOUBLE / n_docs) * (sum_chars::DOUBLE / n_docs) + 1.0e-9, 4) + 0.0 AS var_pop,
       |       round(sqrt(sum_sq::DOUBLE / n_docs - (sum_chars::DOUBLE / n_docs) * (sum_chars::DOUBLE / n_docs)) + 1.0e-9, 4) + 0.0 AS std_dev
       |FROM a ORDER BY query_id""".stripMargin

  private def weightedAvgSql: String =
    s"""WITH $matchedCtes,
       |a AS (SELECT m.query_id, sum(d.n_chars * (m.doc_id % 7 + 1))::BIGINT AS num, sum(m.doc_id % 7 + 1)::BIGINT AS den
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1)
       |SELECT query_id, round(num::DOUBLE / den + 1.0e-9, 4) + 0.0 AS weighted_avg
       |FROM a ORDER BY query_id""".stripMargin

  private def valueCountSql: String =
    s"""WITH $matchedCtes
       |SELECT m.query_id, count(*)::BIGINT AS n_docs, count(nullif(d.lang, 'en'))::BIGINT AS value_count,
       |       (count(*) - count(nullif(d.lang, 'en')))::BIGINT AS n_missing
       |FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1 ORDER BY query_id""".stripMargin

  private def multiTermsSql: String =
    s"""WITH $matchedCtes,
       |b AS (SELECT m.query_id, d.lang, d.source, count(*)::BIGINT AS n_docs
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2, 3),
       |r AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY n_docs DESC, lang ASC, source ASC)::INT AS rank, lang, source, n_docs FROM b)
       |SELECT query_id, rank, lang, source, n_docs FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  private def rareTermsSql: String =
    s"""WITH $matchedCtes,
       |fg AS (SELECT query_id, count(*)::BIGINT AS fg_n FROM m GROUP BY 1),
       |tt AS (SELECT m.query_id, dt.term, count(*)::BIGINT AS n_docs
       |       FROM m JOIN (SELECT DISTINCT doc_id, term FROM tok) dt ON m.doc_id = dt.doc_id
       |       GROUP BY 1, 2),
       |f AS (SELECT tt.query_id, tt.term, tt.n_docs FROM tt JOIN fg ON tt.query_id = fg.query_id
       |      WHERE tt.n_docs <= greatest(1, fg.fg_n // 10)),
       |r AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY n_docs ASC, term ASC)::INT AS rank, term, n_docs FROM f)
       |SELECT query_id, rank, term, n_docs FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private def adjacencySql: String = {
    val tagged = graft.query.AggsExt.AdjacencyFilters
      .map { case (k, pred) => s"SELECT query_id, doc_id, '$k' AS key FROM md WHERE $pred" }
      .mkString(" UNION ALL ")
    s"""WITH $matchedCtes,
       |md AS (SELECT m.query_id, m.doc_id, d.lang, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |tagged AS ($tagged),
       |p AS (SELECT a.query_id, CASE WHEN a.key = b.key THEN a.key ELSE a.key || '&' || b.key END AS key
       |      FROM tagged a JOIN tagged b ON a.query_id = b.query_id AND a.doc_id = b.doc_id AND a.key <= b.key)
       |SELECT query_id, key, count(*)::BIGINT AS n_docs FROM p GROUP BY 1, 2 ORDER BY query_id, key""".stripMargin
  }

  private def bucketSelectorSql: String =
    s"""WITH $matchedCtes,
       |b AS (SELECT m.query_id, d.source, count(*)::BIGINT AS n_docs, sum(d.n_chars)::BIGINT AS sum_chars
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2),
       |f AS (SELECT * FROM b WHERE sum_chars::DOUBLE / n_docs > 250.0),
       |r AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY n_docs DESC, source ASC)::INT AS rank, source, n_docs,
       |             round(sum_chars::DOUBLE / n_docs + 1.0e-9, 4) + 0.0 AS avg_chars FROM f)
       |SELECT query_id, rank, source, n_docs, avg_chars FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  private def pipelineAggsSql: String =
    s"""WITH $matchedCtes,
       |h AS (SELECT m.query_id, strftime(DATE '2025-01-01' + CAST((m.doc_id * 786413 % 5184000) // 86400 AS INTEGER), '%Y-%m-%d') AS day, count(*)::BIGINT AS n_docs
       |      FROM m GROUP BY 1, 2)
       |SELECT query_id, day, n_docs,
       |       (sum(n_docs) OVER w_cum)::BIGINT AS cum_docs,
       |       n_docs - lag(n_docs, 1) OVER (PARTITION BY query_id ORDER BY day ASC) AS deriv,
       |       round((sum(n_docs) OVER w3)::DOUBLE / (count(*) OVER w3) + 1.0e-9, 4) + 0.0 AS mov3
       |FROM h
       |WINDOW w_cum AS (PARTITION BY query_id ORDER BY day ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |       w3 AS (PARTITION BY query_id ORDER BY day ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
       |ORDER BY query_id, day""".stripMargin

  private def topMetricsSql: String =
    s"""WITH $matchedCtes,
       |j AS (SELECT m.query_id, m.doc_id, d.n_chars, d.source FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |r AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY n_chars DESC, doc_id ASC)::INT AS rank, doc_id, n_chars, source FROM j)
       |SELECT query_id, rank, doc_id, n_chars, source FROM r WHERE rank <= 2 ORDER BY query_id, rank""".stripMargin

  private def stringStatsSql: String =
    s"""WITH $matchedCtes,
       |mt AS (SELECT m.query_id, m.doc_id, d.text FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |ls AS (SELECT query_id, count(*)::BIGINT AS n_docs, min(length(text))::BIGINT AS min_len,
       |              max(length(text))::BIGINT AS max_len, sum(length(text))::BIGINT AS sum_len FROM mt GROUP BY 1),
       |chx AS (SELECT query_id, substr(text, i, 1) AS ch
       |        FROM (SELECT query_id, text, unnest(generate_series(1, length(text))) AS i FROM mt)),
       |hc AS (SELECT query_id, ch, count(*)::BIGINT AS cnt FROM chx GROUP BY 1, 2),
       |ent AS (SELECT query_id, round(sum(-(cnt / total) * log2(cnt / total) ORDER BY ch) + 1.0e-9, 4) + 0.0 AS entropy
       |        FROM (SELECT query_id, ch, cnt, (sum(cnt) OVER (PARTITION BY query_id))::DOUBLE AS total FROM hc) GROUP BY 1)
       |SELECT l.query_id, n_docs, min_len, max_len, sum_len,
       |       round(sum_len::DOUBLE / n_docs + 1.0e-9, 4) + 0.0 AS avg_len, entropy
       |FROM ls l JOIN ent USING (query_id) ORDER BY query_id""".stripMargin

  private def termsSetSql: String =
    s"""WITH $TOK,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |c AS (SELECT q.query_id, dt.doc_id, count(*)::BIGINT AS n_matched
       |      FROM q JOIN (SELECT DISTINCT doc_id, term FROM tok) dt ON q.term = dt.term GROUP BY 1, 2)
       |SELECT query_id, doc_id, n_matched FROM c WHERE n_matched >= 2 ORDER BY query_id, doc_id""".stripMargin

  /** Shared exact-BM25 `scored` CTE chain (the bm25Sql WITH body) for
    * oracles that post-process raw scores.
    */
  private def bm25ScoredCtes: String =
    s"""$TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2)""".stripMargin

  private def samplerSql(diversified: Boolean): String = {
    val pool =
      if (diversified)
        """div AS (SELECT *, row_number() OVER (PARTITION BY query_id, source ORDER BY score DESC, doc_id ASC) AS src_rank FROM j),
          |pool AS (SELECT query_id, lang, score, doc_id FROM div WHERE src_rank <= 3),""".stripMargin
      else
        """pool AS (SELECT query_id, lang, score, doc_id FROM j),"""
    s"""WITH $bm25ScoredCtes,
       |j AS (SELECT s.query_id, s.doc_id, s.score, d.source, d.lang FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
       |$pool
       |r AS (SELECT query_id, lang, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank FROM pool)
       |SELECT query_id, lang, count(*)::BIGINT AS n_docs FROM r WHERE rank <= 20
       |GROUP BY 1, 2 ORDER BY query_id, lang""".stripMargin
  }

  private def distanceFeatureSql: String =
    s"""WITH $bm25ScoredCtes,
       |s2 AS (SELECT s.query_id, s.doc_id, s.score + 50.0 / (50.0 + abs(d.n_chars - 300)) AS score2
       |       FROM scored s JOIN documents d ON s.doc_id = d.doc_id),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score2 DESC, doc_id ASC)::INT AS rank, doc_id, round(score2, 4) + 0.0 AS score FROM s2)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= ${RefQueries.K} ORDER BY query_id, rank""".stripMargin

  private def pinnedSql: String = {
    val ids = graft.query.AggsExt.PinnedIds
    val pinnedVals = ids.zipWithIndex
      .map { case (id, i) => s"(${i + 1}, $id)" }.mkString(", ")
    val qVals = RefQueries.set.map { case (qid, _) => s"('$qid')" }.mkString(", ")
    s"""WITH $bm25ScoredCtes,
       |pq(query_id) AS (VALUES $qVals),
       |pinned AS (SELECT query_id, p.rank, p.doc_id FROM pq CROSS JOIN (VALUES $pinnedVals) p(rank, doc_id)),
       |organic AS (SELECT query_id, (row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) + ${ids.size})::INT AS rank, doc_id, round(score, 4) + 0.0 AS score
       |            FROM scored WHERE doc_id NOT IN (${ids.mkString(", ")})),
       |u AS (SELECT query_id, rank::INT AS rank, doc_id::BIGINT AS doc_id, TRUE AS is_pinned, NULL::DOUBLE AS score FROM pinned
       |      UNION ALL SELECT query_id, rank, doc_id, FALSE, score FROM organic WHERE rank <= ${RefQueries.K})
       |SELECT query_id, rank, doc_id, is_pinned, score FROM u ORDER BY query_id, rank""".stripMargin
  }

  private def spanFirstSql: String = {
    val vals = graft.query.SearchOps.SpanFirstProbes
      .map { case (pid, t, end) => s"('$pid','$t',$end)" }.mkString(", ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |p(probe_id, term, maxpos) AS (VALUES $vals),
       |f AS (SELECT p.probe_id, a.doc_id, list_position(a.toks, p.term)::BIGINT AS first_pos, p.maxpos
       |      FROM arrs a CROSS JOIN p)
       |SELECT probe_id, doc_id, first_pos FROM f
       |WHERE first_pos >= 1 AND first_pos <= maxpos ORDER BY probe_id, doc_id""".stripMargin
  }

  private def autoDateHistogramSql: String =
    s"""WITH $matchedCtes,
       |md AS (SELECT query_id, doc_id, CAST((doc_id * 786413 % 5184000) // 86400 AS INTEGER) AS d FROM m),
       |choice AS (SELECT query_id,
       |             CASE WHEN count(DISTINCT d) <= 10 THEN '1d'
       |                  WHEN count(DISTINCT d // 7) <= 10 THEN '7d'
       |                  ELSE '30d' END AS ival FROM md GROUP BY 1),
       |b AS (SELECT md.query_id, c.ival,
       |        (CASE WHEN c.ival = '1d' THEN d WHEN c.ival = '7d' THEN d // 7 ELSE d // 30 END)::BIGINT AS bucket
       |      FROM md JOIN choice c ON md.query_id = c.query_id)
       |SELECT query_id, ival, bucket, count(*)::BIGINT AS n_docs FROM b
       |GROUP BY 1, 2, 3 ORDER BY query_id, bucket""".stripMargin

  private def intervalsSql: String = {
    val span = 6 // maxGaps 4 + 2: k ≤ i + span
    val ctes = graft.query.SearchOps.IntervalRules.map { case (rid, a, b, c) =>
      s"""p_$rid AS (SELECT '$rid' AS rule_id, pa.doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, i FROM arridx WHERE toks[i] = '$a') pa
         |  JOIN (SELECT doc_id, i AS j FROM arridx WHERE toks[i] = '$b') pb ON pa.doc_id = pb.doc_id AND pb.j > pa.i
         |  JOIN (SELECT doc_id, i AS k FROM arridx WHERE toks[i] = '$c') pc ON pa.doc_id = pc.doc_id AND pc.k > pb.j AND pc.k <= pa.i + $span
         |  GROUP BY 1, 2)""".stripMargin
    }
    val union = graft.query.SearchOps.IntervalRules
      .map { case (rid, _, _, _) => s"SELECT * FROM p_$rid" }.mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM arrs WHERE len(toks) >= 1),
       |${ctes.mkString(",\n")}
       |$union ORDER BY rule_id, doc_id""".stripMargin
  }

  private def matrixStatsSql: String =
    s"""WITH $matchedCtes, $DL,
       |a AS (SELECT m.query_id, count(*)::BIGINT AS n_docs,
       |             sum(d.n_chars)::BIGINT AS sum_a, sum(dl.doclen)::BIGINT AS sum_b,
       |             sum(d.n_chars * d.n_chars)::BIGINT AS sum_a2, sum(dl.doclen * dl.doclen)::BIGINT AS sum_b2,
       |             sum(d.n_chars * dl.doclen)::BIGINT AS sum_ab
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id JOIN dl ON m.doc_id = dl.doc_id GROUP BY 1)
       |SELECT query_id, n_docs,
       |  round(sum_a::DOUBLE / n_docs + 1.0e-9, 4) + 0.0 AS mean_a,
       |  round(sum_b::DOUBLE / n_docs + 1.0e-9, 4) + 0.0 AS mean_b,
       |  round(sum_a2::DOUBLE / n_docs - (sum_a::DOUBLE / n_docs) * (sum_a::DOUBLE / n_docs) + 1.0e-9, 4) + 0.0 AS var_a,
       |  round(sum_b2::DOUBLE / n_docs - (sum_b::DOUBLE / n_docs) * (sum_b::DOUBLE / n_docs) + 1.0e-9, 4) + 0.0 AS var_b,
       |  round(sum_ab::DOUBLE / n_docs - (sum_a::DOUBLE / n_docs) * (sum_b::DOUBLE / n_docs) + 1.0e-9, 4) + 0.0 AS covariance,
       |  round((sum_ab::DOUBLE / n_docs - (sum_a::DOUBLE / n_docs) * (sum_b::DOUBLE / n_docs))
       |        / sqrt((sum_a2::DOUBLE / n_docs - (sum_a::DOUBLE / n_docs) * (sum_a::DOUBLE / n_docs))
       |             * (sum_b2::DOUBLE / n_docs - (sum_b::DOUBLE / n_docs) * (sum_b::DOUBLE / n_docs))) + 1.0e-9, 4) + 0.0 AS correlation
       |FROM a ORDER BY query_id""".stripMargin

  private def boxplotSql: String =
    s"""WITH $matchedCtes,
       |v AS (SELECT m.query_id, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |quart AS (SELECT query_id, count(*)::BIGINT AS n_docs, min(n_chars)::BIGINT AS min_v, max(n_chars)::BIGINT AS max_v,
       |                 quantile_cont(n_chars, 0.25) AS q1, quantile_cont(n_chars, 0.5) AS q2, quantile_cont(n_chars, 0.75) AS q3
       |          FROM v GROUP BY 1),
       |madt AS (SELECT v.query_id, quantile_cont(abs(v.n_chars - q.q2), 0.5) AS mad_raw
       |         FROM v JOIN quart q ON v.query_id = q.query_id GROUP BY 1)
       |SELECT q.query_id, n_docs, min_v, max_v,
       |       round(q1 + 1.0e-9, 4) + 0.0 AS q1, round(q2 + 1.0e-9, 4) + 0.0 AS q2, round(q3 + 1.0e-9, 4) + 0.0 AS q3,
       |       round(mad_raw + 1.0e-9, 4) + 0.0 AS mad
       |FROM quart q JOIN madt USING (query_id) ORDER BY query_id""".stripMargin

  private def bucketStatsSql: String =
    s"""WITH $matchedCtes,
       |b AS (SELECT m.query_id, d.source, count(*)::BIGINT AS n_docs
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2),
       |r AS (SELECT query_id, source, n_docs,
       |        row_number() OVER (PARTITION BY query_id ORDER BY n_docs DESC, source ASC) AS rmax,
       |        row_number() OVER (PARTITION BY query_id ORDER BY n_docs ASC, source ASC) AS rmin FROM b),
       |a AS (SELECT query_id, count(*)::BIGINT AS n_buckets, sum(n_docs)::BIGINT AS sum_docs,
       |        max(CASE WHEN rmax = 1 THEN source END) AS max_key, max(CASE WHEN rmax = 1 THEN n_docs END)::BIGINT AS max_docs,
       |        max(CASE WHEN rmin = 1 THEN source END) AS min_key, max(CASE WHEN rmin = 1 THEN n_docs END)::BIGINT AS min_docs
       |      FROM r GROUP BY 1)
       |SELECT query_id, n_buckets, sum_docs, max_key, max_docs, min_key, min_docs,
       |       round(sum_docs::DOUBLE / n_buckets + 1.0e-9, 4) + 0.0 AS avg_docs
       |FROM a ORDER BY query_id""".stripMargin

  private def serialDiffSql: String =
    s"""WITH $matchedCtes,
       |h AS (SELECT m.query_id, strftime(DATE '2025-01-01' + CAST((m.doc_id * 786413 % 5184000) // 86400 AS INTEGER), '%Y-%m-%d') AS day, count(*)::BIGINT AS n_docs FROM m GROUP BY 1, 2)
       |SELECT query_id, day, n_docs,
       |       n_docs - lag(n_docs, 7) OVER (PARTITION BY query_id ORDER BY day ASC) AS sdiff7,
       |       round((n_docs - min(n_docs) OVER w)::DOUBLE / nullif((max(n_docs) OVER w - min(n_docs) OVER w)::DOUBLE, 0.0) + 1.0e-9, 4) + 0.0 AS norm01
       |FROM h
       |WINDOW w AS (PARTITION BY query_id)
       |ORDER BY query_id, day""".stripMargin

  private def rankFeatureSql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |s2 AS (SELECT s.query_id, s.doc_id, s.score * (d.n_chars / (d.n_chars + 250.0)) AS score2
       |       FROM scored s JOIN documents d ON s.doc_id = d.doc_id
       |       WHERE s.score * (d.n_chars / (d.n_chars + 250.0)) >= 1.0),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score2 DESC, doc_id ASC)::INT AS rank, doc_id, round(score2, 4) + 0.0 AS score FROM s2)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= ${RefQueries.K} ORDER BY query_id, rank""".stripMargin

  private def geoCentroidSql: String =
    s"""WITH ev AS (SELECT event_type, ${Geo.CentiLatSql} AS clat, ${Geo.CentiLonSql} AS clon FROM events),
       |a AS (SELECT event_type, count(*)::BIGINT AS n_events, sum(clat)::BIGINT AS sum_lat, sum(clon)::BIGINT AS sum_lon FROM ev GROUP BY 1)
       |SELECT event_type, n_events,
       |       round(sum_lat::DOUBLE / n_events + 1.0e-9, 4) + 0.0 AS centroid_lat,
       |       round(sum_lon::DOUBLE / n_events + 1.0e-9, 4) + 0.0 AS centroid_lon
       |FROM a ORDER BY event_type""".stripMargin

  private def geoBboxSql: String =
    s"""WITH ev AS (SELECT event_type, ${Geo.CentiLatSql} AS clat, ${Geo.CentiLonSql} AS clon FROM events)
       |SELECT event_type, count(*)::BIGINT AS n_events FROM ev
       |WHERE clat BETWEEN -4500 AND 4500 AND clon BETWEEN -9000 AND 9000
       |GROUP BY 1 ORDER BY event_type""".stripMargin

  private def geoDistanceSql: String = {
    val centers = Geo.Centers
      .map { case (id, la, lo, r) => s"('$id',$la,$lo,$r)" }.mkString(", ")
    s"""WITH ev AS (SELECT ${Geo.CentiLatSql} AS clat, ${Geo.CentiLonSql} AS clon FROM events),
       |c(center_id, c_lat, c_lon, radius) AS (VALUES $centers)
       |SELECT center_id, count(*)::BIGINT AS n_events
       |FROM ev CROSS JOIN c
       |WHERE (clat - c_lat) * (clat - c_lat) + (clon - c_lon) * (clon - c_lon) <= radius * radius
       |GROUP BY 1 ORDER BY center_id""".stripMargin
  }

  private def geotileGridSql: String =
    s"""WITH ev AS (SELECT ${Geo.CentiLatSql} AS clat, ${Geo.CentiLonSql} AS clon FROM events),
       |t AS (SELECT ((clon + 18000) * 16) // 36001 AS tile_x, ((clat + 9000) * 16) // 18001 AS tile_y FROM ev),
       |g AS (SELECT tile_x, tile_y, count(*)::BIGINT AS n_events FROM t GROUP BY 1, 2),
       |r AS (SELECT row_number() OVER (ORDER BY n_events DESC, tile_x ASC, tile_y ASC)::INT AS rank, tile_x, tile_y, n_events FROM g)
       |SELECT rank, tile_x, tile_y, n_events FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin

  /** geohash_grid oracle: the same integer quantize / interleave / base-32
    * arithmetic as `Geo.geohashCell`, generated from the shared bit
    * layout.
    */
  private def geohashGridSql: String =
    s"""WITH ev AS (SELECT ${Geo.CentiLatSql} AS clat, ${Geo.CentiLonSql} AS clon FROM events),
       |pts AS (SELECT clat, clon FROM ev),
       |h AS (${Geo.geohashCellSql(5)}),
       |g AS (SELECT geohash, count(*)::BIGINT AS n_events FROM h GROUP BY 1),
       |r AS (SELECT row_number() OVER (ORDER BY n_events DESC, geohash ASC)::INT AS rank, geohash, n_events FROM g)
       |SELECT rank, geohash, n_events FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin

  /** cumulative_cardinality oracle: first-appearance day per (type, user),
    * then a running sum over the sparse day buckets.
    */
  private def cumulativeCardinalitySql: String =
    s"""WITH fd AS (SELECT event_type, user_id, min(strftime(ts, '%Y-%m-%d')) AS day FROM events GROUP BY 1, 2),
       |nb AS (SELECT event_type, day, count(*)::BIGINT AS new_users FROM fd GROUP BY 1, 2)
       |SELECT event_type, day, new_users,
       |  (sum(new_users) OVER (PARTITION BY event_type ORDER BY day ASC))::BIGINT AS cum_users
       |FROM nb ORDER BY event_type, day""".stripMargin

  /** `global` agg oracle, shared by the relational and index twins:
    * match-set metrics beside whole-index metrics.
    */
  private def globalAggSql: String =
    s"""WITH $TOK,
       |dl AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM tok GROUP BY 1),
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tok.doc_id FROM q JOIN tok ON q.term = tok.term),
       |ma AS (SELECT m.query_id, count(*)::BIGINT AS n_matched, sum(dl.doclen)::BIGINT AS s_matched
       |  FROM m JOIN dl ON m.doc_id = dl.doc_id GROUP BY 1),
       |g AS (SELECT count(*)::BIGINT AS n_global, sum(doclen)::BIGINT AS s_global FROM dl)
       |SELECT ma.query_id, ma.n_matched, g.n_global,
       |  round(ma.s_matched::DOUBLE / ma.n_matched + 1.0e-9, 4) + 0.0 AS avg_dl_matched,
       |  round(g.s_global::DOUBLE / g.n_global + 1.0e-9, 4) + 0.0 AS avg_dl_global
       |FROM ma CROSS JOIN g ORDER BY ma.query_id""".stripMargin

  /** span_or oracle, shared by the relational and sidecar twins. */
  private def spanOrSql: String = {
    val ctes = graft.query.SearchOps.SpanOrClauses.map { case (cid, terms) =>
      val in = terms.map(t => s"'$t'").mkString(", ")
      s"""p_$cid AS (SELECT '$cid' AS clause_id, doc_id, count(*)::BIGINT AS n_matches
         |  FROM arridx WHERE toks[i] IN ($in) GROUP BY 2)""".stripMargin
    }
    val union = graft.query.SearchOps.SpanOrClauses
      .map { case (cid, _) => s"SELECT * FROM p_$cid" }.mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM arrs WHERE len(toks) >= 1),
       |${ctes.mkString(",\n")}
       |$union ORDER BY clause_id, doc_id""".stripMargin
  }

  /** span_not oracle (pre/post exclusion window), shared by the twins. */
  private def spanNotSql: String = {
    val ctes = graft.query.SearchOps.SpanNotProbes.map { case (pid, inc, exc, pre, post) =>
      s"""p_$pid AS (SELECT '$pid' AS probe_id, a.doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, i FROM arridx WHERE toks[i] = '$inc') a
         |  WHERE NOT EXISTS (SELECT 1 FROM arridx e
         |    WHERE e.doc_id = a.doc_id AND e.toks[e.i] = '$exc'
         |      AND e.i >= a.i - $pre AND e.i <= a.i + $post)
         |  GROUP BY 2)""".stripMargin
    }
    val union = graft.query.SearchOps.SpanNotProbes
      .map { case (pid, _, _, _, _) => s"SELECT * FROM p_$pid" }.mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM arrs WHERE len(toks) >= 1),
       |${ctes.mkString(",\n")}
       |$union ORDER BY probe_id, doc_id""".stripMargin
  }

  private def existsSql: String =
    s"""WITH e AS (SELECT event_type, json_extract_string(props, '$$.k')::INT % 10 <> 0 AS has_k FROM events)
       |SELECT event_type, sum(CASE WHEN has_k THEN 1 ELSE 0 END)::BIGINT AS n_exists,
       |       sum(CASE WHEN NOT has_k THEN 1 ELSE 0 END)::BIGINT AS n_missing
       |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin

  /** match_bool_prefix oracle, shared by the relational and postings-served
    * twins: distinct-clause counts over the (doc, term) distinct.
    */
  private def matchBoolPrefixSql: String = {
    val vals = graft.query.SearchOps.PhrasePrefixes.flatMap { case (pid, text) =>
      val toks = graft.textprep.TextPrep.tokenize(text)
      if (toks.isEmpty) Seq.empty
      else toks.init.distinct.map(t => s"('$pid','term','$t')") :+ s"('$pid','prefix','${toks.last}')"
    }.mkString(", ")
    s"""WITH $TOK,
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |c(probe_id, kind, v) AS (VALUES $vals)
       |SELECT c.probe_id, dt.doc_id, count(DISTINCT c.kind || ':' || c.v)::BIGINT AS n_clauses
       |FROM dt JOIN c ON (c.kind = 'term' AND dt.term = c.v) OR (c.kind = 'prefix' AND dt.term LIKE c.v || '%')
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** simple_query_string oracle, shared by both twins — all-integer, the
    * same clause rows and Lucene bool verdict `QueryString.simpleClauses`/
    * `simpleTail` pin, prefix expansion done by LIKE against the same
    * vocabulary.
    */
  private def simpleQueryStringSql: String = {
    import graft.query.QueryString
    val qs = QueryString.SimpleQueryStrings
    val (cs, phs) = QueryString.simpleClauses(qs)
    val cVals = cs.map { case (qid, cid, grp, kind, v) =>
      s"('$qid','$cid','$grp','$kind','$v')"
    }.mkString(", ")
    val phCtes = phs.map { case (qid, cid, grp, text) =>
      val ws = graft.textprep.TextPrep.tokenize(text)
      val n = ws.length
      val conds = ws.zipWithIndex.map { case (w, j) =>
        if (j == 0) s"toks[i] = '$w'" else s"toks[i+$j] = '$w'"
      }.mkString(" AND ")
      s"""ph_$cid AS (SELECT '$qid' AS query_id, '$cid' AS clause_id, '$grp' AS grp, doc_id
         |  FROM (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n)
         |  WHERE $conds GROUP BY 1, 2, 3, 4)""".stripMargin
    }
    val mUnion = (Seq("SELECT * FROM tm") ++ phs.map { case (_, cid, _, _) => s"SELECT * FROM ph_$cid" })
      .mkString(" UNION ALL ")
    val qmVals = qs.map { case (qid, _) =>
      val nMust = cs.count(c => c._1 == qid && c._3 == "must") +
        phs.count(p => p._1 == qid && p._3 == "must")
      s"('$qid',${nMust}::BIGINT)"
    }.mkString(", ")
    s"""WITH $TOK,
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |c(query_id, clause_id, grp, kind, v) AS (VALUES $cVals),
       |tm AS (SELECT c.query_id, c.clause_id, c.grp, dt.doc_id
       |       FROM dt JOIN c ON (c.kind = 'term' AND dt.term = c.v) OR (c.kind = 'prefix' AND dt.term LIKE c.v || '%')
       |       GROUP BY 1, 2, 3, 4),
       |${phCtes.mkString(",\n")}${if (phCtes.nonEmpty) "," else ""}
       |m AS ($mUnion),
       |md AS (SELECT query_id, doc_id,
       |         count(DISTINCT CASE WHEN grp = 'must' THEN clause_id END)::BIGINT AS n_must_hit,
       |         max(CASE WHEN grp = 'or' THEN 1 ELSE 0 END) AS or_hit,
       |         max(CASE WHEN grp = 'not' THEN 1 ELSE 0 END) AS not_hit
       |       FROM m GROUP BY 1, 2),
       |qm(query_id, n_must) AS (VALUES $qmVals),
       |h AS (SELECT md.query_id, count(*)::BIGINT AS n_hits
       |      FROM md JOIN qm ON md.query_id = qm.query_id
       |      WHERE md.not_hit = 0
       |        AND (CASE WHEN qm.n_must > 0 THEN md.n_must_hit = qm.n_must ELSE md.or_hit = 1 END)
       |      GROUP BY 1)
       |SELECT qm.query_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits
       |FROM qm LEFT JOIN h ON qm.query_id = h.query_id ORDER BY 1""".stripMargin
  }

  private def geoBoundsSql: String =
    s"""WITH ev AS (SELECT event_type, ${Geo.CentiLatSql} AS clat, ${Geo.CentiLonSql} AS clon FROM events)
       |SELECT event_type, count(*)::BIGINT AS n_events,
       |       min(clat)::BIGINT AS lat_lo, max(clat)::BIGINT AS lat_hi,
       |       min(clon)::BIGINT AS lon_lo, max(clon)::BIGINT AS lon_hi
       |FROM ev GROUP BY 1 ORDER BY event_type""".stripMargin

  /** The DuckDB twin of SearchOps.crawlDay (shared by the date-agg oracles). */
  private def daySql(idCol: String = "doc_id") =
    s"strftime(DATE '2025-01-01' + CAST(($idCol * 786413 % 5184000) // 86400 AS INTEGER), '%Y-%m-%d')"

  private def dateRangeSql: String = {
    val vals = graft.query.AggsExt.DateRanges.map { case (k, f, t) =>
      def q(o: Option[String]) = o.map(s => s"'$s'").getOrElse("NULL")
      s"('$k', ${q(f)}, ${q(t)})"
    }.mkString(", ")
    s"""WITH $matchedCtes,
       |md AS (SELECT query_id, ${daySql()} AS day FROM m),
       |r(key, from_day, to_day) AS (VALUES $vals)
       |SELECT md.query_id, r.key, count(*)::BIGINT AS n_docs
       |FROM md JOIN r ON (r.from_day IS NULL OR md.day >= r.from_day)
       |             AND (r.to_day IS NULL OR md.day < r.to_day)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private def percentileRanksSql: String = {
    val probes = Seq(500L, 1500L, 3000L)
    val sums = probes.map(v =>
      s"sum(CASE WHEN d.n_chars <= $v THEN 1 ELSE 0 END)::BIGINT AS le_$v").mkString(", ")
    val arms = probes.map(v =>
      s"SELECT query_id, $v::BIGINT AS value, round(le_$v::DOUBLE * 100.0 / n_docs + 1.0e-9, 4) + 0.0 AS pct_rank FROM a")
      .mkString(" UNION ALL ")
    s"""WITH $matchedCtes,
       |a AS (SELECT m.query_id, count(*)::BIGINT AS n_docs, $sums
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1)
       |$arms ORDER BY query_id, value""".stripMargin
  }

  private def bucketScriptSql: String =
    s"""WITH $matchedCtes,
       |b AS (SELECT m.query_id, ${daySql("m.doc_id")} AS day, count(*)::BIGINT AS n_docs, sum(d.n_chars)::BIGINT AS sum_chars
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2),
       |med AS (SELECT query_id, round(quantile_cont(n_docs, 0.5) + 1.0e-9, 4) + 0.0 AS p50_docs FROM b GROUP BY 1),
       |tot AS (SELECT query_id, sum(n_docs)::BIGINT AS tot_docs FROM b GROUP BY 1)
       |SELECT b.query_id, b.day, b.n_docs, b.sum_chars,
       |       round(b.sum_chars::DOUBLE / b.n_docs + 1.0e-9, 4) + 0.0 AS avg_chars,
       |       round(b.n_docs::DOUBLE * 100.0 / tot.tot_docs + 1.0e-9, 4) + 0.0 AS pct_of_total,
       |       med.p50_docs
       |FROM b JOIN med ON b.query_id = med.query_id JOIN tot ON b.query_id = tot.query_id
       |ORDER BY 1, 2""".stripMargin

  private def tTestSql: String =
    s"""WITH $matchedCtes,
       |g AS (SELECT m.query_id,
       |        sum(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_a,
       |        sum(CASE WHEN d.lang = 'en' THEN d.n_chars ELSE 0 END)::BIGINT AS sum_a,
       |        sum(CASE WHEN d.lang = 'en' THEN d.n_chars * d.n_chars ELSE 0 END)::BIGINT AS sq_a,
       |        sum(CASE WHEN d.lang <> 'en' THEN 1 ELSE 0 END)::BIGINT AS n_b,
       |        sum(CASE WHEN d.lang <> 'en' THEN d.n_chars ELSE 0 END)::BIGINT AS sum_b,
       |        sum(CASE WHEN d.lang <> 'en' THEN d.n_chars * d.n_chars ELSE 0 END)::BIGINT AS sq_b
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1)
       |SELECT query_id, n_a, n_b,
       |  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
       |    round((sum_a::DOUBLE / n_a - sum_b::DOUBLE / n_b)
       |      / sqrt(((sq_a::DOUBLE - sum_a::DOUBLE * sum_a / n_a) / (n_a - 1)) / n_a
       |           + ((sq_b::DOUBLE - sum_b::DOUBLE * sum_b / n_b) / (n_b - 1)) / n_b) + 1.0e-9, 4) + 0.0
       |  END AS t_stat
       |FROM g ORDER BY query_id""".stripMargin

  private def sigTextSql: String =
    s"""WITH $TOK, $TF,
       |q(query_id, term) AS (VALUES ${RefQueries.sqlValues}),
       |m AS (SELECT DISTINCT q.query_id, tf.doc_id FROM q JOIN tf ON q.term = tf.term),
       |dt AS (SELECT DISTINCT doc_id, term FROM tok),
       |fpd AS (SELECT m.query_id, m.doc_id,
       |          row_number() OVER (PARTITION BY m.query_id, md5(d.text) ORDER BY m.doc_id ASC) AS rn
       |        FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |fgd AS (SELECT query_id, doc_id FROM fpd WHERE rn = 1),
       |fgn AS (SELECT query_id, count(*)::BIGINT AS fg_n FROM fgd GROUP BY 1),
       |bg AS (SELECT term, count(*)::BIGINT AS bg_df FROM dt GROUP BY 1),
       |bgn AS (SELECT count(DISTINCT doc_id)::BIGINT AS bg_n FROM dt),
       |fg AS (SELECT f.query_id, dt.term, count(*)::BIGINT AS fg_df FROM fgd f JOIN dt ON f.doc_id = dt.doc_id GROUP BY 1, 2),
       |j AS (SELECT fg.query_id, fg.term, fg.fg_df, bg.bg_df,
       |  (fg.fg_df::DOUBLE / fgn.fg_n - bg.bg_df::DOUBLE / bgn.bg_n) * ((fg.fg_df::DOUBLE / fgn.fg_n) / (bg.bg_df::DOUBLE / bgn.bg_n)) AS jlh
       |  FROM fg JOIN fgn ON fg.query_id = fgn.query_id JOIN bg ON fg.term = bg.term CROSS JOIN bgn),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY jlh DESC, term ASC)::INT AS rank, term, fg_df, bg_df, round(jlh, 4) AS jlh FROM j WHERE jlh > 0)
       |SELECT query_id, rank, term, fg_df, bg_df, jlh FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  def oracleSql: Map[String, String] = Map(
    // ---- index-served DSL twins: identical oracles to the relational
    // paths — the driver's hash compare IS the index ≡ full-scan proof ----
    "q_bool_not_index" -> mustNotSql,
    "q_should_index" -> shouldMatchSql,
    "q_boost_index" -> boostSql,
    "q_constant_index" -> constantScoreSql,
    "q_facet_index" -> facetSql,
    "q_sort_index" -> sortByFieldSql,
    "q_search_after_index" -> searchAfterSql,
    "q_mlt_index" -> mltSql,
    "q_prefix_index" -> prefixSql,
    "q_fuzzy_index" -> fuzzySql,
    "q_snippets_index" -> snippetSql,
    "q_histogram_agg" -> histogramSql,
    "q_histogram_index" -> histogramSql,
    "q_stats_agg" -> statsAggSql,
    "q_stats_index" -> statsAggSql,
    "q_cardinality_agg" -> cardinalitySql,
    "q_cardinality_index" -> cardinalitySql,
    "q_date_histogram" -> dateHistogramSql,
    "q_date_histogram_index" -> dateHistogramSql,
    "q_wildcard_match" -> wildcardSql,
    "q_wildcard_index" -> wildcardSql,
    "q_regexp_match" -> regexpSql,
    "q_regexp_index" -> regexpSql,
    "q_dis_max" -> disMaxSql,
    "q_dis_max_index" -> disMaxSql,
    "q_range_filter" -> rangeSql,
    "q_range_index" -> rangeSql,
    "q_percentiles_agg" -> percentilesSql,
    "q_percentiles_index" -> percentilesSql,
    "q_top_hits" -> topHitsSql,
    "q_top_hits_index" -> topHitsSql,
    "q_phrase_prefix" -> phrasePrefixSql,
    "q_phrase_prefix_index" -> phrasePrefixSql,
    "q_function_score" -> functionScoreSql,
    "q_function_score_index" -> functionScoreSql,
    "q_bool_full" -> boolFullSql,
    "q_bool_full_index" -> boolFullSql,
    "q_sig_terms" -> sigTermsSql,
    "q_sig_terms_index" -> sigTermsSql,
    "q_rrf_hybrid" -> rrfSql,
    "q_rrf_hybrid_index" -> rrfSql, // WAND + knn legs ≡ exhaustive twins
    "q_rank_eval" -> rankEvalSql,
    "q_rank_eval_index" -> rankEvalSql, // WAND page + postings judgments ≡ relational twin
    "q_linear_hybrid" -> linearSql,
    "q_linear_hybrid_index" -> linearSql, // WAND scores bit-identical ⇒ same normalization
    "q_span_containing" -> spanContainSql(within = false),
    "q_span_containing_index" -> spanContainSql(within = false),
    "q_span_within" -> spanContainSql(within = true),
    "q_span_within_index" -> spanContainSql(within = true),
    "q_terms_enum" -> termsEnumSql,
    "q_terms_enum_index" -> termsEnumSql, // dictionary walk ≡ corpus-derived vocabulary
    "q_mget" -> mgetSql,
    "q_mget_index" -> mgetSql, // docs-sidecar point read ≡ relational left join
    "q_has_child" -> hasChildSql,
    "q_has_parent" -> hasParentSql,
    "q_collapse" -> collapseSql,
    "q_collapse_index" -> collapseSql,
    "q_nested_agg" -> nestedAggSql,
    "q_nested_agg_index" -> nestedAggSql,
    "q_terms_filter" -> termsFilterSql,
    "q_terms_filter_index" -> termsFilterSql,
    "q_corpus_stats" ->
      s"""WITH $TOK, $DL
         |SELECT count(*)::BIGINT AS n_docs, sum(doclen)::BIGINT AS total_tokens,
         |       round(sum(doclen)::DOUBLE / count(*)::DOUBLE + 1.0e-9, 4) AS avgdl FROM dl""".stripMargin,
    "q_term_df" ->
      s"""WITH $TOK
         |SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term ORDER BY term""".stripMargin,
    "q_term_tf" ->
      s"""WITH $TOK
         |SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,
    "q_doclen" ->
      s"""WITH $TOK
         |SELECT doc_id, count(*)::BIGINT AS doclen FROM tok GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_bm25_topk" -> bm25Sql,
    "q_wand_topk" -> bm25Sql, // WAND must be rank-identical to the oracle
    // Unicode analyzer: ordered token stream per doc over the suffixed
    // corpus — RE2 \p{L}\p{N} == Java isLetter/N-category (dialect-pinned)
    "q_tokenize_unicode" ->
      s"""WITH ${UnicodeFixture.SqlCte},
         |arr AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), x -> x <> '') AS a FROM udocs)
         |SELECT doc_id, len(a)::BIGINT AS doclen, array_to_string(a, ' ') AS toks FROM arr ORDER BY doc_id""".stripMargin,
    // WAND over the unicode index ≡ exhaustive relational BM25 with the
    // unicode tokenizer (same scoring text as bm25Sql, utok over udocs)
    "q_wand_unicode" ->
      s"""WITH ${UnicodeFixture.SqlCte}, ${UnicodeFixture.SqlTok},
         |tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM utok GROUP BY 1, 2),
         |dl AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM utok GROUP BY 1),
         |stats AS (SELECT count(*)::BIGINT AS n, sum(doclen)::BIGINT AS tot FROM dl),
         |q(query_id, term) AS (VALUES ${UnicodeFixture.sqlValues}),
         |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
         |scored AS (
         |  SELECT q.query_id, tf.doc_id,
         |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
         |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
         |       ORDER BY q.term ) AS score
         |  FROM q JOIN tf ON q.term = tf.term
         |  JOIN dft ON q.term = dft.term
         |  JOIN dl ON tf.doc_id = dl.doc_id
         |  CROSS JOIN stats
         |  GROUP BY 1, 2),
         |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
         |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= ${UnicodeFixture.K} ORDER BY query_id, rank""".stripMargin,
    "q_bool_and" -> boolAndSql,
    "q_facet_counts" -> facetSql,
    "q_phrase_match" -> phraseSql,
    "q_phrase_index" -> phraseSql, // index path must equal the relational twin
    "q_rescore" -> rescoreSql,
    "q_rescore_index" -> rescoreSql, // WAND+positions path ≡ relational twin
    "q_term_suggest" -> suggestSql,
    "q_suggest_index" -> suggestSql, // term-dictionary path ≡ relational twin
    "q_span_near" -> spanNearSql,
    "q_span_near_index" -> spanNearSql, // positional-sidecar path ≡ relational twin
    "q_completion_suggest" -> completionSql,
    "q_completion_index" -> completionSql, // pruned dictionary path ≡ relational twin
    "q_phrase_suggest" -> phraseSuggestSql,
    "q_phrase_suggest_index" -> phraseSuggestSql, // sidecar-served twin
    "q_snippets" -> snippetSql,
    "q_should_match" -> shouldMatchSql,
    "q_filtered_topk" -> filteredTopkSql,
    "q_filtered_index" -> filteredTopkSql, // index path must equal the relational twin
    "q_search_after" -> searchAfterSql,
    "q_bool_not" -> mustNotSql,
    "q_more_like_this" -> mltSql,
    "q_sort_by_field" -> sortByFieldSql,
    "q_boost_match" -> boostSql,
    "q_constant_score" -> constantScoreSql,
    "q_prefix_match" -> prefixSql,
    "q_fuzzy_expand" -> fuzzySql,
    "q_index_termstats" ->
      s"""WITH $TOK
         |SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY term ORDER BY term""".stripMargin,

    "q_version_dedup" ->
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn FROM events
        |) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_ns_filter" ->
      """SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 4) + 0.0 AS total_value
        |FROM events
        |WHERE regexp_matches(event_type, '^(click|view|purchase)$') AND NOT regexp_matches(event_type, '^view$')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_relate_join" ->
      """SELECT c_mktsegment, count(*)::BIGINT AS n_orders, round(sum(o_totalprice), 4) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_relate_2hop" ->
      """SELECT r_name, count(*)::BIGINT AS n_customers, round(avg(c_acctbal) + 1.0e-9, 4) + 0.0 AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q_tombstone_anti" ->
      """SELECT o_orderstatus, count(*)::BIGINT AS n, round(sum(o_totalprice), 4) AS total
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_patch_lag" ->
      """SELECT user_id, event_id, event_type,
        |       round(value - coalesce(lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC), 0.0), 4) + 0.0 AS delta
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_time_machine" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, count(*)::BIGINT AS n
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "q_bitpack_version" ->
      """SELECT event_id, (cast(floor(epoch(ts)) AS BIGINT) * 4294967296 + (event_id % 4294967296)) AS version
        |FROM events ORDER BY event_id""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,

    "q_worker_partition" ->
      """SELECT doc_id, (cast(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS UBIGINT) % 8)::BIGINT AS whash
        |FROM documents
        |WHERE cast(('0x' || substr(md5(doc_id::VARCHAR), 1, 8)) AS UBIGINT) % 8 = 3
        |ORDER BY doc_id""".stripMargin,
    "q_json_path" ->
      """SELECT json_extract_string(props, '$.k') AS k, count(*)::BIGINT AS n
        |FROM events GROUP BY 1 ORDER BY cast(k AS INT)""".stripMargin,
    "q_invalid_prune" ->
      """SELECT count(*)::BIGINT AS n_valid, round(sum(value), 4) + 0.0 AS sum_valid
        |FROM events
        |WHERE NOT isnan(value) AND NOT isinf(value) AND year(ts) BETWEEN 0 AND 9999""".stripMargin,

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_doc_id
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "q_dedup_ngram" ->
      s"""WITH ${shinglesSql(3)},
         |sdf AS (SELECT shingle, count(*)::BIGINT AS sdf FROM sh GROUP BY 1),
         |rare AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN sdf USING (shingle) WHERE sdf BETWEEN 2 AND 1000),
         |sizes AS (SELECT doc_id, count(*)::BIGINT AS set_size FROM sh GROUP BY 1),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS common
         |          FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT id_a, id_b, common, sa.set_size AS size_a, sb.set_size AS size_b,
         |       round(common::DOUBLE / (sa.set_size + sb.set_size - common)::DOUBLE + 1.0e-9, 4) AS jaccard
         |FROM pairs JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
         |WHERE round(common::DOUBLE / (sa.set_size + sb.set_size - common)::DOUBLE + 1.0e-9, 4) >= 0.1
         |ORDER BY id_a, id_b""".stripMargin,
    "q_minhash_lsh" -> minhashSql,
    "q_neardup_clusters" -> clustersSql,
    "q_pii_redact" -> piiSql,
    "q_url_dedup" -> urlSql,
    "q_chunk_dedup" ->
      """WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
        |chidx AS (SELECT doc_id, toks, unnest(generate_series(0, (len(toks) + 9) // 10 - 1)) AS i FROM arrs WHERE len(toks) > 0),
        |ch AS (SELECT doc_id, i::BIGINT AS chunk_idx,
        |              md5(array_to_string(toks[(i*10+1):(i*10+10)], ' ')) AS chunk_hash,
        |              len(toks[(i*10+1):(i*10+10)])::BIGINT AS chunk_toks
        |       FROM chidx),
        |occ AS (SELECT doc_id, chunk_toks,
        |               count(*) OVER (PARTITION BY chunk_hash) AS occ,
        |               row_number() OVER (PARTITION BY chunk_hash ORDER BY doc_id ASC, chunk_idx ASC) AS rn
        |        FROM ch)
        |SELECT doc_id, count(*)::BIGINT AS n_chunks,
        |       sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_chunks,
        |       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS kept_chunks,
        |       sum(CASE WHEN rn = 1 THEN chunk_toks ELSE 0 END)::BIGINT AS kept_tokens
        |FROM occ GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_rep_signals" ->
      s"""WITH $TOK,
        |tokagg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, count(DISTINCT term)::BIGINT AS n_distinct FROM tok GROUP BY 1),
        |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
        |gidx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM arrs WHERE len(toks) >= 2),
        |g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram FROM gidx),
        |gc AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt FROM g GROUP BY 1, 2),
        |ga AS (SELECT doc_id, sum(cnt)::BIGINT AS n_grams, count(*)::BIGINT AS n_distinct_grams, max(cnt)::BIGINT AS top_gram_cnt FROM gc GROUP BY 1)
        |SELECT doc_id, n_tokens,
        |  round(1.0 - n_distinct::DOUBLE / n_tokens::DOUBLE + 1.0e-9, 4) AS dup_tok_ratio,
        |  round(coalesce(1.0 - n_distinct_grams::DOUBLE / n_grams::DOUBLE, 0.0) + 1.0e-9, 4) AS dup_2gram_ratio,
        |  round(coalesce(top_gram_cnt::DOUBLE / n_grams::DOUBLE, 0.0) + 1.0e-9, 4) AS top_2gram_frac
        |FROM tokagg LEFT JOIN ga USING (doc_id) ORDER BY doc_id""".stripMargin,

    "q_ann_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
        |ev AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
        |pairs AS (
        |  SELECT q.query_id, ev.vec_id,
        |    sum((ev.embedding[ev.i]::DOUBLE) * (q.qv[ev.i]::DOUBLE) ORDER BY ev.i) AS dp,
        |    sum((ev.embedding[ev.i]::DOUBLE) * (ev.embedding[ev.i]::DOUBLE) ORDER BY ev.i) AS na,
        |    sum((q.qv[ev.i]::DOUBLE) * (q.qv[ev.i]::DOUBLE) ORDER BY ev.i) AS nq
        |  FROM ev CROSS JOIN q
        |  WHERE ev.vec_id <> q.query_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, vec_id, round(dp / (sqrt(na) * sqrt(nq)), 4) + 0.0 AS cosine,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC)::INT AS rank
        |  FROM pairs)
        |SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,

    "q_lang_quality" -> {
      val stop = TextOps.StopwordsEn.map(w => s"'$w'").mkString(", ")
      s"""WITH $TOK,
         |tokagg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, avg(length(term)::DOUBLE) AS mean_tok_len,
         |                  sum(CASE WHEN term IN ($stop) THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE AS stop_ratio
         |           FROM tok GROUP BY doc_id),
         |base AS (SELECT doc_id,
         |    (length(text) - length(regexp_replace(text, '[.!?,;:]', '', 'g')))::DOUBLE / length(text)::DOUBLE AS punct_ratio
         |  FROM documents)
         |SELECT b.doc_id, n_tokens, round(mean_tok_len + 1.0e-9, 4) AS mean_tok_len, round(stop_ratio + 1.0e-9, 4) AS stop_ratio,
         |       round(punct_ratio + 1.0e-9, 4) AS punct_ratio,
         |       round(least(n_tokens / 64.0, 1.0) * 0.4 + (1.0 - least(punct_ratio * 10.0, 1.0)) * 0.3 + least(stop_ratio * 5.0, 1.0) * 0.3 + 1.0e-9, 4) AS quality
         |FROM base b JOIN tokagg t ON b.doc_id = t.doc_id ORDER BY b.doc_id""".stripMargin
    },
    "q_token_counts" ->
      s"""SELECT doc_id,
        |  len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT AS ws_tokens,
        |  len(list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> ''))::BIGINT AS alnum_tokens,
        |  length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))::BIGINT AS symbol_tokens,
        |  len(regexp_extract_all(lower(text), '${TextOps.BpeRe}'))::BIGINT AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quality_filter" -> qualityFilterSql,
    "q_top_terms" ->
      s"""WITH $TOK, $TF, $DL, $STATS,
         |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf::DOUBLE * ln(stats.n::DOUBLE / dft.df::DOUBLE) AS tfidf_raw
         |       FROM tf JOIN dft USING (term) CROSS JOIN stats),
         |rk AS (SELECT doc_id, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf_raw DESC, term ASC)::INT AS rank, term, round(tfidf_raw + 1.0e-9, 4) AS tfidf FROM sc)
         |SELECT doc_id, rank, term, tfidf FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q_pmi_pairs" ->
      s"""WITH $TOK,
         |arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
         |gidx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM arrs WHERE len(toks) >= 2),
         |g AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM gidx),
         |c2 AS (SELECT w1, w2, count(*)::BIGINT AS n_pair FROM g GROUP BY 1, 2),
         |c1 AS (SELECT term, count(*)::BIGINT AS n FROM tok GROUP BY 1),
         |tot AS (SELECT (SELECT count(*)::BIGINT FROM tok) AS t, (SELECT count(*)::BIGINT FROM g) AS gg)
         |SELECT c2.w1, c2.w2, c2.n_pair,
         |  round(ln((c2.n_pair::DOUBLE / tot.gg::DOUBLE) / ((a.n::DOUBLE / tot.t::DOUBLE) * (b.n::DOUBLE / tot.t::DOUBLE))) + 1.0e-9, 4) + 0.0 AS pmi
         |FROM c2 JOIN c1 a ON c2.w1 = a.term JOIN c1 b ON c2.w2 = b.term CROSS JOIN tot
         |WHERE c2.n_pair >= 5 ORDER BY c2.w1, c2.w2""".stripMargin,
    "q_source_report" ->
      s"""WITH $TOK, $DL
         |SELECT d.source, count(*)::BIGINT AS n_docs,
         |  sum(coalesce(dl.doclen, 0))::BIGINT AS total_tokens,
         |  round(sum(coalesce(dl.doclen, 0))::DOUBLE / count(*)::DOUBLE + 1.0e-9, 4) AS mean_doclen,
         |  count(DISTINCT d.lang)::BIGINT AS n_langs
         |FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_len_deciles" ->
      s"""WITH $TOK, $DL,
         |t AS (SELECT doc_id, doclen, ntile(10) OVER (ORDER BY doclen, doc_id)::INT AS decile FROM dl)
         |SELECT decile, count(*)::BIGINT AS n_docs, min(doclen) AS min_len, max(doclen) AS max_len, sum(doclen)::BIGINT AS sum_len
         |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "q_sq8_topk" ->
      """WITH ev AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
        |mm AS (SELECT i, min(embedding[i]::DOUBLE) AS mn, max(embedding[i]::DOUBLE) AS mx FROM ev GROUP BY 1),
        |dec AS (SELECT ev.vec_id, ev.i,
        |  CASE WHEN mm.mx = mm.mn THEN mm.mn
        |       ELSE mm.mn + floor((ev.embedding[ev.i]::DOUBLE - mm.mn) / (mm.mx - mm.mn) * 255.0 + 0.5) / 255.0 * (mm.mx - mm.mn) END AS v
        |  FROM ev JOIN mm USING (i)),
        |qd AS (SELECT vec_id AS query_id, i, v AS qv FROM dec WHERE vec_id < 3),
        |pairs AS (SELECT qd.query_id, d.vec_id,
        |    sum(d.v * qd.qv ORDER BY d.i) AS dp,
        |    sum(d.v * d.v ORDER BY d.i) AS na,
        |    sum(qd.qv * qd.qv ORDER BY d.i) AS nq
        |  FROM dec d JOIN qd ON d.i = qd.i
        |  WHERE d.vec_id <> qd.query_id
        |  GROUP BY 1, 2),
        |ranked AS (SELECT query_id, vec_id, round(dp / (sqrt(na) * sqrt(nq)), 4) + 0.0 AS cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC)::INT AS rank FROM pairs)
        |SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_fingerprint" ->
      s"""WITH $TOK,
         |d AS (SELECT DISTINCT doc_id, term FROM tok)
         |SELECT doc_id, md5(string_agg(term, ' ' ORDER BY term)) AS fingerprint
         |FROM d GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_lang_id" -> {
      def hits(lang: String) = {
        val words = TextOps.LangStopwords(lang).map(w => s"'$w'").mkString(", ")
        s"sum(CASE WHEN term IN ($words) THEN 1 ELSE 0 END)::BIGINT AS hits_$lang"
      }
      s"""WITH $TOK,
         |agg AS (SELECT doc_id, ${hits("de")}, ${hits("en")}, ${hits("es")}, ${hits("fr")} FROM tok GROUP BY doc_id)
         |SELECT doc_id,
         |  CASE WHEN hits_fr > greatest(hits_de, hits_en, hits_es) THEN 'fr'
         |       WHEN hits_es > greatest(hits_de, hits_en) THEN 'es'
         |       WHEN hits_en > hits_de THEN 'en'
         |       ELSE 'de' END AS lang_pred,
         |  hits_de, hits_en, hits_es, hits_fr
         |FROM agg ORDER BY doc_id""".stripMargin
    },
    "q_media_meta" ->
      """SELECT doc_id,
        |  (octet_length(encode('<html><body>' || text || '</body></html>')) +
        |   CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 4 ELSE 0 END)::BIGINT AS byte_len,
        |  CASE doc_id % 4 WHEN 0 THEN '89504e47' WHEN 1 THEN 'ffd8ffe0'
        |                  WHEN 2 THEN '52494646' ELSE '3c68746d' END AS magic,
        |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |                  WHEN 2 THEN 'riff' ELSE 'html' END AS kind
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_frames" ->
      """WITH payload AS (
        |  SELECT doc_id, doc_id % 4 AS m,
        |         encode('<html><body>' || text || '</body></html>') AS body FROM documents),
        |withmagic AS (
        |  SELECT doc_id,
        |    CASE m WHEN 0 THEN unhex('89504e47') || body WHEN 1 THEN unhex('ffd8ffe0') || body
        |           WHEN 2 THEN unhex('52494646') || body ELSE body END AS blob
        |  FROM payload),
        |base AS (
        |  SELECT doc_id, blob, octet_length(blob)::BIGINT AS blen,
        |         greatest(1, octet_length(blob) // 4)::BIGINT AS stride FROM withmagic),
        |frames AS (
        |  SELECT doc_id, blob, blen, stride, unnest(generate_series(0, 3))::BIGINT AS frame FROM base)
        |SELECT doc_id, frame::INT AS frame,
        |       (least(blen, frame * stride + 16) - frame * stride)::INT AS frame_bytes,
        |       lower(substr(hex(blob), (frame * stride * 2 + 1)::INT,
        |                    ((least(blen, frame * stride + 16) - frame * stride) * 2)::INT)) AS frame_hex
        |FROM frames WHERE frame * stride < blen
        |ORDER BY doc_id, frame""".stripMargin,
    "q_media_oversize" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    (octet_length(encode('<html><body>' || text || '</body></html>')) +
        |     CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 4 ELSE 0 END)::BIGINT AS byte_len,
        |    CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |                    WHEN 2 THEN 'riff' ELSE 'html' END AS kind
        |  FROM documents)
        |SELECT kind, count(*)::BIGINT AS n_total,
        |  sum(CASE WHEN byte_len <= 300 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  sum(CASE WHEN byte_len > 300 THEN 1 ELSE 0 END)::BIGINT AS n_dropped,
        |  max(CASE WHEN byte_len <= 300 THEN byte_len END)::BIGINT AS max_kept_bytes
        |FROM p GROUP BY kind ORDER BY kind""".stripMargin,
    "q_scroll_export" ->
      s"""WITH $TOK, $DL,
         |alldl AS (SELECT d.doc_id, coalesce(dl.doclen, 0)::BIGINT AS doclen
         |          FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id),
         |e AS (SELECT doc_id, doclen, (row_number() OVER (ORDER BY doc_id) - 1) AS rn FROM alldl)
         |SELECT (rn // 40)::INT AS page, doc_id, doclen FROM e WHERE rn < 120 ORDER BY doc_id""".stripMargin,
    // meta override channel: targets/routing/skip re-derived from the
    // fixture rules; n_buckets = ceil(n/32) because routing groups get
    // CONTIGUOUS docId sub-ranges (co-location verified physically)
    "q_doc_meta_routing" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN 'alt' ELSE 'main' END AS target,
        |    CASE WHEN doc_id % 2 = 0 THEN 'r' || (doc_id % 5)::VARCHAR ELSE '' END AS routing,
        |    CASE WHEN doc_id % 5 = 0 THEN doc_id * 1000
        |         ELSE (1735689600 + doc_id) * 4294967296 END AS version
        |  FROM documents WHERE doc_id % 7 <> 0)
        |SELECT target, routing, count(*)::BIGINT AS n_docs,
        |  ((count(*) + 31) // 32)::BIGINT AS n_buckets,
        |  min(version)::BIGINT AS min_version, max(version)::BIGINT AS max_version
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_media_dims" ->
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif' END AS kind,
        |  (16 + doc_id % 617)::INT AS width,
        |  (16 + doc_id % 419)::INT AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_media_guard" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    (octet_length(encode('<html><body>' || text || '</body></html>')) +
        |     CASE WHEN doc_id % 4 IN (0, 1, 2) THEN 4 ELSE 0 END)::BIGINT AS byte_len,
        |    CASE doc_id % 4 WHEN 0 THEN '89504e47' WHEN 1 THEN 'ffd8ffe0'
        |                    WHEN 2 THEN '52494646' ELSE '3c68746d' END AS magic,
        |    CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |                    WHEN 2 THEN 'riff' ELSE 'html' END AS kind
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN byte_len <= 300 THEN byte_len END AS byte_len,
        |  CASE WHEN byte_len <= 300 THEN magic END AS magic,
        |  CASE WHEN byte_len <= 300 THEN kind ELSE 'omitted' END AS kind
        |FROM p ORDER BY doc_id""".stripMargin,
    "q_simhash_pairs" -> simhashSql,
    "q_ann_ivf" -> ivfSql,
    // SQ8×IVF oracle: the IVF candidate set (refined centroids on RAW
    // vectors) scored with the SQ8-decoded values — quantize for memory,
    // bucket for compute, both halves reproduced exactly
    "q_sq8_ivf" ->
      s"""WITH $refinedCentsSql,
        |ev AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
        |mm AS (SELECT i, min(embedding[i]::DOUBLE) AS mn, max(embedding[i]::DOUBLE) AS mx FROM ev GROUP BY 1),
        |dec AS (SELECT ev.vec_id, ev.i,
        |  CASE WHEN mm.mx = mm.mn THEN mm.mn
        |       ELSE mm.mn + floor((ev.embedding[ev.i]::DOUBLE - mm.mn) / (mm.mx - mm.mn) * 255.0 + 0.5) / 255.0 * (mm.mx - mm.mn) END AS v
        |  FROM ev JOIN mm USING (i)),
        |probed AS (SELECT vec_id AS query_id, cent_id FROM
        |  (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id ORDER BY cdist DESC, cent_id ASC) AS crank FROM cd WHERE vec_id < 3)
        |  WHERE crank <= 4),
        |cand AS (SELECT p.query_id, a.vec_id FROM probed p JOIN assigned a ON p.cent_id = a.cent_id
        |         WHERE a.vec_id <> p.query_id),
        |qd AS (SELECT vec_id AS query_id, i, v AS qv FROM dec WHERE vec_id < 3),
        |pairs AS (SELECT c.query_id, c.vec_id,
        |    sum(d.v * qd.qv ORDER BY d.i) AS dp,
        |    sum(d.v * d.v ORDER BY d.i) AS na,
        |    sum(qd.qv * qd.qv ORDER BY d.i) AS nq
        |  FROM cand c JOIN dec d ON d.vec_id = c.vec_id
        |  JOIN qd ON qd.query_id = c.query_id AND qd.i = d.i
        |  GROUP BY 1, 2),
        |ranked AS (SELECT query_id, vec_id, round(dp / (sqrt(na) * sqrt(nq)), 4) + 0.0 AS cosine,
        |    row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC)::INT AS rank FROM pairs)
        |SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_ann_recall" -> recallSql,

    "q_embed_neardup" ->
      s"""WITH $refinedCentsSql,
        |pr AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |       FROM assigned a JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id),
        |pi AS (SELECT id_a, id_b, ea.embedding AS va, eb.embedding AS vb,
        |              unnest(generate_series(1, len(ea.embedding))) AS i
        |       FROM pr JOIN embeddings ea ON ea.vec_id = id_a JOIN embeddings eb ON eb.vec_id = id_b),
        |sc AS (SELECT id_a, id_b,
        |         sum((va[i]::DOUBLE) * (vb[i]::DOUBLE) ORDER BY i) /
        |         (sqrt(sum((va[i]::DOUBLE) * (va[i]::DOUBLE) ORDER BY i)) * sqrt(sum((vb[i]::DOUBLE) * (vb[i]::DOUBLE) ORDER BY i))) AS cosine_raw
        |       FROM pi GROUP BY 1, 2)
        |SELECT id_a, id_b, round(cosine_raw, 4) + 0.0 AS cosine FROM sc
        |WHERE cosine_raw >= 0.35 ORDER BY id_a, id_b""".stripMargin,
    "q_canonical_encode" ->
      """SELECT event_id,
        |  strftime(ts, '%Y-%m-%dT%H:%M:%S.%gZ') AS time_canonical,
        |  substr(md5(event_id::VARCHAR), 1, 8) || '-' || substr(md5(event_id::VARCHAR), 9, 4) || '-' ||
        |    substr(md5(event_id::VARCHAR), 13, 4) || '-' || substr(md5(event_id::VARCHAR), 17, 4) || '-' ||
        |    substr(md5(event_id::VARCHAR), 21, 12) AS uuid_canonical,
        |  to_base64(unhex(md5(event_id::VARCHAR))) AS bin_base64,
        |  CASE WHEN isnan(value) OR isinf(value) THEN NULL
        |       ELSE (value::DECIMAL(38,6))::VARCHAR END AS decimal_canonical
        |FROM events ORDER BY event_id""".stripMargin,
    "q_merge_patch" ->
      """WITH base AS (
        |  SELECT user_id, event_id, event_type AS curT,
        |    CASE WHEN json_extract_string(props, '$.k')::INT % 10 <> 0
        |         THEN json_extract_string(props, '$.k')::INT END AS curK,
        |    lag(event_type) OVER w AS prevT,
        |    lag(CASE WHEN json_extract_string(props, '$.k')::INT % 10 <> 0
        |             THEN json_extract_string(props, '$.k')::INT END) OVER w AS prevK,
        |    (lag(event_id) OVER w IS NOT NULL) AS hasPrev
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        |SELECT user_id, event_id,
        |  '{' || concat_ws(',',
        |    CASE WHEN NOT hasPrev THEN (CASE WHEN curK IS NOT NULL THEN '"k":' || curK::VARCHAR END)
        |         ELSE CASE WHEN curK IS NOT NULL AND (prevK IS NULL OR prevK <> curK) THEN '"k":' || curK::VARCHAR
        |                   WHEN curK IS NULL AND prevK IS NOT NULL THEN '"k":null' END END,
        |    CASE WHEN NOT hasPrev OR prevT <> curT THEN '"type":"' || curT || '"' END) || '}' AS patch
        |FROM base ORDER BY user_id, event_id""".stripMargin,
    "q_index_routing" ->
      """SELECT CASE event_type WHEN 'click' THEN 'idx_clicks' WHEN 'view' THEN 'idx_views'
        |       ELSE 'idx_' || event_type END AS target_index, count(*)::BIGINT AS n
        |FROM events GROUP BY 1 ORDER BY target_index""".stripMargin,
    "q_ns_discovery" ->
      """SELECT 'nation' AS ns, count(*)::BIGINT AS n_rows FROM nation
        |UNION ALL SELECT 'supplier' AS ns, count(*)::BIGINT AS n_rows FROM supplier
        |ORDER BY ns""".stripMargin,
    // exact twin of the config-selected chain lowercase_text → strip_punct →
    // drop_short(>=200) over namespace `documents`
    "q_transform_config" ->
      """WITH t AS (SELECT doc_id, regexp_replace(lower(text), '[.!?,;:]', '', 'g') AS text FROM documents)
        |SELECT doc_id, md5(text) AS text_hash, length(text)::BIGINT AS n_chars_t
        |FROM t WHERE length(text) >= 200 ORDER BY doc_id""".stripMargin,
    "q_query_string" -> queryStringSql,
    "q_query_string_index" -> queryStringSql, // index+positions path ≡ relational twin
    "q_multi_match" -> multiMatchSql,
    "q_multi_match_index" -> multiMatchSql, // per-field index path ≡ relational twin
    "q_ids_lookup" -> idsSql,
    "q_ids_index" -> idsSql, // docs-table point read ≡ relational twin
    "q_search_hits" -> searchHitsSql,
    "q_search_hits_index" -> searchHitsSql, // postings+fetch path ≡ relational twin
    "q_search_aggs" -> searchAggsSql,
    "q_search_aggs_index" -> searchAggsSql, // index match-set path ≡ relational twin
    "q_percolate" -> percolateSql,
    // filtered kNN: the ann_cosine oracle with pre-filter candidacy (label=1)
    "q_ann_filtered" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
        |ev AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings WHERE label = 1),
        |pairs AS (
        |  SELECT q.query_id, ev.vec_id,
        |    sum((ev.embedding[ev.i]::DOUBLE) * (q.qv[ev.i]::DOUBLE) ORDER BY ev.i) AS dp,
        |    sum((ev.embedding[ev.i]::DOUBLE) * (ev.embedding[ev.i]::DOUBLE) ORDER BY ev.i) AS na,
        |    sum((q.qv[ev.i]::DOUBLE) * (q.qv[ev.i]::DOUBLE) ORDER BY ev.i) AS nq
        |  FROM ev CROSS JOIN q
        |  WHERE ev.vec_id <> q.query_id
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, vec_id, round(dp / (sqrt(na) * sqrt(nq)), 4) + 0.0 AS cosine,
        |         row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC)::INT AS rank
        |  FROM pairs)
        |SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
    "q_composite_agg" -> compositeSql,
    "q_composite_index" -> compositeSql, // index match-set path ≡ relational twin
    // benchmark set = shingles of doc_id % 101 == 0, derived identically
    "q_decontaminate" -> {
      val n = 5
      val cat = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
      s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
         |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - ${n - 1})) AS i FROM arrs WHERE len(toks) >= $n),
         |sh AS (SELECT DISTINCT doc_id, $cat AS shingle FROM arridx),
         |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 101 = 0)
         |SELECT doc_id, count(*)::BIGINT AS n_hits FROM sh
         |WHERE doc_id % 101 <> 0 AND shingle IN (SELECT shingle FROM bench)
         |GROUP BY 1 ORDER BY doc_id""".stripMargin
    },
    // p_s = sqrt(n_min/n_s); u = md5-uniform of 'samp:<doc_id>' — sqrt and
    // the 2^32 division are correctly rounded IEEE, so both sides agree
    "q_source_sample" ->
      """WITH c AS (SELECT source, count(*)::BIGINT AS n_s FROM documents GROUP BY 1),
        |m AS (SELECT min(n_s)::BIGINT AS n_min FROM c)
        |SELECT d.doc_id, d.source FROM documents d JOIN c ON d.source = c.source CROSS JOIN m
        |WHERE cast('0x' || substr(md5('samp:' || d.doc_id), 1, 8) AS UBIGINT)::DOUBLE / 4294967296.0
        |      < sqrt(m.n_min::DOUBLE / c.n_s::DOUBLE)
        |ORDER BY doc_id""".stripMargin,
    // unigram-LM surprisal (perplexity-style quality signal): ordered fold
    // of tf·(−ln p) per doc over ascending terms, / doclen — the Bm25Sql
    // summation discipline, so doubles match bit-for-bit
    "q_unigram_nll" ->
      s"""WITH $TOK, $TF, $DL,
         |c AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY 1),
         |tot AS (SELECT sum(cnt)::BIGINT AS t FROM c)
         |SELECT tf.doc_id, dl.doclen,
         |  round(sum( -(tf.tf::DOUBLE * ln(c.cnt::DOUBLE / tot.t::DOUBLE)) ORDER BY tf.term ) / dl.doclen::DOUBLE, 4) AS nll
         |FROM tf JOIN c ON tf.term = c.term JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN tot
         |GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "q_boosting" -> boostingSql,
    "q_boosting_index" -> boostingSql, // postings-served demote set ≡ relational twin
    "q_range_agg" -> rangeAggSql,
    "q_range_agg_index" -> rangeAggSql, // index match-set path ≡ relational twin
    "q_filters_agg" -> filtersAggSql,
    "q_filters_agg_index" -> filtersAggSql, // index match-set path ≡ relational twin
    "q_count" -> countSql,
    "q_count_index" -> countSql, // docIds-only traversal ≡ relational twin
    "q_term_vectors" -> termVectorsSql,
    "q_term_vectors_index" -> termVectorsSql, // sidecar point-read ≡ re-analyze twin
    "q_explain" -> explainSql,
    "q_explain_index" -> explainSql, // block-pruned postings decode ≡ relational twin
    // _analyze: the analyzer's (position, token) stream over fixed probe
    // texts — DuckDB reproduces the tokenizer as lower + [^a-z0-9]+ split
    "q_analyze" -> {
      val vals = graft.query.SearchOps.AnalyzeProbes
        .map { case (i, t) => s"($i, '$t')" }.mkString(", ")
      s"""WITH p(text_id, txt) AS (VALUES $vals),
         |arr AS (SELECT text_id, regexp_split_to_array(lower(txt), '[^a-z0-9]+') AS a FROM p),
         |idx AS (SELECT text_id, a, unnest(generate_series(1, len(a))) AS i FROM arr),
         |toks AS (SELECT text_id, i, a[i] AS token FROM idx WHERE a[i] <> '')
         |SELECT text_id, (row_number() OVER (PARTITION BY text_id ORDER BY i) - 1)::INT AS position, token
         |FROM toks ORDER BY text_id, position""".stripMargin
    },
    // concat-and-chop packing manifest: global token offset in doc_id order
    "q_seq_pack" ->
      s"""WITH $TOK, $DL,
         |c AS (SELECT doc_id, doclen, coalesce(sum(doclen) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_offset FROM dl)
         |SELECT doc_id, tok_offset, doclen, (tok_offset // 512)::BIGINT AS win_start, ((tok_offset + doclen - 1) // 512)::BIGINT AS win_end
         |FROM c ORDER BY doc_id""".stripMargin,

    // ---- extended aggregation DSL / geo / terms_set ----
    "q_ext_stats" -> extStatsSql,
    "q_weighted_avg" -> weightedAvgSql,
    "q_value_count" -> valueCountSql,
    "q_multi_terms" -> multiTermsSql,
    "q_rare_terms" -> rareTermsSql,
    "q_adjacency_matrix" -> adjacencySql,
    "q_bucket_selector" -> bucketSelectorSql,
    "q_pipeline_aggs" -> pipelineAggsSql,
    "q_top_metrics" -> topMetricsSql,
    "q_string_stats" -> stringStatsSql,
    "q_terms_set" -> termsSetSql,
    "q_terms_set_index" -> termsSetSql, // matched-accumulator filter ≡ relational twin
    "q_geo_bbox" -> geoBboxSql,
    "q_geo_distance" -> geoDistanceSql,
    "q_geo_centroid" -> geoCentroidSql,
    "q_geotile_grid" -> geotileGridSql,
    "q_matrix_stats" -> matrixStatsSql,
    "q_boxplot" -> boxplotSql,
    "q_bucket_stats" -> bucketStatsSql,
    "q_serial_diff" -> serialDiffSql,
    "q_rank_feature" -> rankFeatureSql,
    "q_rank_feature_index" -> rankFeatureSql, // scoredMatches BM25 ≡ ordered-fold relational
    "q_intervals" -> intervalsSql,
    "q_intervals_index" -> intervalsSql, // positional-sidecar path ≡ relational twin
    "q_sampler_agg" -> samplerSql(diversified = false),
    "q_sampler_index" -> samplerSql(diversified = false),
    "q_diversified_sampler" -> samplerSql(diversified = true),
    "q_diversified_index" -> samplerSql(diversified = true),
    "q_distance_feature" -> distanceFeatureSql,
    "q_distance_feature_index" -> distanceFeatureSql,
    "q_pinned" -> pinnedSql,
    "q_pinned_index" -> pinnedSql,
    "q_span_first" -> spanFirstSql,
    "q_span_first_index" -> spanFirstSql, // sidecar head-position path ≡ relational twin
    "q_auto_date_histogram" -> autoDateHistogramSql,
    "q_geo_bounds" -> geoBoundsSql,
    "q_geohash_grid" -> geohashGridSql,
    "q_cumulative_cardinality" -> cumulativeCardinalitySql,
    "q_global_agg" -> globalAggSql,
    "q_global_agg_index" -> globalAggSql, // postings match + sidecar global ≡ relational
    "q_span_or" -> spanOrSql,
    "q_span_or_index" -> spanOrSql, // sidecar length-sum path ≡ relational twin
    "q_span_not" -> spanNotSql,
    "q_span_not_index" -> spanNotSql, // sidecar window-exclusion path ≡ relational twin
    "q_date_range_agg" -> dateRangeSql,
    "q_percentile_ranks" -> percentileRanksSql,
    "q_bucket_script" -> bucketScriptSql,
    "q_ttest" -> tTestSql,
    "q_sig_text" -> sigTextSql,
    "q_exists" -> existsSql,
    "q_match_bool_prefix" -> matchBoolPrefixSql,
    "q_match_bool_prefix_index" -> matchBoolPrefixSql, // postings-decode path ≡ relational twin
    "q_simple_query_string" -> simpleQueryStringSql,
    "q_simple_query_string_index" -> simpleQueryStringSql, // postings+sidecar path ≡ relational twin
    "q_rate_agg" -> rateAggSql,
    "q_moving_percentiles" -> movingPercentilesSql,
    "q_random_sampler" -> randomSamplerSql,
    "q_var_width_histogram" -> varWidthHistogramSql,
    "q_frequent_item_sets" -> frequentItemSetsSql,
    "q_categorize_text" -> categorizeTextSql,
    "q_geo_distance_agg" -> geoDistanceAggSql,
    "q_ann_threshold" -> annThresholdSql,
    "q_field_caps" -> fieldCapsSql,
    "q_msearch" -> msearchSql,
    "q_msearch_index" -> msearchSql, // one WAND pass + per-request size ≡ relational twin
    "q_search_template" -> searchTemplateSql,
    "q_combined_fields" -> combinedFieldsSql,
    "q_combined_fields_index" -> combinedFieldsSql, // per-field index stats blend ≡ relational twin
    "q_span_multi" -> spanMultiSql,
    "q_span_multi_index" -> spanMultiSql, // dictionary expansion + sidecar ≡ relational twin
    "q_reverse_nested" -> reverseNestedSql,
    "q_inner_hits" -> innerHitsSql,
    "q_validate_query" -> validateQuerySql
  )

  /** inner_hits oracle: bounded-children parents with their top-2 open
    * orders inlined (per-parent window keyed by custkey).
    */
  private def innerHitsSql: String =
    """WITH par AS (SELECT o_custkey, count(*)::BIGINT AS n_children FROM orders
      |             WHERE o_orderstatus = 'O' GROUP BY 1 HAVING count(*) BETWEEN 2 AND 5),
      |ch AS (SELECT o.o_custkey AS c_custkey, p.n_children,
      |              row_number() OVER (PARTITION BY o.o_custkey ORDER BY o.o_totalprice DESC, o.o_orderkey ASC)::INT AS child_rank,
      |              o.o_orderkey, round(o.o_totalprice, 4) AS o_totalprice
      |       FROM orders o JOIN par p ON o.o_custkey = p.o_custkey WHERE o.o_orderstatus = 'O')
      |SELECT c_custkey, n_children, child_rank, o_orderkey, o_totalprice
      |FROM ch WHERE child_rank <= 2 ORDER BY c_custkey, child_rank""".stripMargin

  /** _validate/query oracle: analyzed arity from the pinned tokenizer
    * (generated in lockstep with the probes) and known-term counts from the
    * corpus dictionary — which the index terms table must equal.
    */
  private def validateQuerySql: String = {
    val probes = graft.query.IndexSearch.ValidateProbes
    val qVals = probes.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => s"('$qid','$t')")
    }.mkString(", ")
    val arity = probes.map { case (qid, text) =>
      val n = graft.textprep.TextPrep.tokenize(text).distinct.length
      s"('$qid',$n,${n > 0})"
    }.mkString(", ")
    s"""WITH $TOK,
       |dict AS (SELECT DISTINCT term FROM tok),
       |q(query_id, term) AS (VALUES $qVals),
       |arity(query_id, n_terms, valid) AS (VALUES $arity),
       |kn AS (SELECT q.query_id, count(*)::BIGINT AS n_known FROM q JOIN dict USING (term) GROUP BY 1)
       |SELECT a.query_id, a.valid, a.n_terms::BIGINT AS n_terms, coalesce(kn.n_known, 0)::BIGINT AS n_known
       |FROM arity a LEFT JOIN kn USING (query_id) ORDER BY 1""".stripMargin
  }

  /** span_multi oracle: the span_near pair oracle with the first leg's
    * equality widened to a prefix LIKE — generated from the probes.
    */
  private def spanMultiSql: String = {
    val slop = 3
    val probes = graft.query.SearchOps.SpanMultiProbes
    val ctes = probes.map { case (pid, prefix, b) =>
      s"""p_$pid AS (SELECT '$pid' AS probe_id, pa.doc_id, count(*)::BIGINT AS n_matches
         |  FROM (SELECT doc_id, i FROM arridx WHERE toks[i] LIKE '$prefix%') pa
         |  JOIN (SELECT doc_id, i AS j FROM arridx WHERE toks[i] = '$b') pb
         |  ON pa.doc_id = pb.doc_id AND pb.j > pa.i AND pb.j <= pa.i + ${slop + 1}
         |  GROUP BY 1, 2)""".stripMargin
    }
    val union = probes.map { case (pid, _, _) => s"SELECT * FROM p_$pid" }
      .mkString(" UNION ALL ")
    s"""WITH arrs AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks FROM documents),
       |arridx AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks))) AS i FROM arrs WHERE len(toks) >= 1),
       |${ctes.mkString(",\n")}
       |$union ORDER BY probe_id, doc_id""".stripMargin
  }

  /** reverse_nested oracle: child buckets with distinct-parent counts. */
  private def reverseNestedSql: String =
    """SELECT o_orderpriority, count(*)::BIGINT AS n_children, count(DISTINCT o_custkey)::BIGINT AS n_parents
      |FROM orders WHERE o_orderstatus = 'O' GROUP BY 1 ORDER BY 1""".stripMargin

  /** rate agg oracle: weekly buckets (7-day spans of the derived event
    * day), exact integer numerators, per-day division in the final
    * projection only.
    */
  private def rateAggSql: String =
    s"""WITH $matchedCtes,
       |h AS (SELECT m.query_id, CAST(((m.doc_id * 786413 % 5184000) // 86400) // 7 AS BIGINT) AS week,
       |             count(*)::BIGINT AS n_docs, sum(d.n_chars)::BIGINT AS sum_chars
       |      FROM m JOIN documents d ON m.doc_id = d.doc_id GROUP BY 1, 2)
       |SELECT query_id, week, n_docs, sum_chars,
       |       round(n_docs::DOUBLE / 7.0 + 1e-9, 4) + 0.0 AS rate_docs,
       |       round(sum_chars::DOUBLE / 7.0 + 1e-9, 4) + 0.0 AS rate_chars
       |FROM h ORDER BY query_id, week""".stripMargin

  /** moving_percentiles oracle: quantile_cont(0.5) over the trailing
    * 3-bucket window — the same R-7 linear interpolation the Spark side
    * computes explicitly over the sorted window.
    */
  private def movingPercentilesSql: String =
    s"""WITH $matchedCtes,
       |h AS (SELECT m.query_id, CAST((m.doc_id * 786413 % 5184000) // 86400 AS BIGINT) AS day, count(*)::BIGINT AS n_docs
       |      FROM m GROUP BY 1, 2)
       |SELECT query_id, day, n_docs,
       |       round(quantile_cont(n_docs, 0.5) OVER (PARTITION BY query_id ORDER BY day ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 4) + 0.0 AS mov_p50
       |FROM h ORDER BY query_id, day""".stripMargin

  private def randomSamplerSql: String =
    s"""WITH $matchedCtes,
       |s AS (SELECT m.query_id, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id
       |      WHERE (m.doc_id * 2654435761) % 1000 < 300)
       |SELECT query_id, count(*)::BIGINT AS n_sampled, sum(n_chars)::BIGINT AS sum_sampled,
       |       round(count(*)::DOUBLE * 1000.0 / 300 + 1e-9, 4) + 0.0 AS est_total,
       |       round(sum(n_chars)::DOUBLE / count(*) + 1e-9, 4) + 0.0 AS avg_sampled
       |FROM s GROUP BY 1 ORDER BY 1""".stripMargin

  /** variable_width_histogram oracle: equal-frequency ntile(4) clustering
    * over (n_chars, doc_id) order — both engines follow the SQL-standard
    * remainder-to-leading-groups rule, so cluster assignment is identical.
    */
  private def varWidthHistogramSql: String =
    s"""WITH $matchedCtes,
       |j AS (SELECT m.query_id, m.doc_id, d.n_chars FROM m JOIN documents d ON m.doc_id = d.doc_id),
       |t AS (SELECT query_id, n_chars, ntile(4) OVER (PARTITION BY query_id ORDER BY n_chars ASC, doc_id ASC)::INT AS cluster FROM j)
       |SELECT query_id, cluster, count(*)::BIGINT AS n_docs, min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       |       round(sum(n_chars)::DOUBLE / count(*) + 1e-9, 4) + 0.0 AS avg_chars
       |FROM t GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** frequent_item_sets oracle: size-2 itemsets over per-user event_type
    * baskets with support ≥ ⌈0.2 · #baskets⌉.
    */
  private def frequentItemSetsSql: String =
    """WITH it AS (SELECT DISTINCT user_id, event_type FROM events),
      |nb AS (SELECT CAST(ceil(count(DISTINCT user_id) * 0.2) AS BIGINT) AS minsup FROM it),
      |p AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*)::BIGINT AS support
      |      FROM it a JOIN it b ON a.user_id = b.user_id AND a.event_type < b.event_type GROUP BY 1, 2)
      |SELECT t1, t2, support FROM p WHERE support >= (SELECT minsup FROM nb) ORDER BY 1, 2""".stripMargin

  /** categorize_text oracle: leading-4-token signature with digit runs
    * collapsed to '#', groups of ≥ 2 docs.
    */
  private def categorizeTextSql: String =
    """WITH s AS (SELECT doc_id,
      |  array_to_string(list_slice(list_filter(regexp_split_to_array(regexp_replace(lower(text), '[0-9]+', '#', 'g'), '[^a-z0-9#]+'), x -> x <> ''), 1, 4), ' ') AS signature
      |  FROM documents)
      |SELECT signature, count(*)::BIGINT AS n_docs, min(doc_id) AS example_doc
      |FROM s GROUP BY 1 HAVING count(*) >= 2 ORDER BY 1""".stripMargin

  /** geo_distance rings oracle: ring membership by exact integer d²
    * against the squared band edges (no sqrt), same centers as the Spark
    * side.
    */
  private def geoDistanceAggSql: String = {
    val centers = graft.ops.Geo.Centers
      .map { case (id, la, lo, r) => s"('$id',$la,$lo,$r,${r / 2})" }.mkString(", ")
    s"""WITH pts AS (SELECT ${graft.ops.Geo.CentiLatSql} AS clat, ${graft.ops.Geo.CentiLonSql} AS clon FROM events),
       |c(center_id, c_lat, c_lon, radius, half) AS (VALUES $centers),
       |d AS (SELECT c.center_id, (clat - c_lat) * (clat - c_lat) + (clon - c_lon) * (clon - c_lon) AS d2, c.half, c.radius
       |      FROM pts CROSS JOIN c),
       |r AS (SELECT center_id, CASE WHEN d2 < half * half THEN 0 WHEN d2 < radius * radius THEN 1 WHEN d2 < (radius * 2) * (radius * 2) THEN 2 END AS ring FROM d)
       |SELECT center_id, ring::INT AS ring, count(*)::BIGINT AS n_events
       |FROM r WHERE ring IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** kNN similarity-threshold oracle: the q_ann_cosine ranking with hits
    * below the RAW-cosine cutoff dropped after ranking (ES truncation
    * semantics; the compare runs on the unrounded double on both sides).
    */
  private def annThresholdSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3),
      |ev AS (SELECT vec_id, embedding, unnest(generate_series(1, len(embedding))) AS i FROM embeddings),
      |pairs AS (
      |  SELECT q.query_id, ev.vec_id,
      |    sum((ev.embedding[ev.i]::DOUBLE) * (q.qv[ev.i]::DOUBLE) ORDER BY ev.i) AS dp,
      |    sum((ev.embedding[ev.i]::DOUBLE) * (ev.embedding[ev.i]::DOUBLE) ORDER BY ev.i) AS na,
      |    sum((q.qv[ev.i]::DOUBLE) * (q.qv[ev.i]::DOUBLE) ORDER BY ev.i) AS nq
      |  FROM ev CROSS JOIN q
      |  WHERE ev.vec_id <> q.query_id
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT query_id, vec_id, dp / (sqrt(na) * sqrt(nq)) AS raw,
      |         round(dp / (sqrt(na) * sqrt(nq)), 4) + 0.0 AS cosine,
      |         row_number() OVER (PARTITION BY query_id ORDER BY dp / (sqrt(na) * sqrt(nq)) DESC, vec_id ASC)::INT AS rank
      |  FROM pairs)
      |SELECT query_id, rank, vec_id, cosine FROM ranked WHERE rank <= 10 AND raw >= 0.15 ORDER BY query_id, rank""".stripMargin

  /** _field_caps oracle: one capability row per documents column under the
    * engine's mapping, with live non-null/distinct counts.
    */
  private def fieldCapsSql: String =
    """WITH c AS (
      |  SELECT 'doc_id' AS field, 'long' AS es_type, true AS searchable, true AS aggregatable, count(doc_id)::BIGINT AS n_values, count(DISTINCT doc_id)::BIGINT AS n_distinct FROM documents
      |  UNION ALL SELECT 'text', 'text', true, false, count(text)::BIGINT, count(DISTINCT text)::BIGINT FROM documents
      |  UNION ALL SELECT 'lang', 'keyword', true, true, count(lang)::BIGINT, count(DISTINCT lang)::BIGINT FROM documents
      |  UNION ALL SELECT 'source', 'keyword', true, true, count(source)::BIGINT, count(DISTINCT source)::BIGINT FROM documents
      |  UNION ALL SELECT 'n_chars', 'long', true, true, count(n_chars)::BIGINT, count(DISTINCT n_chars)::BIGINT FROM documents)
      |SELECT * FROM c ORDER BY field""".stripMargin

  /** _msearch oracle: the shared exact-BM25 ranking with a per-request
    * size joined in — request term tables generated from the same
    * tokenizer as the Spark side.
    */
  private def msearchSql: String = {
    val reqs = graft.query.SearchOps.MsearchRequests
    val vals = reqs.flatMap { case (rid, text, _) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => s"('$rid','$t')")
    }.mkString(", ")
    val ks = reqs.map { case (rid, _, k) => s"('$rid',$k)" }.mkString(", ")
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES $vals),
       |ks(query_id, k) AS (VALUES $ks),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT r.query_id AS request_id, r.rank, r.doc_id, r.score FROM ranked r JOIN ks ON r.query_id = ks.query_id
       |WHERE r.rank <= ks.k ORDER BY request_id, rank""".stripMargin
  }

  /** _search/template oracle: the RENDERED query terms are hand-pinned
    * literals (st1 → "spark query scan", st2 → "hash join merge") so the
    * oracle independently asserts what the mustache renderer must produce.
    */
  private def searchTemplateSql: String =
    s"""WITH $TOK, $TF, $DL, $STATS,
       |q(query_id, term) AS (VALUES ('st1','spark'),('st1','query'),('st1','scan'),('st2','hash'),('st2','join'),('st2','merge')),
       |ks(query_id, k) AS (VALUES ('st1',5),('st2',4)),
       |dft AS (SELECT term, count(*)::BIGINT AS df FROM tf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, tf.doc_id,
       |    sum( ln(1 + (stats.n - dft.df + 0.5) / (dft.df + 0.5))
       |       * (tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.doclen / (stats.tot::DOUBLE / stats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN tf ON q.term = tf.term
       |  JOIN dft ON q.term = dft.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT r.query_id AS template_id, r.rank, r.doc_id, r.score FROM ranked r JOIN ks ON r.query_id = ks.query_id
       |WHERE r.rank <= ks.k ORDER BY template_id, rank""".stripMargin

  /** combined_fields oracle: the text and source token streams union into
    * ONE pseudo-field, then the standard exact-BM25 chain runs over the
    * combined tf/doclen/df/avgdl — term-centric BM25F with equal weights.
    */
  private def combinedFieldsSql: String = {
    val vals = graft.query.SearchOps.MultiQueries.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => s"('$qid','$t')")
    }.mkString(", ")
    s"""WITH $TOK,
       |ctok AS (SELECT doc_id, term FROM tok
       |         UNION ALL SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(source), '[^a-z0-9]+')) AS t FROM documents) WHERE t <> ''),
       |ctf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM ctok GROUP BY 1, 2),
       |cdl AS (SELECT doc_id, count(*)::BIGINT AS doclen FROM ctok GROUP BY 1),
       |cstats AS (SELECT count(*)::BIGINT AS n, sum(doclen)::BIGINT AS tot FROM cdl),
       |q(query_id, term) AS (VALUES $vals),
       |cdft AS (SELECT term, count(*)::BIGINT AS df FROM ctf WHERE term IN (SELECT term FROM q) GROUP BY 1),
       |scored AS (
       |  SELECT q.query_id, ctf.doc_id,
       |    sum( ln(1 + (cstats.n - cdft.df + 0.5) / (cdft.df + 0.5))
       |       * (ctf.tf * 2.2 / (ctf.tf + 1.2 * (0.25 + 0.75 * cdl.doclen / (cstats.tot::DOUBLE / cstats.n::DOUBLE))))
       |       ORDER BY q.term ) AS score
       |  FROM q JOIN ctf ON q.term = ctf.term
       |  JOIN cdft ON q.term = cdft.term
       |  JOIN cdl ON ctf.doc_id = cdl.doc_id
       |  CROSS JOIN cstats
       |  GROUP BY 1, 2),
       |ranked AS (SELECT query_id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)::INT AS rank, doc_id, round(score, 4) AS score FROM scored)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }
}
