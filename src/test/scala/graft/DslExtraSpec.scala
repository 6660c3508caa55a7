package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.ops.TextOps
import graft.query.{IndexSearch, QueryEngine, SearchOps}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** dis_max / range filter (inclusion gate) / percentiles / top_hits /
  * match_phrase_prefix: each index-served path must equal its relational
  * twin row-for-row (the q_filtered_index ≡ q_filtered_topk pattern), and
  * the inclusion gate must stay bucket-local and exact.
  */
class DslExtraSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()
  private lazy val idx = IndexCache.forDocuments(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("dis_max: index twin == relational; score between best-term and full sum") {
    val rel = rows(SearchOps.disMaxTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.disMaxTopK(spark, idx, RefQueries.set).orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
  }

  test("dis_max with tie_breaker 0 ranks by the single best term; 1 is the plain sum") {
    import spark.implicits._
    // tb=1: dscore == mx + (sum - mx) == sum exactly -> identical to BM25 ranking
    val tb1 = rows(IndexSearch.disMaxTopK(spark, idx, RefQueries.set, tieBreaker = 1.0)
      .orderBy("query_id", "rank"))
    val bm = QueryEngine.topK(spark, idx, RefQueries.set, 10).toDF()
      .select(col("queryId").as("query_id"), col("rank"), col("docId").as("doc_id"),
        round(col("score"), 4).as("score")).orderBy("query_id", "rank")
    assert(tb1 == rows(bm))
    // tb=0: every score equals SOME single-term addend <= the tb=1 score
    val tb0 = IndexSearch.disMaxTopK(spark, idx, RefQueries.set, tieBreaker = 0.0)
      .select("query_id", "doc_id", "score").as[(String, Long, Double)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap
    val full = IndexSearch.scoredMatches(spark, idx, RefQueries.set)
      .select("query_id", "doc_id", "score", "max_addend")
      .as[(String, Long, Double, Double)].collect()
      .map { case (q, d, s, mx) => (q, d) -> (s, mx) }.toMap
    tb0.foreach { case ((q, d), sc) =>
      val (s, mx) = full((q, d))
      assert(math.abs(sc - math.floor(mx * 10000 + 0.5) / 10000) < 1e-9 && mx <= s + 1e-12)
    }
  }

  test("range filter: index twin (inclusion gate) == relational; every hit in range") {
    val rel = rows(SearchOps.rangeTopK(docs, RefQueries.set, "n_chars", 150L, 400L)
      .orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.rangeTopK(spark, idx, RefQueries.set, docs, "n_chars", 150L, 400L)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    val inRange = docs.filter(col("n_chars").between(150, 400))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    srv.foreach(r => assert(inRange(r(2).asInstanceOf[Long])))
  }

  test("inclusion gate: allowed == all docs leaves topKWithin == topK; empty allows nothing") {
    import spark.implicits._
    val pages = Corpus.syntheticDS(spark, 600, seed = 17L, parts = 4)
    val dir = Files.createTempDirectory("incl-idx").toString
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 4))
    val queries = Seq("i1" -> "the data", "i2" -> "spark")
    val all = spark.read.parquet(s"$dir/docs").select(col("docId"))
    val a = QueryEngine.topKWithin(spark, dir, queries, 10, all)
      .collect().toSeq.sortBy(r => (r.queryId, r.rank))
    val b = QueryEngine.topK(spark, dir, queries, 10)
      .collect().toSeq.sortBy(r => (r.queryId, r.rank))
    assert(a.nonEmpty && a === b)
    val none = Seq.empty[Long].toDF("docId")
    assert(QueryEngine.topKWithin(spark, dir, queries, 10, none).isEmpty)
  }

  test("percentiles: index twin == relational; monotone p25<=p50<=p75<=p95 within corpus bounds") {
    val rel = rows(SearchOps.percentilesAgg(docs, RefQueries.set).orderBy("query_id"))
    val srv = rows(IndexSearch.percentilesAgg(spark, idx, RefQueries.set, docs, "n_chars")
      .orderBy("query_id"))
    assert(rel.nonEmpty && rel == srv)
    rel.foreach { r =>
      val ps = r.drop(1).map(_.asInstanceOf[Double])
      assert(ps == ps.sorted && ps.head >= 48.0 && ps.last <= 553.0)
    }
  }

  test("top_hits: index twin == relational; <=2 hits per (query, lang), scores descend") {
    val rel = rows(SearchOps.topHitsAgg(docs, RefQueries.set).orderBy("query_id", "lang", "rank"))
    val srv = rows(IndexSearch.topHits(spark, idx, RefQueries.set, docs, "lang")
      .orderBy("query_id", "lang", "rank"))
    assert(rel.nonEmpty && rel == srv)
    rel.groupBy(r => (r.head, r(1))).foreach { case (_, g) =>
      assert(g.size <= 2)
      val sc = g.sortBy(_(2).asInstanceOf[Int]).map(_(4).asInstanceOf[Double])
      assert(sc == sc.sortBy(-_))
    }
  }

  test("function_score: index twin == relational; reranks vs plain BM25") {
    val rel = rows(SearchOps.functionScoreTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.functionScoreTopK(spark, idx, RefQueries.set, docs)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
  }

  test("bool full: index twin == relational; must_not enforced, absent must term empties") {
    import spark.implicits._
    val rel = rows(SearchOps.boolFullTopK(docs).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.boolFullTopK(spark, idx).orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    // b5's must contains a term absent from the corpus -> no hits
    assert(!rel.exists(_.head == "b5"))
    // b1 bans "slow": no returned doc may contain it
    val slowDocs = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .filter(col("t").rlike("(^|[^a-z0-9])slow([^a-z0-9]|$)"))
      .select("doc_id").as[Long].collect().toSet
    rel.filter(_.head == "b1").foreach(r => assert(!slowDocs(r(2).asInstanceOf[Long])))
  }

  test("significant_terms: index twin == relational; lift positive, fg_df bounded by bg_df") {
    val rel = rows(SearchOps.significantTerms(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.significantTerms(spark, idx, RefQueries.set)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    rel.foreach { r =>
      assert(r(3).asInstanceOf[Long] <= r(4).asInstanceOf[Long]) // fg_df <= bg_df
      assert(r(5).asInstanceOf[Double] > 0.0)
    }
  }

  test("collapse: index twin == relational; one representative per field value") {
    val rel = rows(SearchOps.collapseTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.collapseTopK(spark, idx, RefQueries.set, docs, "source")
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    rel.groupBy(_.head).foreach { case (_, g) =>
      val vals = g.map(_(3))
      assert(vals.distinct.size == vals.size)
    }
  }

  test("nested agg: index twin == relational; per-bucket stats consistent") {
    val rel = rows(SearchOps.nestedAgg(docs, RefQueries.set).orderBy("query_id", "lang"))
    val srv = rows(IndexSearch.nestedAgg(spark, idx, RefQueries.set, docs, "lang", "n_chars")
      .orderBy("query_id", "lang"))
    assert(rel.nonEmpty && rel == srv)
    rel.foreach { r =>
      val (mn, mx, avg) = (r(3).asInstanceOf[Long], r(4).asInstanceOf[Long],
        r(5).asInstanceOf[Double])
      assert(mn <= mx && mn <= avg && avg <= mx)
    }
  }

  test("terms filter: index twin (inclusion gate) == relational; hits only in the value list") {
    import spark.implicits._
    val rel = rows(SearchOps.termsFilterTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.termsFilterTopK(spark, idx, RefQueries.set, docs,
      "lang", SearchOps.TermsFilterLangs).orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    val allowedDocs = docs.filter(col("lang").isin(SearchOps.TermsFilterLangs: _*))
      .select("doc_id").as[Long].collect().toSet
    srv.foreach(r => assert(allowedDocs(r(2).asInstanceOf[Long])))
  }

  test("match_phrase_prefix: positional-index twin == narrow relational twin") {
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val rel = rows(SearchOps.phrasePrefixCounts(docs).orderBy("phrase_id", "doc_id"))
    val srv = rows(graft.index.Positions.phrasePrefixMatch(spark, pos, SearchOps.PhrasePrefixes)
      .orderBy("phrase_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    // the no-expansion probe (prefix matching no dictionary term) is absent
    assert(!rel.exists(_.head == "x4"))
    // multi-expansion probe x2 ("the s") must match strictly more docs than
    // any single-term continuation could alone — the union is real
    assert(rel.count(_.head == "x2") > rel.count(_.head == "x1"))
  }

  test("rescore: index twin (WAND + positions) == relational twin") {
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val rel = rows(SearchOps.rescoreTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.rescoreTopK(spark, idx, pos, RefQueries.set)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
  }

  test("rescore window semantics: outside-window docs never enter; bonus is real") {
    import spark.implicits._
    // window == k: rescoring can only REORDER the plain BM25 top-k set
    val k = RefQueries.K
    val resc = SearchOps.rescoreTopK(docs, RefQueries.set, window = k, k = k)
    val base = graft.query.Bm25Sql.topKDocs(docs, RefQueries.set, k)
    val rSet = resc.select("query_id", "doc_id").as[(String, Long)].collect().toSet
    val bSet = base.select("query_id", "doc_id").as[(String, Long)].collect().toSet
    assert(rSet == bSet && rSet.nonEmpty)
    // the phrase secondary actually fires: some doc's rescored score exceeds
    // its BM25 score ("spark query" / "the" occur as exact phrases)
    val rs = resc.select("query_id", "doc_id", "score").as[(String, Long, Double)]
      .collect().map { case (q, d, s) => (q, d) -> s }.toMap
    val bs = base.select("query_id", "doc_id", "score").as[(String, Long, Double)]
      .collect().map { case (q, d, s) => (q, d) -> s }.toMap
    assert(rs.exists { case (kk, s) => s > bs(kk) + 1e-9 })
  }

  test("term suggester: dictionary twin == relational; ES ranking semantics") {
    val rel = rows(SearchOps.termSuggest(docs).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.termSuggest(spark, idx, SearchOps.Fuzzies)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    // closer-first: f1 "spak" suggests "spark" (dist 1) over any dist-2 term
    val f1 = rel.filter(_.head == "f1")
    assert(f1.head(3) == "spark" && f1.head(4) == 1L)
    // a shortlist, never an expansion dump: <= 3 per probe, dist in (0, 2]
    rel.groupBy(_.head).foreach { case (_, rs) => assert(rs.size <= 3) }
    assert(rel.forall(r => r(4).asInstanceOf[Long] >= 1L && r(4).asInstanceOf[Long] <= 2L))
    // an in-dictionary probe never suggests itself (dist 0 excluded)
    assert(!rel.filter(_.head == "f5").exists(_(3) == "merge"))
  }

  test("span_near: positional twin == relational; slop=0 degenerates to the exact phrase") {
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val rel = rows(SearchOps.spanNearCounts(docs).orderBy("pair_id", "doc_id"))
    val srv = rows(graft.index.Positions.spanNearMatch(spark, pos, SearchOps.SpanPairs)
      .orderBy("pair_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    // s5 never co-occurs
    assert(!rel.exists(_.head == "s5"))
    // slop=0 == adjacent pairs == the 2-term exact phrase count, on both paths
    val pair = Seq(("z", "table", "hash"))
    val adj = rows(SearchOps.spanNearCounts(docs, pair, slop = 0).orderBy("doc_id"))
      .map(r => (r(1), r(2)))
    val phr = rows(SearchOps.phraseCounts(docs, Seq("z" -> "table hash")).orderBy("doc_id"))
      .map(r => (r(1), r(2)))
    assert(adj.nonEmpty && adj == phr)
    val adjIdx = rows(graft.index.Positions.spanNearMatch(spark, pos, pair, slop = 0)
      .orderBy("doc_id")).map(r => (r(1), r(2)))
    assert(adjIdx == phr)
    // widening the window only adds matches
    val wide = rows(SearchOps.spanNearCounts(docs, pair, slop = 3).orderBy("doc_id"))
      .map(r => (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])).toMap
    adj.foreach { case (d, n) =>
      assert(wide(d.asInstanceOf[Long]) >= n.asInstanceOf[Long])
    }
  }

  test("span_or: sidecar twin == relational; single-term clause ≡ tf; absent clause empty") {
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val rel = rows(SearchOps.spanOrCounts(docs).orderBy("clause_id", "doc_id"))
    val srv = rows(graft.index.Positions.spanOrMatch(spark, pos, SearchOps.SpanOrClauses)
      .orderBy("clause_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    assert(!rel.exists(_.head == "o3")) // both terms absent from the corpus
    // o4 = single term 'the' → per-doc count equals the term's tf
    val tf = TextOps.termFreqs(docs).filter(org.apache.spark.sql.functions.col("term") === "the")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    rel.filter(_.head == "o4").foreach { r =>
      assert(r(2).asInstanceOf[Long] == tf(r(1).asInstanceOf[Long]))
    }
    // each clause count ≥ any member term's tf-driven floor: union ⊇ single term
    val o2 = rel.filter(_.head == "o2").map(r => r(1) -> r(2).asInstanceOf[Long]).toMap
    val spark_tf = TextOps.termFreqs(docs)
      .filter(org.apache.spark.sql.functions.col("term") === "spark")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    spark_tf.foreach { case (d, n) => assert(o2(d) >= n) }
  }

  test("span_not: sidecar twin == relational; absent exclude ≡ tf; window monotone") {
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val rel = rows(SearchOps.spanNotCounts(docs).orderBy("probe_id", "doc_id"))
    val srv = rows(graft.index.Positions.spanNotMatch(spark, pos, SearchOps.SpanNotProbes)
      .orderBy("probe_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    // n3's exclude never occurs → counts equal the include term's tf
    val tf = TextOps.termFreqs(docs).filter(org.apache.spark.sql.functions.col("term") === "spark")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val n3 = rel.filter(_.head == "n3").map(r => r(1).asInstanceOf[Long] -> r(2).asInstanceOf[Long]).toMap
    assert(n3 == tf)
    // widening the exclusion window can only reduce surviving matches
    val narrow = rows(SearchOps.spanNotCounts(docs, Seq(("w", "hash", "join", 0, 0))))
      .map(r => r(1).asInstanceOf[Long] -> r(2).asInstanceOf[Long]).toMap
    val wide = rows(SearchOps.spanNotCounts(docs, Seq(("w", "hash", "join", 2, 2))))
      .map(r => r(1).asInstanceOf[Long] -> r(2).asInstanceOf[Long]).toMap
    wide.foreach { case (d, n) => assert(narrow.getOrElse(d, 0L) >= n) }
    narrow.foreach { case (d, n) => assert(n >= wide.getOrElse(d, 0L)) }
  }

  test("completion suggester: pruned dictionary twin == relational; weight ranking") {
    val rel = rows(SearchOps.completionSuggest(docs).orderBy("prefix_id", "rank"))
    val srv = rows(IndexSearch.completionSuggest(spark, idx, SearchOps.Prefixes)
      .orderBy("prefix_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    // 's' has >3 completions -> exactly 3, df non-increasing
    val pr1 = rel.filter(_.head == "pr1")
    assert(pr1.size == 3)
    val dfs = pr1.map(_(4).asInstanceOf[Long])
    assert(dfs == dfs.sorted.reverse)
    // no-completion prefix is absent, not an empty-row artifact
    assert(!rel.exists(_.head == "pr4"))
  }

  test("phrase suggester: sidecar twin == relational; LM picks the plausible correction") {
    val big = IndexCache.bigramsForDocuments(spark, sf)
    val rel = rows(SearchOps.phraseSuggest(docs).orderBy("probe_id", "rank"))
    val srv = rows(IndexSearch.phraseSuggest(spark, idx, big, SearchOps.PhraseProbes)
      .orderBy("probe_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    def top(pid: String): Option[String] =
      rel.find(r => r.head == pid && r(1) == 1).map(_(2).asInstanceOf[String])
    // single-candidate corrections land exactly
    assert(top("ps1").contains("slow hash batch"))
    assert(top("ps2").contains("spark query"))
    assert(top("ps3").contains("the table"))
    // an already-correct phrase suggests itself first
    assert(top("ps4").contains("hash join"))
    // unfixable probe yields nothing
    assert(!rel.exists(_.head == "ps5"))
    // ambiguous slot: the bigram LM must rank "slow batch" over "row batch"
    assert(top("ps6").contains("slow batch"))
    assert(rel.exists(r => r.head == "ps6" && r(2) == "row batch"))
  }
}
