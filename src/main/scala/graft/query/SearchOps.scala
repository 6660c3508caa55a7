package graft.query

import graft.ops.TextOps
import graft.textprep.TextPrep
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Search-time aggregations over the corpus — the ES query-DSL features a
  * reference user drives daily (terms aggregation on a query; match_phrase),
  * re-expressed as declarative Catalyst plans.
  */
object SearchOps {

  /** Facet (terms-aggregation) counts per query: for each query, the number
    * of matching docs (any query term present) per value of `facet`.
    *
    * Scale shape: the (doc, term) distinct is keyed by uniform token pairs;
    * the query table is tiny → broadcast; result cardinality is
    * queries × facet values. No all-pairs, no driver loop.
    */
  def facetCounts(docs: DataFrame, queries: Seq[(String, String)], facet: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val matched = TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(q), Seq("term"))
      .select("query_id", "doc_id").distinct()
    matched.join(docs.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .groupBy(col("query_id"), col(facet))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Highlight snippets (the ES `highlight` analog, deterministic form):
    * for each query's BM25 top-`k` docs, the window of `before+after+1`
    * tokens around the doc's FIRST occurrence (lowest 1-based token
    * position) of any query term. Entirely narrow after the top-k: token
    * positions come from per-row array ops (`array_position`), no extra
    * shuffle beyond the ranking itself.
    */
  def snippets(docs: DataFrame, queries: Seq[(String, String)], k: Int = 3,
      before: Int = 3, after: Int = 4): DataFrame =
    snippetFrom(Bm25Sql.topKDocs(docs, queries, k).select("query_id", "rank", "doc_id"),
      docs, queries, before, after)

  /** The highlight half of `snippets`, parameterized over WHERE the ranked
    * hits came from (relational scorer or index WAND — the fetch phase is
    * identical): join each hit's stored text, window around the first
    * query-term occurrence. `top` is k·queries rows — broadcast side of the
    * fetch join; the docs side is one narrow pass.
    */
  def snippetFrom(top: DataFrame, docs: DataFrame, queries: Seq[(String, String)],
      before: Int = 3, after: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qdf = queries
      .map { case (qid, text) => (qid, TextPrep.tokenize(text).distinct.sorted.toSeq) }
      .toDF("query_id", "qterms")
    broadcast(top)
      .join(docs.select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks")), Seq("doc_id"))
      .join(broadcast(qdf), Seq("query_id"))
      .withColumn("p", array_min(filter(
        transform(col("qterms"), t => array_position(col("toks"), t)), p => p > 0)))
      .withColumn("start", greatest(lit(1L), col("p") - before))
      .select(col("query_id"), col("rank"), col("doc_id"),
        concat_ws(" ", slice(col("toks"), col("start").cast("int"), lit(before + after + 1)))
          .as("snippet"))
  }

  /** minimum_should_match: BM25 OR semantics restricted to docs matching at
    * least `m` distinct query terms (capped at the query's own arity, so a
    * single-term query still matches — ES's effective behavior when the
    * clause count is below the minimum). Same plan as top-k plus one
    * broadcast arity join; no extra shuffle.
    */
  def shouldMatchTopK(docs: DataFrame, queries: Seq[(String, String)],
      m: Int = 2, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .filter(col("matched") >= least(lit(m.toLong), col("nq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** Filter-context search (ES `bool.filter`): BM25 ranking restricted to
    * docs satisfying `predicate`, with idf/avgdl still computed over the
    * FULL corpus (filters narrow candidates; they never reweight scores —
    * ES semantics). The filter side is a semi-join on doc_id: at scale the
    * predicate is pushed to the docs scan and the join key is uniform.
    */
  def filteredTopK(docs: DataFrame, queries: Seq[(String, String)],
      predicate: Column, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .join(docs.filter(predicate).select("doc_id"), Seq("doc_id"), "left_semi")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** search_after pagination: page 2 of the ranking, fetched the ES way —
    * the cursor is page 1's last (score, doc_id) and page 2 is the top-k of
    * everything STRICTLY after it in (score DESC, doc_id ASC) order, so no
    * global rank materialization is needed at serving time. Queries with
    * fewer than `k` results have no cursor and produce no second page.
    */
  def searchAfterPage(docs: DataFrame, queries: Seq[(String, String)],
      k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    // cache is scoped: the page (≤ k·queries rows) is materialized while the
    // cache is live, then the cache is released — repeated driver calls must
    // not accumulate executor storage
    val scored = Bm25Sql.scoredDocs(docs, queries).cache()
    try {
      val cursor = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") === k)
        .select(col("query_id"), col("score").as("c_score"), col("doc_id").as("c_doc"))
      val page = scored.join(broadcast(cursor), Seq("query_id"))
        .filter(col("score") < col("c_score") ||
          (col("score") === col("c_score") && col("doc_id") > col("c_doc")))
        .withColumn("page_rank", row_number().over(w))
        .filter(col("page_rank") <= k)
        .select(col("query_id"), col("page_rank"), col("doc_id"), round(col("score"), 4).as("score"))
      val spark = docs.sparkSession
      spark.createDataFrame(java.util.Arrays.asList(page.collect(): _*), page.schema)
    } finally scored.unpersist()
  }

  /** bool.must_not: BM25 ranking excluding every doc that contains the
    * banned term — the negation clause of the bool query. The exclusion is
    * an anti-join against the banned term's (doc_id) set: one semi-scan of
    * the token stream, uniform keys, no full-corpus materialization.
    */
  def mustNotTopK(docs: DataFrame, queries: Seq[(String, String)],
      banned: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    val bannedDocs = TextOps.tokens(docs).filter(col("term") === banned)
      .select("doc_id").distinct()
    Bm25Sql.scoredDocs(docs, queries)
      .join(bannedDocs, Seq("doc_id"), "left_anti")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** Sort-by-field retrieval (ES `sort` without scoring): docs matching ANY
    * query term, ordered by `field` DESC with doc_id as tiebreak, top `k`
    * per query. The match set is a distinct semi-join on term; ranking is a
    * per-query window — k·queries rows out.
    */
  def sortByField(docs: DataFrame, queries: Seq[(String, String)],
      field: String, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val matched = TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(q), Seq("term"))
      .select("query_id", "doc_id").distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col(field).desc, col("doc_id").asc)
    matched.join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col(field))
  }

  /** more_like_this: each seed document's top-`nTerms` tf·idf terms become
    * the query, BM25-ranked over the corpus with the seed itself excluded.
    * The derived query table is tiny (seeds × nTerms) and broadcast; the
    * scoring reuses the exact shared BM25 plan, so the whole operator is
    * oracle-reproducible end to end (seed-term selection included, since
    * topTerms breaks ties totally).
    */
  def moreLikeThis(docs: DataFrame, seedFilter: Column, nTerms: Int = 3,
      k: Int = 10): DataFrame = {
    val q = TextOps.topTerms(docs, nTerms)
      .join(docs.filter(seedFilter).select(col("doc_id")), Seq("doc_id"))
      .select(col("doc_id").as("seed_id"), col("term"))
    val w = Window.partitionBy(col("seed_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredFromTermTable(docs, broadcast(q), "seed_id")
      .filter(col("doc_id") =!= col("seed_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("seed_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** Query-time per-term boost weights (ES `match` `boost` /
    * per-clause boosting): deterministic fixture shared with the oracle —
    * down-weights the head term, up-weights discriminative ones; terms
    * absent here default to 1.0.
    */
  val Boosts: Seq[(String, Double)] = Seq(
    "the" -> 0.2, "spark" -> 3.0, "query" -> 2.0, "join" -> 1.5, "scan" -> 1.5)

  /** Boosted BM25 top-k (ES query-time boosting): each term's contribution
    * is scaled by its boost before the ordered summation —
    * `(idf*partial)*boost`, association pinned to the oracle. Same plan
    * shape as the unboosted ranking (the boost rides the broadcast query
    * table; no extra shuffle).
    */
  def boostedTopK(docs: DataFrame, queries: Seq[(String, String)],
      boosts: Seq[(String, Double)] = Boosts, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bm = boosts.toMap
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t, bm.getOrElse(t, 1.0)))
    }.toDF("query_id", "term", "boost")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredFromTermTable(docs, q, "query_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** constant_score (ES): every doc matching ANY query term scores exactly
    * `boost` — scoring is skipped entirely (the ES optimization this query
    * exists for). The match set is the same distinct semi-join as
    * facet/sort retrieval; ranking degenerates to the doc_id tie-break, so
    * the top-k is the k lowest matching doc_ids per query.
    */
  def constantScoreTopK(docs: DataFrame, queries: Seq[(String, String)],
      boost: Double = 1.0, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val matched = TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(q), Seq("term"))
      .select("query_id", "doc_id").distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("doc_id").asc)
    matched.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), lit(boost).as("score"))
  }

  /** Distinct (query_id, doc_id) match set — docs containing ANY query
    * term. The same retrieval half facet/sort/constant_score inline; the ES
    * aggregation operators below all ride it. Uniform token keys, broadcast
    * query table, no all-pairs.
    */
  private[query] def matchedSet(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(q), Seq("term"))
      .select("query_id", "doc_id").distinct()
  }

  /** Histogram aggregation (ES `histogram`): matched docs bucketed by
    * fixed-width intervals of a numeric doc-values field. One uniform-key
    * join + one aggregation; result cardinality = queries × buckets.
    * Interval arithmetic is exact in double for any field < 2^53.
    */
  def histogramAgg(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars", interval: Long = 200L): DataFrame =
    matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("bucket_lo",
        (floor(col(field) / lit(interval.toDouble)) * interval).cast("bigint"))
      .groupBy("query_id", "bucket_lo")
      .agg(count(lit(1)).as("n_docs"))

  /** Stats aggregation (ES `stats`): count/min/max/sum/avg of a numeric
    * field over each query's match set. Integer min/max/sum are exact; avg
    * is the one double (sum/count of exact longs — order-independent).
    */
  def statsAgg(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame =
    matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_chars"), max(col(field)).as("max_chars"),
        sum(col(field)).as("sum_chars"),
        (round(avg(col(field).cast("double")) + lit(1.0e-9), 4) + lit(0.0)).as("avg_chars"))

  /** Cardinality aggregation (ES `cardinality`): distinct values of a
    * doc-values field per query match set — exact here (the oracle-checkable
    * form); at 100 TB swap the final `count_distinct` for
    * `approx_count_distinct` (HLL++), the same estimator ES uses, with no
    * other plan change.
    */
  def cardinalityAgg(docs: DataFrame, queries: Seq[(String, String)],
      facet: String = "source"): DataFrame =
    matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count_distinct(col(facet)).as("n_distinct"))

  /** Deterministic pseudo crawl-day for the harness `documents` table
    * (which carries no timestamp column): doc_id spread over a 60-day
    * window starting 2025-01-01 — crosses a month boundary so the calendar
    * arithmetic is exercised. Integer-only derivation (`div`), then one
    * `date_add`; a real PageDoc pipeline passes `date_trunc('day', warc_ts)`
    * instead.
    */
  def crawlDay: Column =
    date_format(
      date_add(to_date(lit("2025-01-01")),
        expr("CAST((doc_id * 786413 % 5184000) DIV 86400 AS INT)")),
      "yyyy-MM-dd")

  /** Date-histogram aggregation (ES `date_histogram`, calendar interval
    * `day`): matched docs per calendar day. The day key is derived
    * per-row (narrow); the only shuffle is the final aggregation.
    */
  def dateHistogram(docs: DataFrame, queries: Seq[(String, String)],
      day: Column = crawlDay): DataFrame =
    matchedSet(docs, queries)
      .withColumn("day", day)
      .groupBy("query_id", "day")
      .agg(count(lit(1)).as("n_docs"))

  /** Fixed wildcard set (ES `wildcard`, `*` mapped to SQL `%`), pinned to
    * the harness vocabulary: `s%` → 6 terms, `%er` → 3 (customer, filter,
    * order), `%a%` → many, `%zz%` → none (empty expansion).
    */
  val Wildcards: Seq[(String, String)] = Seq(
    "w1" -> "s%", "w2" -> "%er", "w3" -> "%a%", "w4" -> "%zz%")

  /** Wildcard query (ES `wildcard`): per pattern, the dictionary terms it
    * expands to and the distinct docs containing any of them — the ES
    * multi-term rewrite. Patterns are a fixed driver-side list, so the
    * expansion predicate is a literal OR chain over the (doc, term)
    * distinct; LIKE `%`/`_` semantics are identical in Catalyst and the
    * oracle dialect.
    */
  def wildcardMatch(docs: DataFrame, patterns: Seq[(String, String)] = Wildcards): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = patterns.toDF("pattern_id", "pattern")
    val cond = patterns.map { case (pid, pat) =>
      col("pattern_id") === pid && col("term").like(pat)
    }.reduce(_ || _)
    TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(p), cond)
      .groupBy("pattern_id", "pattern")
      .agg(count_distinct(col("term")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"))
  }

  /** Fixed regexp set (ES `regexp` — patterns are implicitly anchored in
    * ES, so each carries explicit `^…$`): kept backslash-free and
    * lookahead-free so Java regex and the oracle's RE2 agree by
    * construction.
    */
  val Regexps: Seq[(String, String)] = Seq(
    "r1" -> "^s.*k$", "r2" -> "^[a-z]{3}$", "r3" -> "^(scan|merge|nope)$", "r4" -> "^q.*z$")

  /** Regexp query (ES `regexp`): same multi-term rewrite shape as
    * `wildcardMatch` with RLIKE matching.
    */
  def regexpMatch(docs: DataFrame, patterns: Seq[(String, String)] = Regexps): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = patterns.toDF("pattern_id", "pattern")
    val cond = patterns.map { case (pid, pat) =>
      col("pattern_id") === pid && col("term").rlike(pat)
    }.reduce(_ || _)
    TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(p), cond)
      .groupBy("pattern_id", "pattern")
      .agg(count_distinct(col("term")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"))
  }

  /** Fixed prefix set for the driver query (hits the harness vocabulary:
    * 's' expands to 6 terms, 'sc'/'ha' to one, 'zz' to none).
    */
  val Prefixes: Seq[(String, String)] = Seq(
    "pr1" -> "s", "pr2" -> "sc", "pr3" -> "ha", "pr4" -> "zz")

  /** Prefix query (ES `prefix`): per prefix, the number of dictionary terms
    * it expands to and the number of distinct docs containing any of them.
    * The expansion stage is a scan of the term dictionary (a `StartsWith`
    * predicate the parquet reader min/max-prunes); the doc count is one
    * distinct aggregation keyed by uniform (prefix, doc) pairs.
    */
  def prefixMatch(docs: DataFrame, prefixes: Seq[(String, String)] = Prefixes): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = prefixes.toDF("prefix_id", "prefix")
    TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(p), col("term").startsWith(col("prefix")))
      .groupBy("prefix_id", "prefix")
      .agg(count_distinct(col("term")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"))
  }

  /** Completion suggester (ES `suggest.completion`): per prefix probe, the
    * top-`n` dictionary completions ranked by weight — df here, ES's
    * default when no explicit weight is indexed — then lexicographic.
    * Distinct from [[prefixMatch]] (the prefix QUERY, which counts matching
    * docs): the completion suggester returns the ranked term shortlist an
    * autocomplete box displays. All-integer output.
    */
  def completionSuggest(docs: DataFrame, prefixes: Seq[(String, String)] = Prefixes,
      n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = prefixes.toDF("prefix_id", "prefix")
    val dict = TextOps.tokens(docs)
      .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("prefix_id")).orderBy(col("df").desc, col("term").asc)
    dict.join(broadcast(p), col("term").startsWith(col("prefix")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("prefix_id"), col("prefix"), col("rank"), col("term"), col("df"))
  }

  /** Phrase-suggester probes: ps1–ps3 single-candidate corrections, ps4
    * already correct (suggests itself), ps5 unfixable (empty), ps6/ps7
    * ambiguous (`sow` → {slow, row}) so the bigram LM ranking is exercised
    * in both slot positions.
    */
  val PhraseProbes: Seq[(String, String)] = Seq(
    "ps1" -> "slow hach batch", "ps2" -> "spak query", "ps3" -> "the tabl",
    "ps4" -> "hash join", "ps5" -> "qzx wubba", "ps6" -> "sow batch",
    "ps7" -> "the sow")

  /** Adjacent-bigram corpus counts (w1, w2, bcnt) — the shingle statistics
    * ES's phrase suggester requires its field to be indexed with. Narrow
    * position-anchored pairs, one grouped count (the [[TextOps.collocations]]
    * shape).
    */
  def bigramCounts(docs: DataFrame): DataFrame = {
    val toks = col("toks")
    docs.select(filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("bcnt"))
  }

  /** Phrase suggester (ES `suggest.phrase`): per multi-term probe, whole
    * corrected phrases ranked by a Laplace-smoothed bigram language model
    * over the corpus. Per slot, the top-`perSlot` dictionary candidates
    * within edit distance ≤ `maxDist` (distance 0 included — a correct term
    * is its own best candidate); candidate combinations are scored
    *   ln((u₀+1)/(T+V)) + Σᵢ ln((b₍ᵢ₋₁,ᵢ₎+1)/(uᵢ₋₁+V))
    * and ranked (score desc, phrase asc), top-`n` per probe.
    *
    * Scale shape: dictionary and bigram tables are vocabulary-sized;
    * probes/slots broadcast; combinations are ≤ perSlot^arity per probe —
    * never corpus-sized. The corpus is touched only to derive the stats
    * (the index twin reads them from sidecars instead).
    */
  def phraseSuggest(docs: DataFrame, probes: Seq[(String, String)] = PhraseProbes,
      maxDist: Int = 1, perSlot: Int = 3, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dict = TextOps.tokens(docs).groupBy("term")
      .agg(count_distinct(col("doc_id")).as("df"), count(lit(1)).as("cnt"))
    val tot = dict.agg(sum("cnt").as("t"), count(lit(1)).as("v"))
    phraseSuggestFrom(dict, bigramCounts(docs), tot, probes, maxDist, perSlot, n)
  }

  /** Shared phrase-suggester core over (term, df, cnt) dictionary, bigram
    * and 1-row totals tables — the relational and index-served twins differ
    * ONLY in where those three tables come from, so scoring arithmetic is
    * shared verbatim (FP parity).
    */
  private[query] def phraseSuggestFrom(dict: DataFrame, big: DataFrame, tot: DataFrame,
      probes: Seq[(String, String)], maxDist: Int, perSlot: Int, n: Int): DataFrame = {
    val spark = dict.sparkSession
    import spark.implicits._
    val slots = probes.flatMap { case (pid, text) =>
      TextPrep.tokenize(text).zipWithIndex.map { case (t, i) => (pid, i, t) }
    }.toDF("probe_id", "slot", "qterm")
    val wSlot = Window.partitionBy(col("probe_id"), col("slot"))
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
    val cand = dict.join(broadcast(slots), levenshtein(col("qterm"), col("term")) <= maxDist)
      .withColumn("dist", levenshtein(col("qterm"), col("term")).cast("bigint"))
      .withColumn("r", row_number().over(wSlot)).filter(col("r") <= perSlot)
      .select("probe_id", "slot", "term", "cnt")

    val arities: Seq[(String, Int)] = probes.map { case (pid, text) =>
      pid -> TextPrep.tokenize(text).length
    }
    val parts = arities.groupBy(_._2).toSeq.sortBy(_._1).map { case (a, ps) =>
      val pids = ps.map(_._1)
      var combo: DataFrame = cand
        .filter(col("probe_id").isin(pids: _*) && col("slot") === 0)
        .select(col("probe_id"), col("term").as("w0"), col("cnt").as("u0"))
      for (i <- 1 until a) {
        combo = combo.join(
          cand.filter(col("probe_id").isin(pids: _*) && col("slot") === i)
            .select(col("probe_id"), col("term").as(s"w$i"), col("cnt").as(s"u$i")),
          Seq("probe_id"))
      }
      var scored = combo.crossJoin(broadcast(tot))
      for (i <- 1 until a) {
        scored = scored.join(
          broadcast(big.select(col("w1").as(s"ba$i"), col("w2").as(s"bb$i"),
            col("bcnt").as(s"b$i"))),
          col(s"w${i - 1}") === col(s"ba$i") && col(s"w$i") === col(s"bb$i"), "left")
      }
      // left-fold sum of logs — identical association in the SQL oracle
      val first = log((col("u0") + lit(1.0)) / (col("t") + col("v")).cast("double"))
      val score = (1 until a).map(i =>
        log((coalesce(col(s"b$i"), lit(0L)) + lit(1.0)) /
          (col(s"u${i - 1}") + col("v")).cast("double"))).foldLeft(first)(_ + _)
      scored.select(col("probe_id"),
        concat_ws(" ", (0 until a).map(i => col(s"w$i")): _*).as("phrase"),
        score.as("score"))
    }
    val all = parts.reduce(_ unionByName _)
    val w = Window.partitionBy(col("probe_id")).orderBy(col("score").desc, col("phrase").asc)
    all.withColumn("rank", row_number().over(w)).filter(col("rank") <= n)
      .select(col("probe_id"), col("rank"), col("phrase"),
        (round(col("score") + lit(1.0e-9), 4) + lit(0.0)).as("score"))
  }

  /** Misspelled probe terms for the driver query: spak→spark, sow→{row,
    * slow}, tha→the, jon→join, merge→merge (dist 0), qzx→∅.
    */
  val Fuzzies: Seq[(String, String)] = Seq(
    "f1" -> "spak", "f2" -> "sow", "f3" -> "tha",
    "f4" -> "jon", "f5" -> "merge", "f6" -> "qzx")

  /** Fuzzy term expansion (the rewrite stage of an ES `fuzzy` query): each
    * probe term expands to every dictionary term within Levenshtein
    * distance `maxDist`, carrying the term's df. The dictionary is derived
    * (term, df) — tiny relative to the corpus — and the probe set is
    * broadcast, so the edit-distance comparison never shuffles the corpus.
    */
  def fuzzyExpand(docs: DataFrame, probes: Seq[(String, String)] = Fuzzies,
      maxDist: Int = 1): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = probes.toDF("query_id", "qterm")
    val dict = TextOps.tokens(docs)
      .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    dict.join(broadcast(f), levenshtein(col("qterm"), col("term")) <= maxDist)
      .select(col("query_id"), col("qterm"), col("term"),
        levenshtein(col("qterm"), col("term")).cast("bigint").as("dist"), col("df"))
  }

  /** Term suggester (ES did-you-mean, `suggest.term`): for each probe, the
    * top-`n` dictionary corrections within edit distance (0, maxDist],
    * ranked the way ES ranks suggestions — closer first, then more
    * frequent, then lexicographic. Distinct from [[fuzzyExpand]] (the query
    * REWRITE, which keeps every expansion): the suggester is a ranked
    * shortlist for display. All-integer output — no FP parity surface.
    *
    * Scale shape: dictionary is (term, df) — vocabulary-sized, orders of
    * magnitude below the corpus; probes broadcast; the edit-distance
    * comparison never shuffles the corpus.
    */
  def termSuggest(docs: DataFrame, probes: Seq[(String, String)] = Fuzzies,
      maxDist: Int = 2, n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val f = probes.toDF("query_id", "qterm")
    val dict = TextOps.tokens(docs)
      .groupBy("term").agg(count_distinct(col("doc_id")).as("df"))
    val d = levenshtein(col("qterm"), col("term"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
    dict.join(broadcast(f), d > 0 && d <= maxDist)
      .withColumn("dist", levenshtein(col("qterm"), col("term")).cast("bigint"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("query_id"), col("qterm"), col("rank"), col("term"),
        col("dist"), col("df"))
  }

  /** Fixed phrase set for the driver query (chosen to hit the harness
    * corpus; counts verified nonzero at sf0.01).
    */
  // ---- dis_max / range / percentiles / top_hits (relational twins of the
  // IndexSearch paths; each pair shares one DuckDB oracle) ----

  /** dis_max over the per-term BM25 contributions (ES `dis_max` with
    * `tie_breaker`): score = best single-term addend + tb × the remainder.
    * Shares `Bm25Sql.scoredDocs`'s ordered-fold sum and exact max, so the
    * expression `mx + tb*(sum - mx)` runs on the identical doubles as the
    * index twin and the SQL oracle.
    */
  def disMaxTopK(docs: DataFrame, queries: Seq[(String, String)],
      tieBreaker: Double = 0.3, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("dscore").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .withColumn("dscore",
        col("max_addend") + lit(tieBreaker) * (col("score") - col("max_addend")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("dscore"), 4).as("score"))
  }

  /** Range filter context (ES `bool.filter.range`): BM25 ranking restricted
    * to docs whose `field` lies in [lo, hi]. Corpus-wide idf/avgdl (filter
    * context never changes scoring), same as the index twin.
    */
  def rangeTopK(docs: DataFrame, queries: Seq[(String, String)],
      field: String, lo: Long, hi: Long, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .filter(col(field).between(lo, hi))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** Exact percentiles of `field` over each query's match set (ES
    * `percentiles`): linear interpolation, one row per query.
    */
  def percentilesAgg(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame =
    Bm25Sql.scoredDocs(docs, queries)
      .select("query_id", "doc_id").distinct()
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(
        round(percentile(col(field), lit(0.25)), 4).as("p25"),
        round(percentile(col(field), lit(0.5)), 4).as("p50"),
        round(percentile(col(field), lit(0.75)), 4).as("p75"),
        round(percentile(col(field), lit(0.95)), 4).as("p95"))

  /** top_hits inside a terms aggregation (ES `top_hits`): per (query, facet
    * bucket), the n best-scoring matched docs.
    */
  def topHitsAgg(docs: DataFrame, queries: Seq[(String, String)],
      facet: String = "lang", n: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("query_id"), col(facet))
      .orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .join(docs.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("query_id"), col(facet), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** function_score / field_value_factor (modifier ln1p, factor 1):
    * fscore = BM25 × ln(1 + field). Reranking only — retrieval is the
    * plain disjunctive match set; the multiplier is a doc-values read.
    */
  def functionScoreTopK(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars", k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("fscore").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("fscore", col("score") * log(lit(1.0) + col(field)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("fscore"), 4).as("score"))
  }

  /** Composite bool fixtures: (id, must, should, must_not). b5 pins the
    * absent-must-term case (zero results).
    */
  val BoolQueries: Seq[(String, String, String, String)] = Seq(
    ("b1", "spark", "query fast", "slow"),
    ("b2", "hash join", "merge sort", "customer"),
    ("b3", "vector scan", "", "missingzzz"),
    ("b4", "the", "data big", ""),
    ("b5", "spark missingzzz", "query", ""))

  /** The full ES `bool` query in one plan: a doc must contain EVERY must
    * term, none of the must_not terms; its score is the must-group BM25
    * sum plus the matched should terms' sum (each group's sum in ascending
    * term order, groups added must-then-should — the oracle's exact
    * association).
    */
  def boolFullTopK(docs: DataFrame, boolQs: Seq[(String, String, String, String)] = BoolQueries,
      k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def termTable(sel: ((String, String, String, String)) => (String, String)) =
      boolQs.map(sel).flatMap { case (qid, text) =>
        TextPrep.tokenize(text).distinct.map(t => (qid, t))
      }.toDF("query_id", "term")
    val mTab = termTable(q => (q._1, q._2))
    val sTab = termTable(q => (q._1, q._3))
    val bTab = termTable(q => (q._1, q._4))
    val arity = boolQs.map { case (qid, m, _, _) =>
      (qid, TextPrep.tokenize(m).distinct.length.toLong)
    }.toDF("query_id", "n_must")

    val m = Bm25Sql.scoredFromTermTable(docs, mTab, "query_id")
      .select(col("query_id"), col("doc_id"), col("score").as("must_score"),
        col("matched").as("must_matched"))
    val sScores = Bm25Sql.scoredFromTermTable(docs, sTab, "query_id")
      .select(col("query_id"), col("doc_id"), col("score").as("should_score"))
    val banned = graft.ops.TextOps.tokens(docs).join(bTab, Seq("term"))
      .select("query_id", "doc_id").distinct()

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    m.join(broadcast(arity), Seq("query_id"))
      .filter(col("must_matched") === col("n_must"))
      .join(sScores, Seq("query_id", "doc_id"), "left")
      .join(banned, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("score", col("must_score") + coalesce(col("should_score"), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** significant_terms aggregation (ES JLH heuristic): terms overrepresented
    * in each query's match set vs the corpus background.
    * jlh = (fg_rate − bg_rate) × (fg_rate / bg_rate), rates as plain double
    * divisions — the identical expression (and operand integers) on the
    * index side and in the oracle. Only positive-lift terms surface.
    */
  def significantTerms(docs: DataFrame, queries: Seq[(String, String)],
      n: Int = 5): DataFrame = {
    val docTerm = graft.ops.TextOps.tokens(docs).select("doc_id", "term").distinct()
    val m = Bm25Sql.scoredDocs(docs, queries).select("query_id", "doc_id").distinct()
    val fgN = m.groupBy("query_id").agg(count(lit(1)).as("fg_n"))
    val bg = docTerm.groupBy("term").agg(count(lit(1)).as("bg_df"))
    val bgN = docTerm.select("doc_id").distinct().count()
    val fg = m.join(docTerm, Seq("doc_id")).groupBy("query_id", "term")
      .agg(count(lit(1)).as("fg_df"))
    rankSignificant(fg, fgN, bg, bgN, n)
  }

  /** Shared JLH ranking tail (relational + index twins): identical column
    * expressions so the doubles match bit-for-bit.
    */
  private[query] def rankSignificant(fg: DataFrame, fgN: DataFrame, bg: DataFrame,
      bgN: Long, n: Int): DataFrame = {
    val fgRate = col("fg_df").cast("double") / col("fg_n")
    val bgRate = col("bg_df").cast("double") / lit(bgN)
    val w = Window.partitionBy(col("query_id")).orderBy(col("jlh").desc, col("term").asc)
    fg.join(broadcast(fgN), Seq("query_id"))
      .join(bg, Seq("term"))
      .withColumn("jlh", (fgRate - bgRate) * (fgRate / bgRate))
      .filter(col("jlh") > 0.0)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("query_id"), col("rank"), col("term"), col("fg_df"), col("bg_df"),
        round(col("jlh"), 4).as("jlh"))
  }

  /** significant_text (ES, with `filter_duplicate_text: true`): JLH-ranked
    * distinctive terms of each query's match set, with exact-duplicate text
    * removed from the FOREGROUND first — one representative per
    * (query, md5(text)), lowest doc_id wins — the superspreader-immunity
    * behavior ES documents for this agg (a boilerplate page mirrored 1000×
    * must count once, or it dominates every JLH score). Background
    * statistics stay corpus-wide and duplicate-inclusive, exactly like
    * [[significantTerms]]; both twins share [[rankSignificant]] so the
    * doubles match bit-for-bit. Dedup is one window over the match set
    * (queries × matched docs, never the corpus).
    */
  def significantText(docs: DataFrame, queries: Seq[(String, String)],
      n: Int = 5): DataFrame = {
    val docTerm = graft.ops.TextOps.tokens(docs).select("doc_id", "term").distinct()
    val m = Bm25Sql.scoredDocs(docs, queries).select("query_id", "doc_id").distinct()
    val wDup = Window.partitionBy(col("query_id"), col("fp")).orderBy(col("doc_id").asc)
    val fgDocs = m
      .join(docs.select(col("doc_id"), md5(col("text")).as("fp")), Seq("doc_id"))
      .withColumn("rn", row_number().over(wDup))
      .filter(col("rn") === 1)
      .select("query_id", "doc_id")
    val fgN = fgDocs.groupBy("query_id").agg(count(lit(1)).as("fg_n"))
    val bg = docTerm.groupBy("term").agg(count(lit(1)).as("bg_df"))
    val bgN = docTerm.select("doc_id").distinct().count()
    val fg = fgDocs.join(docTerm, Seq("doc_id"))
      .groupBy("query_id", "term").agg(count(lit(1)).as("fg_df"))
    rankSignificant(fg, fgN, bg, bgN, n)
  }

  /** Field collapsing (ES `collapse`): the best-scoring doc per (query,
    * field value), then the global top-k of those representatives.
    */
  def collapseTopK(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "source", k: Int = 10): DataFrame = {
    val wg = Window.partitionBy(col("query_id"), col(field))
      .orderBy(col("score").desc, col("doc_id").asc)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("grank", row_number().over(wg))
      .filter(col("grank") === 1)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col(field),
        round(col("score"), 4).as("score"))
  }

  /** Nested aggregation (ES terms bucket + stats sub-agg): per (query,
    * facet value), count/min/max/avg of `field` over the match set.
    */
  def nestedAgg(docs: DataFrame, queries: Seq[(String, String)],
      facet: String = "lang", field: String = "n_chars"): DataFrame =
    Bm25Sql.scoredDocs(docs, queries)
      .select("query_id", "doc_id").distinct()
      .join(docs.select(col("doc_id"), col(facet), col(field)), Seq("doc_id"))
      .groupBy("query_id", facet)
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_chars"), max(col(field)).as("max_chars"),
        (round(avg(col(field).cast("double")) + lit(1.0e-9), 4) + lit(0.0)).as("avg_chars"))

  /** terms filter values for the q_terms_filter fixture. */
  val TermsFilterLangs: Seq[String] = Seq("de", "fr")

  /** ES `terms` query in filter context: BM25 ranking restricted to docs
    * whose `facet` is in the value list; scoring stays corpus-wide.
    */
  def termsFilterTopK(docs: DataFrame, queries: Seq[(String, String)],
      facet: String = "lang", values: Seq[String] = TermsFilterLangs,
      k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, queries)
      .join(docs.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .filter(col(facet).isin(values: _*))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** ES `rescore`: retrieve top-`window` by BM25, then re-rank ONLY that
    * window by `base + weight × phrase-occurrence-count` (the query text as
    * an exact phrase — a match_phrase secondary, ES's canonical rescorer).
    * Docs outside the window can never enter, exactly ES semantics.
    */
  def rescoreTopK(docs: DataFrame, queries: Seq[(String, String)],
      window: Int = 20, weight: Double = 0.5, k: Int = 10): DataFrame = {
    val wb = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    val base = Bm25Sql.scoredDocs(docs, queries)
      .withColumn("brank", row_number().over(wb))
      .filter(col("brank") <= window)
      .select("query_id", "doc_id", "score")
    val ph = phraseCounts(docs, queries).withColumnRenamed("phrase_id", "query_id")
    val wr = Window.partitionBy(col("query_id")).orderBy(col("rescored").desc, col("doc_id").asc)
    base.join(ph, Seq("query_id", "doc_id"), "left")
      .withColumn("rescored",
        col("score") + lit(weight) * coalesce(col("n_matches").cast("double"), lit(0.0)))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rescored"), 4).as("score"))
  }

  val Phrases: Seq[(String, String)] = Seq(
    "p1" -> "table hash",
    "p2" -> "slow hash batch",
    "p3" -> "spark query")

  /** match_phrase counts: per (phrase, doc), the number of occurrences of
    * the exact consecutive token sequence. Entirely NARROW — the occurrence
    * count is a fold over the doc's own token array (no positional shuffle,
    * no self-join); the only shuffle is the output ordering. At 100 TB this
    * is one map over the corpus scan.
    */
  def phraseCounts(docs: DataFrame, phrases: Seq[(String, String)] = Phrases): DataFrame = {
    val toks = col("toks")
    val perPhrase = phrases.map { case (pid, ptext) =>
      val ws = TextPrep.tokenize(ptext)
      val n = ws.length
      val hits = size(filter(sequence(lit(0), size(toks) - n),
        i => ws.zipWithIndex.map { case (w, j) =>
          element_at(toks, i + j + 1) === w
        }.reduce(_ && _)))
      // guard BEFORE sequence(): size < n would build a descending range
      struct(lit(pid).as("phrase_id"),
        when(size(toks) >= n, hits).otherwise(0).cast("bigint").as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(perPhrase: _*)).as("m"))
      .select(col("m.phrase_id").as("phrase_id"), col("doc_id"), col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** span_near probes: (pair_id, first term, second term); s5 never
    * co-occurs (empty-result case).
    */
  val SpanPairs: Seq[(String, String, String)] = Seq(
    ("s1", "hash", "join"), ("s2", "table", "hash"), ("s3", "slow", "batch"),
    ("s4", "the", "query"), ("s5", "spark", "missingzzz"))

  /** span_near (ES `span_near`, in_order=true) for a 2-term pair: per
    * (pair, doc), the number of ordered position pairs (i, j) with
    * toks[i]=a, toks[j]=b, 0 < j−i ≤ slop+1 — i.e. `b` follows `a` with at
    * most `slop` intervening tokens. Entirely NARROW like [[phraseCounts]]:
    * both position lists and the pair count are folds over the doc's own
    * token array; at 100 TB this is one map over the corpus scan.
    */
  def spanNearCounts(docs: DataFrame, pairs: Seq[(String, String, String)] = SpanPairs,
      slop: Int = 3): DataFrame = {
    val toks = col("toks")
    val perPair = pairs.map { case (pid, a, b) =>
      val pa = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === a)
      val pb = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === b)
      val cnt = aggregate(pa, lit(0L), (acc, i) =>
        acc + size(filter(pb, j => j > i && j <= i + slop + 1)).cast("long"))
      // guard BEFORE sequence(): an empty doc would build a descending range
      struct(lit(pid).as("pair_id"),
        when(size(toks) > 0, cnt).otherwise(lit(0L)).as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(perPair: _*)).as("m"))
      .select(col("m.pair_id").as("pair_id"), col("doc_id"), col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** span_multi probes (ES `span_multi` wrapping a `prefix` query inside
    * `span_near`): (probe_id, prefix, fixed term). "s" expands to six
    * vocabulary terms, "qu" to one, "zzz" to none (must yield no rows).
    */
  val SpanMultiProbes: Seq[(String, String, String)] = Seq(
    ("sm1", "s", "join"), ("sm2", "qu", "scan"), ("sm3", "zzz", "spark"))

  /** span_multi + span_near (ES): ordered position pairs (i, j) within the
    * slop window where toks[i] matches the PREFIX (the multi-term rewrite)
    * and toks[j] is the fixed term — [[spanNearCounts]] with the first
    * leg's equality test widened to startsWith. Same narrow per-doc
    * codegen'd fold, no shuffle before the final filter. Index twin:
    * [[IndexSearch.spanMultiMatch]] expands the prefix against the terms
    * dictionary and rides the positional sidecar.
    */
  def spanMultiCounts(docs: DataFrame,
      probes: Seq[(String, String, String)] = SpanMultiProbes,
      slop: Int = 3): DataFrame = {
    val toks = col("toks")
    val perProbe = probes.map { case (pid, prefix, b) =>
      val pa = filter(sequence(lit(1), size(toks)),
        i => element_at(toks, i).startsWith(lit(prefix)))
      val pb = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === b)
      val cnt = aggregate(pa, lit(0L), (acc, i) =>
        acc + size(filter(pb, j => j > i && j <= i + slop + 1)).cast("long"))
      struct(lit(pid).as("probe_id"),
        when(size(toks) > 0, cnt).otherwise(lit(0L)).as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(perProbe: _*)).as("m"))
      .select(col("m.probe_id").as("probe_id"), col("doc_id"), col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** intervals-query rules (ES `intervals`, `all_of` with `ordered: true`
    * and `max_gaps`): three terms that must appear in order within the gap
    * budget. Pinned counting semantic (oracle-checked): the number of
    * ordered position tuples (i < j < k) with span k−i+1 ≤ 3+max_gaps —
    * a containment count rather than ES's minimal-interval enumeration,
    * the same pinning discipline as the other positional twins.
    */
  val IntervalRules: Seq[(String, String, String, String)] = Seq(
    ("i1", "hash", "join", "merge"),
    ("i2", "the", "spark", "query"),
    ("i3", "vector", "column", "scan"),
    ("i4", "spark", "table", "missingzzz"))

  /** intervals query, relational twin: per (rule, doc), ordered 3-term
    * chains within the span budget — one narrow per-doc fold over the
    * corpus scan (positions per term bounded by doclen), no shuffle until
    * the final (tiny) result. The index twin is `Positions.intervalsMatch`.
    */
  def intervalsCounts(docs: DataFrame,
      rules: Seq[(String, String, String, String)] = IntervalRules,
      maxGaps: Int = 4): DataFrame = {
    val toks = col("toks")
    val span = maxGaps + 2 // k ≤ i + span
    val perRule = rules.map { case (rid, a, b, c) =>
      val pa = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === a)
      val pb = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === b)
      val pc = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === c)
      val cnt = aggregate(pa, lit(0L), (acc, i) =>
        acc + aggregate(filter(pb, j => j > i && j <= i + span - 1), lit(0L), (acc2, j) =>
          acc2 + size(filter(pc, k => k > j && k <= i + span)).cast("long")))
      struct(lit(rid).as("rule_id"),
        when(size(toks) > 0, cnt).otherwise(lit(0L)).as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(perRule: _*)).as("m"))
      .select(col("m.rule_id").as("rule_id"), col("doc_id"), col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** match_bool_prefix (ES): the probe's terms become OR'd bool clauses —
    * every token a term clause, the LAST token a prefix clause (one clause
    * regardless of how many dictionary terms it expands to, per the ES
    * contract). Per (probe, doc): the number of DISTINCT clauses matched
    * (n_clauses ≥ 1 ⇒ a hit under the default OR operator). Shares the
    * [[PhrasePrefixes]] probes: x4's prefix expands to nothing but `table`
    * still matches — the OR semantics that distinguish this operator from
    * match_phrase_prefix. One distinct-token join against a broadcast
    * clause table; index twin: `IndexSearch.matchBoolPrefix`.
    */
  def matchBoolPrefix(docs: DataFrame,
      probes: Seq[(String, String)] = PhrasePrefixes): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val clauses = probes.flatMap { case (pid, text) =>
      val toks = TextPrep.tokenize(text)
      if (toks.isEmpty) Seq.empty
      else toks.init.distinct.map(t => (pid, "term", t)) :+ ((pid, "prefix", toks.last))
    }.toDF("probe_id", "kind", "v")
    graft.ops.TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(clauses),
        (col("kind") === "term" && col("term") === col("v")) ||
          (col("kind") === "prefix" && col("term").startsWith(col("v"))))
      .groupBy("probe_id", "doc_id")
      .agg(count_distinct(concat_ws(":", col("kind"), col("v"))).as("n_clauses"))
  }

  /** span_or clauses (ES `span_or`): positions of ANY clause term count.
    * o3 is the all-absent probe, o4 the single-term degeneracy (≡ the
    * term's tf).
    */
  val SpanOrClauses: Seq[(String, Seq[String])] = Seq(
    ("o1", Seq("hash", "join", "merge")),
    ("o2", Seq("spark", "query")),
    ("o3", Seq("missingzzz", "alsogonezzz")),
    ("o4", Seq("the")))

  /** span_or, relational twin: per (clause, doc), the number of token
    * positions holding ANY clause term — terms are distinct strings so the
    * union of their position sets is disjoint and the count is exact. One
    * narrow filter-fold per clause over the doc's own token array, like
    * [[spanNearCounts]]. Index twin: `Positions.spanOrMatch` (sums stored
    * position-list lengths — never decodes the corpus).
    */
  def spanOrCounts(docs: DataFrame,
      clauses: Seq[(String, Seq[String])] = SpanOrClauses): DataFrame = {
    val toks = col("toks")
    val per = clauses.map { case (cid, terms) =>
      val cnt = size(filter(toks, t => terms.map(t === _).reduce(_ || _))).cast("long")
      struct(lit(cid).as("clause_id"), cnt.as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(per: _*)).as("m"))
      .select(col("m.clause_id").as("clause_id"), col("doc_id"),
        col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** span_not probes (ES `span_not` with pre/post): (probe, include,
    * exclude, pre, post) — count positions i of `include` with NO
    * `exclude` occurrence in [i − pre, i + post]. n3's exclude is absent
    * (≡ plain tf), n1 is the adjacent-pair suppressor.
    */
  val SpanNotProbes: Seq[(String, String, String, Int, Int)] = Seq(
    ("n1", "hash", "join", 1, 1),
    ("n2", "the", "query", 0, 2),
    ("n3", "spark", "missingzzz", 2, 2),
    ("n4", "table", "scan", 1, 3))

  /** span_not, relational twin: positions of `include` surviving the
    * exclusion window — a nested filter-fold over the doc's own token
    * array (narrow, one map over the corpus scan). Index twin:
    * `Positions.spanNotMatch` (two binary-search bounds per include
    * position on the exclude term's sorted position list).
    */
  def spanNotCounts(docs: DataFrame,
      probes: Seq[(String, String, String, Int, Int)] = SpanNotProbes): DataFrame = {
    val toks = col("toks")
    val per = probes.map { case (pid, inc, exc, pre, post) =>
      val pi = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === inc)
      val pe = filter(sequence(lit(1), size(toks)), i => element_at(toks, i) === exc)
      val cnt = size(filter(pi, i =>
        size(filter(pe, j => j >= i - pre && j <= i + post)) === 0)).cast("long")
      // guard BEFORE sequence(): an empty doc would build a descending range
      struct(lit(pid).as("probe_id"),
        when(size(toks) > 0, cnt).otherwise(lit(0L)).as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(per: _*)).as("m"))
      .select(col("m.probe_id").as("probe_id"), col("doc_id"),
        col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** span_first probes (ES `span_first`): (probe, term, end) — the term
    * must occur within the first `end` token positions (1-based).
    */
  val SpanFirstProbes: Seq[(String, String, Int)] = Seq(
    ("f1", "spark", 10),
    ("f2", "the", 5),
    ("f3", "merge", 25),
    ("f4", "missingzzz", 20))

  /** span_first, relational twin: per (probe, doc), the term's FIRST
    * position when it falls inside the window — `array_position` on the
    * tokenized text, one narrow map over the corpus scan. Index twin:
    * `Positions.spanFirstMatch` (sidecar head positions).
    */
  def spanFirstCounts(docs: DataFrame,
      probes: Seq[(String, String, Int)] = SpanFirstProbes): DataFrame = {
    val toks = col("toks")
    val perProbe = probes.map { case (pid, term, end) =>
      struct(lit(pid).as("probe_id"),
        array_position(toks, term).as("first_pos"),
        lit(end).as("maxpos"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(perProbe: _*)).as("m"))
      .filter(col("m.first_pos") >= 1 && col("m.first_pos") <= col("m.maxpos"))
      .select(col("m.probe_id").as("probe_id"), col("doc_id"),
        col("m.first_pos").as("first_pos"))
  }

  /** match_phrase_prefix probes: all-but-last tokens match exactly, the
    * last is a prefix ("hash jo" ⇒ `hash` then any `jo…` term next).
    */
  val PhrasePrefixes: Seq[(String, String)] = Seq(
    "x1" -> "hash jo",
    "x2" -> "the s",
    "x3" -> "spark quer",
    "x4" -> "table zz")

  /** match_phrase_prefix counts (ES `match_phrase_prefix`): per (probe,
    * doc), start positions where the exact lead tokens chain and the final
    * position starts with the prefix. Same narrow per-doc fold as
    * [[phraseCounts]] — one map over the corpus scan at 100 TB; the index
    * twin is `Positions.phrasePrefixMatch`.
    */
  def phrasePrefixCounts(docs: DataFrame,
      probes: Seq[(String, String)] = PhrasePrefixes): DataFrame = {
    val toks = col("toks")
    val perProbe = probes.map { case (pid, ptext) =>
      val ws = TextPrep.tokenize(ptext)
      val n = ws.length
      val lead = ws.dropRight(1)
      val prefix = ws.last
      val hits = size(filter(sequence(lit(0), size(toks) - n),
        i => (lead.zipWithIndex.map { case (w, j) =>
          element_at(toks, i + j + 1) === w
        } :+ element_at(toks, i + n).startsWith(prefix)).reduce(_ && _)))
      struct(lit(pid).as("phrase_id"),
        when(size(toks) >= n, hits).otherwise(0).cast("bigint").as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(perProbe: _*)).as("m"))
      .select(col("m.phrase_id").as("phrase_id"), col("doc_id"), col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** Percolator stored queries (query_id, must, must_not) — the BoolQueries
    * triples minus the should group (percolation is match-only, no
    * scoring). b5 carries an absent must term → matches nothing.
    */
  val StoredQueries: Seq[(String, String, String)] =
    BoolQueries.map(q => (q._1, q._2, q._4))

  /** ES percolate (reverse search): stored queries live in the index and
    * incoming DOCUMENTS are matched against them — the alerting/routing
    * primitive. A doc matches a stored query iff it contains every must
    * term and none of the must_not terms.
    *
    * Scale shape: the stored-query set compiles to broadcast literal
    * predicates over the doc's own token array (the [[phraseCounts]]
    * pattern) — one narrow map over the corpus scan, no shuffle, no join;
    * at 100 TB of incoming docs this is the best possible plan. ES evaluates
    * percolator queries per-document the same way.
    */
  def percolate(docs: DataFrame,
      stored: Seq[(String, String, String)] = StoredQueries,
      keyCol: String = "doc_id"): DataFrame = {
    val toks = col("toks")
    val perQ = stored.map { case (qid, must, not) =>
      val ms = TextPrep.tokenize(must).distinct.toSeq
      val ns = TextPrep.tokenize(not).distinct.toSeq
      val m = (ms.map(t => array_contains(toks, t)) ++
        ns.map(t => !array_contains(toks, t))).reduce(_ && _)
      struct(lit(qid).as("query_id"), m.as("m"))
    }
    docs
      .select(col(keyCol),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col(keyCol), explode(array(perQ: _*)).as("q"))
      .filter(col("q.m"))
      .select(col(keyCol), col("q.query_id").as("query_id"))
  }

  /** ids-query fixture: four live ids plus one absent (drops out on both
    * sides) — the reference's Size-1 existence lookup shape
    * (monstache.go:4019,4114-4116).
    */
  val IdProbes: Seq[Long] = Seq(0L, 7L, 101L, 499L, 12345L)

  /** ES `ids` query / document GET, relational twin: point rows with the
    * stored doc metadata (url as staged, token doclen, version 0 — the
    * exact columns the index docs table pins).
    */
  def idsLookup(docs: DataFrame, ids: Seq[Long] = IdProbes): DataFrame = {
    val dl = TextOps.doclens(docs)
    docs.filter(col("doc_id").isin(ids: _*))
      .join(dl, Seq("doc_id"))
      .select(col("doc_id"),
        concat(lit("testdata://"), col("source"), lit("/"), col("doc_id")).as("url"),
        col("doclen").cast("long").as("doclen"), lit(0L).as("version"))
  }

  /** multi_match fixtures: vocabulary terms hit the `text` field, `srcNN`
    * tokens hit the `source` keyword field; mm3/mm4 are single-field,
    * mm5 carries an absent term.
    */
  val MultiQueries: Seq[(String, String)] = Seq(
    "mm1" -> "spark src3", "mm2" -> "src7 src12 query", "mm3" -> "hash join",
    "mm4" -> "src0", "mm5" -> "missingzzz src5 spark")

  /** multi_match, type best_fields with tie_breaker (the ES default
    * multi-field query): each field is scored as its own BM25 corpus (own
    * tf/df/doclen/avgdl — exactly Lucene's per-field statistics), then
    * per (query, doc): score = best_field + tb × (sum − best_field).
    * Relational twin over fields (`text`, `source`); the index twin scores
    * each field from its own inverted index ([[IndexSearch.multiMatchTopK]])
    * — one index per field is precisely Lucene's layout.
    */
  def multiMatchTopK(docs: DataFrame, queries: Seq[(String, String)] = MultiQueries,
      tieBreaker: Double = 0.3, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val t = Bm25Sql.scoredFromTermTable(docs, q, "query_id")
      .select(col("query_id"), col("doc_id"), col("score").as("s_text"))
    val srcField = docs.select(col("doc_id"), col("source").as("text"))
    val s = Bm25Sql.scoredFromTermTable(srcField, q, "query_id")
      .select(col("query_id"), col("doc_id"), col("score").as("s_src"))
    combineFields(t, s, tieBreaker, k)
  }

  /** Shared best_fields combination tail (relational + index twins): missing
    * fields contribute 0 (BM25 addends are strictly positive, so 0 never
    * wins the max); `mx + tb*(s1 + s2 - mx)` with the oracle's exact
    * association.
    */
  private[query] def combineFields(t: DataFrame, s: DataFrame,
      tieBreaker: Double, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    t.join(s, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("s1", coalesce(col("s_text"), lit(0.0)))
      .withColumn("s2", coalesce(col("s_src"), lit(0.0)))
      .withColumn("mx", greatest(col("s1"), col("s2")))
      .withColumn("score", col("mx") + lit(tieBreaker) * (col("s1") + col("s2") - col("mx")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** ES composite aggregation: paginated enumeration of the (f1, f2) bucket
    * key space in key order, resumable via after_key. This returns PAGE 2 —
    * the cursor is page 1's last key and page 2 is everything strictly
    * after it in (f1, f2) order, the exact ES resume contract (no global
    * rank is materialized at serving time; bucket cardinality is bounded by
    * the key-space product, so the per-query window never sees the corpus).
    */
  def compositeAggPage(docs: DataFrame, queries: Seq[(String, String)],
      f1: String = "lang", f2: String = "source", size: Int = 5): DataFrame = {
    val buckets = matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(f1), col(f2)), Seq("doc_id"))
      .groupBy(col("query_id"), col(f1), col(f2))
      .agg(count(lit(1)).as("n_docs"))
    compositePage(buckets, f1, f2, size)
  }

  /** boosting-query fixture: the negative query (docs matching it are
    * demoted, never excluded — the ES `boosting` / `negative_boost`
    * semantics, vs must_not's hard exclusion).
    */
  val BoostingNegative = "slow"

  /** ES `boosting` query: rank by the positive query's BM25, multiplying
    * the score by `negBoost` for docs matching ANY negative-query term.
    * The negative side is one narrow distinct match set (a left join +
    * conditional multiply) — no second scoring pass, no driver loop; at
    * scale the join keys are uniform doc_ids.
    */
  def boostingTopK(docs: DataFrame, queries: Seq[(String, String)],
      negative: String = BoostingNegative, negBoost: Double = 0.5,
      k: Int = 10): DataFrame = {
    val negTerms = TextPrep.tokenize(negative).distinct
    val neg = TextOps.tokens(docs).filter(col("term").isin(negTerms: _*))
      .select("doc_id").distinct().withColumn("is_neg", lit(1))
    boostingFrom(Bm25Sql.scoredDocs(docs, queries), neg, negBoost, k)
  }

  /** The demote+rerank tail shared by the relational and index twins. */
  private[query] def boostingFrom(scored: DataFrame, neg: DataFrame,
      negBoost: Double, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("bscore").desc, col("doc_id").asc)
    scored
      .join(neg, Seq("doc_id"), "left")
      .withColumn("bscore",
        when(col("is_neg").isNotNull, col("score") * lit(negBoost)).otherwise(col("score")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("bscore"), 4).as("score"))
  }

  /** range-aggregation fixture: explicit bucket edges over n_chars
    * (*-150, 150-400, 400-*; ES from-inclusive / to-exclusive).
    */
  val RangeAggEdges: Seq[Long] = Seq(150L, 400L)

  /** ES `range` aggregation: matched docs counted into explicit
    * [from, to) buckets of a numeric doc-values field, ES bucket-key
    * labels (`*-150`, `150-400`, `400-*`). One uniform-key join + one
    * aggregation; bucket assignment is a codegen'd CASE chain.
    */
  def rangeAgg(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars", edges: Seq[Long] = RangeAggEdges): DataFrame =
    rangeAggFrom(matchedSet(docs, queries), docs, field, edges)

  private[query] def rangeAggFrom(matched: DataFrame, docsMeta: DataFrame,
      field: String, edges: Seq[Long]): DataFrame =
    matched
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("bucket", rangeBucket(col(field), edges))
      .groupBy("query_id", "bucket")
      .agg(count(lit(1)).as("n_docs"))

  private def rangeBucket(f: Column, edges: Seq[Long]): Column = {
    val first = when(f < edges.head, lit(s"*-${edges.head}"))
    edges.zip(edges.tail).foldLeft(first) { case (acc, (lo, hi)) =>
      acc.when(f < hi, lit(s"$lo-$hi"))
    }.otherwise(lit(s"${edges.last}-*"))
  }

  /** filters-aggregation fixture: named predicate buckets over the
    * doc-values columns (an ES `filters` agg's keyed filters).
    */
  val NamedFilters: Seq[(String, Column)] = Seq(
    "en" -> (col("lang") === "en"),
    "long" -> (col("n_chars") >= 300L),
    "zh_short" -> (col("lang") === "zh" && col("n_chars") < 200L))

  /** ES `filters` aggregation: one named bucket per predicate, each
    * counting the query's matched docs satisfying it. A SINGLE pass of
    * conditional sums (not one job per filter), unpivoted to
    * (query_id, filter_id, n_docs) rows.
    */
  def filtersAgg(docs: DataFrame, queries: Seq[(String, String)],
      filters: Seq[(String, Column)] = NamedFilters): DataFrame =
    filtersAggFrom(matchedSet(docs, queries), docs, filters)

  private[query] def filtersAggFrom(matched: DataFrame, docsMeta: DataFrame,
      filters: Seq[(String, Column)]): DataFrame = {
    val aggs = filters.map { case (nm, p) =>
      sum(when(p, 1L).otherwise(0L)).as(nm)
    }
    matched
      .join(docsMeta.select(col("doc_id"), col("lang"), col("n_chars")), Seq("doc_id"))
      .groupBy("query_id")
      .agg(aggs.head, aggs.tail: _*)
      .select(col("query_id"), explode(array(filters.map { case (nm, _) =>
        struct(lit(nm).as("filter_id"), col(nm).as("n_docs"))
      }: _*)).as("fb"))
      .select(col("query_id"), col("fb.filter_id").as("filter_id"),
        col("fb.n_docs").as("n_docs"))
  }

  /** `_count` API: total hits (match-any, live docs) per query — the
    * retrieval scan without scoring or ranking.
    */
  def countMatches(docs: DataFrame, queries: Seq[(String, String)]): DataFrame =
    matchedSet(docs, queries).groupBy("query_id").agg(count(lit(1)).as("total"))

  /** `_termvectors` with term_statistics for the probed doc ids:
    * re-analyze the stored `_source` text (exactly ES's fallback when term
    * vectors aren't stored) + corpus-wide df per term. The df aggregation
    * is pruned to the probed docs' terms FIRST (a broadcast semi-join), so
    * the corpus-side pass never aggregates the full vocabulary — at 10^12
    * docs df would instead be one lookup in the index's term dictionary
    * (same numbers; see IndexBuilder.writeTermsFromPostings).
    */
  def termVectors(docs: DataFrame, ids: Seq[Long] = IdProbes): DataFrame = {
    val probe = TextOps.termFreqs(docs.filter(col("doc_id").isin(ids: _*)))
    val df = TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(probe.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("df"))
    probe.join(df, Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** `_explain` API: the per-term BM25 breakdown (tf, df, doclen, idf,
    * addend) for each query's top-1 doc under the standard ranking — the
    * operands are [[Bm25Sql.termRowsFromTermTable]]'s rows, so the
    * breakdown sums bit-exactly to the ranked score.
    */
  def explainScore(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val rows = Bm25Sql.termRowsFromTermTable(docs, q)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    val top1 = rows.groupBy("query_id", "doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("addend")))),
        lit(0.0), (acc, x) => acc + x.getField("addend")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select("query_id", "doc_id")
    explainSelect(rows.join(broadcast(top1), Seq("query_id", "doc_id")))
  }

  /** Shared projection of explain rows (relational and index twins). */
  private[query] def explainSelect(rows: DataFrame): DataFrame =
    rows.select(col("query_id"), col("doc_id"), col("term"),
      col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
      col("doclen").cast("long").as("doclen"),
      round(col("idf"), 4).as("idf"), round(col("addend"), 4).as("addend"))

  /** `_analyze` fixture texts: mixed case, punctuation runs, digits, and
    * non-ASCII letters (dropped identically by the ASCII tokenizer and the
    * oracle's `[^a-z0-9]+` split after lowercasing).
    */
  val AnalyzeProbes: Seq[(Int, String)] = Seq(
    1 -> "The QUICK brown-fox: jumps over 42 lazy dogs!",
    2 -> "  punctuation...only???  ",
    3 -> "mixed42digits and cafe76 touch-e tokens2go",
    4 -> "already lowercase tokens")

  /** ES `_analyze` API: the analyzer's token stream — (position, token)
    * per probe text. The tokenizer here IS the index build's
    * `TextPrep.tokenize`, so this surface is byte-identical to what the
    * postings were built from (the parity-debugging role `_analyze` plays
    * against ES mappings). A per-request API, not a corpus job — the tiny
    * probe table is parallelized only so the result is a DataFrame like
    * every other query surface.
    */
  def analyzeText(spark: SparkSession,
      probes: Seq[(Int, String)] = AnalyzeProbes): DataFrame = {
    import spark.implicits._
    probes.flatMap { case (id, txt) =>
      TextPrep.tokenize(txt).zipWithIndex.map { case (tok, i) => (id, i, tok) }
    }.toDF("text_id", "position", "token")
  }

  /** Page-2 tail shared by the relational and index twins. */
  private[query] def compositePage(buckets: DataFrame, f1: String, f2: String,
      size: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col(f1).asc, col(f2).asc)
    val cursor = buckets.withColumn("rn", row_number().over(w))
      .filter(col("rn") === size)
      .select(col("query_id"), col(f1).as("a1"), col(f2).as("a2"))
    buckets.join(broadcast(cursor), Seq("query_id"))
      .filter(col(f1) > col("a1") || (col(f1) === col("a1") && col(f2) > col("a2")))
      .withColumn("page_rank", row_number().over(w))
      .filter(col("page_rank") <= size)
      .select(col("query_id"), col("page_rank"), col(f1), col(f2), col("n_docs"))
  }

  // ---- hybrid retrieval: reciprocal rank fusion (ES 8 `retriever: rrf`) ----

  /** Fuse a lexical and a kNN rank list by reciprocal rank fusion: each
    * retriever contributes 1/(rankConstant + rank) for documents inside its
    * rank window, and documents re-rank by the fused sum (ES
    * `rrf.rank_constant`, default 60). Inputs are
    * (query_id, doc_id, text_rank) and (query_id, doc_id, knn_rank) with
    * ranks already cut to each retriever's window; emits
    * (query_id, rank, doc_id, rrf, text_rank, knn_rank), 0 marking "outside
    * that retriever's window". The lexical contribution is added first —
    * the fixed association the oracle mirrors (sums of two doubles are
    * order-sensitive in IEEE).
    *
    * Scale shape: both inputs are top-window lists (k·queries rows), so the
    * outer join and the final per-query window are tiny regardless of corpus
    * size — all the heavy lifting happened inside each retriever.
    */
  def rrfFuse(text: DataFrame, knn: DataFrame, k: Int = 10,
      rankConstant: Int = 60): DataFrame = {
    val fused = text.withColumnRenamed("text_rank", "tr")
      .join(knn.withColumnRenamed("knn_rank", "vr"), Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rankConstant) + col("tr")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rankConstant) + col("vr")), lit(0.0)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rrf") + lit(1.0e-9), 6).as("rrf"),
        coalesce(col("tr"), lit(0)).as("text_rank"),
        coalesce(col("vr"), lit(0)).as("knn_rank"))
  }

  /** Hybrid (RRF) retrieval, relational twin: lexical ranks from exhaustive
    * BM25 over the corpus, kNN ranks from exact cosine of the per-query
    * request vector against the embeddings table (vec_id ≡ doc_id in the
    * harness tables; the i-th reference query carries the i-th embedding as
    * its request vector, a deterministic stand-in for an encoder). The
    * index-served twin is [[IndexSearch.rrfHybrid]].
    */
  def rrfHybrid(docs: DataFrame, emb: DataFrame, queries: Seq[(String, String)],
      k: Int = 10, rankConstant: Int = 60, window: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val text = Bm25Sql.topKDocs(docs, queries, window)
      .select(col("query_id"), col("doc_id"), col("rank").as("text_rank"))
    val knn = graft.ops.Similarity.cosineRanks(emb, queryVectors(emb, queries), window)
    rrfFuse(text, knn, k, rankConstant)
  }

  /** The per-query request vectors for hybrid search: query i ↦ embedding
    * with vec_id = i (deterministic, corpus-independent of the text side).
    */
  def queryVectors(emb: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ids = queries.zipWithIndex.map { case ((qid, _), i) => (qid, i.toLong) }
      .toDF("query_id", "qvec_id")
    broadcast(ids)
      .join(emb.select(col("vec_id").as("qvec_id"), col("embedding").as("qvec")), Seq("qvec_id"))
      .select("query_id", "qvec")
  }

  // ---- ranking evaluation (ES `_rank_eval` API) ----

  /** Ranking-evaluation metrics for a ranked result list against a
    * relevance judgment set — the ES `_rank_eval` API with its four stock
    * metrics: precision@k (hits / k over the returned page),
    * recall@k (hits / |relevant|), MRR (1 / first relevant rank), and
    * binary-gain NDCG@k. `ranked` is (query_id, rank, doc_id) already cut
    * to the top-k page; `relevant` is (query_id, doc_id). Every query in
    * `queries` gets a row (zeros when nothing relevant was returned — and
    * recall/NDCG are 0 by convention when the judgment set itself is empty,
    * matching a rated-request with no rated positives).
    *
    * DCG folds gains in ascending-rank order and IDCG in ascending ideal
    * position, so both are bit-identical to the oracle's
    * `sum(x ORDER BY rank)`; gains are written ln(r+1)/ln(2), the exact
    * expression the oracle evaluates.
    *
    * Scale shape: `ranked` is k·queries rows; only `relevant` scales with
    * the corpus, and it is consumed by one groupBy + one broadcast-able
    * join against the page. No corpus-sized window, no driver loop.
    */
  def rankEvalMetrics(ranked: DataFrame, relevant: DataFrame,
      queries: Seq[(String, String)], k: Int = 10): DataFrame = {
    val spark = ranked.sparkSession
    import spark.implicits._
    val gain = lit(1.0) / (log(col("rank").cast("double") + lit(1.0)) / log(lit(2.0)))
    val nrel = relevant.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = ranked.join(relevant, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_hits"), min(col("rank")).as("min_rank"),
        aggregate(array_sort(collect_list(col("rank"))), lit(0.0),
          (acc, r) => acc + lit(1.0) / (log(r.cast("double") + lit(1.0)) / log(lit(2.0))))
          .as("dcg"))
    val spine = queries.map(_._1).toDF("query_id")
    val idcg = when(col("n_rel") === 0, lit(0.0)).otherwise(
      aggregate(sequence(lit(1L), least(col("n_rel"), lit(k.toLong))), lit(0.0),
        (acc, i) => acc + lit(1.0) / (log(i.cast("double") + lit(1.0)) / log(lit(2.0)))))
    spine
      .join(nrel, Seq("query_id"), "left_outer")
      .join(hits, Seq("query_id"), "left_outer")
      .na.fill(0L, Seq("n_rel", "n_hits", "min_rank"))
      .na.fill(0.0, Seq("dcg"))
      .withColumn("idcg", idcg)
      .select(col("query_id"), col("n_rel"), col("n_hits"),
        round(col("n_hits").cast("double") / lit(k.toDouble) + lit(1.0e-9), 4).as("prec"),
        round(when(col("n_rel") === 0, lit(0.0))
          .otherwise(col("n_hits").cast("double") / col("n_rel").cast("double")) + lit(1.0e-9), 4)
          .as("recall"),
        round(when(col("min_rank") === 0, lit(0.0))
          .otherwise(lit(1.0) / col("min_rank").cast("double")) + lit(1.0e-9), 4).as("mrr"),
        round(when(col("idcg") > 0, col("dcg") / col("idcg")).otherwise(lit(0.0)) + lit(1.0e-9), 4)
          .as("ndcg"))
  }

  /** `_rank_eval`, relational twin: the evaluated ranking is the exhaustive
    * BM25 top-k and the judgment set is the conjunctive match set (docs
    * containing EVERY query term — a deterministic, corpus-derived rating
    * rule, so the oracle can reproduce it exactly). The index-served twin
    * is [[IndexSearch.rankEval]].
    */
  def rankEval(docs: DataFrame, queries: Seq[(String, String)], k: Int = 10): DataFrame = {
    val ranked = Bm25Sql.topKDocs(docs, queries, k).select("query_id", "rank", "doc_id")
    val relevant = Bm25Sql.scoredDocs(docs, queries)
      .filter(col("matched") === col("nq")).select("query_id", "doc_id")
    rankEvalMetrics(ranked, relevant, queries, k)
  }

  // ---- span_containing / span_within: the last two span-family members ----

  /** Probes (probe_id, little, big_a, big_b, slop): the big span is the
    * span_near pair (a before b within slop, extent [i, j] inclusive), the
    * little span a single term. c3's little is absent (both queries empty),
    * c4's little IS big_b — every big span trivially contains its own
    * endpoint, so containing degenerates to the span_near pair count (the
    * aliasing pin).
    */
  val SpanContainProbes: Seq[(String, String, String, String, Int)] = Seq(
    ("c1", "query", "spark", "join", 4),
    ("c2", "the", "hash", "merge", 3),
    ("c3", "missingzzz", "spark", "query", 5),
    ("c4", "scan", "table", "scan", 2))

  /** span_containing / span_within, relational twin: positions of the three
    * terms via filter-folds over the doc's own token array, then nested
    * `exists` — narrow, one map over the corpus scan, no shuffle before the
    * final aggregation-free emit. `within = false` counts big spans holding
    * a little position; `within = true` counts little positions enclosed by
    * a big span. Index twin: `Positions.spanContainMatch` (bucket-local
    * cogroup + binary searches on sidecar position lists).
    */
  def spanContainCounts(docs: DataFrame, within: Boolean,
      probes: Seq[(String, String, String, String, Int)] = SpanContainProbes): DataFrame = {
    val toks = col("toks")
    val per = probes.map { case (pid, little, bigA, bigB, slop) =>
      val idx = sequence(lit(1), size(toks))
      val pl = filter(idx, p => element_at(toks, p) === little)
      val pa = filter(idx, i => element_at(toks, i) === bigA)
      val pb = filter(idx, j => element_at(toks, j) === bigB)
      val cnt =
        if (within)
          size(filter(pl, p => exists(pa, i =>
            i <= p && exists(pb, j => j > i && j <= i + slop + 1 && j >= p))))
        else
          aggregate(pa, lit(0),
            (acc, i) => acc + size(filter(pb, j =>
              j > i && j <= i + slop + 1 && exists(pl, p => p >= i && p <= j))))
      // guard BEFORE sequence(): an empty doc would build a descending range
      struct(lit(pid).as("probe_id"),
        when(size(toks) > 0, cnt.cast("long")).otherwise(lit(0L)).as("n_matches"))
    }
    docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .select(col("doc_id"), explode(array(per: _*)).as("m"))
      .select(col("m.probe_id").as("probe_id"), col("doc_id"),
        col("m.n_matches").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  // ---- `_terms_enum` API: prefix walk of the vocabulary with paging ----

  /** (probe_id, prefix, search_after, size): e2 pages past "sl", e3's
    * prefix matches nothing, e4 must include the prefix itself as a term.
    */
  val TermsEnumProbes: Seq[(String, String, String, Int)] = Seq(
    ("e1", "qu", "", 5),
    ("e2", "s", "sl", 8),
    ("e3", "zz", "", 5),
    ("e4", "the", "", 3))

  /** `_terms_enum`, relational twin: vocabulary terms matching a prefix,
    * lexicographically ordered, resuming after `search_after`, first `size`
    * terms — plus each term's doc count (a superset of ES's terms-only
    * response, making the oracle check stronger). Index twin:
    * [[IndexSearch.termsEnum]] walks the terms-dictionary sidecar instead
    * of deriving the vocabulary from the corpus.
    */
  def termsEnum(docs: DataFrame,
      probes: Seq[(String, String, String, Int)] = TermsEnumProbes): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val df = TextOps.tokens(docs).select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    termsEnumFrom(df, probes)
  }

  /** The shared rank/page tail over any (term, df) vocabulary table. */
  def termsEnumFrom(vocab: DataFrame,
      probes: Seq[(String, String, String, Int)]): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val p = probes.toDF("probe_id", "prefix", "after", "sz")
    val w = Window.partitionBy(col("probe_id")).orderBy(col("term").asc)
    vocab.join(broadcast(p),
        col("term").startsWith(col("prefix")) && col("term") > col("after"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= col("sz"))
      .select(col("probe_id"), col("rank"), col("term"), col("df"))
  }

  // ---- `_mget`: multi-id GET preserving misses ----

  /** (req_id, doc_id) — r4/r5 miss at every scale factor. */
  val MgetRequests: Seq[(String, Long)] = Seq(
    ("r1", 0L), ("r2", 7L), ("r3", 123L), ("r4", 999999999L), ("r5", -5L), ("r6", 42L))

  /** `_mget`, relational twin: every requested id gets a row — `found`
    * false (doclen 0) for ids not in the corpus, the defining difference
    * from the ids query (which drops misses). Index twin:
    * [[IndexSearch.mget]] reads the docs sidecar with In(docId) pushdown.
    */
  def mget(docs: DataFrame,
      requests: Seq[(String, Long)] = MgetRequests): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val req = requests.toDF("req_id", "doc_id")
    // push the id set INTO the corpus sides first (In reaches the scan), so
    // the outer join's broadcast sides are O(requests) — never the corpus
    val ids = requests.map(_._2)
    val hit = docs.filter(col("doc_id").isin(ids: _*))
    val dl = TextOps.tokens(hit).groupBy("doc_id").agg(count(lit(1)).as("doclen"))
    req
      .join(broadcast(hit.select(col("doc_id"), lit(true).as("found"))), Seq("doc_id"), "left_outer")
      .join(broadcast(dl), Seq("doc_id"), "left_outer")
      .select(col("req_id"), col("doc_id"),
        coalesce(col("found"), lit(false)).as("found"),
        coalesce(col("doclen"), lit(0L)).as("doclen"))
  }

  // ---- linear retriever (ES 8.16 `retriever: linear`) ----

  /** Fuse a scored lexical and a scored kNN leg by weighted min-max-
    * normalized sum — ES's `linear` retriever with the `minmax` normalizer:
    * within each leg's retrieved window, norm = (s − min)/(max − min)
    * (pinned to 1.0 when the window's scores are all equal), and the fused
    * score is `wText·normText + wKnn·normKnn` with 0 for a doc outside a
    * leg's window. Inputs are (query_id, doc_id, text_rank, tscore) and
    * (query_id, doc_id, knn_rank, vscore) already cut to each leg's
    * window. The lexical product is added first (the fixed association the
    * oracle mirrors); min/max are order-free and exact in IEEE, so
    * bit-parity reduces to the legs' own score parity.
    *
    * Scale shape: identical to [[rrfFuse]] — normalization windows are over
    * k·queries rows, the heavy lifting happened inside each retriever.
    */
  def linearFuse(text: DataFrame, knn: DataFrame, k: Int = 10,
      wText: Double = 2.0, wKnn: Double = 1.0): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
    def minmax(s: Column, mn: Column, mx: Column): Column =
      when(mx === mn, lit(1.0)).otherwise((s - mn) / (mx - mn))
    val tn = text
      .withColumn("nt", minmax(col("tscore"),
        min(col("tscore")).over(wq), max(col("tscore")).over(wq)))
      .select(col("query_id"), col("doc_id"), col("text_rank").as("tr"), col("nt"))
    val vn = knn
      .withColumn("nk", minmax(col("vscore"),
        min(col("vscore")).over(wq), max(col("vscore")).over(wq)))
      .select(col("query_id"), col("doc_id"), col("knn_rank").as("vr"), col("nk"))
    val fused = tn.join(vn, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("lin",
        lit(wText) * coalesce(col("nt"), lit(0.0)) +
          lit(wKnn) * coalesce(col("nk"), lit(0.0)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("lin").desc, col("doc_id").asc)
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("lin") + lit(1.0e-9), 6).as("lin"),
        coalesce(col("tr"), lit(0)).as("text_rank"),
        coalesce(col("vr"), lit(0)).as("knn_rank"))
  }

  // ---- global aggregation (ES `global` bucket) ----

  /** `global` agg, relational twin: per query, the match-set metrics next
    * to the SAME metrics over the WHOLE index — ES's `global: {}` bucket,
    * which escapes the query scope so a UI can show "matched vs all"
    * side by side. Metric = doc count + mean doclen; doclen sums are exact
    * longs, so the one double division is bit-stable without ordered
    * folds. The global side is ONE aggregation row broadcast back onto
    * queries — O(1) extra cost regardless of corpus size. Index twin:
    * [[IndexSearch.globalAgg]] (postings match set + docs-sidecar global).
    */
  def globalAgg(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val dl = TextOps.tokens(docs).groupBy("doc_id").agg(count(lit(1)).as("doclen"))
    val matched = matchedSet(docs, queries).join(dl, Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_matched"), sum("doclen").as("s_matched"))
    val global = dl.agg(count(lit(1)).as("n_global"), sum("doclen").as("s_global"))
    matched.crossJoin(broadcast(global))
      .select(col("query_id"), col("n_matched"), col("n_global"),
        (round(col("s_matched").cast("double") / col("n_matched") + lit(1.0e-9), 4) + lit(0.0))
          .as("avg_dl_matched"),
        (round(col("s_global").cast("double") / col("n_global") + lit(1.0e-9), 4) + lit(0.0))
          .as("avg_dl_global"))
  }

  /** Linear retriever, relational twin: exhaustive BM25 scores (kept raw,
    * not the rounded page) and exact request-vector cosines, each min-max
    * normalized over its top-window and combined 2:1. Index twin:
    * [[IndexSearch.linearHybrid]].
    */
  def linearHybrid(docs: DataFrame, emb: DataFrame, queries: Seq[(String, String)],
      k: Int = 10, wText: Double = 2.0, wKnn: Double = 1.0,
      window: Int = 10): DataFrame = {
    val wr = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    val text = Bm25Sql.scoredDocs(docs, queries)
      .withColumn("text_rank", row_number().over(wr))
      .filter(col("text_rank") <= window)
      .select(col("query_id"), col("doc_id"), col("text_rank"), col("score").as("tscore"))
    val knn = graft.ops.Similarity.cosineScored(emb, queryVectors(emb, queries), window)
      .withColumnRenamed("cosine_raw", "vscore")
    linearFuse(text, knn, k, wText, wKnn)
  }

  /** `_field_caps` (ES): per-field capability rows — the engine's mapping
    * (string column named `text` → analyzed `text`; other strings →
    * `keyword`; integral columns → `long`), whether the field is
    * searchable/aggregatable under that mapping, plus live value counts
    * (non-null and distinct) so the response reflects the actual table,
    * not just static metadata. One aggregation pass computes every
    * field's counts (no per-field scan); result cardinality = #columns.
    */
  def fieldCaps(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fields = docs.schema.fields.map { f =>
      val esType = f.dataType match {
        case org.apache.spark.sql.types.StringType =>
          if (f.name == "text") "text" else "keyword"
        case org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.IntegerType => "long"
        case _ => "unsupported"
      }
      // an unmapped type is neither searchable nor aggregatable — claiming
      // capabilities for a column the engine cannot query would desync the
      // capability surface from reality (and from the oracle derivation)
      (f.name, esType, esType != "unsupported", esType != "text" && esType != "unsupported")
    }.toSeq
    val caps = fields.toDF("field", "es_type", "searchable", "aggregatable")
    val counts = docs.agg(
      fields.flatMap { case (name, _, _, _) =>
        Seq(count(col(name)).as(s"nv_$name"),
          count_distinct(col(name)).as(s"nd_$name"))
      }.head, fields.flatMap { case (name, _, _, _) =>
        Seq(count(col(name)).as(s"nv_$name"),
          count_distinct(col(name)).as(s"nd_$name"))
      }.tail: _*)
    val cRow = counts.head()
    val countRows = fields.map { case (name, _, _, _) =>
      (name, cRow.getAs[Long](s"nv_$name"), cRow.getAs[Long](s"nd_$name"))
    }.toDF("field", "n_values", "n_distinct")
    caps.join(countRows, Seq("field"))
  }

  /** `_msearch` request fixture: (request_id, query text, per-request size)
    * — mixed sizes, one request with an absent term.
    */
  val MsearchRequests: Seq[(String, String, Int)] = Seq(
    ("r1", "spark query", 5), ("r2", "hash join merge sort", 3),
    ("r3", "missingzzz the", 7))

  /** `_msearch` (ES): several independent search requests answered in one
    * pass, each with its own size. All requests score in ONE shared
    * scoredDocs plan (the per-request term tables union into a single
    * broadcast — exactly why _msearch exists: amortize the scatter), then
    * one window ranks and each request keeps its own k. Emits
    * (request_id, rank, doc_id, score).
    */
  def msearch(docs: DataFrame,
      requests: Seq[(String, String, Int)] = MsearchRequests): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ks = requests.map { case (rid, _, k) => (rid, k) }.toDF("query_id", "k")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, requests.map { case (rid, q, _) => (rid, q) })
      .withColumn("rank", row_number().over(w))
      .join(broadcast(ks), Seq("query_id"))
      .filter(col("rank") <= col("k"))
      .select(col("query_id").as("request_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** Search-template fixtures: a mustache template, its parameter map, and
    * the sizes — two render cases (param present; param defaulted through
    * `{{^x}}` else-section).
    */
  val Templates: Seq[(String, String, Map[String, String], Int)] = Seq(
    ("st1", "spark {{what}} {{how}}", Map("what" -> "query", "how" -> "scan"), 5),
    ("st2", "hash {{op}}{{^op}}join{{/op}} merge", Map.empty, 4))

  /** Renders the mustache subset ES search templates actually use for
    * query strings: `{{var}}` substitution and the `{{^var}}default{{/var}}`
    * inverted section (emitted only when `var` is absent). Deterministic
    * pure-string work on the driver — the query TEXT is what's templated;
    * execution is the ordinary search path.
    */
  def renderTemplate(template: String, params: Map[String, String]): String = {
    val inverted = "\\{\\{\\^([a-zA-Z0-9_]+)\\}\\}(.*?)\\{\\{/\\1\\}\\}".r
    val variable = "\\{\\{([a-zA-Z0-9_]+)\\}\\}".r
    val afterInv = inverted.replaceAllIn(template, m =>
      if (params.contains(m.group(1))) "" else java.util.regex.Matcher.quoteReplacement(m.group(2)))
    variable.replaceAllIn(afterInv, m =>
      java.util.regex.Matcher.quoteReplacement(params.getOrElse(m.group(1), "")))
  }

  /** `_search/template` (ES): render each template with its params, then
    * run the rendered query through the standard ranked search. Emits
    * (template_id, rank, doc_id, score) with per-template size.
    */
  def searchTemplate(docs: DataFrame,
      templates: Seq[(String, String, Map[String, String], Int)] = Templates): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rendered = templates.map { case (tid, tpl, params, _) =>
      (tid, renderTemplate(tpl, params))
    }
    val ks = templates.map { case (tid, _, _, k) => (tid, k) }.toDF("query_id", "k")
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredDocs(docs, rendered)
      .withColumn("rank", row_number().over(w))
      .join(broadcast(ks), Seq("query_id"))
      .filter(col("rank") <= col("k"))
      .select(col("query_id").as("template_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** combined_fields (ES 8): term-centric multi-field BM25 — the fields
    * are blended into ONE pseudo-field before scoring (Lucene's
    * CombinedFieldQuery / simplified BM25F with equal weights): per (term,
    * doc) the tf is the SUM of field tfs, the doc length is the SUM of
    * field lengths, df counts docs where the term appears in ANY field,
    * and avgdl averages the combined length. Contrast multi_match
    * best_fields ([[multiMatchTopK]]), which scores each field as its own
    * corpus and combines SCORES — combined_fields combines STATISTICS.
    * The relational twin simply unions the two fields' token streams and
    * reuses the exact-BM25 engine; the index twin
    * ([[IndexSearch.combinedFieldsTopK]]) reconstructs the same combined
    * statistics from the two per-field inverted indexes.
    */
  def combinedFieldsTopK(docs: DataFrame,
      queries: Seq[(String, String)] = MultiQueries, k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val combined = docs.select(col("doc_id"), col("text"))
      .union(docs.select(col("doc_id"), col("source").cast("string").as("text")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    Bm25Sql.scoredFromTermTable(combined, q, "query_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }
}
