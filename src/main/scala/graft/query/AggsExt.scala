package graft.query

import graft.ops.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extended ES aggregation-DSL surface: metric aggs (extended_stats,
  * weighted_avg, value_count/missing, string_stats, top_metrics), bucket
  * aggs (multi_terms, rare_terms, adjacency_matrix), and the pipeline-agg
  * family (cumulative_sum, derivative, moving average, bucket_selector,
  * bucket_sort) — the rest of the `_search` aggregations a reference user
  * reaches once the basics (SearchOps) are in place. The reference
  * delegates all of these to Elasticsearch wholesale
  * (/root/reference/monstache.go:46 — the ES client is the only query
  * surface); here each is a declarative Catalyst plan with a DuckDB-checked
  * oracle twin.
  *
  * Numeric discipline (FP-parity with the oracle, same as SearchOps):
  * every inner aggregate is exact integer (count/sum/min/max over longs);
  * doubles appear only in a final projection written as the identical
  * expression in the SQL oracle, then `round(x + 1e-9, 4) + 0.0`.
  *
  * Scale shape: everything rides [[SearchOps.matchedSet]] (uniform token
  * keys, broadcast query table) followed by one aggregation on
  * (query_id[, bucket]) keys — result cardinality queries × buckets, no
  * all-pairs, no driver loops. Window functions partition by query_id
  * (≤ queries × buckets rows by then), never over raw docs.
  */
object AggsExt {

  /** extended_stats (ES): stats + sum_of_squares / variance / std_deviation
    * of a numeric doc-values field over each query's match set. Population
    * variance, derived from the exact integer (sum, sum_sq, n) triple in
    * one double projection — the same derivation ES documents
    * (sum_of_squares/n − avg²), bit-identical to the oracle because the
    * operands are exact longs.
    */
  def extendedStats(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame = {
    val avg = col("sum_chars").cast("double") / col("n_docs")
    val varPop = col("sum_sq").cast("double") / col("n_docs") - avg * avg
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_chars"), max(col(field)).as("max_chars"),
        sum(col(field)).as("sum_chars"),
        sum(col(field) * col(field)).as("sum_sq"))
      .withColumn("avg_chars", round(avg + lit(1.0e-9), 4) + lit(0.0))
      .withColumn("var_pop", round(varPop + lit(1.0e-9), 4) + lit(0.0))
      .withColumn("std_dev", round(sqrt(varPop) + lit(1.0e-9), 4) + lit(0.0))
  }

  /** weighted_avg (ES): value = the numeric field, weight = a second
    * per-doc column (here a deterministic small weight derived from doc_id
    * so the harness table needs no extra column; a real pipeline passes any
    * numeric column). Exact integer numerator/denominator, one division.
    */
  def weightedAvg(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame = {
    val w = col("doc_id") % 7 + 1
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("w", w)
      .groupBy("query_id")
      .agg(sum(col(field) * col("w")).as("num"), sum(col("w")).as("den"))
      .select(col("query_id"),
        (round(col("num").cast("double") / col("den") + lit(1.0e-9), 4) + lit(0.0))
          .as("weighted_avg"))
  }

  /** value_count + missing (ES): docs in the match set where an optional
    * field is present vs missing. The harness table has no nullable column,
    * so presence is derived (`nullif(lang,'en')` — 'en' docs "miss" the
    * field); the aggregation shape (count(col) vs count(*) − count(col))
    * is the operator under test.
    */
  def valueCountMissing(docs: DataFrame, queries: Seq[(String, String)]): DataFrame =
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .withColumn("opt", nullif(col("lang"), lit("en")))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"), count(col("opt")).as("value_count"))
      .withColumn("n_missing", col("n_docs") - col("value_count"))

  /** multi_terms (ES): top-n composite (lang, source) buckets per query by
    * doc count, ties broken by the key tuple ascending (the ES ordering).
    */
  def multiTerms(docs: DataFrame, queries: Seq[(String, String)],
      n: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").desc, col("lang").asc, col("source").asc)
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .groupBy("query_id", "lang", "source")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select("query_id", "rank", "lang", "source", "n_docs")
  }

  /** rare_terms (ES): the long tail — terms of the match set whose
    * foreground doc count is at or below a cutoff, rarest first. ES takes an
    * absolute `max_doc_count`; here the cutoff scales with the match set
    * (max(1, fg_n/10) — the harness vocabulary is dense, every term matches
    * ≥3% of docs, so a tighter cutoff would select nothing) so the query is
    * meaningful at every sf, and the
    * result is capped at the n rarest (count asc, term asc) so the oracle
    * row set is bounded. Same fg-incidence join as significant_terms.
    */
  def rareTerms(docs: DataFrame, queries: Seq[(String, String)],
      n: Int = 10): DataFrame = {
    val m = SearchOps.matchedSet(docs, queries)
    val fgN = m.groupBy("query_id").agg(count(lit(1)).as("fg_n"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").asc, col("term").asc)
    m.join(TextOps.tokens(docs).select("doc_id", "term").distinct(), Seq("doc_id"))
      .groupBy("query_id", "term")
      .agg(count(lit(1)).as("n_docs"))
      .join(broadcast(fgN), Seq("query_id"))
      .filter(col("n_docs") <= greatest(lit(1L), expr("fg_n DIV 10")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select("query_id", "rank", "term", "n_docs")
  }

  /** The named filters for adjacency_matrix — (key, predicate-SQL) pairs;
    * the SQL string doubles as the oracle predicate so both sides stay
    * pinned to one definition.
    */
  val AdjacencyFilters: Seq[(String, String)] = Seq(
    "en" -> "lang = 'en'",
    "zh" -> "lang = 'zh'",
    "long" -> "n_chars >= 350")

  /** adjacency_matrix (ES): doc counts for each named filter and each
    * pairwise intersection ("a&b" keys) over the match set. Implementation:
    * one narrow pass tags each matched doc with its filter keys (explode of
    * a when-array — no per-filter scan), then a doc_id self-join (unique
    * key, uniform) forms the upper-triangle pairs, one aggregation counts.
    */
  def adjacencyMatrix(docs: DataFrame, queries: Seq[(String, String)],
      filters: Seq[(String, String)] = AdjacencyFilters): DataFrame = {
    val keyArr = array(filters.map { case (k, pred) =>
      when(expr(pred), lit(k)).otherwise(lit(null))
    }: _*)
    val tagged = SearchOps.matchedSet(docs, queries)
      .join(docs, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), explode(keyArr).as("key"))
      .filter(col("key").isNotNull)
    val a = tagged.select(col("query_id"), col("doc_id"), col("key").as("ka"))
    val b = tagged.select(col("query_id"), col("doc_id"), col("key").as("kb"))
    a.join(b, Seq("query_id", "doc_id"))
      .filter(col("ka") <= col("kb"))
      .withColumn("key",
        when(col("ka") === col("kb"), col("ka"))
          .otherwise(concat(col("ka"), lit("&"), col("kb"))))
      .groupBy("query_id", "key")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** bucket_selector + bucket_sort (ES pipeline aggs): a terms aggregation
    * on `source` per query, buckets kept only where the bucket's average
    * field value clears a threshold (bucket_selector script), then sorted
    * by doc count and truncated (bucket_sort). The HAVING compare runs on
    * the unrounded exact-long division — identical in both engines.
    */
  def bucketSelector(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars", minAvg: Double = 250.0, n: Int = 3): DataFrame = {
    val avg = col("sum_chars").cast("double") / col("n_docs")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").desc, col("source").asc)
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("source"), col(field)), Seq("doc_id"))
      .groupBy("query_id", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col(field)).as("sum_chars"))
      .filter(avg > minAvg)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("query_id"), col("rank"), col("source"), col("n_docs"),
        (round(avg + lit(1.0e-9), 4) + lit(0.0)).as("avg_chars"))
  }

  /** cumulative_sum + derivative + moving average (ES pipeline aggs) over
    * the date_histogram: per query ordered by day, the running doc total,
    * the day-over-day delta (null on the first bucket, as ES emits), and a
    * 3-bucket trailing mean. The windows partition by query_id over bucket
    * rows (≤ queries × days), never over docs.
    */
  def pipelineAggs(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val byDay = Window.partitionBy(col("query_id")).orderBy(col("day").asc)
    val mov = byDay.rowsBetween(-2, 0)
    SearchOps.dateHistogram(docs, queries)
      .withColumn("cum_docs", sum(col("n_docs")).over(byDay))
      .withColumn("deriv", col("n_docs") - lag(col("n_docs"), 1).over(byDay))
      .withColumn("mov3",
        round(sum(col("n_docs")).over(mov).cast("double")
          / count(lit(1)).over(mov) + lit(1.0e-9), 4) + lit(0.0))
  }

  /** cumulative_cardinality (ES pipeline agg on a date_histogram +
    * cardinality sub-agg): per (event_type, day), the running count of
    * DISTINCT users seen so far. Computed exactly without any per-bucket
    * distinct-union: a user contributes to the cumulative count on their
    * FIRST day only, so one (type, user) min-day aggregation + one count
    * per (type, first-day) + one running sum over bucket rows
    * (≤ types × days) replaces ES's approximate HLL union — exact AND
    * cheaper. `new_users` is ES's `incremental` flavor of the same agg.
    */
  def cumulativeCardinality(ev: DataFrame): DataFrame = {
    val byDay = Window.partitionBy(col("event_type")).orderBy(col("day").asc)
    ev.select(col("event_type"), col("user_id"),
        date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
      .groupBy("event_type", "user_id")
      .agg(min(col("day")).as("day"))
      .groupBy("event_type", "day")
      .agg(count(lit(1)).as("new_users"))
      .withColumn("cum_users", sum(col("new_users")).over(byDay))
      .select("event_type", "day", "new_users", "cum_users")
  }

  /** top_metrics (ES): per query, the metric columns of the top-k docs
    * under an explicit sort (field desc, doc_id asc tiebreak) — argmax
    * without a full sort, one window over the match set.
    */
  def topMetrics(docs: DataFrame, queries: Seq[(String, String)],
      k: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("n_chars"), col("source")), Seq("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "n_chars", "source")
  }

  /** string_stats (ES, `show_distribution` flavor): count / min / max / avg
    * length of the field over the match set, plus Shannon entropy of the
    * character distribution. Lengths are exact longs; entropy folds the
    * per-character counts in character order (sort_array → aggregate) so
    * the double sum is order-pinned and matches the oracle's
    * `sum(... ORDER BY ch)` bit-for-bit. Char histograms combine map-side;
    * the collect_list holds ≤ |alphabet| entries per query, never docs.
    */
  def stringStats(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val m = SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
    val lenStats = m.groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        min(length(col("text"))).cast("long").as("min_len"),
        max(length(col("text"))).cast("long").as("max_len"),
        sum(length(col("text"))).as("sum_len"))
      .withColumn("avg_len",
        round(col("sum_len").cast("double") / col("n_docs") + lit(1.0e-9), 4) + lit(0.0))
    val chars = m
      .select(col("query_id"), explode(split(col("text"), "")).as("ch"))
      .filter(col("ch") =!= "")
      .groupBy("query_id", "ch")
      .agg(count(lit(1)).as("cnt"))
    val ent = chars.groupBy("query_id")
      .agg(sum(col("cnt")).as("total"),
        sort_array(collect_list(struct(col("ch"), col("cnt")))).as("hist"))
      .select(col("query_id"),
        (round(expr(
          "aggregate(hist, 0.0D, (acc, x) -> acc - (x.cnt / CAST(total AS DOUBLE)) * log2(x.cnt / CAST(total AS DOUBLE)))")
          + lit(1.0e-9), 4) + lit(0.0)).as("entropy"))
    lenStats.join(ent, Seq("query_id"))
      .select("query_id", "n_docs", "min_len", "max_len", "sum_len", "avg_len", "entropy")
  }

  /** matrix_stats (ES): pairwise count / mean / variance / covariance /
    * correlation between two numeric per-doc fields over the match set
    * (here `n_chars` × token count). All inner aggregates are exact long
    * sums (sumA, sumB, sumA², sumB², sumAB); the moments derive in one
    * double projection written identically in the oracle.
    */
  def matrixStats(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val a = col("n_chars")
    val b = col("doclen")
    val n = col("n_docs")
    val meanA = col("sum_a").cast("double") / n
    val meanB = col("sum_b").cast("double") / n
    val varA = col("sum_a2").cast("double") / n - meanA * meanA
    val varB = col("sum_b2").cast("double") / n - meanB * meanB
    val cov = col("sum_ab").cast("double") / n - meanA * meanB
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), a), Seq("doc_id"))
      .join(TextOps.doclens(docs), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(a).as("sum_a"), sum(b).as("sum_b"),
        sum(a * a).as("sum_a2"), sum(b * b).as("sum_b2"),
        sum(a * b).as("sum_ab"))
      .select(col("query_id"), n,
        (round(meanA + lit(1.0e-9), 4) + lit(0.0)).as("mean_a"),
        (round(meanB + lit(1.0e-9), 4) + lit(0.0)).as("mean_b"),
        (round(varA + lit(1.0e-9), 4) + lit(0.0)).as("var_a"),
        (round(varB + lit(1.0e-9), 4) + lit(0.0)).as("var_b"),
        (round(cov + lit(1.0e-9), 4) + lit(0.0)).as("covariance"),
        (round(cov / sqrt(varA * varB) + lit(1.0e-9), 4) + lit(0.0)).as("correlation"))
  }

  /** boxplot + median_absolute_deviation (ES): five-number summary of a
    * numeric field over the match set plus the MAD. Quantiles use linear
    * interpolation at rank (n−1)p — Spark's exact `percentile` and DuckDB's
    * `quantile_cont` share the definition, and interpolation of integer
    * operands at p ∈ {.25,.5,.75} is exact in binary, so the doubles match
    * bit-for-bit. MAD is a second pass over |x − median|.
    */
  def boxplot(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame = {
    val m = SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
    val quart = m.groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_v"), max(col(field)).as("max_v"),
        expr(s"percentile($field, 0.25)").as("q1"),
        expr(s"percentile($field, 0.5)").as("q2"),
        expr(s"percentile($field, 0.75)").as("q3"))
    val mad = m.join(quart.select(col("query_id"), col("q2")), Seq("query_id"))
      .groupBy("query_id")
      .agg(expr(s"percentile(abs($field - q2), 0.5)").as("mad_raw"))
    quart.join(mad, Seq("query_id"))
      .select(col("query_id"), col("n_docs"), col("min_v"), col("max_v"),
        (round(col("q1") + lit(1.0e-9), 4) + lit(0.0)).as("q1"),
        (round(col("q2") + lit(1.0e-9), 4) + lit(0.0)).as("q2"),
        (round(col("q3") + lit(1.0e-9), 4) + lit(0.0)).as("q3"),
        (round(col("mad_raw") + lit(1.0e-9), 4) + lit(0.0)).as("mad"))
  }

  /** max_bucket / min_bucket / sum_bucket / avg_bucket (ES sibling pipeline
    * aggs) over a terms aggregation on `source`: one row per query with the
    * extreme buckets (ties broken by key ascending, the ES multi-key order)
    * and the sum/avg across buckets. Bucket rows per query ≤ |sources|, so
    * the windows are tiny.
    */
  def bucketStats(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val b = SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("query_id", "source")
      .agg(count(lit(1)).as("n_docs"))
    val wMax = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").desc, col("source").asc)
    val wMin = Window.partitionBy(col("query_id"))
      .orderBy(col("n_docs").asc, col("source").asc)
    b.withColumn("rmax", row_number().over(wMax))
      .withColumn("rmin", row_number().over(wMin))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("n_docs")).as("sum_docs"),
        max(when(col("rmax") === 1, col("source"))).as("max_key"),
        max(when(col("rmax") === 1, col("n_docs"))).as("max_docs"),
        max(when(col("rmin") === 1, col("source"))).as("min_key"),
        max(when(col("rmin") === 1, col("n_docs"))).as("min_docs"))
      .withColumn("avg_docs",
        round(col("sum_docs").cast("double") / col("n_buckets") + lit(1.0e-9), 4) + lit(0.0))
  }

  /** serial_diff (lag 7) + normalize (rescale_0_1) pipeline aggs over the
    * date_histogram: per (query, day), the week-over-week delta (null for
    * the first 7 buckets, as ES emits) and the count rescaled into [0,1]
    * over the query's bucket range (null when max == min, div-by-zero
    * guarded identically in the oracle).
    */
  def serialDiffNormalize(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val byDay = Window.partitionBy(col("query_id")).orderBy(col("day").asc)
    val all = Window.partitionBy(col("query_id"))
    SearchOps.dateHistogram(docs, queries)
      .withColumn("sdiff7", col("n_docs") - lag(col("n_docs"), 7).over(byDay))
      .withColumn("norm01",
        round((col("n_docs") - min(col("n_docs")).over(all)).cast("double") /
          nullif((max(col("n_docs")).over(all) - min(col("n_docs")).over(all)).cast("double"), lit(0.0))
          + lit(1.0e-9), 4) + lit(0.0))
  }

  /** rank_feature query + min_score (ES): BM25 relevance multiplied by the
    * saturation function `x / (x + pivot)` of a per-doc numeric feature
    * (ES `rank_feature` with `saturation`, default-style pivot), hits below
    * `min_score` dropped BEFORE ranking (the ES `min_score` contract), then
    * top-k. Relational twin of [[IndexSearch.rankFeature]] — both share the
    * exact ordered-fold BM25, so the min_score compare sees bit-identical
    * doubles.
    */
  def rankFeatureTopK(docs: DataFrame, queries: Seq[(String, String)],
      pivot: Double = 250.0, minScore: Double = 1.0, k: Int = 10): DataFrame =
    rankFeatureTail(
      Bm25Sql.scoredDocs(docs, queries).select("query_id", "doc_id", "score"),
      docs, pivot, minScore, k)

  /** Shared saturation-boost + min_score + top-k tail over any
    * (query_id, doc_id, score) relation (relational or index-served).
    */
  private[query] def rankFeatureTail(scored: DataFrame, docs: DataFrame,
      pivot: Double, minScore: Double, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score2").desc, col("doc_id").asc)
    scored
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .withColumn("score2",
        col("score") * (col("n_chars") / (col("n_chars") + lit(pivot))))
      .filter(col("score2") >= minScore)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (round(col("score2"), 4) + lit(0.0)).as("score"))
  }

  /** sampler / diversified_sampler aggregations (ES): restrict a sub-agg
    * (here a lang terms agg) to the `shard_size` best-scoring hits; the
    * diversified variant first caps hits per `source` value at
    * `maxPerValue` (ES `max_docs_per_value`). Deterministic ranking
    * (exact BM25 desc, doc_id asc), so the sample — and therefore the
    * sub-agg — is oracle-exact. Shared tail for the relational and
    * index-served twins.
    */
  private[query] def samplerTail(scored: DataFrame, docs: DataFrame,
      shardSize: Int, maxPerValue: Option[Int]): DataFrame = {
    val base = scored.join(
      docs.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
    val diversified = maxPerValue.fold(base) { cap =>
      val wSrc = Window.partitionBy(col("query_id"), col("source"))
        .orderBy(col("score").desc, col("doc_id").asc)
      base.withColumn("src_rank", row_number().over(wSrc))
        .filter(col("src_rank") <= cap)
    }
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    diversified
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= shardSize)
      .groupBy("query_id", "lang")
      .agg(count(lit(1)).as("n_docs"))
  }

  def samplerAgg(docs: DataFrame, queries: Seq[(String, String)],
      shardSize: Int = 20): DataFrame =
    samplerTail(Bm25Sql.scoredDocs(docs, queries)
      .select("query_id", "doc_id", "score"), docs, shardSize, None)

  def diversifiedSamplerAgg(docs: DataFrame, queries: Seq[(String, String)],
      shardSize: Int = 20, maxPerValue: Int = 3): DataFrame =
    samplerTail(Bm25Sql.scoredDocs(docs, queries)
      .select("query_id", "doc_id", "score"), docs, shardSize, Some(maxPerValue))

  /** distance_feature query (ES): relevance boosted by closeness of a
    * numeric field to an origin — `pivot / (pivot + |x − origin|)` ADDED to
    * the BM25 score (the ES bool-sum contract), then top-k. Shared tail;
    * both twins see bit-identical doubles.
    */
  private[query] def distanceFeatureTail(scored: DataFrame, docs: DataFrame,
      origin: Long, pivot: Double, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score2").desc, col("doc_id").asc)
    scored
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .withColumn("score2",
        col("score") + lit(pivot) / (lit(pivot) + abs(col("n_chars") - lit(origin)).cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        (round(col("score2"), 4) + lit(0.0)).as("score"))
  }

  def distanceFeatureTopK(docs: DataFrame, queries: Seq[(String, String)],
      origin: Long = 300L, pivot: Double = 50.0, k: Int = 10): DataFrame =
    distanceFeatureTail(Bm25Sql.scoredDocs(docs, queries)
      .select("query_id", "doc_id", "score"), docs, origin, pivot, k)

  /** pinned-query fixture: ids promoted (in this order) ahead of organic
    * relevance for every query — mirrored as literals in the oracle.
    */
  val PinnedIds: Seq[Long] = Seq(3L, 1L, 7L)

  /** pinned query (ES `pinned`): the given ids rank first in their given
    * order regardless of relevance (score null, as ES's synthetic
    * pinned scores are not comparable), organic BM25 hits follow with the
    * pinned ids excluded; `k` bounds the TOTAL ranks. Shared tail for the
    * relational and index-served twins.
    */
  private[query] def pinnedTail(scored: DataFrame, queries: Seq[(String, String)],
      pinnedIds: Seq[Long], k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val p = queries.map(_._1)
      .flatMap(q => pinnedIds.zipWithIndex.map { case (id, i) => (q, i + 1, id) })
      .toDF("query_id", "rank", "doc_id")
      .select(col("query_id"), col("rank"), col("doc_id"),
        lit(true).as("is_pinned"), lit(null).cast("double").as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score0").desc, col("doc_id").asc)
    val organic = scored.withColumnRenamed("score", "score0")
      .filter(!col("doc_id").isin(pinnedIds: _*))
      .withColumn("rank", row_number().over(w) + lit(pinnedIds.size))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        lit(false).as("is_pinned"),
        (round(col("score0"), 4) + lit(0.0)).as("score"))
    p.unionByName(organic)
  }

  def pinnedTopK(docs: DataFrame, queries: Seq[(String, String)],
      pinnedIds: Seq[Long] = PinnedIds, k: Int = 10): DataFrame =
    pinnedTail(Bm25Sql.scoredDocs(docs, queries)
      .select("query_id", "doc_id", "score"), queries, pinnedIds, k)

  /** auto_date_histogram (ES): the engine picks the coarsest-necessary
    * calendar interval so the bucket count fits `target` — ladder pinned to
    * 1d/7d/30d over the harness crawl-day derivation. Selection is a
    * per-query aggregate (three distinct-counts), then one aggregation at
    * the chosen granularity; the tiny choice table broadcasts.
    */
  def autoDateHistogram(docs: DataFrame, queries: Seq[(String, String)],
      target: Int = 10): DataFrame = {
    val m = SearchOps.matchedSet(docs, queries)
      .withColumn("d", expr("CAST((doc_id * 786413 % 5184000) DIV 86400 AS INT)"))
    val choice = m.groupBy("query_id")
      .agg(count_distinct(col("d")).as("n_day"),
        count_distinct(expr("d DIV 7")).as("n_week"),
        count_distinct(expr("d DIV 30")).as("n_month"))
      .withColumn("ival",
        when(col("n_day") <= target, lit("1d"))
          .when(col("n_week") <= target, lit("7d"))
          .otherwise(lit("30d")))
      .select("query_id", "ival")
    m.join(broadcast(choice), Seq("query_id"))
      .withColumn("bucket",
        when(col("ival") === "1d", col("d"))
          .when(col("ival") === "7d", expr("d DIV 7"))
          .otherwise(expr("d DIV 30")).cast("long"))
      .groupBy("query_id", "ival", "bucket")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** date_range aggregation (ES `date_range`): matched docs bucketed by
    * half-open [from, to) calendar ranges over the crawl-day derivation —
    * from inclusive, to exclusive, open ends allowed, and (unlike
    * `histogram`) ranges MAY overlap, so a doc lands in every range that
    * contains it: the tiny range table broadcasts, containment is one
    * narrow filter, then one aggregation. Result cardinality =
    * queries × ranges.
    */
  val DateRanges: Seq[(String, Option[String], Option[String])] = Seq(
    ("early", None, Some("2025-01-20")),
    ("mid", Some("2025-01-20"), Some("2025-02-10")),
    ("late", Some("2025-02-10"), None),
    ("jan", Some("2025-01-01"), Some("2025-02-01")))

  def dateRangeAgg(docs: DataFrame, queries: Seq[(String, String)],
      ranges: Seq[(String, Option[String], Option[String])] = DateRanges): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = ranges.map { case (k, f, t) => (k, f.orNull, t.orNull) }
      .toDF("key", "from_day", "to_day")
    SearchOps.matchedSet(docs, queries)
      .withColumn("day", SearchOps.crawlDay)
      .crossJoin(broadcast(r))
      .filter((col("from_day").isNull || col("day") >= col("from_day")) &&
        (col("to_day").isNull || col("day") < col("to_day")))
      .groupBy("query_id", "key")
      .agg(count(lit(1)).as("n_docs"))
  }

  /** percentile_ranks (ES): for each probe value, the percentage of matched
    * docs whose field value is ≤ the probe — the exact CDF definition (ES
    * approximates it with a t-digest; the exact rank is this engine's
    * semantic AND its oracle). One aggregation down to queries rows, then a
    * constant-width unpivot — probes are literals, never a data shuffle.
    */
  def percentileRanks(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars",
      probes: Seq[Long] = Seq(500L, 1500L, 3000L)): DataFrame = {
    val aggs = probes.map(v =>
      sum(when(col(field) <= v, 1L).otherwise(0L)).as(s"le_$v"))
    val base = SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
    probes.map { v =>
      base.select(col("query_id"), lit(v).as("value"),
        (round(col(s"le_$v").cast("double") * 100.0 / col("n_docs")
          + lit(1.0e-9), 4) + lit(0.0)).as("pct_rank"))
    }.reduce(_ unionAll _)
  }

  /** bucket_script + percentiles_bucket (ES pipeline aggs): per
    * calendar-day bucket, metrics DERIVED from sibling bucket metrics —
    * `avg_chars` (sum_chars / n_docs, the bucket_script ratio), the
    * bucket's share of the query's total docs (bucket_script against a
    * sum_bucket), and the query-level exact-interpolated median of the
    * per-day doc counts (percentiles_bucket, p50). All windows/aggregates
    * run over queries × days rows — never over raw docs.
    */
  def bucketScript(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val perQ = Window.partitionBy(col("query_id"))
    val buckets = SearchOps.matchedSet(docs, queries)
      .withColumn("day", SearchOps.crawlDay)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy("query_id", "day")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val med = buckets.groupBy("query_id")
      .agg(expr("percentile(n_docs, 0.5)").as("med_raw"))
      .select(col("query_id"),
        (round(col("med_raw") + lit(1.0e-9), 4) + lit(0.0)).as("p50_docs"))
    buckets
      .withColumn("avg_chars",
        round(col("sum_chars").cast("double") / col("n_docs") + lit(1.0e-9), 4) + lit(0.0))
      .withColumn("pct_of_total",
        round(col("n_docs").cast("double") * 100.0 / sum(col("n_docs")).over(perQ)
          + lit(1.0e-9), 4) + lit(0.0))
      .join(broadcast(med), Seq("query_id"))
  }

  /** t_test aggregation (ES, type `heteroscedastic` — Welch's unpaired):
    * the t statistic of the field between two disjoint populations of each
    * query's match set (lang = 'en' vs the rest). Exact integer
    * (n, sum, sum_sq) per side in ONE aggregation pass, sample variance
    * (n − 1), one double projection — the textbook Welch formula. A side
    * with < 2 docs yields NULL (ES returns null there too).
    */
  def tTest(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame = {
    val en = col("lang") === "en"
    val g = SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col("lang"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(
        sum(when(en, 1L).otherwise(0L)).as("n_a"),
        sum(when(en, col(field)).otherwise(0L)).as("sum_a"),
        sum(when(en, col(field) * col(field)).otherwise(0L)).as("sq_a"),
        sum(when(!en, 1L).otherwise(0L)).as("n_b"),
        sum(when(!en, col(field)).otherwise(0L)).as("sum_b"),
        sum(when(!en, col(field) * col(field)).otherwise(0L)).as("sq_b"))
    val meanA = col("sum_a").cast("double") / col("n_a")
    val meanB = col("sum_b").cast("double") / col("n_b")
    val varA = (col("sq_a").cast("double") - col("sum_a").cast("double") * col("sum_a") / col("n_a")) / (col("n_a") - 1)
    val varB = (col("sq_b").cast("double") - col("sum_b").cast("double") * col("sum_b") / col("n_b")) / (col("n_b") - 1)
    val t = (meanA - meanB) / sqrt(varA / col("n_a") + varB / col("n_b"))
    g.select(col("query_id"), col("n_a"), col("n_b"),
      when(col("n_a") >= 2 && col("n_b") >= 2,
        round(t + lit(1.0e-9), 4) + lit(0.0)).as("t_stat"))
  }

  /** terms_set query (ES): docs containing at least `minMatch` distinct
    * terms of the query's term set — the relational twin of the index-served
    * variant (the index side filters [[IndexSearch.scoredMatches]] on its
    * `matched` column; this side counts over the (doc, term) distinct).
    */
  def termsSet(docs: DataFrame, queries: Seq[(String, String)],
      minMatch: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(q), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_matched"))
      .filter(col("n_matched") >= minMatch)
  }

  /** The derived per-doc event day shared by the date-bucketed aggs
    * (identical expression in the oracle SQL): a deterministic day index
    * in [0, 60) spread by the doc_id hash.
    */
  private[query] def dayIndex: org.apache.spark.sql.Column =
    expr("(doc_id * 786413 % 5184000) DIV 86400")

  /** rate aggregation (ES `rate`, unit = day, inside a weekly
    * date_histogram): matched docs bucketed by 7-day spans; per bucket the
    * doc-count rate and the sum(field) rate per day. Exact integer
    * numerators (count / sum of longs), one double division per output row
    * — queries × weeks rows, no corpus-sized window.
    */
  def rateAgg(docs: DataFrame, queries: Seq[(String, String)],
      field: String = "n_chars"): DataFrame =
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("week",
        expr("CAST(((doc_id * 786413 % 5184000) DIV 86400) DIV 7 AS BIGINT)"))
      .groupBy("query_id", "week")
      .agg(count(lit(1)).as("n_docs"), sum(col(field)).as("sum_chars"))
      .withColumn("rate_docs",
        round(col("n_docs").cast("double") / 7.0 + lit(1.0e-9), 4) + lit(0.0))
      .withColumn("rate_chars",
        round(col("sum_chars").cast("double") / 7.0 + lit(1.0e-9), 4) + lit(0.0))

  /** moving_percentiles pipeline agg (ES): the p50 of the daily doc-count
    * histogram over a trailing 3-bucket window. The window holds ≤ 3
    * values, so the percentile is computed EXACTLY (sorted window + linear
    * interpolation — the same R-7 rule DuckDB's quantile_cont and ES's
    * small-set TDigest reduce to). Window partitions are per query over
    * day-bucket rows (≤ queries × 60 rows), never over raw docs.
    */
  def movingPercentiles(docs: DataFrame, queries: Seq[(String, String)]): DataFrame = {
    val w3 = Window.partitionBy(col("query_id")).orderBy(col("day").asc)
      .rowsBetween(-2, Window.currentRow)
    val h = SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id")), Seq("doc_id"))
      .withColumn("day", dayIndex.cast("bigint"))
      .groupBy("query_id", "day")
      .agg(count(lit(1)).as("n_docs"))
    // exact p50 with linear interpolation over the ≤3 sorted window values:
    // idx = 0.5·(n−1); v[⌊idx⌋] + frac·(v[⌊idx⌋+1] − v[⌊idx⌋])
    val vs = sort_array(collect_list(col("n_docs")).over(w3))
    val n = size(vs)
    val idx = (n.cast("double") - lit(1.0)) * lit(0.5)
    val lo = floor(idx).cast("int")
    val frac = idx - lo.cast("double")
    val vLo = element_at(vs, lo + 1).cast("double")
    val vHi = element_at(vs, least(lo + 2, n)).cast("double")
    h.withColumn("mov_p50",
        round(vLo + frac * (vHi - vLo) + lit(1.0e-9), 4) + lit(0.0))
      .select("query_id", "day", "n_docs", "mov_p50")
  }

  /** random_sampler aggregation (ES): aggregate over a deterministic
    * probability-p subset of the match set and report the inverse-p
    * corrected estimate next to the sampled exact stats. The "random" hash
    * is a pinned multiplicative hash of doc_id (a real deployment seeds
    * xxhash64; the pinned form keeps the oracle dialect-exact) — one narrow
    * filter, no extra shuffle beyond the aggregation.
    */
  def randomSampler(docs: DataFrame, queries: Seq[(String, String)],
      permil: Int = 300, field: String = "n_chars"): DataFrame = {
    val keep = (col("doc_id") * lit(2654435761L)) % 1000 < permil
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .filter(keep)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_sampled"), sum(col(field)).as("sum_sampled"))
      .withColumn("est_total",
        round(col("n_sampled").cast("double") * 1000.0 / permil + lit(1.0e-9), 4) + lit(0.0))
      .withColumn("avg_sampled",
        round(col("sum_sampled").cast("double") / col("n_sampled") + lit(1.0e-9), 4) + lit(0.0))
  }

  /** variable_width_histogram (ES): k clusters of the matched docs' numeric
    * field. ES's online clustering is shard-local and approximate; the
    * deterministic semantics pinned here (and in the oracle) is
    * equal-frequency clustering — ntile(k) over (field, doc_id) order —
    * reported as per-cluster (min, max, avg, count). At 100 TB the window
    * becomes the one narrow percentile-boundary pass + broadcast-boundary
    * assignment (same outputs up to tie placement, which is exactly the
    * slack ES's own approximation claims); the ntile twin is the exact
    * small-scale contract.
    */
  def variableWidthHistogram(docs: DataFrame, queries: Seq[(String, String)],
      k: Int = 4, field: String = "n_chars"): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col(field).asc, col("doc_id").asc)
    SearchOps.matchedSet(docs, queries)
      .join(docs.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("cluster", ntile(k).over(w))
      .groupBy("query_id", "cluster")
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_chars"), max(col(field)).as("max_chars"),
        sum(col(field)).as("sum_chars"))
      .withColumn("avg_chars",
        round(col("sum_chars").cast("double") / col("n_docs") + lit(1.0e-9), 4) + lit(0.0))
      .drop("sum_chars")
  }

  /** frequent_item_sets aggregation (ES, size-2 itemsets): item pairs
    * co-occurring in at least ⌈minSupFrac · baskets⌉ baskets. ES targets
    * keyword "shopping basket" fields, so the harness basket is a user's
    * distinct event_type set (events table) — bounded item vocabulary,
    * basket-keyed aggregation. Scale shape: one distinct on (basket, item)
    * uniform keys, a per-basket O(L²) pair expansion with L ≤ |item
    * vocabulary|, one aggregation keyed by the pair; never an all-pairs
    * join across baskets. Emits (t1, t2, support) with t1 < t2.
    */
  def frequentItemSets(events: DataFrame, minSupFrac: Double = 0.2): DataFrame = {
    val items = events.select(col("user_id"), col("event_type")).distinct()
    val nBaskets = items.select("user_id").distinct().count()
    val minSup = math.ceil(nBaskets * minSupFrac).toLong
    val a = items.toDF("uid", "t1")
    val b = items.toDF("uid", "t2")
    a.join(b, Seq("uid"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSup)
  }

  /** categorize_text aggregation (ES): groups documents by a token-pattern
    * signature — the leading tokens of the lowercased text with digit runs
    * collapsed to '#' (ES's categorization similarly tokenizes and weights
    * away numerics). One narrow per-row derivation + one aggregation keyed
    * by the signature; result cardinality = distinct patterns.
    */
  def categorizeText(docs: DataFrame, nTokens: Int = 4): DataFrame = {
    val toks = filter(
      split(regexp_replace(lower(col("text")), "[0-9]+", "#"), "[^a-z0-9#]+"),
      t => t =!= "")
    docs
      .withColumn("signature", concat_ws(" ", slice(toks, 1, nTokens)))
      .groupBy("signature")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc"))
      .filter(col("n_docs") >= 2)
  }
}
