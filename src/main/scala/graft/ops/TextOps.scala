package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, all as
  * pure Catalyst column expressions (codegen'd, no UDFs) with exact DuckDB
  * SQL equivalents so every operator is driver-oracle-checkable.
  *
  * The tokenizer column is pinned to `split(lower(text), '[^a-z0-9]+')`
  * minus empties — the same semantics as `TextPrep.tokenize` (golden-tested
  * for parity in TextPrepSpec).
  */
object TextOps {

  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** (doc_id, term) token rows, empties filtered. */
  def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(lower(col("text")), "[^a-z0-9]+")).as("term"))
      .filter(col("term") =!= "")

  /** (doc_id, term, tf) + doclen. */
  def termFreqs(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  def doclens(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id").agg(count(lit(1)).as("doclen"))

  // -------------------------------------------------------- language ID

  /** Tiny deterministic stopword inventories per language — stopword-count
    * language ID is a standard heuristic; exact lists here are arbitrary
    * but frozen (must match the SQL oracle).
    */
  val StopwordsEn: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Stopword ratio against the English inventory: a quality/lang-id
    * feature column.
    */
  def stopwordRatio(docs: DataFrame): DataFrame = {
    val t = tokens(docs)
    t.groupBy("doc_id").agg(
      (sum(when(col("term").isin(StopwordsEn: _*), 1).otherwise(0)).cast("double") /
        count(lit(1)).cast("double")).as("stop_ratio"))
  }

  /** Quality scoring: length, punctuation density, stopword ratio, mean
    * token length — the standard cheap web-text quality features.
    */
  def qualityFeatures(docs: DataFrame): DataFrame = {
    val nChars = length(col("text")).cast("double")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.!?,;:]", ""))).cast("double")
    val base = docs.select(
      col("doc_id"),
      nChars.as("n_chars_obs"),
      (nPunct / nChars).as("punct_ratio"))
    val tok = tokens(docs).groupBy("doc_id").agg(
      count(lit(1)).cast("double").as("n_tokens"),
      avg(length(col("term")).cast("double")).as("mean_tok_len"),
      (sum(when(col("term").isin(StopwordsEn: _*), 1).otherwise(0)).cast("double") /
        count(lit(1)).cast("double")).as("stop_ratio"))
    base.join(tok, Seq("doc_id"))
      .withColumn("quality",
        round(
          least(col("n_tokens") / lit(64.0), lit(1.0)) * lit(0.4) +
            (lit(1.0) - least(col("punct_ratio") * lit(10.0), lit(1.0))) * lit(0.3) +
            least(col("stop_ratio") * lit(5.0), lit(1.0)) * lit(0.3) + lit(1.0e-9), 4))
  }

  /** GPT-2-style pre-tokenizer, restricted to lookahead-free syntax with
    * identical leftmost-first alternation semantics in Java regex and RE2:
    * optional-space-prefixed letter runs, digit runs, symbol runs, and
    * residual space runs. Counting matches of this pattern approximates a
    * BPE tokenizer's pre-split count — the standard cheap "LLM tokens"
    * estimate when the real vocab isn't on the cluster.
    */
  val BpeRe = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(filter(split(col("text"), " "), c => c =!= "")).cast("bigint").as("ws_tokens"),
      size(filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "")).cast("bigint").as("alnum_tokens"),
      length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast("bigint").as("symbol_tokens"),
      size(regexp_extract_all(lower(col("text")), lit(BpeRe), lit(0))).cast("bigint").as("bpe_tokens"))

  /** Top-k terms per document by tf·idf (idf = ln(N/df), N = docs with
    * tokens) — the keyword-extraction primitive. One shuffle joins tf
    * against the derived df table on uniform term keys; ranking is a
    * per-doc window. Ties break on term ascending so the ranking is total.
    */
  def topTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = termFreqs(docs)
    val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = doclens(docs).count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf_raw").desc, col("term").asc)
    tf.join(dfT, Seq("term"))
      .withColumn("tfidf_raw",
        col("tf").cast("double") * log(lit(n.toDouble) / col("df").cast("double")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("tfidf_raw") + lit(1.0e-9), 4).as("tfidf"))
  }

  /** Unigram-LM surprisal per document — the perplexity-style quality
    * signal (CCNet's LM filter with the corpus's own unigram model as the
    * reference LM): nll(d) = (Σ_t tf_t · −ln p(t)) / doclen, where
    * p(t) = corpus count / total tokens. High-surprisal docs are gibberish
    * or OOD; low-surprisal are boilerplate. FP parity with the oracle: the
    * per-doc sum is the ordered fold over ascending terms (the Bm25Sql
    * pattern), division and negation are exact.
    *
    * Scale shape: the unigram table is vocabulary-sized (joined on uniform
    * term keys), the scalar total rides a 1-row broadcast cross join, the
    * per-doc fold is one aggregation — no corpus-sized shuffle beyond the
    * tf pass the index build already does.
    */
  def unigramSurprisal(docs: DataFrame): DataFrame = {
    val tf = termFreqs(docs)
    val cnt = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val tot = cnt.agg(sum(col("cnt")).as("t"))
    val addend = -(col("tf").cast("double") * log(col("cnt").cast("double") / col("t").cast("double")))
    tf.join(cnt, Seq("term"))
      .crossJoin(broadcast(tot))
      .join(doclens(docs), Seq("doc_id"))
      .withColumn("addend", addend)
      .groupBy("doc_id", "doclen")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("addend")))),
        lit(0.0),
        (acc, x) => acc + x.getField("addend")).as("nllsum"))
      .select(col("doc_id"), col("doclen"),
        round(col("nllsum") / col("doclen").cast("double"), 4).as("nll"))
  }

  /** Exact NTILE deciles of document length — the corpus-audit report.
    *
    * Deliberately NOT a single-partition `Window.orderBy` (which would pull
    * the whole corpus through one task): the global row number comes from
    * the classic scalable two-pass pattern — range-repartition by
    * (doclen, doc_id), count per partition (O(partitions) to the driver),
    * then assign offsets per partition. Range boundaries vary with
    * sampling, but the tile assignment depends only on the global order,
    * which is total (doc_id tiebreak), so the output is deterministic. The
    * tile arithmetic reproduces SQL NTILE exactly: the first n%k tiles get
    * the extra row.
    */
  def lenDeciles(docs: DataFrame, tiles: Int = 10, parts: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // cache is scoped: the `tiles`-row result is materialized while the
    // cache is live, then released (no storage leak across driver calls)
    val dl = doclens(docs)
      .select(col("doc_id").cast("long"), col("doclen").cast("long"))
      .repartitionByRange(parts, col("doclen"), col("doc_id"))
      .sortWithinPartitions("doclen", "doc_id")
      .as[(Long, Long)].cache()
    try {
      val counts = dl.mapPartitions { it =>
        Iterator((org.apache.spark.TaskContext.getPartitionId(), it.size.toLong))
      }.collect().toMap
      val offsets = (0 until parts).scanLeft(0L)((acc, p) => acc + counts.getOrElse(p, 0L)).toArray
      val n = offsets.last
      val q = n / tiles
      val r = n % tiles
      val bOff = spark.sparkContext.broadcast(offsets)
      val out = dl.mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var rn = bOff.value(pid)
        it.map { case (docId, doclen) =>
          rn += 1
          val tile =
            if (rn <= r * (q + 1)) (rn - 1) / (q + 1) + 1
            else r + (rn - r * (q + 1) - 1) / math.max(q, 1L) + 1
          (tile.toInt, docId, doclen)
        }
      }.toDF("decile", "doc_id", "doclen")
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"), min("doclen").as("min_len"),
          max("doclen").as("max_len"), sum("doclen").as("sum_len"))
      spark.createDataFrame(java.util.Arrays.asList(out.collect(): _*), out.schema)
    } finally dl.unpersist()
  }

  /** Document fingerprint: md5 over the sorted distinct token set — an
    * order-insensitive content fingerprint (dedup key robust to shuffling).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    tokens(docs).groupBy("doc_id")
      .agg(md5(concat_ws(" ", array_sort(collect_set(col("term"))))).as("fingerprint"))

  /** Repetition signals (Gopher-style quality rules): per-doc duplicate
    * token fraction, duplicate 2-gram fraction, and the fraction of 2-grams
    * taken by the single most frequent 2-gram. High values flag boilerplate
    * / spam / generated loops — standard web-corpus filters.
    *
    * Scale shape: both aggregations are keyed by (doc_id[, gram]) — per-doc
    * groups, uniform keys, map-side partial aggregation; no corpus-wide
    * state.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val t = tokens(docs)
    val tokAgg = t.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      count_distinct(col("term")).as("n_distinct"))
    val grams = docs
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 2),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(2))))).as("gram"))
    val gramAgg = grams.groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(
        sum(col("cnt")).as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max(col("cnt")).as("top_gram_cnt"))
    tokAgg.join(gramAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens") + lit(1.0e-9), 4)
          .as("dup_tok_ratio"),
        round(coalesce(lit(1.0) - col("n_distinct_grams").cast("double") / col("n_grams"), lit(0.0)) + lit(1.0e-9), 4)
          .as("dup_2gram_ratio"),
        round(coalesce(col("top_gram_cnt").cast("double") / col("n_grams"), lit(0.0)) + lit(1.0e-9), 4)
          .as("top_2gram_frac"))
  }

  /** PMI collocations: pointwise mutual information of adjacent token
    * pairs vs their unigram frequencies — the classic collocation
    * extractor. Bigram keys are uniform (no head-shingle skew: pairs are
    * position-anchored), totals are two scalar aggregates broadcast via a
    * cross join; everything else is two grouped counts.
    */
  def collocations(docs: DataFrame, minCount: Long = 5): DataFrame = {
    val toks = col("toks")
    val grams = docs
      .select(filter(split(lower(col("text")), "[^a-z0-9]+"), c => c =!= "").as("toks"))
      .filter(size(toks) >= 2)
      .select(explode(transform(sequence(lit(0), size(toks) - 2),
        i => struct(element_at(toks, i + 1).as("w1"), element_at(toks, i + 2).as("w2")))).as("g"))
      .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c2 = grams.groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val c1 = tokens(docs).groupBy("term").agg(count(lit(1)).as("n"))
    val tot = tokens(docs).agg(count(lit(1)).as("t")).crossJoin(
      grams.agg(count(lit(1)).as("g")))
    c2.filter(col("n_pair") >= minCount)
      .join(c1.select(col("term").as("w1"), col("n").as("n1")), Seq("w1"))
      .join(c1.select(col("term").as("w2"), col("n").as("n2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      // `+ 0.0` after the round normalizes IEEE signed zero: a PMI that
      // rounds to zero from below is -0.0 under DuckDB's sign-preserving
      // round but +0.0 under Spark's BigDecimal HALF_UP; the addition maps
      // both to +0.0 so the byte-level hash gate agrees (twin in oracle SQL).
      .withColumn("pmi", round(
        log((col("n_pair").cast("double") / col("g").cast("double")) /
          ((col("n1").cast("double") / col("t").cast("double")) *
            (col("n2").cast("double") / col("t").cast("double")))) + lit(1.0e-9), 4) + lit(0.0))
      .select(col("w1"), col("w2"), col("n_pair"), col("pmi"))
  }

  /** Per-source corpus report: document/token counts, mean length, and
    * language spread — the partition-level audit a curation pipeline emits
    * per crawl source. One grouped aggregate over uniform source keys.
    */
  def sourceReport(docs: DataFrame): DataFrame =
    docs.join(doclens(docs), Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("doclen"), lit(0L))).as("total_tokens"),
        round(sum(coalesce(col("doclen"), lit(0L))).cast("double") /
          count(lit(1)).cast("double") + lit(1.0e-9), 4).as("mean_doclen"),
        count_distinct(col("lang")).as("n_langs"))

  /** Heuristic language ID from per-language stopword hit counts.
    * Deterministic tie-break by language code.
    */
  val LangStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "las", "una", "es")
  )

  def langId(docs: DataFrame): DataFrame = {
    val t = tokens(docs)
    val scores = LangStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      sum(when(col("term").isin(words: _*), 1).otherwise(0)).cast("bigint").as(s"hits_$lang")
    }
    val agg = t.groupBy("doc_id").agg(scores.head, scores.tail: _*)
    // greatest hits wins; ties broken by language code ascending
    val langs = LangStopwords.keys.toSeq.sorted
    val best = langs.foldLeft((lit(-1L), lit("und"))) { case ((bh, bl), lang) =>
      val h = col(s"hits_$lang")
      (when(h > bh, h).otherwise(bh), when(h > bh, lit(lang)).otherwise(bl))
    }
    agg.withColumn("lang_pred", best._2)
      .select((Seq(col("doc_id"), col("lang_pred")) ++ langs.map(l => col(s"hits_$l"))): _*)
  }

  /** Composite quality-filter verdict (the Gopher/C4-style keep/drop
    * decision a curation pipeline actually makes): first failing rule wins.
    * Thresholds compare the same rounded signal values the individual
    * signal queries emit, so the verdict is FP-reproducible in SQL. One
    * pass over per-doc aggregates; no corpus-wide state.
    */
  def qualityFilter(docs: DataFrame, minTokens: Long = 20, maxTokens: Long = 5000,
      maxDupTok: Double = 0.65, maxTopGram: Double = 0.10,
      minStopRatio: Double = 0.001): DataFrame = {
    val rep = repetitionSignals(docs)
    val stop = stopwordRatio(docs)
    rep.join(stop, Seq("doc_id"))
      .withColumn("reason",
        when(col("n_tokens") < minTokens, "too_short")
          .when(col("n_tokens") > maxTokens, "too_long")
          .when(col("dup_tok_ratio") > maxDupTok, "repetitive")
          .when(col("top_2gram_frac") > maxTopGram, "boilerplate")
          .when(col("stop_ratio") < minStopRatio, "no_stopwords")
          .otherwise("ok"))
      .select(col("doc_id"), (col("reason") === "ok").as("keep"), col("reason"))
  }

  // -------------------------------------------------------- PII scrubbing

  /** Regexes restricted to syntax with identical semantics in Java regex
    * (Spark) and RE2 (DuckDB), and backslash-free so the same literal can
    * be embedded in generated SQL: character classes and bounded repeats.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val PhoneRe = "555-[0-9]{4}"

  /** PII scrub pass (training-data hygiene): counts and redacts email
    * addresses and phone numbers per document. Entirely NARROW — per-row
    * regex work inside whole-stage codegen, no UDF, no shuffle; the
    * redacted text is emitted as an md5 so the correctness gate checks the
    * full redaction byte-for-byte without dumping bulky text.
    */
  def piiRedact(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.select(col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("bigint").as("n_emails"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).cast("bigint").as("n_phones"),
      md5(regexp_replace(regexp_replace(t, EmailRe, "[EMAIL]"), PhoneRe, "[PHONE]"))
        .as("redacted_hash"))
  }
}
