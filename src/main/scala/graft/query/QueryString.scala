package graft.query

import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ES `query_string` mini-language — the query syntax a reference user
  * actually types into the search box the monstache-fed index serves
  * (reference: monstache delegates querying to Elasticsearch, whose
  * query_string parser is the default end-user surface;
  * `/root/reference/monstache.go:46,657-670`). Grammar (documented dialect):
  *
  *   - `"w1 w2"`  quoted phrase → exact consecutive-token clause. Phrase
  *     clauses are MATCH-ONLY (filter semantics, like ES filter context):
  *     they gate candidacy and contribute no score. Scoring comes from the
  *     term clauses.
  *   - `+tok` → must (all required, BM25-scored)
  *   - `-tok` → must_not (banning)
  *   - bare `tok` → should (optional, BM25-scored; if the query has no must
  *     clause and no phrase, at least one should term must match — ES
  *     default_operator OR)
  *
  * Clause text runs through the shared analyzer (`TextPrep.tokenize`), so a
  * prefixed token that analyzes to several terms contributes each of them
  * to its group — the same analyze-then-clause behavior ES applies.
  *
  * Compilation targets the existing bool machinery: must/should groups are
  * BM25 ordered-fold sums (must-group + should-group association, exactly
  * `boolFullTopK`), must_not is an anti-join, phrases are an all-probes
  * semi-join. Both twins (relational scan / inverted index + positional
  * sidecar) feed the ONE `assemble` plan tail, so the doubles match
  * bit-for-bit — the same twin discipline as WAND vs exhaustive BM25.
  */
object QueryString {

  /** Clause groups of one parsed query-string expression. Phrases are kept
    * as analyzed texts (tokens joined by one space).
    */
  final case class Parsed(must: Seq[String], should: Seq[String],
      not: Seq[String], phrases: Seq[String]) {
    def kind: String =
      if (must.nonEmpty) "M" else if (phrases.nonEmpty) "P" else "S"
  }

  private val PhraseRe = "\"([^\"]*)\"".r

  /** Parse the dialect above. Total: any input yields a Parsed (unknown
    * punctuation is eaten by the analyzer; unbalanced quotes leave the tail
    * unquoted, like ES's lenient mode).
    */
  def parse(q: String, analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Ascii): Parsed = {
    val phrases = PhraseRe.findAllMatchIn(q).map(_.group(1)).toSeq
      .map(p => analyzer.tokenize(p).mkString(" "))
      .filter(_.nonEmpty)
    val rest = PhraseRe.replaceAllIn(q, " ")
    var must = Vector.empty[String]
    var should = Vector.empty[String]
    var not = Vector.empty[String]
    rest.split("\\s+").filter(_.nonEmpty).foreach { raw =>
      val (bucket, body) = raw.charAt(0) match {
        case '+' => ('m', raw.substring(1))
        case '-' => ('n', raw.substring(1))
        case _   => ('s', raw)
      }
      val terms = analyzer.tokenize(body)
      bucket match {
        case 'm' => must ++= terms
        case 'n' => not ++= terms
        case 's' => should ++= terms
      }
    }
    Parsed(must.distinct, should.distinct, not.distinct, phrases)
  }

  /** Fixture query strings for the driver oracle — covers every clause kind:
    * must+should+not (k1), phrase-gated should (k2), must with phrase (k3),
    * pure OR (k4), impossible must (k5, empty result), OR with negation (k6).
    */
  val QueryStrings: Seq[(String, String)] = Seq(
    "k1" -> "+spark query -slow",
    "k2" -> "\"table hash\" customer",
    "k3" -> "+the \"spark query\"",
    "k4" -> "spark missingzzz",
    "k5" -> "+spark +missingzzz",
    "k6" -> "spark query merge -the")

  /** (probe_id, phrase text) pairs for all queries' phrase clauses; probe_id
    * = `<qid>_<i>` so both twins and the oracle derive the same ids.
    */
  def phraseProbes(queries: Seq[(String, String)],
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Ascii): Seq[(String, String)] =
    queries.flatMap { case (qid, q) =>
      parse(q, analyzer).phrases.zipWithIndex.map { case (ph, i) => (s"${qid}_$i", ph) }
    }

  private def termPairs(queries: Seq[(String, String)],
      sel: Parsed => Seq[String]): Seq[(String, String)] =
    queries.flatMap { case (qid, q) => sel(parse(q)).map(t => (qid, t)) }

  /** Relational twin: clause scoring from the shared full-scan BM25 plan,
    * phrase gating from the narrow per-doc fold (`SearchOps.phraseCounts`).
    */
  def topK(docs: DataFrame, queries: Seq[(String, String)] = QueryStrings,
      k: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mPairs = termPairs(queries, _.must)
    val sPairs = termPairs(queries, _.should)
    val bPairs = termPairs(queries, _.not)
    val mustScored =
      if (mPairs.isEmpty) emptyScored(spark, "must_score", withMatched = true)
      else Bm25Sql.scoredFromTermTable(docs, mPairs.toDF("query_id", "term"), "query_id")
        .select(col("query_id"), col("doc_id"), col("score").as("must_score"),
          col("matched").as("must_matched"))
    val shouldScored =
      if (sPairs.isEmpty) emptyScored(spark, "should_score", withMatched = false)
      else Bm25Sql.scoredFromTermTable(docs, sPairs.toDF("query_id", "term"), "query_id")
        .select(col("query_id"), col("doc_id"), col("score").as("should_score"))
    val banned =
      if (bPairs.isEmpty) spark.emptyDataset[(String, Long)].toDF("query_id", "doc_id")
      else graft.ops.TextOps.tokens(docs)
        .join(broadcast(bPairs.toDF("query_id", "term")), Seq("term"))
        .select("query_id", "doc_id").distinct()
    val probes = phraseProbes(queries)
    val phraseHits =
      if (probes.isEmpty) spark.emptyDataset[(String, Long)].toDF("phrase_id", "doc_id")
      else SearchOps.phraseCounts(docs, probes).select("phrase_id", "doc_id")
    assemble(spark, queries, mustScored, shouldScored, banned, phraseHits, k)
  }

  /** Index-served twin: must/should scoring from the block-max postings
    * (`IndexSearch.scoredMatches`), banning from the postings match set,
    * phrase gating from the positional sidecar — the corpus is never
    * scanned. Same `assemble` tail as the relational twin.
    */
  def topKIndex(spark: SparkSession, indexDir: String, posDir: String,
      queries: Seq[(String, String)] = QueryStrings, k: Int = 10): DataFrame = {
    // clause text parses with the index's RECORDED analyzer (non-ASCII
    // clauses survive on a unicode-analyzed index; identical on ASCII)
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    def asQueryTexts(sel: Parsed => Seq[String]): Seq[(String, String)] =
      queries.map { case (qid, q) => (qid, sel(parse(q, an)).mkString(" ")) }
        .filter(_._2.nonEmpty)
    val mustScored = IndexSearch.scoredMatches(spark, indexDir, asQueryTexts(_.must))
      .select(col("query_id"), col("doc_id"), col("score").as("must_score"),
        col("matched").as("must_matched"))
    val shouldScored = IndexSearch.scoredMatches(spark, indexDir, asQueryTexts(_.should))
      .select(col("query_id"), col("doc_id"), col("score").as("should_score"))
    val banned = IndexSearch.matchedDocs(spark, indexDir, asQueryTexts(_.not))
    val probes = phraseProbes(queries, an)
    val phraseHits =
      if (probes.isEmpty) {
        import spark.implicits._
        spark.emptyDataset[(String, Long)].toDF("phrase_id", "doc_id")
      } else graft.index.Positions.phraseMatch(spark, posDir, probes, analyzer = an)
        .select("phrase_id", "doc_id")
    assemble(spark, queries, mustScored, shouldScored, banned, phraseHits, k, an)
  }

  private def emptyScored(spark: SparkSession, scoreName: String,
      withMatched: Boolean): DataFrame = {
    import spark.implicits._
    if (withMatched)
      spark.emptyDataset[(String, Long, Double, Long)]
        .toDF("query_id", "doc_id", scoreName, "must_matched")
    else spark.emptyDataset[(String, Long, Double)].toDF("query_id", "doc_id", scoreName)
  }

  /** The shared plan tail both twins rank through (FP parity by
    * construction). Candidates per clause kind: must queries require every
    * must term (arity join); phrase-only queries start from the docs
    * matching ALL their phrases; pure-should queries from any should match.
    * Then: all-phrases gate (semi-join), banning (anti-join),
    * score = must + coalesce(should, 0), rank (score desc, doc_id asc).
    */
  private[query] def assemble(spark: SparkSession, queries: Seq[(String, String)],
      mustScored: DataFrame, shouldScored: DataFrame, banned: DataFrame,
      phraseHits: DataFrame, k: Int,
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Ascii): DataFrame = {
    import spark.implicits._
    val parsed = queries.map { case (qid, q) => (qid, parse(q, analyzer)) }
    val arity = parsed.collect { case (qid, p) if p.must.nonEmpty =>
      (qid, p.must.length.toLong)
    }.toDF("query_id", "n_must")
    val probeMap = parsed.flatMap { case (qid, p) =>
      p.phrases.indices.map(i => (s"${qid}_$i", qid))
    }.toDF("phrase_id", "query_id")
    val nPhrases = parsed.collect { case (qid, p) if p.phrases.nonEmpty =>
      (qid, p.phrases.length.toLong)
    }.toDF("query_id", "n_phrases")

    // docs satisfying EVERY phrase clause of their query
    val phraseOk = phraseHits.join(broadcast(probeMap), Seq("phrase_id"))
      .groupBy("query_id", "doc_id")
      .agg(count_distinct(col("phrase_id")).as("n_hit"))
      .join(broadcast(nPhrases), Seq("query_id"))
      .filter(col("n_hit") === col("n_phrases"))
      .select("query_id", "doc_id")

    val qidsM = parsed.collect { case (qid, p) if p.kind == "M" => qid }
    val qidsP = parsed.collect { case (qid, p) if p.kind == "P" => qid }
    val qidsS = parsed.collect { case (qid, p) if p.kind == "S" => qid }
    val phraseQids = parsed.collect { case (qid, p) if p.phrases.nonEmpty => qid }

    val candM = mustScored.filter(col("query_id").isin(qidsM: _*))
      .join(broadcast(arity), Seq("query_id"))
      .filter(col("must_matched") === col("n_must"))
      .select(col("query_id"), col("doc_id"), col("must_score"))
    val candP = phraseOk.filter(col("query_id").isin(qidsP: _*))
      .select(col("query_id"), col("doc_id"), lit(0.0).as("must_score"))
    val candS = shouldScored.filter(col("query_id").isin(qidsS: _*))
      .select(col("query_id"), col("doc_id"), lit(0.0).as("must_score"))
    val cand = candM.unionByName(candP).unionByName(candS)

    // all-phrases gate for queries that carry phrase clauses (kind-P
    // candidates already satisfy it; re-gating them is a no-op semi-join)
    val gated =
      if (phraseQids.isEmpty) cand
      else cand.filter(!col("query_id").isin(phraseQids: _*))
        .unionByName(cand.filter(col("query_id").isin(phraseQids: _*))
          .join(phraseOk, Seq("query_id", "doc_id"), "left_semi"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    gated
      .join(banned, Seq("query_id", "doc_id"), "left_anti")
      .join(shouldScored, Seq("query_id", "doc_id"), "left")
      .withColumn("score", col("must_score") + coalesce(col("should_score"), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }
}
