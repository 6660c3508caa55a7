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

  // ------------------------------------------------- simple_query_string

  /** simple_query_string fixtures (pinned ES subset: `|` OR separator,
    * `+`must / `-`not markers, quoted phrase, trailing-`*` prefix expanded
    * against the vocabulary): OR with a live prefix (p1), must + or-prefix
    * + negation (p2), phrase-or-term (p3), dead prefix beside a must (p4),
    * all-dead prefix → zero hits (p5).
    */
  val SimpleQueryStrings: Seq[(String, String)] = Seq(
    "p1" -> "spark | quer*",
    "p2" -> "+hash merg* -slow",
    "p3" -> "\"table hash\" | customer",
    "p4" -> "miss* +the",
    "p5" -> "zzznope*")

  private val SimplePhraseRe = "([+-]?)\"([^\"]*)\"".r

  /** Parse the simple_query_string subset into flat clause rows:
    * term/prefix clauses (query, clause, group, kind, value) and phrase
    * clauses (query, clause, group, analyzed text). Groups follow Lucene's
    * bool: `+` → must, `-` → not, bare → or; with any must present the
    * or-group is optional (min_should_match 0), else it must hit. Clause
    * ids are positional so both twins and the oracle agree.
    */
  def simpleClauses(queries: Seq[(String, String)],
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Ascii)
      : (Seq[(String, String, String, String, String)], Seq[(String, String, String, String)]) = {
    val cs = Vector.newBuilder[(String, String, String, String, String)]
    val phs = Vector.newBuilder[(String, String, String, String)]
    def grpOf(m: String) = m match { case "+" => "must"; case "-" => "not"; case _ => "or" }
    queries.foreach { case (qid, q) =>
      var i = 0
      SimplePhraseRe.findAllMatchIn(q).foreach { mm =>
        val text = analyzer.tokenize(mm.group(2)).mkString(" ")
        if (text.nonEmpty) { phs += ((qid, s"${qid}_c$i", grpOf(mm.group(1)), text)); i += 1 }
      }
      val rest = SimplePhraseRe.replaceAllIn(q, " ").replace('|', ' ')
      rest.split("\\s+").filter(_.nonEmpty).foreach { raw =>
        val (grp, body0) = raw.charAt(0) match {
          case '+' => ("must", raw.substring(1))
          case '-' => ("not", raw.substring(1))
          case _   => ("or", raw)
        }
        val isPrefix = body0.endsWith("*")
        val body = if (isPrefix) body0.dropRight(1) else body0
        val toks = analyzer.tokenize(body)
        if (toks.nonEmpty) {
          val (terms, last) =
            if (isPrefix) (toks.init.toSeq, Option(toks.last))
            else (toks.toSeq, Option.empty[String])
          terms.foreach { t => cs += ((qid, s"${qid}_c$i", grp, "term", t)); i += 1 }
          last.foreach { p => cs += ((qid, s"${qid}_c$i", grp, "prefix", p)); i += 1 }
        }
      }
    }
    (cs.result(), phs.result())
  }

  /** Shared integer tail of both simple_query_string twins: per (query,
    * doc) distinct-must-clause count + or/not hit flags over the clause
    * match rows, then the Lucene bool verdict and a per-query hit count
    * (0-preserving left join — a dead query stays visible). All-integer:
    * the twins and the oracle are exactly comparable with no FP pinning.
    */
  private def simpleTail(spark: SparkSession, queries: Seq[(String, String)],
      matches: DataFrame,
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Ascii): DataFrame = {
    import spark.implicits._
    val (cs, phs) = simpleClauses(queries, analyzer)
    val meta = queries.map { case (qid, _) =>
      val nMust = cs.count(c => c._1 == qid && c._3 == "must") +
        phs.count(p => p._1 == qid && p._3 == "must")
      (qid, nMust.toLong)
    }.toDF("query_id", "n_must")
    val md = matches.groupBy("query_id", "doc_id")
      .agg(
        count_distinct(when(col("grp") === "must", col("clause_id"))).as("n_must_hit"),
        max(when(col("grp") === "or", 1).otherwise(0)).as("or_hit"),
        max(when(col("grp") === "not", 1).otherwise(0)).as("not_hit"))
    val hits = md.join(broadcast(meta), Seq("query_id"))
      .filter(col("not_hit") === 0 &&
        when(col("n_must") > 0, col("n_must_hit") === col("n_must"))
          .otherwise(col("or_hit") === 1))
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    meta.select("query_id").join(hits, Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** simple_query_string, relational twin (hit-count semantics — the
    * grammar + bool verdict + vocabulary prefix expansion IS the operator;
    * ranked retrieval is [[topK]]'s job). Clause matches: one
    * distinct-token join against the broadcast clause table (prefix via
    * StartsWith), phrases via the narrow per-doc fold.
    */
  def simpleCount(docs: DataFrame,
      queries: Seq[(String, String)] = SimpleQueryStrings): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (cs, phs) = simpleClauses(queries)
    val cdf = cs.toDF("query_id", "clause_id", "grp", "kind", "v")
    val tm = graft.ops.TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(broadcast(cdf),
        (col("kind") === "term" && col("term") === col("v")) ||
          (col("kind") === "prefix" && col("term").startsWith(col("v"))))
      .select("query_id", "clause_id", "grp", "doc_id").distinct()
    val phMeta = phs.map(p => (p._2, p._1, p._3)).toDF("phrase_id", "query_id", "grp")
    val ph = SearchOps.phraseCounts(docs, phs.map(p => (p._2, p._4)))
      .select("phrase_id", "doc_id")
      .join(broadcast(phMeta), Seq("phrase_id"))
      .select(col("query_id"), col("phrase_id").as("clause_id"), col("grp"), col("doc_id"))
    simpleTail(spark, queries, tm.unionByName(ph))
  }

  /** simple_query_string, index-served twin: term clauses via In()
    * postings pushdown, prefix clauses via StartsWith on the term-sorted
    * postings scan (docIds-only decode), phrases from the positional
    * sidecar — the corpus is never scanned. Same integer tail.
    */
  def simpleCountIndex(spark: SparkSession, indexDir: String, posDir: String,
      queries: Seq[(String, String)] = SimpleQueryStrings): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val (cs, phs) = simpleClauses(queries, an)
    val full = cs.collect { case (_, _, _, "term", v) => v }.distinct
    val prefs = cs.collect { case (_, _, _, "prefix", v) => v }.distinct
    val csB = spark.sparkContext.broadcast(cs)
    val pred = (if (full.nonEmpty) Seq(col("term").isin(full: _*)) else Nil) ++
      prefs.map(p => col("term").startsWith(p))
    val tm =
      if (pred.isEmpty) spark.emptyDataset[(String, String, String, Long)]
        .toDF("query_id", "clause_id", "grp", "doc_id")
      else spark.read.parquet(s"$indexDir/postings")
        .filter(pred.reduce(_ || _))
        .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
          col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
        .as[graft.model.TermPostings]
        .flatMap { tp =>
          val hit = csB.value.filter { case (_, _, _, kind, v) =>
            (kind == "term" && tp.term == v) || (kind == "prefix" && tp.term.startsWith(v))
          }
          if (hit.isEmpty) Iterator.empty
          else tp.blocks.iterator
            .flatMap(b => graft.codec.Blocks.decodeDocIds(b).iterator)
            .flatMap(d => hit.iterator.map { case (qid, cid, grp, _, _) => (qid, cid, grp, d) })
        }
        .toDF("query_id", "clause_id", "grp", "doc_id").distinct()
    val phMeta = phs.map(p => (p._2, p._1, p._3)).toDF("phrase_id", "query_id", "grp")
    val ph =
      if (phs.isEmpty) spark.emptyDataset[(String, String, String, Long)]
        .toDF("query_id", "clause_id", "grp", "doc_id")
      else graft.index.Positions.phraseMatch(spark, posDir,
          phs.map(p => (p._2, p._4)), analyzer = an)
        .select("phrase_id", "doc_id")
        .join(broadcast(phMeta), Seq("phrase_id"))
        .select(col("query_id"), col("phrase_id").as("clause_id"), col("grp"), col("doc_id"))
    simpleTail(spark, queries, tm.unionByName(ph), an)
  }
}
