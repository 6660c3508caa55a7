package graft.query

import graft.ops.TextOps
import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One ES `_search` REQUEST, composed — the API-parity capstone. A reference
  * user's single _search JSON body (bool query + filter context + size +
  * highlight + aggregations, the shape monstache-fed indexes are queried
  * with; reference delegation at `/root/reference/monstache.go:46,657-670`)
  * maps onto one [[SearchRequest]] and executes as one composed plan:
  *
  *   - bool: every `must` term required (BM25-scored), `should` optional
  *     (score-only), `mustNot` banning — boolFullTopK's exact semantics;
  *   - filter context: numeric range on a doc-values field, candidates only
  *     (never reweights scores — ES filter semantics);
  *   - hits: top-`k` by (score desc, doc_id asc) with a highlight snippet
  *     per hit (the query-then-fetch two-phase shape);
  *   - aggregations: a terms agg over the FULL filtered match set — ES aggs
  *     see every matching doc, not just the returned page.
  *
  * Both twins (relational full scan vs inverted index + stored-fields
  * fetch) feed the one `assemble` tail, so scores match bit-for-bit.
  */
final case class SearchRequest(
    queryId: String,
    must: String,
    should: String,
    mustNot: String,
    rangeField: String,
    rangeLo: Long,
    rangeHi: Long,
    aggField: String,
    k: Int)

object Search {

  /** Driver fixture: the b1 bool triple under a n_chars range filter with a
    * lang terms-agg — every clause kind of a realistic request exercised.
    */
  val Fixture: SearchRequest =
    SearchRequest("s1", "spark", "query fast", "slow", "n_chars", 150L, 400L, "lang", 10)

  private def pairs(req: SearchRequest, text: String): Seq[(String, String)] =
    TextPrep.tokenize(text).distinct.toSeq.map(t => (req.queryId, t))

  /** Relational twin of the full request; returns (hits, aggregations). */
  def execute(docs: DataFrame, req: SearchRequest = Fixture): (DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mustScored = Bm25Sql
      .scoredFromTermTable(docs, pairs(req, req.must).toDF("query_id", "term"), "query_id")
      .select(col("query_id"), col("doc_id"), col("score").as("must_score"),
        col("matched").as("must_matched"))
    val shouldScored = Bm25Sql
      .scoredFromTermTable(docs, pairs(req, req.should).toDF("query_id", "term"), "query_id")
      .select(col("query_id"), col("doc_id"), col("score").as("should_score"))
    val banned = TextOps.tokens(docs)
      .join(broadcast(pairs(req, req.mustNot).toDF("query_id", "term")), Seq("term"))
      .select("query_id", "doc_id").distinct()
    assemble(docs, req, mustScored, shouldScored, banned)
  }

  /** Index-served twin: scoring from postings, banning from the postings
    * match set, the range filter and the aggregation key from doc values
    * (stored fields), highlights from the fetch phase — the corpus is never
    * tokenized at query time.
    */
  def executeIndex(spark: SparkSession, indexDir: String, docs: DataFrame,
      req: SearchRequest = Fixture): (DataFrame, DataFrame) = {
    val mustScored = IndexSearch.scoredMatches(spark, indexDir, Seq(req.queryId -> req.must))
      .select(col("query_id"), col("doc_id"), col("score").as("must_score"),
        col("matched").as("must_matched"))
    val shouldScored = IndexSearch.scoredMatches(spark, indexDir, Seq(req.queryId -> req.should))
      .select(col("query_id"), col("doc_id"), col("score").as("should_score"))
    val banned = IndexSearch.matchedDocs(spark, indexDir, Seq(req.queryId -> req.mustNot))
    assemble(docs, req, mustScored, shouldScored, banned)
  }

  /** Shared request tail (FP parity by construction): arity-gate the must
    * group, apply the range filter as a semi-join, ban, score
    * must + coalesce(should, 0); hits = top-k + snippet fetch, aggs = terms
    * counts over the full candidate set.
    */
  private def assemble(docs: DataFrame, req: SearchRequest,
      mustScored: DataFrame, shouldScored: DataFrame,
      banned: DataFrame): (DataFrame, DataFrame) = {
    val nMust = TextPrep.tokenize(req.must).distinct.length
    val allowed = docs
      .filter(col(req.rangeField).between(req.rangeLo, req.rangeHi))
      .select("doc_id")
    val cand = mustScored
      .filter(col("must_matched") === nMust)
      .join(allowed, Seq("doc_id"), "left_semi")
      .join(banned, Seq("query_id", "doc_id"), "left_anti")
      .join(shouldScored, Seq("query_id", "doc_id"), "left")
      .withColumn("score", col("must_score") + coalesce(col("should_score"), lit(0.0)))
      .select("query_id", "doc_id", "score")

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    val top = cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= req.k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
    val highlightQ = Seq(req.queryId -> s"${req.must} ${req.should}")
    val hits = top.join(
      SearchOps.snippetFrom(top.select("query_id", "rank", "doc_id"), docs, highlightQ),
      Seq("query_id", "rank", "doc_id"))
      .select(col("query_id"), col("rank"), col("doc_id"), col("score"), col("snippet"))

    val aggs = cand
      .join(docs.select(col("doc_id"), col(req.aggField)), Seq("doc_id"))
      .groupBy(col("query_id"), col(req.aggField))
      .agg(count(lit(1)).as("n_docs"))
    (hits, aggs)
  }
}
