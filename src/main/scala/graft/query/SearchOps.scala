package graft.query

import graft.ops.TextOps
import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, SparkSession}
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
      before: Int = 3, after: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val top = Bm25Sql.topKDocs(docs, queries, k).select("query_id", "rank", "doc_id")
    val qdf = queries
      .map { case (qid, text) => (qid, TextPrep.tokenize(text).distinct.sorted.toSeq) }
      .toDF("query_id", "qterms")
    top
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

  /** Fixed phrase set for the driver query (chosen to hit the harness
    * corpus; counts verified nonzero at sf0.01).
    */
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
}
