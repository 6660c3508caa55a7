package graft.query

import graft.ops.TextOps
import graft.RefQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exhaustive BM25 over the harness `documents` table as a pure Catalyst
  * plan — the SQL-expressible oracle twin of the WAND path. Summation is
  * forced into ascending-term order (array_sort + ordered fold) so the
  * DuckDB oracle's `sum(x ORDER BY term)` reproduces scores bit-for-bit.
  */
object Bm25Sql {

  def topK(spark: SparkSession, sfDir: String, queries: Seq[(String, String)] = RefQueries.set,
      k: Int = RefQueries.K): DataFrame =
    topKDocs(TextOps.documents(spark, sfDir), queries, k)

  def topKDocs(docs: DataFrame, queries: Seq[(String, String)] = RefQueries.set,
      k: Int = RefQueries.K): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    scoredDocs(docs, queries).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy("query_id", "rank")
  }

  /** All (query, doc) matches with their exact BM25 score, the number of
    * distinct query terms matched (`matched`), and the query's term arity
    * (`nq`) — the shared core that top-k, minimum_should_match, filtered
    * search, and pagination all rank over. Disjunctive (OR) semantics; one
    * shuffle keyed by (query_id, doc_id).
    */
  def scoredDocs(docs: DataFrame, queries: Seq[(String, String)] = RefQueries.set): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val qn = queries.map { case (qid, text) =>
      (qid, graft.textprep.TextPrep.tokenize(text).distinct.length.toLong)
    }.toDF("query_id", "nq")
    scoredFromTermTable(docs, q, "query_id").join(broadcast(qn), Seq("query_id"))
  }

  /** BM25 scoring against an arbitrary (qidCol, term) query table — the
    * shared engine behind literal query sets and derived ones
    * (more_like_this builds its query table FROM the corpus). Emits
    * (qidCol, doc_id, score, matched); the ordered-fold summation keeps the
    * score bit-identical to the `sum(x ORDER BY term)` oracle.
    *
    * If `q` carries a `boost` column, each term's contribution is
    * multiplied by it (ES query-time boosting) — `(idf*partial)*boost`,
    * same association as the oracle's `ln(...) * (...) * boost`.
    */
  def scoredFromTermTable(docs: DataFrame, q: DataFrame, qidCol: String): DataFrame =
    termRowsFromTermTable(docs, q)
      .groupBy(qidCol, "doc_id")
      .agg(
        aggregate(
          array_sort(collect_list(struct(col("term"), col("addend")))),
          lit(0.0),
          (acc, x) => acc + x.getField("addend")).as("score"),
        // the largest single-term contribution — dis_max's pivot (max is
        // order-free and exact in IEEE, so no ordered fold needed)
        max(col("addend")).as("max_addend"),
        count(lit(1)).as("matched"))

  /** Per-(query, doc, term) BM25 operand rows — exactly the addends
    * `scoredFromTermTable` folds, kept un-aggregated. This is the raw
    * material of the `_explain` API (per-term score breakdown) and the
    * single place the scoring expression lives: literal constants 2.2,
    * 1.2, 0.25, 0.75 with the same parse/parens as Bm25.scala and the SQL
    * oracle. Emits (q's id column, doc_id, term, tf, df, doclen, idf,
    * addend).
    */
  def termRowsFromTermTable(docs: DataFrame, q: DataFrame): DataFrame = {
    val tok = TextOps.tokens(docs)
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // doclen = Σ tf per doc — exactly the old count over raw tokens, but
    // derived from the SAME tf subtree, so the scan+tokenize+first-agg
    // exchange is planned once and ReusedExchange serves every consumer
    // (the old tok-based doclen agg forced a second full tokenize pass).
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("doclen"))

    // corpus stats as a 1-row broadcast instead of an eager .head(): the
    // old scalar collect ran a third full tokenize pass per invocation
    // before the query itself even started. Same doubles: long/long counts,
    // one IEEE double division, identical operand order.
    val st = dl.agg(count(lit(1)).as("n"),
      (sum("doclen").cast("double") / count(lit(1)).cast("double")).as("avgdl"))

    val dft = tf.join(q.select("term").distinct(), Seq("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))

    val idf = log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val partial = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("doclen") / col("avgdl")))

    val addend =
      if (q.columns.contains("boost")) idf * partial * col("boost") else idf * partial
    q.join(tf, Seq("term"))
      .join(dft, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(st))
      .withColumn("idf", idf)
      .withColumn("addend", addend)
      .drop("n", "avgdl")
  }
}
