package graft.query

import graft.model._
import graft.textprep.TextPrep
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exhaustive BM25 scorer — the test oracle (FIXTURES.md §3): no index
  * structures, no WAND, no compression. Scores every candidate doc with the
  * same fixed ascending-term summation order and (score desc, docId asc)
  * tie-break, so the WAND path must reproduce its output bit-for-bit.
  * Mirrors the reference's sink-equals-source oracle assertions
  * (`monstache_test.go:94-106`).
  */
object ExhaustiveScorer {

  /** Score directly from a (docId, text) dataset. df/N/avgdl computed here,
    * independently of the index build (only docId assignment is shared —
    * it is a deterministic pure function of the corpus).
    */
  def topK(
      spark: SparkSession,
      docsText: Dataset[(Long, String)],
      queries: Seq[(String, String)],
      k: Int,
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Ascii
  ): Dataset[ScoredDoc] = {
    import spark.implicits._
    val qTerms: Seq[(String, Array[String])] =
      queries.map { case (qid, t) => qid -> analyzer.tokenize(t).distinct.sorted }
    val allTerms = qTerms.flatMap(_._2).distinct.toSet
    if (allTerms.isEmpty) return spark.emptyDataset[ScoredDoc]
    val allTermsB = spark.sparkContext.broadcast(allTerms)

    val tokens = docsText.flatMap { case (docId, text) =>
      val tfs = analyzer.termFreqs(text)
      val dl = tfs.map(_._2).sum
      tfs.iterator.map { case (term, tf) => (docId, term, tf, dl) }
    }.toDF("docId", "term", "tf", "doclen").cache()

    val st = tokens.agg(
      countDistinct(col("docId")).as("n"),
      sum(col("tf")).as("tot")).head()
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n.toDouble

    val dfMap: Map[String, Long] = tokens
      .filter(col("term").isin(allTerms.toSeq: _*))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    val dfMapB = spark.sparkContext.broadcast(dfMap)
    val qTermsB = spark.sparkContext.broadcast(qTerms)

    val matches = tokens
      .filter(col("term").isin(allTerms.toSeq: _*))
      .as[(Long, String, Int, Int)]

    val scored: Dataset[ScoredDoc] = matches
      .groupByKey(_._1)
      .flatMapGroups { (docId, it) =>
        val present: Map[String, (Int, Int)] =
          it.map { case (_, term, tf, dl) => term -> (tf, dl) }.toMap
        val dfm = dfMapB.value
        qTermsB.value.iterator.flatMap { case (qid, terms) =>
          var score = 0.0
          var any = false
          terms.foreach { t =>
            present.get(t).foreach { case (tf, dl) =>
              score += Bm25.idf(n, dfm(t)) * Bm25.partial(tf, dl, avgdl)
              any = true
            }
          }
          if (any) Iterator.single(ScoredDoc(qid, 0, docId, score)) else Iterator.empty
        }
      }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("queryId")).orderBy(col("score").desc, col("docId").asc)
    val out = scored.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("queryId"), col("rank").cast("int").as("rank"), col("docId"), col("score"))
      .as[ScoredDoc]
    val materialized = out.collect()
    tokens.unpersist()
    spark.createDataset(materialized.toSeq)
  }

  /** Oracle over the canonical page table: dedups + assigns docIds exactly
    * as the build does, then scores exhaustively.
    */
  def topKFromPages(
      spark: SparkSession,
      pages: Dataset[PageDoc],
      queries: Seq[(String, String)],
      k: Int,
      numBuckets: Int = 32
  ): Dataset[ScoredDoc] = {
    import spark.implicits._
    val versioned = pages.toDF()
      .withColumn("version", shiftleft(unix_timestamp(col("warc_ts")), 32))
    val byUrl = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("version").desc)
    val deduped = versioned
      .withColumn("rn", row_number().over(byUrl))
      .filter(col("rn") === 1)
      .select("url", "version", "text")
    val assigned = graft.index.IndexBuilder.assignDocIds(spark, deduped, numBuckets)
      .map { case (docId, _, _, _, text) => (docId, text) }
    topK(spark, assigned, queries, k)
  }
}
