package graft

import graft.ops.{Similarity, TextOps}
import graft.query.{Bm25Sql, IndexSearch, SearchOps}
import org.apache.spark.sql.functions._

/** RRF hybrid retrieval (ES 8 `retriever: rrf`) and `_rank_eval`: the
  * index-served twins must equal the relational twins row-for-row, the
  * fused score must be exactly 1/(60+text_rank) + 1/(60+knn_rank) with 0
  * outside each retriever's window, and the four rank_eval metrics must
  * match a plain-Scala recomputation from the page + judgment set.
  */
class HybridRankSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()
  private lazy val emb = Similarity.embeddings(spark, sf).cache()
  private lazy val idx = IndexCache.forDocuments(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("rrf: index twin == relational; ranks contiguous; fused score analytic") {
    val relDf = SearchOps.rrfHybrid(docs, emb, RefQueries.set).orderBy("query_id", "rank")
    val rel = rows(relDf)
    val srv = rows(IndexSearch.rrfHybrid(spark, idx, emb, RefQueries.set)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    // fused score is exactly the reciprocal-rank sum of its two legs
    relDf.collect().foreach { r =>
      val (rrf, tr, vr) = (r.getDouble(3), r.getInt(4), r.getInt(5))
      val expect = (if (tr > 0) 1.0 / (60 + tr) else 0.0) +
        (if (vr > 0) 1.0 / (60 + vr) else 0.0)
      assert(math.abs(rrf - (math.floor((expect + 1.0e-9) * 1e6 + 0.5) / 1e6)) < 1e-12)
      assert(tr >= 0 && tr <= 10 && vr >= 0 && vr <= 10 && (tr > 0 || vr > 0))
    }
    // per query: ranks 1..n and fused scores non-increasing
    relDf.collect().groupBy(_.getString(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("rrf legs: text_rank matches BM25 top-10, knn_rank matches cosineRanks") {
    val fused = SearchOps.rrfHybrid(docs, emb, RefQueries.set).collect()
    val bm = Bm25Sql.topKDocs(docs, RefQueries.set, 10).collect()
      .map(r => (r.getString(0), r.getLong(2)) -> r.getInt(1)).toMap
    val knn = Similarity.cosineRanks(emb, SearchOps.queryVectors(emb, RefQueries.set), 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    fused.foreach { r =>
      val key = (r.getString(0), r.getLong(2))
      assert(r.getInt(4) == bm.getOrElse(key, 0), s"text_rank mismatch at $key")
      assert(r.getInt(5) == knn.getOrElse(key, 0), s"knn_rank mismatch at $key")
    }
    // at least one query must actually fuse (doc present in BOTH windows
    // or windows disagreeing) or the operator degenerates to one leg
    assert(fused.exists(r => r.getInt(4) > 0 && r.getInt(5) > 0) ||
      fused.exists(r => r.getInt(4) == 0) && fused.exists(r => r.getInt(5) == 0))
  }

  test("rank_eval: index twin == relational; metrics match plain-Scala recompute") {
    val relDf = SearchOps.rankEval(docs, RefQueries.set).orderBy("query_id")
    val rel = rows(relDf)
    val srv = rows(IndexSearch.rankEval(spark, idx, RefQueries.set).orderBy("query_id"))
    assert(rel.nonEmpty && rel == srv)
    assert(rel.map(_.head) == RefQueries.set.map(_._1)) // one row per query, in order

    // recompute the four metrics in plain Scala from the page + judgments
    val page = Bm25Sql.topKDocs(docs, RefQueries.set, 10).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val judged = Bm25Sql.scoredDocs(docs, RefQueries.set)
      .filter(col("matched") === col("nq")).select("query_id", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    def log2(x: Double) = math.log(x) / math.log(2.0)
    def r4(x: Double) = math.floor((x + 1.0e-9) * 1e4 + 0.5) / 1e4
    relDf.collect().foreach { r =>
      val qid = r.getString(0)
      val hits = page.filter(p => p._1 == qid && judged((qid, p._3))).map(_._2).sorted
      val nRel = judged.count(_._1 == qid)
      val dcg = hits.map(rk => 1.0 / log2(rk + 1.0)).sum
      val idcg = (1 to math.min(nRel, 10)).map(i => 1.0 / log2(i + 1.0)).sum
      assert(r.getLong(1) == nRel && r.getLong(2) == hits.length)
      assert(r.getDouble(3) == r4(hits.length / 10.0), s"prec $qid")
      assert(r.getDouble(4) == r4(if (nRel == 0) 0.0 else hits.length.toDouble / nRel), s"recall $qid")
      assert(r.getDouble(5) == r4(if (hits.isEmpty) 0.0 else 1.0 / hits.head), s"mrr $qid")
      assert(math.abs(r.getDouble(6) - r4(if (idcg > 0) dcg / idcg else 0.0)) < 1e-9, s"ndcg $qid")
      Seq(r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)).foreach { m =>
        assert(m >= 0.0 && m <= 1.0 + 1e-9)
      }
    }
  }
}
