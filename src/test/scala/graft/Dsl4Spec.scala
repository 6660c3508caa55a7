package graft

import graft.ops.TextOps
import graft.query.{Bm25Sql, IndexSearch, QueryEngine, SearchOps}
import org.apache.spark.sql.functions._

/** boosting / range agg / filters agg / _count / _termvectors / _explain:
  * each index-served path must equal its relational twin row-for-row, and
  * the semantics checks that the oracle can't see (demote-vs-exclude,
  * breakdown-sums-to-score) are asserted directly.
  */
class Dsl4Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()
  private lazy val idx = IndexCache.forDocuments(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("boosting: index twin == relational; negative docs demoted x0.5, never excluded") {
    import spark.implicits._
    val rel = rows(SearchOps.boostingTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.boostingTopK(spark, idx, RefQueries.set).orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    // demote semantics: each hit's score is either its plain BM25 (not a
    // negative match) or exactly half of it (negative match) at 4dp
    val neg = TextOps.tokens(docs).filter(col("term") === SearchOps.BoostingNegative)
      .select("doc_id").distinct().as[Long].collect().toSet
    val plain = Bm25Sql.scoredDocs(docs, RefQueries.set)
      .select("query_id", "doc_id", "score").as[(String, Long, Double)].collect()
      .map { case (q, d, s) => (q, d) -> s }.toMap
    rel.foreach { r =>
      val (q, d, s) = (r(0).asInstanceOf[String], r(2).asInstanceOf[Long], r(3).asInstanceOf[Double])
      val base = plain((q, d))
      val expect = if (neg(d)) base * 0.5 else base
      assert(math.abs(s - math.floor(expect * 10000 + 0.5) / 10000) < 1e-9)
    }
  }

  test("range agg: index twin == relational; bucket counts partition the match set") {
    val rel = rows(SearchOps.rangeAgg(docs, RefQueries.set).orderBy("query_id", "bucket"))
    val srv = rows(IndexSearch.rangeAgg(spark, idx, RefQueries.set, docs)
      .orderBy("query_id", "bucket"))
    assert(rel.nonEmpty && rel == srv)
    val totals = rel.groupBy(_.head).view.mapValues(_.map(_(2).asInstanceOf[Long]).sum).toMap
    val counts = rows(SearchOps.countMatches(docs, RefQueries.set))
      .map(r => r(0) -> r(1).asInstanceOf[Long]).toMap
    assert(totals == counts)
  }

  test("filters agg: index twin == relational; 'en' bucket == matched en docs") {
    val rel = rows(SearchOps.filtersAgg(docs, RefQueries.set).orderBy("query_id", "filter_id"))
    val srv = rows(IndexSearch.filtersAgg(spark, idx, RefQueries.set, docs)
      .orderBy("query_id", "filter_id"))
    assert(rel.nonEmpty && rel == srv)
    // every query emits exactly the named buckets, in fixture order
    val names = rel.groupBy(_.head).values.map(_.map(_(1))).toSet
    assert(names == Set(SearchOps.NamedFilters.map(_._1)))
  }

  test("_count: index twin == relational; d2 ('the') matches most of the corpus") {
    val rel = rows(SearchOps.countMatches(docs, RefQueries.set).orderBy("query_id"))
    val srv = rows(IndexSearch.countMatches(spark, idx, RefQueries.set).orderBy("query_id"))
    assert(rel.nonEmpty && rel == srv)
    val d2 = rel.find(_.head == "d2").get(1).asInstanceOf[Long]
    assert(d2 > docs.count() / 2)
  }

  test("_termvectors: per-doc tfs sum to the doclen; df covers at least the probed doc") {
    import spark.implicits._
    val tv = SearchOps.termVectors(docs)
    val sums = tv.groupBy("doc_id").agg(sum("tf").as("s"))
      .as[(Long, Long)].collect().toMap
    val dls = TextOps.doclens(docs.filter(col("doc_id").isin(SearchOps.IdProbes: _*)))
      .as[(Long, Long)].collect().toMap
    assert(sums.nonEmpty && sums == dls)
    assert(tv.filter(col("df") < 1).isEmpty)
  }

  test("_explain: index twin == relational; addends sum to the WAND top-1 score (4dp)") {
    val rel = rows(SearchOps.explainScore(docs, RefQueries.set).orderBy("query_id", "term"))
    val srv = rows(IndexSearch.explainScore(spark, idx, RefQueries.set).orderBy("query_id", "term"))
    assert(rel.nonEmpty && rel == srv)
    val top = QueryEngine.topK(spark, idx, RefQueries.set, 1).collect()
      .map(s => s.queryId -> (s.docId, s.score)).toMap
    rel.groupBy(_.head).foreach { case (qid, rs) =>
      val (docId, score) = top(qid.asInstanceOf[String])
      assert(rs.forall(_(1) == docId))
      val sum4 = rs.map(_(7).asInstanceOf[Double]).sum
      // each addend is rounded to 4dp before summing -> tolerance n*0.5e-4
      assert(math.abs(sum4 - score) < rs.size * 0.51e-4)
    }
  }
}
