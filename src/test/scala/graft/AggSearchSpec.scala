package graft

import graft.ops.TextOps
import graft.query.{IndexSearch, SearchOps}

/** Twin-equality for the ES aggregation DSL (histogram / stats /
  * cardinality / date_histogram) and the multi-term rewrites (wildcard /
  * regexp): the index-served path must return EXACTLY the relational
  * full-scan rows — the same invariant the driver hash-checks via the
  * shared DuckDB oracles, asserted here pre-driver on sf0.001.
  */
class AggSearchSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()
  private lazy val idx = IndexCache.forDocuments(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("histogram: index twin == relational, nonempty, buckets are multiples of the interval") {
    val rel = rows(SearchOps.histogramAgg(docs, RefQueries.set).orderBy("query_id", "bucket_lo"))
    val srv = rows(IndexSearch.histogramAgg(spark, idx, RefQueries.set, docs, "n_chars", 200L)
      .orderBy("query_id", "bucket_lo"))
    assert(rel.nonEmpty && rel == srv)
    rel.foreach(r => assert(r(1).asInstanceOf[Long] % 200 == 0))
  }

  test("stats: index twin == relational; count/min/max/sum/avg mutually consistent") {
    val rel = rows(SearchOps.statsAgg(docs, RefQueries.set).orderBy("query_id"))
    val srv = rows(IndexSearch.statsAgg(spark, idx, RefQueries.set, docs, "n_chars")
      .orderBy("query_id"))
    assert(rel.nonEmpty && rel == srv)
    rel.foreach { r =>
      val (n, mn, mx, sm) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long],
        r(3).asInstanceOf[Long], r(4).asInstanceOf[Long])
      assert(mn <= mx && n * mn <= sm && sm <= n * mx)
    }
  }

  test("cardinality: index twin == relational; bounded by the facet's corpus cardinality") {
    val rel = rows(SearchOps.cardinalityAgg(docs, RefQueries.set).orderBy("query_id"))
    val srv = rows(IndexSearch.cardinalityAgg(spark, idx, RefQueries.set, docs, "source")
      .orderBy("query_id"))
    assert(rel.nonEmpty && rel == srv)
    val total = docs.select("source").distinct().count()
    rel.foreach(r => assert(r(1).asInstanceOf[Long] <= total))
  }

  test("date_histogram: index twin == relational; per-query day counts sum to the match set") {
    val rel = rows(SearchOps.dateHistogram(docs, RefQueries.set).orderBy("query_id", "day"))
    val srv = rows(IndexSearch.dateHistogram(spark, idx, RefQueries.set, SearchOps.crawlDay)
      .orderBy("query_id", "day"))
    assert(rel.nonEmpty && rel == srv)
    val matchTotals = SearchOps.statsAgg(docs, RefQueries.set).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rel.groupBy(_.head.asInstanceOf[String]).foreach { case (q, rs) =>
      assert(rs.map(_(2).asInstanceOf[Long]).sum == matchTotals(q))
    }
  }

  test("snippets: index-ranked fetch-phase twin == relational highlight rows") {
    val rel = rows(SearchOps.snippets(docs, RefQueries.set, k = 3).orderBy("query_id", "rank"))
    val srv = rows(IndexSearch.snippets(spark, idx, RefQueries.set, docs, k = 3)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
  }

  test("wildcard: index twin == relational; s% expands to 6 vocabulary terms, %zz% to none") {
    val rel = rows(SearchOps.wildcardMatch(docs).orderBy("pattern_id"))
    val srv = rows(IndexSearch.wildcardMatch(spark, idx, SearchOps.Wildcards)
      .orderBy("pattern_id"))
    assert(rel.nonEmpty && rel == srv)
    val byId = rel.map(r => r.head.asInstanceOf[String] -> r(2).asInstanceOf[Long]).toMap
    assert(byId("w1") == 6L)
    assert(!byId.contains("w4"), "empty expansion drops out of the aggregation")
  }

  test("regexp: index twin == relational; anchored patterns match whole terms only") {
    val rel = rows(SearchOps.regexpMatch(docs).orderBy("pattern_id"))
    val srv = rows(IndexSearch.regexpMatch(spark, idx, SearchOps.Regexps)
      .orderBy("pattern_id"))
    assert(rel.nonEmpty && rel == srv)
    val byId = rel.map(r => r.head.asInstanceOf[String] -> r(2).asInstanceOf[Long]).toMap
    assert(byId("r1") == 1L, "^s.*k$ matches exactly 'spark'")
    assert(byId("r3") == 2L, "alternation matches scan and merge")
    assert(!byId.contains("r4"))
  }
}
