package graft

import graft.ops.TextOps
import graft.query.{Bm25Sql, SearchOps}
import org.apache.spark.sql.functions._

/** Cross-operator properties of the search surface that the per-query
  * DuckDB oracles can't express: consistency BETWEEN operators (pagination
  * vs ranking, should-match vs top-k, filter-context vs full ranking).
  */
class SearchSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()

  private def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(2))

  test("page 2 continues page 1: disjoint docs, no score above page 1's floor") {
    val p1 = Bm25Sql.topKDocs(docs, RefQueries.set, k = 10).collect()
    val p2 = SearchOps.searchAfterPage(docs, RefQueries.set, k = 10).collect()
    val p1Keys = p1.map(key).toSet
    assert(p2.nonEmpty, "harness corpus must have >10 matches for some query")
    p2.foreach { r => assert(!p1Keys.contains(key(r)), "pages must be disjoint") }
    val floor = p1.groupBy(_.getString(0)).map { case (q, rs) => q -> rs.map(_.getDouble(3)).min }
    p2.foreach { r =>
      assert(r.getDouble(3) <= floor(r.getString(0)) + 1e-9,
        "page-2 scores never exceed page-1's minimum")
    }
  }

  test("minimum_should_match(1) degenerates to the plain disjunctive top-k") {
    val a = Bm25Sql.topKDocs(docs, RefQueries.set, k = 10).collect().map(_.toSeq).toSeq
    val b = SearchOps.shouldMatchTopK(docs, RefQueries.set, m = 1, k = 10)
      .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("filter-context hits satisfy the predicate and keep their full-ranking scores") {
    val filtered = SearchOps.filteredTopK(docs, RefQueries.set, col("lang") === "en", k = 10)
      .collect()
    assert(filtered.nonEmpty)
    val enDocs = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    filtered.foreach(r => assert(enDocs.contains(r.getLong(2))))
    // scores must equal the unfiltered scored set (idf/avgdl corpus-wide)
    val full = Bm25Sql.scoredDocs(docs, RefQueries.set)
      .select(col("query_id"), col("doc_id"), round(col("score"), 4)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    filtered.foreach { r =>
      assert(full((r.getString(0), r.getLong(2))) == r.getDouble(3))
    }
  }

  test("fuzzy expansion includes the exact term at distance 0 and respects the radius") {
    val rows = SearchOps.fuzzyExpand(docs, SearchOps.Fuzzies, maxDist = 1).collect()
    assert(rows.exists(r => r.getString(1) == "merge" && r.getString(2) == "merge" && r.getLong(3) == 0L))
    rows.foreach(r => assert(r.getLong(3) <= 1L))
    assert(!rows.exists(_.getString(1) == "qzx"), "no expansion within radius 1 of qzx")
  }

  test("must_not never returns a doc containing the banned term") {
    val banned = "customer"
    val rows = SearchOps.mustNotTopK(docs, RefQueries.set, banned).collect()
    assert(rows.nonEmpty)
    val bannedDocs = graft.ops.TextOps.tokens(docs)
      .filter(col("term") === banned).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    rows.foreach(r => assert(!bannedDocs.contains(r.getLong(2))))
  }

  test("more_like_this excludes the seed and ranks docs sharing its top terms") {
    val rows = SearchOps.moreLikeThis(docs, col("doc_id") < 5).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) != r.getLong(0), "seed never in its own result"))
    // every returned doc shares at least one of the seed's top-3 terms
    val seedTerms = graft.ops.TextOps.topTerms(docs, 3)
      .filter(col("doc_id") < 5).collect()
      .groupBy(_.getLong(0)).map { case (s, rs) => s -> rs.map(_.getString(2)).toSet }
    val docTerms = graft.ops.TextOps.tokens(docs).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getString(1)).toSet }
    rows.foreach { r =>
      assert(seedTerms(r.getLong(0)).intersect(docTerms(r.getLong(2))).nonEmpty)
    }
  }

  test("snippets contain at least one query term for every emitted row") {
    val rows = SearchOps.snippets(docs, RefQueries.set, k = 3).collect()
    assert(rows.nonEmpty)
    val qterms = RefQueries.set.toMap.map { case (q, t) =>
      q -> graft.textprep.TextPrep.tokenize(t).toSet
    }
    rows.foreach { r =>
      val words = r.getString(3).split(" ").toSet
      assert(words.intersect(qterms(r.getString(0))).nonEmpty,
        s"snippet for ${r.getString(0)} must contain a query term: '${r.getString(3)}'")
    }
  }
}
