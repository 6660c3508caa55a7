package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.query.QueryEngine
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Filter-context (`bool.filter`) over the index with BUCKET-LOCAL
  * exclusions: the excluded-docId set stays a Dataset end-to-end (joined to
  * the docs table for bucketing, cogrouped into the WAND tasks) — the design
  * that survives a broad filter over 10^12 pages, where a collected Set
  * would be O(corpus) driver state.
  */
class FilteredIndexSpec extends SparkSpecBase {

  test("topKWhere with a corpus-fraction exclusion set == full-rank-then-filter") {
    import spark.implicits._
    val pages = Corpus.syntheticDS(spark, 1200, seed = 11L, parts = 6)
    val dir = Files.createTempDirectory("filt-idx").toString
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 8))
    val queries = Seq(
      "f1" -> "the", "f2" -> "data spark index", "f3" -> "the of and to",
      "f4" -> "absentzzz")
    val docs = spark.read.parquet(s"$dir/docs")
    val nDocs = docs.count().toInt
    // exclude ~80% of the corpus — the breadth that kills a driver-Set
    // design; the query path below never collects it
    val excluded = docs.filter(col("docId") % 5 =!= 0).select(col("docId"))
    val k = 10

    val filtered = QueryEngine.topKWhere(spark, dir, queries, k, excluded)
      .collect().toSeq.sortBy(r => (r.queryId, r.rank))

    // oracle: exact full ranking to corpus depth, drop excluded, re-rank
    // (filter-context semantics: idf/avgdl stay corpus-wide)
    val exSet = excluded.as[Long].collect().toSet // test oracle only
    val full = QueryEngine.topK(spark, dir, queries, nDocs).collect()
    val expect = full.groupBy(_.queryId).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r.score, r.docId)).filterNot(r => exSet(r.docId)).take(k)
        .zipWithIndex.map { case (r, i) => r.copy(rank = i + 1) }
    }.sortBy(r => (r.queryId, r.rank))

    assert(filtered.nonEmpty)
    assert(filtered.map(_.docId).forall(d => d % 5 == 0))
    assert(filtered === expect) // docIds AND scores bit-identical
  }

  test("empty exclusion set leaves topKWhere == topK") {
    import spark.implicits._
    val pages = Corpus.syntheticDS(spark, 400, seed = 13L, parts = 4)
    val dir = Files.createTempDirectory("filt-empty").toString
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 4))
    val queries = Seq("e1" -> "the data", "e2" -> "spark")
    val none = Seq.empty[Long].toDF("docId")
    val a = QueryEngine.topKWhere(spark, dir, queries, 10, none)
      .collect().toSeq.sortBy(r => (r.queryId, r.rank))
    val b = QueryEngine.topK(spark, dir, queries, 10)
      .collect().toSeq.sortBy(r => (r.queryId, r.rank))
    assert(a === b)
  }
}
