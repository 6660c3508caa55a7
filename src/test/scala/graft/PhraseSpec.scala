package graft

import graft.index.Positions
import graft.query.SearchOps
import org.apache.spark.sql.functions._

/** The positional sidecar and both phrase paths: hand-counted occurrence
  * semantics (overlaps, repeated terms), index-vs-relational twin equality
  * on the harness corpus, and term pushdown into the positions scan.
  */
class PhraseSpec extends SparkSpecBase {
  import spark.implicits._

  private def buildPos(docs: org.apache.spark.sql.DataFrame, buckets: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("pos-spec").toString
    val assigned = docs.select(
      col("doc_id").cast("long").as("docId"),
      pmod(col("doc_id"), lit(buckets)).cast("int").as("bucket"),
      col("text"))
    Positions.build(spark, assigned, dir, buckets)
    dir
  }

  test("phrase occurrence semantics: overlaps, repeats, cross-doc") {
    val docs = Seq(
      (1L, "x y x y x"),     // "x y" twice, "y x" twice
      (2L, "x x x"),         // "x x" twice (overlapping starts)
      (3L, "y y"),
      (4L, "x")
    ).toDF("doc_id", "text")
    val phrases = Seq("a" -> "x y", "b" -> "y x", "c" -> "x x")
    val expected = Set(("a", 1L, 2L), ("b", 1L, 2L), ("c", 2L, 2L))

    val rel = SearchOps.phraseCounts(docs, phrases).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rel == expected)

    val dir = buildPos(docs, buckets = 2)
    val idx = Positions.phraseMatch(spark, dir, phrases).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(idx == expected)
  }

  test("index path equals the narrow relational twin on the harness corpus") {
    val docs = graft.ops.TextOps.documents(spark, "/root/testdata/sf0.001")
    val rel = SearchOps.phraseCounts(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val pos = IndexCache.positionsForDocuments(spark, "/root/testdata/sf0.001")
    val idx = Positions.phraseMatch(spark, pos, SearchOps.Phrases).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rel.nonEmpty)
    assert(idx == rel)
  }

  test("phrase-term predicate is pushed into the positions parquet scan") {
    val pos = IndexCache.positionsForDocuments(spark, "/root/testdata/sf0.001")
    val plan = Positions.phraseMatch(spark, pos, SearchOps.Phrases)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [In(term"),
      s"positions scan must push the term filter, got:\n$plan")
  }
}
