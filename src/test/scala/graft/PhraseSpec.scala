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

  test("streaming append maintains positions O(batch); recrawl+compact stay exact") {
    import graft.corpus.Corpus
    import graft.streaming.StreamIngest
    import graft.query.QueryEngine
    val enc = org.apache.spark.sql.Encoders.product[graft.model.PageDoc]
    val base = Corpus.synthetic(200, seed = 31L)
    val dir = java.nio.file.Files.createTempDirectory("pos-stream").toString
    StreamIngest.appendBatch(spark, spark.createDataset(base)(enc), dir, bucketSize = 64, snapshotId = 1)
    // enable positions: backfill from the base pages via url -> (docId, bucket)
    val baseDf = spark.createDataset(base)(enc).select("url", "text")
    val assigned = spark.read.parquet(s"$dir/docs").select("docId", "bucket", "url")
      .join(baseDf, Seq("url")).select("docId", "bucket", "text")
    Positions.build(spark, assigned, dir, numBuckets = 8)

    // append fresh pages + one recrawl of page0 (tombstones its old docId)
    val fresh = Corpus.synthetic(260, seed = 31L).drop(200)
    val p0 = base.head
    val recrawl = p0.copy(
      warc_ts = new java.sql.Timestamp(p0.warc_ts.getTime + 86400000L),
      text = "the data the data spark")
    StreamIngest.appendBatch(spark,
      spark.createDataset(fresh :+ recrawl)(enc), dir, bucketSize = 64, snapshotId = 2)

    val phrases = Seq("ph1" -> "the data", "ph2" -> "spark index")
    // expected from the live page set (old page0 replaced), via url->docId
    val livePages = (base.tail ++ fresh :+ recrawl)
    // recrawl url maps to TWO docIds pre-compaction (old tombstoned, new):
    // keep all pairs and take the max (live) id per url
    val urlIds = spark.read.parquet(s"$dir/docs").select("url", "docId").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val docsDf = spark.createDataset(livePages)(enc)
      .select(col("url"), col("text")).collect()
      .map(r => (urlIds.filter(_._1 == r.getString(0)).map(_._2).max, r.getString(1)))
    val expected = {
      val df = spark.createDataset(docsDf.toSeq)(
        org.apache.spark.sql.Encoders.product[(Long, String)]).toDF("doc_id", "text")
      graft.query.SearchOps.phraseCounts(df, phrases).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(expected.nonEmpty)

    // pre-compaction: tombstone-aware index path must equal expected
    val tombs = QueryEngine.loadTombstones(spark, dir)
    assert(tombs.nonEmpty)
    val pre = Positions.phraseMatch(spark, dir, phrases, tombs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(pre == expected)

    // post-compaction: sidecar physically pruned, no tombstone set needed
    StreamIngest.compact(spark, dir)
    val post = Positions.phraseMatch(spark, dir, phrases).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(post == expected)
  }

  test("phrase-term predicate is pushed into the positions parquet scan") {
    val pos = IndexCache.positionsForDocuments(spark, "/root/testdata/sf0.001")
    val plan = Positions.phraseMatch(spark, pos, SearchOps.Phrases)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters: [In(term"),
      s"positions scan must push the term filter, got:\n$plan")
  }
}
