package graft

import graft.corpus.Corpus
import graft.model.PageDoc
import graft.query.QueryEngine
import graft.streaming.StreamIngest
import org.apache.spark.sql.Encoders
import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** At-least-once delivery: a retried micro-batch must never double-count.
  * The commit point is docmeta (written last); data writes are dynamic
  * partition overwrites of the batch's fresh partitions, so a retry
  * REPLACES a crashed attempt's partial output.
  */
class RetrySpec extends SparkSpecBase {

  private def ds(pages: Seq[PageDoc]) =
    spark.createDataset(pages)(Encoders.product[PageDoc])

  private def copyTree(src: Path, dst: Path): Unit = {
    java.nio.file.Files.walk(src).sorted().forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else { java.nio.file.Files.createDirectories(t.getParent); java.nio.file.Files.copy(p, t) }
    }
  }

  private def stateOf(dir: String): (Long, graft.model.CorpusStats, Seq[(String, Int, Long, Double)]) = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/docs").count()
    val st = spark.read.parquet(s"$dir/stats").as[graft.model.CorpusStats].head()
    val hits = QueryEngine.topK(spark, dir,
      Seq("r1" -> "the data", "r2" -> "spark index"), 10).collect()
      .map(h => (h.queryId, h.rank, h.docId, h.score)).toSeq.sorted
    (docs, st, hits)
  }

  test("exact redelivery of an ingested batch is a no-op (and repairs stale docmeta)") {
    val all = Corpus.synthetic(400, seed = 43L)
    val (b1, b2) = all.splitAt(300)
    val dir = Files.createTempDirectory("retry-idx").toString
    StreamIngest.appendBatch(spark, ds(b1), dir, bucketSize = 64, snapshotId = 1)
    val metaAfterB1 = spark.read.parquet(s"$dir/docmeta").collect()
    StreamIngest.appendBatch(spark, ds(b2), dir, bucketSize = 64, snapshotId = 2)
    val want = stateOf(dir)
    val metaAfterB2 = spark.read.parquet(s"$dir/docmeta").head()

    // plain redelivery (same batch, same snapshot id)
    StreamIngest.appendBatch(spark, ds(b2), dir, bucketSize = 64, snapshotId = 2)
    assert(stateOf(dir) === want, "redelivered batch must change nothing")

    // crash window: urlmap appended but docmeta commit lost → stale marks.
    // The retry's early-return path must repair docmeta from durable state.
    import spark.implicits._
    metaAfterB1.toSeq.map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toDF("maxDocId", "maxBucket", "n", "totalTokens")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/docmeta")
    StreamIngest.appendBatch(spark, ds(b2), dir, bucketSize = 64, snapshotId = 2)
    val repaired = spark.read.parquet(s"$dir/docmeta").head()
    assert(repaired.getLong(0) === metaAfterB2.getLong(0), "maxDocId must be repaired")
    assert(repaired.getInt(1) === metaAfterB2.getInt(1), "maxBucket must be repaired")
    assert(stateOf(dir) === want)
  }

  test("retry after crash between data writes and commit replaces partial output exactly") {
    val all = Corpus.synthetic(400, seed = 47L)
    val (b1, b2) = all.splitAt(300)
    val dirA = Files.createTempDirectory("retry-a").toString
    StreamIngest.appendBatch(spark, ds(b1), dirA, bucketSize = 64, snapshotId = 1)

    // snapshot the post-b1 state, then ingest b2 fully on dirA
    val dirB = Files.createTempDirectory("retry-b").toString
    new java.io.File(dirB).delete()
    copyTree(Paths.get(dirA), Paths.get(dirB))
    StreamIngest.appendBatch(spark, ds(b2), dirA, bucketSize = 64, snapshotId = 2)
    val want = stateOf(dirA)

    // fabricate the crashed attempt on dirB: b2's docs + postings partitions
    // landed (copied from dirA), but terms/stats/urlmap/docmeta never did
    val maxB1Bucket = spark.read.parquet(s"$dirB/docs")
      .agg(org.apache.spark.sql.functions.max("bucket")).head().getInt(0)
    def copyNewPartitions(table: String, prefix: String): Unit = {
      val root = new java.io.File(s"$dirA/$table")
      root.listFiles().filter { f =>
        f.isDirectory && f.getName.startsWith(prefix) &&
          f.getName.stripPrefix(prefix).toInt > maxB1Bucket
      }.foreach { f =>
        copyTree(f.toPath, Paths.get(s"$dirB/$table/${f.getName}"))
      }
    }
    copyNewPartitions("docs", "dbucket=")
    copyNewPartitions("postings", "pbucket=")

    // the retry (at-least-once redelivery) must converge to dirA's state
    StreamIngest.appendBatch(spark, ds(b2), dirB, bucketSize = 64, snapshotId = 2)
    val got = stateOf(dirB)
    assert(got._1 === want._1, "docs row count must match the clean ingest")
    assert(got._2.n === want._2.n && got._2.totalTokens === want._2.totalTokens &&
      got._2.avgdl === want._2.avgdl, "stats must match the clean ingest")
    assert(got._3 === want._3, "query results must be identical to the clean ingest")
  }
}
