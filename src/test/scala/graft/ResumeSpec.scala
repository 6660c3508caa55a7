package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Resume/lineage semantics (FIXTURES.md §5): a build killed after group
  * 1's lineage commit must, on resume, (a) skip completed buckets and
  * (b) produce index tables content-equal to a single-shot build.
  */
class ResumeSpec extends SparkSpecBase {

  private def canonicalPostings(dir: String): DataFrame =
    spark.read.parquet(s"$dir/postings")
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"), col("minDl"),
        explode(col("blocks")).as("b"))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"), col("minDl"),
        col("b.firstDocId"), col("b.lastDocId"), col("b.count"),
        col("b.maxTf").as("bMaxTf"), col("b.minDl").as("bMinDl"),
        base64(col("b.docBytes")).as("d64"), base64(col("b.tfBytes")).as("t64"),
        base64(col("b.dlBytes")).as("l64"))

  test("crash after group 1 + resume == single-shot build") {
    val pages = Corpus.syntheticDS(spark, 600, seed = 7L, parts = 5)
    val oneShot = Files.createTempDirectory("idx-oneshot").toString
    IndexBuilder.build(spark, pages, oneShot,
      IndexBuilder.Config(numBuckets = 8, checkpointGroups = 4))

    val crashed = Files.createTempDirectory("idx-crash").toString
    val ex = intercept[RuntimeException] {
      IndexBuilder.build(spark, pages, crashed,
        IndexBuilder.Config(numBuckets = 8, checkpointGroups = 4, failAfterGroup = 1))
    }
    assert(ex.getMessage.contains("injected crash"))

    // lineage has exactly the first two groups' buckets (bucket % 4 ∈ {0,1})
    val committed = spark.read.parquet(s"$crashed/lineage")
      .select("partitionId").collect().map(_.getInt(0)).toSet
    assert(committed === Set(0, 1, 4, 5))

    // resume completes the remaining buckets
    IndexBuilder.build(spark, pages, crashed,
      IndexBuilder.Config(numBuckets = 8, checkpointGroups = 4, resume = true))

    val a = canonicalPostings(oneShot)
    val b = canonicalPostings(crashed)
    assert(a.count() === b.count())
    assert(a.except(b).count() === 0 && b.except(a).count() === 0,
      "resumed postings must be byte-identical to single-shot")

    val docsA = spark.read.parquet(s"$oneShot/docs").select("docId", "bucket", "url", "doclen")
    val docsB = spark.read.parquet(s"$crashed/docs").select("docId", "bucket", "url", "doclen")
    assert(docsA.except(docsB).count() === 0 && docsB.except(docsA).count() === 0)

    val termsA = spark.read.parquet(s"$oneShot/terms")
    val termsB = spark.read.parquet(s"$crashed/terms")
    assert(termsA.except(termsB).count() === 0 && termsB.except(termsA).count() === 0)

    // every bucket now has exactly one lineage row
    val rows = spark.read.parquet(s"$crashed/lineage").groupBy("partitionId").count()
    assert(rows.filter(col("count") =!= 1).count() === 0)
    assert(rows.count() === 8)

    // status table (the /stats-endpoint analog): one row per completed
    // build run, carrying docs/s and per-phase timings — the crashed
    // attempt must NOT have written one, the single-shot and the resumed
    // run must each have exactly one
    val stOne = spark.read.parquet(s"$oneShot/status")
    assert(stOne.count() === 1)
    val r = stOne.head()
    assert(r.getAs[String]("kind") === "build")
    assert(r.getAs[Long]("nDocs") > 0L)
    assert(r.getAs[Double]("wallSecs") > 0.0)
    assert(r.getAs[Double]("docsPerSec") > 0.0)
    assert(r.getAs[String]("phaseSecs").contains("\"terms\""))
    val stCrashed = spark.read.parquet(s"$crashed/status")
    assert(stCrashed.count() === 1, "crashed attempt must not log a status row")
  }
}
