package graft

import graft.corpus.Corpus
import graft.model.PageDoc
import graft.streaming.StreamIngest
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** W2 MERGE-style doc-as-upsert (`monstache.go:3183-3207`) + W4
  * delete-by-query + sniff branch coverage.
  */
class UpsertSpec extends SparkSpecBase {

  private def fileState(dir: String): Map[String, Long] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> f.length()).toMap
  }

  private def contentHash(dir: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    fileState(dir).toSeq.sortBy(_._1).foreach { case (p, _) =>
      md.update(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  test("re-ingesting an identical batch is a byte-level no-op") {
    val pages = Corpus.synthetic(200, seed = 23L)
    val dir = Files.createTempDirectory("ups-idx").toString
    graft.index.IndexBuilder.build(spark,
      spark.createDataset(pages)(Encoders.product[PageDoc]), dir,
      graft.index.IndexBuilder.Config(numBuckets = 4))

    val before = contentHash(s"$dir/docs")
    // identical (url, version) rows — not strictly newer → no write at all
    val updates = spark.createDataset(pages)(Encoders.product[PageDoc]).toDF()
      .withColumn("version", shiftleft(unix_timestamp(col("warc_ts")), 32))
      .select("url", "version")
    val n = StreamIngest.upsertDocs(spark, updates, dir)
    assert(n === 0L)
    assert(contentHash(s"$dir/docs") === before, "docs table must be byte-identical")
  }

  test("strictly newer version upserts in place, touching only affected buckets") {
    val pages = Corpus.synthetic(200, seed = 29L)
    val dir = Files.createTempDirectory("ups-idx2").toString
    graft.index.IndexBuilder.build(spark,
      spark.createDataset(pages)(Encoders.product[PageDoc]), dir,
      graft.index.IndexBuilder.Config(numBuckets = 4))

    val docs0 = spark.read.parquet(s"$dir/docs")
    val ids0 = docs0.select("docId").collect().map(_.getLong(0)).toSet
    val victims = docs0.orderBy("docId").limit(3)
      .select(col("url"), col("bucket")).collect()
    val victimBuckets = victims.map(_.getInt(1)).toSet
    val untouched = (0 until 4).filterNot(victimBuckets.contains)
    val beforeUntouched = untouched.map(b => b -> contentHash(s"$dir/docs/dbucket=$b")).toMap

    import spark.implicits._
    val updates = victims.map(r => (r.getString(0), Long.MaxValue - 1)).toSeq
      .toDF("url", "version")
    val nUp = StreamIngest.upsertDocs(spark, updates, dir)
    assert(nUp === 3L)

    val docs1 = spark.read.parquet(s"$dir/docs")
    assert(docs1.count() === 200L, "upsert must not change row count")
    assert(docs1.filter(col("version") === Long.MaxValue - 1).count() === 3L)
    // docIds stable (doc-as-upsert keeps identity)
    assert(docs1.select("docId").collect().map(_.getLong(0)).toSet === ids0)
    untouched.foreach { b =>
      assert(contentHash(s"$dir/docs/dbucket=$b") === beforeUntouched(b),
        s"bucket $b was rewritten but contains no upserted row")
    }
    // idempotent: same update again is a no-op (version no longer strictly newer)
    assert(StreamIngest.upsertDocs(spark, updates, dir) === 0L)
  }

  test("upsert keeps the urlmap recrawl-lookup in step") {
    val pages = Corpus.synthetic(120, seed = 53L)
    val dir = Files.createTempDirectory("ups-idx3").toString
    graft.index.IndexBuilder.build(spark,
      spark.createDataset(pages)(Encoders.product[PageDoc]), dir,
      graft.index.IndexBuilder.Config(numBuckets = 4))
    StreamIngest.bootstrapSideTables(spark, dir)
    import spark.implicits._
    val victim = pages.head.url
    val updates = Seq((victim, Long.MaxValue - 1)).toDF("url", "version")
    assert(StreamIngest.upsertDocs(spark, updates, dir) === 1L)
    val v = spark.read.parquet(s"$dir/urlmap").filter(col("url") === victim)
      .agg(max("version")).head().getLong(0)
    assert(v === Long.MaxValue - 1, "urlmap must reflect the upserted version")
    // a stale intermediate recrawl must now be rejected by appendBatch
    val stale = pages.head.copy(warc_ts = new java.sql.Timestamp(
      pages.head.warc_ts.getTime + 86400000L))
    StreamIngest.appendBatch(spark,
      spark.createDataset(Seq(stale))(Encoders.product[PageDoc]), dir,
      bucketSize = 64, snapshotId = 9)
    assert(spark.read.parquet(s"$dir/docs").count() === 120L,
      "intermediate-version recrawl must be dropped after upsert")
  }

  test("deleteByQuery tombstones matching docs and shrinks stats") {
    val pages = Corpus.synthetic(300, seed = 37L)
    val dir = Files.createTempDirectory("dbq-idx").toString
    graft.index.IndexBuilder.build(spark,
      spark.createDataset(pages)(Encoders.product[PageDoc]), dir,
      graft.index.IndexBuilder.Config(numBuckets = 4))
    import spark.implicits._
    val n0 = spark.read.parquet(s"$dir/stats").as[graft.model.CorpusStats].head().n
    val killed = StreamIngest.deleteByQuery(spark, dir,
      col("url").rlike("/site0/"), snapshotId = 2)
    assert(killed > 0)
    val st = spark.read.parquet(s"$dir/stats").as[graft.model.CorpusStats].head()
    assert(st.n === n0 - killed)
    // deleted docs never surface in queries
    val hits = graft.query.QueryEngine.topK(spark, dir, Seq("q" -> "the"), 300).collect()
    val urls = spark.read.parquet(s"$dir/docs")
      .select("docId", "url").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hits.forall(h => !urls(h.docId).contains("/site0/")))
  }

  test("dropNamespace deletes exactly the namespace's docs (F4 drop-op scoping)") {
    val pages = Corpus.synthetic(200, seed = 41L) // urls testdata-shaped? no: example.org/siteN
    val dir = Files.createTempDirectory("drop-idx").toString
    graft.index.IndexBuilder.build(spark,
      spark.createDataset(pages)(Encoders.product[PageDoc]), dir,
      graft.index.IndexBuilder.Config(numBuckets = 4))
    val killed = StreamIngest.dropNamespace(spark, dir, "site3", snapshotId = 2)
    assert(killed === pages.count(_.url.contains("/site3/")).toLong)
    StreamIngest.compact(spark, dir)
    val urls = spark.read.parquet(s"$dir/docs").select("url").collect().map(_.getString(0))
    assert(!urls.exists(_.contains("/site3/")))
    assert(urls.length === 200 - killed)
  }

  test("sniff identifies png/jpeg/riff/html/unknown magic bytes") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0x89, 0x50, 0x4e, 0x47, 1, 2).map(_.toByte), "png"),
      (2L, Array(0xff, 0xd8, 0xff, 0xe0, 9).map(_.toByte), "jpeg"),
      (3L, "RIFFxxxx".getBytes("ASCII"), "riff"),
      (4L, "<HTML><body>x".getBytes("ASCII"), "html"),
      (5L, Array(0x00, 0x01, 0x02, 0x03).map(_.toByte), "unknown"))
    val df = rows.map { case (id, b, _) => (id, b) }.toDF("doc_id", "payload")
    val got = graft.ops.Multimodal.mediaMeta(df)
      .select("doc_id", "kind").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, _, want) => assert(got(id) === want, s"doc $id") }
  }
}
