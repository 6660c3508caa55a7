package graft

import graft.model.PageDoc
import graft.query.QueryEngine
import graft.streaming.StreamIngest
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Per-doc meta override channel (reference parseIndexMeta
  * `monstache.go:1080-1103` + plugin surface `monstachemap/plugin.go:19-44`):
  * meta_index / meta_routing / meta_version / meta_skip / meta_drop.
  */
class DocMetaSpec extends SparkSpecBase {
  import spark.implicits._

  private def page(i: Int, text: String, ts: Long = 1735689600L): PageDoc =
    PageDoc(s"https://m.example/$i", new Timestamp((ts + i) * 1000L),
      ("<html><body>" + text + "</body></html>").getBytes(StandardCharsets.UTF_8),
      text, "en")

  test("meta_index routes to separate indexes; meta_skip drops; meta_drop tombstones") {
    val base = Files.createTempDirectory("meta-base").toString
    val rows = Seq(
      (page(0, "alpha spark data"), null, null: java.lang.Long, false, false),
      (page(1, "beta spark query"), "special", null: java.lang.Long, false, false),
      (page(2, "gamma spark index"), null, null: java.lang.Long, true, false), // skipped
      (page(3, "delta spark block"), null, null: java.lang.Long, false, false)
    ).map { case (p, idx, v, skip, drop) =>
      (p.url, p.warc_ts, p.html, p.text, p.lang, idx, v, skip, drop)
    }.toDF("url", "warc_ts", "html", "text", "lang",
      "meta_index", "meta_version", "meta_skip", "meta_drop")

    val dirs = StreamIngest.appendBatchWithMeta(spark, rows, base, "main",
      bucketSize = 8, snapshotId = 1)
    assert(dirs.toSet === Set(s"$base/main", s"$base/special"))

    val mainUrls = spark.read.parquet(s"$base/main/docs").select("url").as[String].collect().toSet
    val specUrls = spark.read.parquet(s"$base/special/docs").select("url").as[String].collect().toSet
    assert(mainUrls === Set("https://m.example/0", "https://m.example/3")) // 2 skipped
    assert(specUrls === Set("https://m.example/1"))

    // batch 2: drop doc 0 from main (tombstone, served queries exclude it)
    val drops = Seq((page(0, "alpha spark data", ts = 1735693200L), null: String,
        null: java.lang.Long, false, true))
      .map { case (p, idx, v, skip, drop) =>
        (p.url, p.warc_ts, p.html, p.text, p.lang, idx, v, skip, drop) }
      .toDF("url", "warc_ts", "html", "text", "lang",
        "meta_index", "meta_version", "meta_skip", "meta_drop")
    StreamIngest.appendBatchWithMeta(spark, drops, base, "main",
      bucketSize = 8, snapshotId = 2)
    val got = QueryEngine.topK(spark, s"$base/main", Seq("q" -> "alpha"), 5).collect()
    assert(got.isEmpty, "dropped doc must not be served")
    val still = QueryEngine.topK(spark, s"$base/main", Seq("q" -> "delta"), 5).collect()
    assert(still.length === 1)
  }

  test("meta_routing co-locates a routing group in its own contiguous buckets") {
    val base = Files.createTempDirectory("meta-route").toString
    val n = 64
    val rows = (0 until n).map { i =>
      val p = page(i, s"text token$i spark")
      (p.url, p.warc_ts, p.html, p.text, p.lang, s"r${i % 3}")
    }.toDF("url", "warc_ts", "html", "text", "lang", "meta_routing")
    StreamIngest.appendBatchWithMeta(spark, rows, base, "main",
      bucketSize = 8, snapshotId = 1)

    val docs = spark.read.parquet(s"$base/main/docs")
      .withColumn("i", regexp_extract(col("url"), "/(\\d+)$", 1).cast("int"))
      .withColumn("routing", concat(lit("r"), (col("i") % 3).cast("string")))
      .select("docId", "bucket", "routing")
      .as[(Long, Int, String)].collect()

    // bucket exclusivity: every bucket hosts exactly one routing value
    val byBucket = docs.groupBy(_._2).view.mapValues(_.map(_._3).distinct).toMap
    byBucket.foreach { case (b, rs) =>
      assert(rs.length === 1, s"bucket $b hosts routings ${rs.mkString(",")}")
    }
    // contiguity: each routing group's docIds form one dense range
    docs.groupBy(_._3).foreach { case (r, ds) =>
      val ids = ds.map(_._1).sorted
      assert(ids.last - ids.head + 1 === ids.length, s"routing $r ids not contiguous")
      // ceil(n/bucketSize) buckets for the group
      assert(ds.map(_._2).distinct.length === (ids.length + 7) / 8, s"routing $r bucket count")
    }
    // and the index still serves correctly (stats/postings coherent)
    val got = QueryEngine.topK(spark, s"$base/main", Seq("q" -> "token7"), 5).collect()
    assert(got.length === 1)
  }

  test("meta_version overrides LWW: lower external version rejected, higher admitted") {
    val base = Files.createTempDirectory("meta-ver").toString
    def batch(text: String, v: java.lang.Long, ts: Long) =
      Seq((page(0, text, ts), v)).map { case (p, ver) =>
        (p.url, p.warc_ts, p.html, p.text, p.lang, ver)
      }.toDF("url", "warc_ts", "html", "text", "lang", "meta_version")

    StreamIngest.appendBatchWithMeta(spark, batch("original spark", 100L, 1735689600L),
      base, "main", bucketSize = 8, snapshotId = 1)
    // later ts but LOWER external version: must be rejected
    StreamIngest.appendBatchWithMeta(spark, batch("stale recrawl", 50L, 1735776000L),
      base, "main", bucketSize = 8, snapshotId = 2)
    val t1 = QueryEngine.topK(spark, s"$base/main", Seq("q" -> "original"), 5).collect()
    assert(t1.length === 1, "lower external version must not replace the doc")
    // higher external version: replaces (old doc tombstoned)
    StreamIngest.appendBatchWithMeta(spark, batch("fresh recrawl spark", 200L, 1735689600L),
      base, "main", bucketSize = 8, snapshotId = 3)
    val t2 = QueryEngine.topK(spark, s"$base/main", Seq("q" -> "fresh"), 5).collect()
    assert(t2.length === 1)
    val t3 = QueryEngine.topK(spark, s"$base/main", Seq("q" -> "original"), 5).collect()
    assert(t3.isEmpty, "replaced doc must not be served")
  }
}
