package graft

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.model._
import graft.query.{ExhaustiveScorer, QueryEngine}
import java.nio.file.Files

/** End-to-end: synthetic corpus → index build → WAND top-k must be
  * rank-identical (docIds AND scores, bit-for-bit) to the exhaustive
  * oracle (FIXTURES.md §3, `BASELINE.json` north_rule).
  */
class IndexEndToEndSpec extends SparkSpecBase {

  private lazy val tmp = Files.createTempDirectory("graftidx").toString
  private lazy val pages = Corpus.syntheticDS(spark, 1000, seed = 42L, parts = 8)
  private lazy val result = IndexBuilder.build(spark, pages, tmp,
    IndexBuilder.Config(numBuckets = 8))

  // query set per FIXTURES.md §3: rare term, head term, multi-term,
  // absent term, long query
  private val queries = Seq(
    "q_head"   -> "the",
    "q_body"   -> "spark index",
    "q_multi"  -> "the data spark query merge",
    "q_rare"   -> "rare42x0",
    "q_absent" -> "zzzznotaterm",
    "q_mixed"  -> "zzzznotaterm spark"
  )

  test("build produces all index tables with sane stats") {
    val stats = result.stats
    assert(stats.n === 1000L)
    assert(stats.avgdl > 8.0 && stats.avgdl < 512.0)
    val docs = spark.read.parquet(s"$tmp/docs")
    assert(docs.count() === 1000L)
    // docIds dense 0..N-1
    import org.apache.spark.sql.functions._
    val mm = docs.agg(min("docId"), max("docId"), countDistinct("docId")).head()
    assert(mm.getLong(0) === 0L && mm.getLong(1) === 999L && mm.getLong(2) === 1000L)
    assert(spark.read.parquet(s"$tmp/terms").count() > 0)
    assert(spark.read.parquet(s"$tmp/postings").count() > 0)
    val lineage = spark.read.parquet(s"$tmp/lineage")
    assert(lineage.count() === 8L)
  }

  test("head term is split across all buckets (skew handling)") {
    import org.apache.spark.sql.functions._
    val buckets = spark.read.parquet(s"$tmp/postings")
      .filter(col("term") === "the")
      .select("bucket").distinct().count()
    assert(buckets === 8L, "head term must appear in every bucket — no single-task posting list")
  }

  test("WAND top-k is rank-identical to exhaustive oracle (docIds + scores)") {
    val k = 10
    val wand = QueryEngine.topK(spark, tmp, queries, k).collect()
      .groupBy(_.queryId).view.mapValues(_.sortBy(_.rank)).toMap
    val oracle = ExhaustiveScorer.topKFromPages(spark, pages, queries, k, numBuckets = 8)
      .collect().groupBy(_.queryId).view.mapValues(_.sortBy(_.rank)).toMap

    queries.foreach { case (qid, qtext) =>
      val w = wand.getOrElse(qid, Array.empty[ScoredDoc])
      val o = oracle.getOrElse(qid, Array.empty[ScoredDoc])
      assert(w.length === o.length, s"$qid ('$qtext'): result sizes differ")
      w.zip(o).foreach { case (wr, or) =>
        assert(wr.docId === or.docId, s"$qid rank ${wr.rank}: docId ${wr.docId} vs ${or.docId}")
        assert(wr.score === or.score, s"$qid rank ${wr.rank} doc ${wr.docId}: score ${wr.score} vs ${or.score} (must be bit-identical)")
      }
    }
  }

  test("absent term returns empty; mixed query ignores absent term") {
    val res = QueryEngine.topK(spark, tmp, queries, 10).collect()
    assert(!res.exists(_.queryId == "q_absent"))
    assert(res.count(_.queryId == "q_mixed") > 0)
  }

  test("duplicate urls: last-writer-wins by version (W1/X2)") {
    import java.sql.Timestamp
    val base = Corpus.synthetic(50, seed = 21L)
    val p0 = base.head
    val recrawl = p0.copy(
      warc_ts = new Timestamp(p0.warc_ts.getTime + 86400000L),
      text = "newonlytoken content here",
      html = "<html><body>newonlytoken content here</body></html>".getBytes("UTF-8"))
    val stale = p0.copy(text = "oldstaletoken " + p0.text,
      html = ("<html><body>oldstaletoken " + p0.text + "</body></html>").getBytes("UTF-8"),
      warc_ts = new Timestamp(p0.warc_ts.getTime - 86400000L))
    val dir = java.nio.file.Files.createTempDirectory("idx-dup").toString
    import org.apache.spark.sql.Encoders
    val pagesDup = spark.createDataset(base ++ Seq(recrawl, stale))(Encoders.product[PageDoc])
    val r = IndexBuilder.build(spark, pagesDup, dir, IndexBuilder.Config(numBuckets = 4))
    assert(r.stats.n === 50L, "dedup must keep one row per url")
    val hitsNew = QueryEngine.topK(spark, dir, Seq("q" -> "newonlytoken"), 5).collect()
    assert(hitsNew.length === 1, "highest-version recrawl must win")
    val hitsOld = QueryEngine.topK(spark, dir, Seq("q" -> "oldstaletoken"), 5).collect()
    assert(hitsOld.isEmpty, "stale version must be dropped")
  }

  test("bucket of token-less docs builds without crashing (SPIMI empty bucket)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // bucket 0: real docs; bucket 1: every doc tokenizes to ZERO terms (the
    // non-ASCII-batch shape) — inversion of bucket 1 must yield an empty
    // iterator, not a NoSuchElementException
    val rows = (0L until 10L).map(i => (i, 0, s"u/$i", 0L, s"alpha beta tok$i")) ++
      (10L until 20L).map(i => (i, 1, s"u/$i", 0L, "!!! ??? ***"))
    val assigned = rows.toDF("docId", "bucket", "url", "version", "text")
    val dir = Files.createTempDirectory("idx-emptybucket").toString
    val r = IndexBuilder.buildFromAssigned(spark, assigned, dir,
      IndexBuilder.Config(numBuckets = 2))
    assert(r.stats.n === 10L, "stats.n counts only docs with tokens")
    val post = spark.read.parquet(s"$dir/postings")
    assert(post.filter(col("bucket") === 1).count() === 0L)
    val hits = QueryEngine.topK(spark, dir, Seq("q" -> "alpha"), 20).collect()
    assert(hits.length === 10)
    // trailing-empty-bucket order too: bucket 0 token-less, bucket 1 real
    val rows2 = (0L until 10L).map(i => (i, 0, s"v/$i", 0L, "!!!")) ++
      (10L until 20L).map(i => (i, 1, s"v/$i", 0L, "gamma delta"))
    val dir2 = Files.createTempDirectory("idx-emptybucket2").toString
    val r2 = IndexBuilder.buildFromAssigned(spark, rows2.toDF("docId", "bucket", "url", "version", "text"),
      dir2, IndexBuilder.Config(numBuckets = 2))
    assert(r2.stats.n === 10L)
    assert(QueryEngine.topK(spark, dir2, Seq("q" -> "gamma"), 20).collect().length === 10)
  }

  test("Config(positions = true): one-pass build is phrase-capable") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("idx-onepass").toString
    val r = IndexBuilder.build(spark, pages, dir,
      IndexBuilder.Config(numBuckets = 8, positions = true))
    assert(r.stats === result.stats, "positions flag must not perturb the core build")
    assert(spark.read.parquet(s"$dir/positions").count() > 0)
    // phrase from a real doc: first two tokens of the lowest-docId doc
    val txt = spark.read.parquet(s"$dir/docs").orderBy("docId").limit(1)
      .join(pages.toDF().select(col("url"), col("text")), Seq("url")).select("text")
      .head().getString(0)
    val ws = graft.textprep.TextPrep.tokenize(txt).take(2)
    assume(ws.length == 2)
    val phrase = Seq("p1" -> ws.mkString(" "))
    val onePass = graft.index.Positions.phraseMatch(spark, dir, phrase)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // twin: the standalone two-pass sidecar over the same assigned docs
    val sidecarDir = Files.createTempDirectory("idx-sidecar").toString
    val assigned = spark.read.parquet(s"$dir/docs")
      .join(pages.toDF().select(col("url"), col("text")), Seq("url"))
      .select(col("docId"), col("bucket"), col("text"))
    graft.index.Positions.build(spark, assigned, sidecarDir, numBuckets = 8)
    val twoPass = graft.index.Positions.phraseMatch(spark, sidecarDir, phrase)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(onePass.nonEmpty && onePass === twoPass)
  }

  test("sidecar files are internally sorted (row-group pruning contract)") {
    import org.apache.spark.sql.functions._
    // the fat-row-shuffle write path (repartition packed docs, explode
    // after) relies on Generate preserving the partition sort and on
    // array_sort's struct order matching the dictionary's code-point
    // order; if either breaks, parquet min/max pruning degrades silently
    // — assert per-FILE monotonic order for both sidecars
    val dir = Files.createTempDirectory("idx-sidecar-order").toString
    IndexBuilder.build(spark, pages, dir,
      IndexBuilder.Config(numBuckets = 8, positions = true, termVectors = true))
    def violations(table: String, bucketCol: String, strCol: String,
                   longCol: String, strFirst: Boolean): Long = {
      import spark.implicits._
      // per-partition scan in read order (a file this small is one split,
      // so read order IS file order); ASCII corpus makes String ordering
      // == the writer's code-point order
      spark.read.parquet(s"$dir/$table")
        .select(input_file_name().as("f"), col(bucketCol).cast("int"),
          col(strCol), col(longCol).cast("long"))
        .as[(String, Int, String, Long)]
        .mapPartitions { it =>
          var prev: (String, Int, String, Long) = null
          var bad = 0L
          it.foreach { r =>
            if (prev != null && prev._1 == r._1) {
              val dec =
                if (strFirst)
                  Ordering[(Int, String, Long)].gt((prev._2, prev._3, prev._4), (r._2, r._3, r._4))
                else
                  Ordering[(Int, Long, String)].gt((prev._2, prev._4, prev._3), (r._2, r._4, r._3))
              if (dec) bad += 1
            }
            prev = r
          }
          Iterator.single(bad)
        }.collect().sum
    }
    // positions: term-major within bucket (the phrase reader's seek order)
    assert(violations("positions", "bucket", "term", "docId", strFirst = true) === 0L)
    // termvectors: doc-major within bucket, term-sorted within doc (the
    // per-doc point-read order; docId min/max prunes row groups)
    assert(violations("termvectors", "bucket", "term", "docId", strFirst = false) === 0L)
  }

  test("rebuild is deterministic: same docIds, same stats") {
    val tmp2 = Files.createTempDirectory("graftidx2").toString
    // different input partitioning must not change any output
    val pages2 = Corpus.syntheticDS(spark, 1000, seed = 42L, parts = 3)
    val r2 = IndexBuilder.build(spark, pages2, tmp2, IndexBuilder.Config(numBuckets = 8))
    assert(r2.stats === result.stats)
    val d1 = spark.read.parquet(s"$tmp/docs").select("docId", "url", "doclen")
    val d2 = spark.read.parquet(s"$tmp2/docs").select("docId", "url", "doclen")
    assert(d1.except(d2).count() === 0 && d2.except(d1).count() === 0)
  }
}
