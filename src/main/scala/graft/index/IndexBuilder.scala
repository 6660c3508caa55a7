package graft.index

import graft.codec.Blocks
import graft.model._
import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The batch index build — the Spark-first replacement for the reference's
  * direct-read → bulk-index pipeline (`monstache.go:4885-4893` →
  * `monstache.go:3160-3293`), with the Elasticsearch half re-implemented
  * from scratch (SURVEY.md §7).
  *
  * Architecture: a **document-partitioned** inverted index. Documents get
  * dense deterministic docIds (dense rank over `xxhash64(url)`, FIXTURES.md
  * §1) and are sharded into docId-range *buckets*. Every bucket holds a
  * complete mini-index (postings for all its docs' terms). This docId-range
  * bucketing IS the salted-key skew handling the north star requires: a head
  * term ("the", in ~every page) is split across all buckets by construction,
  * its global posting list being the concatenation of its per-bucket rows in
  * bucket order (buckets are docId-range-disjoint, so the merge is
  * order-preserving — SURVEY.md §7.4.2). No single task ever materializes a
  * full head-term posting list, at any scale.
  *
  * Shuffle budget (the whole build):
  *   1. hash-by-url dedup (last-writer-wins by version, reference analog
  *      `monstache.go:4053-4063`);
  *   2. docId-range assignment (repartition by hash-range id);
  *   3. term-stats aggregate (partial+final hash agg, map-side combined);
  *   4. repartition postings by bucket + in-partition sort (term, docId).
  * All four shuffle keys are either near-uniform hashes or bounded ranges —
  * no skewed key ever becomes a hot partition.
  */
object IndexBuilder {

  /** Number of hash ranges used for deterministic dense docId assignment.
    * Counts per range are collected to the driver (4096 longs) — scales to
    * any corpus size since only the *counts* travel.
    */
  val IdRanges = 4096

  final case class Config(
      numBuckets: Int = 32,
      snapshotId: Long = 1L,
      parquetCodec: String = "zstd"
  )

  final case class BuildResult(
      stats: CorpusStats,
      numBuckets: Int,
      indexDir: String
  )

  // ---------------------------------------------------------------- docId

  /** Dense deterministic docId assignment, scalable two-pass:
    * pass 1 counts docs per hash range (tiny driver collect), pass 2 ranks
    * within ranges using broadcast offsets. Deterministic regardless of
    * input partitioning (never `monotonically_increasing_id`, SURVEY.md
    * §7.4.4): docId = rank of (xxhash64(url), url) ascending.
    */
  def assignDocIds(spark: SparkSession, deduped: DataFrame, numBuckets: Int): Dataset[(Long, Int, String, Long, String)] = {
    import spark.implicits._
    val hashed = deduped
      .withColumn("h", xxhash64(col("url")))
      .withColumn("rangeId", shiftrightunsigned(col("h"), 64 - 12).cast("int"))

    val counts: Array[(Int, Long)] = hashed
      .groupBy("rangeId").count()
      .as[(Int, Long)].collect().sortBy(_._1)

    val total = counts.map(_._2).sum
    val offsets = new Array[Long](IdRanges)
    var acc = 0L
    val cmap = counts.toMap
    var r = 0
    while (r < IdRanges) {
      offsets(r) = acc
      acc += cmap.getOrElse(r, 0L)
      r += 1
    }
    val bucketSize = math.max(1L, (total + numBuckets - 1) / numBuckets)
    val offsetsB = spark.sparkContext.broadcast(offsets)

    hashed
      .select(col("rangeId"), col("h"), col("url"), col("version"), col("text"))
      .repartition(col("rangeId"))
      .sortWithinPartitions(col("rangeId"), col("h"), col("url"))
      .as[(Int, Long, String, Long, String)]
      .mapPartitions { it =>
        val offs = offsetsB.value
        var curRange = -1
        var next = 0L
        it.map { case (rangeId, _, url, version, text) =>
          if (rangeId != curRange) { curRange = rangeId; next = offs(rangeId) }
          val docId = next
          next += 1
          val bucket = (docId / bucketSize).toInt
          (docId, bucket, url, version, text)
        }
      }
  }

  // ---------------------------------------------------------------- build

  /** Full build. `pages` is the canonical page table; text extraction has
    * already populated `text` (the byte-identity invariant is tested
    * separately against `html`).
    */
  def build(spark: SparkSession, pages: Dataset[PageDoc], indexDir: String, cfg: Config = Config()): BuildResult = {
    // 1. version = packed timestamp (reference tsVersion `(t<<32)|i`,
    //    monstache.go:4053-4063); last-writer-wins dedup per url (W1/X2).
    val versioned = pages.toDF()
      .withColumn("version", shiftleft(unix_timestamp(col("warc_ts")), 32))
    val byUrl = Window.partitionBy(col("url")).orderBy(col("version").desc)
    val deduped = versioned
      .withColumn("rn", row_number().over(byUrl))
      .filter(col("rn") === 1)
      .select("url", "version", "text")

    // 2. deterministic dense docIds + buckets
    val assigned = assignDocIds(spark, deduped, cfg.numBuckets)
      .toDF("docId", "bucket", "url", "version", "text")
    buildFromAssigned(spark, assigned, indexDir, cfg)
  }

  /** Build from pre-assigned (docId, bucket, url, version, text) rows —
    * used directly when the corpus already carries stable ids (e.g. the
    * driver harness' `documents.doc_id`). Buckets must be
    * docId-range-disjoint.
    */
  def buildFromAssigned(spark: SparkSession, assignedIn: DataFrame, indexDir: String, cfg: Config = Config()): BuildResult = {
    import spark.implicits._
    val assigned = assignedIn.select("docId", "bucket", "url", "version", "text").cache()

    // 3. docs table (docId, bucket, url, doclen, version)
    val docs = assigned
      .as[(Long, Int, String, Long, String)]
      .map { case (docId, bucket, url, version, text) =>
        IndexedDoc(docId, bucket, url, TextPrep.doclen(text), version)
      }
    docs.toDF()
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .write.mode(SaveMode.Overwrite)
      .option("compression", cfg.parquetCodec)
      .parquet(s"$indexDir/docs")

    val docsR = spark.read.parquet(s"$indexDir/docs")

    // 4. corpus stats via Catalyst aggregates; avgdl as an explicit
    //    sum/count double division so the oracle reproduces it bit-exactly.
    val st = docsR.agg(count(lit(1)).as("n"), sum(col("doclen")).as("tot")).head()
    val n = st.getLong(0)
    val totalTokens = st.getLong(1)
    val avgdl = totalTokens.toDouble / n.toDouble
    val stats = CorpusStats(n, avgdl, totalTokens, cfg.snapshotId)

    // 5. postings: per-doc tf computed inside the flatMap (map-side
    //    pre-aggregation — the shuffle carries (term, docId, tf), never raw
    //    token streams).
    val postings = assigned
      .as[(Long, Int, String, Long, String)]
      .flatMap { case (docId, bucket, _, _, text) =>
        val tfs = TextPrep.termFreqs(text)
        val dl = tfs.map(_._2).sum
        tfs.iterator.map { case (term, tf) => Posting(bucket, term, docId, tf, dl) }
      }

    // 6. global term dictionary: df, cf, global max partial (WAND term upper
    //    bound). Two-phase hash agg — Spark map-side combines automatically.
    postings
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("cf"),
        max(bm25PartialCol(col("tf"), col("doclen"), avgdl)).as("maxPartial")
      )
      .repartitionByRange(math.max(1, cfg.numBuckets / 4), col("term"))
      .sortWithinPartitions("term")
      .write.mode(SaveMode.Overwrite)
      .option("compression", cfg.parquetCodec)
      .parquet(s"$indexDir/terms")

    // 7. posting blocks: one shuffle by bucket, in-partition sort by
    //    (term, docId), then streaming block compression per (bucket, term).
    //    Spill-safe: the external sorter owns the sort; the block writer
    //    only ever buffers one term-run of one bucket.
    val blocksDF = postings
      .repartition(cfg.numBuckets, col("bucket"))
      .sortWithinPartitions("bucket", "term", "docId")
      .as[Posting]
      .mapPartitions(it => blockify(it, avgdl))
    blocksDF.toDF()
      .withColumn("pbucket", col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("pbucket")
      .option("compression", cfg.parquetCodec)
      .parquet(s"$indexDir/postings")

    // 8. stats + lineage — written strictly AFTER data (flush-then-save
    //    ordering, reference `monstache.go:4939-4940`).
    Seq(stats).toDS().write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")

    val postR = spark.read.parquet(s"$indexDir/postings")
    val now = new Timestamp(System.currentTimeMillis())
    val lineage = postR
      .select(col("bucket"),
        explode(col("blocks")).as("b"))
      .select(col("bucket"), col("b.firstDocId"), col("b.lastDocId"),
        (length(col("b.docBytes")) + length(col("b.tfBytes")) + length(col("b.dlBytes"))).cast("long").as("bytes"))
      .groupBy("bucket")
      .agg(min("firstDocId").as("docIdMin"), max("lastDocId").as("docIdMax"),
        sum("bytes").as("postingBytes"))
      .join(
        postR.groupBy("bucket").agg(count_distinct(col("term")).as("termCount")),
        Seq("bucket"))
      .select(
        col("bucket").cast("int").as("partitionId"),
        col("docIdMin"), col("docIdMax"), col("postingBytes"), col("termCount"),
        lit(cfg.snapshotId).as("snapshotId"), lit(now).as("ts"))
    lineage.as[LineageRow].write.mode(SaveMode.Overwrite).parquet(s"$indexDir/lineage")

    assigned.unpersist()
    BuildResult(stats, cfg.numBuckets, indexDir)
  }

  /** BM25 partial as a Catalyst column (codegen'd — no UDF). Same frozen
    * literals as `Bm25.partial` so bounds are bit-consistent with scores.
    */
  def bm25PartialCol(tf: org.apache.spark.sql.Column, doclen: org.apache.spark.sql.Column, avgdl: Double): org.apache.spark.sql.Column =
    tf * lit(2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * doclen / lit(avgdl)))

  /** Consume a (bucket, term, docId)-sorted posting stream, emitting one
    * TermPostings row per (bucket, term) with compressed blocks. Bounded
    * memory: buffers exactly one term-run.
    */
  private def blockify(it: Iterator[Posting], avgdl: Double): Iterator[TermPostings] =
    new Iterator[TermPostings] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): TermPostings = {
        val head = buf.head
        val docIds = scala.collection.mutable.ArrayBuffer.empty[Long]
        val tfs = scala.collection.mutable.ArrayBuffer.empty[Int]
        val dls = scala.collection.mutable.ArrayBuffer.empty[Int]
        while (buf.hasNext && buf.head.bucket == head.bucket && buf.head.term == head.term) {
          val p = buf.next()
          docIds += p.docId; tfs += p.tf; dls += p.doclen
        }
        val blocks = Blocks.build(docIds.toArray, tfs.toArray, dls.toArray, avgdl)
        TermPostings(head.bucket, head.term, docIds.length.toLong,
          blocks.map(_.maxPartial).max, blocks)
      }
    }
}
