package graft.streaming

import graft.index.IndexBuilder
import graft.model._
import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Incremental ingest — the reference's streaming path (SURVEY.md §3.1):
  * change events → transform → versioned append to the index, unified with
  * the batch build by sharing all transform functions (the same
  * tokenize/blockify code), exactly monstache's single `routeOp` for both
  * sources (`monstache.go:5079-5098`).
  *
  * Model: each micro-batch appends *new* documents (unseen urls, or
  * higher-version re-crawls) as fresh docId ranges → fresh buckets. Bucket
  * disjointness is preserved, so appended postings rows compose with the
  * base index with zero rewrites. Replaced urls' old docIds become
  * tombstones (reference delete strategy W3, `monstache.go:4065-4147`);
  * corpus stats + term dictionary are re-aggregated after each batch so
  * queries pin a consistent snapshot (SURVEY.md §7.4.5). Query-side,
  * tombstoned docs are dropped before scoring merge.
  *
  * Checkpointing: Structured Streaming's checkpoint dir handles source
  * offsets (reference resume-token strategy X4); the index itself is
  * idempotent per batch because batch writes land in fresh buckets and
  * tombstones are a union (at-least-once + idempotent = effectively-once,
  * the reference's exactly-once story, `monstache.go:568-571`).
  */
object StreamIngest {

  /** Append one batch of pages to an existing (or empty) index dir. */
  def appendBatch(spark: SparkSession, batch: Dataset[PageDoc], indexDir: String,
      bucketSize: Long = 1 << 16, snapshotId: Long = 1L): Unit = {
    import spark.implicits._

    // in-batch last-writer-wins by version (W1/X2)
    val versioned = batch.toDF()
      .withColumn("version", shiftleft(unix_timestamp(col("warc_ts")), 32))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("version").desc)
    val deduped = versioned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("url", "version", "text")

    val docsPath = s"$indexDir/docs"
    val hasBase = exists(spark, docsPath)
    val (maxDocId, maxBucket, existing) =
      if (hasBase) {
        val d = spark.read.parquet(docsPath)
        val mm = d.agg(max("docId"), max("bucket")).head()
        (mm.getLong(0), mm.getInt(1), d.select(col("url"), col("docId"), col("version")))
      } else (-1L, -1, spark.emptyDataset[(String, Long, Long)].toDF("url", "docId", "version"))

    // new urls, or re-crawls with strictly higher version
    val joined = deduped.alias("n")
      .join(existing.alias("e"), Seq("url"), "left")
      .filter(col("e.docId").isNull || col("n.version") > col("e.version"))
    val fresh = joined.select(col("url"), col("n.version").as("version"), col("text"))
    val tombstones = joined.filter(col("e.docId").isNotNull)
      .select(col("e.docId").as("docId"), lit(snapshotId).as("snapshotId"))

    if (fresh.isEmpty) return

    // deterministic-within-batch id assignment continuing after maxDocId;
    // fresh buckets start beyond the base index's highest bucket
    val assigned = IndexBuilder.assignDocIds(spark, fresh, numBuckets = 1)
      .map { case (localId, _, url, version, text) => (localId, url, version, text) }
      .toDF("localId", "url", "version", "text")
      .select(
        (col("localId") + lit(maxDocId + 1)).as("docId"),
        (lit(maxBucket + 1) + (col("localId") / lit(bucketSize)).cast("int")).as("bucket"),
        col("url"), col("version"), col("text"))

    // docs + postings append in fresh buckets (same code path as batch build)
    val docsNew = assigned.as[(Long, Int, String, Long, String)]
      .map { case (docId, bucket, url, version, text) =>
        IndexedDoc(docId, bucket, url, TextPrep.doclen(text), version)
      }
    docsNew.toDF()
      .withColumn("dbucket", col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .write.mode(SaveMode.Append).partitionBy("dbucket").parquet(docsPath)

    if (tombstones.limit(1).count() > 0)
      tombstones.write.mode(SaveMode.Append).parquet(s"$indexDir/tombstones")

    // stats over the full (appended) docs table, minus tombstones
    val docsR = spark.read.parquet(docsPath)
    val live = dropTombstones(spark, indexDir, docsR, "docId")
    val st = live.agg(count(lit(1)).as("n"), sum(col("doclen")).as("tot")).head()
    val n = st.getLong(0)
    val avgdl = st.getLong(1).toDouble / n.toDouble
    Seq(CorpusStats(n, avgdl, st.getLong(1), snapshotId)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")

    val postings = assigned.as[(Long, Int, String, Long, String)]
      .flatMap { case (docId, bucket, _, _, text) =>
        val tfs = TextPrep.termFreqs(text)
        val dl = tfs.map(_._2).sum
        tfs.iterator.map { case (term, tf) => Posting(bucket, term, docId, tf, dl) }
      }
    IndexBuilder.writePostingsSegment(spark, postings, s"$indexDir/postings", avgdl, append = true)

    // re-aggregate the term dictionary from compact postings, excluding
    // tombstoned docs' contributions is deferred to compaction; df/cf here
    // are upper bounds until compact() rewrites affected buckets.
    IndexBuilder.writeTermsFromPostings(spark, indexDir)
    IndexBuilder.commitSnapshot(spark, indexDir, snapshotId, n)
  }

  /** Compaction: rewrite buckets that contain tombstoned docs, dropping
    * dead postings, then clear tombstones and re-aggregate terms + stats.
    * The merge is order-preserving because buckets are docId-range-disjoint.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    if (!exists(spark, s"$indexDir/tombstones")) return
    val tombs = spark.read.parquet(s"$indexDir/tombstones").select("docId").distinct()
    val tombSet = tombs.as[Long].collect().toSet
    if (tombSet.isEmpty) return
    val tombB = spark.sparkContext.broadcast(tombSet)

    val docsR = spark.read.parquet(s"$indexDir/docs")
    val deadBuckets = docsR.join(tombs, Seq("docId")).select("bucket").distinct()
      .as[Int].collect().toSet

    // stage rewritten docs for affected buckets (cannot overwrite a path
    // being read), then dynamic-overwrite those buckets
    val staging = java.nio.file.Files.createTempDirectory("graft-compact").toString
    docsR.filter(col("bucket").isin(deadBuckets.toSeq: _*))
      .filter(!col("docId").isin(tombSet.toSeq: _*))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/docs")
    spark.read.parquet(s"$staging/docs")
      .withColumn("dbucket", col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dbucket").parquet(s"$indexDir/docs")

    val stats = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()

    // decode → filter → re-encode postings of affected buckets, staged
    spark.read.parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(deadBuckets.toSeq: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxPartial"),
        col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
    val postR = spark.read.parquet(s"$staging/postings").as[TermPostings]
    val rebuilt = postR.flatMap { tp =>
      val keep = tp.blocks.iterator.flatMap { b =>
        val ids = graft.codec.Blocks.decodeDocIds(b)
        val tfs = graft.codec.Blocks.decodeTfs(b)
        val dls = graft.codec.Blocks.decodeDoclens(b)
        ids.indices.iterator.collect {
          case i if !tombB.value.contains(ids(i)) => Posting(tp.bucket, tp.term, ids(i), tfs(i), dls(i))
        }
      }.toArray
      keep.iterator
    }
    IndexBuilder.writePostingsSegment(spark, rebuilt, s"$indexDir/postings",
      stats.avgdl, append = false)

    // recompute stats + terms over the compacted index; clear tombstones
    val live = spark.read.parquet(s"$indexDir/docs")
    val st = live.agg(count(lit(1)).as("n"), sum(col("doclen")).as("tot")).head()
    Seq(CorpusStats(st.getLong(0), st.getLong(1).toDouble / st.getLong(0), st.getLong(1),
      stats.snapshotId + 1)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
    IndexBuilder.writeTermsFromPostings(spark, indexDir)
    delete(spark, s"$indexDir/tombstones")
  }

  /** Structured Streaming entry: file-source over a directory of parquet
    * page files; each micro-batch runs appendBatch (foreachBatch — the
    * reference's bulk flush boundary A1).
    */
  def startFileStream(spark: SparkSession, srcDir: String, indexDir: String,
      checkpointDir: String, bucketSize: Long = 1 << 16): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[PageDoc].schema
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(spark, batch.as[PageDoc], indexDir, bucketSize, snapshotId = batchId + 1)
      }
      .start()
  }

  def dropTombstones(spark: SparkSession, indexDir: String, df: DataFrame, idCol: String): DataFrame =
    if (exists(spark, s"$indexDir/tombstones")) {
      val t = spark.read.parquet(s"$indexDir/tombstones").select(col("docId").as(idCol)).distinct()
      df.join(broadcast(t), Seq(idCol), "left_anti")
    } else df

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
