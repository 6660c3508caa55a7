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
  * tombstones (reference delete strategy W3, `monstache.go:4065-4147`).
  *
  * Per-batch cost is O(batch), never O(index) — the reference's bulk path
  * is O(batch) by construction (`monstache.go:657-670`) and so is this one:
  *   - recrawl detection reads the url-hash-partitioned `urlmap` side table
  *     with partition pruning + a broadcast semi-join on the batch's urls
  *     (no shuffle of index-sized data);
  *   - corpus stats are updated incrementally (n/totalTokens deltas);
  *   - the term dictionary gains one SEGMENT per batch (only the batch's
  *     terms), aggregated on read — never re-aggregated from the full
  *     postings table;
  *   - docId/bucket high-water marks live in a one-row `docmeta` table.
  *
  * Checkpointing: Structured Streaming's checkpoint dir handles source
  * offsets (reference resume-token strategy X4); the index itself is
  * idempotent per batch because batch writes land in fresh buckets and
  * tombstones are a union (at-least-once + idempotent = effectively-once,
  * the reference's exactly-once story, `monstache.go:568-571`).
  */
object StreamIngest {

  /** url-hash partition count of the `urlmap` recrawl-lookup table. */
  val UrlRanges = 64

  private def urange(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(UrlRanges.toLong)).cast("int")

  /** Append one batch of pages to an existing (or empty) index dir. */
  def appendBatch(spark: SparkSession, batch: Dataset[PageDoc], indexDir: String,
      bucketSize: Long = 1 << 16, snapshotId: Long = 1L): Unit =
    appendBatchDF(spark, batch.toDF(), indexDir, bucketSize, snapshotId)

  /** [[appendBatch]] over a frame that may carry the per-doc meta override
    * channel (the reference's `parseIndexMeta` / `MapperPluginOutput`
    * surface, `monstache.go:1080-1103`, `monstachemap/plugin.go:19-44`):
    *
    *  - `meta_version: long` — overrides the ts-derived LWW version (ES
    *    external versioning); null falls through to `warc_ts << 32`.
    *  - `meta_routing: string` — ES routing: docs sharing a routing value
    *    are co-located in the same fresh bucket(s) (contiguous docId
    *    sub-ranges per routing group, so the docId-range-disjoint bucket
    *    invariant is preserved); null joins the default ("") group.
    *
    * `meta_index` / `meta_skip` / `meta_drop` are resolved by
    * [[appendBatchWithMeta]] before this point.
    */
  def appendBatchDF(spark: SparkSession, batchIn: DataFrame, indexDir: String,
      bucketSize: Long = 1 << 16, snapshotId: Long = 1L): Unit = {
    import spark.implicits._
    val t0 = System.nanoTime()

    // in-batch last-writer-wins by version (W1/X2); version/routing come
    // from the meta channel when present
    val tsVersion = shiftleft(unix_timestamp(col("warc_ts")), 32)
    val versioned = batchIn
      .withColumn("version",
        if (batchIn.columns.contains("meta_version"))
          coalesce(col("meta_version"), tsVersion) else tsVersion)
      .withColumn("routing",
        if (batchIn.columns.contains("meta_routing"))
          coalesce(col("meta_routing"), lit("")) else lit(""))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url")).orderBy(col("version").desc)
    val deduped = versioned.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("url", "version", "text", "routing")

    val docsPath = s"$indexDir/docs"
    val hasBase = exists(spark, docsPath)
    if (hasBase) bootstrapSideTables(spark, indexDir)
    // the batch tokenizes with the index's RECORDED analyzer (a stream onto
    // a fresh dir records the build default first, so base + appends are
    // always analyzer-consistent)
    if (!exists(spark, s"$indexDir/meta"))
      IndexBuilder.writeMeta(spark, indexDir, IndexBuilder.Config().analyzer)
    val an = IndexBuilder.analyzerOf(spark, indexDir)

    // docmeta is the batch COMMIT POINT: pre-batch high-water marks AND
    // corpus totals come from it alone, and it is overwritten last (just
    // before the snapshot marker). A retried at-least-once batch therefore
    // recomputes the identical docIds/buckets/deltas, and the data writes
    // below are dynamic partition OVERWRITES of the batch's fresh
    // partitions — a crashed attempt's partial output is replaced, never
    // double-counted.
    val (maxDocId, maxBucket, oldN, oldTot) =
      if (hasBase) {
        val m = spark.read.parquet(s"$indexDir/docmeta").head()
        (m.getLong(0), m.getInt(1), m.getLong(2), m.getLong(3))
      } else (-1L, -1, 0L, 0L)

    // ---- recrawl detection, O(batch): partition-pruned urlmap read +
    // broadcast semi-join on the batch's urls (the index side is never
    // shuffled; scan touches only the batch's url-hash ranges) ----
    val existing: DataFrame =
      if (hasBase) {
        val batchUrls = deduped.select(col("url")).distinct()
        val ranges = batchUrls.select(urange(col("url")).as("r")).distinct().as[Int].collect()
        spark.read.parquet(s"$indexDir/urlmap")
          .filter(col("urange").isin(ranges.toSeq: _*))
          .join(broadcast(batchUrls), Seq("url"), "left_semi")
          // a recrawled url has multiple rows; only its latest version counts
          .groupBy("url").agg(max(struct(col("version"), col("docId"), col("doclen"))).as("m"))
          .select(col("url"), col("m.docId").as("docId"),
            col("m.version").as("version"), col("m.doclen").as("doclen"))
      } else spark.emptyDataset[(String, Long, Long, Int)]
        .toDF("url", "docId", "version", "doclen")

    // matched subset is O(batch) → broadcast right side of the left join.
    // The batch's admission decisions are STAGED to durable storage BEFORE
    // any index table is mutated: the lazy plans above read urlmap, and the
    // appends below write urlmap — without the staging barrier any plan
    // re-evaluation mid-batch would observe its own writes (lost batch).
    val staging = s"$indexDir/_staging/batch"
    delete(spark, staging)
    val joined = deduped.alias("n")
      .join(broadcast(existing.alias("e")), Seq("url"), "left")
      .filter(col("e.docId").isNull || col("n.version") > col("e.version"))
      .select(col("url"), col("n.version").as("version"), col("text"), col("routing"),
        col("e.docId").as("oldDocId"), col("e.doclen").as("oldDoclen"))
    joined.write.mode(SaveMode.Overwrite).parquet(s"$staging/admitted")
    val admitted = spark.read.parquet(s"$staging/admitted")
    val fresh = admitted.select("url", "version", "text", "routing")
    val tombstones = admitted.filter(col("oldDocId").isNotNull)
      .select(col("oldDocId").as("docId"), col("oldDoclen").as("doclen"))

    if (fresh.isEmpty) {
      // crash-window repair: if a prior attempt of this batch died between
      // its urlmap append and its docmeta commit, the urls are "already
      // ingested" (data writes are durable — they precede urlmap) but the
      // high-water marks were never advanced. Re-derive docmeta so the next
      // batch cannot overwrite the orphaned buckets.
      if (hasBase) {
        val seenMax = existing.agg(coalesce(max("docId"), lit(-1L))).head().getLong(0)
        if (seenMax > maxDocId) {
          val mm = spark.read.parquet(docsPath).agg(max("docId"), max("bucket")).head()
          val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
          writeDocMeta(spark, indexDir, mm.getLong(0), mm.getInt(1), st.n, st.totalTokens)
        }
      }
      delete(spark, staging); return
    }

    // deterministic-within-batch id assignment continuing after maxDocId;
    // fresh buckets start beyond the base index's highest bucket; routing
    // groups get contiguous docId sub-ranges → dedicated fresh bucket(s).
    // The tokenize runs ONCE here; docs/postings/stats all derive from the
    // staged result.
    assignDocIdsRouted(spark, fresh, bucketSize, maxDocId, maxBucket)
      .map { case (docId, bucket, url, version, text) =>
        val tfs = an.termFreqs(text)
        var dl = 0
        tfs.foreach(dl += _._2)
        (docId, bucket, url, version, dl, tfs.map(_._1), tfs.map(_._2))
      }
      .toDF("docId", "bucket", "url", "version", "doclen", "terms", "tfs")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/assigned")
    val assigned = spark.read.parquet(s"$staging/assigned")

    // docs in fresh buckets (same layout as the batch build); dynamic
    // overwrite of exactly the batch's dbuckets — retry-safe
    assigned.select("docId", "bucket", "url", "doclen", "version")
      .withColumn("dbucket", col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dbucket").parquet(docsPath)

    // postings for the batch's buckets: dynamic overwrite of those pbuckets
    // (SPIMI inversion over the batch's fat rows — same path as the build)
    IndexBuilder.writePostingsSegmentFat(spark,
      assigned.select("bucket", "docId", "doclen", "terms", "tfs"),
      s"$indexDir/postings", append = false)

    // positional sidecar, iff this index maintains one: tokenize-with-
    // positions over the batch's admitted text only, dynamic overwrite of
    // the batch's fresh pbuckets — O(batch) and retry-safe like the rest
    if (exists(spark, s"$indexDir/positions"))
      graft.index.Positions.writeSegment(spark,
        assigned.select(col("docId"), col("bucket"), col("url"))
          .join(admitted.select(col("url"), col("text")), Seq("url"))
          .select("docId", "bucket", "text"),
        s"$indexDir/positions",
        parts = spark.sessionState.conf.numShufflePartitions,
        analyzer = an)

    // forward-index sidecar, iff this index maintains one: the batch's
    // (docId, term, tf) rows from the already-staged arrays (no re-tokenize),
    // dynamic overwrite of the fresh tvbuckets — O(batch), retry-safe
    if (exists(spark, s"$indexDir/termvectors"))
      assigned.select(col("bucket"), col("docId"),
          explode(arrays_zip(col("terms"), col("tfs"))).as("tt"))
        .select(col("bucket"), col("docId"),
          col("tt.terms").as("term"), col("tt.tfs").as("tf"))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", "docId", "term")
        .withColumn("tvbucket", col("bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tvbucket")
        .parquet(s"$indexDir/termvectors")

    val fAgg = assigned.agg(
      coalesce(sum(when(col("doclen") > 0, 1L).otherwise(0L)), lit(0L)).as("cpos"),
      coalesce(sum("doclen").cast("long"), lit(0L)).as("tok"),
      max("docId").as("maxId"), max("bucket").as("maxB")).head()

    // ---- term-dictionary SEGMENT seg=snapshotId: aggregate only the
    // batch's buckets (partition-pruned postings read), dynamic overwrite
    // of this snapshot's segment; readers sum segments. df/cf of
    // tombstoned docs remain counted until compact() — a documented upper
    // bound, harmless to WAND admissibility.
    val newBuckets = ((maxBucket + 1) to fAgg.getInt(3)).map(Int.box)
    IndexBuilder.writeTermsSegment(spark, indexDir,
      col("pbucket").isin(newBuckets: _*), seg = snapshotId)
    IndexBuilder.appendLineage(spark, indexDir,
      col("pbucket").isin(newBuckets: _*), snapshotId)

    val tombAgg = tombstones.agg(
      count(lit(1)).as("c"),
      coalesce(sum(when(col("doclen") > 0, 1L).otherwise(0L)), lit(0L)).as("cpos"),
      coalesce(sum("doclen").cast("long"), lit(0L)).as("tok")).head()
    if (tombAgg.getLong(0) > 0)
      tombstones.select(col("docId"), lit(snapshotId).as("snapshotId"))
        .write.mode(SaveMode.Append).parquet(s"$indexDir/tombstones")

    // ---- incremental stats: O(batch) deltas from the docmeta base, never
    // a full-docs rescan. N counts docs with doclen > 0 only (idf parity
    // with the oracle). Idempotent under retry: the base is the
    // still-uncommitted docmeta.
    val n = oldN + fAgg.getLong(0) - tombAgg.getLong(1)
    val tot = oldTot + fAgg.getLong(1) - tombAgg.getLong(2)
    Seq(CorpusStats(n, tot.toDouble / n.toDouble, tot, snapshotId)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")

    // urlmap append (partition-pruned lookups for future batches; duplicate
    // rows from a retried batch are collapsed by the max-struct read)
    assigned.select(col("url"), col("docId"), col("version"), col("doclen"))
      .withColumn("urange", urange(col("url")))
      .repartition(col("urange"))
      .write.mode(SaveMode.Append).partitionBy("urange").parquet(s"$indexDir/urlmap")

    // COMMIT: advance the high-water marks + totals, then the snapshot row
    writeDocMeta(spark, indexDir, fAgg.getLong(2), fAgg.getInt(3), n, tot)
    IndexBuilder.commitSnapshot(spark, indexDir, snapshotId, n)
    delete(spark, staging)
    IndexBuilder.writeStatus(spark, indexDir, "append", snapshotId,
      fAgg.getLong(0), (System.nanoTime() - t0) / 1e9, "{}")
  }

  /** One-time migration for indexes built before the side tables existed
    * (or by a plain batch build): derive `urlmap` + `docmeta` from the docs
    * table. O(index) ONCE, then every append is O(batch).
    */
  /** Deterministic batch-local docId/bucket assignment with ES-routing
    * co-location: ids are the rank over (routing asc, unsigned url-hash,
    * url), so each routing group owns a CONTIGUOUS docId sub-range and its
    * own fresh bucket range (the docId-range-disjoint mini-index invariant
    * is preserved — routing never scatters a bucket). With one default
    * routing group this degenerates to exactly the unrouted assignment
    * (rank over the url hash — byte-identical docIds/buckets to the
    * pre-meta path). Two-pass like `IndexBuilder.assignDocIds`: per-
    * (routing, hash-range) counts to the driver (bounded: 256 ranges × the
    * batch's distinct routing values), then one repartition +
    * in-partition sort + streaming rank — the batch is never collected.
    */
  private def assignDocIdsRouted(spark: SparkSession, fresh: DataFrame,
      bucketSize: Long, maxDocId: Long, maxBucket: Int): Dataset[(Long, Int, String, Long, String)] = {
    import spark.implicits._
    val R = 256
    val hashed = fresh
      .withColumn("h", xxhash64(col("url")))
      .withColumn("rangeId", shiftrightunsigned(col("h"), 64 - 8).cast("int"))
    val counts: Map[(String, Int), Long] = hashed.groupBy("routing", "rangeId")
      .agg(count(lit(1)).as("c")).as[(String, Int, Long)].collect()
      .map { case (r, g, c) => (r, g) -> c }.toMap
    val routings = counts.keysIterator.map(_._1).toSeq.distinct.sorted
    val offsets = scala.collection.mutable.HashMap.empty[(String, Int), Long]
    val bucketBases = scala.collection.mutable.HashMap.empty[String, (Int, Long)]
    var acc = maxDocId + 1
    var bacc = maxBucket + 1
    routings.foreach { r =>
      val gStart = acc
      var g = 0
      while (g < R) {
        val c = counts.getOrElse((r, g), 0L)
        if (c > 0) offsets((r, g)) = acc
        acc += c
        g += 1
      }
      bucketBases(r) = (bacc, gStart)
      val n = acc - gStart
      bacc += math.max(1L, (n + bucketSize - 1) / bucketSize).toInt
    }
    val offB = spark.sparkContext.broadcast(offsets.toMap)
    val baseB = spark.sparkContext.broadcast(bucketBases.toMap)
    val par = math.max(1, spark.sessionState.conf.numShufflePartitions)
    hashed.select(col("routing"), col("rangeId"), col("h"), col("url"),
        col("version"), col("text"))
      .repartition(par, col("routing"), col("rangeId"))
      .sortWithinPartitions(col("routing"), col("rangeId"), col("h"), col("url"))
      .as[(String, Int, Long, String, Long, String)]
      .mapPartitions { it =>
        val offs = offB.value
        val bases = baseB.value
        var curR: String = null
        var curG = -1
        var next = 0L
        it.map { case (routing, rangeId, _, url, version, text) =>
          if (routing != curR || rangeId != curG) {
            curR = routing; curG = rangeId; next = offs((routing, rangeId))
          }
          val docId = next
          next += 1
          val (bBase, gStart) = bases(routing)
          val bucket = bBase + ((docId - gStart) / bucketSize).toInt
          (docId, bucket, url, version, text)
        }
      }
  }

  /** The full per-doc meta override channel (the reference's
    * `parseIndexMeta` + plugin `MapperPluginOutput`,
    * `monstache.go:1080-1103`, `monstachemap/plugin.go:19-44`): on top of
    * [[appendBatchDF]]'s `meta_version`/`meta_routing`,
    *
    *  - `meta_index: string` — routes the doc to `baseDir/<index>` (its own
    *    complete index: docs/postings/stats/urlmap); null → `defaultIndex`.
    *  - `meta_skip: boolean` — the doc is ignored entirely (plugin Skip).
    *  - `meta_drop: boolean` — the doc is DELETED from its target index
    *    (plugin Drop → versioned tombstone via [[deleteByQuery]]).
    *
    * Returns the target index dirs touched, sorted. Target count is
    * config-bounded (index names), so the per-target loop is driver-side
    * dispatch, not data movement.
    */
  def appendBatchWithMeta(spark: SparkSession, batch: DataFrame, baseDir: String,
      defaultIndex: String, bucketSize: Long = 1 << 16, snapshotId: Long = 1L): Seq[String] = {
    import spark.implicits._
    def has(c: String) = batch.columns.contains(c)
    val unskipped =
      if (has("meta_skip")) batch.filter(col("meta_skip").isNull || !col("meta_skip"))
      else batch
    val withTarget = unskipped.withColumn("target",
      if (has("meta_index")) coalesce(col("meta_index"), lit(defaultIndex))
      else lit(defaultIndex))
    val targets = withTarget.select("target").distinct().as[String].collect().sorted
    targets.foreach { t =>
      val dir = s"$baseDir/$t"
      val rows = withTarget.filter(col("target") === t)
      val adds =
        if (has("meta_drop")) rows.filter(col("meta_drop").isNull || !col("meta_drop"))
        else rows
      appendBatchDF(spark,
        adds.drop("target", "meta_index", "meta_skip", "meta_drop"),
        dir, bucketSize, snapshotId)
      if (has("meta_drop")) {
        // batch-bounded url list; delete AFTER adds (an add+drop of the
        // same url within one batch nets to deleted — the reference's op
        // ordering within a bulk flush)
        val dropUrls = rows.filter(col("meta_drop") === true)
          .select("url").distinct().as[String].collect()
        if (dropUrls.nonEmpty && exists(spark, s"$dir/docs"))
          deleteByQuery(spark, dir, col("url").isin(dropUrls.toSeq: _*), snapshotId)
      }
    }
    targets.map(t => s"$baseDir/$t").toSeq
  }

  def bootstrapSideTables(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    val docsR = () => spark.read.parquet(s"$indexDir/docs")
    if (!exists(spark, s"$indexDir/urlmap"))
      docsR().select(col("url"), col("docId"), col("version"), col("doclen"))
        .withColumn("urange", urange(col("url")))
        .repartition(col("urange"))
        .write.mode(SaveMode.Overwrite).partitionBy("urange").parquet(s"$indexDir/urlmap")
    if (!exists(spark, s"$indexDir/docmeta")) {
      val mm = docsR().agg(max("docId"), max("bucket")).head()
      val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
      writeDocMeta(spark, indexDir, mm.getLong(0), mm.getInt(1), st.n, st.totalTokens)
    }
  }

  private def writeDocMeta(spark: SparkSession, indexDir: String, maxDocId: Long,
      maxBucket: Int, n: Long, totalTokens: Long): Unit = {
    import spark.implicits._
    Seq((maxDocId, maxBucket, n, totalTokens))
      .toDF("maxDocId", "maxBucket", "n", "totalTokens")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/docmeta")
  }

  /** Refresh docmeta after a maintenance op changed corpus totals. */
  private def refreshDocMeta(spark: SparkSession, indexDir: String, n: Long, tot: Long): Unit =
    if (exists(spark, s"$indexDir/docmeta")) {
      val mm = spark.read.parquet(s"$indexDir/docs").agg(max("docId"), max("bucket")).head()
      writeDocMeta(spark, indexDir, mm.getLong(0), mm.getInt(1), n, tot)
    }

  /** W4 — delete-by-query: tombstone every doc matching a predicate over
    * the docs table (reference `deleteByQuery`-style predicate delete); the
    * physical reclaim happens at the next compact().
    */
  def deleteByQuery(spark: SparkSession, indexDir: String,
      predicate: org.apache.spark.sql.Column, snapshotId: Long): Long = {
    val victims = spark.read.parquet(s"$indexDir/docs")
      .filter(predicate)
      .select(col("docId"), lit(snapshotId).as("snapshotId"))
    val c = victims.count()
    if (c > 0) {
      victims.write.mode(SaveMode.Append).parquet(s"$indexDir/tombstones")
      // stats shrink immediately so idf stays consistent with live docs
      import spark.implicits._
      val dead = spark.read.parquet(s"$indexDir/docs").filter(predicate)
        .agg(sum(when(col("doclen") > 0, 1L).otherwise(0L)),
          coalesce(sum("doclen"), lit(0L))).head()
      val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
      val n = st.n - dead.getLong(0)
      val tot = st.totalTokens - dead.getLong(1)
      Seq(CorpusStats(n, tot.toDouble / math.max(1L, n).toDouble, tot, snapshotId)).toDS()
        .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
      refreshDocMeta(spark, indexDir, n, tot)
      // deletes are snapshot commits too: a Scroll cursor opened after this
      // delete pins a view that excludes the victims (tombstone rows carry
      // this snapshotId), one opened before keeps them
      IndexBuilder.commitSnapshot(spark, indexDir, snapshotId, n)
    }
    c
  }

  /** F4 — drop-op scoping (`monstache.go:4065-4147` drop handling): a
    * dropped source namespace deletes every doc it contributed, as a
    * predicate delete over the url prefix; physical reclaim at compact().
    */
  def dropNamespace(spark: SparkSession, indexDir: String, namespace: String,
      snapshotId: Long): Long = {
    // namespace = the url authority (testdata://ns/...) or first path
    // segment (https://host/ns/...)
    val q = java.util.regex.Pattern.quote(namespace)
    deleteByQuery(spark, indexDir,
      col("url").rlike(s"^[a-z]+://($q/|[^/]+/$q/)"), snapshotId)
  }

  /** Compaction: rewrite buckets that contain tombstoned docs, dropping
    * dead postings, then clear tombstones and re-aggregate terms + stats.
    * The merge is order-preserving because buckets are docId-range-disjoint.
    *
    * Cluster-safe by construction: tombstones are joined (anti-join /
    * broadcast), never collected into an `isin` literal; staging lives
    * under `$indexDir/_staging` (shared storage all executors see), never
    * a driver-local temp dir.
    */
  def compact(spark: SparkSession, indexDir: String): Unit = {
    import spark.implicits._
    val t0 = System.nanoTime()
    if (!exists(spark, s"$indexDir/tombstones")) return
    val tombs = spark.read.parquet(s"$indexDir/tombstones").select("docId").distinct().cache()
    if (tombs.isEmpty) { tombs.unpersist(); return }

    val docsR = spark.read.parquet(s"$indexDir/docs")
    // bucket ids are bounded (thousands at 100 TB) — safe driver set
    val deadBuckets = docsR.join(tombs, Seq("docId")).select("bucket").distinct()
      .as[Int].collect().toSet

    // stage rewritten docs for affected buckets (cannot overwrite a path
    // being read), then dynamic-overwrite those buckets
    val staging = s"$indexDir/_staging"
    delete(spark, staging)
    docsR.filter(col("bucket").isin(deadBuckets.toSeq: _*))
      .join(tombs, Seq("docId"), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/docs")
    val stagedDocs = spark.read.parquet(s"$staging/docs")
    val liveBuckets = stagedDocs.select("bucket").distinct().as[Int].collect().toSet
    stagedDocs
      .withColumn("dbucket", col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dbucket").parquet(s"$indexDir/docs")
    // a bucket whose every doc died leaves no staged rows → dynamic
    // overwrite won't touch it; drop its partitions explicitly
    (deadBuckets -- liveBuckets).foreach { b =>
      delete(spark, s"$indexDir/docs/dbucket=$b")
    }

    // decode → anti-join-filter → re-encode postings of affected buckets
    spark.read.parquet(s"$indexDir/postings")
      .filter(col("bucket").isin(deadBuckets.toSeq: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
    val decoded = spark.read.parquet(s"$staging/postings").as[TermPostings]
      .flatMap { tp =>
        tp.blocks.iterator.flatMap { b =>
          val ids = graft.codec.Blocks.decodeDocIds(b)
          val tfs = graft.codec.Blocks.decodeTfs(b)
          val dls = graft.codec.Blocks.decodeDoclens(b)
          ids.indices.iterator.map(i => Posting(tp.bucket, tp.term, ids(i), tfs(i), dls(i)))
        }
      }
    val rebuilt = decoded.join(tombs, Seq("docId"), "left_anti").as[Posting]
    IndexBuilder.writePostingsSegment(spark, rebuilt, s"$indexDir/postings", append = false)
    (deadBuckets -- liveBuckets).foreach { b =>
      delete(spark, s"$indexDir/postings/pbucket=$b")
    }

    // positional sidecar (if maintained): anti-join out dead docs in the
    // affected buckets — same staging + dynamic-overwrite discipline
    if (exists(spark, s"$indexDir/positions")) {
      spark.read.parquet(s"$indexDir/positions")
        .filter(col("bucket").isin(deadBuckets.toSeq: _*))
        .select("bucket", "term", "docId", "positions")
        .join(tombs, Seq("docId"), "left_anti")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/positions")
      val stagedPos = spark.read.parquet(s"$staging/positions")
      stagedPos
        .withColumn("pbucket", col("bucket"))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", "term", "docId")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pbucket").parquet(s"$indexDir/positions")
      (deadBuckets -- liveBuckets).foreach { b =>
        delete(spark, s"$indexDir/positions/pbucket=$b")
      }
    }

    // forward-index sidecar (if maintained): same anti-join rewrite of the
    // affected tvbuckets
    if (exists(spark, s"$indexDir/termvectors")) {
      spark.read.parquet(s"$indexDir/termvectors")
        .filter(col("bucket").isin(deadBuckets.toSeq: _*))
        .select("bucket", "docId", "term", "tf")
        .join(tombs, Seq("docId"), "left_anti")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/termvectors")
      spark.read.parquet(s"$staging/termvectors")
        .withColumn("tvbucket", col("bucket"))
        .repartition(col("bucket"))
        .sortWithinPartitions("bucket", "docId", "term")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tvbucket").parquet(s"$indexDir/termvectors")
      (deadBuckets -- liveBuckets).foreach { b =>
        delete(spark, s"$indexDir/termvectors/tvbucket=$b")
      }
    }

    // recompute stats + terms over the compacted index; clear tombstones.
    // Terms re-agg here is the one full pass — compaction IS the amortized
    // O(affected) maintenance operation; appends stay O(batch).
    val st = spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
    val live = spark.read.parquet(s"$indexDir/docs").filter(col("doclen") > 0)
    val agg = live.agg(count(lit(1)).as("n"), sum(col("doclen")).as("tot")).head()
    Seq(CorpusStats(agg.getLong(0), agg.getLong(1).toDouble / agg.getLong(0), agg.getLong(1),
      st.snapshotId + 1)).toDS()
      .write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")
    IndexBuilder.writeTermsFromPostings(spark, indexDir)
    refreshDocMeta(spark, indexDir, agg.getLong(0), agg.getLong(1))
    tombs.unpersist()
    delete(spark, s"$indexDir/tombstones")
    delete(spark, staging)
    IndexBuilder.writeStatus(spark, indexDir, "compact", st.snapshotId + 1,
      agg.getLong(0), (System.nanoTime() - t0) / 1e9, "{}")
  }

  /** W2 — MERGE-style doc-as-upsert (`monstache.go:3183-3207`): rewrite IN
    * PLACE the docs-table rows of urls whose incoming version is strictly
    * higher, touching only affected dbucket partitions (the partition-
    * overwrite MERGE analog). Rows with version <= existing are dropped —
    * re-ingesting an identical batch rewrites nothing (byte-level no-op).
    *
    * Note: this updates doc METADATA (url/version fields) in place. Content
    * changes that alter postings go through appendBatch + tombstones —
    * an inverted index cannot edit postings in place at scale.
    */
  def upsertDocs(spark: SparkSession, updates: DataFrame, indexDir: String): Long = {
    import spark.implicits._
    val docsPath = s"$indexDir/docs"
    val docsR = spark.read.parquet(docsPath)
    val up = updates.select(col("url"), col("version").as("new_version"))
    // O(batch): broadcast the update keys; index side is never shuffled
    val hits = docsR.join(broadcast(up), Seq("url"))
      .filter(col("new_version") > col("version"))
      .select(col("docId"), col("bucket"), col("url"), col("doclen"),
        col("new_version").as("version"))
      .cache()
    val nHits = hits.count()
    if (nHits == 0) { hits.unpersist(); return 0L }

    val buckets = hits.select("bucket").distinct().as[Int].collect()
    val staging = s"$indexDir/_staging/upsert"
    delete(spark, staging)
    // merged view of affected buckets: replaced rows swapped in
    docsR.filter(col("bucket").isin(buckets.toSeq: _*))
      .select("docId", "bucket", "url", "doclen", "version")
      .join(broadcast(hits.select(col("docId").as("h_docId"))),
        col("docId") === col("h_docId"), "left_anti")
      .unionByName(hits.select("docId", "bucket", "url", "doclen", "version"))
      .write.mode(SaveMode.Overwrite).parquet(staging)
    // keep the recrawl-lookup table in step BEFORE overwriting docs (hits
    // reads docs — staging discipline): the upserted rows' new versions
    // must win the max-struct read, or a later append would re-admit an
    // intermediate version
    if (exists(spark, s"$indexDir/urlmap"))
      hits.select(col("url"), col("docId"), col("version"), col("doclen"))
        .withColumn("urange", urange(col("url")))
        .repartition(col("urange"))
        .write.mode(SaveMode.Append).partitionBy("urange").parquet(s"$indexDir/urlmap")
    spark.read.parquet(staging)
      .withColumn("dbucket", col("bucket"))
      .repartition(col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dbucket").parquet(docsPath)
    delete(spark, staging)
    hits.unpersist()
    nHits
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
