package graft.index

import graft.codec.Blocks
import graft.model._
import graft.textprep.TextPrep
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
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
  * Build phases (each resumable, reference flush-then-save ordering
  * `monstache.go:4939-4940`):
  *   1. docs: dedup by url version → deterministic docIds → docs table;
  *   2. stats: N/avgdl via Catalyst aggregates over the docs table;
  *   3. postings: per checkpoint-group, tokenize → shuffle by bucket →
  *      in-partition sort (term, docId) → streaming block compression →
  *      per-bucket dynamic-partition overwrite → lineage rows appended
  *      AFTER the group's data is visible;
  *   4. terms: global term dictionary aggregated from the compact postings
  *      (never from raw tokens — no second raw-token shuffle).
  *
  * Shuffle budget: url-hash dedup, rangeId repartition (docId assignment),
  * bucket repartition + sort, terms agg over compressed rows. All keys
  * near-uniform; no skewed key ever becomes a hot partition.
  */
object IndexBuilder {

  /** Hash ranges for deterministic dense docId assignment (only per-range
    * *counts* ever reach the driver → scales to any corpus).
    */
  val IdRanges = 4096

  final case class Config(
      numBuckets: Int = 32,
      snapshotId: Long = 1L,
      parquetCodec: String = "zstd",
      /** codec for the TRANSIENT staged table only (written once, scanned
        * by the docs/postings/positions phases, then dead): lz4 trades
        * ~1.4x size for a fraction of zstd's encode CPU — the staged write
        * is the single largest stage of the build (ClusterProf stage 44),
        * and the final index tables keep `parquetCodec`'s better ratio.
        */
      stagedCodec: String = "lz4",
      /** posting build is committed (data + lineage) in this many
        * independently-resumable groups of buckets
        */
      checkpointGroups: Int = 1,
      /** resume: skip buckets whose lineage rows exist for snapshotId */
      resume: Boolean = false,
      /** also build the positional sidecar in the SAME tokenize pass
        * (phrase-capable batch build; the ES `index_options: positions`
        * analog) — positions ride the staged fat rows, no second text scan
        */
      positions: Boolean = false,
      /** analysis chain: "unicode" (default — `\p{L}\p{N}` code-point runs,
        * so non-ASCII pages are searchable; the ES standard-analyzer analog
        * the reference delegates to, monstache.go:46) or "ascii" (the
        * SQL-dialect-pinned `[a-z0-9]+` analyzer). Identical output on
        * pure-ASCII corpora. Recorded in `indexDir/meta`; every query path
        * tokenizes with the index's RECORDED analyzer, never a global.
        */
      analyzer: String = "unicode",
      /** forward-index sidecar: bucket-partitioned (docId, term, tf) rows
        * from the SAME staged tokenize pass (Lucene's stored term vectors /
        * ES `term_vector: yes`) — serves `_termvectors` and the
        * significant_terms foreground incidence without decoding postings
        */
      termVectors: Boolean = false,
      /** test-only crash injection: throw after group g's lineage commit */
      failAfterGroup: Int = -1
  )

  final case class BuildResult(stats: CorpusStats, numBuckets: Int, indexDir: String)

  /** Phase timing collector: every phase is timed (printed to stderr only
    * when GRAFT_PROF is set), and the per-run timings feed one status row —
    * the admin-surface analog of the reference's `/stats` + stats logging
    * endpoints (`monstache.go:4188-4285`, `monstache.go:3510-3527`).
    */
  final class PhaseClock {
    private val timings = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def apply[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      val secs = (System.nanoTime() - t0) / 1e9
      // phases may be clocked from concurrent driver threads (the
      // single-group build tail overlaps its independent small jobs)
      timings.synchronized { timings += name -> secs }
      if (sys.env.contains("GRAFT_PROF")) System.err.println(f"BUILD-PHASE $name: $secs%.2f s")
      a
    }
    def json: String =
      timings.map { case (n, s) => s""""$n":${f"$s%.3f"}""" }.mkString("{", ",", "}")
    def totalSecs: Double = timings.map(_._2).sum
  }

  /** One status row per build/append/compact run: snapshot, doc count,
    * wall seconds, docs/s, per-phase timing JSON. Appended — the table IS
    * the run history a `/stats` endpoint would serve.
    */
  def writeStatus(spark: SparkSession, indexDir: String, kind: String,
      snapshotId: Long, nDocs: Long, clock: PhaseClock): Unit =
    writeStatus(spark, indexDir, kind, snapshotId, nDocs, clock.totalSecs, clock.json)

  def writeStatus(spark: SparkSession, indexDir: String, kind: String,
      snapshotId: Long, nDocs: Long, wallSecs: Double, phaseJson: String): Unit = {
    import spark.implicits._
    val dps = if (wallSecs > 0) nDocs.toDouble / wallSecs else 0.0
    Seq((snapshotId, kind, nDocs, wallSecs, dps, phaseJson,
        new Timestamp(System.currentTimeMillis())))
      .toDF("snapshotId", "kind", "nDocs", "wallSecs", "docsPerSec", "phaseSecs", "ts")
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(s"$indexDir/status")
  }

  // ------------------------------------------------------- bucket shuffle

  /** Bijective bucket→shuffle-key table. `repartition(K, col("bucket"))`
    * hash-partitions the K distinct bucket values into K slots — a
    * balls-in-bins layout where some tasks carry 3-4 buckets and ~1/e carry
    * none, capping the CPU-bound inversion stage's packing at ~70%
    * (measured at 4×2 executors); padding to 4K slots trades collisions for
    * empty tasks that still pay scheduler + committer setup (measured:
    * worse). Instead precompute, for each partition p, an int key whose
    * Catalyst murmur3 (seed 42, the `HashPartitioning` hash) lands on p,
    * and repartition on `keys[bucket]`: exactly one bucket per task, no
    * collisions, no empty tasks. Rows and their sort order are unchanged —
    * only the shuffle layout is. Keys exist for every p because
    * murmur3-of-consecutive-ints covers residues fast (coupon collector,
    * ~K·lnK trials); the search is driver-side and O(K).
    */
  private[graft] def bucketShuffleKeys(n: Int): Array[Int] = {
    val keys = new Array[Int](n)
    val found = new Array[Boolean](n)
    var k = 0
    var remaining = n
    while (remaining > 0) {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(k, 42)
      val p = ((h % n) + n) % n
      if (!found(p)) { found(p) = true; keys(p) = k; remaining -= 1 }
      k += 1
    }
    keys
  }

  /** Column form of [[bucketShuffleKeys]]: the shuffle key for `bucket`. */
  private[graft] def bucketShuffleKey(n: Int): Column =
    element_at(lit(bucketShuffleKeys(n)), col("bucket") + 1)

  // ---------------------------------------------------------------- docId

  /** Dense deterministic docId assignment with fused last-writer-wins
    * dedup. Scalable two-pass: pass 1 counts distinct urls per hash range
    * (tiny driver collect — the shuffle carries (rangeId, url) pairs, never
    * text), pass 2 range-partitions once, sorts (hash, url, version desc)
    * in-partition, and in one streaming scan drops lower-version duplicates
    * and ranks survivors with broadcast offsets. Deterministic regardless
    * of input partitioning (never `monotonically_increasing_id`, SURVEY.md
    * §7.4.4): docId = rank of (xxhash64(url), url) ascending over distinct
    * urls. The dedup is free: same url → same hash range → same partition.
    */
  def assignDocIds(spark: SparkSession, versioned: DataFrame, numBuckets: Int): Dataset[(Long, Int, String, Long, String)] = {
    import spark.implicits._
    val hashed = versioned
      .withColumn("h", xxhash64(col("url")))
      .withColumn("rangeId", shiftrightunsigned(col("h"), 64 - 12).cast("int"))

    val counts: Array[(Int, Long)] = hashed
      .groupBy("rangeId").agg(count_distinct(col("url")).as("c"))
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

    // 4 waves per core: this stage (sort + dedup + tokenize + staged write)
    // is the heaviest CPU in the build, and rangeId hashing makes partition
    // sizes uneven — at 1 task per core the whole stage waits on the
    // fattest task (measured 32% straggler penalty on 8 executors cores);
    // finer grain averages the skew and shrinks sort runs (cache-resident)
    val par = 4 * spark.sessionState.conf.numShufflePartitions
    hashed
      .select(col("rangeId"), col("h"), col("url"), col("version"), col("text"))
      // explicit partition count: AQE would otherwise coalesce this shuffle
      // by byte size and strangle the CPU-heavy tokenize stage downstream
      .repartition(par, col("rangeId"))
      .sortWithinPartitions(col("rangeId"), col("h"), col("url"), col("version").desc, col("text"))
      .as[(Int, Long, String, Long, String)]
      .mapPartitions { it =>
        val offs = offsetsB.value
        var curRange = -1
        var next = 0L
        var lastUrl: String = null
        it.flatMap { case (rangeId, _, url, version, text) =>
          if (rangeId != curRange) { curRange = rangeId; next = offs(rangeId) }
          if (url == lastUrl) Iterator.empty // lower-version duplicate (W1/X2)
          else {
            lastUrl = url
            val docId = next
            next += 1
            val bucket = (docId / bucketSize).toInt
            Iterator.single((docId, bucket, url, version, text))
          }
        }
      }
  }

  // ---------------------------------------------------------------- build

  def build(spark: SparkSession, pages: Dataset[PageDoc], indexDir: String, cfg: Config = Config()): BuildResult = {
    // version = packed timestamp (reference tsVersion `(t<<32)|i`,
    // monstache.go:4053-4063); last-writer-wins dedup per url is fused into
    // assignDocIds' sort (W1/X2) — no separate window shuffle.
    val versioned = pages.toDF()
      .withColumn("version", shiftleft(unix_timestamp(col("warc_ts")), 32))
      .select("url", "version", "text")
    // keep the assignment TYPED into buildFromAssignedTyped: a toDF +
    // select round trip between the dedup mapPartitions and the tokenize
    // map would serialize every fat text row to UnsafeRow and back once
    // for nothing (EliminateSerialization can only fuse object pipelines
    // that stay object pipelines)
    buildFromAssignedTyped(spark, assignDocIds(spark, versioned, cfg.numBuckets),
      indexDir, cfg)
  }

  /** Build from pre-assigned (docId, bucket, url, version, text) rows —
    * used directly when the corpus already carries stable ids (e.g. the
    * driver harness' `documents.doc_id`). Buckets must be
    * docId-range-disjoint.
    */
  def buildFromAssigned(spark: SparkSession, assignedIn: DataFrame, indexDir: String, cfg: Config = Config()): BuildResult = {
    import spark.implicits._
    buildFromAssignedTyped(spark,
      assignedIn.select("docId", "bucket", "url", "version", "text")
        .as[(Long, Int, String, Long, String)],
      indexDir, cfg)
  }

  /** Typed core of [[buildFromAssigned]] — `build` feeds `assignDocIds`'
    * object output straight in, so the dedup mapPartitions and the
    * tokenize map fuse into ONE object pipeline (no UnsafeRow round trip
    * of the fat text rows between them; the resume filter below is a typed
    * filter for the same reason).
    */
  def buildFromAssignedTyped(spark: SparkSession,
      assigned: Dataset[(Long, Int, String, Long, String)],
      indexDir: String, cfg: Config = Config()): BuildResult = {
    import spark.implicits._
    val phase = new PhaseClock

    val doneBuckets: Set[Int] = phase("read-lineage") {
      if (cfg.resume && exists(spark, s"$indexDir/lineage"))
        spark.read.parquet(s"$indexDir/lineage")
          .filter(col("snapshotId") === cfg.snapshotId)
          .select("partitionId").as[Int].collect().toSet
      else Set.empty
    }

    // ---- phase 0: single tokenize pass, staged columnar (the "tokenized
    // corpus" intermediate). Everything downstream derives from this table;
    // the raw text is read exactly once. At 100 TB this staging IS the
    // natural checkpoint between extraction and index construction.
    val stage = s"$indexDir/stage_tokenized"
    phase("stage-tokenize") {
      val base =
        if (doneBuckets.isEmpty) assigned
        else {
          val done = doneBuckets
          assigned.filter(r => !done.contains(r._2))
        }
      val an = TextPrep.Analyzer(cfg.analyzer)
      // `terms` is staged as ONE space-joined string, not array<string>:
      // tokens can never contain whitespace (both analyzers split on it),
      // and the flat form measured ~10 s cheaper to parquet-encode plus
      // ~8 s cheaper to read+shuffle per 1M docs at 2 cores (StageProf
      // c/d + e/f A/B — parquet's per-element nested-column overhead on
      // both sides). Consumers split on ' ' (guarded by doclen=0 for
      // token-less docs).
      val staged =
        if (cfg.positions)
          // positions ride the same single tokenize pass as an extra
          // per-term int-array column (term order identical to termFreqs)
          base.map { case (docId, bucket, url, version, text) =>
            val tps = an.termFreqsWithPositions(text)
            var dl = 0
            tps.foreach(dl += _._2)
            (docId, bucket, url, version, dl, joinTerms(tps.length, i => tps(i)._1),
              tps.map(_._2), tps.map(_._3.toSeq).toSeq)
          }.toDF("docId", "bucket", "url", "version", "doclen", "terms", "tfs", "poss")
        else
          base.map { case (docId, bucket, url, version, text) =>
            val tfs = an.termFreqs(text)
            var dl = 0
            tfs.foreach(dl += _._2)
            (docId, bucket, url, version, dl, joinTerms(tfs.length, i => tfs(i)._1),
              tfs.map(_._2))
          }.toDF("docId", "bucket", "url", "version", "doclen", "terms", "tfs")
      staged.write.mode(SaveMode.Overwrite)
        .option("compression", cfg.stagedCodec)
        // small row groups: the staged table is written by few fat reduce
        // tasks (one per id-range partition) but scanned by every downstream
        // phase — default 128MB row groups make a "16MB" split setting
        // meaningless (splits can't cross a row group), turning the postings
        // map stage into a handful of stragglers. Measured: taskMax == stage
        // wall at 4x2 executors before this.
        .option("parquet.block.size", (16 * 1024 * 1024).toString)
        .parquet(stage)
    }

    // ---- phase 1+2 fused: docs table write with corpus stats OBSERVED on
    // the same pass (no separate stats scan). avgdl as an explicit
    // sum/count double division so oracles reproduce it bit-exactly.
    // N counts docs with doclen > 0 ONLY — the exhaustive oracle (and any
    // SQL deriving N from a token CTE) never sees token-less docs, and idf
    // must agree bit-for-bit ----
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global

    val obs = org.apache.spark.sql.Observation()
    // docs-write runs CONCURRENTLY with the postings groups below: both
    // derive solely from the immutable staged table, and nothing before
    // the post-groups tail reads docs or the observed stats. Overlapping
    // the two dominant stage consumers removes ~4s of serial wall at the
    // 4N level — another bite out of the Amdahl term (see the tail note).
    val docsJob = Future(phase("docs-write") {
      spark.read.parquet(stage)
        .select(col("docId"), col("bucket"), col("url"), col("doclen"), col("version"))
        .withColumn("dbucket", col("bucket"))
        .repartition(cfg.numBuckets, bucketShuffleKey(cfg.numBuckets))
        .sortWithinPartitions("bucket", "docId")
        .observe(obs,
          sum(when(col("doclen") > 0, 1L).otherwise(0L)).as("n"),
          sum(col("doclen").cast("long")).as("tot"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("dbucket")
        .option("compression", cfg.parquetCodec)
        .parquet(s"$indexDir/docs")
    })
    def awaitDocs(): Unit = Await.result(docsJob, Duration.Inf)
    lazy val stats: CorpusStats = {
      awaitDocs()
      val st = obs.get
      // resume runs skip already-built buckets in the stage, so the
      // observed totals cover only the rewritten docs — fall back to a
      // full-docs scan
      val (n, totalTokens) =
        if (doneBuckets.isEmpty) (st("n").asInstanceOf[Long], st("tot").asInstanceOf[Long])
        else {
          val r = spark.read.parquet(s"$indexDir/docs").filter(col("doclen") > 0)
            .agg(count(lit(1)), sum(col("doclen"))).head()
          (r.getLong(0), r.getLong(1))
        }
      CorpusStats(n, totalTokens.toDouble / n.toDouble, totalTokens, cfg.snapshotId)
    }
    def writeStats(): Unit =
      Seq(stats).toDS().write.mode(SaveMode.Overwrite).parquet(s"$indexDir/stats")

    // ---- phase 3: posting blocks, committed per checkpoint group;
    // lineage appended strictly AFTER the group's data is visible. The
    // shuffle moves one fat row per doc (bucket, docId, doclen, terms,
    // tfs) — ~100x fewer rows than per-posting tuples; the explode happens
    // after the shuffle, feeding the in-partition external sort directly.
    val groups = math.max(1, cfg.checkpointGroups)
    // on any in-loop failure (incl. the injected-crash test hook) let the
    // concurrent docs job land before rethrowing — a resume must never race
    // a still-writing docs overwrite from the failed attempt
    try for (g <- 0 until groups) {
      // shuffle one fat row per doc (≈100x fewer rows than per-posting
      // tuples), sort the FAT rows by (bucket, docId) — thousands per
      // partition, never the exploded postings — and SPIMI-invert in
      // memory (see spimiBlockify; the old explode + 345M-row external
      // sort was the scaling bottleneck on multi-executor runs).
      val fatRows = spark.read.parquet(stage)
        .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
        .filter(pmod(col("bucket"), lit(groups)) === g)
        // bijective key: one bucket per task (see bucketShuffleKeys — the
        // plain bucket column collides birthday-style, padding the count
        // pays empty-task setup). Explicit count also keeps AQE from
        // byte-coalescing the shuffle and serializing this CPU-bound stage.
        .repartition(cfg.numBuckets, bucketShuffleKey(cfg.numBuckets))
        .sortWithinPartitions("bucket", "docId")
        .as[(Int, Long, Int, String, Array[Int])]
      phase(s"postings-group-$g") {
        fatRows
          .mapPartitions(it => spimiBlockify(it.map { case (b, d, dl, ts, tf) =>
            (b, d, dl, splitTerms(ts), tf)
          }))(
            org.apache.spark.sql.Encoders.product[TermPostings])
          .toDF()
          .withColumn("pbucket", col("bucket"))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("pbucket")
          .option("compression", cfg.parquetCodec)
          .option("parquet.enable.dictionary", "false")
          .parquet(s"$indexDir/postings")
      }

      // multi-group (checkpointed) builds append lineage strictly after
      // each group's postings are durable — that ordering IS the resume
      // contract. The common single-group build defers lineage into the
      // concurrent tail below (crash before lineage ⇒ resume rebuilds the
      // group: still correct, snapshot is the only commit point).
      if (groups > 1)
        phase(s"lineage-group-$g")(appendLineage(spark, indexDir,
          bucketFilter = pmod(col("bucket"), lit(groups)) === g &&
            !col("bucket").isin(doneBuckets.toSeq: _*),
          snapshotId = cfg.snapshotId))

      if (cfg.failAfterGroup == g)
        throw new RuntimeException(s"injected crash after group $g (test hook)")
    } catch {
      case e: Throwable => scala.util.Try(awaitDocs()); throw e
    }

    // ---- optional positions sidecar, from the SAME staged tokenized
    // table (one text pass total): explode (term, positions) per doc,
    // bucket-partitioned like the postings ----
    def writePositions(): Unit = phase("positions") {
      // repartition FAT rows (one per doc), explode AFTER the shuffle:
      // the network moves |docs| rows with packed arrays, never |tokens|
      // exploded tuples (~10-20x the shuffle bytes at web doclens); the
      // term-major sort the phrase reader wants happens partition-locally
      spark.read.parquet(stage)
        .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("poss"))
        // recover the array form from the flat staged string (doclen=0
        // guards the token-less doc: split("") would yield [""], not [])
        .withColumn("terms", when(col("doclen") === 0,
          array().cast("array<string>")).otherwise(split(col("terms"), " ")))
        .drop("doclen")
        .repartition(cfg.numBuckets, bucketShuffleKey(cfg.numBuckets))
        .select(col("bucket"), col("docId"),
          explode(arrays_zip(col("terms"), col("poss"))).as("tp"))
        .select(col("bucket"), col("tp.terms").as("term"), col("docId"),
          col("tp.poss").as("positions"))
        .sortWithinPartitions("bucket", "term", "docId")
        .withColumn("pbucket", col("bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("pbucket")
        .option("compression", cfg.parquetCodec)
        .parquet(s"$indexDir/positions")
    }

    // ---- optional forward-index (term vectors) sidecar, also from the
    // staged tokenized table: one thin (docId, term, tf) row per distinct
    // (doc, term), bucket-partitioned and docId-sorted so per-doc reads
    // prune to one bucket file and row-group min/max on docId ----
    def writeTermVectors(): Unit = phase("termvectors") {
      // repartition FAT rows, explode after the shuffle (|docs| rows on
      // the wire, not |tokens|); the (bucket, docId) shuffle sort is the
      // final row order already — per-doc term order comes from sorting
      // each doc's packed array in place (array_sort on struct<terms,tfs>
      // orders by the first field, UTF8 binary = code-point order, the
      // same order the terms dictionary uses), so NO post-explode external
      // sort exists in this plan at all
      spark.read.parquet(stage)
        .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
        // flat staged string → array (see writePositions' doclen=0 guard)
        .withColumn("terms", when(col("doclen") === 0,
          array().cast("array<string>")).otherwise(split(col("terms"), " ")))
        .drop("doclen")
        .repartition(cfg.numBuckets, bucketShuffleKey(cfg.numBuckets))
        .sortWithinPartitions("bucket", "docId")
        .select(col("bucket"), col("docId"),
          explode(array_sort(arrays_zip(col("terms"), col("tfs")))).as("tt"))
        .select(col("bucket"), col("docId"),
          col("tt.terms").as("term"), col("tt.tfs").as("tf"))
        .withColumn("tvbucket", col("bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tvbucket")
        .option("compression", cfg.parquetCodec)
        .parquet(s"$indexDir/termvectors")
    }

    // ---- phase 4: lineage + term dictionary (+ positions sidecar) ----
    // Single-group fast path: these are mutually independent reads of
    // already-committed tables, so they run as CONCURRENT Spark jobs from
    // driver threads. The sequential small-job tail measured ~19% of the
    // 4N-executor build wall vs ~12% at N (ClusterProf) — a fixed cost
    // that the scaling ratio pays 4x over; overlap is an efficiency
    // lever, not a micro-optimization. The snapshot commit below still
    // strictly follows every tail job.
    if (groups == 1) {
      val tail = Seq(
        Future(writeStats()),
        Future(writeMeta(spark, indexDir, cfg.analyzer)),
        Future(phase("lineage-group-0")(appendLineage(spark, indexDir,
          bucketFilter = !col("bucket").isin(doneBuckets.toSeq: _*),
          snapshotId = cfg.snapshotId))),
        Future(phase("terms")(writeTermsFromPostings(spark, indexDir, cfg.parquetCodec)))
      ) ++ (if (cfg.positions) Seq(Future(writePositions())) else Nil) ++
        (if (cfg.termVectors) Seq(Future(writeTermVectors())) else Nil)
      Await.result(Future.sequence(tail), Duration.Inf)
    } else {
      writeStats()
      writeMeta(spark, indexDir, cfg.analyzer)
      if (cfg.positions) writePositions()
      if (cfg.termVectors) writeTermVectors()
      phase("terms")(writeTermsFromPostings(spark, indexDir, cfg.parquetCodec))
    }

    // ---- snapshot commit: written LAST (the Iceberg-shaped commit point,
    // SURVEY.md §7.0) — a reader pins the snapshot row, everything above is
    // invisible until this lands ----
    commitSnapshot(spark, indexDir, cfg.snapshotId, stats.n)

    delete(spark, stage)
    writeStatus(spark, indexDir, "build", cfg.snapshotId, stats.n, phase)
    BuildResult(stats, cfg.numBuckets, indexDir)
  }

  private def delete(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** Index-level metadata (currently: the analyzer name). A tiny (key,
    * value) table so query paths tokenize with the analyzer the index was
    * BUILT with — the ES mapping's `analyzer` property, which monstache
    * defers to entirely (the mapper never re-analyzes, monstache.go:46).
    */
  def writeMeta(spark: SparkSession, indexDir: String, analyzer: String): Unit = {
    import spark.implicits._
    Seq(("analyzer", analyzer)).toDF("key", "value")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$indexDir/meta")
  }

  /** The analyzer an index was built with ([[writeMeta]]); "ascii" for
    * pre-meta indexes (the historical default).
    */
  def analyzerOf(spark: SparkSession, indexDir: String): TextPrep.Analyzer =
    analyzerCache.getOrElseUpdate(indexDir, {
      if (exists(spark, s"$indexDir/meta"))
        TextPrep.Analyzer(
          spark.read.parquet(s"$indexDir/meta")
            .filter(col("key") === "analyzer")
            .select("value").head().getString(0))
      else TextPrep.Analyzer.Ascii
    })

  // one tiny file read per index dir per JVM — query paths call analyzerOf
  // on every request
  private val analyzerCache =
    scala.collection.concurrent.TrieMap.empty[String, TextPrep.Analyzer]

  /** Append a snapshot row (snapshotId, rowCount, ts) — the commit marker. */
  def commitSnapshot(spark: SparkSession, indexDir: String, snapshotId: Long, rowCount: Long): Unit = {
    import spark.implicits._
    Seq((snapshotId, rowCount, new Timestamp(System.currentTimeMillis())))
      .toDF("snapshotId", "rowCount", "ts")
      .write.mode(SaveMode.Append).parquet(s"$indexDir/snapshots")
  }

  /** Fat-row postings segment writer: shuffle one row per doc by bucket,
    * sort fat rows in-partition, SPIMI-invert (see spimiBlockify). Used by
    * the streaming append; the batch build inlines the same shape per
    * checkpoint group.
    */
  def writePostingsSegmentFat(spark: SparkSession, fatRowsIn: DataFrame, path: String,
      append: Boolean, codec: String = "zstd"): Unit = {
    import spark.implicits._
    val blocksDF = fatRowsIn
      .select(col("bucket"), col("docId"), col("doclen"), col("terms"), col("tfs"))
      .repartition(spark.sessionState.conf.numShufflePartitions, col("bucket"))
      .sortWithinPartitions("bucket", "docId")
      .as[(Int, Long, Int, Array[String], Array[Int])]
      .mapPartitions(spimiBlockify)(
        org.apache.spark.sql.Encoders.product[TermPostings])
    blocksDF.toDF()
      .withColumn("pbucket", col("bucket"))
      .write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket")
      .option("compression", codec)
      .option("parquet.enable.dictionary", "false")
      .parquet(path)
  }

  /** Shuffle-by-bucket + in-partition sort + streaming block compression —
    * the per-posting-row path, kept for compaction (whose input is decoded
    * posting rows).
    */
  def writePostingsSegment(spark: SparkSession, postings: Dataset[Posting], path: String,
      append: Boolean, codec: String = "zstd"): Unit = {
    val blocksDF = postings
      .repartition(spark.sessionState.conf.numShufflePartitions, col("bucket"))
      .sortWithinPartitions("bucket", "term", "docId")
      .mapPartitions(blockify)(
        org.apache.spark.sql.Encoders.product[TermPostings])
    blocksDF.toDF()
      .withColumn("pbucket", col("bucket"))
      .write.mode(if (append) SaveMode.Append else SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket")
      .option("compression", codec)
      .option("parquet.enable.dictionary", "false")
      .parquet(path)
  }

  /** Global term dictionary aggregated from compact postings rows, written
    * as segment 0 of the seg-partitioned terms table (streaming appends add
    * seg=snapshotId; readers sum segments). Full overwrite — this is the
    * batch-build / compaction consolidation pass.
    */
  def writeTermsFromPostings(spark: SparkSession, indexDir: String, codec: String = "zstd"): Unit = {
    import spark.implicits._
    delete(spark, s"$indexDir/terms")
    // ONE shuffle instead of two: range-partition the raw per-bucket stats
    // rows by term (all rows of a term land in one partition — range
    // partitioning is by key value), sort, and aggregate the contiguous
    // term runs in a streaming pass. The old groupBy-then-repartitionByRange
    // hash-shuffled the ~|vocabulary| rows once and range-shuffled them
    // again; same output rows, same term-ascending order per file (the
    // row-group pruning contract), one fewer full shuffle in the build tail.
    spark.read.parquet(s"$indexDir/postings")
      .select(col("term"), col("df"), col("cf"), col("maxTf"), col("minDl"))
      .repartitionByRange(8, col("term"))
      .sortWithinPartitions("term")
      .as[(String, Long, Long, Int, Int)]
      .mapPartitions { it =>
        new Iterator[(String, Long, Long, Int, Int)] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): (String, Long, Long, Int, Int) = {
            val (term, df0, cf0, maxTf0, minDl0) = buf.next()
            var df = df0; var cf = cf0; var maxTf = maxTf0; var minDl = minDl0
            while (buf.hasNext && buf.head._1 == term) {
              val r = buf.next()
              df += r._2; cf += r._3
              if (r._4 > maxTf) maxTf = r._4
              if (r._5 < minDl) minDl = r._5
            }
            (term, df, cf, maxTf, minDl)
          }
        }
      }
      .toDF("term", "df", "cf", "maxTf", "minDl")
      .withColumn("seg", lit(0L))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("seg")
      .option("compression", codec)
      .parquet(s"$indexDir/terms")
  }

  private[graft] def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Lineage rows for the buckets matching `bucketFilter`, appended after
    * their postings are durable (`BASELINE.json` north_star: partition id,
    * doc range, posting bytes, term count). Used by both the batch build
    * (per checkpoint group) and the streaming append (per batch's buckets —
    * pass a `pbucket` filter there so the scan is partition-pruned).
    */
  def appendLineage(spark: SparkSession, indexDir: String,
      bucketFilter: org.apache.spark.sql.Column, snapshotId: Long): Unit = {
    import spark.implicits._
    val postR = spark.read.parquet(s"$indexDir/postings").filter(bucketFilter)
    val now = new Timestamp(System.currentTimeMillis())
    // scalar columns only — the parquet scan prunes the heavy blocks column
    val lineage = postR
      .select(col("bucket"), col("term"), col("minDoc"), col("maxDoc"), col("bytes"))
      .groupBy("bucket")
      .agg(min("minDoc").as("docIdMin"), max("maxDoc").as("docIdMax"),
        sum("bytes").as("postingBytes"), count(lit(1)).as("termCount"))
      .select(
        col("bucket").cast("int").as("partitionId"),
        col("docIdMin"), col("docIdMax"), col("postingBytes"), col("termCount"),
        lit(snapshotId).as("snapshotId"), lit(now).as("ts"))
    lineage.as[LineageRow].write.mode(SaveMode.Append).parquet(s"$indexDir/lineage")
  }

  /** Term-dictionary SEGMENT from the postings rows matching `filter`
    * (streaming append: only the batch's pbuckets — partition-pruned scan),
    * written as a dynamic overwrite of seg=`seg` so a retried batch
    * replaces its own segment instead of double-counting. Readers
    * aggregate segments (sum df/cf, max maxTf, min minDl), so a batch
    * writes O(batch terms), never the global dictionary. `seg` must be
    * unique per ingested batch (the snapshot id).
    */
  def writeTermsSegment(spark: SparkSession, indexDir: String,
      filter: org.apache.spark.sql.Column, seg: Long, codec: String = "zstd"): Unit = {
    spark.read.parquet(s"$indexDir/postings")
      .filter(filter)
      .groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"),
        max("maxTf").as("maxTf"), min("minDl").as("minDl"))
      .withColumn("seg", lit(seg))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("seg")
      .option("compression", codec)
      .parquet(s"$indexDir/terms")
  }

  /** BM25 partial as a Catalyst column (codegen'd — no UDF). Same frozen
    * literals as `Bm25.partial` so bounds are bit-consistent with scores.
    */
  def bm25PartialCol(tf: org.apache.spark.sql.Column, doclen: org.apache.spark.sql.Column, avgdl: Double): org.apache.spark.sql.Column =
    tf * lit(2.2) / (tf + lit(1.2) * (lit(0.25) + lit(0.75) * doclen / lit(avgdl)))

  /** Space-join `n` terms (staged-table flat form — see stage-tokenize). */
  private def joinTerms(n: Int, term: Int => String): String = {
    if (n == 0) return ""
    val sb = new java.lang.StringBuilder(n << 3)
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(term(i))
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[joinTerms]]; "" (a token-less doc) → empty array. */
  private[graft] def splitTerms(ts: String): Array[String] =
    if (ts.isEmpty) Array.empty[String] else ts.split(' ')

  /** Growable parallel posting arrays for one (bucket, term) during SPIMI
    * inversion — primitive arrays, no per-posting boxing.
    */
  private final class PostingAcc {
    private var ds = new Array[Long](8)
    private var fs = new Array[Int](8)
    private var ls = new Array[Int](8)
    private var n = 0
    var cf = 0L
    def add(docId: Long, tf: Int, dl: Int): Unit = {
      if (n == ds.length) {
        ds = java.util.Arrays.copyOf(ds, n << 1)
        fs = java.util.Arrays.copyOf(fs, n << 1)
        ls = java.util.Arrays.copyOf(ls, n << 1)
      }
      ds(n) = docId; fs(n) = tf; ls(n) = dl; n += 1; cf += tf
    }
    def docIds: Array[Long] = java.util.Arrays.copyOf(ds, n)
    def tfs: Array[Int] = java.util.Arrays.copyOf(fs, n)
    def dls: Array[Int] = java.util.Arrays.copyOf(ls, n)
  }

  /** SPIMI-style in-memory inversion (the north star's literal build shape):
    * consume one partition's FAT doc rows — (bucket, docId, doclen, terms,
    * tfs), sorted by (bucket, docId) — and emit compressed TermPostings per
    * (bucket, term), terms ascending.
    *
    * Docs are visited in ascending docId, so every term's posting arrays
    * accumulate ALREADY sorted — no per-posting sort at all. This replaces
    * the explode-then-external-sort pipeline that dominated the build: a
    * 64-bucket 1.5M-doc build sorted ~345M exploded posting rows (≈5.4M per
    * partition, spilling) where SPIMI sorts ~23K fat rows per partition and
    * does one hash insert per posting. Measured on `local-cluster`: the
    * explode+sort postings phase scaled 1.07x from 1x2 to 4x2 executors
    * (spill + GC + shuffle contention); inversion is narrow per-partition
    * CPU work.
    *
    * Memory bound: one bucket's mini-index must fit task memory. That is
    * ALREADY the engine's invariant — a head term's TermPostings row spans
    * its whole bucket by design — and numBuckets scales with the corpus
    * (docId-range sharding), so per-bucket size is an operator-controlled
    * constant at any scale.
    */
  private[graft] def spimiBlockify(
      it: Iterator[(Int, Long, Int, Array[String], Array[Int])]): Iterator[TermPostings] =
    new Iterator[TermPostings] {
      private val buf = it.buffered
      private var pending: Iterator[TermPostings] = Iterator.empty
      // a bucket whose docs ALL tokenized to zero terms inverts to an empty
      // iterator — advance across such buckets instead of assuming one
      // inversion yields at least one row (a batch of non-ASCII pages is
      // exactly this shape)
      def hasNext: Boolean = {
        while (!pending.hasNext && buf.hasNext) invertNextBucket()
        pending.hasNext
      }
      def next(): TermPostings = {
        if (!hasNext) throw new NoSuchElementException("spimiBlockify exhausted")
        pending.next()
      }
      private def invertNextBucket(): Unit = {
        val bucket = buf.head._1
        val acc = new java.util.HashMap[String, PostingAcc]()
        while (buf.hasNext && buf.head._1 == bucket) {
          val (_, docId, dl, terms, tfs) = buf.next()
          var i = 0
          while (i < terms.length) {
            var a = acc.get(terms(i))
            if (a == null) { a = new PostingAcc; acc.put(terms(i), a) }
            a.add(docId, tfs(i), dl)
            i += 1
          }
        }
        val termArr = acc.keySet().toArray(new Array[String](acc.size()))
        // code-point order = UTF-8 byte order (Spark's UTF8String order).
        // String.compareTo (UTF-16-unit order, a vectorized JIT intrinsic)
        // equals code-point order unless a supplementary char (surrogate
        // pair) is compared against a BMP char ≥ U+E000 — only possible
        // when the vocabulary contains BOTH kinds. One cheap scan picks the
        // intrinsic sort on every realistic corpus (ASCII/BMP) and the
        // exact comparator only when the collision is actually possible.
        if (needsCodePointSort(termArr))
          java.util.Arrays.sort(termArr, codePointOrder)
        else
          java.util.Arrays.sort(termArr.asInstanceOf[Array[AnyRef]])
        pending = termArr.iterator.map { t =>
          val a = acc.get(t)
          val docIds = a.docIds
          val blocks = Blocks.build(docIds, a.tfs, a.dls)
          TermPostings(bucket, t, docIds.length.toLong, a.cf,
            blocks.map(_.maxTf).max, blocks.map(_.minDl).min,
            blocks.map(Blocks.byteSize).sum,
            docIds.head, docIds.last, blocks)
        }
      }
    }

  /** compareTo diverges from code-point order only when some term carries
    * a surrogate (supplementary plane) AND some term carries a BMP char in
    * [U+E000, U+FFFF]; one early-exit scan decides.
    */
  private[graft] def needsCodePointSort(terms: Array[String]): Boolean = {
    var hasSurrogate = false
    var hasHighBmp = false
    var t = 0
    while (t < terms.length && !(hasSurrogate && hasHighBmp)) {
      val s = terms(t)
      var i = 0
      while (i < s.length && !(hasSurrogate && hasHighBmp)) {
        val c = s.charAt(i)
        if (c >= 0xd800 && c <= 0xdfff) hasSurrogate = true
        else if (c >= 0xe000) hasHighBmp = true
        i += 1
      }
      t += 1
    }
    hasSurrogate && hasHighBmp
  }

  /** UTF-8-byte (= code-point) String ordering: compareTo except that a
    * high surrogate (a supplementary code point, ≥ U+10000) outranks any
    * BMP char ≥ U+E000 it would otherwise sort below.
    */
  private[graft] val codePointOrder: java.util.Comparator[String] =
    (a: String, b: String) => {
      val n = math.min(a.length, b.length)
      var i = 0
      var r = 0
      while (r == 0 && i < n) {
        val ca = a.charAt(i)
        val cb = b.charAt(i)
        if (ca != cb) {
          r =
            if (Character.isHighSurrogate(ca) && !Character.isHighSurrogate(cb) && cb >= 0xe000) 1
            else if (Character.isHighSurrogate(cb) && !Character.isHighSurrogate(ca) && ca >= 0xe000) -1
            else ca - cb
        }
        i += 1
      }
      if (r != 0) r else a.length - b.length
    }

  /** Consume a (bucket, term, docId)-sorted posting stream, emitting one
    * TermPostings row per (bucket, term) with compressed blocks. Bounded
    * memory: buffers exactly one term-run of one bucket. (Kept for the
    * compaction path, whose input is decoded per-posting rows; the batch
    * build and streaming append use `spimiBlockify` over fat doc rows.)
    */
  private def blockify(it: Iterator[Posting]): Iterator[TermPostings] =
    new Iterator[TermPostings] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): TermPostings = {
        val head = buf.head
        val docIds = scala.collection.mutable.ArrayBuffer.empty[Long]
        val tfs = scala.collection.mutable.ArrayBuffer.empty[Int]
        val dls = scala.collection.mutable.ArrayBuffer.empty[Int]
        var cf = 0L
        while (buf.hasNext && buf.head.bucket == head.bucket && buf.head.term == head.term) {
          val p = buf.next()
          docIds += p.docId; tfs += p.tf; dls += p.doclen; cf += p.tf
        }
        val blocks = Blocks.build(docIds.toArray, tfs.toArray, dls.toArray)
        TermPostings(head.bucket, head.term, docIds.length.toLong, cf,
          blocks.map(_.maxTf).max, blocks.map(_.minDl).min,
          blocks.map(Blocks.byteSize).sum,
          docIds.head, docIds.last, blocks)
      }
    }
}
