package graft.query

import graft.codec.Blocks
import graft.model._
import graft.textprep.TextPrep
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Query-time top-k: block-max WAND with Okapi BM25 (k1=1.2, b=0.75) over
  * the compressed document-partitioned index — the operator the reference
  * delegates to Elasticsearch (SURVEY.md §2.7 T3), built from scratch.
  *
  * Execution shape: postings rows for the query terms are pruned at the
  * parquet scan (term predicate pushdown onto the sorted term column), then
  * each bucket runs WAND independently over its mini-index (per-partition
  * top-k heaps), and a final window-rank merges k·buckets candidates — the
  * same scatter-gather shape Elasticsearch itself uses across shards.
  *
  * Rank-identity contract: scores are summed per doc in ascending term
  * order (both here and in the exhaustive oracle), ties broken by docId
  * asc. Per-bucket processing visits docIds in increasing order, which makes
  * threshold pruning with strict `>` exact under that tie-break: everything
  * in the heap has a smaller docId than any future candidate, so an
  * equal-score future candidate would lose the tie-break anyway.
  */
object QueryEngine {

  def loadStats(spark: SparkSession, indexDir: String): CorpusStats = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/stats").as[CorpusStats].head()
  }

  /** Global term stats for just the query terms (small driver-side map).
    * The terms table may hold multiple segments (streaming appends write
    * one per batch) — stats are aggregated on read, so append stays
    * O(batch) while reads stay exact.
    */
  def loadTermStats(spark: SparkSession, indexDir: String, terms: Seq[String]): Map[String, TermStats] = {
    import spark.implicits._
    if (terms.isEmpty) Map.empty
    else spark.read.parquet(s"$indexDir/terms")
      .filter(col("term").isin(terms.distinct: _*))
      .groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"),
        max("maxTf").as("maxTf"), min("minDl").as("minDl"))
      .as[TermStats].collect().map(t => t.term -> t).toMap
  }

  /** Tombstoned docIds (streaming replaces awaiting compaction). SERVING
    * path only (IndexReader pins them per bucket at construction, bounded by
    * compaction cadence). The distributed query paths never collect
    * tombstones: they ride the same bucket-local exclusion cogroup as
    * filter-context exclusions (see `deadDocs`) — no O(tombstones) driver
    * state even with compaction deferred after a large delete-by-query.
    */
  def loadTombstones(spark: SparkSession, indexDir: String): Set[Long] = {
    import spark.implicits._
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    if (tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tombPath))
      spark.read.parquet(s"$indexDir/tombstones").select("docId").as[Long].collect().toSet
    else Set.empty
  }

  /** Immutable Set[Long] view over a sorted primitive array — O(log n)
    * membership with no per-element boxing/hash-set footprint. The serving
    * reader's per-bucket tombstone representation.
    */
  private[query] final class SortedDocSet(sorted: Array[Long])
      extends scala.collection.immutable.Set[Long] {
    override def contains(d: Long): Boolean =
      java.util.Arrays.binarySearch(sorted, d) >= 0
    override def iterator: Iterator[Long] = sorted.iterator
    override def incl(e: Long): Set[Long] = sorted.toSet + e
    override def excl(e: Long): Set[Long] = sorted.toSet - e
    override def size: Int = sorted.length
  }

  private[query] def deadForBucket(m: Map[Int, Array[Long]], bucket: Int): Set[Long] =
    m.get(bucket) match {
      case Some(a) => new SortedDocSet(a)
      case None    => Set.empty
    }

  private def tombstonesDF(spark: SparkSession, indexDir: String): Option[org.apache.spark.sql.DataFrame] = {
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexDir/tombstones")
    if (tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(tombPath))
      Some(spark.read.parquet(s"$indexDir/tombstones").select(col("docId").cast("long").as("docId")))
    else None
  }

  /** The union of filter-context exclusions and tombstones as ONE
    * bucket-grouped Dataset — every index query path's dead-doc container.
    * Each docId's bucket is recovered from the docs table (uniform join
    * keys, one shuffle), so a bucket task receives only its own dead ids:
    * nothing is collected to the driver at any exclusion/tombstone
    * cardinality. Returns None when there is nothing to exclude (the
    * cogroup is skipped entirely).
    */
  private[query] def deadDocs(spark: SparkSession, indexDir: String,
      excluded: Option[org.apache.spark.sql.DataFrame])
      : Option[org.apache.spark.sql.KeyValueGroupedDataset[Int, (Int, Long)]] = {
    import spark.implicits._
    val tomb = tombstonesDF(spark, indexDir)
    val both = (excluded.map(_.select(col("docId").cast("long").as("docId"))), tomb) match {
      case (Some(a), Some(b)) => Some(a.union(b))
      case (a, b) => a.orElse(b)
    }
    both.map { ex =>
      val docsT = spark.read.parquet(s"$indexDir/docs")
        .select(col("docId").cast("long").as("docId"), col("bucket").cast("int").as("bucket"))
      ex.join(docsT, Seq("docId"))
        .select(col("bucket"), col("docId"))
        .as[(Int, Long)]
        .groupByKey(_._1)
    }
  }

  /** Like [[deadDocs]] with per-row polarity: `false` rows are dead
    * (exclusions ∪ tombstones), `true` rows are the inclusion filter's
    * allowed set. One union, one uniform-key join to recover buckets, one
    * grouping — a bucket task sees only its own gate rows regardless of the
    * filter's corpus-wide cardinality.
    */
  private[query] def gateDocs(spark: SparkSession, indexDir: String,
      excluded: Option[org.apache.spark.sql.DataFrame],
      included: Option[org.apache.spark.sql.DataFrame])
      : Option[org.apache.spark.sql.KeyValueGroupedDataset[Int, (Int, Long, Boolean)]] = {
    import spark.implicits._
    val tomb = tombstonesDF(spark, indexDir)
    val dead = (excluded.map(_.select(col("docId").cast("long").as("docId"))), tomb) match {
      case (Some(a), Some(b)) => Some(a.union(b))
      case (a, b) => a.orElse(b)
    }
    val polar = (dead.map(_.withColumn("allowed", lit(false))),
        included.map(_.select(col("docId").cast("long").as("docId"))
          .withColumn("allowed", lit(true)))) match {
      case (Some(a), Some(b)) => Some(a.union(b))
      case (a, b) => a.orElse(b)
    }
    polar.map { ex =>
      val docsT = spark.read.parquet(s"$indexDir/docs")
        .select(col("docId").cast("long").as("docId"), col("bucket").cast("int").as("bucket"))
      ex.join(docsT, Seq("docId"))
        .select(col("bucket"), col("docId"), col("allowed"))
        .as[(Int, Long, Boolean)]
        .groupByKey(_._1)
    }
  }

  /** Top-k for a batch of queries. Returns (queryId, rank, docId, score). */
  def topK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int): Dataset[ScoredDoc] =
    topKImpl(spark, indexDir, queries, k, None)

  /** Filter-context top-k over the index (ES `bool.filter` served from the
    * inverted index): identical WAND machinery with an excluded-docId set
    * checked at candidate-offer time alongside tombstones. Exactness is
    * preserved because exclusions only make block upper bounds MORE
    * conservative — pruning never drops a candidate that could reach the
    * top-k. idf/avgdl stay corpus-wide (the index's stats), matching ES
    * filter semantics and the relational twin bit-for-bit.
    *
    * `excluded` is a DataFrame with a `docId` column and is BUCKET-LOCAL by
    * construction: it is joined against the index's docs table on uniform
    * docId keys (one shuffle) to recover each docId's bucket, then cogrouped
    * with the postings groups so every bucket receives ONLY its own
    * exclusions — nothing is ever collected to the driver, so a broad
    * filter (e.g. "language = en" over 10^12 pages) costs one bounded
    * per-bucket set, not O(corpus) driver state. A serving deployment would
    * compact each bucket's set into a roaring bitmap; the hash-set here is
    * the same design with a simpler container.
    */
  def topKWhere(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int,
      excluded: org.apache.spark.sql.DataFrame): Dataset[ScoredDoc] =
    topKImpl(spark, indexDir, queries, k, Some(excluded))

  /** Inclusion-filter top-k (ES `range`/`terms` filter context served from
    * the index): only docIds present in `allowed` may enter the heap. Same
    * bucket-local cogroup as exclusions — each bucket receives exactly its
    * own slice of the allowed set (bounded by the bucket's doc range, the
    * per-segment doc-values iterator ES intersects with its scorer) — and
    * pruning exactness is unchanged: an inclusion filter only removes
    * candidates, so every admissible block upper bound still bounds every
    * allowed doc's score. Tombstones keep riding the same gate with dead
    * polarity; dead wins over allowed for a doc carrying both.
    */
  def topKWithin(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int,
      allowed: org.apache.spark.sql.DataFrame): Dataset[ScoredDoc] =
    topKImpl(spark, indexDir, queries, k, None, included = Some(allowed))

  /** Query-time per-term boosting served from the index (ES `match` boost):
    * each term's contribution AND all its WAND upper bounds are scaled by
    * its boost — admissibility is preserved because boosts are fixed
    * positive factors, and the `(idf*partial)*boost` association matches
    * the relational oracle bit-for-bit.
    */
  def topKBoosted(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int,
      boosts: Map[String, Double]): Dataset[ScoredDoc] =
    topKImpl(spark, indexDir, queries, k, None, boosts = boosts)

  /** minimum_should_match served from the index: WAND candidates are offered
    * only when ≥ min(m, query arity) distinct query terms coincide at the
    * pivot. Pruning stays exact — the constraint only removes candidates, so
    * every admissible upper bound still bounds every qualified doc's score.
    */
  def topKShould(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int,
      m: Int): Dataset[ScoredDoc] = {
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val minMatch = queries.map { case (qid, text) =>
      qid -> math.min(m, an.tokenize(text).distinct.length)
    }.toMap
    topKImpl(spark, indexDir, queries, k, None, minMatch = minMatch)
  }

  private def topKImpl(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int,
      excluded: Option[org.apache.spark.sql.DataFrame],
      boosts: Map[String, Double] = Map.empty,
      minMatch: Map[String, Int] = Map.empty,
      included: Option[org.apache.spark.sql.DataFrame] = None): Dataset[ScoredDoc] = {
    import spark.implicits._
    // query text runs through the analyzer the index was BUILT with
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms: Seq[(String, Array[String])] =
      queries.map { case (qid, text) => qid -> an.tokenize(text).distinct.sorted }
    val allTerms = qTerms.flatMap(_._2).distinct
    val stats = loadStats(spark, indexDir)
    val tstats = loadTermStats(spark, indexDir, allTerms)
    if (allTerms.isEmpty || tstats.isEmpty) return spark.emptyDataset[ScoredDoc]

    val qTermsB = spark.sparkContext.broadcast(qTerms)
    val tstatsB = spark.sparkContext.broadcast(tstats)
    val boostsB = spark.sparkContext.broadcast(boosts)
    val minMatchB = spark.sparkContext.broadcast(minMatch)
    val n = stats.n
    val avgdl = stats.avgdl

    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]

    def bucketWand(rows: Iterator[TermPostings], dead: Set[Long],
        allowed: Set[Long]): Iterator[ScoredDoc] = {
      val byTerm: Map[String, TermPostings] = rows.map(tp => tp.term -> tp).toMap
      if (byTerm.isEmpty) Iterator.empty
      else {
        val ts = tstatsB.value
        qTermsB.value.iterator.flatMap { case (qid, terms) =>
          val present = terms.filter(byTerm.contains)
          if (present.isEmpty) Iterator.empty
          else wandBucket(qid, present, byTerm, ts, n, avgdl, k, dead,
            boostsB.value, minMatchB.value.getOrElse(qid, 1), allowed).iterator
        }
      }
    }

    // whether an inclusion filter is active is a PLAN-level fact, not a
    // per-bucket one: a bucket with zero gate rows under inclusion allows
    // NOTHING (allowed = empty set), not everything (allowed = null)
    val hasInclusion = included.isDefined
    val grouped = postings.groupByKey(_.bucket)
    val perBucket = gateDocs(spark, indexDir, excluded, included) match {
      case None =>
        grouped.flatMapGroups((_, rows) => bucketWand(rows, Set.empty[Long], null))
      case Some(gate) =>
        // exclusions + tombstones + inclusions stream into exactly the
        // bucket task that owns their docId range — never the driver
        grouped.cogroup(gate) { (_, rows, gateRows) =>
          val dead = Set.newBuilder[Long]
          var allow: mutable.HashSet[Long] = null
          gateRows.foreach { case (_, docId, isAllowed) =>
            if (isAllowed) {
              if (allow == null) allow = mutable.HashSet.empty[Long]
              allow += docId
            } else dead += docId
          }
          val allowSet: Set[Long] =
            if (!hasInclusion) null
            else if (allow == null) Set.empty[Long]
            else allow.toSet
          bucketWand(rows, dead.result(), allowSet)
        }
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("queryId")).orderBy(col("score").desc, col("docId").asc)
    perBucket.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("queryId"), col("rank").cast("int").as("rank"), col("docId"), col("score"))
      .as[ScoredDoc]
  }

  /** Conjunctive (bool-must / AND) BM25 top-k: a doc qualifies only if it
    * contains EVERY query term — the ES `bool.must` analog over the same
    * index. Same scatter-gather shape as `topK`; per bucket the cursor set
    * runs a leapfrog intersection instead of WAND (the rarest term drives
    * the cost — block skip metadata makes each advanceTo sub-linear).
    * Scores are identical BM25 sums, so results are rank-identical to the
    * exhaustive relational oracle restricted to all-terms-matched docs.
    */
  def topKAnd(spark: SparkSession, indexDir: String, queries: Seq[(String, String)], k: Int): Dataset[ScoredDoc] = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms: Seq[(String, Array[String])] =
      queries.map { case (qid, text) => qid -> an.tokenize(text).distinct.sorted }
    val allTerms = qTerms.flatMap(_._2).distinct
    val stats = loadStats(spark, indexDir)
    val tstats = loadTermStats(spark, indexDir, allTerms)
    // queries with a globally-absent term can never match conjunctively
    val live = qTerms.filter(_._2.forall(tstats.contains))
    if (live.isEmpty) return spark.emptyDataset[ScoredDoc]
    val liveTerms = live.flatMap(_._2).distinct

    val qTermsB = spark.sparkContext.broadcast(live)
    val tstatsB = spark.sparkContext.broadcast(tstats)
    val n = stats.n
    val avgdl = stats.avgdl

    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(liveTerms: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]

    def bucketAnd(rows: Iterator[TermPostings], dead: Set[Long]): Iterator[ScoredDoc] = {
      val byTerm: Map[String, TermPostings] = rows.map(tp => tp.term -> tp).toMap
      val ts = tstatsB.value
      qTermsB.value.iterator.flatMap { case (qid, terms) =>
        // buckets are docId-disjoint: a doc can only match where ALL its
        // query terms have postings in this bucket
        if (!terms.forall(byTerm.contains)) Iterator.empty
        else conjunctiveBucket(qid, terms, byTerm, ts, n, avgdl, k, dead).iterator
      }
    }

    val grouped = postings.groupByKey(_.bucket)
    val perBucket = deadDocs(spark, indexDir, None) match {
      case None => grouped.flatMapGroups((_, rows) => bucketAnd(rows, Set.empty[Long]))
      case Some(ex) =>
        grouped.cogroup(ex)((_, rows, exRows) => bucketAnd(rows, exRows.map(_._2).toSet))
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("queryId")).orderBy(col("score").desc, col("docId").asc)
    perBucket.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("queryId"), col("rank").cast("int").as("rank"), col("docId"), col("score"))
      .as[ScoredDoc]
  }

  /** Leapfrog intersection + BM25 scoring over one bucket. `terms` must be
    * sorted ascending (summation order) and all present in `byTerm`.
    */
  private[query] def conjunctiveBucket(
      qid: String,
      terms: Seq[String],
      byTerm: Map[String, TermPostings],
      tstats: Map[String, TermStats],
      n: Long,
      avgdl: Double,
      k: Int,
      tombstones: Set[Long] = Set.empty
  ): Seq[ScoredDoc] = {
    val ordered = terms.sorted
    val cursors: Array[TermCursor] = ordered.map { t =>
      new TermCursor(t, Bm25.idf(n, tstats(t).df), byTerm(t).blocks.toIndexedSeq, avgdl)
    }.toArray
    val weakestFirst: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)](e => (-e._1, e._2))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    val heap = mutable.PriorityQueue.empty[(Double, Long)](weakestFirst)
    def offer(score: Double, docId: Long): Unit = {
      if (heap.size < k) heap.enqueue((score, docId))
      else if (score > heap.head._1) { heap.dequeue(); heap.enqueue((score, docId)) }
    }
    var done = cursors.exists(_.exhausted)
    while (!done) {
      var target = Long.MinValue
      var ci = 0
      while (ci < cursors.length) {
        if (cursors(ci).curDoc > target) target = cursors(ci).curDoc
        ci += 1
      }
      var aligned = true
      ci = 0
      while (ci < cursors.length && !done) {
        val c = cursors(ci)
        if (c.curDoc < target) { c.advanceTo(target); aligned = false }
        if (c.exhausted) done = true
        ci += 1
      }
      if (!done && aligned) {
        // all cursors at target: full evaluation in ascending term order
        var score = 0.0
        var si = 0
        while (si < cursors.length) {
          val c = cursors(si)
          score += c.idf * Bm25.partial(c.curTf, c.curDl, avgdl)
          si += 1
        }
        if (!tombstones.contains(target)) offer(score, target)
        var ai = 0
        while (ai < cursors.length) {
          cursors(ai).advance()
          if (cursors(ai).exhausted) done = true
          ai += 1
        }
      }
    }
    val best = heap.dequeueAll.toArray.sortBy { case (s, d) => (-s, d) }
    best.take(k).zipWithIndex.map { case ((s, d), i) => ScoredDoc(qid, i + 1, d, s) }.toSeq
  }

  // ------------------------------------------------------------------ WAND

  /** Streaming cursor over one term's compressed blocks in one bucket.
    * Invariant after construction / advance*: (curDoc, curTf, curDl) hold
    * the current posting; (bi, i) point at the NEXT posting to decode.
    *
    * Payload decode is LAZY per block: entering a block decodes only its
    * docIds (which drive pivoting/skipping); tf/doclen arrays decode on the
    * first curTf/curDl access — a block that WAND skips over pays for one
    * array, not three.
    */
  private final class TermCursor(
      val term: String,
      val idf: Double,
      blocks: IndexedSeq[PostingBlock],
      avgdl: Double
  ) {
    private var bi = 0
    private var docs: Array[Long] = _
    private var tfs: Array[Int] = _
    private var dls: Array[Int] = _
    private var i = 0
    private var cur = -1
    var curDoc: Long = Long.MaxValue
    var exhausted: Boolean = blocks.isEmpty

    if (!exhausted) { loadBlock(); advance() }

    private def loadBlock(): Unit = {
      docs = Blocks.decodeDocIds(blocks(bi))
      tfs = null
      dls = null
      i = 0
    }

    private def ensurePayload(): Unit =
      if (tfs == null) {
        tfs = Blocks.decodeTfs(blocks(bi))
        dls = Blocks.decodeDoclens(blocks(bi))
      }

    def curTf: Int = { ensurePayload(); tfs(cur) }
    def curDl: Int = { ensurePayload(); dls(cur) }

    /** Block-max upper bound of the block holding curDoc, derived from the
      * stored avgdl-independent (maxTf, minDl) under the LIVE avgdl.
      */
    def blockMaxScore: Double = idf * Bm25.partial(blocks(bi).maxTf, blocks(bi).minDl, avgdl)
    def blockLastDoc: Long = blocks(bi).lastDocId

    def advance(): Unit = {
      if (exhausted) return
      if (i >= docs.length) {
        bi += 1
        if (bi >= blocks.length) { exhausted = true; curDoc = Long.MaxValue; return }
        loadBlock()
      }
      curDoc = docs(i); cur = i; i += 1
    }

    /** Advance to first posting with docId >= target, skipping whole blocks
      * via lastDocId metadata (never decodes skipped blocks).
      */
    def advanceTo(target: Long): Unit = {
      while (!exhausted && curDoc < target) {
        if (blocks(bi).lastDocId < target) {
          bi += 1
          while (bi < blocks.length && blocks(bi).lastDocId < target) bi += 1
          if (bi >= blocks.length) { exhausted = true; curDoc = Long.MaxValue; return }
          loadBlock()
          curDoc = docs(0); cur = 0; i = 1
        } else {
          advance()
        }
      }
    }
  }

  /** dev profiling hook */
  def wandBucketPublic(qid: String, terms: Seq[String], byTerm: Map[String, TermPostings],
      tstats: Map[String, TermStats], n: Long, avgdl: Double, k: Int): Seq[ScoredDoc] =
    wandBucket(qid, terms, byTerm, tstats, n, avgdl, k)

  /** Warm query server: pins stats and the postings columns in the Spark
    * block-manager cache and memoizes term stats, so repeated queries pay
    * only the filter+WAND job — the serving shape of a search engine (the
    * reference delegates this to a long-lived ES process; ours is a
    * long-lived cached Dataset).
    */
  final class IndexReader(spark: SparkSession, indexDir: String) {
    import spark.implicits._
    val stats: CorpusStats = loadStats(spark, indexDir)
    private val analyzer = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    // Tombstones as PER-BUCKET sorted docId arrays, loaded lazily on the
    // first query (the term-cache discipline): reader construction does no
    // tombstone work — the old eager Set[Long] cost a full collect +
    // broadcast in the constructor, linear in tombstone count, before the
    // first request could be served. Bucket mapping is pure arithmetic on
    // the lineage table's per-bucket docId ranges (O(buckets) read, no
    // docs-table join); membership is primitive binary search per bucket
    // (no per-candidate boxing/hashing of a 10^6-element hash set). One
    // read, memoized — the snapshot pin discipline of stats is kept.
    private lazy val tombByBucket: Map[Int, Array[Long]] = {
      if (!graft.index.IndexBuilder.exists(spark, s"$indexDir/tombstones")) Map.empty
      else {
        val ranges = spark.read.parquet(s"$indexDir/lineage")
          .groupBy(col("partitionId"))
          .agg(org.apache.spark.sql.functions.min("docIdMin").as("lo"),
            org.apache.spark.sql.functions.max("docIdMax").as("hi"))
          .select(col("partitionId").cast("int"), col("lo").cast("long"), col("hi").cast("long"))
          .as[(Int, Long, Long)].collect().sortBy(_._2)
        val los = ranges.map(_._2)
        val ids = spark.read.parquet(s"$indexDir/tombstones")
          .select(col("docId").cast("long")).distinct().as[Long].collect()
        val grouped = scala.collection.mutable.HashMap.empty[Int, scala.collection.mutable.ArrayBuilder.ofLong]
        ids.foreach { d =>
          var i = java.util.Arrays.binarySearch(los, d)
          if (i < 0) i = -i - 2
          // a tombstone outside every posting range suppresses nothing
          if (i >= 0 && i < ranges.length && d >= ranges(i)._2 && d <= ranges(i)._3)
            grouped.getOrElseUpdate(ranges(i)._1, new scala.collection.mutable.ArrayBuilder.ofLong) += d
        }
        grouped.iterator.map { case (b, ab) =>
          val a = ab.result(); java.util.Arrays.sort(a); b -> a
        }.toMap
      }
    }
    private lazy val tombB = spark.sparkContext.broadcast(tombByBucket)
    private val postings = spark.read.parquet(s"$indexDir/postings")
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .cache()
    private val terms = spark.read.parquet(s"$indexDir/terms")
      .groupBy("term")
      .agg(sum("df").as("df"), sum("cf").as("cf"),
        max("maxTf").as("maxTf"), min("minDl").as("minDl"))
      .cache()
    private val tcache = scala.collection.concurrent.TrieMap.empty[String, Option[TermStats]]
    locally { postings.count(); terms.count() } // materialize caches

    private def termStats(ts: Seq[String]): Map[String, TermStats] = {
      val missing = ts.filterNot(tcache.contains)
      if (missing.nonEmpty) {
        val loaded = terms.filter(col("term").isin(missing: _*))
          .select(col("term"), col("df"), col("cf"), col("maxTf"), col("minDl"))
          .as[TermStats].collect().map(t => t.term -> t).toMap
        missing.foreach(t => tcache.put(t, loaded.get(t)))
      }
      ts.flatMap(t => tcache(t).map(t -> _)).toMap
    }

    def topK(queries: Seq[(String, String)], k: Int): Dataset[ScoredDoc] = {
      val qTerms = queries.map { case (qid, text) =>
        qid -> analyzer.tokenize(text).distinct.sorted
      }
      val allTerms = qTerms.flatMap(_._2).distinct
      val tstats = termStats(allTerms)
      if (allTerms.isEmpty || tstats.isEmpty) return spark.emptyDataset[ScoredDoc]
      val qTermsB = spark.sparkContext.broadcast(qTerms)
      val tstatsB = spark.sparkContext.broadcast(tstats)
      val n = stats.n
      val avgdl = stats.avgdl
      val tomb = tombB // local ref — the closure must not capture `this`
      val perBucket = postings
        .filter(col("term").isin(allTerms: _*))
        .as[TermPostings]
        .groupByKey(_.bucket)
        .flatMapGroups { (b, rows) =>
          val byTerm: Map[String, TermPostings] = rows.map(tp => tp.term -> tp).toMap
          val ts = tstatsB.value
          val dead = QueryEngine.deadForBucket(tomb.value, b)
          qTermsB.value.iterator.flatMap { case (qid, terms) =>
            val present = terms.filter(byTerm.contains)
            if (present.isEmpty) Iterator.empty
            else wandBucket(qid, present, byTerm, ts, n, avgdl, k, dead).iterator
          }
        }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("queryId")).orderBy(col("score").desc, col("docId").asc)
      perBucket.toDF()
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("queryId"), col("rank").cast("int").as("rank"), col("docId"), col("score"))
        .as[ScoredDoc]
    }

    // ---- serving path: driver-side WAND over a term-row cache ----
    // One filtered collect per *new* term (from the cached postings DF);
    // warm queries run entirely on the driver — the analog of ES serving
    // from its page cache. Valid while query-term rows fit driver memory
    // (rows = terms × buckets, compressed); the distributed topK above is
    // the unbounded-scale path.
    private val termRows = scala.collection.concurrent.TrieMap.empty[String, Array[TermPostings]]

    private def loadTermRows(ts: Seq[String]): Unit = {
      val missing = ts.filterNot(termRows.contains)
      if (missing.nonEmpty) {
        val fetched = postings.filter(col("term").isin(missing: _*))
          .as[TermPostings].collect()
          .groupBy(_.term)
        missing.foreach(t => termRows.put(t, fetched.getOrElse(t, Array.empty)))
      }
    }

    /** Low-latency top-k: driver-side scatter-gather over cached rows.
      * Rank-identical to the distributed path (same wandBucket, same
      * merge ordering).
      */
    def topKServe(queries: Seq[(String, String)], k: Int): Seq[ScoredDoc] = {
      val qTerms = queries.map { case (qid, text) =>
        qid -> analyzer.tokenize(text).distinct.sorted
      }
      val allTerms = qTerms.flatMap(_._2).distinct
      if (allTerms.isEmpty) return Nil
      val tstats = termStats(allTerms)
      if (tstats.isEmpty) return Nil
      loadTermRows(allTerms)
      val n = stats.n
      val avgdl = stats.avgdl
      qTerms.flatMap { case (qid, terms) =>
        val present = terms.filter(t => termRows(t).nonEmpty)
        if (present.isEmpty) Nil
        else {
          val byBucket: Map[Int, Map[String, TermPostings]] = present
            .flatMap(t => termRows(t))
            .groupBy(_.bucket)
            .map { case (b, rows) => b -> rows.map(tp => tp.term -> tp).toMap }
          val candidates = byBucket.toSeq.sortBy(_._1).flatMap { case (b, byTerm) =>
            val inBucket = present.filter(byTerm.contains)
            if (inBucket.isEmpty) Nil
            else wandBucket(qid, inBucket, byTerm, tstats, n, avgdl, k,
              QueryEngine.deadForBucket(tombByBucket, b))
          }
          candidates.sortBy(c => (-c.score, c.docId)).take(k)
            .zipWithIndex.map { case (c, i) => c.copy(rank = i + 1) }
        }
      }
    }

    /** Conjunctive (bool-must) serving path over the same warm term-row
      * cache — rank-identical to `QueryEngine.topKAnd`.
      */
    def topKServeAnd(queries: Seq[(String, String)], k: Int): Seq[ScoredDoc] = {
      val qTerms = queries.map { case (qid, text) =>
        qid -> analyzer.tokenize(text).distinct.sorted
      }
      val allTerms = qTerms.flatMap(_._2).distinct
      if (allTerms.isEmpty) return Nil
      val tstats = termStats(allTerms)
      loadTermRows(allTerms)
      val n = stats.n
      val avgdl = stats.avgdl
      qTerms.flatMap { case (qid, terms) =>
        if (terms.isEmpty || !terms.forall(t => tstats.contains(t) && termRows(t).nonEmpty)) Nil
        else {
          val byBucket: Map[Int, Map[String, TermPostings]] = terms
            .flatMap(t => termRows(t))
            .groupBy(_.bucket)
            .map { case (b, rows) => b -> rows.map(tp => tp.term -> tp).toMap }
          val candidates = byBucket.toSeq.sortBy(_._1).flatMap { case (b, byTerm) =>
            if (!terms.forall(byTerm.contains)) Nil
            else conjunctiveBucket(qid, terms, byTerm, tstats, n, avgdl, k,
              QueryEngine.deadForBucket(tombByBucket, b))
          }
          candidates.sortBy(c => (-c.score, c.docId)).take(k)
            .zipWithIndex.map { case (c, i) => c.copy(rank = i + 1) }
        }
      }
    }

    def close(): Unit = { postings.unpersist(); terms.unpersist() }
  }

  /** Block-max WAND over one bucket for one query. Exact top-k under
    * (score desc, docId asc). `terms` must be sorted ascending — cursor
    * index order IS the summation order.
    */
  private[query] def wandBucket(
      qid: String,
      terms: Seq[String],
      byTerm: Map[String, TermPostings],
      tstats: Map[String, TermStats],
      n: Long,
      avgdl: Double,
      k: Int,
      tombstones: Set[Long] = Set.empty,
      boosts: Map[String, Double] = Map.empty,
      minMatch: Int = 1,
      allowed: Set[Long] = null
  ): Seq[ScoredDoc] = {
    val ordered = terms.sorted
    val cursors: Array[TermCursor] = ordered.flatMap { t =>
      tstats.get(t).map { st =>
        new TermCursor(t, Bm25.idf(n, st.df), byTerm(t).blocks.toIndexedSeq, avgdl)
      }
    }.toArray
    if (cursors.isEmpty) return Nil
    // per-cursor boost (fixed positive factor): scales every contribution
    // AND every upper bound identically, so block-max pruning stays exact;
    // association is (idf * partial) * boost — lockstep with the oracle
    val boost: Array[Double] = cursors.map(c => boosts.getOrElse(c.term, 1.0))
    // term-level upper bound from the bucket-local (maxTf, minDl) under the
    // live avgdl (tight + valid within this bucket, for any stats snapshot)
    val termUb: Array[Double] = cursors.indices.map { ci =>
      val c = cursors(ci)
      val tp = byTerm(c.term)
      (c.idf * Bm25.partial(tp.maxTf, tp.minDl, avgdl)) * boost(ci)
    }.toArray

    // heap of current top-k; head = weakest (lowest score, then largest docId)
    val weakestFirst: Ordering[(Double, Long)] =
      Ordering.by[(Double, Long), (Double, Long)](e => (-e._1, e._2))(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long))
    val heap = mutable.PriorityQueue.empty[(Double, Long)](weakestFirst)
    def threshold: Double = if (heap.size < k) Double.NegativeInfinity else heap.head._1
    def offer(score: Double, docId: Long): Unit = {
      if (heap.size < k) heap.enqueue((score, docId))
      else if (score > heap.head._1) { heap.dequeue(); heap.enqueue((score, docId)) }
      // equal score keeps the incumbent (smaller docId): exact tie-break
    }

    val live = mutable.ArrayBuffer(cursors.indices: _*)
    var spin = true
    while (spin && live.nonEmpty) {
      val sorted = live.toArray.sortBy(ci => cursors(ci).curDoc)
      // pivot: smallest prefix whose term-ub sum exceeds threshold
      var acc = 0.0
      var p = -1
      var j = 0
      while (j < sorted.length && p < 0) {
        acc += termUb(sorted(j))
        if (acc > threshold) p = j
        j += 1
      }
      if (p < 0 || cursors(sorted(p)).curDoc == Long.MaxValue) spin = false
      else {
        val pivotDoc = cursors(sorted(p)).curDoc
        if (cursors(sorted(0)).curDoc == pivotDoc) {
          // all cursors currently sitting at pivotDoc (any index — later
          // cursors may coincide too; the upper bound must include them)
          var bmAcc = 0.0
          var ci = 0
          while (ci < cursors.length) {
            val c = cursors(ci)
            if (!c.exhausted && c.curDoc == pivotDoc) bmAcc += c.blockMaxScore * boost(ci)
            ci += 1
          }
          if (bmAcc > threshold) {
            // full evaluation, ascending term order = ascending cursor index
            var score = 0.0
            var matched = 0
            var si = 0
            while (si < cursors.length) {
              val c = cursors(si)
              if (!c.exhausted && c.curDoc == pivotDoc) {
                score += (c.idf * Bm25.partial(c.curTf, c.curDl, avgdl)) * boost(si)
                matched += 1
              }
              si += 1
            }
            if (matched >= minMatch && !tombstones.contains(pivotDoc) &&
              ((allowed eq null) || allowed.contains(pivotDoc))) offer(score, pivotDoc)
            var ai = 0
            while (ai < cursors.length) {
              val c = cursors(ai)
              if (!c.exhausted && c.curDoc == pivotDoc) c.advance()
              ai += 1
            }
          } else {
            // block-max skip (BMW, Ding & Suel '11): docs up to the smallest
            // current-block boundary of the pivot set are bounded by bmAcc;
            // also bounded by the next doc of any cursor outside the set.
            var next = Long.MaxValue
            var mi = 0
            while (mi < cursors.length) {
              val c = cursors(mi)
              if (!c.exhausted) {
                if (c.curDoc == pivotDoc) next = math.min(next, c.blockLastDoc)
                else next = math.min(next, c.curDoc - 1)
              }
              mi += 1
            }
            val target = next + 1
            var ai = 0
            while (ai < cursors.length) {
              val c = cursors(ai)
              if (!c.exhausted && c.curDoc == pivotDoc) c.advanceTo(target)
              ai += 1
            }
          }
        } else {
          // advance the largest-ub cursor that is strictly before pivotDoc
          // (a tied-at-pivot cursor would make advanceTo a no-op → no
          // progress); sorted(0) is strictly before pivot in this branch.
          var best = sorted(0)
          var jb = 1
          while (jb < p) {
            if (cursors(sorted(jb)).curDoc < pivotDoc && termUb(sorted(jb)) > termUb(best))
              best = sorted(jb)
            jb += 1
          }
          cursors(best).advanceTo(pivotDoc)
        }
        var li = live.length - 1
        while (li >= 0) {
          if (cursors(live(li)).exhausted) live.remove(li)
          li -= 1
        }
      }
    }
    val best = heap.dequeueAll.toArray.sortBy { case (s, d) => (-s, d) }
    best.take(k).zipWithIndex.map { case ((s, d), i) => ScoredDoc(qid, i + 1, d, s) }.toSeq
  }
}
