package graft.index

import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Positional sidecar index: per (bucket, term, docId) the sorted token
  * positions of the term in the doc — what turns the inverted index into a
  * phrase-capable one (reference analog: ES stores positions in its
  * postings when `index_options` includes them; monstache users get phrase
  * queries through that).
  *
  * Stored as its own bucket-partitioned parquet table next to `postings`:
  * additive — the core index format is untouched, and builds that don't
  * need phrases skip the extra scan. Same scale discipline as postings:
  * term predicate pushdown at the scan, docId-range buckets keep any head
  * term split across partitions, per-bucket position maps are mini-index
  * sized. Positions are parquet int arrays (delta/RLE-encoded natively);
  * a posting's positions list is bounded by its doclen.
  *
  * Maintenance contract: opt-in — an index maintains positions iff the
  * table exists (the ES analog: `index_options: positions`). Once present,
  * `StreamIngest.appendBatch` extends it O(batch) (fresh buckets, dynamic
  * overwrite — retry-safe like every other batch write) and `compact`
  * rewrites affected buckets; enabling it on an existing index requires one
  * backfill build (ES requires a full reindex for the same change).
  */
object Positions {

  /** Build from assigned (docId, bucket, text) rows: one tokenize pass,
    * positions per (term, doc), shuffled by bucket (one fat row per
    * (doc, term) — the same fat-row-then-sort shape as the postings build).
    */
  def build(spark: SparkSession, assigned: DataFrame, indexDir: String,
      numBuckets: Int, codec: String = "zstd",
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Unicode): Unit =
    writeSegment(spark, assigned, s"$indexDir/positions", numBuckets, codec, analyzer)

  /** Tokenize-with-positions + bucket-partitioned dynamic overwrite of the
    * given rows' pbuckets — the batch build writes all buckets, a streaming
    * append writes only its fresh ones.
    */
  def writeSegment(spark: SparkSession, assigned: DataFrame, path: String,
      parts: Int, codec: String = "zstd",
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Unicode): Unit = {
    import spark.implicits._
    val rows = assigned.select(col("docId"), col("bucket"), col("text"))
      .as[(Long, Int, String)]
      .flatMap { case (docId, bucket, text) =>
        val toks = analyzer.tokenize(text)
        val byTerm = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Int]]
        var i = 0
        while (i < toks.length) {
          byTerm.getOrElseUpdate(toks(i), scala.collection.mutable.ArrayBuffer.empty[Int]) += i
          i += 1
        }
        byTerm.iterator.map { case (t, ps) => (bucket, t, docId, ps.toArray) }
      }
      .toDF("bucket", "term", "docId", "positions")
    rows
      .repartition(parts, col("bucket"))
      .sortWithinPartitions("bucket", "term", "docId")
      .withColumn("pbucket", col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket")
      .option("compression", codec)
      .parquet(path)
  }

  /** Index-backed match_phrase: for each phrase, every doc containing the
    * exact consecutive token sequence, with its occurrence count — output
    * contract identical to `SearchOps.phraseCounts` (the narrow relational
    * twin), which is the oracle cross-check.
    *
    * Shape: ONE term-pushdown scan for the union of phrase terms, one
    * groupByKey(bucket); each bucket materializes only its phrase-term
    * position lists (mini-index, same bound as a WAND bucket) and
    * intersects position chains per doc.
    */
  def phraseMatch(spark: SparkSession, indexDir: String,
      phrases: Seq[(String, String)], tombstones: Set[Long] = Set.empty,
      analyzer: TextPrep.Analyzer = TextPrep.Analyzer.Unicode): DataFrame = {
    import spark.implicits._
    val phraseTerms: Seq[(String, Array[String])] =
      phrases.map { case (pid, ptext) => pid -> analyzer.tokenize(ptext) }
    val allTerms = phraseTerms.flatMap(_._2).distinct
    val phrasesB = spark.sparkContext.broadcast(phraseTerms)
    val tombB = spark.sparkContext.broadcast(tombstones)

    val rows = spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("docId"), col("positions"))
      .as[(Int, String, Long, Array[Int])]

    rows.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        // term -> doc -> sorted positions, bucket-local
        val pos = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[Long, Array[Int]]]
        it.foreach { case (_, term, docId, ps) =>
          pos.getOrElseUpdate(term, scala.collection.mutable.HashMap.empty).put(docId, ps)
        }
        phrasesB.value.iterator.flatMap { case (pid, ws) =>
          val maps = ws.map(w => pos.getOrElse(w, null))
          if (maps.exists(_ == null)) Iterator.empty
          else {
            val lead = maps(0)
            val tomb = tombB.value
            lead.iterator.filter(e => !tomb.contains(e._1)).flatMap { case (docId, p0) =>
              // doc must hold every phrase term
              val rest = new Array[Array[Int]](ws.length)
              var ok = true
              var j = 1
              rest(0) = p0
              while (ok && j < ws.length) {
                maps(j).get(docId) match {
                  case Some(pj) => rest(j) = pj
                  case None => ok = false
                }
                j += 1
              }
              if (!ok) Iterator.empty
              else {
                // count start positions whose (p + j) chain exists in every
                // term's sorted list (binary search per link)
                var cnt = 0L
                var i = 0
                while (i < p0.length) {
                  val p = p0(i)
                  var k = 1
                  var chain = true
                  while (chain && k < ws.length) {
                    if (java.util.Arrays.binarySearch(rest(k), p + k) < 0) chain = false
                    k += 1
                  }
                  if (chain) cnt += 1
                  i += 1
                }
                if (cnt > 0) Iterator.single((pid, docId, cnt)) else Iterator.empty
              }
            }
          }
        }
      }
      .toDF("phrase_id", "doc_id", "n_matches")
  }

  /** Index-backed match_phrase_prefix: exact lead tokens followed by ANY
    * dictionary term starting with the probe's final prefix — output
    * contract identical to `SearchOps.phrasePrefixCounts` (the narrow
    * relational twin / shared oracle).
    *
    * Shape: the positions scan prunes to the lead terms (IN) plus the
    * prefix expansions (`StartsWith`, min/max-pruned on the term-sorted
    * parquet) — the multi-term rewrite ES runs against its term dictionary.
    * Per bucket, the expansions' position lists merge into ONE sorted
    * continuation list per doc (the union is what the chain check probes,
    * so expansion fan-out costs a merge, not a per-term re-scan).
    */
  def phrasePrefixMatch(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String)], tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val parsed: Seq[(String, Array[String], String)] = probes.map { case (pid, ptext) =>
      val ws = TextPrep.Analyzer.Unicode.tokenize(ptext)
      require(ws.length >= 2, s"phrase_prefix probe needs >=1 lead token + prefix: $ptext")
      (pid, ws.dropRight(1), ws.last)
    }
    val leadTerms = parsed.flatMap(_._2).distinct
    val prefixes = parsed.map(_._3).distinct
    val probesB = spark.sparkContext.broadcast(parsed)
    val tombB = spark.sparkContext.broadcast(tombstones)

    val pred = (if (leadTerms.nonEmpty) Seq(col("term").isin(leadTerms: _*)) else Nil) ++
      prefixes.map(p => col("term").startsWith(p))
    val rows = spark.read.parquet(s"$indexDir/positions")
      .filter(pred.reduce(_ || _))
      .select(col("bucket"), col("term"), col("docId"), col("positions"))
      .as[(Int, String, Long, Array[Int])]

    rows.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val pos = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[Long, Array[Int]]]
        it.foreach { case (_, term, docId, ps) =>
          pos.getOrElseUpdate(term, scala.collection.mutable.HashMap.empty).put(docId, ps)
        }
        probesB.value.iterator.flatMap { case (pid, lead, prefix) =>
          val leadMaps = lead.map(w => pos.getOrElse(w, null))
          // continuation: per doc, the SORTED union of every expansion
          // term's positions (sorted-merge of sorted lists)
          val contOf = scala.collection.mutable.HashMap.empty[Long, Array[Int]]
          pos.iterator.filter(_._1.startsWith(prefix)).foreach { case (_, docs) =>
            docs.foreach { case (docId, ps) =>
              contOf.get(docId) match {
                case None => contOf.put(docId, ps)
                case Some(old) =>
                  val merged = new Array[Int](old.length + ps.length)
                  var a = 0; var b = 0; var o = 0
                  while (a < old.length && b < ps.length) {
                    if (old(a) <= ps(b)) { merged(o) = old(a); a += 1 } else { merged(o) = ps(b); b += 1 }
                    o += 1
                  }
                  while (a < old.length) { merged(o) = old(a); a += 1; o += 1 }
                  while (b < ps.length) { merged(o) = ps(b); b += 1; o += 1 }
                  contOf.put(docId, merged)
              }
            }
          }
          if (leadMaps.exists(_ == null) || contOf.isEmpty) Iterator.empty
          else {
            val tomb = tombB.value
            leadMaps(0).iterator.filter(e => !tomb.contains(e._1)).flatMap { case (docId, p0) =>
              val rest = new Array[Array[Int]](lead.length)
              rest(0) = p0
              var ok = true
              var j = 1
              while (ok && j < lead.length) {
                leadMaps(j).get(docId) match {
                  case Some(pj) => rest(j) = pj
                  case None => ok = false
                }
                j += 1
              }
              val cont = if (ok) contOf.getOrElse(docId, null) else null
              if (cont == null) Iterator.empty
              else {
                var cnt = 0L
                var i = 0
                while (i < p0.length) {
                  val p = p0(i)
                  var chain = true
                  var k = 1
                  while (chain && k < lead.length) {
                    if (java.util.Arrays.binarySearch(rest(k), p + k) < 0) chain = false
                    k += 1
                  }
                  if (chain && java.util.Arrays.binarySearch(cont, p + lead.length) >= 0) cnt += 1
                  i += 1
                }
                if (cnt > 0) Iterator.single((pid, docId, cnt)) else Iterator.empty
              }
            }
          }
        }
      }
      .toDF("phrase_id", "doc_id", "n_matches")
  }

  /** Index-backed span_near (in_order=true, 2-term): per (pair, doc), the
    * number of ordered position pairs with at most `slop` intervening
    * tokens — output contract identical to `SearchOps.spanNearCounts` (the
    * narrow relational twin / shared oracle). Counts depend only on
    * position DIFFERENCES, so the sidecar's base offset is immaterial.
    *
    * Shape: positions scan prunes to the pair terms (IN); per bucket, each
    * co-occurring doc is counted with two binary-search bounds per lead
    * position (first-follower window (p, p+slop+1]) — O(|pa|·log|pb|) per
    * doc, no cross-doc state.
    */
  /** intervals query (ES `intervals` all_of ordered + max_gaps) served
    * from the positional sidecar: per (rule, doc) the ordered 3-term chain
    * count with span ≤ 3+max_gaps — same pinned containment semantic as
    * the relational twin (`SearchOps.intervalsCounts`). Scan pruned to the
    * rules' terms (pushdown), per-bucket position maps, two binary-search
    * bounds per (i, j) — O(|pa|·|pb_window|·log|pc|) per doc.
    */
  def intervalsMatch(spark: SparkSession, indexDir: String,
      rules: Seq[(String, String, String, String)], maxGaps: Int = 4,
      tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val allTerms = rules.flatMap { case (_, a, b, c) => Seq(a, b, c) }.distinct
    val rulesB = spark.sparkContext.broadcast(rules)
    val tombB = spark.sparkContext.broadcast(tombstones)
    val span = maxGaps + 2

    val rows = spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("docId"), col("positions"))
      .as[(Int, String, Long, Array[Int])]

    def lb(arr: Array[Int], v: Int): Int = {
      val i = java.util.Arrays.binarySearch(arr, v)
      if (i >= 0) i else -i - 1
    }

    rows.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val pos = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[Long, Array[Int]]]
        it.foreach { case (_, term, docId, ps) =>
          pos.getOrElseUpdate(term, scala.collection.mutable.HashMap.empty).put(docId, ps)
        }
        val tomb = tombB.value
        rulesB.value.iterator.flatMap { case (rid, a, b, c) =>
          (pos.get(a), pos.get(b), pos.get(c)) match {
            case (Some(ma), Some(mb), Some(mc)) =>
              ma.iterator.filter(e => !tomb.contains(e._1)).flatMap { case (docId, pa) =>
                (mb.get(docId), mc.get(docId)) match {
                  case (Some(pb), Some(pc)) =>
                    var cnt = 0L
                    var x = 0
                    while (x < pa.length) {
                      val i = pa(x)
                      var y = lb(pb, i + 1)
                      val yEnd = lb(pb, i + span) // j ≤ i + span - 1
                      while (y < yEnd) {
                        val j = pb(y)
                        cnt += lb(pc, i + span + 1) - lb(pc, j + 1) // j < k ≤ i + span
                        y += 1
                      }
                      x += 1
                    }
                    if (cnt > 0) Iterator.single((rid, docId, cnt)) else Iterator.empty
                  case _ => Iterator.empty
                }
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("rule_id", "doc_id", "n_matches")
  }

  /** span_first (ES) served from the positional sidecar: term-pruned scan,
    * the head of each (term, doc) position list IS the first occurrence —
    * no per-doc fold at all. Sidecar positions are 0-based; emitted
    * 1-based to match the relational twin's `array_position` contract.
    */
  def spanFirstMatch(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String, Int)],
      tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val terms = probes.map(_._2).distinct
    val probesB = spark.sparkContext.broadcast(probes)
    val tombB = spark.sparkContext.broadcast(tombstones)
    spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(terms: _*))
      .select(col("term"), col("docId"), col("positions"))
      .as[(String, Long, Array[Int])]
      .flatMap { case (term, docId, ps) =>
        if (tombB.value.contains(docId) || ps.isEmpty) Iterator.empty
        else {
          val first = ps(0) + 1L
          probesB.value.iterator.collect {
            case (pid, t, end) if t == term && first <= end => (pid, docId, first)
          }
        }
      }
      .toDF("probe_id", "doc_id", "first_pos")
  }

  def spanNearMatch(spark: SparkSession, indexDir: String,
      pairs: Seq[(String, String, String)], slop: Int = 3,
      tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val allTerms = pairs.flatMap { case (_, a, b) => Seq(a, b) }.distinct
    val pairsB = spark.sparkContext.broadcast(pairs)
    val tombB = spark.sparkContext.broadcast(tombstones)

    val rows = spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("docId"), col("positions"))
      .as[(Int, String, Long, Array[Int])]

    // insertion index of v in a strictly-increasing array
    def lowerBound(arr: Array[Int], v: Int): Int = {
      val i = java.util.Arrays.binarySearch(arr, v)
      if (i >= 0) i else -i - 1
    }

    rows.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val pos = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[Long, Array[Int]]]
        it.foreach { case (_, term, docId, ps) =>
          pos.getOrElseUpdate(term, scala.collection.mutable.HashMap.empty).put(docId, ps)
        }
        val tomb = tombB.value
        pairsB.value.iterator.flatMap { case (pid, a, b) =>
          (pos.get(a), pos.get(b)) match {
            case (Some(ma), Some(mb)) =>
              ma.iterator.filter(e => !tomb.contains(e._1)).flatMap { case (docId, pa) =>
                mb.get(docId) match {
                  case Some(pb) =>
                    var cnt = 0L
                    var i = 0
                    while (i < pa.length) {
                      val p = pa(i)
                      cnt += lowerBound(pb, p + slop + 2) - lowerBound(pb, p + 1)
                      i += 1
                    }
                    if (cnt > 0) Iterator.single((pid, docId, cnt)) else Iterator.empty
                  case None => Iterator.empty
                }
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("pair_id", "doc_id", "n_matches")
  }

  /** span_or (ES) served from the positional sidecar: the stored
    * position-list LENGTH of each clause term is its match count, so the
    * plan is a term-pruned scan + broadcast (clause, term) join + one
    * aggregation — no position decode beyond `size`, no corpus scan.
    * Clause terms are distinct strings, so per-term position sets are
    * disjoint and the sum equals the union count.
    */
  def spanOrMatch(spark: SparkSession, indexDir: String,
      clauses: Seq[(String, Seq[String])],
      tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val allTerms = clauses.flatMap(_._2).distinct
    val pairs = clauses.flatMap { case (cid, ts) => ts.map(t => (cid, t)) }
      .toDF("clause_id", "term")
    val tombB = spark.sparkContext.broadcast(tombstones)
    val alive = udf((docId: Long) => !tombB.value.contains(docId))
    spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(allTerms: _*))
      .filter(alive(col("docId")))
      .join(broadcast(pairs), Seq("term"))
      .groupBy(col("clause_id"), col("docId").as("doc_id"))
      .agg(sum(size(col("positions")).cast("long")).as("n_matches"))
      .select("clause_id", "doc_id", "n_matches")
  }

  /** span_not (ES, pre/post window) served from the positional sidecar:
    * bucket-local cogroup of the include and exclude terms' position
    * lists (same shape as [[spanNearMatch]]); each include position costs
    * two binary searches on the exclude list — it survives iff the
    * half-open window [i − pre, i + post + 1) is empty. Windows are
    * relative, so the sidecar's 0-based positions need no rebase.
    */
  def spanNotMatch(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String, String, Int, Int)],
      tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val allTerms = probes.flatMap { case (_, inc, exc, _, _) => Seq(inc, exc) }.distinct
    val probesB = spark.sparkContext.broadcast(probes)
    val tombB = spark.sparkContext.broadcast(tombstones)

    val rows = spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("docId"), col("positions"))
      .as[(Int, String, Long, Array[Int])]

    def lowerBound(arr: Array[Int], v: Int): Int = {
      val i = java.util.Arrays.binarySearch(arr, v)
      if (i >= 0) i else -i - 1
    }

    rows.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val pos = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[Long, Array[Int]]]
        it.foreach { case (_, term, docId, ps) =>
          pos.getOrElseUpdate(term, scala.collection.mutable.HashMap.empty).put(docId, ps)
        }
        val tomb = tombB.value
        probesB.value.iterator.flatMap { case (pid, inc, exc, pre, post) =>
          pos.get(inc) match {
            case Some(mi) =>
              val me = pos.getOrElse(exc, scala.collection.mutable.HashMap.empty[Long, Array[Int]])
              mi.iterator.filter(e => !tomb.contains(e._1)).flatMap { case (docId, pi) =>
                val cnt = me.get(docId) match {
                  case Some(pe) =>
                    var c = 0L
                    var x = 0
                    while (x < pi.length) {
                      val i = pi(x)
                      if (lowerBound(pe, i + post + 1) - lowerBound(pe, i - pre) == 0) c += 1
                      x += 1
                    }
                    c
                  case None => pi.length.toLong
                }
                if (cnt > 0) Iterator.single((pid, docId, cnt)) else Iterator.empty
              }
            case None => Iterator.empty
          }
        }
      }
      .toDF("probe_id", "doc_id", "n_matches")
  }

  /** span_containing / span_within (ES) served from the positional sidecar,
    * completing the span family. The big span is the span_near pair
    * (a, b, slop) — (i, j) with i < j ≤ i + slop + 1, extent [i, j]
    * inclusive — and the little span a single term's position.
    * `containing` counts big spans holding ≥1 little position (two binary
    * searches on the little list per candidate pair); `within` counts
    * little positions enclosed by ≥1 big span (an i-window scan on the a
    * list + one binary-search probe on the b list per candidate). Same
    * bucket-local cogroup shape as [[spanNearMatch]]: term-pruned sidecar
    * scan, per-bucket position maps, no corpus access. Extents are
    * relative, so the sidecar's 0-based positions need no rebase.
    */
  def spanContainMatch(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String, String, String, Int)], within: Boolean,
      tombstones: Set[Long] = Set.empty): DataFrame = {
    import spark.implicits._
    val allTerms = probes.flatMap { case (_, l, a, b, _) => Seq(l, a, b) }.distinct
    val probesB = spark.sparkContext.broadcast(probes)
    val tombB = spark.sparkContext.broadcast(tombstones)

    val rows = spark.read.parquet(s"$indexDir/positions")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("docId"), col("positions"))
      .as[(Int, String, Long, Array[Int])]

    def lb(arr: Array[Int], v: Int): Int = {
      val i = java.util.Arrays.binarySearch(arr, v)
      if (i >= 0) i else -i - 1
    }

    rows.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val pos = scala.collection.mutable.HashMap.empty[String, scala.collection.mutable.HashMap[Long, Array[Int]]]
        it.foreach { case (_, term, docId, ps) =>
          pos.getOrElseUpdate(term, scala.collection.mutable.HashMap.empty).put(docId, ps)
        }
        val tomb = tombB.value
        probesB.value.iterator.flatMap { case (pid, little, bigA, bigB, slop) =>
          (pos.get(little), pos.get(bigA), pos.get(bigB)) match {
            case (Some(ml), Some(ma), Some(mb)) =>
              ma.iterator.filter(e => !tomb.contains(e._1)).flatMap { case (docId, pa) =>
                (ml.getOrElse(docId, null), mb.getOrElse(docId, null)) match {
                  case (pl, pb) if pl != null && pb != null =>
                    var cnt = 0L
                    if (within) {
                      // little positions enclosed by some (i, j) big span
                      var z = 0
                      while (z < pl.length) {
                        val p = pl(z)
                        var x = lb(pa, p - slop - 1) // i ≥ p − slop − 1
                        val xEnd = lb(pa, p + 1)     // i ≤ p
                        var found = false
                        while (!found && x < xEnd) {
                          val i = pa(x)
                          val jLo = math.max(i + 1, p) // j > i and j ≥ p
                          if (lb(pb, i + slop + 2) - lb(pb, jLo) > 0) found = true
                          x += 1
                        }
                        if (found) cnt += 1
                        z += 1
                      }
                    } else {
                      // big spans holding ≥1 little position in [i, j]
                      var x = 0
                      while (x < pa.length) {
                        val i = pa(x)
                        var y = lb(pb, i + 1)
                        val yEnd = lb(pb, i + slop + 2)
                        while (y < yEnd) {
                          val j = pb(y)
                          if (lb(pl, j + 1) - lb(pl, i) > 0) cnt += 1
                          y += 1
                        }
                        x += 1
                      }
                    }
                    if (cnt > 0) Iterator.single((pid, docId, cnt)) else Iterator.empty
                  case _ => Iterator.empty
                }
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("probe_id", "doc_id", "n_matches")
  }
}
