package graft.query

import graft.codec.Blocks
import graft.model._
import graft.textprep.TextPrep
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The rest of the ES query DSL served FROM the inverted index — the
  * operators the reference delegates to Elasticsearch
  * (`/root/reference/monstache.go:46,657-670`) whose round-3 implementations
  * ranked over a relational full scan (O(corpus) per query). Every operator
  * here reads only term-pushdown-pruned postings / the term dictionary /
  * the docs sidecar tables, and each has a relational twin whose DuckDB
  * oracle it must match hash-for-hash (the `q_filtered_index` ≡
  * `q_filtered_topk` pattern).
  *
  * Scale shape shared by all: the postings scan prunes to the query terms
  * at the parquet reader; per-bucket work touches one mini-index; merges are
  * k·buckets (top-k ops) or match-set-sized (facet/sort — the same
  * cardinality ES's own aggregations traverse per shard).
  */
object IndexSearch {

  /** All docIds of one term, decoded from its postings rows. Buckets are
    * docId-disjoint and a term appears once per bucket, so the union is
    * distinct by construction. One term-pruned scan; decode is docIds-only
    * (tf/doclen bytes are never touched).
    */
  def termDocIds(spark: SparkSession, indexDir: String, term: String): DataFrame = {
    import spark.implicits._
    spark.read.parquet(s"$indexDir/postings")
      .filter(col("term") === term)
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]
      .flatMap(tp => tp.blocks.iterator.flatMap(b => Blocks.decodeDocIds(b).iterator))
      .toDF("docId")
  }

  /** bool.must_not served from the index: the banned term's posting list
    * becomes the exclusion Dataset of the filter-context WAND — it rides the
    * same bucket-local cogroup as tombstones (nothing driver-side), and
    * pruning exactness is the `topKWhere` argument unchanged.
    */
  def mustNotTopK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      banned: String, k: Int = 10): Dataset0 =
    QueryEngine.topKWhere(spark, indexDir, queries, k,
      termDocIds(spark, indexDir, banned))

  private type Dataset0 = org.apache.spark.sql.Dataset[ScoredDoc]

  /** (query_id, doc_id) match set — every live doc containing ANY query
    * term, from postings only. The per-bucket union walks each term's
    * blocks once (docIds-only decode) into a bucket-local distinct set
    * (bounded by the bucket's doc range — the mini-index invariant). This
    * is the retrieval half of facets / sort-by-field, the same full-match
    * traversal ES runs per shard for a terms aggregation.
    */
  def matchedDocs(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms: Seq[(String, Array[String])] =
      queries.map { case (qid, text) => qid -> an.tokenize(text).distinct }
    val allTerms = qTerms.flatMap(_._2).distinct
    if (allTerms.isEmpty)
      return spark.emptyDataset[(String, Long)].toDF("query_id", "doc_id")
    val qTermsB = spark.sparkContext.broadcast(qTerms)

    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]

    def bucketMatches(rows: Iterator[TermPostings], dead: Set[Long]): Iterator[(String, Long)] = {
      val byTerm: Map[String, TermPostings] = rows.map(tp => tp.term -> tp).toMap
      if (byTerm.isEmpty) Iterator.empty
      else qTermsB.value.iterator.flatMap { case (qid, terms) =>
        val present = terms.filter(byTerm.contains)
        if (present.isEmpty) Iterator.empty
        else {
          val seen = new java.util.HashSet[Long]()
          present.iterator.flatMap { t =>
            byTerm(t).blocks.iterator.flatMap(b => Blocks.decodeDocIds(b).iterator)
              .filter(d => !dead.contains(d) && seen.add(d))
              .map(d => (qid, d))
          }
        }
      }
    }

    val grouped = postings.groupByKey(_.bucket)
    val matched = QueryEngine.deadDocs(spark, indexDir, None) match {
      case None => grouped.flatMapGroups((_, rows) => bucketMatches(rows, Set.empty[Long]))
      case Some(ex) =>
        grouped.cogroup(ex)((_, rows, exRows) => bucketMatches(rows, exRows.map(_._2).toSet))
    }
    matched.toDF("query_id", "doc_id")
  }

  /** constant_score served from the index: scoring is skipped entirely —
    * per bucket, a k-way ascending merge over the query terms' block
    * streams yields the k smallest live matching docIds (early exit after k:
    * later blocks are never decoded), then a k·buckets window finishes the
    * global doc_id-ordered page.
    */
  def constantScoreTopK(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], boost: Double = 1.0, k: Int = 10): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms: Seq[(String, Array[String])] =
      queries.map { case (qid, text) => qid -> an.tokenize(text).distinct }
    val allTerms = qTerms.flatMap(_._2).distinct
    if (allTerms.isEmpty)
      return spark.emptyDataset[(String, Long)].toDF("query_id", "doc_id")
        .withColumn("rank", lit(1)).withColumn("score", lit(boost))
        .limit(0).select("query_id", "rank", "doc_id", "score")
    val qTermsB = spark.sparkContext.broadcast(qTerms)

    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]

    def bucketFirstK(rows: Iterator[TermPostings], dead: Set[Long]): Iterator[(String, Long)] = {
      val byTerm: Map[String, TermPostings] = rows.map(tp => tp.term -> tp).toMap
      if (byTerm.isEmpty) Iterator.empty
      else qTermsB.value.iterator.flatMap { case (qid, terms) =>
        val present = terms.filter(byTerm.contains)
        if (present.isEmpty) Iterator.empty
        else {
          // lazy block-at-a-time streams; ordering by head docId
          val streams: Array[BufferedIterator[Long]] = present.map { t =>
            byTerm(t).blocks.iterator.flatMap(b => Blocks.decodeDocIds(b).iterator).buffered
          }.toArray
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
          var last = Long.MinValue
          while (out.length < k && streams.exists(_.hasNext)) {
            var mi = -1
            var mv = Long.MaxValue
            var i = 0
            while (i < streams.length) {
              if (streams(i).hasNext && streams(i).head < mv) { mv = streams(i).head; mi = i }
              i += 1
            }
            streams(mi).next()
            if (mv != last && !dead.contains(mv)) { out += ((qid, mv)); last = mv }
            else last = mv
          }
          out.iterator
        }
      }
    }

    val grouped = postings.groupByKey(_.bucket)
    val perBucket = QueryEngine.deadDocs(spark, indexDir, None) match {
      case None => grouped.flatMapGroups((_, rows) => bucketFirstK(rows, Set.empty[Long]))
      case Some(ex) =>
        grouped.cogroup(ex)((_, rows, exRows) => bucketFirstK(rows, exRows.map(_._2).toSet))
    }
    val w = Window.partitionBy(col("query_id")).orderBy(col("doc_id").asc)
    perBucket.toDF("query_id", "doc_id")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), lit(boost).as("score"))
  }

  /** Facet (terms-aggregation) counts served from the index: the match set
    * comes from postings (`matchedDocs`), the facet values from the doc
    * metadata table — the doc-values read ES does for its own aggregations.
    * `docsMeta` must carry (doc_id, facet); the join key is uniform doc_id.
    */
  def facetCounts(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, facet: String): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .groupBy(col("query_id"), col(facet))
      .agg(count(lit(1)).as("n_docs"))

  /** Sort-by-field retrieval served from the index (ES `sort` without
    * scoring): match set from postings, sort key from doc metadata,
    * per-query window top-k.
    */
  def sortByField(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col(field).desc, col("doc_id").asc)
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col(field))
  }

  /** search_after page 2 served from the index: WAND at depth 2k, keep
    * ranks k+1..2k. The cursor predicate ((score, doc_id) strictly after
    * rank k under the total order) selects exactly the global ranks > k, so
    * deep-paging via the index IS the cursor semantics — ES runs the same
    * shard-level top-(from+size) for both.
    */
  def searchAfterPage(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], k: Int = 10): DataFrame =
    QueryEngine.topK(spark, indexDir, queries, 2 * k).toDF()
      .filter(col("rank") > k)
      .select(col("queryId").as("query_id"), (col("rank") - k).cast("int").as("page_rank"),
        col("docId").as("doc_id"), round(col("score"), 4).as("score"))

  /** more_like_this served from the index: seed term vectors are analyzed
    * from the seed docs ONLY (O(seeds) — the ES `like` analysis step), df
    * and corpus stats come from the term dictionary, and the derived
    * queries run through WAND at depth k+1 with the seed dropped (a seed
    * can occupy at most one rank of its own ranking, so k+1 is exact).
    * No corpus tokenize anywhere.
    */
  def moreLikeThis(spark: SparkSession, indexDir: String,
      seedDocs: DataFrame, nTerms: Int = 3, k: Int = 10): DataFrame = {
    val seeds: Array[(Long, String)] = seedDocs
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val stats = QueryEngine.loadStats(spark, indexDir)
    val anM = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val seedTfs: Array[(Long, Array[(String, Int)])] =
      seeds.map { case (id, text) => id -> anM.termFreqs(text) }
    val allTerms = seedTfs.flatMap(_._2.map(_._1)).distinct.toSeq
    val dict = QueryEngine.loadTermStats(spark, indexDir, allTerms)
    // top-nTerms per seed by tf·idf with the oracle's total tie-break
    // (tfidf desc, term asc); tf·idf = tf * ln(N/df), both doubles built
    // from the same operands the SQL twin uses
    val queries = seedTfs.map { case (id, tfs) =>
      val top = tfs.filter(t => dict.contains(t._1))
        .map { case (t, tf) => (t, tf.toDouble * math.log(stats.n.toDouble / dict(t).df.toDouble)) }
        .sortBy { case (t, s) => (-s, t) }
        .take(nTerms).map(_._1)
      id.toString -> top.mkString(" ")
    }.toSeq
    val seedOf = queries.map { case (qid, _) => qid -> qid.toLong }.toMap
    val w = Window.partitionBy(col("seed_id")).orderBy(col("old_rank").asc)
    QueryEngine.topK(spark, indexDir, queries, k + 1).toDF()
      .select(col("queryId").cast("long").as("seed_id"), col("rank").as("old_rank"),
        col("docId").as("doc_id"), col("score"))
      .filter(col("doc_id") =!= col("seed_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("seed_id"), col("rank"), col("doc_id"), round(col("score"), 4).as("score"))
  }

  /** Highlight snippets served from the index (ES `highlight`): ranking is
    * WAND over postings (never the corpus), then the FETCH phase joins the
    * stored text of the k·queries hits only — the same two-phase
    * query-then-fetch ES executes. Must equal the relational twin
    * row-for-row (rank identity is the q_wand_topk ≡ q_bm25_topk
    * invariant; the window derivation is shared code).
    */
  def snippets(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsText: DataFrame, k: Int = 3, before: Int = 3, after: Int = 4): DataFrame = {
    val top = QueryEngine.topK(spark, indexDir, queries, k).toDF()
      .select(col("queryId").as("query_id"), col("rank"), col("docId").as("doc_id"))
    SearchOps.snippetFrom(top, docsText, queries, before, after)
  }

  /** Histogram aggregation served from the index (ES `histogram`): match
    * set from postings, the numeric field from doc metadata — the doc-values
    * read ES does per shard. One uniform doc_id join + one aggregation.
    */
  def histogramAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String, interval: Long): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("bucket_lo",
        (floor(col(field) / lit(interval.toDouble)) * interval).cast("bigint"))
      .groupBy("query_id", "bucket_lo")
      .agg(count(lit(1)).as("n_docs"))

  /** Stats aggregation served from the index (ES `stats`). */
  def statsAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_chars"), max(col(field)).as("max_chars"),
        sum(col(field)).as("sum_chars"),
        (round(avg(col(field).cast("double")) + lit(1.0e-9), 4) + lit(0.0)).as("avg_chars"))

  /** Cardinality aggregation served from the index (ES `cardinality`) —
    * exact form; the 100 TB swap is `approx_count_distinct` (HLL++), ES's
    * own estimator.
    */
  def cardinalityAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, facet: String): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(count_distinct(col(facet)).as("n_distinct"))

  /** Date-histogram served from the index (ES `date_histogram`, calendar
    * `day`): the day key is a narrow per-row derivation over the match set
    * (`SearchOps.crawlDay` fixture; a PageDoc deployment passes
    * `date_trunc('day', warc_ts)` from the docs sidecar).
    */
  def dateHistogram(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      day: org.apache.spark.sql.Column): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .withColumn("day", day)
      .groupBy("query_id", "day")
      .agg(count(lit(1)).as("n_docs"))

  /** Wildcard query served from the index (ES `wildcard` multi-term
    * rewrite): pattern match against the postings term dictionary, docIds
    * decoded only for matching terms. Leading-`%` patterns can't min/max
    * prune the term-sorted scan — but the scan is the dictionary, not the
    * corpus (ES pays the same full-dictionary walk for leading wildcards).
    */
  def wildcardMatch(spark: SparkSession, indexDir: String,
      patterns: Seq[(String, String)]): DataFrame =
    expandMatch(spark, indexDir, patterns, (term, pat) => term.like(pat))

  /** Regexp query served from the index (ES `regexp`): RLIKE over the term
    * dictionary, same shape as `wildcardMatch`.
    */
  def regexpMatch(spark: SparkSession, indexDir: String,
      patterns: Seq[(String, String)]): DataFrame =
    expandMatch(spark, indexDir, patterns, (term, pat) => term.rlike(pat))

  /** Shared multi-term-rewrite aggregation: per pattern, n_terms expanded
    * and n_docs matched, from postings only.
    */
  private def expandMatch(spark: SparkSession, indexDir: String,
      patterns: Seq[(String, String)],
      pred: (org.apache.spark.sql.Column, String) => org.apache.spark.sql.Column): DataFrame = {
    import spark.implicits._
    val p = patterns.toDF("pattern_id", "pattern")
    val cond = patterns.map { case (pid, pat) =>
      col("pattern_id") === pid && pred(col("term"), pat)
    }.reduce(_ || _)
    spark.read.parquet(s"$indexDir/postings")
      .filter(patterns.map(pp => pred(col("term"), pp._2)).reduce(_ || _))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]
      .flatMap(tp => tp.blocks.iterator.flatMap(b => Blocks.decodeDocIds(b).iterator)
        .map(d => (tp.term, d)))
      .toDF("term", "doc_id")
      .join(broadcast(p), cond)
      .groupBy("pattern_id", "pattern")
      .agg(count_distinct(col("term")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"))
  }

  /** Prefix query served from the index: term expansion AND doc counting
    * read postings only — the `StartsWith` predicate prunes the term-sorted
    * parquet scan via min/max stats, matched rows decode docIds-only.
    * (ES rewrites prefix queries against its term dictionary identically.)
    */
  def prefixMatch(spark: SparkSession, indexDir: String,
      prefixes: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val pB = spark.sparkContext.broadcast(prefixes)
    spark.read.parquet(s"$indexDir/postings")
      .filter(prefixes.map(p => col("term").startsWith(p._2)).reduce(_ || _))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]
      .flatMap { tp =>
        pB.value.iterator.filter { case (_, p) => tp.term.startsWith(p) }.flatMap {
          case (pid, p) =>
            tp.blocks.iterator.flatMap(b => Blocks.decodeDocIds(b).iterator)
              .map(d => (pid, p, tp.term, d))
        }
      }
      .toDF("prefix_id", "prefix", "term", "doc_id")
      .groupBy("prefix_id", "prefix")
      .agg(count_distinct(col("term")).as("n_terms"),
        count_distinct(col("doc_id")).as("n_docs"))
  }

  /** match_bool_prefix served from the index: full-term clauses read their
    * postings via In() pushdown, the prefix clause prunes the term-sorted
    * scan via StartsWith min/max stats (like [[prefixMatch]]); matched rows
    * decode docIds only. Per (probe, doc) the DISTINCT-clause count —
    * expansions of the prefix collapse to ONE clause, the ES contract.
    */
  def matchBoolPrefix(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val clauseList: Seq[(String, String, String)] = probes.flatMap { case (pid, text) =>
      val toks = an.tokenize(text)
      if (toks.isEmpty) Seq.empty
      else toks.init.distinct.map(t => (pid, "term", t)) :+ ((pid, "prefix", toks.last))
    }
    val full = clauseList.collect { case (_, "term", v) => v }.distinct
    val prefs = clauseList.collect { case (_, "prefix", v) => v }.distinct
    val cB = spark.sparkContext.broadcast(clauseList)
    val pred = (if (full.nonEmpty) Seq(col("term").isin(full: _*)) else Nil) ++
      prefs.map(p => col("term").startsWith(p))
    spark.read.parquet(s"$indexDir/postings")
      .filter(pred.reduce(_ || _))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]
      .flatMap { tp =>
        val hits = cB.value.filter { case (_, kind, v) =>
          (kind == "term" && tp.term == v) || (kind == "prefix" && tp.term.startsWith(v))
        }
        if (hits.isEmpty) Iterator.empty
        else tp.blocks.iterator.flatMap(b => Blocks.decodeDocIds(b).iterator).flatMap(d =>
          hits.iterator.map { case (pid, kind, v) => (pid, d, s"$kind:$v") })
      }
      .toDF("probe_id", "doc_id", "clause")
      .groupBy("probe_id", "doc_id")
      .agg(count_distinct(col("clause")).as("n_clauses"))
  }

  /** Exact BM25 contributions for EVERY matching (query, doc) pair, served
    * from postings — the exhaustive-retrieval half of dis_max / top_hits /
    * percentile aggregations, where the consumer needs all matched docs
    * rather than a global top-k (the per-shard traversal ES runs when a
    * query feeds an aggregation). Per bucket each query term's blocks
    * decode once (docIds + tf + doclen); contributions accumulate per doc
    * in ascending-term order, so the score is bit-identical to the oracle's
    * `sum(addend ORDER BY term)` — the q_wand_topk ≡ q_bm25_topk invariant
    * extended below the top-k horizon. Emits
    * (query_id, doc_id, score, max_addend, matched).
    */
  def scoredMatches(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms: Seq[(String, Array[String])] =
      queries.map { case (qid, text) => qid -> an.tokenize(text).distinct.sorted }
    val allTerms = qTerms.flatMap(_._2).distinct
    val empty = spark.emptyDataset[(String, Long, Double, Double, Long)]
      .toDF("query_id", "doc_id", "score", "max_addend", "matched")
    if (allTerms.isEmpty) return empty
    val stats = QueryEngine.loadStats(spark, indexDir)
    val tstats = QueryEngine.loadTermStats(spark, indexDir, allTerms)
    if (tstats.isEmpty) return empty
    val qTermsB = spark.sparkContext.broadcast(qTerms)
    val tstatsB = spark.sparkContext.broadcast(tstats)
    val n = stats.n
    val avgdl = stats.avgdl

    val postings = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]

    def bucketScore(rows: Iterator[TermPostings],
        dead: Set[Long]): Iterator[(String, Long, Double, Double, Long)] = {
      val byTerm: Map[String, TermPostings] = rows.map(tp => tp.term -> tp).toMap
      if (byTerm.isEmpty) Iterator.empty
      else {
        val ts = tstatsB.value
        qTermsB.value.iterator.flatMap { case (qid, terms) =>
          val present = terms.filter(byTerm.contains) // ascending (pre-sorted)
          if (present.isEmpty) Iterator.empty
          else {
            // doc -> (running ordered sum, max addend, matched terms)
            val acc = new java.util.HashMap[Long, Array[Double]]()
            present.foreach { t =>
              val idf = Bm25.idf(n, ts(t).df)
              byTerm(t).blocks.foreach { b =>
                val ids = Blocks.decodeDocIds(b)
                val tfs = Blocks.decodeTfs(b)
                val dls = Blocks.decodeDoclens(b)
                var i = 0
                while (i < ids.length) {
                  val d = ids(i)
                  if (!dead.contains(d)) {
                    val a = idf * Bm25.partial(tfs(i), dls(i), avgdl)
                    var cell = acc.get(d)
                    if (cell == null) { cell = Array(0.0, Double.NegativeInfinity, 0.0); acc.put(d, cell) }
                    cell(0) += a
                    if (a > cell(1)) cell(1) = a
                    cell(2) += 1.0
                  }
                  i += 1
                }
              }
            }
            val it = acc.entrySet().iterator()
            new Iterator[(String, Long, Double, Double, Long)] {
              def hasNext: Boolean = it.hasNext
              def next(): (String, Long, Double, Double, Long) = {
                val e = it.next()
                val c = e.getValue
                (qid, e.getKey, c(0), c(1), c(2).toLong)
              }
            }
          }
        }
      }
    }

    val grouped = postings.groupByKey(_.bucket)
    val scored = QueryEngine.deadDocs(spark, indexDir, None) match {
      case None => grouped.flatMapGroups((_, rows) => bucketScore(rows, Set.empty[Long]))
      case Some(ex) =>
        grouped.cogroup(ex)((_, rows, exRows) => bucketScore(rows, exRows.map(_._2).toSet))
    }
    scored.toDF("query_id", "doc_id", "score", "max_addend", "matched")
  }

  /** dis_max served from the index (ES `dis_max` with `tie_breaker`): the
    * best single-term contribution plus tb × the rest —
    * `mx + tb*(sum - mx)`, the exact expression the oracle evaluates on the
    * same operand doubles. Retrieval is [[scoredMatches]] (postings only);
    * the final window ranks k·matches per query.
    */
  def disMaxTopK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      tieBreaker: Double = 0.3, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("dscore").desc, col("doc_id").asc)
    scoredMatches(spark, indexDir, queries)
      .withColumn("dscore",
        col("max_addend") + lit(tieBreaker) * (col("score") - col("max_addend")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("dscore"), 4).as("score"))
  }

  /** top_hits inside a terms aggregation, served from the index: per
    * (query, facet bucket), the n best-scoring matched docs. ES collects
    * exactly this per aggregation bucket; retrieval cost is the matched
    * set (scoredMatches), not the corpus.
    */
  def topHits(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, facet: String, n: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("query_id"), col(facet))
      .orderBy(col("score").desc, col("doc_id").asc)
    scoredMatches(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(facet)), Seq("doc_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("query_id"), col(facet), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** percentiles aggregation served from the index (ES `percentiles`,
    * exact/`tdigest`-free form): match set from postings, the numeric field
    * from doc metadata, linear-interpolated quantiles — the same R-7
    * interpolation DuckDB's `quantile_cont` computes. The 100 TB swap is
    * `percentile_approx` (ES itself estimates via t-digest).
    */
  def percentilesAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .groupBy("query_id")
      .agg(
        round(percentile(col(field), lit(0.25)), 4).as("p25"),
        round(percentile(col(field), lit(0.5)), 4).as("p50"),
        round(percentile(col(field), lit(0.75)), 4).as("p75"),
        round(percentile(col(field), lit(0.95)), 4).as("p95"))

  /** range filter context served from the index (ES `bool.filter.range`):
    * the allowed set is the docs-sidecar rows inside the range, cogrouped
    * bucket-locally into the WAND gate ([[QueryEngine.topKWithin]]).
    */
  def rangeTopK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String, lo: Long, hi: Long, k: Int = 10): DataFrame =
    QueryEngine.topKWithin(spark, indexDir, queries, k,
      docsMeta.filter(col(field).between(lo, hi)).select(col("doc_id").as("docId"))).toDF()
      .select(col("queryId").as("query_id"), col("rank"),
        col("docId").as("doc_id"), round(col("score"), 4).as("score"))

  /** function_score / field_value_factor served from the index: retrieval
    * and BM25 from postings ([[scoredMatches]]), the multiplier from the
    * doc-values table, fscore = score × ln(1 + field) — the identical
    * expression (and doubles) as the relational twin.
    */
  def functionScoreTopK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String = "n_chars", k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("fscore").desc, col("doc_id").asc)
    scoredMatches(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("fscore", col("score") * log(lit(1.0) + col(field)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("fscore"), 4).as("score"))
  }

  /** The full ES `bool` query served from the index: must/should groups are
    * two [[scoredMatches]] passes (each a term-pruned postings scan),
    * must_not is the banned terms' match set ([[matchedDocs]]) anti-joined
    * — every leg reads postings only, joined on uniform (query, doc) keys.
    * Score association matches the oracle: each group's ascending-term sum,
    * then must + should.
    */
  def boolFullTopK(spark: SparkSession, indexDir: String,
      boolQs: Seq[(String, String, String, String)] = SearchOps.BoolQueries,
      k: Int = 10): DataFrame = {
    import spark.implicits._
    val anB = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val mustQs = boolQs.map(q => (q._1, q._2))
    val shouldQs = boolQs.filter(q => anB.tokenize(q._3).nonEmpty).map(q => (q._1, q._3))
    val notQs = boolQs.filter(q => anB.tokenize(q._4).nonEmpty).map(q => (q._1, q._4))
    val arity = boolQs.map { case (qid, m, _, _) =>
      (qid, anB.tokenize(m).distinct.length.toLong)
    }.toDF("query_id", "n_must")

    val m = scoredMatches(spark, indexDir, mustQs)
      .select(col("query_id"), col("doc_id"), col("score").as("must_score"),
        col("matched").as("must_matched"))
    val sScores =
      if (shouldQs.isEmpty)
        spark.emptyDataset[(String, Long, Double)].toDF("query_id", "doc_id", "should_score")
      else scoredMatches(spark, indexDir, shouldQs)
        .select(col("query_id"), col("doc_id"), col("score").as("should_score"))
    val banned =
      if (notQs.isEmpty) spark.emptyDataset[(String, Long)].toDF("query_id", "doc_id")
      else matchedDocs(spark, indexDir, notQs)

    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    m.join(broadcast(arity), Seq("query_id"))
      .filter(col("must_matched") === col("n_must"))
      .join(sScores, Seq("query_id", "doc_id"), "left")
      .join(banned, Seq("query_id", "doc_id"), "left_anti")
      .withColumn("score", col("must_score") + coalesce(col("should_score"), lit(0.0)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** significant_terms served from the index (ES JLH): the foreground
    * doc→term incidence comes from the forward-index sidecar
    * ([[IndexBuilder.Config.termVectors]]) — a thin (docId, term) columnar
    * scan broadcast-joined to the match set, the ES shape (fg counts are
    * gathered per shard from stored term vectors / doc values, never by
    * decoding postings) — falling back to a full postings decode only on
    * sidecar-less indexes. Background df from the term dictionary, corpus N
    * from the stats table. The JLH ranking tail is shared code with the
    * relational twin, so the doubles match. Background counts reflect the
    * index's live stats; a deferred-compaction index would shade bg_df high
    * until compaction (same as ES before merge).
    */
  def significantTerms(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], n: Int = 5): DataFrame = {
    import spark.implicits._
    val m = matchedDocs(spark, indexDir, queries)
    val fgN = m.groupBy("query_id").agg(count(lit(1)).as("fg_n"))
    val fg =
      if (graft.index.IndexBuilder.exists(spark, s"$indexDir/termvectors")) {
        // forward index: project ONLY (docId, term); the match set (the
        // per-query fg docs — df-bounded, shard-local in ES) broadcasts, so
        // the sidecar scan joins without a shuffle and postings stay cold
        val termDoc = spark.read.parquet(s"$indexDir/termvectors")
          .select(col("docId").as("doc_id"), col("term"))
        termDoc.join(broadcast(m), Seq("doc_id"))
          .groupBy("query_id", "term").agg(count(lit(1)).as("fg_df"))
      } else {
        val termDoc = spark.read.parquet(s"$indexDir/postings")
          .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
            col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
          .as[TermPostings]
          .flatMap(tp => tp.blocks.iterator.flatMap(b =>
            Blocks.decodeDocIds(b).iterator.map(d => (tp.term, d))))
          .toDF("term", "doc_id")
        m.join(termDoc, Seq("doc_id")).groupBy("query_id", "term")
          .agg(count(lit(1)).as("fg_df"))
      }
    val bg = spark.read.parquet(s"$indexDir/terms")
      .groupBy("term").agg(sum("df").as("bg_df"))
    val bgN = QueryEngine.loadStats(spark, indexDir).n
    SearchOps.rankSignificant(fg, fgN, bg, bgN, n)
  }

  /** `_termvectors` with term_statistics served from the forward-index
    * sidecar: the probed docs' (term, tf) rows read with an In(docId)
    * pushdown (sidecar files are docId-sorted per bucket → row-group
    * min/max pruning), df joined from the term dictionary pruned FIRST to
    * the probed terms — no postings decode, no re-analysis of stored text
    * (the stored-term-vector fast path ES uses when `term_vector` is
    * enabled on the field; SearchOps.termVectors is the re-analyze
    * fallback).
    */
  def termVectors(spark: SparkSession, indexDir: String,
      ids: Seq[Long] = SearchOps.IdProbes): DataFrame = {
    val tv = spark.read.parquet(s"$indexDir/termvectors")
      .filter(col("docId").isin(ids: _*))
      .select(col("docId").as("doc_id"), col("term"), col("tf").cast("long").as("tf"))
    val df = spark.read.parquet(s"$indexDir/terms")
      .join(broadcast(tv.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("term").agg(sum("df").as("df"))
    tv.join(broadcast(df), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"), col("df"))
  }

  /** terms_set query served from the index (ES `terms_set`,
    * `minimum_should_match_script`): docs whose matched-distinct-term count
    * clears the floor — a one-column filter over [[scoredMatches]]'s
    * `matched` accumulator, so the only index work is the term-pruned
    * postings scan already paid for scoring.
    */
  def termsSet(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], minMatch: Int = 2): DataFrame =
    scoredMatches(spark, indexDir, queries)
      .filter(col("matched") >= minMatch)
      .select(col("query_id"), col("doc_id"), col("matched").as("n_matched"))

  /** rank_feature + min_score served from the index: the term-pruned
    * postings scan's exact BM25 ([[scoredMatches]], ordered-fold parity
    * with the relational twin) through the shared saturation/min_score/
    * top-k tail — the feature join touches only matched docs.
    */
  def rankFeature(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], docs: org.apache.spark.sql.DataFrame,
      pivot: Double = 250.0, minScore: Double = 1.0, k: Int = 10): DataFrame =
    AggsExt.rankFeatureTail(
      scoredMatches(spark, indexDir, queries).select("query_id", "doc_id", "score"),
      docs, pivot, minScore, k)

  /** sampler / diversified_sampler aggregations served from the index:
    * term-pruned exact-BM25 matches through the shared sample-then-sub-agg
    * tail; the stored-field join touches only matched docs.
    */
  def samplerAgg(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], docs: org.apache.spark.sql.DataFrame,
      shardSize: Int = 20): DataFrame =
    AggsExt.samplerTail(
      scoredMatches(spark, indexDir, queries).select("query_id", "doc_id", "score"),
      docs, shardSize, None)

  def diversifiedSamplerAgg(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], docs: org.apache.spark.sql.DataFrame,
      shardSize: Int = 20, maxPerValue: Int = 3): DataFrame =
    AggsExt.samplerTail(
      scoredMatches(spark, indexDir, queries).select("query_id", "doc_id", "score"),
      docs, shardSize, Some(maxPerValue))

  /** distance_feature served from the index — shared additive-boost tail
    * over [[scoredMatches]]'s exact BM25.
    */
  def distanceFeature(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], docs: org.apache.spark.sql.DataFrame,
      origin: Long = 300L, pivot: Double = 50.0, k: Int = 10): DataFrame =
    AggsExt.distanceFeatureTail(
      scoredMatches(spark, indexDir, queries).select("query_id", "doc_id", "score"),
      docs, origin, pivot, k)

  /** pinned query served from the index — shared pin-then-organic tail
    * over [[scoredMatches]]'s exact BM25.
    */
  def pinnedTopK(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)],
      pinnedIds: Seq[Long] = AggsExt.PinnedIds, k: Int = 10): DataFrame =
    AggsExt.pinnedTail(
      scoredMatches(spark, indexDir, queries).select("query_id", "doc_id", "score"),
      queries, pinnedIds, k)

  /** Field collapsing served from the index (ES `collapse`): best doc per
    * (query, field value) over [[scoredMatches]], then the global top-k of
    * the representatives.
    */
  def collapseTopK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String, k: Int = 10): DataFrame = {
    val wg = Window.partitionBy(col("query_id"), col(field))
      .orderBy(col("score").desc, col("doc_id").asc)
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    scoredMatches(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(field)), Seq("doc_id"))
      .withColumn("grank", row_number().over(wg))
      .filter(col("grank") === 1)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col(field),
        round(col("score"), 4).as("score"))
  }

  /** Nested aggregation served from the index (ES terms bucket + stats
    * sub-agg): match set from postings, facet + field from doc-values, one
    * uniform doc_id join + one aggregation.
    */
  def nestedAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, facet: String, field: String): DataFrame =
    matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(facet), col(field)), Seq("doc_id"))
      .groupBy("query_id", facet)
      .agg(count(lit(1)).as("n_docs"),
        min(col(field)).as("min_chars"), max(col(field)).as("max_chars"),
        (round(avg(col(field).cast("double")) + lit(1.0e-9), 4) + lit(0.0)).as("avg_chars"))

  /** ES `terms` filter served from the index: the value list maps to an
    * allowed docId set via doc-values, riding the inclusion gate
    * ([[QueryEngine.topKWithin]]) bucket-locally.
    */
  def termsFilterTopK(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, facet: String, values: Seq[String], k: Int = 10): DataFrame =
    QueryEngine.topKWithin(spark, indexDir, queries, k,
      docsMeta.filter(col(facet).isin(values: _*)).select(col("doc_id").as("docId"))).toDF()
      .select(col("queryId").as("query_id"), col("rank"),
        col("docId").as("doc_id"), round(col("score"), 4).as("score"))

  /** ES `boosting` query served from the index: positive BM25 from
    * postings ([[scoredMatches]]), the negative query's demote set from its
    * own term-pruned match traversal ([[matchedDocs]]) — then the shared
    * demote+rerank tail. Both legs read postings only.
    */
  def boostingTopK(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], negative: String = SearchOps.BoostingNegative,
      negBoost: Double = 0.5, k: Int = 10): DataFrame = {
    val neg = matchedDocs(spark, indexDir, Seq(("neg", negative)))
      .select("doc_id").distinct().withColumn("is_neg", lit(1))
    SearchOps.boostingFrom(scoredMatches(spark, indexDir, queries), neg, negBoost, k)
  }

  /** ES `range` aggregation served from the index: match set from postings,
    * bucket edges applied to the doc-values sidecar — shared tail with the
    * relational twin.
    */
  def rangeAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame, field: String = "n_chars",
      edges: Seq[Long] = SearchOps.RangeAggEdges): DataFrame =
    SearchOps.rangeAggFrom(matchedDocs(spark, indexDir, queries), docsMeta, field, edges)

  /** ES `filters` aggregation served from the index: one conditional-sum
    * pass over the match set joined to the doc-values sidecar.
    */
  def filtersAgg(spark: SparkSession, indexDir: String, queries: Seq[(String, String)],
      docsMeta: DataFrame,
      filters: Seq[(String, org.apache.spark.sql.Column)] = SearchOps.NamedFilters): DataFrame =
    SearchOps.filtersAggFrom(matchedDocs(spark, indexDir, queries), docsMeta, filters)

  /** `_count` served from the index: the match-any traversal without
    * scoring — per bucket a docIds-only block decode, tombstone-aware.
    */
  def countMatches(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)]): DataFrame =
    matchedDocs(spark, indexDir, queries).groupBy("query_id").agg(count(lit(1)).as("total"))

  /** `_explain` served from the index: the top-1 doc per query comes from
    * the WAND ranking; its per-term operands (tf, doclen) are decoded ONLY
    * from posting blocks whose [firstDocId, lastDocId] span a target doc —
    * O(query terms × 1 block) decodes, everything else is skipped via the
    * block metadata — df/N/avgdl from the stats sidecars. The expressions
    * are the scorer's own doubles, so each breakdown sums bit-exactly to
    * the hit's score. The hit cursor (≤ queries × 1 rows) is driver-held,
    * like search_after's — that IS the API shape, not a collect-the-data
    * antipattern.
    */
  def explainScore(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val anE = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms = queries.map { case (qid, text) =>
      qid -> anE.tokenize(text).distinct.sorted
    }
    val allTerms = qTerms.flatMap(_._2).distinct
    val stats = QueryEngine.loadStats(spark, indexDir)
    val tstats = QueryEngine.loadTermStats(spark, indexDir, allTerms)
    val top1 = QueryEngine.topK(spark, indexDir, queries, 1).toDF()
      .select(col("queryId").as("query_id"), col("docId").as("doc_id"))
    val targetDocs: Set[Long] = top1.select("doc_id").as[Long].collect().toSet
    val tb = spark.sparkContext.broadcast(targetDocs)

    val rows = spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(allTerms: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]
      .flatMap { tp =>
        tp.blocks.iterator
          .filter(b => tb.value.exists(d => d >= b.firstDocId && d <= b.lastDocId))
          .flatMap { b =>
            val ds = Blocks.decodeDocIds(b)
            val tfs = Blocks.decodeTfs(b)
            val dls = Blocks.decodeDoclens(b)
            ds.indices.iterator.collect {
              case i if tb.value.contains(ds(i)) =>
                (tp.term, ds(i), tfs(i).toLong, dls(i).toLong)
            }
          }
      }.toDF("term", "doc_id", "tf", "doclen")

    val q = qTerms.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val dfm = tstats.map { case (t, s) => (t, s.df) }.toSeq.toDF("term", "df")
    val idf = log(lit(1.0) + (lit(stats.n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val partial = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("doclen") / lit(stats.avgdl)))
    SearchOps.explainSelect(
      rows.join(broadcast(q), Seq("term"))
        .join(broadcast(top1), Seq("query_id", "doc_id"), "left_semi")
        .join(broadcast(dfm), Seq("term"))
        .withColumn("idf", idf)
        .withColumn("addend", idf * partial))
  }

  /** ES `rescore` served from the index: the retrieval window comes from
    * WAND over postings, the match_phrase secondary from the positional
    * sidecar — the two index structures composed the way ES composes query
    * phase + rescore phase. Window semantics identical to the relational
    * twin (outside-window docs can never enter).
    */
  def rescoreTopK(spark: SparkSession, indexDir: String, posDir: String,
      queries: Seq[(String, String)], window: Int = 20, weight: Double = 0.5,
      k: Int = 10): DataFrame = {
    val base = QueryEngine.topK(spark, indexDir, queries, window).toDF()
      .select(col("queryId").as("query_id"), col("docId").as("doc_id"), col("score"))
    val ph = graft.index.Positions.phraseMatch(spark, posDir, queries)
      .withColumnRenamed("phrase_id", "query_id")
    val wr = Window.partitionBy(col("query_id")).orderBy(col("rescored").desc, col("doc_id").asc)
    base.join(ph, Seq("query_id", "doc_id"), "left")
      .withColumn("rescored",
        col("score") + lit(weight) * coalesce(col("n_matches").cast("double"), lit(0.0)))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("rescored"), 4).as("score"))
  }

  /** Fuzzy term expansion served from the term dictionary (the rewrite
    * stage of an ES `fuzzy` query): the dictionary table — (term, df),
    * segments summed on read — replaces any corpus derivation; probes are
    * broadcast so the edit-distance comparison is one dictionary scan.
    */
  def fuzzyExpand(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String)], maxDist: Int = 1): DataFrame = {
    import spark.implicits._
    val dict = spark.read.parquet(s"$indexDir/terms")
      .groupBy("term").agg(sum("df").as("df"))
    val f = probes.toDF("query_id", "qterm")
    dict.join(broadcast(f), levenshtein(col("qterm"), col("term")) <= maxDist)
      .select(col("query_id"), col("qterm"), col("term"),
        levenshtein(col("qterm"), col("term")).cast("bigint").as("dist"), col("df"))
  }

  /** Term suggester (ES `suggest.term`) served from the term dictionary:
    * candidates within edit distance (0, maxDist], ranked (dist asc, df
    * desc, term asc), top-`n` per probe — the shortlist ES's suggester
    * builds per shard from ITS term dictionary. No corpus access at all.
    */
  /** Phrase suggester served from index sidecars: candidate terms + df come
    * from the term dictionary, unigram counts from its `cf` (collection
    * frequency), bigram statistics from the shingle sidecar — the exact
    * analog of ES's requirement that the phrase suggester run on a
    * shingle-indexed field. Zero corpus access; scoring arithmetic shared
    * verbatim with the relational twin ([[SearchOps.phraseSuggestFrom]]).
    */
  def phraseSuggest(spark: SparkSession, indexDir: String, bigramsDir: String,
      probes: Seq[(String, String)], maxDist: Int = 1, perSlot: Int = 3,
      n: Int = 3): DataFrame = {
    val dict = spark.read.parquet(s"$indexDir/terms")
      .groupBy("term").agg(sum("df").as("df"), sum("cf").as("cnt"))
    val tot = dict.agg(sum("cnt").as("t"), count(lit(1)).as("v"))
    val big = spark.read.parquet(s"$bigramsDir/bigrams")
    SearchOps.phraseSuggestFrom(dict, big, tot, probes, maxDist, perSlot, n)
  }

  /** Completion suggester served from the term dictionary: the terms scan
    * carries a literal StartsWith OR-predicate (min/max-pruned on the
    * term-sorted parquet), df summed across segments, ranked (df desc,
    * term asc) per probe. No corpus access — the FST-backed lookup ES runs,
    * re-expressed as a pruned dictionary scan.
    */
  def completionSuggest(spark: SparkSession, indexDir: String,
      prefixes: Seq[(String, String)], n: Int = 3): DataFrame = {
    import spark.implicits._
    val p = prefixes.toDF("prefix_id", "prefix")
    val dict = spark.read.parquet(s"$indexDir/terms")
      .filter(prefixes.map(pr => col("term").startsWith(pr._2)).reduce(_ || _))
      .groupBy("term").agg(sum("df").as("df"))
    val w = Window.partitionBy(col("prefix_id")).orderBy(col("df").desc, col("term").asc)
    dict.join(broadcast(p), col("term").startsWith(col("prefix")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("prefix_id"), col("prefix"), col("rank"), col("term"), col("df"))
  }

  def termSuggest(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String)], maxDist: Int = 2, n: Int = 3): DataFrame = {
    import spark.implicits._
    val dict = spark.read.parquet(s"$indexDir/terms")
      .groupBy("term").agg(sum("df").as("df"))
    val f = probes.toDF("query_id", "qterm")
    val d = levenshtein(col("qterm"), col("term"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("df").desc, col("term").asc)
    dict.join(broadcast(f), d > 0 && d <= maxDist)
      .withColumn("dist", levenshtein(col("qterm"), col("term")).cast("bigint"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
      .select(col("query_id"), col("qterm"), col("rank"), col("term"),
        col("dist"), col("df"))
  }

  /** multi_match best_fields served from per-field inverted indexes —
    * Lucene's actual layout (one index per field, each with its own
    * tf/df/length statistics). Each field's (query, doc) score comes from
    * its index's postings ([[scoredMatches]]); the tie_breaker combination
    * is the shared tail (`SearchOps.combineFields`), so the doubles match
    * the relational twin and the oracle bit-for-bit.
    */
  def multiMatchTopK(spark: SparkSession, textIndexDir: String, srcIndexDir: String,
      queries: Seq[(String, String)] = SearchOps.MultiQueries,
      tieBreaker: Double = 0.3, k: Int = 10): DataFrame = {
    val t = scoredMatches(spark, textIndexDir, queries)
      .select(col("query_id"), col("doc_id"), col("score").as("s_text"))
    val s = scoredMatches(spark, srcIndexDir, queries)
      .select(col("query_id"), col("doc_id"), col("score").as("s_src"))
    SearchOps.combineFields(t, s, tieBreaker, k)
  }

  /** `_validate/query` probes: well-formed, single-term, all-unknown-terms,
    * and symbols-only (analyzes to nothing → invalid).
    */
  val ValidateProbes: Seq[(String, String)] = Seq(
    ("v1", "spark query"), ("v2", "the"),
    ("v3", "missingzzz nosuchterm"), ("v4", "!!! ??"))

  /** `_validate/query` with `rewrite` (ES): analyze each query, report
    * whether it parses to at least one term (`valid`), its analyzed arity,
    * and how many of its terms the index KNOWS (the rewrite explanation's
    * term-exists half — ES reports the rewritten query per shard). Served
    * entirely from the terms dictionary with In(term) pushdown; the corpus
    * is never touched, and a query of only unknown terms stays valid but
    * rewrites to zero clauses, exactly ES's MatchNoDocs rewrite.
    */
  def validateQuery(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String)] = ValidateProbes): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val qTerms = probes.map { case (qid, text) => (qid, an.tokenize(text).distinct) }
    val q = qTerms.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }.toDF("query_id", "term")
    val arity = qTerms.map { case (qid, ts) => (qid, ts.length.toLong, ts.nonEmpty) }
      .toDF("query_id", "n_terms", "valid")
    val allTerms = qTerms.flatMap(_._2).distinct
    val known =
      if (allTerms.isEmpty)
        spark.emptyDataset[(String, Long)].toDF("query_id", "n_known")
      else spark.read.parquet(s"$indexDir/terms")
        .filter(col("term").isin(allTerms: _*))
        .select("term").distinct()
        .join(broadcast(q), Seq("term"))
        .groupBy("query_id").agg(count(lit(1)).as("n_known"))
    arity.join(known, Seq("query_id"), "left")
      .select(col("query_id"), col("valid"), col("n_terms"),
        coalesce(col("n_known"), lit(0L)).as("n_known"))
  }

  /** span_multi (ES: a multi-term query wrapped as a span) served from the
    * index: the prefix expands against the terms DICTIONARY (a
    * StartsWith-pruned scan of the term-sorted table — never the corpus,
    * never the postings), then each expanded term rides the positional
    * sidecar through the ordinary span_near cogroup and per-probe counts
    * sum. Distinct expanded terms occupy disjoint positions, so the sum
    * equals the relational prefix-leg count exactly. Expansion is
    * O(terms matching prefix) driver-side — the same bounded term-cache
    * discipline as the fuzzy/suggest paths.
    */
  def spanMultiMatch(spark: SparkSession, indexDir: String, posDir: String,
      probes: Seq[(String, String, String)] = SearchOps.SpanMultiProbes,
      slop: Int = 3): DataFrame = {
    val prefixes = probes.map(_._2).distinct
    val dict = spark.read.parquet(s"$indexDir/terms")
      .filter(prefixes.map(p => col("term").startsWith(p)).reduce(_ || _))
      .select("term").distinct().collect().map(_.getString(0))
    val pairs = probes.flatMap { case (pid, prefix, b) =>
      dict.filter(_.startsWith(prefix)).map(t => (pid, t, b))
    }
    if (pairs.isEmpty) {
      import spark.implicits._
      return spark.emptyDataset[(String, Long, Long)]
        .toDF("probe_id", "doc_id", "n_matches")
    }
    graft.index.Positions.spanNearMatch(spark, posDir, pairs, slop)
      .groupBy(col("pair_id").as("probe_id"), col("doc_id"))
      .agg(sum("n_matches").as("n_matches"))
  }

  /** Per-(term, doc) term frequencies for the given terms, decoded straight
    * from the postings blocks — a term-pushdown scan (PushedFilters reaches
    * the parquet scan; no corpus access, no full-index decode). The raw
    * material [[combinedFieldsTopK]] blends across fields.
    */
  def termDocTfs(spark: SparkSession, indexDir: String, terms: Seq[String]): DataFrame = {
    import spark.implicits._
    if (terms.isEmpty)
      return spark.emptyDataset[(String, Long, Long)].toDF("term", "doc_id", "tf")
    spark.read.parquet(s"$indexDir/postings")
      .filter(col("term").isin(terms.distinct: _*))
      .select(col("bucket"), col("term"), col("df"), col("cf"), col("maxTf"),
        col("minDl"), col("bytes"), col("minDoc"), col("maxDoc"), col("blocks"))
      .as[TermPostings]
      .flatMap { tp =>
        tp.blocks.iterator.flatMap { b =>
          val ids = Blocks.decodeDocIds(b)
          val tfs = Blocks.decodeTfs(b)
          ids.indices.iterator.map(i => (tp.term, ids(i), tfs(i).toLong))
        }
      }
      .toDF("term", "doc_id", "tf")
  }

  /** combined_fields (ES 8) served from the two per-field inverted indexes:
    * the combined pseudo-field's statistics are RECONSTRUCTED from index
    * data — per-(term, doc) tf is the sum of the fields' decoded postings
    * tfs, per-doc combined length is the sum of the fields' stored doclens
    * (docs sidecars), df counts docs with the term in ANY field (from the
    * same decoded rows), and avgdl comes from the two stats tables' exact
    * totalTokens. Scoring then mirrors the relational twin's expression
    * exactly (same ordered-term fold), so the result is hash-equal to
    * [[SearchOps.combinedFieldsTopK]] and the oracle. Everything is
    * term-pruned: only the query terms' postings decode.
    */
  def combinedFieldsTopK(spark: SparkSession, textIndexDir: String,
      srcIndexDir: String, queries: Seq[(String, String)] = SearchOps.MultiQueries,
      k: Int = 10): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, textIndexDir)
    val q = queries.flatMap { case (qid, text) =>
      an.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    val allTerms = queries.flatMap { case (_, t) => an.tokenize(t) }.distinct

    val tfComb = termDocTfs(spark, textIndexDir, allTerms)
      .union(termDocTfs(spark, srcIndexDir, allTerms))
      .groupBy("term", "doc_id").agg(sum("tf").as("tf"))
    val dfComb = tfComb.groupBy("term").agg(count(lit(1)).as("df"))

    val dlT = spark.read.parquet(s"$textIndexDir/docs")
      .select(col("docId").as("doc_id"), col("doclen").cast("long").as("dl_t"))
    val dlS = spark.read.parquet(s"$srcIndexDir/docs")
      .select(col("docId").as("doc_id"), col("doclen").cast("long").as("dl_s"))
    // full-outer + coalesce: a doc indexed in only one field (empty other
    // field, or per-field doc sets that diverge) still belongs to the
    // combined pseudo-field — the relational twin scores any doc with
    // tokens in EITHER field
    val dl = dlT.join(dlS, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("dl_t"), lit(0L)) + coalesce(col("dl_s"), lit(0L))).as("doclen"))

    val stT = QueryEngine.loadStats(spark, textIndexDir)
    val stS = QueryEngine.loadStats(spark, srcIndexDir)
    // n = docs with tokens in EITHER field (the combined pseudo-field's N),
    // not the text index's N alone — an empty-text doc with source tokens
    // counts in the twin's corpus statistics
    val n = dl.filter(col("doclen") > 0).count()
    val avgdl = (stT.totalTokens + stS.totalTokens).toDouble / n.toDouble

    // identical expression shape to Bm25Sql.termRowsFromTermTable (and the
    // oracle's sum(ORDER BY term) operand) over the combined statistics
    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val partial = col("tf") * lit(2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("doclen") / lit(avgdl)))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    broadcast(q).join(tfComb, Seq("term"))
      .join(broadcast(dfComb), Seq("term"))
      .join(dl, Seq("doc_id"))
      .withColumn("addend", idf * partial)
      .groupBy("query_id", "doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("addend")))),
        lit(0.0), (acc, x) => acc + x.getField("addend")).as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** `_msearch` served from the inverted index: all requests ride ONE
    * block-max WAND pass (topK already batches arbitrary query sets — the
    * scatter amortization _msearch exists for), then each request keeps
    * its own size. Rank- and score-identical to the relational twin by the
    * engine's core WAND ≡ exhaustive contract.
    */
  def msearchTopK(spark: SparkSession, indexDir: String,
      requests: Seq[(String, String, Int)] = SearchOps.MsearchRequests): DataFrame = {
    import spark.implicits._
    val ks = requests.map { case (rid, _, k) => (rid, k) }.toDF("query_id", "k")
    val kMax = requests.map(_._3).max
    QueryEngine.topK(spark, indexDir,
        requests.map { case (rid, q, _) => (rid, q) }, kMax).toDF()
      .select(col("queryId").as("query_id"), col("rank"), col("docId").as("doc_id"),
        col("score"))
      .join(broadcast(ks), Seq("query_id"))
      .filter(col("rank") <= col("k"))
      .select(col("query_id").as("request_id"), col("rank"), col("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** ES `ids` query / document GET served from the index docs table — the
    * reference's Size-1 existence lookup (monstache.go:4019,4114-4116)
    * without Elasticsearch. The docs table is bucket-partitioned and
    * docId-sorted within partitions, so the `In(docId)` predicate prunes to
    * a handful of row groups (PlanCheck asserts the pushdown) — a true
    * point-read at 100 TB, no corpus access.
    */
  def idsLookup(spark: SparkSession, indexDir: String,
      ids: Seq[Long] = SearchOps.IdProbes): DataFrame =
    spark.read.parquet(s"$indexDir/docs")
      .filter(col("docId").isin(ids: _*))
      .select(col("docId").as("doc_id"), col("url"),
        col("doclen").cast("long").as("doclen"), col("version"))

  /** Composite aggregation page-2 served from the index: match set from
    * postings, bucket keys from doc metadata, the shared after_key page
    * tail (`SearchOps.compositePage`).
    */
  def compositeAggPage(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], docsMeta: DataFrame,
      f1: String = "lang", f2: String = "source", size: Int = 5): DataFrame = {
    val buckets = matchedDocs(spark, indexDir, queries)
      .join(docsMeta.select(col("doc_id"), col(f1), col(f2)), Seq("doc_id"))
      .groupBy(col("query_id"), col(f1), col(f2))
      .agg(count(lit(1)).as("n_docs"))
    SearchOps.compositePage(buckets, f1, f2, size)
  }

  /** Hybrid (RRF) retrieval served from the engine's two indexes: lexical
    * ranks from block-max WAND over the inverted index (rank-identical to
    * the exhaustive oracle by the engine's core contract), kNN ranks from
    * the request vectors against the embeddings table, fused by
    * [[SearchOps.rrfFuse]] — ES 8's `retriever: {rrf: ...}` with a lexical
    * and a knn leg. The brute cosine leg is the exactness baseline; a
    * serving deployment swaps in the IVF candidate cut
    * (Similarity.ivfTopK's probed buckets) without touching the fusion.
    */
  def rrfHybrid(spark: SparkSession, indexDir: String, emb: DataFrame,
      queries: Seq[(String, String)], k: Int = 10, rankConstant: Int = 60,
      window: Int = 10): DataFrame = {
    val text = QueryEngine.topK(spark, indexDir, queries, window).toDF()
      .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
        col("rank").as("text_rank"))
    val knn = graft.ops.Similarity.cosineRanks(
      emb, SearchOps.queryVectors(emb, queries), window)
    SearchOps.rrfFuse(text, knn, k, rankConstant)
  }

  /** `_rank_eval` served from the inverted index: the evaluated ranking is
    * the WAND top-k and the judgment set is the conjunctive match set
    * computed from postings (matched-term count == query arity — no corpus
    * scan on either leg). Metrics via [[SearchOps.rankEvalMetrics]], so the
    * index twin is hash-equal to the relational oracle whenever WAND is
    * rank-identical to exhaustive BM25 — the engine's core contract.
    */
  def rankEval(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)], k: Int = 10): DataFrame = {
    import spark.implicits._
    val an = graft.index.IndexBuilder.analyzerOf(spark, indexDir)
    val ranked = QueryEngine.topK(spark, indexDir, queries, k).toDF()
      .select(col("queryId").as("query_id"), col("rank"), col("docId").as("doc_id"))
    val qn = queries.map { case (qid, text) =>
      (qid, an.tokenize(text).distinct.length.toLong)
    }.toDF("query_id", "nq")
    val relevant = scoredMatches(spark, indexDir, queries)
      .join(broadcast(qn), Seq("query_id"))
      .filter(col("matched") === col("nq"))
      .select("query_id", "doc_id")
    SearchOps.rankEvalMetrics(ranked, relevant, queries, k)
  }

  /** `_terms_enum` served from the terms-dictionary sidecar: segments
    * summed on read, prefix + search_after as literal predicates on the
    * term-sorted parquet (min/max-pruned), lexicographic paging via the
    * shared tail ([[SearchOps.termsEnumFrom]]). The FST walk ES runs,
    * re-expressed as a pruned dictionary scan — no corpus, no postings.
    */
  def termsEnum(spark: SparkSession, indexDir: String,
      probes: Seq[(String, String, String, Int)] = SearchOps.TermsEnumProbes): DataFrame = {
    val dict = spark.read.parquet(s"$indexDir/terms")
      .filter(probes.map { case (_, pfx, after, _) =>
        col("term").startsWith(pfx) && col("term") > after
      }.reduce(_ || _))
      .groupBy("term").agg(sum("df").as("df"))
    SearchOps.termsEnumFrom(dict, probes)
  }

  /** `_mget` served from the docs sidecar: In(docId) pushdown prunes to a
    * handful of row groups like [[idsLookup]], and the request list is the
    * broadcast left side so MISSES SURVIVE — `found` false with doclen 0,
    * the mget-vs-ids semantic difference. No corpus access; doclen comes
    * from the sidecar, not a re-tokenize.
    */
  def mget(spark: SparkSession, indexDir: String,
      requests: Seq[(String, Long)] = SearchOps.MgetRequests): DataFrame = {
    import spark.implicits._
    val req = requests.toDF("req_id", "doc_id")
    val hits = spark.read.parquet(s"$indexDir/docs")
      .filter(col("docId").isin(requests.map(_._2): _*))
      .select(col("docId").as("doc_id"), lit(true).as("found"),
        col("doclen").cast("long").as("doclen"))
    req.join(broadcast(hits), Seq("doc_id"), "left_outer")
      .select(col("req_id"), col("doc_id"),
        coalesce(col("found"), lit(false)).as("found"),
        coalesce(col("doclen"), lit(0L)).as("doclen"))
  }

  /** `global` agg served from the index: the match set from postings, the
    * global bucket from the docs sidecar (doclen > 0 mirrors the
    * relational twin's tokenized universe) — one O(1) aggregation row
    * broadcast onto the per-query metrics; the corpus text is never read.
    */
  def globalAgg(spark: SparkSession, indexDir: String,
      queries: Seq[(String, String)]): DataFrame = {
    val dl = spark.read.parquet(s"$indexDir/docs")
      .filter(col("doclen") > 0)
      .select(col("docId").as("doc_id"), col("doclen").cast("long").as("doclen"))
    val matched = matchedDocs(spark, indexDir, queries).join(dl, Seq("doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("n_matched"), sum("doclen").as("s_matched"))
    val global = dl.agg(count(lit(1)).as("n_global"), sum("doclen").as("s_global"))
    matched.crossJoin(broadcast(global))
      .select(col("query_id"), col("n_matched"), col("n_global"),
        (round(col("s_matched").cast("double") / col("n_matched") + lit(1.0e-9), 4) + lit(0.0))
          .as("avg_dl_matched"),
        (round(col("s_global").cast("double") / col("n_global") + lit(1.0e-9), 4) + lit(0.0))
          .as("avg_dl_global"))
  }

  /** Linear (weighted-score) retriever served from the engine's indexes:
    * lexical scores from block-max WAND (bit-identical to exhaustive BM25
    * by the engine's core contract), kNN cosines from the request vectors,
    * min-max normalized and combined by the shared
    * [[SearchOps.linearFuse]] — ES 8.16's `retriever: {linear: ...}` with
    * the minmax normalizer.
    */
  def linearHybrid(spark: SparkSession, indexDir: String, emb: DataFrame,
      queries: Seq[(String, String)], k: Int = 10, wText: Double = 2.0,
      wKnn: Double = 1.0, window: Int = 10): DataFrame = {
    val text = QueryEngine.topK(spark, indexDir, queries, window).toDF()
      .select(col("queryId").as("query_id"), col("docId").as("doc_id"),
        col("rank").as("text_rank"), col("score").as("tscore"))
    val knn = graft.ops.Similarity.cosineScored(
        emb, SearchOps.queryVectors(emb, queries), window)
      .withColumnRenamed("cosine_raw", "vscore")
    SearchOps.linearFuse(text, knn, k, wText, wKnn)
  }
}
