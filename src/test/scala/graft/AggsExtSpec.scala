package graft

import graft.ops.{Geo, TextOps}
import graft.query.{AggsExt, IndexSearch}

/** Semantics checks for the extended aggregation DSL (AggsExt), the geo
  * surface, and the terms_set twins — invariant-based (internal
  * consistency + twin equality), complementing the driver's exact DuckDB
  * hash oracles on the same paths.
  */
class AggsExtSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()
  private lazy val ev = Geo.events(spark, sf).cache()

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("extended_stats: variance non-negative, std = sqrt(var), avg within [min, max]") {
    val r = rows(AggsExt.extendedStats(docs, RefQueries.set).orderBy("query_id"))
    assert(r.nonEmpty)
    r.foreach { row =>
      val (mn, mx) = (row(2).asInstanceOf[Long], row(3).asInstanceOf[Long])
      val avg = row(6).asInstanceOf[Double]
      val varP = row(7).asInstanceOf[Double]
      val std = row(8).asInstanceOf[Double]
      assert(varP >= 0.0 && mn <= avg && avg <= mx)
      assert(math.abs(std - math.sqrt(varP)) < 2e-4) // both independently rounded to 4dp
    }
  }

  test("weighted_avg: bounded by the plain min/max of the field") {
    val wa = rows(AggsExt.weightedAvg(docs, RefQueries.set))
    val bounds = docs.agg(
      org.apache.spark.sql.functions.min("n_chars"),
      org.apache.spark.sql.functions.max("n_chars")).head
    wa.foreach { row =>
      val v = row(1).asInstanceOf[Double]
      assert(v >= bounds.getLong(0) && v <= bounds.getLong(1))
    }
  }

  test("value_count + missing partition the match set") {
    rows(AggsExt.valueCountMissing(docs, RefQueries.set)).foreach { r =>
      assert(r(1).asInstanceOf[Long] ==
        r(2).asInstanceOf[Long] + r(3).asInstanceOf[Long])
    }
  }

  test("multi_terms: ranks contiguous from 1, counts non-increasing per query") {
    val byQ = rows(AggsExt.multiTerms(docs, RefQueries.set))
      .groupBy(_(0)).values
    byQ.foreach { g =>
      val sorted = g.sortBy(_(1).asInstanceOf[Int])
      assert(sorted.map(_(1)) == (1 to sorted.size).toList)
      val counts = sorted.map(_(4).asInstanceOf[Long])
      assert(counts == counts.sorted.reverse)
    }
  }

  test("rare_terms: nonempty on the dense harness vocab; counts within the cutoff") {
    val m = AggsExt.rareTerms(docs, RefQueries.set)
    assert(m.count() > 0)
  }

  test("adjacency_matrix: intersection counts never exceed their diagonal counts") {
    val r = rows(AggsExt.adjacencyMatrix(docs, RefQueries.set))
    assert(r.nonEmpty)
    val diag = r.filter(!_(1).asInstanceOf[String].contains("&"))
      .map(x => (x(0), x(1)) -> x(2).asInstanceOf[Long]).toMap
    r.filter(_(1).asInstanceOf[String].contains("&")).foreach { x =>
      val Array(a, b) = x(1).asInstanceOf[String].split("&")
      val n = x(2).asInstanceOf[Long]
      assert(n <= diag((x(0), a)) && n <= diag((x(0), b)))
    }
  }

  test("pipeline aggs: cum_docs is a prefix sum; deriv null only on the first bucket") {
    val byQ = rows(AggsExt.pipelineAggs(docs, RefQueries.set).orderBy("query_id", "day"))
      .groupBy(_(0)).values
    byQ.foreach { g =>
      var running = 0L
      g.zipWithIndex.foreach { case (row, i) =>
        running += row(2).asInstanceOf[Long]
        assert(row(3).asInstanceOf[Long] == running)
        if (i == 0) assert(row(4) == null) else assert(row(4) != null)
      }
    }
  }

  test("top_metrics: per query, exactly the k max-n_chars docs, rank order") {
    val r = rows(AggsExt.topMetrics(docs, RefQueries.set, k = 2))
    r.groupBy(_(0)).values.foreach { g =>
      assert(g.size <= 2)
      val byRank = g.sortBy(_(1).asInstanceOf[Int]).map(_(3).asInstanceOf[Long])
      assert(byRank == byRank.sorted.reverse)
    }
  }

  test("string_stats: entropy positive and ≤ log2(alphabet); avg within [min,max]") {
    rows(AggsExt.stringStats(docs, RefQueries.set)).foreach { r =>
      val (mn, mx) = (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long])
      val avg = r(5).asInstanceOf[Double]
      val ent = r(6).asInstanceOf[Double]
      assert(mn <= avg && avg <= mx)
      assert(ent > 0.0 && ent <= math.log(128.0) / math.log(2.0))
    }
  }

  test("terms_set: index-served twin == relational twin; every row clears minMatch") {
    val rel = rows(AggsExt.termsSet(docs, RefQueries.set).orderBy("query_id", "doc_id"))
    val idx = IndexCache.forDocuments(spark, sf)
    val srv = rows(IndexSearch.termsSet(spark, idx, RefQueries.set).orderBy("query_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    rel.foreach(r => assert(r(2).asInstanceOf[Long] >= 2))
    // single-term queries can never clear minMatch=2
    assert(!rel.exists(_(0) == "d2"))
  }

  test("matrix_stats: correlation in [-1,1] and strongly positive for n_chars × doclen") {
    val r = rows(AggsExt.matrixStats(docs, RefQueries.set))
    assert(r.nonEmpty)
    r.foreach { row =>
      val corr = row(7).asInstanceOf[Double]
      assert(corr >= -1.0 && corr <= 1.0)
      assert(corr > 0.5) // token count tracks char count on this corpus
      assert(row(4).asInstanceOf[Double] >= 0.0 && row(5).asInstanceOf[Double] >= 0.0)
    }
  }

  test("boxplot: five-number summary ordered; MAD non-negative and ≤ range/2 + tol") {
    rows(AggsExt.boxplot(docs, RefQueries.set)).foreach { r =>
      val (mn, mx) = (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long])
      val (q1, q2, q3) = (r(4).asInstanceOf[Double], r(5).asInstanceOf[Double], r(6).asInstanceOf[Double])
      val mad = r(7).asInstanceOf[Double]
      assert(mn <= q1 && q1 <= q2 && q2 <= q3 && q3 <= mx)
      assert(mad >= 0.0 && mad <= (mx - mn) / 2.0 + 1.0)
    }
  }

  test("bucket_stats: sibling pipeline values consistent with the bucket set") {
    rows(AggsExt.bucketStats(docs, RefQueries.set)).foreach { r =>
      val (nb, sum) = (r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      val (maxD, minD) = (r(4).asInstanceOf[Long], r(6).asInstanceOf[Long])
      val avg = r(7).asInstanceOf[Double]
      assert(minD <= avg && avg <= maxD)
      assert(minD * nb <= sum && sum <= maxD * nb)
    }
  }

  test("serial_diff + normalize: norm01 within [0,1]; sdiff7 null exactly for the first 7 buckets") {
    val byQ = rows(AggsExt.serialDiffNormalize(docs, RefQueries.set).orderBy("query_id", "day"))
      .groupBy(_(0)).values
    byQ.foreach { g =>
      g.zipWithIndex.foreach { case (row, i) =>
        if (i < 7) assert(row(3) == null) else assert(row(3) != null)
        val nrm = row(4)
        if (nrm != null) {
          val v = nrm.asInstanceOf[Double]
          assert(v >= 0.0 && v <= 1.0)
        }
      }
    }
  }

  test("rank_feature: index twin == relational; every hit clears min_score; saturation shrinks scores") {
    val rel = AggsExt.rankFeatureTopK(docs, RefQueries.set).orderBy("query_id", "rank")
    val idxDir = IndexCache.forDocuments(spark, sf)
    val srv = graft.query.IndexSearch.rankFeature(spark, idxDir, RefQueries.set, docs)
      .orderBy("query_id", "rank")
    val (r1, r2) = (rows(rel), rows(srv))
    assert(r1.nonEmpty && r1 == r2)
    r1.foreach(r => assert(r(3).asInstanceOf[Double] >= 1.0))
  }

  test("intervals: sidecar twin == relational; widening max_gaps never loses matches") {
    import graft.query.SearchOps
    val rel = rows(SearchOps.intervalsCounts(docs).orderBy("rule_id", "doc_id"))
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val srv = rows(graft.index.Positions.intervalsMatch(spark, pos, SearchOps.IntervalRules)
      .orderBy("rule_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    // absent-term rule matches nothing
    assert(!rel.exists(_(0) == "i4"))
    // monotonicity in the gap budget
    val tight = SearchOps.intervalsCounts(docs, maxGaps = 0).count()
    val wide = SearchOps.intervalsCounts(docs, maxGaps = 10).count()
    assert(tight <= rel.size && rel.size <= wide)
  }

  test("sampler twins equal; sample bounded by shard_size; diversification changes the sample") {
    val idxDir = IndexCache.forDocuments(spark, sf)
    val rel = rows(AggsExt.samplerAgg(docs, RefQueries.set).orderBy("query_id", "lang"))
    val srv = rows(graft.query.IndexSearch.samplerAgg(spark, idxDir, RefQueries.set, docs)
      .orderBy("query_id", "lang"))
    assert(rel.nonEmpty && rel == srv)
    rel.groupBy(_(0)).values.foreach(g => assert(g.map(_(2).asInstanceOf[Long]).sum <= 20))
    val div = rows(AggsExt.diversifiedSamplerAgg(docs, RefQueries.set, maxPerValue = 1)
      .orderBy("query_id", "lang"))
    assert(div != rel) // a per-source cap of 1 must reshape the sample on this corpus
  }

  test("distance_feature twins equal; boost bounded by pivot contract (≤1 added)") {
    val idxDir = IndexCache.forDocuments(spark, sf)
    val rel = rows(AggsExt.distanceFeatureTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(graft.query.IndexSearch.distanceFeature(spark, idxDir, RefQueries.set, docs)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    val plain = rows(graft.query.Bm25Sql.topKDocs(docs, RefQueries.set, k = 10))
      .map(r => (r(0), r(2)) -> r(3).asInstanceOf[Double]).toMap
    rel.foreach { r =>
      plain.get((r(0), r(2))).foreach { base =>
        val boosted = r(3).asInstanceOf[Double]
        assert(boosted >= base - 1e-4 && boosted <= base + 1.0 + 1e-4)
      }
    }
  }

  test("pinned: twins equal; pinned ids lead in order; organic excludes them; k total ranks") {
    val idxDir = IndexCache.forDocuments(spark, sf)
    val rel = rows(AggsExt.pinnedTopK(docs, RefQueries.set).orderBy("query_id", "rank"))
    val srv = rows(graft.query.IndexSearch.pinnedTopK(spark, idxDir, RefQueries.set)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)
    rel.groupBy(_(0)).values.foreach { g =>
      val sorted = g.sortBy(_(1).asInstanceOf[Int])
      assert(sorted.size <= 10)
      assert(sorted.take(3).map(_(2)) == AggsExt.PinnedIds)
      assert(sorted.take(3).forall(_(3) == true))
      assert(sorted.drop(3).forall(r => r(3) == false && !AggsExt.PinnedIds.contains(r(2))))
    }
  }

  test("span_first: sidecar twin == relational; first_pos within each probe window") {
    import graft.query.SearchOps
    val rel = rows(SearchOps.spanFirstCounts(docs).orderBy("probe_id", "doc_id"))
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val srv = rows(graft.index.Positions.spanFirstMatch(spark, pos, SearchOps.SpanFirstProbes)
      .orderBy("probe_id", "doc_id"))
    assert(rel.nonEmpty && rel == srv)
    val windows = SearchOps.SpanFirstProbes.map(p => p._1 -> p._3).toMap
    rel.foreach { r =>
      val fp = r(2).asInstanceOf[Long]
      assert(fp >= 1 && fp <= windows(r(0).asInstanceOf[String]))
    }
    assert(!rel.exists(_(0) == "f4")) // absent term matches nothing
  }

  test("auto_date_histogram: chosen interval's bucket count fits the target") {
    val r = rows(AggsExt.autoDateHistogram(docs, RefQueries.set, target = 10))
    assert(r.nonEmpty)
    r.groupBy(_(0)).values.foreach { g =>
      assert(g.map(_(1)).distinct.size == 1) // one interval per query
      assert(g.size <= 10) // the point of the operator
    }
    // a generous target must select the finest interval
    val fine = rows(AggsExt.autoDateHistogram(docs, RefQueries.set, target = 100))
    assert(fine.forall(_(1) == "1d"))
  }

  test("geo_centroid: centroids inside the coordinate domain, counts total the corpus") {
    val c = rows(Geo.geoCentroid(ev))
    assert(c.map(_(1).asInstanceOf[Long]).sum == ev.count())
    c.foreach { r =>
      val (la, lo) = (r(2).asInstanceOf[Double], r(3).asInstanceOf[Double])
      assert(la >= -9000 && la <= 9000 && lo >= -18000 && lo <= 18000)
    }
  }

  test("geo: bbox ⊆ corpus; distance counts per center; tiles within the 2^z grid") {
    val total = ev.count()
    val bbox = rows(Geo.boundingBox(ev))
    assert(bbox.map(_(1).asInstanceOf[Long]).sum <= total && bbox.nonEmpty)
    val dist = rows(Geo.geoDistance(ev))
    dist.foreach(r => assert(r(1).asInstanceOf[Long] <= total))
    val tiles = rows(Geo.geotileGrid(ev, zoom = 4, n = 10))
    assert(tiles.nonEmpty)
    tiles.foreach { t =>
      val (x, y) = (t(1).asInstanceOf[Long], t(2).asInstanceOf[Long])
      assert(x >= 0 && x < 16 && y >= 0 && y < 16)
    }
  }

  test("geo_bounds: lo ≤ hi inside the domain, counts total the corpus") {
    val b = rows(Geo.geoBounds(ev))
    assert(b.map(_(1).asInstanceOf[Long]).sum == ev.count())
    b.foreach { r =>
      val Seq(latLo, latHi, lonLo, lonHi) = r.slice(2, 6).map(_.asInstanceOf[Long])
      assert(latLo <= latHi && lonLo <= lonHi)
      assert(latLo >= -9000 && latHi <= 9000 && lonLo >= -18000 && lonHi <= 18000)
    }
  }

  /** Independent (query_id → matched-doc count) recomputation, bypassing
    * SearchOps entirely: tokens × query terms, distinct docs.
    */
  private def matchedCounts: Map[String, Long] = {
    import spark.implicits._
    val q = RefQueries.set.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => (qid, t))
    }.toDF("query_id", "term")
    TextOps.tokens(docs).select("doc_id", "term").distinct()
      .join(q, Seq("term")).select("query_id", "doc_id").distinct()
      .groupBy("query_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("date_range: the early/mid/late partition totals the match set; jan ⊆ early+mid") {
    val m = matchedCounts
    val byQ = rows(AggsExt.dateRangeAgg(docs, RefQueries.set)).groupBy(_(0).asInstanceOf[String])
    byQ.foreach { case (qid, g) =>
      val n = g.map(r => r(1).asInstanceOf[String] -> r(2).asInstanceOf[Long]).toMap
      assert(n.getOrElse("early", 0L) + n.getOrElse("mid", 0L) + n.getOrElse("late", 0L) == m(qid))
      assert(n.getOrElse("jan", 0L) <= n.getOrElse("early", 0L) + n.getOrElse("mid", 0L))
    }
  }

  test("percentile_ranks: within [0,100] and monotone in the probe value") {
    val byQ = rows(AggsExt.percentileRanks(docs, RefQueries.set)).groupBy(_(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { g =>
      val ranked = g.sortBy(_(1).asInstanceOf[Long]).map(_(2).asInstanceOf[Double])
      assert(ranked.forall(p => p >= 0.0 && p <= 100.0))
      assert(ranked == ranked.sorted)
    }
  }

  test("bucket_script: avg within field bounds, shares total 100%, p50 constant per query") {
    val bounds = docs.agg(
      org.apache.spark.sql.functions.min("n_chars"),
      org.apache.spark.sql.functions.max("n_chars")).head
    val byQ = rows(AggsExt.bucketScript(docs, RefQueries.set)).groupBy(_(0))
    byQ.values.foreach { g =>
      g.foreach { r =>
        val avg = r(4).asInstanceOf[Double]
        assert(avg >= bounds.getLong(0) && avg <= bounds.getLong(1))
      }
      assert(math.abs(g.map(_(5).asInstanceOf[Double]).sum - 100.0) < 0.01)
      assert(g.map(_(6)).distinct.size == 1) // percentiles_bucket: one p50 per query
    }
  }

  test("t_test: defined exactly when both sides have ≥ 2 docs; sides total the match set") {
    val m = matchedCounts
    rows(AggsExt.tTest(docs, RefQueries.set)).foreach { r =>
      val (qid, nA, nB) = (r(0).asInstanceOf[String], r(1).asInstanceOf[Long], r(2).asInstanceOf[Long])
      assert(nA + nB == m(qid))
      if (nA >= 2 && nB >= 2) assert(r(3) != null) else assert(r(3) == null)
    }
  }

  test("significant_text: ≡ significant_terms on a dup-free corpus; dedup caps a mirrored page") {
    import spark.implicits._
    import org.apache.spark.sql.functions.length
    // the harness corpus has no byte-identical texts → the twins must agree exactly
    val st = rows(graft.query.SearchOps.significantText(docs, RefQueries.set)
      .orderBy("query_id", "rank"))
    val sterms = rows(graft.query.SearchOps.significantTerms(docs, RefQueries.set)
      .orderBy("query_id", "rank"))
    assert(st == sterms)
    // mirror one matching page 50×: sig_text's fg counts must NOT inflate
    val base = Seq((1L, "spark query engine", "en", "s1"), (2L, "spark shuffle notes", "en", "s1"),
      (3L, "plain control text", "en", "s2"), (4L, "query planner guide", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
    val mirrored = base.union(
      spark.range(100, 150).selectExpr("id AS doc_id", "'spark query engine' AS text",
        "'en' AS lang", "'s1' AS source"))
    val fgOnce = graft.query.SearchOps.significantText(
      mirrored.withColumn("n_chars", length($"text")), Seq("p1" -> "spark"))
      .filter($"term" === "engine").collect()
    assert(fgOnce.forall(_.getAs[Long]("fg_df") == 1L)) // 51 copies count once
  }
}
