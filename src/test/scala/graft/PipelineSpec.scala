package graft

import graft.ops.{Pipeline, TextOps}
import graft.query.{IndexSearch, SearchOps}
import org.apache.spark.sql.functions._

/** Round-4 additions beyond the DuckDB oracles: multi_match / composite-agg
  * twin equality, and the training-shard pipeline invariants (packing
  * conservation, sampling monotonicity, decontamination containment).
  */
class PipelineSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf)

  test("multi_match: per-field index twin equals the relational twin") {
    val rel = SearchOps.multiMatchTopK(docs).orderBy("query_id", "rank").collect()
    val idx = IndexCache.forDocuments(spark, sf)
    val src = IndexCache.forField(spark, sf, "source")
    val ix = IndexSearch.multiMatchTopK(spark, idx, src)
      .orderBy("query_id", "rank").collect()
    assert(rel.nonEmpty)
    assert(rel.map(_.toSeq).toSeq == ix.map(_.toSeq).toSeq)
    // mm4 is source-field-only: its hits are exactly the src0 docs
    val mm4 = rel.filter(_.getString(0) == "mm4").map(_.getLong(2)).toSet
    val src0 = docs.filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(mm4.nonEmpty && mm4.subsetOf(src0))
  }

  test("composite agg: index twin equals relational; page 2 is strictly after page 1") {
    val rel = SearchOps.compositeAggPage(docs, RefQueries.set)
      .orderBy("query_id", "page_rank").collect()
    val idx = IndexCache.forDocuments(spark, sf)
    val ix = IndexSearch.compositeAggPage(spark, idx, RefQueries.set, docs)
      .orderBy("query_id", "page_rank").collect()
    assert(rel.nonEmpty)
    assert(rel.map(_.toSeq).toSeq == ix.map(_.toSeq).toSeq)
  }

  test("seqPack: offsets are the exact prefix sums in doc_id order, any partitioning") {
    def run(parts: Int) = Pipeline.seqPack(docs, ctx = 512, parts = parts)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val a = run(4)
    assert(a == run(13), "partitioning changed the packing manifest")
    // conservation: each offset = previous offset + previous doclen
    a.sliding(2).foreach {
      case Seq((_, o1, l1, _, _), (_, o2, _, _, _)) => assert(o2 == o1 + l1)
      case _ =>
    }
    // window span arithmetic
    a.foreach { case (_, o, l, ws, we) =>
      assert(ws == o / 512 && we == (o + math.max(l, 1) - 1) / 512)
    }
  }

  test("sourceSample: smallest source fully kept; keep ratio tracks sqrt(n_min/n_s)") {
    val kept = Pipeline.sourceSample(docs)
    val stats = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
      .join(kept.groupBy("source").agg(count(lit(1)).as("n_kept")), Seq("source"), "left")
      .na.fill(0L, Seq("n_kept")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val nMin = stats.map(_._2).min
    stats.foreach { case (_, n, k) =>
      val p = math.sqrt(nMin.toDouble / n.toDouble)
      assert(k <= n)
      // binomial(n, p) stays within ±4.5 sigma of np — deterministic fixture,
      // loose bound (the oracle pins the exact membership)
      val sigma = math.sqrt(n * p * (1 - p))
      assert(math.abs(k - n * p) <= 4.5 * sigma + 1.0, s"n=$n k=$k p=$p")
    }
  }

  test("percolate: matches are exactly the must-all/not-none docs; b5 matches nothing") {
    val got = SearchOps.percolate(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.nonEmpty && !got.exists(_._2 == "b5"))
    // cross-check one query against the token table
    val toks = TextOps.tokens(docs).collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val b1 = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(id => toks.get(id).exists(t => t.contains("spark") && !t.contains("slow")))
      .toSet
    assert(got.filter(_._2 == "b1").map(_._1) == b1)
  }

  test("filtered kNN: every hit satisfies the filter; cosines match the unfiltered scores") {
    import graft.ops.Similarity
    val e = Similarity.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 3)
    val hits = Similarity.filteredBruteTopK(e, q, col("label") === 1, k = 10).collect()
    val allowed = e.filter(col("label") === 1).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty && hits.forall(h => allowed.contains(h.getLong(2))))
    // pre-filter semantics: the scores agree with the full exact ranking
    val full = Similarity.bruteForceTopK(e, q, k = Int.MaxValue - 1)
      .select("query_id", "vec_id", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    hits.foreach(h => assert(full((h.getLong(0), h.getLong(2))) == h.getDouble(3)))
  }

  test("_search request: index twin equals relational; aggs see all matches") {
    val (relHits, relAggs) = graft.query.Search.execute(docs)
    val idx = IndexCache.forDocuments(spark, sf)
    val (ixHits, ixAggs) = graft.query.Search.executeIndex(spark, idx, docs)
    def rows(df: org.apache.spark.sql.DataFrame, keys: String*) =
      df.orderBy(keys.head, keys.tail: _*).collect().map(_.toSeq).toSeq
    assert(rows(relHits, "query_id", "rank").nonEmpty)
    assert(rows(relHits, "query_id", "rank") == rows(ixHits, "query_id", "rank"))
    assert(rows(relAggs, "query_id", "lang") == rows(ixAggs, "query_id", "lang"))
    // the agg totals cover the full filtered match set, not just the page
    val aggTotal = relAggs.agg(org.apache.spark.sql.functions.sum("n_docs"))
      .collect()(0).getLong(0)
    assert(aggTotal >= relHits.count())
    // every hit is inside the range filter and free of the banned term
    val hitIds = relHits.collect().map(_.getLong(2)).toSet
    val okIds = docs.filter(col("n_chars").between(150, 400))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(hitIds.subsetOf(okIds))
  }

  test("unigramSurprisal: hand-computed nll on a tiny corpus, exact association") {
    import spark.implicits._
    val tiny = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextOps.unigramSurprisal(tiny).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // T=5; cnt(a)=2 cnt(b)=2 cnt(c)=1; ordered fold ascending term
    def nl(c: Long) = -(1.0 * math.log(c.toDouble / 5.0))
    val d1 = BigDecimal(((0.0 + 2.0 * -math.log(2.0 / 5.0)) + 1.0 * -math.log(2.0 / 5.0)) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d2 = BigDecimal(((0.0 + 1.0 * -math.log(2.0 / 5.0)) + 1.0 * -math.log(1.0 / 5.0)) / 2.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq((1L, 3L, d1), (2L, 2L, d2)), s"got ${got.toSeq}; nl(1)=${nl(1)}")
  }

  test("decontaminate: flagged docs really share a 5-gram with the benchmark set") {
    val hits = Pipeline.decontaminate(docs).collect()
    val sh = graft.ops.Dedup.shingles(docs, 5)
    val bench = sh.filter(col("doc_id") % 101 === 0).select("shingle").distinct()
    val truth = sh.filter(col("doc_id") % 101 =!= 0).join(bench, Seq("shingle"))
      .groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.map(r => r.getLong(0) -> r.getLong(1)).toMap == truth)
    // benchmark docs are never self-flagged
    assert(hits.forall(_.getLong(0) % 101 != 0))
  }
}
