package graft

import graft.ops.{Geo, Similarity, TextOps}
import graft.query.{AggsExt, IndexSearch, SearchOps}
import org.apache.spark.sql.functions._

/** Round-5 final DSL batch: combined_fields (statistics blending, not score
  * blending), _msearch / _search/template, knn similarity cutoff,
  * rate / moving_percentiles / random_sampler / variable_width_histogram /
  * frequent_item_sets / categorize_text / geo_distance rings / _field_caps.
  */
class Dsl5Spec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("renderTemplate: substitution, inverted-section default, absent var") {
    assert(SearchOps.renderTemplate("spark {{what}} {{how}}",
      Map("what" -> "query", "how" -> "scan")) == "spark query scan")
    assert(SearchOps.renderTemplate("hash {{op}}{{^op}}join{{/op}} merge",
      Map.empty) == "hash join merge")
    assert(SearchOps.renderTemplate("hash {{op}}{{^op}}join{{/op}} merge",
      Map("op" -> "fuse")) == "hash fuse merge")
    assert(SearchOps.renderTemplate("a {{missing}} b", Map.empty) == "a  b")
  }

  test("combined_fields: index twin == relational twin; differs from best_fields") {
    val docs = TextOps.documents(spark, sf)
    val rel = SearchOps.combinedFieldsTopK(docs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val tIdx = IndexCache.forDocuments(spark, sf)
    val sIdx = IndexCache.forField(spark, sf, "source")
    val idx = IndexSearch.combinedFieldsTopK(spark, tIdx, sIdx)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rel == idx)
    // statistics blending is a DIFFERENT operator from best_fields score
    // blending: on the shared fixture at least one (query, rank) differs
    val best = SearchOps.multiMatchTopK(docs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val comb = rel.map { case (q, r, d, _) => (q, r, d) }
    assert(comb != best)
  }

  test("combined_fields: doc with tokens in ONE field only — twins still agree (n/dl from the combined set)") {
    // doc 0's text emptied: its tokens live only in `source`. The old
    // index twin took n from the text index's stats (which exclude
    // doclen-0 docs) and inner-joined the doclen sidecars — this fixture
    // is exactly the shape the ADVICE flagged.
    val docs = TextOps.documents(spark, sf)
      .withColumn("text", when(col("doc_id") === 0, lit("")).otherwise(col("text")))
    val rel = SearchOps.combinedFieldsTopK(docs)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val n0 = docs.count()
    val bucketSize = math.max(1L, (n0 + 3) / 4)
    def build(field: org.apache.spark.sql.Column, dir: String): String = {
      val assigned = docs.select(
        col("doc_id").cast("long").as("docId"),
        (col("doc_id").cast("long") / bucketSize).cast("int").as("bucket"),
        concat(lit("t://"), col("doc_id")).as("url"),
        lit(0L).as("version"),
        field.cast("string").as("text"))
      graft.index.IndexBuilder.buildFromAssigned(spark, assigned, dir,
        graft.index.IndexBuilder.Config(numBuckets = 4))
      dir
    }
    val tDir = build(col("text"),
      java.nio.file.Files.createTempDirectory("cf-onefield-t").toString)
    val sDir = build(col("source"),
      java.nio.file.Files.createTempDirectory("cf-onefield-s").toString)
    val idx = IndexSearch.combinedFieldsTopK(spark, tDir, sDir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(idx == rel)
    // and doc 0 is actually reachable via its source term (mm4 = "src0"
    // matches source values "src0"): the one-field doc is scored, not
    // silently dropped
    assert(idx.exists { case (q, _, d, _) => q == "mm4" && d == 0L } ==
      rel.exists { case (q, _, d, _) => q == "mm4" && d == 0L })
  }

  test("field_caps: unsupported column types report searchable=false, aggregatable=false") {
    val docs = TextOps.documents(spark, sf)
      .withColumn("weird", array(lit(1.5), lit(2.5))) // array<double>: unmapped
    val rows = SearchOps.fieldCaps(docs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(rows("weird") == ("unsupported", false, false))
    // supported columns keep their capabilities
    assert(rows("text") == ("text", true, false))
    assert(rows("doc_id")._2 && rows("doc_id")._3)
  }

  test("_msearch: each request is the k-prefix of its standalone search") {
    val docs = TextOps.documents(spark, sf)
    val ms = SearchOps.msearch(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    SearchOps.MsearchRequests.foreach { case (rid, q, k) =>
      val solo = graft.query.Bm25Sql.topKDocs(docs, Seq((rid, q)), k)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(ms.filter(_._1 == rid) == solo, s"request $rid")
    }
  }

  test("knn similarity cutoff: a filtered prefix of the exact top-k, all >= tau") {
    val e = Similarity.embeddings(spark, sf)
    val q = e.filter(col("vec_id") < 3)
    val full = Similarity.bruteForceTopK(e, q, k = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val cut = Similarity.thresholdTopK(e, q, k = 10, minSim = 0.15)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(cut.forall(_._4 >= 0.15 - 5e-5)) // rounded cosine vs raw cutoff slack
    val fullSet = full.toSet
    assert(cut.forall(fullSet.contains))
    // exactly the >= tau rows of the unfiltered ranking survive (the
    // fixture keeps every cosine well away from the 0.15 boundary)
    assert(cut.length == full.count(_._4 >= 0.15))
  }

  test("moving_percentiles: window p50 equals an independent exact median") {
    val rows = AggsExt.movingPercentiles(TextOps.documents(spark, sf), RefQueries.set)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byQuery = rows.groupBy(_._1)
    assert(rows.nonEmpty)
    byQuery.foreach { case (_, qs) =>
      val sorted = qs.sortBy(_._2)
      sorted.indices.foreach { i =>
        val win = sorted.slice(math.max(0, i - 2), i + 1).map(_._3.toDouble).sorted
        val idx = 0.5 * (win.length - 1)
        val lo = idx.toInt
        val expect = win(lo) + (idx - lo) * (win(math.min(lo + 1, win.length - 1)) - win(lo))
        assert(math.abs(sorted(i)._4 - expect) < 1e-6)
      }
    }
  }

  test("variable_width_histogram: clusters ordered, equal-frequency within 1") {
    val rows = AggsExt.variableWidthHistogram(TextOps.documents(spark, sf), RefQueries.set)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val s = cs.sortBy(_._2)
      // value ranges do not interleave and counts are balanced
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 <= b._4, "cluster max must not exceed next cluster min")
        case _ =>
      }
      assert(s.map(_._3).max - s.map(_._3).min <= 1)
    }
  }

  test("frequent_item_sets: supports match a brute-force recount, all >= minsup") {
    val ev = Geo.events(spark, sf)
    val got = AggsExt.frequentItemSets(ev).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val baskets = ev.select("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val minSup = math.ceil(baskets.size * 0.2).toLong
    val brute = baskets.toSeq.flatMap(b =>
        b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= minSup)
    assert(got == brute)
    assert(got.values.forall(_ >= minSup))
  }

  test("geo_distance rings: ring counts match a driver-side exact recount") {
    val ev = Geo.events(spark, sf)
    val got = Geo.distanceRings(ev).collect()
      .map(r => ((r.getString(0), r.getInt(1)), r.getLong(2))).toMap
    val pts = ev.select("user_id").collect().map(_.getLong(0)).map { uid =>
      (uid * 2654435761L % 18001L - 9000L, (uid * 40503L + 7L) % 36001L - 18000L)
    }
    val brute = scala.collection.mutable.Map.empty[(String, Int), Long]
    Geo.Centers.foreach { case (id, cla, clo, r) =>
      pts.foreach { case (la, lo) =>
        val d2 = (la - cla) * (la - cla) + (lo - clo) * (lo - clo)
        val half = r / 2
        val ring =
          if (d2 < half * half) 0
          else if (d2 < r * r) 1
          else if (d2 < (2 * r) * (2 * r)) 2
          else -1
        if (ring >= 0) brute((id, ring)) = brute.getOrElse((id, ring), 0L) + 1L
      }
    }
    assert(got == brute.toMap)
    assert(got.nonEmpty)
  }

  test("random_sampler: deterministic subset, corrected estimate consistent") {
    val docs = TextOps.documents(spark, sf)
    val a = AggsExt.randomSampler(docs, RefQueries.set).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    val b = AggsExt.randomSampler(docs, RefQueries.set).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3))).sortBy(_._1)
    assert(a.sameElements(b)) // hash sampling, not RNG: re-runs identical
    a.foreach { case (_, n, est) =>
      assert(math.abs(est - n * 1000.0 / 300) < 5.1e-5) // est is rounded to 4dp
    }
  }

  test("span_multi: sidecar twin == relational; single-expansion == span_near; empty prefix empty") {
    val docs = TextOps.documents(spark, sf)
    val rel = SearchOps.spanMultiCounts(docs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val idx = IndexCache.forDocuments(spark, sf)
    val pos = IndexCache.positionsForDocuments(spark, sf)
    val srv = IndexSearch.spanMultiMatch(spark, idx, pos)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rel == srv)
    // "qu" expands to exactly "query": sm2 must equal a plain span_near pair
    val near = SearchOps.spanNearCounts(docs, Seq(("sm2", "query", "scan")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(rel.filter(_._1 == "sm2") == near)
    // "zzz" expands to nothing
    assert(!rel.exists(_._1 == "sm3"))
  }

  test("reverse_nested: parent counts never exceed child counts, totals reconcile") {
    val rows = graft.ops.Relational.reverseNested(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, children, parents) =>
      assert(parents <= children && parents >= 1)
    }
    val openOrders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "O").count()
    assert(rows.map(_._2).sum == openOrders)
  }

  test("_validate/query: symbols-only invalid; unknown-terms valid but zero rewrite clauses") {
    val idx = IndexCache.forDocuments(spark, sf)
    val m = IndexSearch.validateQuery(spark, idx).collect()
      .map(r => (r.getString(0), (r.getBoolean(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m("v4") == ((false, 0L, 0L)))       // analyzes to nothing
    assert(m("v3") == ((true, 2L, 0L)))        // parses, rewrites to MatchNoDocs
    assert(m("v1")._1 && m("v1")._2 == m("v1")._3) // every term known
  }

  test("inner_hits: each has_child parent carries min(2, n_children) ranked children") {
    val parents = graft.ops.Relational.hasChild(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    val hits = graft.ops.Relational.innerHits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(hits.map(_._1).toSet == parents.keySet)
    hits.groupBy(_._1).foreach { case (ck, hs) =>
      assert(hs.map(_._3).sorted.sameElements(1 to math.min(2, parents(ck).toInt)))
    }
  }

  test("_field_caps: one row per column, text searchable but not aggregatable") {
    val docs = TextOps.documents(spark, sf)
    val rows = SearchOps.fieldCaps(docs).collect()
    assert(rows.length == docs.schema.fields.length)
    val text = rows.find(_.getString(0) == "text").get
    assert(text.getString(1) == "text" && text.getBoolean(2) && !text.getBoolean(3))
    val nDocs = docs.count()
    rows.foreach(r => assert(r.getLong(4) == nDocs)) // no nulls in the harness table
  }
}
