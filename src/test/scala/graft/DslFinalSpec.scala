package graft

import graft.ops.{Relational, Similarity, TextOps}
import graft.query.{Bm25Sql, IndexSearch, SearchOps}
import org.apache.spark.sql.functions._

/** The final-batch DSL operators: span_containing/span_within (twins equal,
  * aliasing and absence degeneracies), _terms_enum (paging contract), _mget
  * (miss semantics), has_child/has_parent (bounds), and the linear
  * retriever (twins equal, analytic min-max recompute).
  */
class DslFinalSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf).cache()
  private lazy val idx = IndexCache.forDocuments(spark, sf)
  private lazy val posDir = IndexCache.positionsForDocuments(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toSeq).toSeq

  test("span_containing / span_within: index twins == relational; degeneracies") {
    for (within <- Seq(false, true)) {
      val rel = rows(SearchOps.spanContainCounts(docs, within).orderBy("probe_id", "doc_id"))
      val srv = rows(graft.index.Positions
        .spanContainMatch(spark, posDir, SearchOps.SpanContainProbes, within)
        .orderBy("probe_id", "doc_id"))
      assert(rel.nonEmpty && rel == srv, s"within=$within twins diverge")
      // c3: little is absent -> no rows under either semantics
      assert(!rel.exists(_.head == "c3"))
    }
    // c4 aliasing pin (little == big_b): every big span contains its own
    // endpoint, so containing == the span_near pair count for (table, scan)
    val contain = SearchOps.spanContainCounts(docs, within = false)
      .filter(col("probe_id") === "c4").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val near = SearchOps.spanNearCounts(docs, Seq(("c4", "table", "scan")), slop = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(contain == near && contain.nonEmpty)
  }

  test("span_within never exceeds the little term's tf") {
    val within = SearchOps.spanContainCounts(docs, within = true)
      .filter(col("probe_id") === "c1").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    val tf = TextOps.tokens(docs).filter(col("term") === "query")
      .groupBy("doc_id").agg(count(lit(1)).as("tf")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(within.nonEmpty)
    within.foreach { case (d, n) => assert(n <= tf(d), s"doc $d: $n > tf ${tf(d)}") }
  }

  test("terms_enum: index twin == relational; prefix/after/size contract") {
    val rel = SearchOps.termsEnum(docs).orderBy("probe_id", "rank")
    val srv = IndexSearch.termsEnum(spark, idx).orderBy("probe_id", "rank")
    val r = rows(rel)
    assert(r.nonEmpty && r == rows(srv))
    val byProbe = rel.collect().groupBy(_.getString(0))
    // e2 pages past "sl": everything startswith "s", > "sl", <= 8 terms, lex order
    val e2 = byProbe("e2").sortBy(_.getInt(1)).map(_.getString(2)).toSeq
    assert(e2.length <= 8 && e2.forall(t => t.startsWith("s") && t > "sl"))
    assert(e2 == e2.sorted)
    // e3 prefix matches nothing; e4 includes the prefix itself as a term
    assert(!byProbe.contains("e3"))
    assert(byProbe("e4").exists(_.getString(2) == "the"))
    // sizes respected
    SearchOps.TermsEnumProbes.foreach { case (pid, _, _, sz) =>
      assert(byProbe.getOrElse(pid, Array.empty).length <= sz)
    }
  }

  test("mget: index twin == relational; misses survive with found=false") {
    val rel = SearchOps.mget(docs).orderBy("req_id")
    val srv = IndexSearch.mget(spark, idx).orderBy("req_id")
    val r = rows(rel)
    assert(r == rows(srv))
    val byReq = rel.collect().map(x => x.getString(0) -> x).toMap
    assert(byReq.size == SearchOps.MgetRequests.size) // every request answered
    assert(!byReq("r4").getBoolean(2) && byReq("r4").getLong(3) == 0L)
    assert(!byReq("r5").getBoolean(2) && byReq("r5").getLong(3) == 0L)
    assert(byReq("r1").getBoolean(2) && byReq("r1").getLong(3) > 0L)
  }

  test("has_child bounds and score_mode=sum; has_parent is a pure semi-join") {
    val hc = Relational.hasChild(spark, sf).collect()
    assert(hc.nonEmpty)
    hc.foreach { r =>
      assert(r.getLong(2) >= 2 && r.getLong(2) <= 5)
      assert(r.getDouble(3) > 0.0)
    }
    val hp = Relational.hasParent(spark, sf)
    val parents = TextOps.documents(spark, sf).sparkSession.read
      .parquet(s"$sf/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING" && col("c_acctbal") > 1000)
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val hpr = hp.collect()
    assert(hpr.nonEmpty && hpr.forall(r => parents(r.getLong(1))))
  }

  test("linear retriever: index twin == relational; analytic minmax recompute") {
    val emb = Similarity.embeddings(spark, sf)
    val relDf = SearchOps.linearHybrid(docs, emb, RefQueries.set).orderBy("query_id", "rank")
    val rel = rows(relDf)
    val srv = rows(IndexSearch.linearHybrid(spark, idx, emb, RefQueries.set)
      .orderBy("query_id", "rank"))
    assert(rel.nonEmpty && rel == srv)

    // recompute the fused score from the raw legs in plain Scala
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("score").desc, col("doc_id").asc)
    val text = Bm25Sql.scoredDocs(docs, RefQueries.set)
      .withColumn("r", row_number().over(w)).filter(col("r") <= 10)
      .select("query_id", "doc_id", "score").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val knn = Similarity.cosineScored(emb, SearchOps.queryVectors(emb, RefQueries.set), 10)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(3)).toMap
    def normed(leg: Map[(String, Long), Double]): Map[(String, Long), Double] = {
      leg.groupBy(_._1._1).flatMap { case (_, m) =>
        val (mn, mx) = (m.values.min, m.values.max)
        m.map { case (k, v) => k -> (if (mx == mn) 1.0 else (v - mn) / (mx - mn)) }
      }
    }
    val (nt, nk) = (normed(text), normed(knn))
    def r6(x: Double) = math.floor((x + 1.0e-9) * 1e6 + 0.5) / 1e6
    relDf.collect().foreach { row =>
      val key = (row.getString(0), row.getLong(2))
      val expect = 2.0 * nt.getOrElse(key, 0.0) + 1.0 * nk.getOrElse(key, 0.0)
      assert(math.abs(row.getDouble(3) - r6(expect)) < 1e-9, s"fused score at $key")
      // leg ranks carried through: 0 iff outside that leg's window
      assert((row.getInt(4) > 0) == nt.contains(key))
      assert((row.getInt(5) > 0) == nk.contains(key))
    }
  }
}
