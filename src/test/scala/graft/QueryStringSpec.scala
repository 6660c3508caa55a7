package graft

import graft.ops.TextOps
import graft.query.QueryString

/** The query_string mini-language: parser unit behavior (the half the DuckDB
  * oracle cannot see — the oracle is generated FROM the parse) plus twin
  * equality of the relational and index+positions compilations.
  */
class QueryStringSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = TextOps.documents(spark, sf)
  private lazy val idx = IndexCache.forDocuments(spark, sf)
  private lazy val pos = IndexCache.positionsForDocuments(spark, sf)

  test("parse: clause prefixes, quoting, analyzer round-trip") {
    val p = QueryString.parse("+Spark, query -SLOW \"Hash JOIN\" +fast")
    assert(p.must == Seq("spark", "fast"))
    assert(p.should == Seq("query"))
    assert(p.not == Seq("slow"))
    assert(p.phrases == Seq("hash join"))
    assert(p.kind == "M")
  }

  test("parse: a prefixed token that analyzes to several terms spreads them") {
    val p = QueryString.parse("+hash-join -a.b")
    assert(p.must == Seq("hash", "join"))
    assert(p.not == Seq("a", "b"))
  }

  test("parse: kinds — phrase-anchored and pure-OR; empties dropped") {
    assert(QueryString.parse("\"table hash\" customer").kind == "P")
    assert(QueryString.parse("spark merge").kind == "S")
    val lenient = QueryString.parse("\"\" + - spark")
    assert(lenient.phrases.isEmpty && lenient.must.isEmpty && lenient.should == Seq("spark"))
  }

  test("parse: duplicate clause terms collapse (ES analyzes to a term set)") {
    val p = QueryString.parse("+spark +spark spark query query")
    assert(p.must == Seq("spark") && p.should == Seq("spark", "query"))
  }

  test("index+positions compilation equals the relational full-scan twin") {
    val rel = QueryString.topK(docs).orderBy("query_id", "rank").collect()
    val ix = QueryString.topKIndex(spark, idx, pos).orderBy("query_id", "rank").collect()
    assert(rel.nonEmpty)
    assert(rel.map(_.toSeq).toSeq == ix.map(_.toSeq).toSeq)
  }

  test("semantics spot-checks on the harness corpus") {
    val rows = QueryString.topK(docs).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val byQ = rows.groupBy(_._1)
    // k5 (+spark +missingzzz) is unsatisfiable
    assert(!byQ.contains("k5"))
    // k4 (spark missingzzz, OR) has hits despite the absent term
    assert(byQ("k4").nonEmpty)
    // k2 is phrase-gated: every hit doc really contains "table hash"
    val phraseDocs = graft.query.SearchOps
      .phraseCounts(docs, Seq("x" -> "table hash"))
      .collect().map(_.getLong(1)).toSet
    assert(byQ("k2").nonEmpty && byQ("k2").forall(h => phraseDocs.contains(h._3)))
    // k1 bans 'slow': no hit doc contains it
    val slowDocs = TextOps.tokens(docs)
      .filter(org.apache.spark.sql.functions.col("term") === "slow")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(byQ("k1").nonEmpty && byQ("k1").forall(h => !slowDocs.contains(h._3)))
  }

  test("simple_query_string: parse groups, prefix marker, | separator") {
    val (cs, phs) = QueryString.simpleClauses(Seq("z" -> "+Hash merg* | -slow \"table HASH\""))
    assert(cs.map(c => (c._3, c._4, c._5)).toSet ==
      Set(("must", "term", "hash"), ("or", "prefix", "merg"), ("not", "term", "slow")))
    assert(phs.map(p => (p._3, p._4)) == Seq(("or", "table hash")))
    // clause ids are positional and unique
    assert((cs.map(_._2) ++ phs.map(_._2)).distinct.size == cs.size + phs.size)
  }

  test("simple_query_string: index twin == relational; bool verdict semantics") {
    import org.apache.spark.sql.functions.col
    val rel = QueryString.simpleCount(docs).orderBy("query_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val srv = QueryString.simpleCountIndex(spark, idx, pos).orderBy("query_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(rel.nonEmpty && rel == srv)
    val m = rel.toMap
    assert(m("p5") == 0L) // dead prefix expands to nothing
    // p2 (+hash -slow): equals docs(hash) minus docs(slow) — or-clauses optional
    val dt = TextOps.tokens(docs).select("doc_id", "term").distinct()
    val hash = dt.filter(col("term") === "hash").select("doc_id").collect().map(_.getLong(0)).toSet
    val slow = dt.filter(col("term") === "slow").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(m("p2") == (hash -- slow).size.toLong)
    // p4 (miss* +the): must dominates — equals docs containing 'the'
    val the = dt.filter(col("term") === "the").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(m("p4") == the.size.toLong)
  }

  test("match_bool_prefix: index twin == relational; OR semantics vs phrase_prefix") {
    import graft.query.{IndexSearch, SearchOps}
    val rel = SearchOps.matchBoolPrefix(docs).orderBy("probe_id", "doc_id")
      .collect().map(_.toSeq).toSeq
    val srv = IndexSearch.matchBoolPrefix(spark, idx, SearchOps.PhrasePrefixes)
      .orderBy("probe_id", "doc_id").collect().map(_.toSeq).toSeq
    assert(rel.nonEmpty && rel == srv)
    // x4 ("table zz"): dead prefix but live term — OR still matches;
    // the PHRASE-prefix operator on the same probe returns nothing
    assert(rel.exists(_.head == "x4"))
    assert(SearchOps.phrasePrefixCounts(docs, Seq("x4" -> "table zz")).count() == 0L)
  }
}
