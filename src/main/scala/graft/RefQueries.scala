package graft

/** The reference query set over the harness `documents` corpus — covers
  * head term, rare-ish multi-term, absent term, long query (FIXTURES.md §3).
  */
object RefQueries {
  val set: Seq[(String, String)] = Seq(
    "d1" -> "spark query",
    "d2" -> "the",
    "d3" -> "hash join merge sort",
    "d4" -> "vector column scan slow",
    "d5" -> "customer window batch stream value",
    "d6" -> "missingzzz spark"
  )

  val K = 10

  /** VALUES rows for the DuckDB oracle: (query_id, term), terms distinct
    * per query, mirroring TextPrep.tokenize(q).distinct.
    */
  def sqlValues: String =
    set.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.tokenize(text).distinct.map(t => s"('$qid','$t')")
    }.mkString(", ")
}
