package graft

import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic non-ASCII corpus + query set for the Unicode analysis
  * chain (`TextPrep.Analyzer.Unicode`) — the harness `documents` table with
  * a per-doc non-ASCII suffix selected by `doc_id % 4`, derivable with the
  * SAME expression in Spark and in the DuckDB oracle (so the driver's
  * hash-compare works end-to-end).
  *
  * Dialect pin (see `TextPrep.tokenizeUnicode`): every suffix stays inside
  * the case-mapping intersection of `String.toLowerCase(Locale.ROOT)` and
  * utf8proc (DuckDB's `lower`) — CJK, Cyrillic, Greek (no capital sigma),
  * accented Latin (no Turkish dotted İ), Arabic-Indic digits. All strings
  * are NFC-precomposed.
  *
  * Reference anchor: monstache passes arbitrary UTF-8 page content through
  * to Elasticsearch's analyzer untouched (`/root/reference/monstache.go:46`;
  * encoder passthrough `/root/reference/monstachemap/encoding.go:113-138`) —
  * non-ASCII pages are first-class, so they must be searchable here too.
  */
object UnicodeFixture {

  /** Per-(doc_id % 4) suffixes; deliberately include UPPERCASE non-ASCII so
    * the oracle exercises non-trivial case folding on both sides.
    */
  val Suffixes: Seq[String] = Seq(
    "Café Über Señor naïve",
    "Привет МИР Данные поиска",
    "中文 文档 搜索 引擎 ٣٤٥",
    "Ελληνικά Κείμενο αναζήτηση δεδομένα"
  )

  /** The harness documents with the suffix appended (text column replaced). */
  def docs(spark: SparkSession, sfDir: String): DataFrame =
    TextOps.documents(spark, sfDir).withColumn(
      "text",
      concat(col("text"), lit(" "),
        element_at(array(Suffixes.map(lit): _*), (col("doc_id") % 4).cast("int") + 1)))

  /** The same derivation as a DuckDB CTE over the raw `documents` table. */
  val SqlCte: String = {
    val cases = Suffixes.zipWithIndex
      .map { case (sfx, i) => s"WHEN $i THEN '$sfx'" }.mkString(" ")
    s"""udocs AS (SELECT doc_id, text || ' ' || CASE (doc_id % 4) $cases END AS text FROM documents)"""
  }

  /** DuckDB tokenizer CTE over `udocs` — RE2 `\p{L}\p{N}` classes match
    * Java's (TextPrep.isWordCp); `lower` is utf8proc, pinned compatible on
    * this fixture's character set.
    */
  val SqlTok: String =
    """utok AS (SELECT doc_id, t AS term FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')) AS t FROM udocs) WHERE t <> '')"""

  /** Non-ASCII reference queries: Cyrillic multi-term, CJK, mixed
    * Latin-accent + ASCII head term, Greek single-term, absent + present.
    */
  val Queries: Seq[(String, String)] = Seq(
    "u1" -> "мир данные",
    "u2" -> "文档 搜索",
    "u3" -> "café über spark",
    "u4" -> "κείμενο",
    "u5" -> "naïve missingzzz"
  )

  val K = 10

  /** VALUES rows for the oracle: unicode-tokenized, distinct per query. */
  def sqlValues: String =
    Queries.flatMap { case (qid, text) =>
      graft.textprep.TextPrep.Analyzer.Unicode.tokenize(text).distinct
        .map(t => s"('$qid','$t')")
    }.mkString(", ")
}
