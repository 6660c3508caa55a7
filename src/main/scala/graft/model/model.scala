package graft.model

import java.sql.Timestamp

/** Core typed records of the engine.
  *
  * The canonical input row (`BASELINE.json` `input_hint`): one Common-Crawl
  * style web page. Reference analog: the schemaless `gtm.Op` document
  * (reference `monstache.go:1009`); here the schema is fixed so a case class
  * + `Encoder` is the idiomatic Spark surface (SURVEY.md §1.4).
  */
final case class PageDoc(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** A document admitted to the index: dense deterministic docId (dense rank
  * over xxhash64(url), cf. FIXTURES.md §1), its bucket (docId-range shard),
  * and token count. Reference analog: the per-doc metadata monstache attaches
  * before bulk-indexing (`monstache.go:3160-3293`).
  */
final case class IndexedDoc(
    docId: Long,
    bucket: Int,
    url: String,
    doclen: Int,
    version: Long
)

/** One (term, doc) posting prior to compression. */
final case class Posting(bucket: Int, term: String, docId: Long, tf: Int, doclen: Int)

/** A compressed block of postings for one term within one bucket.
  *
  * docBytes: delta+varbyte-encoded docIds (delta from `firstDocId`).
  * tfBytes: varbyte-encoded term frequencies.
  * dlBytes: varbyte-encoded doclens (so scoring is self-contained — the
  *   query path never joins a doclen table).
  * maxTf/minDl: block-max metadata stored avgdl-INDEPENDENTLY. The WAND
  *   upper bound is derived at query time as
  *   `idf * Bm25.partial(maxTf, minDl, currentAvgdl)` — `partial` is
  *   monotone increasing in tf and decreasing in doclen, so the bound is
  *   valid for every posting in the block under ANY corpus avgdl. This is
  *   what keeps bounds correct when streaming appends / compaction shift
  *   avgdl after blocks were written (a stored max-partial would go stale).
  */
final case class PostingBlock(
    firstDocId: Long,
    lastDocId: Long,
    count: Int,
    maxTf: Int,
    minDl: Int,
    docBytes: Array[Byte],
    tfBytes: Array[Byte],
    dlBytes: Array[Byte]
)

/** One row of the postings table: all blocks for (bucket, term). Buckets are
  * docId-range-disjoint, so a term's global posting list is the concatenation
  * of its rows in bucket order — this bucketing IS the salted-key skew
  * handling for head terms (SURVEY.md §7.4.2): no single task ever holds a
  * head term's full posting list.
  */
final case class TermPostings(
    bucket: Int,
    term: String,
    df: Long,
    cf: Long,
    maxTf: Int,
    minDl: Int,
    bytes: Long,
    minDoc: Long,
    maxDoc: Long,
    blocks: Seq[PostingBlock]
)

/** Global per-term statistics (term dictionary). maxTf/minDl carry the
  * avgdl-independent score-bound inputs (see PostingBlock).
  */
final case class TermStats(term: String, df: Long, cf: Long, maxTf: Int, minDl: Int)

/** Global corpus statistics, versioned by snapshot so queries pin a
  * consistent view (SURVEY.md §7.4.5).
  */
final case class CorpusStats(n: Long, avgdl: Double, totalTokens: Long, snapshotId: Long)

/** Per-partition lineage row (`BASELINE.json` north_star): committed only
  * after the partition's data is visible, mirroring the reference's
  * flush-then-save-timestamp ordering (`monstache.go:4939-4940`).
  */
final case class LineageRow(
    partitionId: Int,
    docIdMin: Long,
    docIdMax: Long,
    postingBytes: Long,
    termCount: Long,
    snapshotId: Long,
    ts: Timestamp
)

/** Query result row: rank-identical contract vs the exhaustive oracle. */
final case class ScoredDoc(queryId: String, rank: Int, docId: Long, score: Double)

object Bm25 {
  val K1 = 1.2
  val B  = 0.75

  /** idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (FIXTURES.md §3). */
  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  /** The per-(term,doc) partial, before the idf factor. Literal constants
    * (2.2, 1.2, 0.25, 0.75) and parenthesization are frozen to match the
    * Catalyst and DuckDB oracle expressions bit-for-bit (SURVEY.md §7.4.1).
    */
  def partial(tf: Int, doclen: Int, avgdl: Double): Double =
    tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * doclen / avgdl))

  def score(tf: Int, doclen: Int, avgdl: Double, n: Long, df: Long): Double =
    idf(n, df) * partial(tf, doclen, avgdl)
}
