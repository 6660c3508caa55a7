package graft.codec

import graft.model.{Bm25, PostingBlock}
import scala.collection.mutable.ArrayBuffer

/** Posting-block layout: fixed-size blocks of delta+varbyte docIds +
  * varbyte tfs, each carrying `maxPartial` (block-max metadata for WAND,
  * `BASELINE.json` north_star).
  */
object Blocks {

  /** Postings per block. 128 is the standard block size in block-max WAND
    * literature (Ding & Suel, SIGIR'11 — public knowledge).
    */
  val BlockSize = 128

  /** Build compressed blocks from one term's postings within one bucket.
    * `docIds` must be strictly increasing; `tfs`/`doclens` parallel arrays.
    */
  def build(
      docIds: Array[Long],
      tfs: Array[Int],
      doclens: Array[Int],
      avgdl: Double
  ): Seq[PostingBlock] = {
    require(docIds.length == tfs.length && tfs.length == doclens.length)
    val out = new ArrayBuffer[PostingBlock](docIds.length / BlockSize + 1)
    var off = 0
    while (off < docIds.length) {
      val len     = math.min(BlockSize, docIds.length - off)
      val slice   = java.util.Arrays.copyOfRange(docIds, off, off + len)
      val tfSlice = java.util.Arrays.copyOfRange(tfs, off, off + len)
      var maxP    = 0.0
      var i       = 0
      while (i < len) {
        val p = Bm25.partial(tfs(off + i), doclens(off + i), avgdl)
        if (p > maxP) maxP = p
        i += 1
      }
      out += PostingBlock(
        firstDocId = slice(0),
        lastDocId = slice(len - 1),
        count = len,
        maxPartial = maxP,
        docBytes = VarByte.encodeDeltas(slice, slice(0)),
        tfBytes = VarByte.encodeInts(tfSlice),
        dlBytes = VarByte.encodeInts(java.util.Arrays.copyOfRange(doclens, off, off + len))
      )
      off += len
    }
    out.toSeq
  }

  def decodeDocIds(b: PostingBlock): Array[Long] =
    VarByte.decodeDeltas(b.docBytes, b.firstDocId, b.count)

  def decodeTfs(b: PostingBlock): Array[Int] =
    VarByte.decodeInts(b.tfBytes, b.count)

  def decodeDoclens(b: PostingBlock): Array[Int] =
    VarByte.decodeInts(b.dlBytes, b.count)

  def byteSize(b: PostingBlock): Long =
    b.docBytes.length.toLong + b.tfBytes.length.toLong + b.dlBytes.length.toLong
}
