package graft.codec

import graft.model.PostingBlock
import scala.collection.mutable.ArrayBuffer

/** Posting-block layout: fixed-size blocks of delta+varbyte docIds +
  * varbyte tfs, each carrying (maxTf, minDl) — avgdl-independent block-max
  * metadata for WAND (`BASELINE.json` north_star). The score bound is
  * derived at query time with the live avgdl, so streaming appends that
  * shift corpus stats can never stale the stored bounds.
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
      doclens: Array[Int]
  ): Seq[PostingBlock] = {
    require(docIds.length == tfs.length && tfs.length == doclens.length)
    val out = new ArrayBuffer[PostingBlock](docIds.length / BlockSize + 1)
    var off = 0
    while (off < docIds.length) {
      val len     = math.min(BlockSize, docIds.length - off)
      val slice   = java.util.Arrays.copyOfRange(docIds, off, off + len)
      val tfSlice = java.util.Arrays.copyOfRange(tfs, off, off + len)
      var maxTf   = 0
      var minDl   = Int.MaxValue
      var i       = 0
      while (i < len) {
        if (tfs(off + i) > maxTf) maxTf = tfs(off + i)
        if (doclens(off + i) < minDl) minDl = doclens(off + i)
        i += 1
      }
      out += PostingBlock(
        firstDocId = slice(0),
        lastDocId = slice(len - 1),
        count = len,
        maxTf = maxTf,
        minDl = minDl,
        docBytes = encodeGaps(slice),
        tfBytes = VarByte.encodeInts(tfSlice),
        dlBytes = VarByte.encodeInts(java.util.Arrays.copyOfRange(doclens, off, off + len))
      )
      off += len
    }
    out.toSeq
  }

  /** docId gaps: tagged payload — whichever of varbyte / PForDelta is
    * smaller for this block (tag 0 = varbyte, 1 = PFor). Head terms' dense
    * gaps compress to ~1-2 bits/posting under PFor.
    */
  private def encodeGaps(sorted: Array[Long]): Array[Byte] = {
    val gaps = new Array[Long](sorted.length)
    var prev = sorted(0)
    gaps(0) = 0L
    var i = 1
    while (i < sorted.length) { gaps(i) = sorted(i) - prev; prev = sorted(i); i += 1 }
    // size both codecs WITHOUT encoding (exact lengths), then encode only
    // the winner — same `pf < vb` pick, same bytes, half the encode work
    val vbLen = VarByte.deltasLen(sorted, sorted(0))
    val pfLen = PFor.encodedLen(gaps)
    val (tag, payload) =
      if (pfLen < vbLen) (1, PFor.encode(gaps)) else (0, VarByte.encodeDeltas(sorted, sorted(0)))
    val outArr = new Array[Byte](payload.length + 1)
    outArr(0) = tag.toByte
    System.arraycopy(payload, 0, outArr, 1, payload.length)
    outArr
  }

  def decodeDocIds(b: PostingBlock): Array[Long] = {
    val payload = java.util.Arrays.copyOfRange(b.docBytes, 1, b.docBytes.length)
    (b.docBytes(0): Int) match {
      case 0 => VarByte.decodeDeltas(payload, b.firstDocId, b.count)
      case 1 =>
        val gaps = PFor.decode(payload, b.count)
        val out = new Array[Long](b.count)
        var acc = b.firstDocId
        var i = 0
        while (i < b.count) { acc += gaps(i); out(i) = acc; i += 1 }
        out
      case t => throw new IllegalStateException(s"unknown doc codec tag $t")
    }
  }

  def decodeTfs(b: PostingBlock): Array[Int] =
    VarByte.decodeInts(b.tfBytes, b.count)

  def decodeDoclens(b: PostingBlock): Array[Int] =
    VarByte.decodeInts(b.dlBytes, b.count)

  def byteSize(b: PostingBlock): Long =
    b.docBytes.length.toLong + b.tfBytes.length.toLong + b.dlBytes.length.toLong
}
