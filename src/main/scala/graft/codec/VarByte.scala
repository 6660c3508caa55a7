package graft.codec

import java.io.ByteArrayOutputStream

/** Variable-byte (VByte) codec for posting compression.
  *
  * Classic 7-bits-per-byte continuation encoding (Manning/Raghavan/Schütze,
  * IIR §5.3 — public knowledge). Used for delta-encoded docId gaps and term
  * frequencies inside posting blocks. Pure Scala, property-tested
  * (round-trip ∀ sorted lists) per SURVEY.md §5.
  */
object VarByte {

  def encodeLong(v: Long, out: ByteArrayOutputStream): Unit = {
    require(v >= 0, s"varbyte requires non-negative, got $v")
    var x = v
    while (x >= 0x80L) {
      out.write(((x & 0x7fL) | 0x80L).toInt)
      x >>>= 7
    }
    out.write(x.toInt)
  }

  /** Encoded length of one non-negative value: ceil(bits/7) bytes. */
  @inline def lenLong(v: Long): Int =
    (70 - java.lang.Long.numberOfLeadingZeros(v | 1L)) / 7

  /** Write one value at `pos`, return the new position. Same bytes as
    * [[encodeLong]]; direct array fill (the hot encode path — BAOS's
    * synchronized per-byte writes measured as a real cost in the SPIMI
    * codec loop).
    */
  @inline def writeLong(v: Long, out: Array[Byte], pos0: Int): Int = {
    var x   = v
    var pos = pos0
    while (x >= 0x80L) {
      out(pos) = ((x & 0x7fL) | 0x80L).toByte
      pos += 1
      x >>>= 7
    }
    out(pos) = x.toByte
    pos + 1
  }

  /** Exact byte length [[encodeDeltas]] would produce. */
  def deltasLen(sorted: Array[Long], base: Long): Int = {
    var size = 0
    var prev = base
    var i    = 0
    while (i < sorted.length) {
      size += lenLong(sorted(i) - prev)
      prev = sorted(i)
      i += 1
    }
    size
  }

  /** Encode gaps of a strictly-increasing docId sequence (first value encoded
    * as delta from `base`). Byte-identical to the historical BAOS path.
    */
  def encodeDeltas(sorted: Array[Long], base: Long): Array[Byte] = {
    val out  = new Array[Byte](deltasLen(sorted, base))
    var pos  = 0
    var prev = base
    var i    = 0
    while (i < sorted.length) {
      pos = writeLong(sorted(i) - prev, out, pos)
      prev = sorted(i)
      i += 1
    }
    out
  }

  def encodeInts(vals: Array[Int]): Array[Byte] = {
    var size = 0
    var i    = 0
    while (i < vals.length) { size += lenLong(vals(i).toLong); i += 1 }
    val out = new Array[Byte](size)
    var pos = 0
    i = 0
    while (i < vals.length) { pos = writeLong(vals(i).toLong, out, pos); i += 1 }
    out
  }

  def decodeDeltas(bytes: Array[Byte], base: Long, count: Int): Array[Long] = {
    val out  = new Array[Long](count)
    var prev = base
    var pos  = 0
    var i    = 0
    while (i < count) {
      var x     = 0L
      var shift = 0
      var b     = 0
      while ({ b = bytes(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
        x |= (b & 0x7fL) << shift
        shift += 7
      }
      x |= b.toLong << shift
      prev += x
      out(i) = prev
      i += 1
    }
    out
  }

  def decodeInts(bytes: Array[Byte], count: Int): Array[Int] = {
    val out = new Array[Int](count)
    var pos = 0
    var i   = 0
    while (i < count) {
      var x     = 0L
      var shift = 0
      var b     = 0
      while ({ b = bytes(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
        x |= (b & 0x7fL) << shift
        shift += 7
      }
      x |= b.toLong << shift
      out(i) = x.toInt
      i += 1
    }
    out
  }

  /** Streaming cursor over a delta-encoded block — WAND advances through
    * blocks without materializing full arrays.
    */
  final class DeltaCursor(bytes: Array[Byte], base: Long, val count: Int) {
    private var pos     = 0
    private var idx     = 0
    private var current = base

    def hasNext: Boolean = idx < count

    def next(): Long = {
      var x     = 0L
      var shift = 0
      var b     = 0
      while ({ b = bytes(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) {
        x |= (b & 0x7fL) << shift
        shift += 7
      }
      x |= b.toLong << shift
      current += x
      idx += 1
      current
    }
  }
}
