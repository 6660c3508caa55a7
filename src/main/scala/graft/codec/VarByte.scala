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

  /** Encode gaps of a strictly-increasing docId sequence (first value encoded
    * as delta from `base`).
    */
  def encodeDeltas(sorted: Array[Long], base: Long): Array[Byte] = {
    val out  = new ByteArrayOutputStream(sorted.length * 2)
    var prev = base
    var i    = 0
    while (i < sorted.length) {
      encodeLong(sorted(i) - prev, out)
      prev = sorted(i)
      i += 1
    }
    out.toByteArray
  }

  def encodeInts(vals: Array[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream(vals.length * 2)
    var i   = 0
    while (i < vals.length) { encodeLong(vals(i).toLong, out); i += 1 }
    out.toByteArray
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
