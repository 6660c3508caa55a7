package graft.codec

import java.io.ByteArrayOutputStream

/** Patched frame-of-reference (PForDelta-style) gap codec
  * (Zukowski et al., ICDE'06; NewPFD per Yan/Ding/Suel WWW'09 — public
  * knowledge). Gaps are packed at a fixed bit width b chosen to cover ~90%
  * of values; larger values are stored as exceptions (position + high bits)
  * appended varbyte. Denser than varbyte for tight gap distributions
  * (head terms: gap≈1 → b≈1 bit/posting vs varbyte's 8).
  *
  * Layout: [b:1][nExc varbyte][packed low bits: ceil(n*b/8)]
  *         [exceptions: (posDelta varbyte, highBits varbyte)*]
  */
object PFor {

  def encode(gaps: Array[Long]): Array[Byte] = {
    val n = gaps.length
    require(n > 0)
    // candidate widths: bits needed per value
    val widths = gaps.map(g => 64 - java.lang.Long.numberOfLeadingZeros(g | 1L))
    val sortedW = widths.sorted
    // choose b at the 90th percentile (clamped to [1, 32])
    val b0 = sortedW(math.min(n - 1, (n * 9) / 10))
    val b = math.max(1, math.min(32, b0))
    val out = new ByteArrayOutputStream(n * 2)
    out.write(b)
    val excIdx = gaps.indices.filter(i => widths(i) > b)
    VarByte.encodeLong(excIdx.length.toLong, out)
    // pack low b bits
    var bitBuf = 0L
    var bitCnt = 0
    var i = 0
    val mask = if (b == 64) -1L else (1L << b) - 1
    while (i < n) {
      bitBuf |= (gaps(i) & mask) << bitCnt
      bitCnt += b
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8
        bitCnt -= 8
      }
      i += 1
    }
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    // exceptions: ascending positions as deltas + the high bits
    var prev = -1
    excIdx.foreach { idx =>
      VarByte.encodeLong((idx - prev - 1).toLong, out)
      VarByte.encodeLong(gaps(idx) >>> b, out)
      prev = idx
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte], n: Int): Array[Long] = {
    var pos = 0
    val b = bytes(pos) & 0xff; pos += 1
    // nExc varbyte
    var nExc = 0L
    var shift = 0
    var by = 0
    while ({ by = bytes(pos) & 0xff; pos += 1; (by & 0x80) != 0 }) { nExc |= (by & 0x7fL) << shift; shift += 7 }
    nExc |= by.toLong << shift
    val out = new Array[Long](n)
    // unpack low bits
    var bitBuf = 0L
    var bitCnt = 0
    val mask = if (b == 64) -1L else (1L << b) - 1
    var i = 0
    while (i < n) {
      while (bitCnt < b) {
        bitBuf |= (bytes(pos) & 0xffL) << bitCnt
        pos += 1
        bitCnt += 8
      }
      out(i) = bitBuf & mask
      bitBuf >>>= b
      bitCnt -= b
      i += 1
    }
    // patch exceptions
    var prev = -1
    var e = 0L
    while (e < nExc) {
      var d = 0L; shift = 0
      while ({ by = bytes(pos) & 0xff; pos += 1; (by & 0x80) != 0 }) { d |= (by & 0x7fL) << shift; shift += 7 }
      d |= by.toLong << shift
      val idx = prev + 1 + d.toInt
      var hi = 0L; shift = 0
      while ({ by = bytes(pos) & 0xff; pos += 1; (by & 0x80) != 0 }) { hi |= (by & 0x7fL) << shift; shift += 7 }
      hi |= by.toLong << shift
      out(idx) |= hi << b
      prev = idx
      e += 1
    }
    out
  }
}
