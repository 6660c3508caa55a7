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

  /** Chosen bit width for `gaps` — the 90th percentile of per-value bit
    * needs, clamped to [1, 32]. Counting-sort order statistic (widths are
    * in [1, 64]) — identical to the historical `widths.sorted` pick.
    */
  private def chooseB(widths: Array[Int], n: Int): Int = {
    val hist = new Array[Int](65)
    var i = 0
    while (i < n) { hist(widths(i)) += 1; i += 1 }
    val target = math.min(n - 1, (n * 9) / 10)
    var acc = 0
    var w = 1
    var b0 = 64
    var done = false
    while (!done && w <= 64) {
      acc += hist(w)
      if (acc > target) { b0 = w; done = true }
      w += 1
    }
    math.max(1, math.min(32, b0))
  }

  private def widthsOf(gaps: Array[Long]): Array[Int] = {
    val n = gaps.length
    val widths = new Array[Int](n)
    var i = 0
    while (i < n) {
      widths(i) = 64 - java.lang.Long.numberOfLeadingZeros(gaps(i) | 1L)
      i += 1
    }
    widths
  }

  /** Exact byte length [[encode]] would produce — lets the block builder
    * pick the smaller of varbyte/PFor WITHOUT encoding both (the old dual
    * encode was ~2x the gap-codec work of the SPIMI inversion loop).
    */
  def encodedLen(gaps: Array[Long]): Int = {
    val n = gaps.length
    require(n > 0)
    val widths = widthsOf(gaps)
    val b = chooseB(widths, n)
    var size = 1 + (n * b + 7) / 8
    var nExc = 0L
    var prev = -1
    var i = 0
    while (i < n) {
      if (widths(i) > b) {
        size += VarByte.lenLong((i - prev - 1).toLong) + VarByte.lenLong(gaps(i) >>> b)
        prev = i
        nExc += 1
      }
      i += 1
    }
    size + VarByte.lenLong(nExc)
  }

  def encode(gaps: Array[Long]): Array[Byte] = {
    val n = gaps.length
    require(n > 0)
    val widths = widthsOf(gaps)
    val b = chooseB(widths, n)
    var nExc = 0
    var i = 0
    while (i < n) { if (widths(i) > b) nExc += 1; i += 1 }
    // exact size: header + packed low bits + exception stream
    var size = 1 + VarByte.lenLong(nExc.toLong) + (n * b + 7) / 8
    var prev = -1
    i = 0
    while (i < n) {
      if (widths(i) > b) {
        size += VarByte.lenLong((i - prev - 1).toLong) + VarByte.lenLong(gaps(i) >>> b)
        prev = i
      }
      i += 1
    }
    val out = new Array[Byte](size)
    var pos = 0
    out(pos) = b.toByte; pos += 1
    pos = VarByte.writeLong(nExc.toLong, out, pos)
    // pack low b bits
    var bitBuf = 0L
    var bitCnt = 0
    val mask = if (b == 64) -1L else (1L << b) - 1
    i = 0
    while (i < n) {
      bitBuf |= (gaps(i) & mask) << bitCnt
      bitCnt += b
      while (bitCnt >= 8) {
        out(pos) = (bitBuf & 0xff).toByte
        pos += 1
        bitBuf >>>= 8
        bitCnt -= 8
      }
      i += 1
    }
    if (bitCnt > 0) { out(pos) = (bitBuf & 0xff).toByte; pos += 1 }
    // exceptions: ascending positions as deltas + the high bits
    prev = -1
    i = 0
    while (i < n) {
      if (widths(i) > b) {
        pos = VarByte.writeLong((i - prev - 1).toLong, out, pos)
        pos = VarByte.writeLong(gaps(i) >>> b, out, pos)
        prev = i
      }
      i += 1
    }
    out
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
