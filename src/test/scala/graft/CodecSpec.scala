package graft

import graft.codec.{Blocks, VarByte}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests via seeded exhaustive loops (the offline cache has
  * no scalatest↔scalacheck bridge; determinism is the point anyway).
  */
class CodecSpec extends AnyFunSuite {

  test("varbyte long round-trip, known boundary values") {
    val vals = Array(0L, 1L, 127L, 128L, 129L, 16383L, 16384L, Int.MaxValue.toLong, Long.MaxValue)
    val out = new java.io.ByteArrayOutputStream()
    vals.foreach(VarByte.encodeLong(_, out))
    val bytes = out.toByteArray
    var pos = 0
    vals.foreach { v =>
      var x = 0L; var shift = 0; var b = 0
      while ({ b = bytes(pos) & 0xff; pos += 1; (b & 0x80) != 0 }) { x |= (b & 0x7fL) << shift; shift += 7 }
      x |= b.toLong << shift
      assert(x === v)
    }
  }

  test("delta round-trip property: 200 random sorted lists") {
    val rnd = new scala.util.Random(42)
    (0 until 200).foreach { trial =>
      val n = 1 + rnd.nextInt(500)
      val arr = Array.fill(n)(rnd.nextLong(1L << 40)).map(math.abs).distinct.sorted
      val enc = VarByte.encodeDeltas(arr, arr.head)
      val dec = VarByte.decodeDeltas(enc, arr.head, arr.length)
      assert(dec.toSeq === arr.toSeq, s"trial=$trial")
    }
  }

  test("delta round-trip with non-zero external base") {
    val arr = Array(100L, 101L, 250L, 100000L)
    val enc = VarByte.encodeDeltas(arr, 50L)
    assert(VarByte.decodeDeltas(enc, 50L, 4).toSeq === arr.toSeq)
  }

  test("int round-trip property: 200 random lists") {
    val rnd = new scala.util.Random(7)
    (0 until 200).foreach { trial =>
      val l = Array.fill(1 + rnd.nextInt(300))(rnd.nextInt(Int.MaxValue))
      val enc = VarByte.encodeInts(l)
      assert(VarByte.decodeInts(enc, l.length).toSeq === l.toSeq, s"trial=$trial")
    }
  }

  test("DeltaCursor streams the same sequence as bulk decode") {
    val rnd = new scala.util.Random(3)
    val arr = Array.fill(1000)(rnd.nextLong(1L << 35)).map(math.abs).distinct.sorted
    val enc = VarByte.encodeDeltas(arr, 0L)
    val cur = new VarByte.DeltaCursor(enc, 0L, arr.length)
    val got = Iterator.continually(if (cur.hasNext) Some(cur.next()) else None)
      .takeWhile(_.isDefined).flatten.toArray
    assert(got.toSeq === arr.toSeq)
  }

  test("block build/decode round-trip + derived block-max is a true upper bound under ANY avgdl") {
    val rnd = new scala.util.Random(7)
    val docIds = (0 until 1000).map(_ => math.abs(rnd.nextLong()) % (1L << 30)).distinct.sorted.toArray
    val tfs = docIds.map(_ => 1 + rnd.nextInt(50))
    val dls = docIds.map(_ => 8 + rnd.nextInt(500))
    val blocks = Blocks.build(docIds, tfs, dls)
    assert(blocks.map(_.count).sum === docIds.length)
    assert(blocks.forall(_.count <= Blocks.BlockSize))
    assert(blocks.flatMap(Blocks.decodeDocIds).toSeq === docIds.toSeq)
    assert(blocks.flatMap(Blocks.decodeTfs).toSeq === tfs.toSeq)
    assert(blocks.flatMap(Blocks.decodeDoclens).toSeq === dls.toSeq)
    // the (maxTf, minDl) bound must hold under any corpus avgdl — exactly
    // the property that keeps WAND exact after streaming appends shift stats
    Seq(20.0, 180.0, 400.0).foreach { avgdl =>
      blocks.foreach { b =>
        val bound = graft.model.Bm25.partial(b.maxTf, b.minDl, avgdl)
        val t = Blocks.decodeTfs(b); val d = Blocks.decodeDoclens(b)
        t.indices.foreach { i =>
          assert(graft.model.Bm25.partial(t(i), d(i), avgdl) <= bound + 1e-12)
        }
      }
    }
    // delta compression beats raw 8-byte longs
    assert(blocks.map(_.docBytes.length).sum < docIds.length * 8)
  }

  test("block boundaries: firstDocId/lastDocId/count are consistent") {
    val docIds = (0L until 300L).toArray
    val blocks = Blocks.build(docIds, docIds.map(_ => 1), docIds.map(_ => 10))
    assert(blocks.size === 3) // 128 + 128 + 44
    assert(blocks.head.firstDocId === 0L && blocks.head.lastDocId === 127L)
    assert(blocks.last.count === 44)
    blocks.foreach { b =>
      val d = Blocks.decodeDocIds(b)
      assert(d.head === b.firstDocId && d.last === b.lastDocId && d.length === b.count)
    }
  }
}
