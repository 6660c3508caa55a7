package graft

import graft.codec.{Blocks, PFor, VarByte}
import org.scalatest.funsuite.AnyFunSuite

class PForSpec extends AnyFunSuite {

  test("pfor round-trip: 300 random gap distributions") {
    val rnd = new scala.util.Random(13)
    (0 until 300).foreach { trial =>
      val n = 1 + rnd.nextInt(200)
      val gaps = Array.fill(n) {
        rnd.nextInt(4) match {
          case 0 => rnd.nextInt(2).toLong            // dense (head term)
          case 1 => rnd.nextInt(100).toLong          // moderate
          case 2 => rnd.nextInt(1 << 20).toLong      // sparse
          case _ => math.abs(rnd.nextLong()) % (1L << 40) // outlier
        }
      }
      val enc = PFor.encode(gaps)
      assert(PFor.decode(enc, n).toSeq === gaps.toSeq, s"trial=$trial")
    }
  }

  test("pfor beats varbyte on dense head-term gaps") {
    val gaps = Array.fill(128)(1L) // gap=1: term in every doc
    val pf = PFor.encode(gaps)
    val docIds = gaps.scanLeft(100L)(_ + _).tail
    val vb = VarByte.encodeDeltas(docIds, docIds.head - 1)
    assert(pf.length < vb.length, s"pfor=${pf.length} vb=${vb.length}")
    assert(pf.length <= 128 / 8 + 8, "≈1 bit/posting expected")
  }

  test("block codec auto-selection round-trips both paths") {
    // dense run → PFor tag; sparse run → varbyte may win
    val dense = (1000L until 1128L).toArray
    val rnd = new scala.util.Random(5)
    val sparse = Array.iterate(0L, 128)(x => x + 1000000L + rnd.nextInt(1 << 20))
    Seq(dense, sparse).foreach { ids =>
      val blocks = Blocks.build(ids, ids.map(_ => 1), ids.map(_ => 10))
      assert(blocks.flatMap(Blocks.decodeDocIds).toSeq === ids.toSeq)
    }
    val denseBlocks = Blocks.build(dense, dense.map(_ => 1), dense.map(_ => 10))
    assert(denseBlocks.head.docBytes(0) === 1, "dense gaps should pick PFor")
  }
}
