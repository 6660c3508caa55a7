package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Real container-header dimension parsing, anchored on hand-written header
  * bytes straight from the published format specs (PNG RFC 2083 §3 / ISO
  * 15948; JPEG ITU-T T.81 B.2.2; GIF89a spec §18) — independent of the
  * synthHeader fixture generator, so generator and parser can't agree on a
  * shared mistake.
  */
class MediaDimsSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("PNG: signature + IHDR big-endian dims (spec-anchored bytes)") {
    // 8-byte signature, IHDR length 13, 'IHDR', width=0x00000140 (320),
    // height=0x000000F0 (240), bit depth 8, color type 2, 3x0, CRC (dummy)
    val png = hex("89504E470D0A1A0A 0000000D 49484452 00000140 000000F0 08 02 00 00 00 00000000")
    assert(Multimodal.headerDims(png) === Some(("png", 320, 240)))
  }

  test("JPEG: SOF0 after APP0+DQT segments; height precedes width (T.81 B.2.2)") {
    // SOI | APP0 len16 JFIF | DQT len5 (dummy) | SOF0 len11: precision 8,
    // height 0x0010 (16), width 0x0180 (384), 1 component
    val jpg = hex("FFD8" +
      "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
      "FFDB 0005 00 01 02" +
      "FFC0 000B 08 0010 0180 01 01 11 00")
    assert(Multimodal.headerDims(jpg) === Some(("jpeg", 384, 16)))
  }

  test("JPEG: progressive SOF2 and fill bytes are handled; SOS stops the walk") {
    val sof2 = hex("FFD8 FFFF FFC2 000B 08 0100 0200 01 01 11 00 FFDA 0002")
    assert(Multimodal.headerDims(sof2) === Some(("jpeg", 512, 256)))
    // dims after SOS are never read (entropy data could alias a marker)
    val noSof = hex("FFD8 FFDA 0002 FFC0 000B 08 0010 0180 01 01 11 00")
    assert(Multimodal.headerDims(noSof) === None)
  }

  test("GIF: little-endian logical screen descriptor") {
    // GIF89a, width = 0x0140 LE (320), height = 0x00F0 LE (240)
    val gif = hex("474946383961 4001 F000 F7 00 00")
    assert(Multimodal.headerDims(gif) === Some(("gif", 320, 240)))
    val gif87 = hex("474946383761 0200 0300 00 00 00")
    assert(Multimodal.headerDims(gif87) === Some(("gif", 2, 3)))
  }

  test("unknown / truncated payloads return None (content-omit discipline)") {
    assert(Multimodal.headerDims("<html><body>x</body></html>".getBytes("ASCII")) === None)
    assert(Multimodal.headerDims(hex("89504E47")) === None) // truncated PNG
    assert(Multimodal.headerDims(hex("FFD8")) === None)     // bare SOI
    assert(Multimodal.headerDims(Array.emptyByteArray) === None)
  }

  test("synthHeader fixtures round-trip through the parser for all kinds") {
    for (k <- 0 to 2; (w, h) <- Seq((16, 16), (633, 434), (1, 1), (65535, 65535))) {
      val want = Seq("png", "jpeg", "gif")(k)
      assert(Multimodal.headerDims(Multimodal.synthHeader(k, w, h)) === Some((want, w, h)),
        s"kind=$k w=$w h=$h")
    }
  }
}
