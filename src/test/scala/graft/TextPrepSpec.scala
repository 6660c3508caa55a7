package graft

import graft.textprep.TextPrep
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class TextPrepSpec extends AnyFunSuite {

  test("extract: strips tags, scripts, styles; collapses whitespace") {
    val html = """<html><head><title>T</title><style>p{color:red}</style>
      |<script>var x = "<b>not text</b>";</script></head>
      |<body><p>Hello   <b>world</b>!</p>
      |<div>second &amp; third &lt;line&gt;</div></body></html>""".stripMargin
    val got = TextPrep.extract(html.getBytes(StandardCharsets.UTF_8))
    assert(got === "T Hello world! second & third <line>")
  }

  test("extract invariant: synthetic corpus html round-trips to text byte-identically") {
    graft.corpus.Corpus.synthetic(200, seed = 42L).foreach { p =>
      assert(TextPrep.extract(p.html) === p.text, s"url=${p.url}")
    }
  }

  test("extract: numeric entities, nbsp") {
    val got = TextPrep.extractFromString("a&#65;b&#x42;c&nbsp;d")
    assert(got === "aAbBc d")
  }

  test("tokenize matches split(lower, '[^a-z0-9]+') semantics") {
    val cases = Seq(
      "Hello, World!" -> Seq("hello", "world"),
      "  a--b  C3PO " -> Seq("a", "b", "c3po"),
      "" -> Seq(),
      "!!!" -> Seq(),
      "ünïcode" -> Seq("n", "code"),
      "a1b2 c3" -> Seq("a1b2", "c3")
    )
    cases.foreach { case (in, want) =>
      assert(TextPrep.tokenize(in).toSeq === want, s"input=$in")
      // parity with the java-regex form used by Spark's split()
      val viaRegex = in.toLowerCase(java.util.Locale.ROOT)
        .split("[^a-z0-9]+").filter(_.nonEmpty).toSeq
      assert(TextPrep.tokenize(in).toSeq === viaRegex, s"regex parity, input=$in")
    }
  }

  test("termFreqs sums to doclen") {
    val t = "a b a c a b"
    assert(TextPrep.termFreqs(t).toMap === Map("a" -> 3, "b" -> 2, "c" -> 1))
    assert(TextPrep.termFreqs(t).map(_._2).sum === TextPrep.doclen(t))
  }

  test("fused termFreqs scan ≡ termFreqsOf(tokenize) — pairs AND order, both analyzers") {
    val rnd = new scala.util.Random(7)
    val ascii = Seq("", "   ", "a", "a b a c a b", "x!!y--x", "7seas 7seas seas7",
      "trailing token", "token trailing ")
    val uni = Seq("Η Ελλάδα και η θάλασσα", "überstraße ÜBERSTRASSE", "中文 分词 中文",
      "mixed ascii و عربى text", "𝔘𝔫𝔦 𝔠𝔬𝔡𝔢 𝔘𝔫𝔦", "école école", "a𝔘b a𝔘b")
    val fuzz = (1 to 200).map { _ =>
      val len = rnd.nextInt(80)
      new String((0 until len).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 40) ('a' + rnd.nextInt(26)).toChar
        else if (r < 50) ('0' + rnd.nextInt(10)).toChar
        else if (r < 60) ' '
        else if (r < 70) "!@#.,-".charAt(rnd.nextInt(6))
        else if (r < 85) "αβγΔЖ中文е".charAt(rnd.nextInt(8))
        else if (r < 95) ('A' + rnd.nextInt(26)).toChar
        else "𝔘𝔞".charAt(rnd.nextInt(4)) // incl. lone surrogates
      }.toArray)
    }
    for (t <- ascii ++ uni ++ fuzz; an <- Seq(TextPrep.Analyzer.Ascii, TextPrep.Analyzer.Unicode)) {
      val fused = an.termFreqs(t).toSeq
      val ref = TextPrep.termFreqsOf(an.tokenize(t)).toSeq
      assert(fused === ref, s"analyzer=${an.name} text=${t.take(60)}")
    }
  }
}
