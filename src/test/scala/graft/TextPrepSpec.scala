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
}
