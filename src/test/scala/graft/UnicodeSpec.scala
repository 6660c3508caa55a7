package graft

import graft.index.IndexBuilder
import graft.model.PageDoc
import graft.query.{ExhaustiveScorer, QueryEngine}
import graft.textprep.TextPrep
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp

/** Unicode analysis chain: tokenizer semantics (dialect-pinned against the
  * java-regex form), ASCII identity, code-point term ordering, and the full
  * build→WAND round trip over a non-ASCII corpus cross-checked against the
  * exhaustive scorer.
  */
class UnicodeSpec extends SparkSpecBase {
  import TextPrep.Analyzer

  test("tokenizeUnicode: case folding, CJK, digits, supplementary planes") {
    val cases = Seq(
      "Hello, World!" -> Seq("hello", "world"),
      "ünïcode Über" -> Seq("ünïcode", "über"),
      "Привет, МИР!" -> Seq("привет", "мир"),
      "中文文档,搜索引擎。" -> Seq("中文文档", "搜索引擎"),
      "٣٤٥ and 123" -> Seq("٣٤٥", "and", "123"),
      "Ελληνικά Κείμενο" -> Seq("ελληνικά", "κείμενο"),
      "emoji 😀 split" -> Seq("emoji", "split"),
      // Deseret (supplementary plane, has case): 𐐀 lowercases to 𐐨
      "𐐀x" -> Seq("𐐨x"),
      "" -> Seq(),
      "!!! …—" -> Seq()
    )
    cases.foreach { case (in, want) =>
      assert(Analyzer.Unicode.tokenize(in).toSeq === want, s"input=$in")
      // dialect parity with the java-regex form (Java \p{L}\p{N} are the
      // full Unicode general categories, same classes as RE2's)
      val viaRegex = in.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
      assert(Analyzer.Unicode.tokenize(in).toSeq === viaRegex, s"regex parity, input=$in")
    }
  }

  test("tokenizeUnicode equals tokenize on pure-ASCII text (oracle byte-stability)") {
    graft.corpus.Corpus.synthetic(300, seed = 7L).foreach { p =>
      assert(Analyzer.Unicode.tokenize(p.text).toSeq === Analyzer.Ascii.tokenize(p.text).toSeq)
    }
    // and on ASCII with every printable punctuation byte
    val noisy = (0x20 to 0x7e).map(_.toChar).mkString("a ", " b ", " C9")
    assert(Analyzer.Unicode.tokenize(noisy).toSeq === Analyzer.Ascii.tokenize(noisy).toSeq)
  }

  test("codePointOrder == UTF-8 byte order (incl. supplementary vs BMP≥U+E000)") {
    val samples = Seq("a", "abc", "z9", "ß", "привет", "мир", "中文", "文档",
      "￥yen", "private", "𐐨deseret", "😀", "café", "cafe", "caf")
    val byBytes = samples.sortBy(s => new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1))
    val byCmp = samples.sorted(Ordering.comparatorToOrdering(IndexBuilder.codePointOrder))
    assert(byCmp === byBytes)
    // comparator consistency: total order properties on pairs
    for (x <- samples; y <- samples) {
      val c = Integer.signum(IndexBuilder.codePointOrder.compare(x, y))
      assert(c === -Integer.signum(IndexBuilder.codePointOrder.compare(y, x)))
    }
  }

  test("needsCodePointSort: intrinsic sort unless supplementary AND high-BMP coexist") {
    import IndexBuilder.needsCodePointSort
    assert(!needsCodePointSort(Array("plain", "ascii", "привет", "中文")))
    assert(!needsCodePointSort(Array("𐐨deseret", "ascii"))) // surrogates only
    assert(!needsCodePointSort(Array("ﬀligature", "ascii"))) // high BMP only
    assert(needsCodePointSort(Array("𐐨deseret", "ﬀligature"))) // both → exact comparator
    // and when both coexist, the comparator path equals UTF-8 byte order
    val terms = Array("ﬀab", "𐐨xy", "za", "中文", "ascii")
    val sorted = terms.clone()
    java.util.Arrays.sort(sorted, IndexBuilder.codePointOrder)
    val byBytes = terms.sortBy(s =>
      new String(s.getBytes(StandardCharsets.UTF_8), StandardCharsets.ISO_8859_1))
    assert(sorted.toSeq === byBytes.toSeq)
  }

  test("supplementary-plane terms index and query end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("supp-idx").toString
    val texts = Seq("𐐨𐐮 deseret page spark", "ﬀ ligature page data", "plain page about spark")
    val pages = texts.zipWithIndex.map { case (t, i) =>
      PageDoc(s"https://s.example/$i", new Timestamp(1735689600000L + i * 1000L),
        ("<html><body>" + t + "</body></html>").getBytes(StandardCharsets.UTF_8), t, "mul")
    }
    IndexBuilder.build(spark, spark.createDataset(pages), dir, IndexBuilder.Config(numBuckets = 2))
    val got = QueryEngine.topK(spark, dir, Seq("s1" -> "𐐨𐐮", "s2" -> "ﬀ"), 5).collect()
    assert(got.count(_.queryId == "s1") === 1)
    assert(got.count(_.queryId == "s2") === 1)
  }

  private def uniPages: Seq[PageDoc] = {
    val texts = Seq(
      "Привет мир данные поиска Spark индекс",
      "中文 文档 搜索 引擎 数据 spark",
      "Café über naïve señor spark query data",
      "Ελληνικά κείμενο αναζήτηση δεδομένα spark",
      "данные мир мир мир spark index block",
      "搜索 搜索 文档 data spark wand",
      "über café spark spark spark data",
      "κείμενο δεδομένα данные 文档 café mixed page",
      "😀 👍 …—", // tokenizes to ZERO terms — empty-doc build path
      "plain ascii only page about spark data query"
    )
    texts.zipWithIndex.map { case (t, i) =>
      PageDoc(s"https://u.example/$i", new Timestamp(1735689600000L + i * 1000L),
        ("<html><body>" + t + "</body></html>").getBytes(StandardCharsets.UTF_8), t, "mul")
    }
  }

  test("unicode corpus: build + WAND top-k ≡ exhaustive scorer, bit-equal") {
    import spark.implicits._
    val dir = Files.createTempDirectory("uni-idx").toString
    val pages = spark.createDataset(uniPages)
    IndexBuilder.build(spark, pages, dir, IndexBuilder.Config(numBuckets = 4))

    // recorded analyzer round-trips through indexDir/meta
    assert(IndexBuilder.analyzerOf(spark, dir) === Analyzer.Unicode)

    val queries = Seq(
      "uq1" -> "мир данные",
      "uq2" -> "文档 搜索",
      "uq3" -> "café über SPARK",
      "uq4" -> "κείμενο",
      "uq5" -> "missingzzz")
    val got = QueryEngine.topK(spark, dir, queries, 10).collect()
      .map(r => (r.queryId, r.rank, r.docId, r.score)).sortBy(x => (x._1, x._2))

    // exhaustive oracle needs the same docIds the build assigned
    val docsText = spark.read.parquet(s"$dir/docs")
      .select("docId", "url").as[(Long, String)].collect().toMap
    val urlToText = uniPages.map(p => p.url -> p.text).toMap
    val byId = docsText.map { case (id, url) => (id, urlToText(url)) }.toSeq
    val want = ExhaustiveScorer.topK(spark, spark.createDataset(byId), queries, 10,
        analyzer = Analyzer.Unicode)
      .collect().map(r => (r.queryId, r.rank, r.docId, r.score)).sortBy(x => (x._1, x._2))

    assert(got.length > 0)
    assert(got.toSeq === want.toSeq)
    // non-ASCII terms actually hit: uq1/uq2/uq4 must match docs
    assert(got.count(_._1 == "uq1") > 0)
    assert(got.count(_._1 == "uq2") > 0)
    assert(got.count(_._1 == "uq4") > 0)
    assert(got.count(_._1 == "uq5") === 0)
  }

  test("ascii-pinned index still honors its recorded analyzer") {
    import spark.implicits._
    val dir = Files.createTempDirectory("ascii-idx").toString
    val pages = spark.createDataset(uniPages)
    IndexBuilder.build(spark, pages, dir,
      IndexBuilder.Config(numBuckets = 2, analyzer = "ascii"))
    assert(IndexBuilder.analyzerOf(spark, dir) === Analyzer.Ascii)
    // Cyrillic query tokenizes to nothing under ascii — empty result, no crash
    val got = QueryEngine.topK(spark, dir, Seq("a1" -> "мир"), 5).collect()
    assert(got.isEmpty)
  }
}
