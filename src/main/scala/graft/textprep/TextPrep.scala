package graft.textprep

import java.nio.charset.StandardCharsets
import java.util.Locale
import scala.collection.mutable

/** Deterministic text extraction + tokenization.
  *
  * The per-row invariant (`BASELINE.json` `input_hint`) is *byte-identical
  * extracted text per url*: `extract(html)` must reproduce the `text` column
  * exactly. Reference analog: monstache's mapper stage
  * (`monstache.go:1000-1037`) + canonical BSON→JSON encoding
  * (`monstachemap/encoding.go:84-138`) — fixed formats, no locale-dependent
  * behavior (SURVEY.md §7.4.3). Everything here is pure Scala (UTC,
  * Locale.ROOT) so it is usable both inside Spark closures and in plain unit
  * tests.
  */
object TextPrep {

  /** Extract visible text from raw page bytes.
    *
    * Deterministic rules, frozen (golden-tested):
    *  1. decode UTF-8 (malformed sequences → U+FFFD, the charset default);
    *  2. drop <script>/<style> elements including content (case-insensitive);
    *  3. strip all remaining tags;
    *  4. decode the five XML entities + decimal/hex numeric entities;
    *  5. collapse runs of ASCII whitespace to a single space and trim.
    */
  def extract(html: Array[Byte]): String =
    extractFromString(new String(html, StandardCharsets.UTF_8))

  def extractFromString(raw: String): String = {
    val noScript = dropElement(dropElement(raw, "script"), "style")
    val sb       = new java.lang.StringBuilder(noScript.length)
    var i        = 0
    val n        = noScript.length
    var inTag    = false
    while (i < n) {
      val c = noScript.charAt(i)
      if (inTag) { if (c == '>') inTag = false }
      else if (c == '<') inTag = true
      else sb.append(c)
      i += 1
    }
    collapseWs(decodeEntities(sb.toString))
  }

  private def dropElement(s: String, tag: String): String = {
    val lower = s.toLowerCase(Locale.ROOT)
    val open  = "<" + tag
    val close = "</" + tag
    val out   = new java.lang.StringBuilder(s.length)
    var i     = 0
    while (i < s.length) {
      val st = lower.indexOf(open, i)
      if (st < 0) { out.append(s, i, s.length); i = s.length }
      else {
        out.append(s, i, st)
        val en = lower.indexOf(close, st)
        if (en < 0) i = s.length
        else {
          val gt = lower.indexOf('>', en)
          i = if (gt < 0) s.length else gt + 1
        }
      }
    }
    out.toString
  }

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i  = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { sb.append(c); i += 1 }
        else {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try String.valueOf(Character.toChars(Integer.parseInt(e.drop(2), 16)))
              catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try String.valueOf(Character.toChars(Integer.parseInt(e.drop(1))))
              catch { case _: Exception => null }
            case _ => null
          }
          if (rep == null) { sb.append(c); i += 1 }
          else { sb.append(rep); i = semi + 1 }
        }
      }
    }
    sb.toString
  }

  private def collapseWs(s: String): String = {
    val sb      = new java.lang.StringBuilder(s.length)
    var i       = 0
    var pending = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') pending = true
      else {
        if (pending && sb.length > 0) sb.append(' ')
        pending = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Analyzer abstraction (the ES analysis-chain analog — the reference
    * delegates ALL analysis to Elasticsearch's configured analyzer,
    * `/root/reference/monstache.go:46` pipes documents to ES verbatim and
    * the BSON→JSON encoder passes arbitrary UTF-8 through untouched,
    * `/root/reference/monstachemap/encoding.go:113-138`).
    *
    * Two implementations, both deterministic and locale-pinned:
    *  - [[Analyzer.Ascii]] — `[a-z0-9]+` runs; the SQL-dialect-pinned
    *    analyzer every relational oracle twin reproduces byte-for-byte.
    *  - [[Analyzer.Unicode]] — `[\p{L}\p{N}]+` code-point runs after
    *    `toLowerCase(Locale.ROOT)`; the DEFAULT for index builds, so
    *    non-ASCII pages (CJK, Cyrillic, Arabic, accented Latin — the
    *    majority of a Common-Crawl corpus) are searchable. On pure-ASCII
    *    text the two produce identical output, so ASCII-corpus oracles are
    *    byte-stable under either.
    *
    * Case objects are Serializable — safe to capture in Spark closures.
    */
  sealed trait Analyzer extends Serializable {
    def name: String
    def tokenize(text: String): Array[String]
    /** Fused tokenize+aggregate (no per-token String materialization) —
      * output identical to `termFreqsOf(tokenize(text))`: same pairs, same
      * first-occurrence order. The build's hottest per-doc call.
      */
    def termFreqs(text: String): Array[(String, Int)]
    final def termFreqsWithPositions(text: String): Array[(String, Int, Array[Int])] =
      TextPrep.termFreqsWithPositionsOf(tokenize(text))
    final def doclen(text: String): Int = tokenize(text).length
  }

  object Analyzer {
    /** Resolve a recorded analyzer name (the `indexDir/meta` row). */
    def apply(name: String): Analyzer = name match {
      case "ascii"   => Ascii
      case "unicode" => Unicode
      case other     => throw new IllegalArgumentException(s"unknown analyzer: $other")
    }

    case object Ascii extends Analyzer {
      val name = "ascii"
      def tokenize(text: String): Array[String] = TextPrep.tokenize(text)
      def termFreqs(text: String): Array[(String, Int)] =
        TextPrep.termFreqsScan(text, unicode = false)
    }

    case object Unicode extends Analyzer {
      val name = "unicode"
      def tokenize(text: String): Array[String] = TextPrep.tokenizeUnicode(text)
      def termFreqs(text: String): Array[(String, Int)] =
        TextPrep.termFreqsScan(text, unicode = true)
    }
  }

  /** Tokenize: lowercase, split on runs of non-[a-z0-9].
    *
    * Semantics are pinned to the SQL-expressible form
    * `split(lower(text), '[^a-z0-9]+')` filtered of empties, so the DuckDB
    * oracle (`regexp_split_to_array(lower(text), '[^a-z0-9]+')`) is
    * byte-for-byte comparable (SURVEY.md §5).
    */
  def tokenize(text: String): Array[String] = {
    val lower = text.toLowerCase(Locale.ROOT)
    val out   = mutable.ArrayBuffer.empty[String]
    val sb    = new java.lang.StringBuilder(16)
    var i     = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
      else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
      i += 1
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** Unicode-aware tokenize: `toLowerCase(Locale.ROOT)`, then split on runs
    * of non-(letter|number) CODE POINTS — `\p{L}` (Lu/Ll/Lt/Lm/Lo) and
    * `\p{N}` (Nd/Nl/No), the RE2∩Java character-class intersection, so the
    * DuckDB oracle `regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+')`
    * is byte-comparable. Dialect pin (golden-tested in TextPrepSpec):
    * fixtures stay inside the case-mapping intersection of
    * `java.lang.String.toLowerCase(Locale.ROOT)` and utf8proc — i.e. no
    * Turkish dotted İ (Java expands to i + U+0307; utf8proc maps to plain
    * i) and no uppercase Σ (Java applies final-sigma context; utf8proc does
    * not). CJK, Cyrillic, Greek-lowercase, accented Latin, ß, and all Nd
    * digits map identically under both.
    *
    * ASCII fast path: post-lowercase ASCII is word iff [a-z0-9], so ASCII
    * text never pays the code-point decode — the build-throughput hot loop
    * is unchanged on an English corpus, and output on pure-ASCII input is
    * IDENTICAL to [[tokenize]].
    */
  def tokenizeUnicode(text: String): Array[String] = {
    val lower = text.toLowerCase(Locale.ROOT)
    val out   = mutable.ArrayBuffer.empty[String]
    val sb    = new java.lang.StringBuilder(16)
    var i     = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if (c < 0x80) {
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) sb.append(c)
        else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
        i += 1
      } else {
        val cp = lower.codePointAt(i)
        if (isWordCp(cp)) sb.appendCodePoint(cp)
        else if (sb.length > 0) { out += sb.toString; sb.setLength(0) }
        i += Character.charCount(cp)
      }
    }
    if (sb.length > 0) out += sb.toString
    out.toArray
  }

  /** `\p{L}` ∪ `\p{N}` by Unicode general category (matches RE2's classes:
    * isLetter covers Lu/Ll/Lt/Lm/Lo; N = Nd ∪ Nl ∪ No — NOT `isDigit`,
    * which is Nd-only).
    */
  private def isWordCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
      t == Character.OTHER_NUMBER
    }

  /** Per-doc term frequencies — within-doc aggregation happens here, in the
    * flatMap, so the build's first shuffle already carries (term, docId, tf)
    * rows instead of raw token streams (map-side pre-aggregation).
    */
  def termFreqs(text: String): Array[(String, Int)] = termFreqsScan(text, unicode = false)

  /** Fused tokenize + term-frequency aggregation over the lowered text.
    * Tokens are maximal contiguous runs of word chars, so each token is a
    * [start, end) region of `lower`; the open-addressing probe hashes and
    * compares REGIONS, and a String materializes only on a term's FIRST
    * occurrence (~40% of token occurrences on web text). Output is
    * identical to `termFreqsOf(tokenize(text))`: same (term, count) pairs
    * in first-occurrence order. Region hash = String.hashCode of the
    * substring (h*31+c over its chars).
    */
  private[textprep] def termFreqsScan(text: String, unicode: Boolean): Array[(String, Int)] = {
    val lower = text.toLowerCase(Locale.ROOT)
    val len   = lower.length
    // pass 1: token boundaries + region hashes (no allocation per token
    // beyond the three primitive arrays)
    val maxTok = (len >> 1) + 1
    val starts = new Array[Int](maxTok)
    val ends   = new Array[Int](maxTok)
    val hashes = new Array[Int](maxTok)
    var n = 0
    var i = 0
    var tokStart = -1
    var h = 0
    while (i < len) {
      val c = lower.charAt(i)
      var word  = false
      var width = 1
      if (c < 0x80 || !unicode) {
        word = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      } else {
        val cp = lower.codePointAt(i)
        word = isWordCp(cp)
        width = Character.charCount(cp)
      }
      if (word) {
        if (tokStart < 0) { tokStart = i; h = 0 }
        h = h * 31 + c
        if (width == 2) h = h * 31 + lower.charAt(i + 1)
      } else if (tokStart >= 0) {
        starts(n) = tokStart; ends(n) = i; hashes(n) = h; n += 1
        tokStart = -1
      }
      i += width
    }
    if (tokStart >= 0) { starts(n) = tokStart; ends(n) = len; hashes(n) = h; n += 1 }
    if (n == 0) return Array.empty
    // pass 2: open-addressing aggregation over regions
    var cap = 8
    while (cap < (n << 1)) cap <<= 1
    val mask    = cap - 1
    val slotKey = new Array[String](cap)
    val slotIdx = new Array[Int](cap)
    val terms   = new Array[String](n)
    val counts  = new Array[Int](n)
    var distinct = 0
    var t = 0
    while (t < n) {
      val st = starts(t)
      val tl = ends(t) - st
      var s = hashes(t) & mask
      var k = slotKey(s)
      while (k != null && !(k.length == tl && lower.regionMatches(st, k, 0, tl))) {
        s = (s + 1) & mask
        k = slotKey(s)
      }
      if (k == null) {
        slotKey(s) = lower.substring(st, st + tl)
        slotIdx(s) = distinct
        terms(distinct) = slotKey(s); counts(distinct) = 1; distinct += 1
      } else counts(slotIdx(s)) += 1
      t += 1
    }
    val out = new Array[(String, Int)](distinct)
    t = 0
    while (t < distinct) { out(t) = (terms(t), counts(t)); t += 1 }
    out
  }

  /** Open-addressing (term → count) aggregation with first-occurrence
    * order, primitive parallel arrays — this is the build's hottest loop
    * (every token of every doc passes through it), and the boxed
    * LinkedHashMap it replaces measured ~60% of termFreqs wall (HotProf:
    * 14.6 of 25.4 µs/doc single-thread). Output is identical: same
    * (term, count) pairs, same first-occurrence order.
    */
  private[graft] def termFreqsOf(toks: Array[String]): Array[(String, Int)] = {
    val n = toks.length
    if (n == 0) return Array.empty
    var cap = 8
    while (cap < (n << 1)) cap <<= 1
    val mask    = cap - 1
    val slotKey = new Array[String](cap)
    val slotIdx = new Array[Int](cap)
    val terms   = new Array[String](n)
    val counts  = new Array[Int](n)
    var distinct = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      var s = t.hashCode & mask
      var k = slotKey(s)
      while (k != null && !(k.eq(t) || k == t)) { s = (s + 1) & mask; k = slotKey(s) }
      if (k == null) {
        slotKey(s) = t; slotIdx(s) = distinct
        terms(distinct) = t; counts(distinct) = 1; distinct += 1
      } else counts(slotIdx(s)) += 1
      i += 1
    }
    val out = new Array[(String, Int)](distinct)
    i = 0
    while (i < distinct) { out(i) = (terms(i), counts(i)); i += 1 }
    out
  }

  def doclen(text: String): Int = tokenize(text).length

  /** termFreqs + 0-based token positions per term, one tokenize pass — the
    * fat-row payload of a positions-enabled build (`IndexBuilder.Config
    * (positions = true)`). Term order is identical to `termFreqs`
    * (first-occurrence order); positions are ascending by construction.
    */
  def termFreqsWithPositions(text: String): Array[(String, Int, Array[Int])] =
    termFreqsWithPositionsOf(tokenize(text))

  private[textprep] def termFreqsWithPositionsOf(
      toks: Array[String]): Array[(String, Int, Array[Int])] = {
    // same open-addressing shape as termFreqsOf, with growable primitive
    // position arrays per distinct term; first-occurrence order preserved
    val n = toks.length
    if (n == 0) return Array.empty
    var cap = 8
    while (cap < (n << 1)) cap <<= 1
    val mask    = cap - 1
    val slotKey = new Array[String](cap)
    val slotIdx = new Array[Int](cap)
    val terms   = new Array[String](n)
    val poss    = new Array[Array[Int]](n)
    val lens    = new Array[Int](n)
    var distinct = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      var s = t.hashCode & mask
      var k = slotKey(s)
      while (k != null && !(k.eq(t) || k == t)) { s = (s + 1) & mask; k = slotKey(s) }
      if (k == null) {
        slotKey(s) = t; slotIdx(s) = distinct
        terms(distinct) = t
        poss(distinct) = new Array[Int](4)
        poss(distinct)(0) = i
        lens(distinct) = 1
        distinct += 1
      } else {
        val d = slotIdx(s)
        if (lens(d) == poss(d).length) poss(d) = java.util.Arrays.copyOf(poss(d), lens(d) << 1)
        poss(d)(lens(d)) = i
        lens(d) += 1
      }
      i += 1
    }
    val out = new Array[(String, Int, Array[Int])](distinct)
    i = 0
    while (i < distinct) {
      out(i) = (terms(i), lens(i), java.util.Arrays.copyOf(poss(i), lens(i)))
      i += 1
    }
    out
  }
}
