package graft.tools

import graft.corpus.Corpus
import graft.index.IndexBuilder
import graft.textprep.TextPrep

/** Dev-only single-threaded microprofiler for the build's per-doc CPU hot
  * loops (no Spark): corpus generation, tokenize, term-frequency
  * aggregation, SPIMI inversion + block encoding. Attributes the
  * stage-tokenize / postings phase cost (ScaleProf) to inner loops.
  * Usage: sbt "runMain graft.tools.HotProf [nDocs]"
  */
object HotProf {
  def t[A](name: String, per: Long)(f: => A): A = {
    val t0 = System.nanoTime()
    val a = f
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"HOT $name: $sec%.3f s  (${sec * 1e6 / per}%.2f us/doc)")
    a
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    // warm-up round then measured round
    for (round <- 1 to 2) {
      val label = if (round == 1) "warm" else "meas"
      val texts = t(s"$label gen", n) {
        val a = new Array[String](n)
        var i = 0
        while (i < n) { a(i) = Corpus.syntheticPage(i.toLong, 42L).text; i += 1 }
        a
      }
      val an = TextPrep.Analyzer.Unicode
      var totTok = 0L
      t(s"$label tokenize", n) {
        var i = 0
        while (i < n) { totTok += an.tokenize(texts(i)).length; i += 1 }
      }
      var totTf = 0L
      val tfs = t(s"$label termFreqs", n) {
        val a = new Array[Array[(String, Int)]](n)
        var i = 0
        while (i < n) { a(i) = an.termFreqs(texts(i)); totTf += a(i).length; i += 1 }
        a
      }
      println(s"HOT $label totals: tokens=$totTok distinctPerDoc=${totTf / n}")
      // SPIMI inversion + codec over 64-bucket-equivalent slices: feed the
      // per-doc (terms, tfs) arrays through spimiBlockify exactly as the
      // postings phase does (docIds ascending within each bucket).
      val perBucket = n / 64
      t(s"$label spimi+codec", n) {
        var b = 0
        var rows = 0L
        while (b < 64) {
          val it = (0 until perBucket).iterator.map { j =>
            val d = b * perBucket + j
            val tf = tfs(d)
            var dl = 0
            tf.foreach(dl += _._2)
            (b, d.toLong, dl, tf.map(_._1), tf.map(_._2))
          }
          val out = IndexBuilder.spimiBlockify(it)
          while (out.hasNext) { out.next(); rows += 1 }
          b += 1
        }
        println(s"HOT $label spimi rows=$rows")
      }
    }
  }
}
