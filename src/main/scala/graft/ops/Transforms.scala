package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** F6/M7 parity — runtime-configurable per-namespace transform chains.
  *
  * The reference lets users attach mapper/filter scripts to namespaces from
  * config without recompiling (TOML `[[script]]` blocks dispatched per
  * namespace, `/root/reference/monstache.go:1950-2049`, applied at
  * `monstache.go:2007-2049`). The Spark-first analog is a registry of NAMED
  * column-level transforms (each a `DataFrame => DataFrame` built from
  * codegen'd expressions — never a UDF) plus a tiny line-based config that
  * maps a namespace to a transform chain. Changing the pipeline is a config
  * edit, not a rebuild; full JS-engine parity is deliberately out of scope
  * (SURVEY.md §2.1).
  *
  * Config format (`#` comments, blank lines ignored):
  * {{{
  *   documents = lowercase_text,strip_punct,drop_short
  *   events    = noop
  * }}}
  */
object Transforms {

  /** Named transforms. All are narrow column expressions: applying a chain
    * never adds a shuffle, and filters stay eligible for scan pushdown.
    */
  val registry: Map[String, DataFrame => DataFrame] = Map(
    "noop" -> identity[DataFrame],
    "lowercase_text" -> (df => df.withColumn("text", lower(col("text")))),
    "trim_text" -> (df => df.withColumn("text", trim(col("text")))),
    // punctuation class shared with TextOps.qualityFeatures
    "strip_punct" -> (df => df.withColumn("text", regexp_replace(col("text"), "[.!?,;:]", ""))),
    // drops docs whose CURRENT text (after earlier chain steps) is short
    "drop_short" -> (df => df.filter(length(col("text")) >= 200)),
    // the PII scrub as a mapper step (same regexes as TextOps.piiRedact)
    "redact_pii" -> (df => df.withColumn("text",
      regexp_replace(regexp_replace(col("text"), TextOps.EmailRe, "[EMAIL]"),
        TextOps.PhoneRe, "[PHONE]")))
  )

  /** Parse `namespace = t1,t2,...` lines. Unknown transform names fail fast
    * at load time (config typos must not silently no-op mid-pipeline).
    */
  def parseConfig(lines: Iterator[String]): Map[String, Seq[String]] = {
    val entries = lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
      val eq = l.indexOf('=')
      require(eq > 0, s"transforms config: expected 'namespace = chain', got: $l")
      val ns = l.substring(0, eq).trim
      val chain = l.substring(eq + 1).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      val unknown = chain.filterNot(registry.contains)
      require(unknown.isEmpty,
        s"transforms config: unknown transform(s) ${unknown.mkString(", ")} for namespace $ns")
      ns -> chain
    }
    entries.toMap
  }

  /** Load the chain config from a classpath resource (the deployable
    * config artifact; a cluster job would read the same format from a
    * `--files`-shipped path).
    */
  def fromResource(name: String = "/transforms.conf"): Map[String, Seq[String]] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"transforms config resource not found: $name")
    try parseConfig(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  def fromFile(path: String): Map[String, Seq[String]] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parseConfig(src.getLines()) finally src.close()
  }

  /** Apply the configured chain for `namespace` (namespaces without an
    * entry pass through untouched — reference behavior for unmapped
    * collections).
    */
  def apply(config: Map[String, Seq[String]], namespace: String, df: DataFrame): DataFrame =
    config.getOrElse(namespace, Nil).foldLeft(df)((d, name) => registry(name)(d))
}
