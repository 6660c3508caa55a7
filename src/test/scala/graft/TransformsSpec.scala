package graft

import graft.ops.Transforms
import org.scalatest.funsuite.AnyFunSuite

class TransformsSpec extends AnyFunSuite {

  test("config parses namespaces, chains, comments and blanks") {
    val cfg = Transforms.parseConfig(Iterator(
      "# comment", "", "documents = lowercase_text, strip_punct ,drop_short",
      "events=noop"))
    assert(cfg("documents") == Seq("lowercase_text", "strip_punct", "drop_short"))
    assert(cfg("events") == Seq("noop"))
  }

  test("unknown transform names fail at load, not silently at runtime") {
    val e = intercept[IllegalArgumentException] {
      Transforms.parseConfig(Iterator("documents = lowercase_text,typo_transform"))
    }
    assert(e.getMessage.contains("typo_transform"))
  }

  test("shipped resource config loads and covers the documents namespace") {
    val cfg = Transforms.fromResource()
    assert(cfg.contains("documents"))
    cfg.values.flatten.foreach(n => assert(Transforms.registry.contains(n)))
  }

  test("unmapped namespace passes through untouched") {
    val spark = SparkSpecBase.session
    import spark.implicits._
    val df = Seq((1L, "Some Text.")).toDF("doc_id", "text")
    val out = Transforms(Map("documents" -> Seq("lowercase_text")), "other_ns", df)
    assert(out.collect().map(_.getString(1)).toSeq == Seq("Some Text."))
  }
}
