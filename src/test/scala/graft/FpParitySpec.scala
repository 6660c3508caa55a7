package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the IEEE signed-zero normalization used by every rounded oracle
  * column that can go negative (pmi, patch-lag delta, the cosines,
  * negative-capable sums/avgs).
  *
  * The hazard: for a value that rounds to zero from below, Spark's `round`
  * (BigDecimal HALF_UP) emits +0.0 while DuckDB's `round` preserves the IEEE
  * sign and emits -0.0. The two compare equal under `==` but differ at the
  * byte level, so the driver's hash gate flags them. The fix on BOTH sides
  * is `round(x, 4) + 0.0`: IEEE 754 defines `-0.0 + 0.0 = +0.0`, and the
  * addition is the identity on every other finite double.
  */
class FpParitySpec extends SparkSpecBase {

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("signed zeros compare equal but differ at the byte level") {
    assert(-0.0 == 0.0)
    assert(bits(-0.0) != bits(0.0)) // the hash-gate hazard
  }

  test("+ 0.0 maps -0.0 to +0.0 and is the identity elsewhere (JVM semantics)") {
    assert(bits(-0.0 + 0.0) == bits(0.0))
    // DuckDB-convention round of a negative-tiny value: sign-preserving -0.0
    val duckRound = math.copySign(math.rint(-3.0e-5 * 1e4) / 1e4, -3.0e-5)
    assert(bits(duckRound) == bits(-0.0))
    assert(bits(duckRound + 0.0) == bits(0.0))
    // identity on ordinary values, including negatives
    for (v <- Seq(1.2345, -1.2345, 0.0001, -0.0001, 1e300, -1e300))
      assert(bits(v + 0.0) == bits(v))
  }

  test("Spark round(x,4) + 0.0 yields +0.0 bits for a negative-near-zero input") {
    import spark.implicits._
    val out = Seq(-3.0e-5, -0.0, 3.0e-5, -1.23456, 1.23456).toDF("x")
      .select((round(col("x"), 4) + lit(0.0)).as("r"))
      .collect().map(_.getDouble(0))
    assert(bits(out(0)) == bits(0.0)) // rounds to zero from below → +0.0
    assert(bits(out(1)) == bits(0.0)) // literal -0.0 → +0.0
    assert(bits(out(2)) == bits(0.0))
    assert(out(3) == -1.2346 && out(4) == 1.2346)
  }
}
