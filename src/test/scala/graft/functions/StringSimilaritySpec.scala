package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.StringSimilarityFunctions._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro / Jaro-Winkler: pinned against hand-computed textbook values
  * (cross-checked case by case against an independent engine's
  * implementation — the same values the DuckDB oracle reproduces),
  * including every convention the algorithm family forks on: empty
  * strings, the 0.7 boost threshold (strict), the 4-byte prefix cap,
  * integer-halved odd transposition counts, and byte-level (not
  * code-point) matching. */
class StringSimilaritySpec extends SparkSpec {

  import org.apache.spark.sql.graft.JaroWinklerRuntime

  private def jw(a: String, b: String): Double =
    JaroWinklerRuntime.jaroWinkler(
      UTF8String.fromString(a), UTF8String.fromString(b))
  private def j(a: String, b: String): Double =
    JaroWinklerRuntime.jaro(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private def close(x: Double, y: Double): Boolean = math.abs(x - y) < 1e-12

  test("textbook values: the classic Winkler census pairs") {
    assert(close(j("martha", "marhta"), 0.9444444444444445))
    assert(close(jw("martha", "marhta"), 0.9611111111111111))
    assert(close(j("dixon", "dicksonx"), 0.7666666666666666))
    assert(close(jw("dixon", "dicksonx"), 0.8133333333333332))
    assert(close(j("jones", "johnson"), 0.7904761904761904))
    assert(close(jw("jones", "johnson"), 0.8323809523809523))
    assert(close(j("dwayne", "duane"), 0.8222222222222223))
    assert(close(jw("dwayne", "duane"), 0.8400000000000001))
  }

  test("convention forks: empties, boost threshold, prefix cap, window") {
    // either side empty (including both) → 0, not 1
    assert(j("", "") === 0.0 && jw("", "") === 0.0)
    assert(j("", "abc") === 0.0 && jw("abc", "") === 0.0)
    // identical → 1 (single char: window clamps at 0)
    assert(j("a", "a") === 1.0 && jw("abc", "abc") === 1.0)
    // jaro 2/3 < 0.7 → NO winkler bonus despite the 4-byte prefix
    assert(close(jw("abcdxxxx", "abcdyyyy"), 0.6666666666666666))
    // jaro barely ABOVE 0.7 (fl rounds up) → bonus applies
    assert(close(jw("abcdefghijkzzzzzzzzz", "abcdefghijkyyyyyyyyy"),
      0.8200000000000001))
    // prefix bonus caps at 4 even with a 6-byte common prefix
    assert(close(jw("prefix", "prefixxxxlong"), 0.8923076923076924))
    // window 0 at len 2: swapped neighbors never match
    assert(j("ab", "ba") === 0.0)
    // len-4 full transposition set: m=4, k=4 → t=2
    assert(close(j("abcd", "badc"), 0.8333333333333334))
  }

  test("odd transposition count integer-halves; byte-level matching") {
    // a,b,c form a 3-cycle → k=3, t = 3/2 = 1 (NOT 1.5)
    assert(close(j("abcxyz", "bcaxyz"), 0.9444444444444445))
    // ä is 2 UTF-8 bytes: 'äb'/'äc' compares as 3-byte strings (m=2)
    assert(close(j("äb", "äc"), 0.7777777777777777))
    assert(close(jw("äb", "äc"), 0.8222222222222222))
  }

  test("Column API + codegen evaluate; nulls propagate") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("abcd", "badc"))
      .toDF("a", "b")
    val got = df.select(jaroWinklerSim(col("a"), col("b")).as("s"))
      .as[Double].collect().toSeq
    assert(close(got.head, 0.9611111111111111))
    assert(close(got(1), 0.8333333333333334))
    val withNull = Seq((Some("x"), None: Option[String]))
      .toDF("a", "b")
      .select(jaroSim(col("a"), col("b")).as("s"))
      .collect().head
    assert(withNull.isNullAt(0))
  }
}
