package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Numeric output-formatting helpers shared by the stats operators.
 *
 * The one rule that lives here: a ROUNDED double output column must
 * never carry IEEE negative zero. Spark's `round` (BigDecimal HALF_UP)
 * already normalizes `-0.0` to `+0.0`, but DuckDB's `round(DOUBLE, n)`
 * preserves the sign bit — so a slope/gap/delta that rounds to zero
 * from below hashes differently across the two engines even though the
 * values compare equal (`-0.0 == 0.0`). The driver's correctness gate
 * is bit-sensitive; round-14's `q_durbin_watson` failed on exactly this
 * (OLS slope of a flat trend → DuckDB `-0.0`, Spark `+0.0`).
 *
 * [[roundz]] appends `+ 0.0` after the round: under IEEE 754
 * round-to-nearest, `-0.0 + 0.0 = +0.0` and every other value is
 * unchanged (NULL propagates). Oracle SQL mirrors it by appending
 * `+ 0` after each `round(...)` on any column that can land on zero
 * from below. Use [[roundz]] for every rounded-double output column in
 * new operators; the matching oracle side is the author's contract.
 */
object Num {
  /** `round(c, scale)` with IEEE negative zero normalized to `+0.0`. */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
