package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Deterministic cross-engine rounding for non-negative doubles.
  *
  * `round(x, 4)` diverges between engines when x is binary-EXACT on a
  * .xxxx5 boundary — Spark rounds HALF_UP (on the shortest decimal
  * repr), DuckDB half-to-even. Ratios with power-of-two denominators
  * (a 64-doc language group, a 32-token document) produce exactly such
  * values. `floor(x*1e4 + 0.5)/1e4` is HALF_UP computed with identical
  * IEEE operations on both sides, so disagreement is impossible. Only
  * for non-negative x (floor+0.5 rounds toward +inf on negatives).
  */
object Det {
  def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Signed HALF_UP (round half away from zero) at 4dp — the same
    * identical-IEEE construction for columns that can be negative:
    * sign·floor(|x|·1e4 + 0.5)/1e4. Mirror in oracle SQL as
    * `sign(x) * floor(abs(x)*10000.0 + 0.5) / 10000.0`. */
  def r4s(c: Column): Column = {
    import org.apache.spark.sql.functions.{abs => fabs, signum}
    signum(c) * (floor(fabs(c) * 10000.0 + 0.5) / 10000.0)
  }

  /** Same, 6dp — for small-magnitude signed quantities (quantization
    * scales, logprobs) where 4dp would flatten the signal. */
  def r6s(c: Column): Column = {
    import org.apache.spark.sql.functions.{abs => fabs, signum}
    signum(c) * (floor(fabs(c) * 1000000.0 + 0.5) / 1000000.0)
  }
}
