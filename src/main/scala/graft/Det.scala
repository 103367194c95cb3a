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
}
