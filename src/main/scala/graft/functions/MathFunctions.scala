package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-stable rounding (SURVEY.md §7 risk 1).
  *
  * `round()` diverges across engines near decimal boundaries: Spark rounds
  * HALF_UP on the exact BigDecimal expansion of the double, DuckDB multiplies
  * by 10^n and rounds the (re-rounded) product. The floor form below is plain
  * double arithmetic — any engine executing the same ops on the same input
  * double produces the identical result, so mirrored Spark/DuckDB expressions
  * compare bit-exact.
  */
object MathFunctions {

  /** floor(x * 10^n + 0.5) / 10^n as double — half-up toward +inf. */
  def floorRound(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)).cast("double") / lit(p)
  }

  /** Integral division on longs (`div` → Catalyst `IntegralDivide`) — exact
    * for any long operands, unlike `(a / b).cast("long")` whose DOUBLE
    * intermediate silently loses integer precision past 2^53 (ADVICE r13
    * item 2: shard/sequence ids must mirror the oracle's BIGINT `//` at
    * 100 TB token offsets, not just below 9 PB of whitespace tokens).
    */
  def longDiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** FLOOR division on longs for positive `b` — `⌊a/b⌋` à la
    * `Math.floorDiv`, unlike [[longDiv]]/DuckDB `//` which truncate toward
    * zero (they differ exactly when `a < 0` and `b ∤ a`). `a − pmod(a, b)`
    * is exactly divisible, so the quotient stays in pure long arithmetic
    * (ADVICE r16: the per-cell centering mean documented as FLOORED must
    * floor for negative component sums, not just the nonnegative
    * bucket-count fixtures).
    */
  def floorLongDiv(a: Column, b: Column): Column =
    call_function("div", a - pmod(a, b), b)

  /** The DuckDB mirror of [[floorRound]] for oracle SQL generation. Literals
    * are cast to DOUBLE — bare decimal literals are DECIMAL-typed in DuckDB
    * and would change the arithmetic.
    */
  def floorRoundSql(e: String, n: Int): String = {
    val p = math.pow(10, n)
    s"(floor(($e) * CAST($p AS DOUBLE) + CAST(0.5 AS DOUBLE)) / CAST($p AS DOUBLE))"
  }
}
