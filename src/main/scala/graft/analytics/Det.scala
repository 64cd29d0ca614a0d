package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine numeric patterns for the oracle gate.
  *
  * The testdata's numeric columns are exact 2-decimal values, so
  * rounded float aggregates sit exactly on decimal half-way points
  * where engines legitimately disagree: Spark's `round` goes through
  * the shortest decimal string (HALF_UP), DuckDB rounds the raw
  * binary double — and the accumulated float sum itself depends on
  * shuffle merge order. Two rules remove both failure modes:
  *
  *  1. **Sum in DECIMAL.** `sum(CAST(x AS DECIMAL(18,6)))` is exact and
  *     associative — independent of partitioning and merge order, and
  *     bit-identical across engines after casting back to double.
  *     (Products of 2-decimal values are 4–6-decimal; the cast snaps
  *     the double product to its true decimal value.)
  *  2. **Round with floor arithmetic.** `floor(x·10^k + 0.5)/10^k` is
  *     pure IEEE arithmetic: given the same input bits both engines
  *     produce the same output bits, with no string round-tripping.
  *
  * Every oracle-checked aggregate of decimal-valued data uses these;
  * the matching SQL generators keep the DuckDB side structurally
  * identical.
  */
object Det {
  private def p10(k: Int): Double = math.pow(10, k)

  /** Deterministic half-up rounding: floor(x·10^k + 0.5)/10^k. */
  def dround(c: Column, k: Int): Column = floor(c * p10(k) + lit(0.5)) / p10(k)

  /** Driver-side scalar twin of [[dround]] (same IEEE arithmetic). */
  def droundD(x: Double, k: Int): Double = math.floor(x * p10(k) + 0.5) / p10(k)

  /** Exact decimal sum, surfaced as double. */
  def sumDec(e: Column): Column = sum(e.cast("decimal(18,6)")).cast("double")

  /** Exact decimal sum at 9 decimals (for ratio-valued inputs). */
  def sumDec9(e: Column): Column = sum(e.cast("decimal(18,9)")).cast("double")

  /** Rounded exact sum / mean of a decimal-valued expression. */
  def sumDecR(e: Column, k: Int): Column = dround(sumDec(e), k)
  def avgDecR(e: Column, k: Int): Column = dround(sumDec(e) / count(lit(1)), k)
  def avgDec9R(e: Column, k: Int): Column = dround(sumDec9(e) / count(lit(1)), k)

  // ---- matching DuckDB SQL generators ----
  private def p10s(k: Int): String = "1" + ("0" * k) + ".0"
  def sqlRound(x: String, k: Int): String = s"floor(($x) * ${p10s(k)} + 0.5) / ${p10s(k)}"
  def sqlSumDec(e: String): String = s"CAST(sum(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlSumDec9(e: String): String = s"CAST(sum(CAST(($e) AS DECIMAL(18,9))) AS DOUBLE)"
  def sqlSumDecR(e: String, k: Int): String = sqlRound(sqlSumDec(e), k)
  def sqlAvgDecR(e: String, k: Int): String = sqlRound(s"${sqlSumDec(e)} / count(*)", k)
  def sqlAvgDec9R(e: String, k: Int): String = sqlRound(s"${sqlSumDec9(e)} / count(*)", k)
}
