package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Column helpers shared across the query inventory.
  *
  * Determinism-vs-oracle convention: the testdata money/quantity columns
  * are doubles holding 2-decimal values. Summing doubles is
  * order-dependent (Spark's partial aggregation order differs run to run
  * and from DuckDB's), so every aggregated money expression is cast to an
  * exact decimal BEFORE the sum and back to double AFTER. The decimal sum
  * is exact in both engines and the final decimal→double conversion is a
  * single correctly-rounded step in both, so results hash-match.
  */
object Cols {
  /** Exact 2-decimal view of a money/quantity double column. */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact 4-decimal decimal (for products that need extra scale). */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Final cast of an exact decimal aggregate back to double. */
  def asD(c: Column): Column = c.cast(DoubleType)

  /** Exact decimal sum of a 2-decimal double column, emitted as double. */
  def dsum(c: Column): Column = asD(sum(dec2(c)))

  /** Exact mean of a 2-decimal double column (decimal sum / count). */
  def davg(c: Column): Column = asD(sum(dec2(c))) / count(c)

  /** Epoch-nanos long column (by name) -> epoch-micros long. SQL `div` is
    * integer division; `/` on longs is double division, which loses
    * precision above 2^53 (epoch-ns is ~1.7e18).
    */
  def nsToUs(name: String): Column = expr(s"`$name` div 1000")

  /** Epoch-nanos long column (by name) -> floor'd epoch-seconds long. */
  def nsToSec(name: String): Column = expr(s"`$name` div 1000000000")
}
