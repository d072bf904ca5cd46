package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic numeric aggregation helpers for the oracle harness.
  *
  * Floating-point SUM/AVG are order-dependent, and Spark and DuckDB
  * accumulate in different orders (hash-partitioned partial aggs vs
  * vectorized/segment-tree), so a raw `sum(double)` can differ in the last
  * bits and fail the driver's hash compare. We instead sum EXACTLY in
  * decimal (associative + commutative, so partial aggregation order is
  * irrelevant) and cast the final value to double — the decimal→double
  * conversion is correctly-rounded in both engines, so results are
  * bit-identical. The matching DuckDB idiom is
  * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  */
object Det {
  /** Exact, order-independent sum of a 2-decimal money column, as double. */
  def moneySum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Exact decimal sum kept as decimal(38,2) — for schema-typed outputs. */
  def moneySumDec(c: Column): Column = sum(c.cast(DecimalType(18, 2)))

  /** Deterministic mean: exact decimal sum → double, divided by count.
    * Both engines then perform the identical IEEE double division. */
  def moneyAvg(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType) / count(c)

  /** DuckDB SQL fragment matching [[moneySum]]. */
  def sqlMoneySum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE)"

  /** DuckDB SQL fragment matching [[moneyAvg]]. */
  def sqlMoneyAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,2))) AS DOUBLE) / COUNT($expr)"
}
