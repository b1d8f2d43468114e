package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Cross-engine-deterministic numeric helpers.
  *
  * Summing doubles is order-dependent, and Spark's parallel partial aggregation
  * uses a different addition order than DuckDB (and than itself, run to run).
  * To make aggregate results bit-stable AND identical across engines, every
  * floating sum in an oracle-checked query is computed by casting each term to
  * DECIMAL(28,6) (exact, order-independent addition) and casting the exact
  * total back to DOUBLE. The matching SQL fragments are provided so the DuckDB
  * oracle performs the same exact arithmetic.
  */
object ColFns {
  val Dec: DecimalType = DecimalType(28, 6)

  /** Order-independent exact sum of a floating column, returned as DOUBLE. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact-sum-based average (deterministic sum, then one IEEE division). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL mirror of [[dsum]] for the DuckDB oracle. */
  def dsumSql(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"

  /** SQL mirror of [[davg]]. */
  def davgSql(expr: String): String =
    s"(${dsumSql(expr)} / COUNT($expr))"

  /** Round-half-up to `scale` decimals via floor(x*s + 0.5)/s — unlike
    * round(), identical across engines at halfway points (both engines run
    * the same three IEEE ops).
    */
  def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d

  /** SQL mirror of [[r6]]. */
  def r6Sql(expr: String): String =
    s"FLOOR(($expr) * 1000000 + 0.5) / 1000000"

  /** Coarser round-half-up (4 decimals) for columns derived from a libm call
    * (exp/ln) where the two engines may differ by 1 ulp: at 1e-4 granularity a
    * 1-ulp input divergence cannot flip the floor except on an exact halfway
    * boundary ~1e-12 wide.
    */
  def r4(c: Column): Column = floor(c * 10000d + 0.5d) / 10000d

  /** SQL mirror of [[r4]]. */
  def r4Sql(expr: String): String =
    s"FLOOR(($expr) * 10000 + 0.5) / 10000"
}
