package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed cumulative sum — the scale-correct form of
  * `SUM(v) OVER (ORDER BY id)`: a naive global running sum is a
  * corpus-sized SinglePartition window (the q304 anti-pattern). Instead:
  * per-block sums (block derived from the key itself, so deterministic
  * under any partitioning), a prefix sum over the BOUNDED block table,
  * a broadcast join back, and a row-level window partitioned by block —
  * no window partition ever exceeds [[TwoPhaseCumsum.Block]] rows.
  *
  * Used by q101 (per-lang packing), q412/q415/q416 (packing audits via
  * Assembly.docStarts). The reference has no analytic surface at all
  * (`/root/reference/lib/consumer.ex:283-299` delegates computation to
  * handler callbacks); this is engine-side machinery.
  */
object TwoPhaseCumsum {

  /** Default rows per block — the TEST default, sized so the fixtures
    * actually exercise the two-phase path across multiple blocks.
    * Production deployments at ~10^9 rows should raise it via the
    * session conf `spark.graft.cumsum.block` (e.g. 10^6 keeps the
    * in-block windows at 10^6 rows and the block table at ~1000 rows;
    * both sides of the trade stay bounded for any setting between
    * sqrt(n)-ish extremes). One conf so every call site tunes together.
    */
  val Block = 64L

  /** Session-conf override for the block size (test default [[Block]]). */
  val BlockConf = "spark.graft.cumsum.block"

  /** Adds `cum_before` = the running sum of `valCol` over `idCol`
    * ascending (exclusive of the current row) within `partKeys`.
    * Requires non-negative integer ids that are UNIQUE within each
    * `partKeys` group: the in-block window is a RANGE frame over
    * `idCol`, so a duplicated id would fold all tied peers' values into
    * each twin's `cum_before` (deterministic, but no longer exclusive
    * of the current row — "before" is ill-defined under ties). All
    * callers pass unique doc/row ids; new callers must too.
    * Reserves the column names `blk`/`boff`/`ib` during the computation
    * (dropped on return except `blk`, kept so callers can assert the
    * block-partitioned plan). The only unpartitioned window runs over
    * the block table — #rows / block entries per partition key, bounded
    * by construction.
    */
  def cumBefore(df: DataFrame, partKeys: Seq[String], idCol: String,
      valCol: String): DataFrame = {
    val block = df.sparkSession.conf.getOption(BlockConf)
      .map(_.toLong).getOrElse(Block)
    require(block > 0, s"$BlockConf must be positive, got $block")
    val pb = partKeys.map(col)
    val t = df.withColumn("blk", expr(s"$idCol DIV $block"))
    val blockWin =
      if (pb.isEmpty) Window.orderBy(col("blk"))
      else Window.partitionBy(pb: _*).orderBy(col("blk"))
    val blockOff = t.groupBy(pb :+ col("blk"): _*)
      .agg(sum(col(valCol)).as("bsum"))
      .withColumn("boff", sum(col("bsum")).over(blockWin) - col("bsum"))
      .drop("bsum")
    t.join(broadcast(blockOff), partKeys :+ "blk")
      .withColumn("ib",
        sum(col(valCol)).over(
          Window.partitionBy(pb :+ col("blk"): _*).orderBy(col(idCol)))
          - col(valCol))
      .withColumn("cum_before", col("boff") + col("ib"))
      .drop("boff", "ib")
  }
}
