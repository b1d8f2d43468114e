package graft

import org.apache.spark.sql.Dataset

/** Registry for DataFrames a query builder `.cache()`s internally.
  *
  * Query builders return lazy plans, so they cannot unpersist their own
  * caches — the action happens later, in the runner (Verify / Bench / a
  * test). Without cleanup each pass over the suite accumulates cached
  * blocks in executor storage memory. Builders register every cached frame
  * here; runners call `release()` after the query's final action.
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[Dataset[_]]()

  /** Cache `df` and remember it for the next `release()`. */
  def cached[T](df: Dataset[T]): Dataset[T] = {
    df.cache()
    live.add(df)
    df
  }

  /** Unpersist every frame registered since the last release (non-blocking). */
  def release(): Unit = {
    var d = live.poll()
    while (d != null) { d.unpersist(false); d = live.poll() }
  }
}
