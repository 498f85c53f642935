package graft

import scala.collection.mutable
import org.apache.spark.sql.Dataset

/** Cleanup contract for operators whose returned plan persist()s an
  * intermediate frame (signature tables, closure frontiers, re-read
  * aggregation inputs). Those persists cannot be unpersisted inside
  * the operator — the returned DataFrame is lazy and the cache is
  * exactly what makes its double-consumed subtree single-scan — so a
  * long-lived session would accumulate corpus-scale cached frames
  * across queries.
  *
  * The contract: operators cache via [[CacheRegistry.Tracked.persistTracked]]
  * instead of bare persist(); the harness (Verify / Bench / any
  * caller's query loop) calls [[drain]] after materializing each
  * result. Iterative operators that unpersist their own loop frames
  * still route through the registry — unpersisting an already-freed
  * frame is a no-op, so drain stays idempotent.
  */
object CacheRegistry {

  private val tracked = mutable.ArrayBuffer.empty[Dataset[_]]

  /** Unpersist every tracked frame and forget it. Call after the
    * query's action completes (results are unaffected — a drained
    * plan recomputes if re-run). */
  def drain(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }

  /** Frames currently tracked (spec hook). */
  def size: Int = synchronized(tracked.size)

  implicit final class Tracked[T](private val ds: Dataset[T]) extends AnyVal {
    /** persist() + register for [[CacheRegistry.drain]]. */
    def persistTracked(): Dataset[T] = {
      ds.persist()
      CacheRegistry.synchronized(tracked += ds)
      ds
    }
  }
}
