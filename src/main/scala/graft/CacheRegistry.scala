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
  *
  * CONCURRENCY CAVEAT: the registry is one JVM-global list, which
  * matches the single-driver harness (Verify/Bench run queries
  * sequentially on one thread). Two query loops interleaving on the
  * same driver would drain each other's caches through the bare
  * [[drain()]] — harmless for correctness (a drained plan recomputes)
  * but a silent performance cliff. Such callers must scope their
  * builds with [[withKey]] and drain with [[drain(key)]]: frames are
  * tagged with the (thread-local, inheritable) key active while the
  * operator BUILT its plan, so each loop frees exactly its own
  * frames. The key is captured at persistTracked time — build and
  * drain may happen on different threads as long as the key matches.
  */
object CacheRegistry {

  private val tracked = mutable.ArrayBuffer.empty[(String, Dataset[_])]

  /** Key applied to frames tracked by the current thread (inherited
    * by child threads, e.g. a per-query worker spawned by a loop). */
  private val currentKey = new InheritableThreadLocal[String] {
    override def initialValue(): String = ""
  }

  /** Run `f` with all frames it tracks tagged `key` — one key per
    * concurrent query loop; nesting restores the outer key. */
  def withKey[A](key: String)(f: => A): A = {
    val prev = currentKey.get
    currentKey.set(key)
    try f finally currentKey.set(prev)
  }

  /** Unpersist every tracked frame and forget it — the single-driver
    * harness path. Call after the query's action completes (results
    * are unaffected — a drained plan recomputes if re-run). */
  def drain(): Unit = synchronized {
    tracked.foreach(_._2.unpersist(blocking = false))
    tracked.clear()
  }

  /** Unpersist only the frames tracked under `key` (see [[withKey]]);
    * other loops' caches stay live. */
  def drain(key: String): Unit = synchronized {
    val (mine, rest) = tracked.partition(_._1 == key)
    mine.foreach(_._2.unpersist(blocking = false))
    tracked.clear()
    tracked ++= rest
  }

  /** Frames currently tracked (spec hook). */
  def size: Int = synchronized(tracked.size)

  implicit final class Tracked[T](private val ds: Dataset[T]) extends AnyVal {
    /** persist() + register for [[CacheRegistry.drain]] under the
      * caller's active [[withKey]] key ("" outside any scope). */
    def persistTracked(): Dataset[T] = {
      ds.persist()
      CacheRegistry.synchronized(tracked += currentKey.get -> ds)
      ds
    }
  }
}
