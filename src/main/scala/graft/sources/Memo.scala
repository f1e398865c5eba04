package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import java.util.concurrent.ConcurrentHashMap

/** Weak session identity: a stable UUID per SparkSession, held through
  * a WeakHashMap so process-global caches can key by plain strings and
  * never pin a session against collection. Shared by every cache that
  * outlives sessions: the DML registry ([[LakehouseRegistry]]), the
  * trained ANN codebooks (graft.operators.Similarity), and [[Memo]].
  *
  * Caches register a [[SessionIds.onRelease]] callback and drop their
  * entries for an id when [[SessionIds.release]] runs — the
  * deterministic release path for long-lived drivers churning
  * sessions. (String-keyed leftovers are tiny driver-side artifacts,
  * so even an unreleased id never pins executors or cached plans.) */
private[graft] object SessionIds {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private val releaseHooks =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]()

  def idOf(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  /** Register a per-cache cleanup, invoked with the session id on
    * [[release]]. */
  def onRelease(hook: String => Unit): Unit = releaseHooks.add(hook)

  /** Drop every registered cache's entries for `spark`. */
  def release(spark: SparkSession): Unit = {
    val id = idOf(spark)
    releaseHooks.forEach(h => h(id))
  }
}

/** Session-scoped memo of persisted derived relations.
  *
  * Several operator families share expensive derived bases (dup
  * groups, hashed shingle postings, quantized vectors). Calling
  * `persist()` inside each builder per invocation registered a fresh
  * cache handle every call — repeated queries re-registered the same
  * canonical plan ("Asked to cache already cached data" warnings) and
  * handles accumulated for the driver's lifetime. This memo hands all
  * callers ONE persisted DataFrame per (session, key), so the cache is
  * registered once and releasable deterministically.
  *
  * At 100 TB the same role is a materialized intermediate table; the
  * memo is the local-session analog of writing it once and reading it
  * everywhere.
  */
object Memo {
  // keyed by weak session id ([[SessionIds]]) — the map itself never
  // pins a session; the persisted DataFrames DO reference theirs, so
  // release(spark) remains the deterministic cleanup
  private val cache = new ConcurrentHashMap[(String, String), DataFrame]()
  SessionIds.onRelease(releaseId)

  /** Build-once persisted relation for `key` within `spark`'s lifetime.
    *
    * CONTRACT: the data under any directory baked into `key` is
    * immutable for the session (the testdata layout and lakehouse
    * data dirs both are). Rewriting a memoized dir in-session serves
    * stale results — call [[release]] first (DedupSpec's rewrite test
    * does exactly that).
    *
    * get-then-putIfAbsent rather than `computeIfAbsent`: builders
    * legitimately memoize their own upstream bases (prefix postings →
    * postings → dup groups), and a nested `computeIfAbsent` on the
    * same map throws "Recursive update" whenever the two keys land in
    * the same bin. The race cost is bounded: a losing concurrent
    * builder unpersists its duplicate and adopts the winner's. */
  def persisted(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val k = (SessionIds.idOf(spark), key)
    val existing = cache.get(k)
    if (existing != null) existing
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = cache.putIfAbsent(k, built)
      if (prev != null) { built.unpersist(blocking = false); prev } else built
    }
  }

  /** Unpersist and forget every relation memoized under `spark` —
    * call when a long-lived driver is done with a scale-factor dir. */
  def release(spark: SparkSession): Unit = releaseId(SessionIds.idOf(spark))

  private def releaseId(id: String): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 == id) {
        e.getValue.unpersist(blocking = false)
        it.remove()
      }
    }
  }
}
