package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

import java.util.concurrent.ConcurrentHashMap

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
/** Weak session identity: a stable UUID per SparkSession, held through
  * a WeakHashMap so process-global caches can key by plain strings and
  * never pin a session against collection. Shared by every cache that
  * outlives sessions (DML registry, trained ANN codebooks). */
private[graft] object SessionIds {
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  def idOf(spark: SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)
}

object Memo {
  private val cache = new ConcurrentHashMap[(SparkSession, String), DataFrame]()

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
    val k = (spark, key)
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
  def release(spark: SparkSession): Unit = {
    val it = cache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq spark) {
        e.getValue.unpersist(blocking = false)
        it.remove()
      }
    }
  }
}
