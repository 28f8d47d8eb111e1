package graft.operators

import org.apache.spark.sql.SparkSession

/** Per-(session, key) memo for expensive lineage-truncated relations
  * that several queries share (TextPack.bpeChain's pattern, reusable):
  * the builder runs once per session per key; an applicationEnd listener
  * clears a stopped session's entries so checkpoint-backed DataFrames of
  * dead sessions are not retained.
  *
  * Staleness contract: assumes the data behind `key` is immutable for
  * the session's lifetime (true for the gate's read-only testdata);
  * call [[invalidate]] if it changes mid-session. */
private[graft] final class SessionMemo[V] {
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()
  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def get(s: SparkSession, key: String)(build: => V): V = {
    arm(s)
    memo.computeIfAbsent((s, key), _ => build)
  }

  /** Drop entries: for one (session, key) when `key` is given, else every
    * entry of the session. */
  def invalidate(s: SparkSession, key: Option[String] = None): Unit = {
    val it = memo.keySet().iterator()
    while (it.hasNext) {
      val k = it.next()
      if (k._1 == s && key.forall(_ == k._2)) it.remove()
    }
    if (key.isEmpty) armed.remove(s)
  }

  private def arm(s: SparkSession): Unit =
    if (armed.add(s)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          invalidate(s)
      })
    }
}
