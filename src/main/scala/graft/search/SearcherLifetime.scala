package graft.search

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** SearcherLifetimeManager analog (/root/reference/src/Lucene.Net.Core/
  * Search/SearcherLifetimeManager.cs): keep the searcher a user's FIRST
  * page ran against so follow-up pages (searchAfter, drill-down) see the
  * SAME index point even while SearcherManager rolls the current one
  * forward. `record` returns a version token to stash in the session;
  * `acquire(token)` returns that exact searcher (or None once pruned);
  * `prune(PruneByAge(sec))` drops old versions, never the newest
  * (Record/Acquire/Prune per the reference's API, .cs:162-266).
  *
  * Pinning contract: a Searcher snapshots its file listing at lazy plan
  * init, and merge cleanup defers data-file deletion by one commit (the
  * tombstone grace window) — so a recorded searcher stays valid across the
  * refresh that replaced it plus one subsequent merge commit. The reference
  * gets an unbounded window from its IndexDeletionPolicy; ours is the
  * documented grace bound — prune at least as often as you merge.
  */
final class SearcherLifetimeManager(clock: () => Long = () => System.nanoTime()) {

  private final case class Entry(searcher: Searcher, recordedAtNanos: Long, version: Long)

  private val records = new ConcurrentHashMap[Long, Entry]()
  private val nextVersion = new AtomicLong(0L)
  // identity -> version, so re-recording the same searcher instance returns
  // the same token (the reference keys by reader version)
  private val byInstance = new ConcurrentHashMap[Searcher, java.lang.Long]()

  /** Record the searcher of the CURRENT request; returns the token for
    * follow-up requests. Re-recording the same instance is idempotent. */
  def record(searcher: Searcher): Long = {
    val existing = byInstance.get(searcher)
    if (existing != null) return existing.longValue()
    val v = nextVersion.incrementAndGet()
    val prior = byInstance.putIfAbsent(searcher, java.lang.Long.valueOf(v))
    if (prior != null) return prior.longValue()
    records.put(v, Entry(searcher, clock(), v))
    v
  }

  /** The searcher the token was recorded against, if not yet pruned. */
  def acquire(version: Long): Option[Searcher] =
    Option(records.get(version)).map(_.searcher)

  /** Pruner contract (SearcherLifetimeManager.Pruner): given the age in
    * seconds and the searcher, true = drop. */
  type Pruner = (Double, Searcher) => Boolean

  /** PruneByAge (.cs:244-266): drop searchers older than `maxAgeSec`,
    * EXCEPT the newest one (the reference keeps ordinal 0 regardless). */
  def pruneByAge(maxAgeSec: Double): Pruner = {
    require(maxAgeSec >= 0, "maxAgeSec must be >= 0")
    (age, _) => age > maxAgeSec
  }

  /** Apply the pruner to every record except the newest (descending-version
    * walk, newest skipped — SearcherLifetimeManager.Prune keeps the first). */
  def prune(pruner: Pruner): Int = {
    val now = clock()
    val versions = records.keySet().toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted.reverse
    var dropped = 0
    versions.drop(1).foreach { v =>
      val e = records.get(v)
      if (e != null && pruner((now - e.recordedAtNanos) / 1e9, e.searcher)) {
        records.remove(v)
        byInstance.remove(e.searcher)
        dropped += 1
      }
    }
    dropped
  }

  def size: Int = records.size()
}
