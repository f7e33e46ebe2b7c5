package graft.merge

/** Driver-side tiered merge planner — the same math as the reference's
  * TieredMergePolicy (/root/reference/src/Lucene.Net.Core/Index/TieredMergePolicy.cs:
  * defaults :79-86 segsPerTier=10 maxMergeAtOnce=10; allowedSegCount budget
  * :452-467; merge scoring :603-637 score = skew * size^0.05 * nonDelRatio^2,
  * lower is better — nonDelRatio is 1.0 here, v1 has no deletes).
  *
  * Sizes are doc counts (our segments store no deletions, and doc count is
  * proportional to bytes for a fixed corpus).
  */
final class TieredMergePolicy(
    val segsPerTier: Double = 10.0,
    val maxMergeAtOnce: Int = 10,
    val floorSegmentDocs: Long = 1000L) {

  final case class Merge(sources: List[Int])

  private def floored(size: Long): Double = math.max(size.toDouble, floorSegmentDocs.toDouble)

  /** One round of merge selection over (segmentId -> numDocs). */
  def findMerges(segments: Map[Int, Long]): List[Merge] = {
    if (segments.size < 2) return Nil
    val totalSize = segments.values.map(floored).sum

    // allowed segment budget: levels of segsPerTier segments, each tier
    // maxMergeAtOnce times larger (TieredMergePolicy.cs:452-467)
    var levelSize = math.max(segments.values.map(floored).min, floorSegmentDocs.toDouble)
    var remaining = totalSize
    var allowed = 0.0
    var cont = true
    while (cont) {
      val segCountLevel = remaining / levelSize
      if (segCountLevel < segsPerTier) {
        allowed += math.ceil(segCountLevel)
        cont = false
      } else {
        allowed += segsPerTier
        remaining -= segsPerTier * levelSize
        levelSize *= maxMergeAtOnce
      }
    }

    if (segments.size <= allowed) return Nil

    // candidate selection: sort by size desc (Lucene sorts segments by size),
    // slide a window of up to maxMergeAtOnce smallest-skew candidates
    val sorted = segments.toList.sortBy { case (id, n) => (-n, id) }
    val eligible = sorted
    var best: Option[(Double, List[Int])] = None
    var i = math.max(0, eligible.size - maxMergeAtOnce * 2)
    while (i <= eligible.size - 2) {
      val window = eligible.slice(i, math.min(i + maxMergeAtOnce, eligible.size))
      if (window.size >= 2) {
        val sizes = window.map(w => floored(w._2))
        val total = sizes.sum
        val skew = sizes.max / total // TieredMergePolicy.cs:613 approximation
        val score = skew * math.pow(total, 0.05)
        if (best.isEmpty || score < best.get._1) best = Some((score, window.map(_._1)))
      }
      i += 1
    }
    best.map(b => Merge(b._2.sorted)).toList
  }

  /** Repeated rounds until the index satisfies the budget. */
  def plan(segments: Map[Int, Long]): List[Merge] = {
    var cur = segments
    val out = scala.collection.mutable.ListBuffer.empty[Merge]
    var rounds = 0
    var found = true
    while (found && rounds < 64) {
      findMerges(cur) match {
        case m :: _ =>
          out += m
          val mergedSize = m.sources.map(cur).sum
          cur = cur -- m.sources + (m.sources.min -> mergedSize)
          rounds += 1
        case Nil => found = false
      }
    }
    out.toList
  }
}
