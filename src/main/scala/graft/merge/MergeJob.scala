package graft.merge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.build.IndexBuilder
import graft.codec.PostingsCodec
import graft.model._

/** Segment merge — the SegmentMerger analog
  * (/root/reference/src/Lucene.Net.Core/Index/SegmentMerger.cs:89-162 —
  * concatenate doc stores with docID rebasing; k-way sort-merge of postings
  * summing df/ttf; remap via MergeDocIDRemapper).
  *
  * Spark shape, sized for 100 TB:
  *  1. map-side REBASE (narrow, fully parallel): every source posting row is
  *     re-encoded with docIds + docBase — no shuffle, no giant lists;
  *  2. term shuffle of the *encoded, compressed* pieces only (orders of
  *     magnitude smaller than raw postings);
  *  3. per-term stitch: cold terms decode+re-encode into one row; terms with
  *     df > hotTermDf stay as multiple piece-rows (disjoint docId ranges) —
  *     the query path handles split posting rows transparently, so no single
  *     reducer ever materializes a stopword-scale posting list. This is the
  *     salted-hot-term handling of SURVEY.md §7.3 realized structurally.
  *
  * Commit protocol (the segments_N two-phase-commit analog): the merged
  * segment gets a FRESH id, staged data renames in while readers still see
  * only the old stats generation, and ONE atomic directory rename of
  * `stats_gN` flips visibility of docs+postings+stats together; source dirs
  * are deleted afterwards as unobservable cleanup. Readers resolve the
  * highest stats generation and filter all data reads to its segment set,
  * so a crash at any point leaves either the old or the new committed view.
  *
  * Segment ids (and thus global tie-break order) change across a merge
  * exactly as Lucene's ephemeral docIDs do — scores are invariant (BM25
  * depends only on global stats, tf and length).
  */
object MergeJob {

  final case class PieceRow(field: String, term: String, piece: Int, firstDoc: Int,
                            df: Int, ttf: Long,
                            docDeltas: Array[Byte], tfs: Array[Byte],
                            positions: Array[Byte], lens: Array[Byte],
                            skips: Array[SkipRow], payloads: Array[Byte],
                            offsets: Array[Byte])

  /** Merge `sources` into a FRESH segment id (max live id + 1) — fully
    * disjoint from every source, so staged data renames IN before anything
    * is deleted. Visibility is gated on the stats-generation flip (one
    * atomic directory rename covering docs+postings+stats — the segments_N
    * analog); source-dir deletion afterwards is mere cleanup that readers
    * can no longer observe. Returns the new segment id.
    */
  /** Broadcast budget for SORTED merges: up to this many source docs the
    * (sortKey, url)-ordered docId permutation is collected to the driver and
    * broadcast as per-segment arrays (like the reference's Sorter, which
    * builds the full old->new docId map in RAM —
    * Lucene.Net.Misc/Index/Sorter/Sorter.cs; ~4M docs ≈ 16 MB of ints).
    * Above it the merge switches to the fully distributed remap: the
    * permutation becomes a TABLE (two-pass rank, no driver collect), the doc
    * store/vectors rebase by join, and postings rebuild via explode → join →
    * (field, term) shuffle → streaming re-encode with bounded piece rows —
    * no single buffer anywhere scales with the merge size. */
  val SortedMergeMaxDocs: Int = 1 << 22

  /** Max posting entries per encoded piece row on the distributed sorted
    * path: a stopword-scale term becomes many rows with disjoint increasing
    * docId ranges (the query path already serves split rows) instead of one
    * reducer-sized buffer. */
  val SortedMergePieceEntries: Int = 1 << 20

  def merge(spark: SparkSession, indexPath: String, sources: List[Int],
            hotTermDf: Int = 5000000,
            sortedPermBroadcastMax: Int = SortedMergeMaxDocs,
            sortedPieceEntries: Int = SortedMergePieceEntries): Int = {
    import spark.implicits._
    require(sources.size >= 2)
    // index-sorted index: the merge must RE-SORT (SortingMergePolicy.cs) —
    // docIds of the merged segment are assigned in (sortKey, url) order via
    // a driver-built permutation, budget-bounded by SortedMergeMaxDocs
    val sortedMerge: Boolean =
      (try IndexBuilder.readConfig(spark, indexPath).indexSort
       catch { case _: Exception => None }).isDefined
    val srcSorted = sources.sorted

    // grace window (IndexDeletionPolicy keep-last-commit analog): data made
    // unreachable by the PREVIOUS merge is physically deleted only now, so
    // readers that resolved the previous generation finish their lazy reads
    purgeTombstones(spark, indexPath)

    val statsAll = spark.read.parquet(IndexBuilder.statsPath(spark, indexPath))
      .dropDuplicates("segmentId", "field")
      .as[SegmentStats].collect()
    // dictionary freshness from the stats just collected (the marker check
    // needs only the signature — no second stats-table read)
    val dictWasValid = graft.build.DictTable.readMarker(spark, indexPath)
      .contains(graft.build.DictTable.segsSignatureOf(statsAll.toSeq))
    // fresh id from the MERGE band (2^30+): disjoint from every source AND
    // from any future batch/streaming segment id (their bands are below)
    val mergeBand = statsAll.map(_.segmentId).filter(_ >= IndexBuilder.MergeIdOffset)
    val target =
      if (mergeBand.isEmpty) IndexBuilder.MergeIdOffset else mergeBand.max + 1
    // segment-wide maxDoc from the default field's rows (present per segment)
    val stats = statsAll.filter(_.field == IndexBuilder.DefaultField)
      .map(s => s.segmentId -> s).toMap

    // sorted merges above the broadcast budget take the fully distributed
    // remap path — gated on source maxDoc (bounds BOTH the driver collect
    // and the per-segment permutation arrays, independent of delete volume)
    val totalMaxDoc: Long = srcSorted.map(s => stats(s).maxDoc).sum
    if (sortedMerge && totalMaxDoc > sortedPermBroadcastMax)
      return mergeSortedDistributed(spark, indexPath, srcSorted, target,
        statsAll, dictWasValid, sortedPieceEntries)

    // deleted docs of the source segments are PURGED here (docIds compact,
    // stats recomputed) — Lucene's merge applies live docs and remaps via
    // MergeDocIDRemapper, Index/SegmentMerger.cs:89. The collect is scoped
    // to the merge's own sources, so it is bounded by the merge fan-in
    // (maxMergeAtOnce segments), never by the index-wide delete volume.
    val deleted: Map[Int, Array[Int]] =
      graft.build.Deletes.deletedDocIds(spark, indexPath, Some(srcSorted.toSet))
    val bases: Map[Int, Int] = {
      var acc = 0
      srcSorted.map { s =>
        val b = s -> acc
        acc += stats(s).maxDoc.toInt - deleted.get(s).map(_.length).getOrElse(0)
        b
      }.toMap
    }
    val basesB = spark.sparkContext.broadcast(bases)
    val deletedB = spark.sparkContext.broadcast(deleted)

    // live docId -> merged docId; -1 for deleted.
    //  - unsorted: compaction by segment base (append order, narrow math)
    //  - sorted: the Sorter.cs permutation — live docs ordered globally by
    //    (sortKey, url), ids assigned by rank, broadcast as per-seg arrays
    val remapFn: (Int, Int) => Int =
      if (!sortedMerge) (seg: Int, docId: Int) => {
        val del = deletedB.value.getOrElse(seg, Array.empty[Int])
        if (del.isEmpty) basesB.value(seg) + docId
        else {
          val idx = java.util.Arrays.binarySearch(del, docId)
          if (idx >= 0) -1
          else basesB.value(seg) + docId - (-idx - 1) // minus #deleted below
        }
      } else {
        val ordered: Array[(Int, Int)] = spark.read
          .parquet(IndexBuilder.docsPath(indexPath))
          .filter(col("segmentId").isInCollection(srcSorted))
          .select(col("segmentId"), col("docId"), col("sortKey"), col("url"))
          .orderBy(col("sortKey").asc, col("url").asc)
          .as[(Int, Int, Double, String)]
          .map(r => (r._1, r._2))
          .collect()
        // <= totalMaxDoc <= sortedPermBroadcastMax by the gate above
        val perm: Map[Int, Array[Int]] =
          srcSorted.map(s => s -> Array.fill(stats(s).maxDoc.toInt)(-1)).toMap
        var rank = 0
        ordered.foreach { case (s, d) =>
          if (deleted.get(s).forall(del => java.util.Arrays.binarySearch(del, d) < 0)) {
            perm(s)(d) = rank
            rank += 1
          }
        }
        val permB = spark.sparkContext.broadcast(perm)
        (seg: Int, docId: Int) => permB.value(seg)(docId)
      }

    val staging = s"$indexPath/.staging/merge_$target"

    // ---- docs: narrow rebase of the doc store (MergeDocIDRemapper analog);
    // sorted indexes carry the sortKey column through so the merged segment
    // stays early-termination-servable
    if (!sortedMerge) {
      spark.read.parquet(IndexBuilder.docsPath(indexPath))
        .filter(col("segmentId").isInCollection(srcSorted))
        .as[DocRow]
        .flatMap { d =>
          val nid = remapFn(d.segmentId, d.docId)
          if (nid < 0) None else Some((nid, d.url, d.fieldLen, d.normByte))
        }
        .toDF("docId", "url", "fieldLen", "normByte")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/docs")
    } else {
      spark.read.parquet(IndexBuilder.docsPath(indexPath))
        .filter(col("segmentId").isInCollection(srcSorted))
        .select(col("segmentId"), col("docId"), col("url"),
          col("fieldLen"), col("normByte"), col("sortKey"))
        .as[(Int, Int, String, Int, Byte, Double)]
        .flatMap { case (seg, d, url, len, nb, key) =>
          val nid = remapFn(seg, d)
          if (nid < 0) None else Some((nid, url, len, nb, key))
        }
        .toDF("docId", "url", "fieldLen", "normByte", "sortKey")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/docs")
    }

    // ---- term vectors (when present): same narrow rebase as the doc store
    // — purged docs drop, surviving docIds compact (Lucene40TermVectorsWriter
    // merge path rides the same MergeDocIDRemapper as stored fields)
    val hasVectors = graft.build.TermVectors.enabled(spark, indexPath)
    if (hasVectors) {
      spark.read.parquet(graft.build.TermVectors.vectorsPath(indexPath))
        .filter(col("segmentId").isInCollection(srcSorted))
        .as[graft.model.VectorRow]
        .flatMap { v =>
          val nid = remapFn(v.segmentId, v.docId)
          if (nid < 0) None
          else Some((nid, v.field, v.term, v.tf, v.positions, v.starts, v.ends))
        }
        .toDF("docId", "field", "term", "tf", "positions", "starts", "ends")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    }

    // ---- postings phase 1: narrow rebase (+ purge) + piece tagging
    val pieces: Dataset[PieceRow] = spark.read
      .parquet(IndexBuilder.postingsPath(indexPath))
      .filter(col("segmentId").isInCollection(srcSorted))
      .transform(IndexBuilder.withPayloadsCol)
      .select("segmentId", "field", "term", "df", "ttf", "docDeltas", "tfs", "positions", "lens", "skips", "payloads", "offsets")
      .as[PostingRow]
      .flatMap { p =>
        val seg = p.segmentId
        val (e, firstDoc) = reencode(p.df, p.docDeltas, p.tfs, p.positions, p.lens,
          p.payloads, p.offsets, (d: Int) => remapFn(seg, d))
        if (e.df == 0) None // every doc of this piece was deleted
        else Some(PieceRow(p.field, p.term, p.segmentId, firstDoc, e.df, e.ttf,
          e.docDeltas, e.tfs, e.positions, e.lens,
          e.skips.map(s => SkipRow(s.lastDoc, s.docOff, s.tfOff, s.posOff, s.cumDocs, s.maxTf, s.minLen)),
          e.payloads, e.offsets))
      }

    // ---- phase 2: shuffle compressed pieces by (field, term), stitch per key
    // sort key includes firstDoc: a source segment may hold several pieces
    // per key (builder RAM flushes / prior merges share one segmentId), and
    // stitching must follow docId order, not source order alone
    val sortedMergeFlag = sortedMerge // plain boolean for the task closure
    val merged: Dataset[PostingRow] = pieces
      .repartition(col("field"), col("term"))
      .sortWithinPartitions(col("field"), col("term"), col("firstDoc"))
      .mapPartitions { rows =>
        val hot = hotTermDf
        val isSorted = sortedMergeFlag
        new Iterator[PostingRow] {
          private var pending: PieceRow = if (rows.hasNext) rows.next() else null
          private val out = scala.collection.mutable.Queue.empty[PostingRow]
          private def fill(): Unit = {
            while (out.isEmpty && pending != null) {
              val field = pending.field
              val term = pending.term
              val group = scala.collection.mutable.ArrayBuffer.empty[PieceRow]
              while (pending != null && pending.field == field && pending.term == term) {
                group += pending
                pending = if (rows.hasNext) rows.next() else null
              }
              val totalDf = group.map(_.df.toLong).sum
              // a SORTED merge's pieces interleave in the new docId space
              // (the permutation shuffles ranks across sources), so the
              // disjoint-range hot-term shortcut is only sound unsorted
              if (group.size == 1 || (!isSorted && totalDf > hot)) {
                // hot term (or single piece): pieces stay separate rows with
                // disjoint (or piece-internal sorted) docId ranges
                group.foreach { g =>
                  out += PostingRow(0, field, term, g.df, g.ttf, g.docDeltas, g.tfs,
                    g.positions, g.lens, g.skips, g.payloads, g.offsets)
                }
              } else {
                // gather every surviving entry, restore global docId order
                // if pieces interleave, then encode one stitched row
                val entries = scala.collection.mutable.ArrayBuffer
                  .empty[(Int, Int, Array[Int], Int, Array[Array[Byte]], Array[Int])]
                group.foreach { g =>
                  val d = PostingsCodec.decode(g.df, g.docDeltas, g.tfs, g.positions, g.lens)
                  val pays = payloadSlices(d.tfs, d.posStart, g.payloads)
                  val offs = if (g.offsets == null) null
                    else PostingsCodec.decodeOffsets(d.tfs, g.offsets)
                  var i = 0
                  while (i < d.docIds.length) {
                    val ps = java.util.Arrays.copyOfRange(d.posFlat, d.posStart(i), d.posStart(i + 1))
                    val pl = if (pays == null) null
                      else java.util.Arrays.copyOfRange(pays, d.posStart(i), d.posStart(i + 1))
                    val of = if (offs == null) null
                      else flatOffsets(offs._1, offs._2, d.posStart(i), d.posStart(i + 1))
                    entries += ((d.docIds(i), d.tfs(i), ps, d.lens(i), pl, of))
                    i += 1
                  }
                }
                val orderedEntries = if (isSorted) entries.sortBy(_._1) else entries
                val enc = new PostingsCodec.Encoder
                orderedEntries.foreach { case (id, tf, ps, len, pl, of) =>
                  enc.add(id, tf, ps, len, pl, of)
                }
                val e = enc.finish()
                out += PostingRow(0, field, term, e.df, e.ttf, e.docDeltas, e.tfs, e.positions, e.lens,
                  e.skips.map(s => SkipRow(s.lastDoc, s.docOff, s.tfOff, s.posOff, s.cumDocs, s.maxTf, s.minLen)),
                  e.payloads, e.offsets)
              }
            }
          }
          override def hasNext: Boolean = { fill(); out.nonEmpty }
          override def next(): PostingRow = { fill(); out.dequeue() }
        }
      }

    merged.toDF().drop("segmentId")
      .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")

    // ---- bring the staged merged data in under the FRESH id: nothing is
    // deleted yet, and readers ignore it (not in the committed stats)
    renameStaged(spark, indexPath, staging, target, hasVectors)

    // deletes that raced in against the source segments AFTER the snapshot
    // above survived the merge un-purged; remap their markers to the merged
    // segment's ids so the delete is not lost when the source markers prune
    // (the snapshot itself is what the merge physically applied)
    def lateMarkers(): Seq[(Int, Int)] =
      graft.build.Deletes.deletedDocIds(spark, indexPath, Some(srcSorted.toSet))
        .toSeq.flatMap { case (seg, arr) =>
          val applied = deleted.getOrElse(seg, Array.empty[Int])
          arr.filter(d => java.util.Arrays.binarySearch(applied, d) < 0)
            .flatMap { d =>
              val nid = remapFn(seg, d)
              if (nid >= 0) Some((target, nid)) else None
            }
        }

    commitMerged(spark, indexPath, srcSorted, target, statsAll, hasVectors,
      dictWasValid, anyPurged = deleted.nonEmpty, lateMarkers = lateMarkers _)
    target
  }

  /** Rename the staged merged data in under the target segment id (readers
    * still ignore it — not in the committed stats generation). */
  private def renameStaged(spark: SparkSession, indexPath: String,
                           staging: String, target: Int, hasVectors: Boolean): Unit = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    def renameIn(base: String, staged: String): Unit = {
      val fs = new Path(base).getFileSystem(hadoopConf)
      val dst = new Path(s"$base/segmentId=$target")
      // a retry after a crash between the data renames and the stats flip
      // recomputes the SAME target: clear the (invisible) orphan first so
      // rename cannot nest into it (HDFS) or fail (local FS)
      if (fs.exists(dst)) fs.delete(dst, true)
      fs.mkdirs(dst.getParent)
      val ok = fs.rename(new Path(staged), dst)
      require(ok, s"rename $staged -> $dst failed")
    }
    renameIn(IndexBuilder.docsPath(indexPath), s"$staging/docs")
    renameIn(IndexBuilder.postingsPath(indexPath), s"$staging/postings")
    if (hasVectors)
      renameIn(graft.build.TermVectors.vectorsPath(indexPath), s"$staging/vectors")
    // fs-level renames bypass DataFrameWriter's automatic cache refresh:
    // evict stale file listings for the swapped paths
    spark.catalog.refreshByPath(IndexBuilder.docsPath(indexPath))
    spark.catalog.refreshByPath(IndexBuilder.postingsPath(indexPath))
    if (hasVectors)
      spark.catalog.refreshByPath(graft.build.TermVectors.vectorsPath(indexPath))
  }

  /** Shared commit tail of both merge paths: recompute the merged segment's
    * stats, flip the stats generation (THE commit), tombstone the superseded
    * data, carry raced-in deletes forward, refresh the dictionary. */
  private def commitMerged(spark: SparkSession, indexPath: String,
                           srcSorted: List[Int], target: Int,
                           statsAll: Array[SegmentStats], hasVectors: Boolean,
                           dictWasValid: Boolean, anyPurged: Boolean,
                           lateMarkers: () => Seq[(Int, Int)],
                           /** (maxDoc, default-field sttf) of the merged
                             * segment when the caller already aggregated
                             * them (off its pinned sort) — skips the
                             * re-read of the written doc store. */
                           docStats: Option[(Long, Long)] = None): Unit = {
    import spark.implicits._
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    // ---- merged stats, recomputed from the merged segment's own data so
    // purged deletes decrement maxDoc/sumTotalTermFreq exactly like a
    // reference merge
    val postStats: Map[String, (Long, Long)] = spark.read
      .parquet(IndexBuilder.postingsPath(indexPath))
      .filter(col("segmentId") === target)
      .groupBy("field").agg(count(lit(1)).as("rows"), sum("ttf").as("sttf"))
      .as[(String, Long, Long)].collect()
      .map { case (f, r, s) => f -> (r, s) }.toMap
    val (mergedMaxDoc, mergedDefaultSttf) = docStats.getOrElse(spark.read
      .parquet(IndexBuilder.docsPath(indexPath))
      .filter(col("segmentId") === target)
      .agg(count(lit(1)), coalesce(sum("fieldLen"), lit(0L)))
      .as[(Long, Long)].first())
    val srcFields = statsAll.filter(s => srcSorted.contains(s.segmentId)).map(_.field).distinct
    val mergedStats = srcFields.map { f =>
      val (rows, sttf) = postStats.getOrElse(f, (0L, 0L))
      SegmentStats(target, f, mergedMaxDoc,
        if (f == IndexBuilder.DefaultField) mergedDefaultSttf else sttf,
        rows)
    }
    // RE-READ the live stats at commit time (not the snapshot from merge
    // start): segments appended concurrently by writeSegments carry forward
    // into the new generation instead of silently dropping out of the live
    // set (writeSegments has the matching re-append check on its side).
    val statsNow = spark.read.parquet(IndexBuilder.statsPath(spark, indexPath))
      .dropDuplicates("segmentId", "field")
      .as[SegmentStats].collect()
    val newStats = statsNow.filterNot(s => srcSorted.contains(s.segmentId)) ++ mergedStats

    // ---- THE COMMIT (object-store-safe segments_N protocol): the merged
    // stats generation is written as an ordinary parquet directory that
    // readers IGNORE (no pointer yet), then published by creating ONE small
    // pointer file — a single-object PUT, atomic on every store, where the
    // previous directory-rename commit was a non-atomic copy+delete on
    // object stores (a reader listing mid-rename could see a partial
    // generation). Max-generation pointer discovery is the
    // SegmentInfos.GetLastCommitGeneration analog (SegmentInfos.cs:49-69).
    val fs = new Path(indexPath).getFileSystem(hadoopConf)
    val curGen = IndexBuilder.statsGen(spark, indexPath)
    // migration pointer for pre-pointer indexes: publish the CURRENT
    // generation first, so the legacy dir-listing fallback can never
    // resolve the new (not-yet-committed) stats directory written below
    if (!fs.exists(new Path(s"${IndexBuilder.commitsPath(indexPath)}/segments_$curGen")))
      IndexBuilder.commitPointer(spark, indexPath, curGen,
        IndexBuilder.statsDirOf(spark, indexPath, curGen))
    val newGen = curGen + 1
    val newDir = IndexBuilder.statsDirName(newGen)
    spark.createDataset(newStats.toSeq).repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$indexPath/$newDir")
    IndexBuilder.commitPointer(spark, indexPath, newGen, newDir) // THE commit
    spark.catalog.refreshByPath(s"$indexPath/$newDir")

    // ---- cleanup, DEFERRED one commit (the reference keeps old commits
    // alive via IndexDeletionPolicy until readers release them): the source
    // segment dirs and superseded stats generations are unreachable through
    // the new commit but still readable by a Searcher opened against the
    // previous one — record them as tombstones; the NEXT merge (or an
    // explicit purgeTombstones) physically deletes them.
    val doomed =
      srcSorted.flatMap { s =>
        Seq(s"${IndexBuilder.docsPath(indexPath)}/segmentId=$s",
          s"${IndexBuilder.postingsPath(indexPath)}/segmentId=$s") ++
          (if (hasVectors)
            Seq(s"${graft.build.TermVectors.vectorsPath(indexPath)}/segmentId=$s")
          else Nil)
      } ++ (0L until newGen).flatMap(g =>
        // superseded stats dirs (pointer-resolved name) AND their pointer
        // files — keep-last-commit: only the new generation survives a purge
        Seq(s"$indexPath/${IndexBuilder.statsDirOf(spark, indexPath, g)}",
          s"${IndexBuilder.commitsPath(indexPath)}/segments_$g"))
    writeTombstone(fs, indexPath, newGen, doomed)
    spark.catalog.refreshByPath(IndexBuilder.docsPath(indexPath))
    spark.catalog.refreshByPath(IndexBuilder.postingsPath(indexPath))

    val late = lateMarkers()
    graft.build.Deletes.appendMarkers(spark, indexPath, late)

    // drop delete markers whose docs were just purged (liveDocs lifecycle)
    if (anyPurged || late.nonEmpty)
      graft.build.Deletes.pruneApplied(spark, indexPath)

    // global df/ttf are invariant under merge WHEN nothing was purged: if the
    // dictionary was fresh before, re-stamp it; a purging merge changes df,
    // so the dictionary goes stale and readers fall back to postings scans
    // until the next refresh. The marker signature comes from the newStats
    // rows just committed — no extra stats-table read.
    if (dictWasValid && !anyPurged) {
      graft.build.DictTable.writeMarker(spark, indexPath,
        graft.build.DictTable.segsSignatureOf(newStats.toSeq))
    } else if (anyPurged && dictWasValid) {
      graft.build.DictTable.write(spark, indexPath)
    }
  }

  /** One exploded posting entry on the distributed sorted-merge path.
    * `payload` is the entry's positions' framed payload bytes (VByte(len) +
    * bytes per position; null when the source list carries no payloads). */
  final case class SortedEntryRow(field: String, term: String, segmentId: Int,
                                  docId: Int, tf: Int, positions: Array[Int],
                                  fieldLen: Int, payload: Array[Byte],
                                  /** Flat [s0,e0,...] character offsets for
                                    * the entry's tf positions (null when the
                                    * index carries no offset stream). */
                                  offsets: Array[Int])

  /** Fully distributed sorted merge — the scale path above
    * [[SortedMergeMaxDocs]]. The Sorter.cs permutation becomes a TABLE built
    * with the two-pass distributed rank (no driver collect, no per-segment
    * arrays); the doc store and term vectors rebase by join; postings
    * rebuild via explode → permutation join → (field, term) shuffle →
    * streaming re-encode that emits a piece row every
    * [[SortedMergePieceEntries]] entries. Nothing on this path buffers more
    * than one encoded piece per task, so a 10^9-doc sorted merge is bounded
    * by cluster disk, not driver or reducer RAM. Costs two extra shuffles
    * over the posting ENTRIES (vs the compressed-piece shuffle of the
    * unsorted path) — inherent: a sorted merge is a global reorder, i.e. a
    * rebuild of the merged segment in permuted order.
    */
  private def mergeSortedDistributed(spark: SparkSession, indexPath: String,
                                     srcSorted: List[Int], target: Int,
                                     statsAll: Array[SegmentStats],
                                     dictWasValid: Boolean,
                                     pieceEntries: Int): Int = {
    import spark.implicits._
    val staging = s"$indexPath/.staging/merge_$target"

    // snapshot the resolved markers this merge will purge (localCheckpoint
    // pins the snapshot: markers appended during the merge stay out of it
    // and are carried forward as late markers below). With no deletes dir at
    // all the snapshot is a local empty frame — zero jobs.
    val hasDeletes = graft.build.Deletes.exists(spark, indexPath)
    val appliedDf =
      if (!hasDeletes) Seq.empty[(Int, Int)].toDF("segmentId", "docId")
      else graft.build.Deletes.deletedDf(spark, indexPath)
        .filter(col("segmentId").isInCollection(srcSorted))
        .localCheckpoint(true)
    val anyPurged = hasDeletes && !appliedDf.isEmpty

    val docsSrc = spark.read.parquet(IndexBuilder.docsPath(indexPath))
      .filter(col("segmentId").isInCollection(srcSorted))

    // ---- ONE global (sortKey, url) rank with the doc-store payload riding
    // along: appendRank pins the sorted live rows, so the permutation, the
    // merged doc store and the merged doc stats are narrow derivations of a
    // single sort — the old shape wrote the permutation to a staging parquet,
    // read it back, and joined the doc store against it
    val ranked = graft.Ranks.appendRank(
        docsSrc.select("segmentId", "docId", "sortKey", "url", "fieldLen", "normByte")
          .join(appliedDf, Seq("segmentId", "docId"), "left_anti"),
        "rank", Seq(col("sortKey").asc, col("url").asc))
      .withColumn("newId", (col("rank") - 1).cast("int"))
    val permDf = ranked.select("segmentId", "docId", "newId")

    // merged doc-store stats off the pinned sort (commitMerged then skips
    // its re-read of the written doc store)
    val docAgg = ranked.agg(count(lit(1)), coalesce(sum("fieldLen"), lit(0L)))
      .as[(Long, Long)].first()

    // ---- doc store, term vectors and postings are independent given the
    // pinned sort: submit concurrently
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val docsJob = Future {
      ranked
        .select(col("newId").as("docId"), col("url"), col("fieldLen"),
          col("normByte"), col("sortKey"))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/docs")
    }

    // ---- term vectors (when present): join-rebase through the permutation
    val hasVectors = graft.build.TermVectors.enabled(spark, indexPath)
    val vectorsJob = if (!hasVectors) Future.successful(()) else Future {
      spark.read.parquet(graft.build.TermVectors.vectorsPath(indexPath))
        .filter(col("segmentId").isInCollection(srcSorted))
        .join(permDf, Seq("segmentId", "docId"))
        .select(col("newId").as("docId"), col("field"), col("term"),
          col("tf"), col("positions"), col("starts"), col("ends"))
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/vectors")
    }

    // ---- postings: explode to per-(term, doc) entries (deletes purge in
    // the inner permutation join), regroup per (field, term) in newId order,
    // stream-encode bounded pieces
    val entries = spark.read.parquet(IndexBuilder.postingsPath(indexPath))
      .filter(col("segmentId").isInCollection(srcSorted))
      .transform(IndexBuilder.withPayloadsCol)
      .select("segmentId", "field", "term", "df", "ttf", "docDeltas", "tfs",
        "positions", "lens", "skips", "payloads", "offsets")
      .as[PostingRow]
      .flatMap { p =>
        val d = PostingsCodec.decode(p.df, p.docDeltas, p.tfs, p.positions, p.lens)
        val pays = payloadSlices(d.tfs, d.posStart, p.payloads)
        val offs = if (p.offsets == null) null
          else PostingsCodec.decodeOffsets(d.tfs, p.offsets)
        Iterator.tabulate(d.docIds.length) { i =>
          val ps = java.util.Arrays.copyOfRange(d.posFlat, d.posStart(i), d.posStart(i + 1))
          val pl = if (pays == null) null
            else frameEntryPayload(pays, d.posStart(i), d.posStart(i + 1))
          val of = if (offs == null) null
            else flatOffsets(offs._1, offs._2, d.posStart(i), d.posStart(i + 1))
          SortedEntryRow(p.field, p.term, p.segmentId, d.docIds(i), d.tfs(i),
            ps, d.lens(i), pl, of)
        }
      }

    // SALTED shuffle (VERDICT r3 #1): the repartition key carries the
    // newId-range piece bucket alongside (field, term), so a hot term
    // (df ≈ corpus size) spreads its pieces over MANY reducers instead of
    // funnelling through one — the same skew handling the unsorted path
    // gets structurally from its df > hotTermDf piece rows. Soundness:
    // newIds are unique per (field, term), each salt bucket spans one
    // disjoint newId range of width pieceEntries, and the encoder below
    // never lets a piece cross a bucket boundary — so emitted piece rows
    // keep globally disjoint docId ranges, which the read path already
    // serves as first-class split rows.
    val merged: Dataset[PostingRow] = entries.toDF()
      .join(permDf, Seq("segmentId", "docId"))
      .select(col("field"), col("term"), col("newId"), col("tf"),
        col("positions"), col("fieldLen"), col("payload"), col("offsets"))
      .withColumn("salt", (col("newId").cast("long") / pieceEntries).cast("int"))
      .repartition(col("field"), col("term"), col("salt"))
      .sortWithinPartitions(col("field"), col("term"), col("newId"))
      .select(col("field"), col("term"), col("newId"), col("tf"),
        col("positions"), col("fieldLen"), col("payload"), col("offsets"))
      .as[(String, String, Int, Int, Array[Int], Int, Array[Byte], Array[Int])]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[PostingRow] {
          private var nextRow: PostingRow = null
          private def advance(): Unit = {
            if (nextRow != null || !it.hasNext) return
            val field = it.head._1
            val term = it.head._2
            // two salt buckets of one term can hash to the same partition;
            // stopping at the bucket boundary keeps piece ranges disjoint
            val salt = it.head._3 / pieceEntries
            val enc = new PostingsCodec.Encoder
            var n = 0
            while (n < pieceEntries && it.hasNext &&
              it.head._1 == field && it.head._2 == term &&
              it.head._3 / pieceEntries == salt) {
              val e = it.next()
              enc.add(e._3, e._4, e._5, e._6, unframeEntryPayload(e._4, e._7), e._8)
              n += 1
            }
            val enc2 = enc.finish()
            nextRow = PostingRow(0, field, term, enc2.df, enc2.ttf,
              enc2.docDeltas, enc2.tfs, enc2.positions, enc2.lens,
              enc2.skips.map(s => SkipRow(s.lastDoc, s.docOff, s.tfOff,
                s.posOff, s.cumDocs, s.maxTf, s.minLen)),
              enc2.payloads, enc2.offsets)
          }
          override def hasNext: Boolean = { advance(); nextRow != null }
          override def next(): PostingRow = {
            advance(); val r = nextRow; nextRow = null; r
          }
        }
      }
    val postingsJob = Future {
      merged.toDF().drop("segmentId")
        .write.mode(SaveMode.Overwrite).parquet(s"$staging/postings")
    }
    Await.result(docsJob, Duration.Inf)
    Await.result(vectorsJob, Duration.Inf)
    Await.result(postingsJob, Duration.Inf)

    renameStaged(spark, indexPath, staging, target, hasVectors)

    // raced-in deletes = current markers minus the applied snapshot,
    // remapped through the permutation table (their docs survived the purge);
    // with no deletes dir at commit time there is nothing to carry forward
    def lateMarkers(): Seq[(Int, Int)] =
      if (!graft.build.Deletes.exists(spark, indexPath)) Seq.empty
      else graft.build.Deletes.deletedDf(spark, indexPath)
        .filter(col("segmentId").isInCollection(srcSorted))
        .join(appliedDf, Seq("segmentId", "docId"), "left_anti")
        .join(permDf, Seq("segmentId", "docId"))
        .select("newId").as[Int].collect()
        .toSeq.map(n => (target, n))

    commitMerged(spark, indexPath, srcSorted, target, statsAll, hasVectors,
      dictWasValid, anyPurged, lateMarkers _, docStats = Some(docAgg))

    // the permutation table was only needed through the commit
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(staging), true)
    target
  }

  /** Frame positions [from, to)'s payload slices as VByte(len)+bytes each —
    * the per-entry payload carrier of the distributed sorted merge. */
  private def frameEntryPayload(pays: Array[Array[Byte]], from: Int, to: Int): Array[Byte] = {
    val buf = new graft.codec.ByteBuf(16)
    var k = from
    while (k < to) {
      val pl = pays(k)
      if (pl == null) graft.codec.VByte.writeInt(buf, 0)
      else { graft.codec.VByte.writeInt(buf, pl.length); buf.write(pl) }
      k += 1
    }
    buf.toArray
  }

  /** Inverse of [[frameEntryPayload]] for one entry's `tf` positions. */
  private def unframeEntryPayload(tf: Int, bytes: Array[Byte]): Array[Array[Byte]] = {
    if (bytes == null) null
    else {
      val (starts, lens, flat) = PostingsCodec.decodePayloads(tf, bytes)
      Array.tabulate(tf) { k =>
        if (lens(k) == 0) null
        else java.util.Arrays.copyOfRange(flat, starts(k), starts(k) + lens(k))
      }
    }
  }

  private def tombstonesDir(indexPath: String) = s"$indexPath/.tombstones"

  private def writeTombstone(fs: org.apache.hadoop.fs.FileSystem, indexPath: String,
                             gen: Long, paths: Seq[String]): Unit = {
    val dir = new Path(tombstonesDir(indexPath))
    fs.mkdirs(dir)
    val out = fs.create(new Path(dir, s"gen_$gen"), true)
    out.write(paths.mkString("\n").getBytes("UTF-8"))
    out.close()
  }

  /** Physically delete everything tombstoned by earlier merges (idempotent;
    * safe to call any time no reader older than the previous commit is
    * live). Runs automatically at the start of every merge — the one-commit
    * grace window of the keep-last-commit deletion policy.
    */
  def purgeTombstones(spark: SparkSession, indexPath: String): Unit = {
    val fs = new Path(indexPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(tombstonesDir(indexPath))
    if (!fs.exists(dir)) return
    var purged = false
    fs.listStatus(dir).foreach { st =>
      val in = fs.open(st.getPath)
      val paths = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      in.close()
      paths.filter(_.nonEmpty).foreach { p =>
        val pp = new Path(p)
        if (fs.exists(pp)) { fs.delete(pp, true); purged = true }
      }
      fs.delete(st.getPath, false)
    }
    spark.catalog.refreshByPath(IndexBuilder.docsPath(indexPath))
    spark.catalog.refreshByPath(IndexBuilder.postingsPath(indexPath))
    // the purged segments' delete markers were retained through the grace
    // window (readers on the previous commit still needed them); with the
    // dirs gone they can drop too
    if (purged && graft.build.Deletes.exists(spark, indexPath))
      graft.build.Deletes.pruneApplied(spark, indexPath)
  }

  /** Slice the flat decoded offset arrays [from, to) into one entry's
    * [s0,e0,s1,e1,...] carrier. */
  private def flatOffsets(starts: Array[Int], ends: Array[Int],
                          from: Int, to: Int): Array[Int] = {
    val out = new Array[Int]((to - from) * 2)
    var k = from
    while (k < to) {
      out(2 * (k - from)) = starts(k)
      out(2 * (k - from) + 1) = ends(k)
      k += 1
    }
    out
  }

  private def reencode(df: Int, docDeltas: Array[Byte], tfs: Array[Byte],
                       positions: Array[Byte], lens: Array[Byte],
                       payloads: Array[Byte], offsetBytes: Array[Byte],
                       remap: Int => Int): (graft.codec.EncodedPostings, Int) = {
    val d = PostingsCodec.decode(df, docDeltas, tfs, positions, lens)
    val pays = payloadSlices(d.tfs, d.posStart, payloads)
    val offs = if (offsetBytes == null) null
      else PostingsCodec.decodeOffsets(d.tfs, offsetBytes)
    // a sorted-merge permutation is NOT monotonic within a segment, so the
    // surviving entries are gathered and re-sorted by their new docId before
    // encoding (Sorter.cs's SortingLeafReader view does the same reorder)
    val entries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)] // (nid, idx)
    var monotonic = true
    var prev = -1
    var i = 0
    while (i < d.docIds.length) {
      val nid = remap(d.docIds(i))
      if (nid >= 0) { // deleted docs (-1) purge here
        if (nid <= prev) monotonic = false
        prev = nid
        entries += ((nid, i))
      }
      i += 1
    }
    val ordered = if (monotonic) entries else entries.sortBy(_._1)
    val enc = new PostingsCodec.Encoder
    ordered.foreach { case (nid, j) =>
      val ps = java.util.Arrays.copyOfRange(d.posFlat, d.posStart(j), d.posStart(j + 1))
      val pl = if (pays == null) null
        else java.util.Arrays.copyOfRange(pays, d.posStart(j), d.posStart(j + 1))
      val of = if (offs == null) null
        else flatOffsets(offs._1, offs._2, d.posStart(j), d.posStart(j + 1))
      enc.add(nid, d.tfs(j), ps, d.lens(j), pl, of)
    }
    (enc.finish(), ordered.headOption.map(_._1).getOrElse(0))
  }

  /** Per-position payload byte slices aligned with posFlat (null when the
    * list has no payload stream) — merge re-encodes payloads through the
    * same add() path as positions so purge/rebase keep them aligned. */
  private def payloadSlices(tfs: Array[Int], posStart: Array[Int],
                            payloads: Array[Byte]): Array[Array[Byte]] = {
    if (payloads == null) return null
    val total = posStart(tfs.length)
    val (starts, lens, flat) = PostingsCodec.decodePayloads(total, payloads)
    Array.tabulate(total) { k =>
      if (lens(k) == 0) null
      else java.util.Arrays.copyOfRange(flat, starts(k), starts(k) + lens(k))
    }
  }

  /** Run tiered merge rounds until the policy is satisfied. Returns the
    * number of merges executed (merge scheduling: rounds are ordinary Spark
    * jobs chained by the driver — ConcurrentMergeScheduler's thread pool
    * becomes the cluster scheduler).
    */
  def mergeToPolicy(spark: SparkSession, indexPath: String,
                    policy: TieredMergePolicy = new TieredMergePolicy(),
                    sortedPermBroadcastMax: Int = SortedMergeMaxDocs): Int = {
    import spark.implicits._
    var merges = 0
    var cont = true
    while (cont) {
      val sizes = spark.read.parquet(IndexBuilder.statsPath(spark, indexPath))
        .filter(col("field") === IndexBuilder.DefaultField)
        .dropDuplicates("segmentId")
        .as[SegmentStats].collect().map(s => s.segmentId -> s.maxDoc).toMap
      policy.findMerges(sizes) match {
        case m :: _ =>
          merge(spark, indexPath, m.sources,
            sortedPermBroadcastMax = sortedPermBroadcastMax)
          merges += 1
        case Nil => cont = false
      }
    }
    merges
  }

  /** IndexSplitter / MultiPassIndexSplitter analog
    * (/root/reference/src/Lucene.Net.Misc/Index/IndexSplitter.cs,
    * MultiPassIndexSplitter.cs), Spark-native and RE-ANALYSIS-FREE:
    * re-shard a committed index into `parts` segments at `dstPath` — the
    * resharding-for-parallelism maintenance op of a large deployment.
    *
    * Docs route by the builder's own hash
    * (ScalarExpressions.segmentOf(url, parts)) and docIds are assigned in
    * the builder's per-segment (sortKey, url) order, so the OUTPUT is
    * content-identical to a fresh numSegments=parts build of the same live
    * corpus — but produced by decoding + re-encoding the existing postings
    * (one explode -> permutation join -> salted (seg, field, term) shuffle
    * with bounded piece rows, the distributed-merge machinery) instead of
    * re-running tokenization, the expensive stage at 100 TB. Deletes are
    * APPLIED: the split output starts tombstone-free. Term vectors and
    * term blooms regenerate when the source carries them. Single-writer
    * discipline, like merges. Returns the live doc count.
    */
  def splitIndex(spark: SparkSession, srcPath: String, dstPath: String,
                 parts: Int,
                 pieceEntries: Int = SortedMergePieceEntries,
                 /** Doc-store predicate restricting which live docs reach
                   * the output — the PKIndexSplitter seam (see
                   * [[partitionIndex]]); columns of the docs table
                   * (url, fieldLen, ...) are in scope. */
                 docFilter: org.apache.spark.sql.Column = lit(true)): Long = {
    import spark.implicits._
    require(parts >= 1, s"parts must be >= 1 (got $parts)")
    val t0 = System.nanoTime()
    val cfg = IndexBuilder.readConfig(spark, srcPath)
    val newCfg = cfg.copy(numSegments = parts)
    IndexBuilder.writeConfig(spark, dstPath, newCfg)
    val sorted = cfg.indexSort.isDefined

    val liveSrc = spark.read.parquet(IndexBuilder.statsPath(spark, srcPath))
      .select("segmentId").distinct().as[Int].collect().toSet
    val docsSrc = spark.read.parquet(IndexBuilder.docsPath(srcPath))
      .filter(col("segmentId").isInCollection(liveSrc))
    val liveDocs = docsSrc
      .join(graft.build.Deletes.deletedDf(spark, srcPath),
        Seq("segmentId", "docId"), "left_anti")
      .filter(docFilter)
    val sortKeyCol =
      if (sorted) col("sortKey") else lit(0d).as("sortKey")
    val routed = liveDocs.withColumn("newSeg",
      graft.functions.ScalarExpressions.segmentOf(col("url"), parts))

    // ONE global contiguous rank in (newSeg, sortKey, url) order with the
    // full doc-store payload riding along: appendRank pins the sorted rows
    // (localCheckpoint), so the permutation, the new doc store, the
    // per-segment offsets AND the doc-side stats below are all NARROW
    // derivations of this single sort — the old shape re-scanned the source
    // for the counts, wrote the permutation to a staging parquet and read it
    // back, then joined the doc store against it (three extra passes).
    val ranked = graft.Ranks.appendRank(
      routed.select(col("segmentId"), col("docId"), col("newSeg"),
        sortKeyCol, col("url"), col("fieldLen"), col("normByte")),
      "rank", Seq(col("newSeg").asc, col("sortKey").asc, col("url").asc))

    // per-newSeg offset (rank is newSeg-major contiguous: offset = min rank
    // - 1) + maxDoc + default-field sttf from one tiny aggregate
    val segAgg = ranked.groupBy(col("newSeg"))
      .agg(min(col("rank")).as("minRank"), count(lit(1)).as("maxDoc"),
        sum(col("fieldLen")).as("defaultSttf"))
      .collect().sortBy(_.getAs[Int]("newSeg"))
    val segOff: Map[Int, Long] =
      segAgg.map(r => r.getAs[Int]("newSeg") -> (r.getAs[Int]("minRank").toLong - 1L)).toMap
    val offDf = broadcast(spark.createDataset(segOff.toSeq).toDF("newSeg", "segOff"))
    val withNew = ranked.join(offDf, "newSeg")
      .withColumn("newId", (col("rank") - 1 - col("segOff")).cast("int"))
    val permDf0 = withNew.select("segmentId", "docId", "newSeg", "newId")
    // scale-adaptive permutation attachment (the doc count is already in
    // hand from segAgg — no extra job): up to the broadcast budget the
    // postings/vectors rebase joins ship the permutation to every task and
    // the big exploded-entries side is NEVER shuffled by (segmentId, docId);
    // above it both sides shuffle (the fully distributed shape). Mirrors the
    // merge path's SortedMergeMaxDocs cutover; override with
    // spark.graft.split.permBroadcastMaxDocs.
    val totalDocs = segAgg.map(_.getAs[Long]("maxDoc")).sum
    val permBroadcastMax = spark.conf.getOption("spark.graft.split.permBroadcastMaxDocs")
      .map(_.toLong).getOrElse((1L << 22))
    val permDf = if (totalDocs <= permBroadcastMax) broadcast(permDf0) else permDf0

    // doc store straight off the pinned sort (no join-back), concurrent with
    // the postings rebuild below — the two jobs share no dependency
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val docCols = Seq(col("newSeg").as("segmentId"), col("newId").as("docId"),
      col("url"), col("fieldLen"), col("normByte")) ++
      (if (sorted) Seq(col("sortKey")) else Nil)
    val docsJob = Future {
      withNew.select(docCols: _*)
        .write.mode(SaveMode.Overwrite)
        .partitionBy("segmentId").parquet(IndexBuilder.docsPath(dstPath))
    }

    // term vectors ride along when present
    val vectorsJob = if (!graft.build.TermVectors.enabled(spark, srcPath))
      Future.successful(()) else Future {
      spark.read.parquet(graft.build.TermVectors.vectorsPath(srcPath))
        .filter(col("segmentId").isInCollection(liveSrc))
        .join(permDf, Seq("segmentId", "docId"))
        .select(col("newSeg").as("segmentId"), col("newId").as("docId"),
          col("field"), col("term"), col("tf"), col("positions"),
          col("starts"), col("ends"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("segmentId").parquet(graft.build.TermVectors.vectorsPath(dstPath))
    }

    // postings: explode to per-(term, doc) entries, route through the
    // permutation (deleted docs fall out of the inner join), regroup per
    // (newSeg, field, term) in newId order with the salt-bucket discipline
    // of the distributed sorted merge, stream-encode bounded pieces
    val entries = spark.read.parquet(IndexBuilder.postingsPath(srcPath))
      .filter(col("segmentId").isInCollection(liveSrc))
      .transform(IndexBuilder.withPayloadsCol)
      .select("segmentId", "field", "term", "df", "ttf", "docDeltas", "tfs",
        "positions", "lens", "skips", "payloads", "offsets")
      .as[PostingRow]
      .flatMap { p =>
        val d = PostingsCodec.decode(p.df, p.docDeltas, p.tfs, p.positions, p.lens)
        val pays = payloadSlices(d.tfs, d.posStart, p.payloads)
        val offs = if (p.offsets == null) null
          else PostingsCodec.decodeOffsets(d.tfs, p.offsets)
        Iterator.tabulate(d.docIds.length) { i =>
          val ps = java.util.Arrays.copyOfRange(d.posFlat, d.posStart(i), d.posStart(i + 1))
          val pl = if (pays == null) null
            else frameEntryPayload(pays, d.posStart(i), d.posStart(i + 1))
          val of = if (offs == null) null
            else flatOffsets(offs._1, offs._2, d.posStart(i), d.posStart(i + 1))
          SortedEntryRow(p.field, p.term, p.segmentId, d.docIds(i), d.tfs(i),
            ps, d.lens(i), pl, of)
        }
      }
    val shardRows: Dataset[PostingRow] = entries.toDF()
      .join(permDf, Seq("segmentId", "docId"))
      .select(col("newSeg"), col("field"), col("term"), col("newId"),
        col("tf"), col("positions"), col("fieldLen"), col("payload"), col("offsets"))
      .withColumn("salt", (col("newId").cast("long") / pieceEntries).cast("int"))
      .repartition(col("newSeg"), col("field"), col("term"), col("salt"))
      .sortWithinPartitions(col("newSeg"), col("field"), col("term"), col("newId"))
      .select(col("newSeg"), col("field"), col("term"), col("newId"),
        col("tf"), col("positions"), col("fieldLen"), col("payload"), col("offsets"))
      .as[(Int, String, String, Int, Int, Array[Int], Int, Array[Byte], Array[Int])]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[PostingRow] {
          private var nextRow: PostingRow = null
          private def advance(): Unit = {
            if (nextRow != null || !it.hasNext) return
            val seg = it.head._1
            val field = it.head._2
            val term = it.head._3
            val salt = it.head._4 / pieceEntries
            val enc = new PostingsCodec.Encoder
            var n = 0
            while (n < pieceEntries && it.hasNext && it.head._1 == seg &&
              it.head._2 == field && it.head._3 == term &&
              it.head._4 / pieceEntries == salt) {
              val e = it.next()
              enc.add(e._4, e._5, e._6, e._7, unframeEntryPayload(e._5, e._8), e._9)
              n += 1
            }
            val enc2 = enc.finish()
            nextRow = PostingRow(seg, field, term, enc2.df, enc2.ttf,
              enc2.docDeltas, enc2.tfs, enc2.positions, enc2.lens,
              enc2.skips.map(s => SkipRow(s.lastDoc, s.docOff, s.tfOff,
                s.posOff, s.cumDocs, s.maxTf, s.minLen)),
              enc2.payloads, enc2.offsets)
          }
          override def hasNext: Boolean = { advance(); nextRow != null }
          override def next(): PostingRow = {
            advance(); val r = nextRow; nextRow = null; r
          }
        }
      }
    val postingsJob = Future {
      shardRows.toDF().write.mode(SaveMode.Overwrite)
        .partitionBy("segmentId").parquet(IndexBuilder.postingsPath(dstPath))
    }
    Await.result(docsJob, Duration.Inf)
    Await.result(vectorsJob, Duration.Inf)
    Await.result(postingsJob, Duration.Inf)

    // term blooms regenerate when the source used them
    if (cfg.bloomFilter) {
      spark.read.parquet(IndexBuilder.postingsPath(dstPath))
        .select(col("segmentId").cast("int").as("segmentId"), col("field"), col("term"))
        .as[(Int, String, String)]
        .groupByKey(r => (r._1, r._2))
        .mapGroups { (key: (Int, String), rs: Iterator[(Int, String, String)]) =>
          val (mask, bits) = graft.codec.TermBloom.build(
            rs.map(r => graft.codec.TermBloom.hash(r._3)))
          graft.codec.BloomRow(key._1, key._2, mask, bits)
        }
        .write.mode(SaveMode.Overwrite).parquet(IndexBuilder.bloomsPath(dstPath))
    }

    // stats (generation 0 of the fresh index) + manifest, builder formula.
    // The doc-store side (maxDoc, default sttf) comes from segAgg — already
    // aggregated off the pinned sort, no re-read of the written doc store;
    // the postings side is ONE read of the written postings whose slim
    // projection is pinned and SHARED with the dictionary refresh below
    // (the old shape scanned the postings output twice).
    val fieldNames = IndexBuilder.DefaultField +: cfg.extraFields.map(_._1)
    val segDocs = spark.createDataset(segAgg.toSeq.map(r =>
        (r.getAs[Int]("newSeg"), r.getAs[Long]("maxDoc"), r.getAs[Long]("defaultSttf"))))
      .toDF("segmentId", "maxDoc", "defaultSttf")
    val postProj = spark.read.parquet(IndexBuilder.postingsPath(dstPath))
      .select(col("segmentId").cast("int").as("segmentId"), col("field"),
        col("term"), col("df"), col("ttf"))
      .persist()
    val segFieldTerms = postProj
      .groupBy(col("segmentId"), col("field"))
      .agg(count(lit(1)).as("sumDocFreq"), sum(col("ttf")).as("postSttf"))
    val stats = segDocs.crossJoin(fieldNames.toDF("field"))
      .join(segFieldTerms, Seq("segmentId", "field"), "left")
      .select(col("segmentId").cast("int").as("segmentId"), col("field"),
        col("maxDoc").cast("long").as("maxDoc"),
        when(col("field") === IndexBuilder.DefaultField, col("defaultSttf"))
          .otherwise(coalesce(col("postSttf"), lit(0L)))
          .cast("long").as("sumTotalTermFreq"),
        coalesce(col("sumDocFreq"), lit(0L)).cast("long").as("sumDocFreq"))
      .as[SegmentStats].collect()
    spark.createDataset(stats.toSeq).repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dstPath/stats")
    val numDocs = stats.filter(_.field == IndexBuilder.DefaultField).map(_.maxDoc).sum
    val elapsed = (System.nanoTime() - t0) / 1e9
    val now = System.currentTimeMillis()
    val manifest = (0 until parts).map { seg =>
      val st = stats.find(s => s.segmentId == seg && s.field == IndexBuilder.DefaultField)
      graft.model.ManifestRow(seg, "done", st.map(_.maxDoc).getOrElse(0L),
        st.map(_.sumDocFreq).getOrElse(0L), numDocs / math.max(elapsed, 1e-9),
        1, now - (elapsed * 1000).toLong, now)
    }
    spark.createDataset(manifest).repartition(1).write.mode(SaveMode.Overwrite)
      .parquet(IndexBuilder.manifestPath(dstPath))
    graft.build.DictTable.write(spark, dstPath, Some(postProj))
    postProj.unpersist()
    numDocs
  }

  /** PKIndexSplitter analog
    * (/root/reference/src/Lucene.Net.Misc/Index/PKIndexSplitter.cs:30-43 —
    * split one index into two by a primary-key predicate, docs passing the
    * filter in the first output): two [[splitIndex]] passes with the
    * predicate and its complement. Both outputs are complete standalone
    * indexes (own stats/dict/config); deletes resolve before the partition
    * so neither side resurrects a deleted doc. Returns (docsA, docsB).
    */
  def partitionIndex(spark: SparkSession, srcPath: String,
                     dstA: String, dstB: String,
                     urlPredicate: org.apache.spark.sql.Column,
                     partsA: Int = 1, partsB: Int = 1): (Long, Long) = {
    val a = splitIndex(spark, srcPath, dstA, partsA, docFilter = urlPredicate)
    val b = splitIndex(spark, srcPath, dstB, partsB, docFilter = !urlPredicate)
    (a, b)
  }
}
