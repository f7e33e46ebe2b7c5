package graft.model

/** Row models for the engine's tables (FIXTURES.md §3):
  *
  *   docs(segmentId, docId, url, fieldLen, normByte)
  *   postings(segmentId, field, term, df, ttf, docDeltas, tfs, positions, lens, skips)
  *   stats(segmentId, field, maxDoc, sumTotalTermFreq, sumDocFreq)
  *   manifest(segmentId, status, numDocs, numTerms, docsPerSec, ...)
  *
  * The Spark analog of the reference's per-segment files: postings =
  * .doc/.pos, docs+norms = .fdx/.nvd, stats/manifest = segments_N
  * (/root/reference/src/Lucene.Net.Core/Index/SegmentInfos.cs:49-69).
  * A posting key is (field, term) exactly as the reference's Term
  * (/root/reference/src/Lucene.Net.Core/Index/Term.cs); per-field invariants
  * (analyzer, stats) follow FieldInfos (Index/FieldInfos.cs).
  */
final case class DocRow(segmentId: Int, docId: Int, url: String, fieldLen: Int, normByte: Byte)

final case class SkipRow(lastDoc: Int, docOff: Int, tfOff: Int, posOff: Int,
                         cumDocs: Int, maxTf: Int, minLen: Int)

final case class PostingRow(segmentId: Int, field: String, term: String, df: Int, ttf: Long,
                            docDeltas: Array[Byte], tfs: Array[Byte],
                            positions: Array[Byte], lens: Array[Byte],
                            skips: Array[SkipRow],
                            /** Optional per-position payload stream (the .pay
                              * file analog, vByte(len)+bytes per position);
                              * null for fields without payloads. */
                            payloads: Array[Byte] = null,
                            /** Optional per-position character-offset stream
                              * (IndexOptions ..._AND_OFFSETS; the reference
                              * stores offsets in the same .pay file) — see
                              * PostingsCodec; null when not indexed. */
                            offsets: Array[Byte] = null)

/** Scoring-only posting projection (no positions column read). */
final case class PostingSlim(segmentId: Int, field: String, term: String, df: Int,
                             docDeltas: Array[Byte], tfs: Array[Byte], lens: Array[Byte])

final case class SegmentStats(segmentId: Int, field: String, maxDoc: Long,
                              sumTotalTermFreq: Long, sumDocFreq: Long)

final case class ManifestRow(segmentId: Int, status: String, numDocs: Long, numTerms: Long,
                             docsPerSec: Double, attempt: Int, startedAtMs: Long, finishedAtMs: Long)

/** Per-doc term vector (the .tvd/.tvf analog, Index/TermVectorsConsumer.cs:
  * doc-major (term, tf, positions, offsets) written at index time so a
  * single doc's vector is retrievable without a term-major postings scan).
  * starts/ends are character offsets into the original field text, aligned
  * index-for-index with positions. */
final case class VectorRow(segmentId: Int, docId: Int, field: String, term: String,
                           tf: Int, positions: Seq[Int], starts: Seq[Int], ends: Seq[Int])

/** A scored hit; global doc order (tie-break) = (segmentId asc, docId asc). */
final case class Hit(segmentId: Int, docId: Int, score: Double)

object Addressing {
  /** Deterministic segment assignment: stable across reruns, cluster sizes and
    * partitionings — the property Lucene's arrival-order docIDs lack
    * (SURVEY.md §7.3 "Deterministic docIDs at scale").
    */
  def segmentOf(key: String, numSegments: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), numSegments)
}
