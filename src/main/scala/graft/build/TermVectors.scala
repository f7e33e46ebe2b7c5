package graft.build

import org.apache.spark.sql.SparkSession
import graft.analysis.Analyzer
import graft.model.VectorRow

/** Term-vector store — the reference's TermVectorsConsumer / .tvx/.tvd/.tvf
  * family (/root/reference/src/Lucene.Net.Core/Index/TermVectorsConsumer.cs,
  * Codecs/Lucene40/Lucene40TermVectorsWriter.cs:35-47): a doc-major copy of
  * each document's (term, tf, positions, offsets), written AT INDEX TIME so
  * one doc's vector is O(doc) to fetch — no term-major postings scan.
  *
  * Spark shape: a parquet table partitioned by segmentId next to docs/ and
  * postings/, produced as a third concurrent job off the same url-hash
  * shuffle the docs and postings jobs share (IndexBuilder.writeSegments).
  * Retrieval partition-prunes on segmentId and pushes the docId predicate
  * to the scan, so a 1000-executor cluster touches one partition's footer,
  * not the index. Vectors rebase through merges exactly like the doc store
  * (docIds compact, purged docs drop).
  */
object TermVectors {

  def vectorsPath(base: String): String = s"$base/vectors"

  /** Whether this index was built with term vectors. */
  def enabled(spark: SparkSession, base: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(vectorsPath(base))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One doc's vectors across its fields: tokenizes with the same analyzer
    * chain the postings saw, aggregates per term preserving token order
    * (positions ASC, offsets aligned index-for-index).
    */
  def vectorize(fields: Seq[(String, Analyzer)], vals: Seq[String],
                segmentId: Int, docId: Int): Iterator[VectorRow] =
    fields.iterator.zip(vals.iterator).flatMap { case ((fname, analyzer), text) =>
      val byTerm = scala.collection.mutable.LinkedHashMap
        .empty[String, (scala.collection.mutable.ArrayBuffer[Int],
                        scala.collection.mutable.ArrayBuffer[Int],
                        scala.collection.mutable.ArrayBuffer[Int])]
      analyzer.tokenize(if (text == null) "" else text).foreach { t =>
        val (ps, ss, es) = byTerm.getOrElseUpdate(t.term,
          (new scala.collection.mutable.ArrayBuffer[Int],
           new scala.collection.mutable.ArrayBuffer[Int],
           new scala.collection.mutable.ArrayBuffer[Int]))
        ps += t.position; ss += t.startOffset; es += t.endOffset
      }
      byTerm.iterator.map { case (term, (ps, ss, es)) =>
        VectorRow(segmentId, docId, fname, term, ps.length,
          ps.toSeq, ss.toSeq, es.toSeq)
      }
    }
}
