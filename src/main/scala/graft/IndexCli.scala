package graft

import org.apache.spark.sql.SparkSession
import graft.build.{CheckIndex, IndexBuilder}
import graft.merge.{MergeJob, TieredMergePolicy}
import graft.search.{AnalyzingQueryParser, ComplexPhraseParser, QueryParser,
  Searcher, SimpleQueryParser, SurroundParser, XmlQueryParser}
import graft.streaming.StreamingIndexer

/** spark-submit entry point for the whole engine lifecycle (the north rule's
  * "runs via spark-submit on multi-executor clusters" contract; in local dev
  * use `sbt "runMain graft.IndexCli <cmd> ..."`).
  *
  *   build   <pagesParquet> <indexPath> [numSegments] [analyzer] [vectors] [sort=<col>]
  *   stream  <pagesDir> <indexPath> <checkpointDir> [analyzer]
  *   merge   <indexPath>                      # tiered merge to policy
  *   check   <indexPath>                      # CheckIndex invariants
  *   search  <indexPath> <k> [--parser classic|simple|surround|complex|xml|analyzing] <query...>
  *   delete  <indexPath> <query...>           # DeleteDocuments(Query)
  *   explain <indexPath> <segmentId> <docId> <query...>
  *   termvector <indexPath> <segmentId> <docId>
  *   sorted  <indexPath> <k> [query...]       # early-terminating sorted top-k
  *   percolate <pagesParquet> <queriesTsv> <analyzer>
  *
  * No .master() is set — spark-submit (or SPARK_MASTER) decides; a local
  * default applies only when launched outside spark-submit.
  */
object IndexCli {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: build|stream|merge|check|search ...")
    val builder = SparkSession.builder()
      .appName(s"graft-${args(0)}")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    if (sys.props.get("spark.master").isEmpty && sys.env.get("SPARK_MASTER").isEmpty)
      builder.master(s"local[${Runtime.getRuntime.availableProcessors()}]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    args(0) match {
      case "build" =>
        val Array(_, pagesPath, indexPath, rest0 @ _*) = args: @unchecked
        // flags may appear anywhere after the positionals:
        // vectors | sort=<col> | bloom
        val vectors = rest0.contains("vectors")
        val bloom = rest0.contains("bloom")
        val sortCol = rest0.collectFirst { case f if f.startsWith("sort=") => f.drop(5) }
        val rest = rest0.filterNot(f => f == "vectors" || f == "bloom" || f.startsWith("sort="))
        val numSegments = rest.headOption.map(_.toInt)
          .getOrElse(math.max(spark.sparkContext.defaultParallelism * 4, 16))
        val analyzer = rest.lift(1).getOrElse("standard")
        val baseCols = Seq("url", "text") ++ sortCol.toSeq
        val pages = spark.read.parquet(pagesPath).selectExpr(baseCols: _*)
        val report = IndexBuilder.build(spark, pages, indexPath,
          IndexBuilder.BuildConfig(numSegments, analyzer,
            termVectors = vectors, indexSort = sortCol, bloomFilter = bloom))
        println(s"""{"docs":${report.numDocs},"segments":${report.numSegments},""" +
          s""""sec":${report.elapsedSec},"docsPerSec":${report.docsPerSec.toLong}}""")

      case "stream" =>
        val Array(_, inputDir, indexPath, ckpt, rest @ _*) = args: @unchecked
        val analyzer = rest.headOption.getOrElse("standard")
        StreamingIndexer.start(spark, inputDir, indexPath, ckpt, analyzer).awaitTermination()

      case "merge" =>
        val indexPath = args(1)
        val merges = MergeJob.mergeToPolicy(spark, indexPath, new TieredMergePolicy())
        println(s"""{"merges":$merges}""")

      case "check" =>
        val report = CheckIndex.run(spark, args(1))
        println(s"""{"ok":${report.ok},"segments":${report.segments},"docs":${report.docs},""" +
          s""""postingRows":${report.postingRows},"violations":${report.violations.size}}""")
        report.violations.foreach(v => System.err.println(s"VIOLATION: $v"))
        if (!report.ok) sys.exit(1)

      case "search" =>
        val indexPath = args(1)
        val k = args(2).toInt
        // optional dialect flag, accepted anywhere after the positionals:
        // --parser classic|simple|surround|complex|xml|analyzing
        val tail = args.drop(3).toList
        val flagIdx = tail.indexOf("--parser")
        val (dialect, rest) =
          if (flagIdx >= 0 && flagIdx + 1 < tail.length)
            (tail(flagIdx + 1), tail.patch(flagIdx, Nil, 2))
          else ("classic", tail)
        val queryText = rest.mkString(" ")
        val s = new Searcher(spark, indexPath)
        val q = dialect match {
          case "classic" => QueryParser.parse(queryText, s.analyzer)
          case "simple" => SimpleQueryParser.parse(queryText, s.analyzer)
          case "surround" => SurroundParser.parse(queryText, s)
          case "complex" => ComplexPhraseParser.parse(queryText, s.analyzer, s)
          case "xml" => XmlQueryParser.parse(queryText, s.analyzer)
          case "analyzing" => AnalyzingQueryParser.parse(queryText, s.analyzer)
          case other => sys.error(s"unknown parser dialect: $other")
        }
        s.search(q, k).collect().foreach { r =>
          println(f"${r.getDouble(1)}%10.4f  ${r.getString(0)}")
        }

      case "delete" =>
        val indexPath = args(1)
        val queryText = args.drop(2).mkString(" ")
        val s = new Searcher(spark, indexPath)
        val q = QueryParser.parse(queryText, s.analyzer)
        val before = s.count(q)
        graft.build.Deletes.deleteByQuery(s, indexPath, q)
        println(s"""{"deleted":$before}""")

      case "explain" =>
        val Array(_, indexPath, seg, doc, qrest @ _*) = args: @unchecked
        val s = new Searcher(spark, indexPath)
        val q = QueryParser.parse(qrest.mkString(" "), s.analyzer)
        print(s.explain(q, seg.toInt, doc.toInt).toString)

      case "termvector" =>
        val Array(_, indexPath, seg, doc) = args: @unchecked
        new Searcher(spark, indexPath).termVector(seg.toInt, doc.toInt)
          .select("field", "term", "tf", "positions").orderBy("field", "term")
          .collect().foreach { r =>
            println(s"${r.getString(0)}:${r.getString(1)}\ttf=${r.getInt(2)}" +
              s"\tpos=${r.getSeq[Int](3).mkString(",")}")
          }

      case "sorted" => // early-terminating sorted top-k (optional query)
        val Array(_, indexPath, k, qrest @ _*) = args: @unchecked
        val s = new Searcher(spark, indexPath)
        val rows =
          if (qrest.isEmpty) s.sortedTopK(k.toInt)
          else s.searchSortedEarly(QueryParser.parse(qrest.mkString(" "), s.analyzer), k.toInt)
        rows.collect().foreach(r => println(f"${r.getDouble(1)}%12.1f  ${r.getString(0)}"))

      case "percolate" => // stored queries from a text file, one per line "name<TAB>query"
        val Array(_, pagesPath, queriesPath, analyzer) = args: @unchecked
        val a = graft.analysis.Analyzers.byName(analyzer)
        val src = scala.io.Source.fromFile(queriesPath)
        val stored = try {
          src.getLines().filter(_.nonEmpty).map { line =>
            val parts = line.split("\t", 2)
            require(parts.length == 2, s"queries file line needs 'name<TAB>query': $line")
            parts(0) -> QueryParser.parse(parts(1), a)
          }.toList
        } finally src.close()
        val docs = spark.read.parquet(pagesPath)
          .withColumn("id", org.apache.spark.sql.functions
            .monotonically_increasing_id())
        graft.pipeline.Percolator.percolate(docs, "id", "text", stored, analyzer)
          .groupBy("query_id").count().orderBy("query_id")
          .collect().foreach(r => println(s"${r.getString(0)}\t${r.getLong(1)}"))

      case other => throw new IllegalArgumentException(s"unknown command: $other")
    }
    spark.stop()
  }
}
