package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parent/child block join — the Lucene.Net.Join module's
  * ToParentBlockJoinQuery / ToChildBlockJoinQuery analog
  * (/root/reference/src/Lucene.Net.Join/ToParentBlockJoinQuery.cs,
  * ToChildBlockJoinQuery.cs). The reference encodes parent/child as
  * contiguous doc blocks inside one index; the Spark-native re-expression is
  * a real relational join on the parent key — same query semantics (match
  * children, return parents with a child-score aggregate, or the reverse),
  * engine-native physical plan (broadcast/SMJ chosen by Catalyst, AQE skew
  * handling for hot parents).
  */
object BlockJoin {

  /** Parents with >= 1 matching child; child scores aggregate per ScoreMode
    * (Max | Total | Avg | None — ToParentBlockJoinQuery.cs ScoreMode).
    * Returns (parentKey, childMatches, score?).
    */
  def toParent(children: DataFrame, parentKey: String, childPred: Column,
               childScore: Column, scoreMode: String = "Max"): DataFrame = {
    val matched = children.filter(childPred)
    val agg = scoreMode match {
      case "Max" => max(childScore)
      case "Total" => sum(childScore)
      case "Avg" => avg(childScore)
      case "None" => lit(null)
      case other => throw new IllegalArgumentException(s"unknown ScoreMode $other")
    }
    matched.groupBy(col(parentKey))
      .agg(count(lit(1)).as("child_matches"), agg.as("score"))
  }

  /** Children of parents matching the parent predicate
    * (ToChildBlockJoinQuery: a parent query mapped onto its child docs).
    */
  def toChild(parents: DataFrame, children: DataFrame, parentKey: String,
              parentPred: Column): DataFrame =
    children.join(parents.filter(parentPred).select(col(parentKey)), Seq(parentKey), "left_semi")
}
