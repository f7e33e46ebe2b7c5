package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Doc-values facet variants beyond the taxonomy module (SURVEY.md §2.7).
  */
object Facets {

  /** SortedSetDocValuesFacetCounts analog (/root/reference/src/
    * Lucene.Net.Facet/SortedSet/SortedSetDocValuesFacetCounts.cs): each doc
    * carries a SORTED SET of "dim/label" strings in a doc-values field — no
    * taxonomy index exists; counts aggregate per (dim, label) over the
    * matching docs. Relationally: explode the set column, split on the
    * first '/', one partial-aggregated groupBy (map-side combine — the
    * per-segment ordinal counting of the reference collapses into the
    * shuffle's combiner). */
  def sortedSetCounts(matching: DataFrame, facetsCol: String): DataFrame =
    matching.select(explode(col(facetsCol)).as("facet"))
      .select(substring_index(col("facet"), "/", 1).as("dim"),
        expr(s"substring(facet, instr(facet, '/') + 1)").as("label"))
      .groupBy("dim", "label").agg(count(lit(1)).as("cnt"))

  /** RandomSamplingFacetsCollector analog (/root/reference/src/
    * Lucene.Net.Facet/RandomSamplingFacetsCollector.cs): facet counts over
    * a per-doc random sample of the matching docs, plus the amortized
    * original-count estimate (AmortizeFacetCounts: sampled count scaled by
    * the inverse sampling ratio). The reference's XORShift64 per-hit coin
    * becomes a seeded multiplicative hash on the doc key — deterministic,
    * partition-order-independent, and reproducible by any engine (the
    * requirement a stateful PRNG stream cannot meet on a cluster).
    *
    * Sample keeps docs with (id * 2654435761 + seed) mod 2^32 <
    * 2^32 * rateNum/rateDen. Returns (dim value, cnt, est) with
    * est = cnt * rateDen / rateNum (integer amortization).
    */
  def sampledCounts(matching: DataFrame, idCol: String, dimCol: String,
                    rateNum: Long, rateDen: Long, seed: Long): DataFrame = {
    require(rateNum > 0 && rateDen >= rateNum, "sampling rate must be in (0, 1]")
    val thr = (4294967296L / rateDen) * rateNum
    matching
      .filter(pmod(col(idCol).cast("long") * 2654435761L + seed, lit(4294967296L)) < thr)
      .groupBy(col(dimCol))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("est", (col("cnt") * rateDen / rateNum).cast("long"))
  }
}
