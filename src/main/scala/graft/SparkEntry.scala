package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY.md §2 inventory) to DataFrame
  * builders over a testdata dir; `oracleSql` carries the equivalent DuckDB
  * SQL for the driver's correctness gate. Column names and row order are
  * kept identical between the two by construction (see RelationalPack's
  * determinism rules).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    WindowPack.queries("q21_sliding_stats")(spark, "/root/testdata/sf0.001")

  private val packs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalPack.queries, RelationalPack.oracle),
      (WindowPack.queries, WindowPack.oracle),
      (TextPack.queries, TextPack.oracle),
      (SimilarityPack.queries, SimilarityPack.oracle),
      (GraphPack.queries, GraphPack.oracle),
      (RecommendationPack.queries, RecommendationPack.oracle),
      (ActivityPack.queries, ActivityPack.oracle),
      (MultimodalPack.queries, MultimodalPack.oracle),
      (PipelinePack.queries, PipelinePack.oracle),
      (CurationPack.queries, CurationPack.oracle),
      (SamplingPack.queries, SamplingPack.oracle)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.iterator.map(_._1).reduce(_ ++ _)

  /** When set (by Verify, which knows the sf dir), data-dependent oracles
    * — the trained IVF/K-means centroids embedded as literals — join the
    * static map, upgrading q43/q62 from rows-only to hash-checked. */
  @volatile var oracleContext: Option[(SparkSession, String)] = None

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  def oracleSql: Map[String, String] =
    packs.iterator.map(_._2).reduce(_ ++ _) ++
      oracleContext.map { case (s, d) =>
        SimilarityPack.dynamicOracle(s, d) ++ ActivityPack.dynamicOracle(s, d)
      }.getOrElse(Map.empty)
}
