package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding over (key, item) row sets — the shared
  * module behind document dedup (TextPack) and user-similarity
  * recommendations (RecommendationPack), mirroring the reference's single
  * MinHasher used by both batch prep and streaming
  * (reference: jobs/recommendations/RecommendationUtils.scala:14-49;
  * LSH banding: jobs/preparation/LoadStaticDataJob.scala:92-105;
  * construction: MMDS ch. 3).
  *
  * One seeded [[Hashes.family]] is the single source of truth for BOTH the
  * Spark plan and the generated DuckDB oracle SQL — the reference's
  * "same MinHasher config everywhere" invariant (README.md:112) as a
  * cross-engine determinism contract.
  *
  * Scale: the signature is a groupBy with `numHashes` min-aggregates —
  * map-side partial aggregation collapses each partition to one row per
  * key before the shuffle; signatures are `numHashes` longs per key.
  */
final case class MinHash(numHashes: Int, bands: Int, seed: Long) {
  require(numHashes % bands == 0, "bands must divide numHashes")
  val rowsPerBand: Int = numHashes / bands
  val fam: IndexedSeq[(Long, Long)] = Hashes.family(numHashes, seed)

  /** Signature table (key, m0..m{n-1}) from (key, item) rows. */
  def signature(items: DataFrame, key: String, item: String): DataFrame =
    signature(items, Seq(key), item)

  /** Multi-column-key variant — the online recommendation chain keys
    * signatures by (user, window) so one micro-batch can carry several
    * fired windows per user (reference: RecommendationsJob.scala:342-356,
    * where the signature is recomputed per window fire). */
  def signature(items: DataFrame, keys: Seq[String], item: String): DataFrame =
    items
      .select(keys.map(col) :+ Hashes.base32(col(item)).as("__x"): _*)
      .groupBy(keys.map(col): _*)
      .agg(min(Hashes.minhashSlot(col("__x"), fam(0))).as("m0"),
        (1 until numHashes).map(i =>
          min(Hashes.minhashSlot(col("__x"), fam(i))).as(s"m$i")): _*)

  /** Band-key columns (one string per band) over a signature row. */
  def bandKeys: IndexedSeq[Column] =
    (0 until bands).map(j =>
      concat_ws("-", (0 until rowsPerBand).map(r => col(s"m${j * rowsPerBand + r}")): _*))

  /** Estimated Jaccard similarity between two signature-array columns =
    * fraction of equal slots (reference: RecommendationUtils.scala:27). */
  def estSim(sigA: String, sigB: String): Column =
    expr(s"size(filter(zip_with($sigA, $sigB, (x, y) -> x = y), b -> b)) / CAST($numHashes AS DOUBLE)")

  /** The signature columns as one array column. */
  def sigArray: Column = array((0 until numHashes).map(i => col(s"m$i")): _*)

  // ---- DuckDB oracle fragments (same constants) ----

  /** SELECT computing the signature from an items CTE `(key, item)`. */
  def sqlSignature(itemsCte: String, key: String, item: String): String = {
    val mins = fam.zipWithIndex
      .map { case (ab, i) => s"min(${Hashes.sqlMinhashSlot("x", ab)}) AS m$i" }
      .mkString(",\n         ")
    s"""SELECT $key,
       |         $mins
       |  FROM (SELECT $key, ${Hashes.sqlBase32(item)} AS x FROM $itemsCte)
       |  GROUP BY $key""".stripMargin
  }

  /** UNION ALL computing (key, band, bandkey) rows from a signature CTE. */
  def sqlBands(sigCte: String, key: String): String =
    (0 until bands).map { j =>
      val k = (0 until rowsPerBand).map(r => s"m${j * rowsPerBand + r}::VARCHAR")
        .mkString(" || '-' || ")
      s"SELECT $key, $j AS band, $k AS bandkey FROM $sigCte"
    }.mkString("\n  UNION ALL\n  ")

  /** 64-term equal-slot fraction between aliased signature rows. */
  def sqlEstSim(aliasA: String, aliasB: String): String =
    (0 until numHashes)
      .map(i => s"CASE WHEN $aliasA.m$i = $aliasB.m$i THEN 1 ELSE 0 END")
      .mkString("(", " + ", s")::DOUBLE / ${numHashes}::DOUBLE")
}
