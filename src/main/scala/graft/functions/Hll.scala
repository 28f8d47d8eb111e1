package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deterministic HyperLogLog (Flajolet et al. 2007) shared by q79's
  * distinct-count sketch, q110's cross-source overlap algebra, and the
  * streaming register build ([[graft.streaming.StreamOps]]) — one
  * construction, bit-identical in Spark and in the generated DuckDB
  * oracle SQL (the q51 determinism pattern applied to the sketch family).
  *
  * State is the classic mergeable form (per-bucket max of rho over
  * [[Hashes.base32]] coordinates), so partial sketches from any
  * partitioning, micro-batching, or set-union fold to the same registers:
  * the register relation is closed under per-bucket `max`, which is what
  * makes union estimates (and inclusion–exclusion overlaps) a pure
  * sketch-algebra step that never revisits the data.
  *
  * Numeric determinism contract (see RelationalPack's q79 notes):
  *  - the register sum is kept as the EXACT integer sum of
  *    2^(WBITS+1-reg) (empty bucket = 2^(WBITS+1)) — integer sums are
  *    addition-order-insensitive where a float 2^-reg sum would not be
  *    hash-stable across engines;
  *  - the linear-counting correction m*ln(m/V) is a LITERAL table indexed
  *    by m_used: ln is not guaranteed identically rounded across libm
  *    implementations, so both engines look the value up from the same
  *    Scala-computed constants instead of computing ln.
  */
object Hll {
  /** Register-index bits; m = 2^p = 256 registers per sketch. */
  val P: Int = 8
  val M: Int = 1 << P
  val WBITS: Int = 32 - P // rho ranges over the remaining 24-bit window
  private val ALPHA = 0.7213 / (1 + 1.079 / M)

  /** Raw-estimate numerator alpha*m^2, pre-scaled by 2^(WBITS+1) to match
    * the integer register sum. */
  val CRAW: Double = ALPHA * M * M * (1L << (WBITS + 1)).toDouble

  /** Linear-counting literal table, 1-based by m_used (V = m - m_used). */
  val lc: IndexedSeq[Double] =
    (1 until M).map(mu => M * math.log(M.toDouble / (M - mu))) :+ 0.0

  /** (bucket, rho) register coordinates of a base32-hashed column. */
  def bucket(h: Column): Column = Hashes.hllBucket(h, P)
  def rho(h: Column): Column = Hashes.hllRho(h, P)

  /** Fold a register relation (`keys` ++ bucket, reg) into one estimate row
    * per key group: keys ++ (m_used, reg_sum, `estName`). The registers —
    * not the raw rows — are what re-aggregates, so this runs identically
    * over a direct build, a streaming fold, or a sketch union. */
  def estimate(regs: DataFrame, keys: Seq[String], estName: String): DataFrame = {
    val raw = lit(CRAW) / col("s_scaled").cast("double")
    val lcArr = array(lc.map(lit(_)): _*) // element_at is 1-based: [m_used]
    regs.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("m_used"),
        sum(col("reg")).cast("long").as("reg_sum"),
        sum(pow(lit(2.0), lit(WBITS + 1) - col("reg"))).cast("long").as("s_part"))
      .withColumn("s_scaled", col("s_part")
        + (lit(M) - col("m_used")) * lit(1L << (WBITS + 1)))
      .withColumn(estName,
        floor(when(raw <= lit(2.5 * M) && col("m_used") < M,
            element_at(lcArr, col("m_used").cast("int")))
          .otherwise(raw)).cast("long"))
      .select((keys.map(col) ++ Seq(col("m_used"), col("reg_sum"), col(estName))): _*)
  }

  // ---- DuckDB SQL fragments (same semantics, for oracle generation) ----

  /** DuckDB: register coordinates of hash expression `h` as
    * (bucket, reg) select items. */
  def sqlRegCoords(h: String): String =
    s"($h) % $M AS bucket, " +
      s"CASE WHEN ($h) // $M = 0 THEN ${WBITS + 1} " +
      s"ELSE ${WBITS + 1} - length(bin(($h) // $M)) END AS rho"

  /** DuckDB: the estimate select over a regs relation `(keys, bucket, reg)`
    * named `regsRel`, grouped by `keys` — the SQL twin of [[estimate]]. */
  def sqlEstimate(regsRel: String, keys: Seq[String], estName: String): String = {
    val lcCase = lc.zipWithIndex
      .map { case (v, i) => s"WHEN ${i + 1} THEN ${v}" }
      .mkString("CASE m_used ", " ", " END")
    val raw = s"($CRAW / s_scaled::DOUBLE)"
    val ks = keys.mkString(", ")
    s"""SELECT $ks, m_used, reg_sum,
       |  floor(CASE WHEN $raw <= ${2.5 * M} AND m_used < $M
       |             THEN $lcCase ELSE $raw END)::BIGINT AS $estName
       |FROM (
       |  SELECT $ks, count(*)::BIGINT AS m_used,
       |    sum(reg)::BIGINT AS reg_sum,
       |    (sum(1::BIGINT << (${WBITS + 1} - reg))
       |      + ($M - count(*)) * ${1L << (WBITS + 1)})::BIGINT AS s_scaled
       |  FROM $regsRel GROUP BY $ks
       |)""".stripMargin
  }
}
