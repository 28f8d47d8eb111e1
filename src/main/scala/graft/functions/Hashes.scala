package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing primitives.
  *
  * The reference derives MinHash signatures with algebird's `MinHasher32`
  * (reference: jobs/recommendations/RecommendationUtils.scala:16-19,40-41);
  * we re-derive the same public MMDS construction (Leskovec–Rajaraman–Ullman
  * ch. 3) from scratch on a base hash both Spark and DuckDB can compute
  * **identically**, so every hash-bearing query stays oracle-checkable:
  *
  *   base32(s) = int(md5(s)[0:8], 16)        ∈ [0, 2^32)
  *   h_i(x)    = (a_i * x + b_i) mod P       P = 2^31 - 1
  *
  * a_i < 2^20 keeps a_i * x < 2^52: exact in BIGINT in both engines (no
  * overflow, no Double rounding). All of this is built-in-expression level
  * (md5/conv/substring) — whole-stage-codegen friendly, no UDFs in the
  * hot path.
  */
object Hashes {
  /** Modulus for the universal hash family (Mersenne prime 2^31-1). */
  val P: Long = 2147483647L

  /** Seeded (a, b) parameter family; the SAME constants are embedded in the
    * Spark plan and in the generated DuckDB oracle SQL (single source of
    * truth), mirroring the reference's batch/stream determinism contract
    * (reference: README.md:112).
    */
  def family(n: Int, seed: Long): IndexedSeq[(Long, Long)] = {
    val r = new scala.util.Random(seed)
    IndexedSeq.fill(n)((1L + r.nextInt((1 << 20) - 1).toLong, r.nextInt(Int.MaxValue).toLong))
  }

  /** 32-bit base hash of a string column (first 8 hex chars of md5). */
  def base32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit hash of a string column (first 15 hex chars of md5) — fits a
    * signed 64-bit integer in both engines; fingerprint-strength. */
  def base60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** h_i applied to an already-base32-hashed column. */
  def minhashSlot(x: Column, ab: (Long, Long)): Column =
    (x * lit(ab._1) + lit(ab._2)) % lit(P)

  // ---- deterministic-HLL register coordinates (q79's construction) ----
  // Shared by the batch query, its DuckDB oracle, and the streaming
  // register build so all three derive the SAME registers from base32(h).

  /** HLL bucket: low p bits of a base32 hash (h ≥ 0, so the bitmask
    * equals h % 2^p — the form the oracle SQL uses). */
  def hllBucket(h: Column, p: Int): Column =
    h.bitwiseAND(lit((1L << p) - 1))

  /** HLL rho: 1 + leading-zero count of the remaining (32-p)-bit window
    * w = h >> p, via the minimal-binary-length identity
    * rho = (32-p) + 1 - len(bin(w)) (w = 0 → the full (32-p)+1). */
  def hllRho(h: Column, p: Int): Column = {
    val w = shiftright(h, p)
    when(w === 0, lit(32 - p + 1))
      .otherwise(lit(32 - p + 1) - length(bin(w)))
  }

  // ---- DuckDB SQL fragments (same semantics, for oracle generation) ----

  /** DuckDB: base32 of expression `e`. */
  def sqlBase32(e: String): String =
    s"(('0x' || substr(md5($e), 1, 8))::BIGINT)"

  /** DuckDB: base60 of expression `e`. */
  def sqlBase60(e: String): String =
    s"(('0x' || substr(md5($e), 1, 15))::BIGINT)"

  /** DuckDB: h_i over an already-hashed BIGINT expression `x`. */
  def sqlMinhashSlot(x: String, ab: (Long, Long)): String =
    s"(($x * ${ab._1} + ${ab._2}) % $P)"

  /** DuckDB: round a DOUBLE the way Spark does. Spark's `round` rounds the
    * SHORTEST decimal representation of the double (BigDecimal.valueOf +
    * HALF_UP) while DuckDB rounds the true binary value — they disagree when
    * the shortest repr lands exactly on a half-digit (e.g. 0.61434999…95
    * prints as "0.61435": Spark → 0.6144, DuckDB → 0.6143). The VARCHAR
    * round-trip reproduces Spark's reading; DECIMAL round is half-away-from-
    * zero, = HALF_UP for the non-negative values we emit.
    */
  def sqlRound(e: String, n: Int): String =
    s"round((($e)::VARCHAR)::DECIMAL(38,18), $n)::DOUBLE"
}
