package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, cross-engine-reproducible hash family used by the dedup /
 * fingerprint operators.
 *
 * Two families:
 *  - `fast*`: xxhash64 — Spark-native codegen'd hash, the production path at
 *    100 TB scale (no md5 cost);
 *  - `oracle*`: md5-derived 60-bit values — bit-identical in any engine with
 *    a standard MD5 (used by the DuckDB-oracle-checked queries; DuckDB
 *    equivalent: `('0x' || substr(md5(x), 1, 15))::bigint`).
 */
object Hashing {

  /** 60-bit non-negative hash from md5 — reproducible across engines. */
  def oracleHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Production-path hash (xxhash64, codegen'd, no cryptographic cost). */
  def fastHash(c: Column, salt: Int = 0): Column = xxhash64(lit(salt), c)

  /**
   * Derived hash family: k independent-enough permutations of ONE base
   * hash — `h_j = (a_j * (base & 2^30-1) + c_j) mod (2^31-1)` — so MinHash
   * costs one md5 per shingle instead of k. Operands stay below 2^31, so
   * the product fits in int64 in any engine (no overflow divergence).
   * DuckDB mirror: [[duckdbDerivedSql]].
   */
  private val derivedA = Array(0x9E3779B1L, 0x85EBCA77L, 0xC2B2AE3DL, 0x27D4EB2FL,
    0x165667B1L, 0xD3A2646CL, 0xFD7046C5L, 0xB55A4F09L,
    0x5BD1E995L, 0xCC9E2D51L, 0x1B873593L, 0x4CF5AD43L,
    0x2545F491L, 0x6C62272EL, 0x9E3779B9L, 0x7FEB352DL).map(_ & 0x7FFFFFFFL)
  private val derivedC = Array(0x1CAD21F7L, 0x3C6EF372L, 0xDAA66D2BL, 0x78DDE6E5L,
    0xA511E9B3L, 0x2E1F6B51L, 0x8F1BBCDCL, 0x61C88647L,
    0xD1B54A33L, 0xABCF1E4DL, 0x19D699A5L, 0x4F6CDD1DL,
    0x87C37B91L, 0xFF51AFD7L, 0xC4CEB9FEL, 0x2127599BL).map(_ & 0x7FFFFFFFL)

  /** Largest supported derived-hash family (the constant tables above). */
  val maxDerivedHashes: Int = 16

  /** Raw coefficient access for executor-side Scala mirrors of the derived
   *  family (e.g. [[Dedup.minHashSignaturesInline]]'s typed map). */
  private[ml] def derivedCoeffs(j: Int): (Long, Long) = (derivedA(j), derivedC(j))

  def derivedHash(base: Column, j: Int): Column = {
    require(j >= 0 && j < maxDerivedHashes,
      s"derivedHash family has $maxDerivedHashes members, got index $j " +
        "(check the numHashes property)")
    (lit(derivedA(j)) * base.bitwiseAND(lit(1073741823L)) + lit(derivedC(j))) % lit(2147483647L)
  }

  /** DuckDB SQL mirroring [[derivedHash]] over a base-hash expression. */
  def duckdbDerivedSql(baseExpr: String, j: Int): String = {
    require(j >= 0 && j < maxDerivedHashes,
      s"derivedHash family has $maxDerivedHashes members, got index $j")
    s"((${derivedA(j)} * (($baseExpr) & 1073741823) + ${derivedC(j)}) % 2147483647)"
  }

  /** DuckDB SQL snippet mirroring [[oracleHash]] for oracle authoring. */
  def duckdbHashSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::bigint)"

  /** Executor-side JVM mirror of [[oracleHash]] — the high 60 bits of
   *  md5(UTF-8 bytes) as a nonnegative Long (first 15 hex digits), for
   *  typed operators that hash inline instead of paying an interpreted
   *  Column per element (same arithmetic as
   *  [[Dedup.minHashSignaturesInline]]'s closure). Callers own the
   *  MessageDigest instance (one per partition, reused across rows). */
  private[ml] def jvmOracleHash(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = d(i) & 0xff
      v = if (i < 7) (v << 8) | b else (v << 4) | (b >> 4)
      i += 1
    }
    v
  }
}
