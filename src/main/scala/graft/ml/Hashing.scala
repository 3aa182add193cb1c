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

  /** Salted variant: independent hash function per salt (the MinHash family). */
  def oracleHash(c: Column, salt: Int): Column =
    oracleHash(concat(lit(salt.toString), lit(":"), c))

  /** Production-path hash (xxhash64, codegen'd, no cryptographic cost). */
  def fastHash(c: Column, salt: Int = 0): Column = xxhash64(lit(salt), c)

  /** DuckDB SQL snippet mirroring [[oracleHash]] for oracle authoring. */
  def duckdbHashSql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::bigint)"

  def duckdbHashSql(expr: String, salt: Int): String =
    duckdbHashSql(s"'$salt' || ':' || ($expr)")
}
