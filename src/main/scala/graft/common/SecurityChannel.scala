package graft.common

import java.security.SecureRandom
import java.util.Base64
import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

/**
 * Encrypted pipeline-variable support.
 *
 * The reference decrypts AES-encrypted variable values via jasypt
 * (PBEWithHMACSHA512AndAES_256; reference: configuration/
 * ConfigurationManager.decrypt -> common/security/SecurityChannel.scala:
 * 24-31). jasypt is not on this offline classpath, so this is a JDK-only
 * re-design with equivalent properties: PBKDF2-HMAC-SHA512 key derivation
 * + AES-256-GCM (authenticated, random IV, salt||iv||ciphertext payload,
 * base64-wrapped with an `enc:` tag).
 */
object SecurityChannel {
  private val Tag = "enc:"
  private val Iterations = 120000
  private val KeyBits = 256
  private val GcmTagBits = 128
  private val SaltLen = 16
  private val IvLen = 12

  def isEncrypted(value: String): Boolean = value != null && value.startsWith(Tag)

  private def deriveKey(passphrase: String, salt: Array[Byte]): SecretKeySpec = {
    val factory = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA512")
    val spec = new PBEKeySpec(passphrase.toCharArray, salt, Iterations, KeyBits)
    new SecretKeySpec(factory.generateSecret(spec).getEncoded, "AES")
  }

  def encrypt(plain: String, passphrase: String): String = {
    val rnd = new SecureRandom()
    val salt = new Array[Byte](SaltLen); rnd.nextBytes(salt)
    val iv = new Array[Byte](IvLen); rnd.nextBytes(iv)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, deriveKey(passphrase, salt), new GCMParameterSpec(GcmTagBits, iv))
    val ct = cipher.doFinal(plain.getBytes("UTF-8"))
    Tag + Base64.getEncoder.encodeToString(salt ++ iv ++ ct)
  }

  def decrypt(value: String, passphrase: String): String = {
    require(isEncrypted(value), "not an encrypted value")
    val raw = Base64.getDecoder.decode(value.stripPrefix(Tag))
    val salt = raw.slice(0, SaltLen)
    val iv = raw.slice(SaltLen, SaltLen + IvLen)
    val ct = raw.drop(SaltLen + IvLen)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, deriveKey(passphrase, salt), new GCMParameterSpec(GcmTagBits, iv))
    new String(cipher.doFinal(ct), "UTF-8")
  }

  /** Decrypt every `enc:` value in a variable map; the passphrase comes
   *  from `security.master-key` in config or the GRAFT_MASTER_KEY env var. */
  def decryptVariables(vars: Map[String, String], config: Map[String, String]): Map[String, String] = {
    lazy val key = config.get("security.master-key")
      .orElse(sys.env.get("GRAFT_MASTER_KEY"))
      .getOrElse(throw new IllegalStateException(
        "encrypted variable present but no security.master-key / GRAFT_MASTER_KEY configured"))
    vars.map { case (k, v) => k -> (if (isEncrypted(v)) decrypt(v, key) else v) }
  }
}
