package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

import graft.crypto.{EcCurve, Ecdsa, Keccak256}

/** Spark column surface for the real signature seam
  * ([[graft.crypto.Ecdsa]]): deterministic RFC-6979 ECDSA over secp256k1.
  * UDFs, deliberately — the per-row work is hundreds of BigInteger
  * multiplications, so codegen'd expression plumbing would save nothing
  * (the JNI-free crypto IS the cost), and a UDF keeps the crypto free of
  * any Spark dependency. Each call is pure and deterministic, so the
  * column is idempotent under replay and stable across retries —
  * the same S4 contract as the rest of the signing pipeline.
  */
object SignFns {
  private val c: EcCurve = EcCurve.secp256k1

  /** Hex (possibly sha256 output) → private scalar in [1, n−1], total on
    * any 256-bit input: values ≥ n−1 wrap by mod. Deterministic seam from
    * the surrogate keyring's `priv` hex to a REAL secp256k1 key. */
  def privFromHex(hex: String): BigInteger =
    new BigInteger(hex, 16).mod(c.n.subtract(BigInteger.ONE)).add(BigInteger.ONE)

  private def digestOf(hexMsg: String): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(hexMsg.getBytes("UTF-8"))

  /** sign(privHex, payload) → 128-char r||s hex (low-s). The payload is
    * sha256-digested, then signed — the signer Lambda's hash-then-sign
    * shape (reference signer/index.js:133–137, 295). */
  val ecdsaSign: UserDefinedFunction = udf { (privHex: String, payload: String) =>
    if (privHex == null || payload == null) null
    else Ecdsa.sign(digestOf(payload), privFromHex(privHex), c).toHex(c.qlenBytes)
  }

  /** verify(qxHex, qyHex, payload, sigHex) → boolean. */
  val ecdsaVerify: UserDefinedFunction = udf {
    (qx: String, qy: String, payload: String, sigHex: String) =>
      if (qx == null || qy == null || payload == null || sigHex == null ||
        sigHex.length != c.qlenBytes * 4) false
      else {
        val r = new BigInteger(sigHex.substring(0, c.qlenBytes * 2), 16)
        val s = new BigInteger(sigHex.substring(c.qlenBytes * 2), 16)
        Ecdsa.verify(digestOf(payload), new BigInteger(qx, 16),
          new BigInteger(qy, 16), Ecdsa.Sig(r, s), c)
      }
  }

  /** derive_pub(privHex) → struct(qx hex, qy hex) — run once per keyring
    * row (bounded), never per record. */
  val derivePub: UserDefinedFunction = udf { (privHex: String) =>
    if (privHex == null) null
    else {
      val (qx, qy) = Ecdsa.derivePub(privFromHex(privHex), c)
      (Ecdsa.hex(Ecdsa.toFixed(qx, c.qlenBytes)), Ecdsa.hex(Ecdsa.toFixed(qy, c.qlenBytes)))
    }
  }

  /** eth_address(privHex) → the EIP-55-checksummed Ethereum address of the
    * derived public key (keccak256 of the uncompressed point, last 20
    * bytes) — the reference's `wallet.address` (scripts/seed-keys.ts:60),
    * real instead of surrogate. Bounded use only: once per keyring row. */
  val ethAddress: UserDefinedFunction = udf { (privHex: String) =>
    if (privHex == null) null
    else {
      val (qx, qy) = Ecdsa.derivePub(privFromHex(privHex), c)
      Keccak256.ethAddress(qx, qy)
    }
  }

  def sign(priv: Column, payload: Column): Column = ecdsaSign(priv, payload)
  def verify(qx: Column, qy: Column, payload: Column, sig: Column): Column =
    ecdsaVerify(qx, qy, payload, sig)
  def pub(priv: Column): Column = derivePub(priv)
}
