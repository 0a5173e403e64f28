package graft.crypto

import java.math.BigInteger

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Short-Weierstrass curve domain parameters y² = x³ + ax + b over F_p with
  * base point (gx, gy) of prime order n. */
final case class EcCurve(p: BigInteger, a: BigInteger, b: BigInteger,
    gx: BigInteger, gy: BigInteger, n: BigInteger) {
  val qlenBytes: Int = (n.bitLength + 7) / 8
  val halfN: BigInteger = n.shiftRight(1)
}

object EcCurve {
  private def h(s: String) = new BigInteger(s, 16)

  /** The Bitcoin/Ethereum curve (SEC 2 §2.4.1): a = 0, b = 7. */
  val secp256k1: EcCurve = EcCurve(
    p = h("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F"),
    a = BigInteger.ZERO,
    b = BigInteger.valueOf(7),
    gx = h("79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798"),
    gy = h("483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8"),
    n = h("FFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141"))

  /** NIST P-256 (FIPS 186-4 D.1.2.3) — carried only so the RFC 6979 A.2.5
    * published test vector can pin the nonce derivation in the spec. */
  val p256: EcCurve = EcCurve(
    p = h("FFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF"),
    a = h("FFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFC"),
    b = h("5AC635D8AA3A93E7B3EBBD55769886BC651D06B0CC53B0F63BCE3C3E27D2604B"),
    gx = h("6B17D1F2E12C4247F8BCE6E563A440F277037D812DEB33A0F4A13945D898C296"),
    gy = h("4FE342E2FE1A7F9B8EE7EB4A7C0F9E162BCE33576B315ECECBB6406837BF51F5"),
    n = h("FFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551"))
}

/** Pure-JVM deterministic ECDSA: RFC 6979 nonce derivation (HMAC-SHA256
  * DRBG, §3.2) + Jacobian-coordinate point arithmetic over
  * `java.math.BigInteger` — no dependencies beyond the JDK (javax.crypto
  * ships HMAC). This is the real signing behavior the reference delegates
  * to ethers.js (`wallet.signTransaction`, /root/reference/signer/
  * index.js:295, key shape scripts/seed-keys.ts:58): secp256k1, RFC-6979
  * deterministic k, low-s normalized — re-implemented from the public
  * specifications (RFC 6979, SEC 1) rather than substituted. The sha2
  * surrogate (graft.ops.Pipeline.keyring) remains the DuckDB-oracle-checked
  * twin; this object is the engine's actual signature seam and is verified
  * in EcdsaSpec against the RFC's own published vector (P-256 A.2.5) and
  * the standard secp256k1 vectors, cross-checked against an independent
  * implementation.
  *
  * Determinism matters for the engine, not just for key safety: a
  * deterministic signature column is idempotent under replay (S4) and
  * comparable across reruns, the same property every other operator here
  * guarantees.
  */
object Ecdsa {
  final case class Sig(r: BigInteger, s: BigInteger) {
    /** 64-byte r||s hex, the compact signature encoding. */
    def toHex(qlenBytes: Int): String =
      Ecdsa.hex(Ecdsa.toFixed(r, qlenBytes)) + Ecdsa.hex(Ecdsa.toFixed(s, qlenBytes))
  }

  // ---------------------------------------------------------------------
  // Jacobian point arithmetic: (X, Y, Z) represents (X/Z², Y/Z³); Z = 0 is
  // the point at infinity. One modInverse per scalar multiplication
  // (affine arithmetic would pay one per point ADDITION — ~512 per mul).
  // ---------------------------------------------------------------------
  private final class JPoint(val x: BigInteger, val y: BigInteger, val z: BigInteger) {
    def isInfinity: Boolean = z.signum == 0
  }
  private val ZERO = BigInteger.ZERO
  private val ONE = BigInteger.ONE
  private val TWO = BigInteger.valueOf(2)
  private val THREE = BigInteger.valueOf(3)
  private val FOUR = BigInteger.valueOf(4)
  private val EIGHT = BigInteger.valueOf(8)
  private def inf = new JPoint(ONE, ONE, ZERO)

  private def dbl(pt: JPoint, c: EcCurve): JPoint = {
    if (pt.isInfinity || pt.y.signum == 0) return inf
    val p = c.p
    val y2 = pt.y.multiply(pt.y).mod(p)
    val s = FOUR.multiply(pt.x).multiply(y2).mod(p)
    val z2 = pt.z.multiply(pt.z).mod(p)
    val m = THREE.multiply(pt.x).multiply(pt.x)
      .add(c.a.multiply(z2).multiply(z2)).mod(p)
    val x3 = m.multiply(m).subtract(s.add(s)).mod(p)
    val y3 = m.multiply(s.subtract(x3))
      .subtract(EIGHT.multiply(y2).multiply(y2)).mod(p)
    val z3 = TWO.multiply(pt.y).multiply(pt.z).mod(p)
    new JPoint(x3, y3, z3)
  }

  /** Mixed addition: Jacobian + affine (ax, ay). */
  private def addMixed(pt: JPoint, ax: BigInteger, ay: BigInteger, c: EcCurve): JPoint = {
    if (pt.isInfinity) return new JPoint(ax, ay, ONE)
    val p = c.p
    val z1z1 = pt.z.multiply(pt.z).mod(p)
    val u2 = ax.multiply(z1z1).mod(p)
    val s2 = ay.multiply(pt.z).multiply(z1z1).mod(p)
    if (pt.x.compareTo(u2) == 0) {
      return if (pt.y.compareTo(s2) == 0) dbl(pt, c) else inf
    }
    val h = u2.subtract(pt.x).mod(p)
    val r = s2.subtract(pt.y).mod(p)
    val h2 = h.multiply(h).mod(p)
    val h3 = h.multiply(h2).mod(p)
    val x1h2 = pt.x.multiply(h2).mod(p)
    val x3 = r.multiply(r).subtract(h3).subtract(x1h2.add(x1h2)).mod(p)
    val y3 = r.multiply(x1h2.subtract(x3)).subtract(pt.y.multiply(h3)).mod(p)
    val z3 = pt.z.multiply(h).mod(p)
    new JPoint(x3, y3, z3)
  }

  /** Double-and-add scalar multiplication of the AFFINE point (ax, ay).
    * Not constant-time — this engine signs with data-pipeline test keys,
    * not production secrets; the seam documents the tradeoff. */
  private def mul(k: BigInteger, ax: BigInteger, ay: BigInteger, c: EcCurve): JPoint = {
    var r = inf
    var i = k.bitLength - 1
    while (i >= 0) {
      r = dbl(r, c)
      if (k.testBit(i)) r = addMixed(r, ax, ay, c)
      i -= 1
    }
    r
  }

  private def toAffine(pt: JPoint, c: EcCurve): Option[(BigInteger, BigInteger)] = {
    if (pt.isInfinity) return None
    val zi = pt.z.modInverse(c.p)
    val zi2 = zi.multiply(zi).mod(c.p)
    Some((pt.x.multiply(zi2).mod(c.p), pt.y.multiply(zi2).multiply(zi).mod(c.p)))
  }

  /** Public key Q = priv·G, affine. */
  def derivePub(priv: BigInteger, c: EcCurve): (BigInteger, BigInteger) =
    toAffine(mul(priv, c.gx, c.gy, c), c)
      .getOrElse(throw new IllegalArgumentException("invalid private key"))

  // ---------------------------------------------------------------------
  // RFC 6979 deterministic nonce
  // ---------------------------------------------------------------------
  def toFixed(x: BigInteger, len: Int): Array[Byte] = {
    val raw = x.toByteArray
    val out = new Array[Byte](len)
    if (raw.length <= len) System.arraycopy(raw, 0, out, len - raw.length, raw.length)
    else System.arraycopy(raw, raw.length - len, out, 0, len) // strip sign byte
    out
  }

  def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  private def hmacSha256(key: Array[Byte], data: Array[Byte]*): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    data.foreach(mac.update)
    mac.doFinal()
  }

  /** bits2int (RFC 6979 §2.3.2): leftmost qlen bits of the octet string. */
  private def bits2int(b: Array[Byte], c: EcCurve): BigInteger = {
    val x = new BigInteger(1, b)
    val shift = b.length * 8 - c.n.bitLength
    if (shift > 0) x.shiftRight(shift) else x
  }

  /** The HMAC-SHA256 DRBG of RFC 6979 §3.2 — k for signing `digest` under
    * `priv`. hlen = qlen = 256 here, so each candidate is one V block. */
  def rfc6979K(digest: Array[Byte], priv: BigInteger, c: EcCurve): BigInteger = {
    val x = toFixed(priv, c.qlenBytes)
    val h1 = toFixed(bits2int(digest, c).mod(c.n), c.qlenBytes) // bits2octets
    var v = Array.fill[Byte](32)(0x01)
    var k = Array.fill[Byte](32)(0x00)
    k = hmacSha256(k, v, Array[Byte](0x00), x, h1)
    v = hmacSha256(k, v)
    k = hmacSha256(k, v, Array[Byte](0x01), x, h1)
    v = hmacSha256(k, v)
    while (true) {
      v = hmacSha256(k, v)
      val cand = bits2int(v, c)
      if (cand.signum > 0 && cand.compareTo(c.n) < 0) return cand
      k = hmacSha256(k, v, Array[Byte](0x00))
      v = hmacSha256(k, v)
    }
    throw new IllegalStateException("unreachable")
  }

  /** Sign a message DIGEST (the caller hashes; the engine signs
    * sha256(payload)). `lowS = true` canonicalizes s to min(s, n−s) — the
    * Ethereum/Bitcoin convention; `false` is the plain RFC 6979 output the
    * published vectors use. */
  def sign(digest: Array[Byte], priv: BigInteger, c: EcCurve,
      lowS: Boolean = true): Sig = {
    require(priv.signum > 0 && priv.compareTo(c.n) < 0, "private key out of range")
    val h = bits2int(digest, c).mod(c.n)
    var k = rfc6979K(digest, priv, c)
    var out: Sig = null
    while (out == null) {
      val r = toAffine(mul(k, c.gx, c.gy, c), c).map(_._1.mod(c.n)).getOrElse(ZERO)
      if (r.signum != 0) {
        val s = k.modInverse(c.n).multiply(h.add(r.multiply(priv))).mod(c.n)
        if (s.signum != 0)
          out = Sig(r, if (lowS && s.compareTo(c.halfN) > 0) c.n.subtract(s) else s)
      }
      // r == 0 / s == 0 is a ~2^-256 event; RFC 6979 §3.2.h restarts the
      // DRBG — emulated by re-deriving from the rejected k's octets.
      if (out == null) k = rfc6979K(toFixed(k, c.qlenBytes), priv, c)
    }
    out
  }

  /** Standard ECDSA verification of `sig` on `digest` under affine public
    * key (qx, qy). Accepts both s and n−s (verification is s-symmetric). */
  def verify(digest: Array[Byte], qx: BigInteger, qy: BigInteger, sig: Sig,
      c: EcCurve): Boolean = {
    if (sig.r.signum <= 0 || sig.r.compareTo(c.n) >= 0) return false
    if (sig.s.signum <= 0 || sig.s.compareTo(c.n) >= 0) return false
    val h = bits2int(digest, c).mod(c.n)
    val w = sig.s.modInverse(c.n)
    val u1 = h.multiply(w).mod(c.n)
    val u2 = sig.r.multiply(w).mod(c.n)
    val a = toAffine(mul(u1, c.gx, c.gy, c), c)
    val bJ = mul(u2, qx, qy, c)
    val sum = a match {
      case Some((ax, ay)) => addMixed(bJ, ax, ay, c)
      case None => bJ
    }
    toAffine(sum, c).exists(_._1.mod(c.n).compareTo(sig.r) == 0)
  }

  /** On-curve check for an affine point. */
  def onCurve(x: BigInteger, y: BigInteger, c: EcCurve): Boolean =
    y.multiply(y).mod(c.p).compareTo(
      x.multiply(x).multiply(x).add(c.a.multiply(x)).add(c.b).mod(c.p)) == 0
}
