package graft.crypto

import java.math.BigInteger
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-JVM deterministic ECDSA to PUBLISHED vectors:
  *
  *  - RFC 6979 appendix A.2.5 (NIST P-256, SHA-256, message "sample") — the
  *    RFC's own worked example, pinning the HMAC-DRBG nonce derivation
  *    (k), r, and s exactly.
  *  - The standard secp256k1 RFC-6979 vectors circulated by the Bitcoin
  *    test suites (priv=1 / "Satoshi Nakamoto" etc.), low-s normalized —
  *    cross-checked against an independent from-the-RFC reference
  *    implementation before being baked in here.
  *
  * Plus structural properties: derived public keys are on-curve, sign →
  * verify roundtrips, tampered digests/signatures are rejected, and low-s
  * normalization holds.
  */
class EcdsaSpec extends AnyFunSuite {
  private def h(s: String) = new BigInteger(s, 16)
  private def sha(m: String): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(m.getBytes("UTF-8"))

  test("RFC 6979 A.2.5: P-256/SHA-256 'sample' — published k, r, s") {
    val c = EcCurve.p256
    val priv = h("C9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721")
    val digest = sha("sample")
    assert(Ecdsa.rfc6979K(digest, priv, c) ===
      h("A6E3C57DD01ABE90086538398355DD4C3B17AA873382B0F24D6129493D8AAD60"))
    val sig = Ecdsa.sign(digest, priv, c, lowS = false)
    assert(sig.r === h("EFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716"))
    assert(sig.s === h("F7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8"))
  }

  // (k, r, s) low-s vectors; k pins the DRBG, (r, s) the point math.
  private val secpVectors = Seq(
    (BigInteger.ONE, "Satoshi Nakamoto",
      "8F8A276C19F4149656B280621E358CCE24F5F52542772691EE69063B74F15D15",
      "934B1EA10A4B3C1757E2B0C017D0B6143CE3C9A7E6A4A49860D7A6AB210EE3D8",
      "2442CE9D2B916064108014783E923EC36B49743E2FFA1C4496F01A512AAFD9E5"),
    (BigInteger.ONE,
      "All those moments will be lost in time, like tears in rain. Time to die...",
      "38AA22D72376B4DBC472E06C3BA403EE0A394DA63FC58D88686C611ABA98D6B3",
      "8600DBD41E348FE5C9465AB92D23E3DB8B98B873BEECD930736488696438CB6B",
      "547FE64427496DB33BF66019DACBF0039C04199ABB0122918601DB38A72CFC21"),
    (h("F8B8AF8CE3C7CCA5E300D33939540C10D45CE001B8F252BFBC57BA0342904181"),
      "Alan Turing",
      "525A82B70E67874398067543FD84C83D30C175FDC45FDEEE082FE13B1D7CFDF1",
      "7063AE83E7F62BBB171798131B4A0564B956930092B33B07B395615D9EC7E15C",
      "58DFCC1E00A35E1572F366FFE34BA0FC47DB1E7189759B9FB233C5B05AB388EA"),
  )

  test("secp256k1: standard RFC-6979 vectors (low-s)") {
    val c = EcCurve.secp256k1
    for ((priv, msg, ek, er, es) <- secpVectors) {
      val digest = sha(msg)
      assert(Ecdsa.rfc6979K(digest, priv, c) === h(ek), s"k for '$msg'")
      val sig = Ecdsa.sign(digest, priv, c)
      assert(sig.r === h(er), s"r for '$msg'")
      assert(sig.s === h(es), s"s for '$msg'")
      assert(sig.s.compareTo(c.halfN) <= 0, "low-s normalization")
    }
  }

  test("derived public keys are on-curve; sign→verify roundtrips; tampering rejected") {
    val c = EcCurve.secp256k1
    for (seed <- 1 to 5) {
      val priv = h(Ecdsa.hex(sha(s"key-$seed")))
        .mod(c.n.subtract(BigInteger.ONE)).add(BigInteger.ONE)
      val (qx, qy) = Ecdsa.derivePub(priv, c)
      assert(Ecdsa.onCurve(qx, qy, c))
      val digest = sha(s"payload-$seed")
      val sig = Ecdsa.sign(digest, priv, c)
      assert(Ecdsa.verify(digest, qx, qy, sig, c))
      // determinism: identical input → identical signature
      assert(Ecdsa.sign(digest, priv, c) === sig)
      // wrong digest, wrong key, malleated r all rejected
      assert(!Ecdsa.verify(sha(s"payload-${seed}x"), qx, qy, sig, c))
      val (ox, oy) = Ecdsa.derivePub(priv.add(BigInteger.ONE), c)
      assert(!Ecdsa.verify(digest, ox, oy, sig, c))
      assert(!Ecdsa.verify(digest, qx, qy,
        sig.copy(r = sig.r.add(BigInteger.ONE)), c))
      // high-s twin still verifies (ECDSA is s-symmetric) — the engine
      // EMITS only low-s, but verification accepts both
      assert(Ecdsa.verify(digest, qx, qy, sig.copy(s = c.n.subtract(sig.s)), c))
    }
  }

  test("RFC 6979 A.2.5 verify side: published signature accepted under published key") {
    val c = EcCurve.p256
    val priv = h("C9AFA9D845BA75166B5C215767B1D6934E50C3DB36E89B127B8A622B120F6721")
    val (qx, qy) = Ecdsa.derivePub(priv, c)
    // Ux / Uy as published in RFC 6979 A.2.5
    assert(qx === h("60FED4BA255A9D31C961EB74C6356D68C049B8923B61FA6CE669622E60F29FB6"))
    assert(qy === h("7903FE1008B8BC99A41AE9E95628BC64F2F1B20C2D7E9F5177A3C294D4462299"))
    val sig = Ecdsa.Sig(
      h("EFD48B2AACB6A8FD1140DD9CD45E81D69D2C877B56AAF991C34D0EA84EAF3716"),
      h("F7CB1C942D657C41D436C7A1B6E29F65F3E900DBB9AFF4064DC4AB2F843ACDA8"))
    assert(Ecdsa.verify(sha("sample"), qx, qy, sig, c))
  }
}
