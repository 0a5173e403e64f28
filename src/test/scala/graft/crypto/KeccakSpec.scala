package graft.crypto

import java.math.BigInteger

import org.scalatest.funsuite.AnyFunSuite

/** Pins Keccak-256 to published vectors (the original-padding Keccak, as
  * Ethereum uses — distinct from FIPS-202 SHA3-256) and the address
  * derivation to the universally-known address of private key 1.
  */
class KeccakSpec extends AnyFunSuite {
  private def k(s: String): String =
    Ecdsa.hex(Keccak256.hash(s.getBytes("UTF-8")))

  test("published Keccak-256 vectors") {
    assert(k("") ===
      "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert(k("abc") ===
      "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert(k("The quick brown fox jumps over the lazy dog") ===
      "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15")
    assert(k("testing") ===
      "5f16f4c7f149ac4f9510d9cf8cf384038ad348b3bcdc01915f95de12df9d1b02")
  }

  test("multi-block input (length > rate 136) round-trips the absorb loop") {
    // 200 'a' bytes spans two absorb blocks; value cross-checked against an
    // independent from-spec implementation
    val long = "a" * 200
    assert(k(long) ===
      "96ea54061def936c4be90b518992fdc6f12f535068a256229aca54267b4d084d")
    assert(k(long) !== k("a" * 199))
  }

  test("Ethereum address of private key 1 (EIP-55 checksummed)") {
    val c = EcCurve.secp256k1
    val (qx, qy) = Ecdsa.derivePub(BigInteger.ONE, c)
    assert(Keccak256.ethAddress(qx, qy) ===
      "0x7E5F4552091A69125d5DfCb7b8C2659029395Bdf")
  }

  test("EIP-55 checksum is self-consistent under case-folding") {
    val c = EcCurve.secp256k1
    for (seed <- 2 to 4) {
      val (qx, qy) = Ecdsa.derivePub(BigInteger.valueOf(seed.toLong), c)
      val addr = Keccak256.ethAddress(qx, qy)
      assert(addr.matches("0x[0-9a-fA-F]{40}"))
      // re-deriving the checksum from the lowercased form reproduces it
      val raw = addr.drop(2).toLowerCase
      val check = Ecdsa.hex(Keccak256.hash(raw.getBytes("US-ASCII")))
      val re = "0x" + raw.zipWithIndex.map { case (ch, i) =>
        if (ch.isLetter && Character.digit(check(i), 16) >= 8) ch.toUpper else ch
      }.mkString
      assert(re === addr)
    }
  }
}
