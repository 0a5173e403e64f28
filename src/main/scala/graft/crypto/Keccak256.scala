package graft.crypto

import java.math.BigInteger

/** Pure-JVM Keccak-256 (the ORIGINAL Keccak padding 0x01…0x80, as used by
  * Ethereum — NOT FIPS-202 SHA3-256, whose domain byte is 0x06), written
  * from the public Keccak specification: Keccak-f[1600], rate 1088 bits,
  * little-endian lanes. Verified in KeccakSpec against the published
  * empty-string / "abc" vectors and the universally-known Ethereum address
  * of private key 1.
  *
  * Together with [[Ecdsa]] this completes the reference key shape
  * (scripts/seed-keys.ts:58–63: `wallet.address` is the EIP-55-checksummed
  * last-20-bytes of keccak256(uncompressed pubkey)) with real
  * cryptography instead of the sha2 surrogate.
  */
object Keccak256 {
  private val RC: Array[Long] = Array(
    0x0000000000000001L, 0x0000000000008082L, 0x800000000000808AL, 0x8000000080008000L,
    0x000000000000808BL, 0x0000000080000001L, 0x8000000080008081L, 0x8000000000008009L,
    0x000000000000008AL, 0x0000000000000088L, 0x0000000080008009L, 0x000000008000000AL,
    0x000000008000808BL, 0x800000000000008BL, 0x8000000000008089L, 0x8000000000008003L,
    0x8000000000008002L, 0x8000000000000080L, 0x000000000000800AL, 0x800000008000000AL,
    0x8000000080008081L, 0x8000000000008080L, 0x0000000080000001L, 0x8000000080008008L)

  /** Rotation offsets, indexed rot(x)(y). */
  private val ROT: Array[Array[Int]] = Array(
    Array(0, 36, 3, 41, 18), Array(1, 44, 10, 45, 2), Array(62, 6, 43, 15, 61),
    Array(28, 55, 25, 21, 56), Array(27, 20, 39, 8, 14))

  private val Rate = 136 // bytes: (1600 − 2·256) / 8

  private def keccakF(a: Array[Long]): Unit = {
    // state layout: a(x + 5y)
    val c = new Array[Long](5)
    val d = new Array[Long](5)
    val b = new Array[Long](25)
    var rnd = 0
    while (rnd < 24) {
      var x = 0
      while (x < 5) {
        c(x) = a(x) ^ a(x + 5) ^ a(x + 10) ^ a(x + 15) ^ a(x + 20)
        x += 1
      }
      x = 0
      while (x < 5) {
        d(x) = c((x + 4) % 5) ^ java.lang.Long.rotateLeft(c((x + 1) % 5), 1)
        var y = 0
        while (y < 5) { a(x + 5 * y) ^= d(x); y += 1 }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          b(y + 5 * ((2 * x + 3 * y) % 5)) =
            java.lang.Long.rotateLeft(a(x + 5 * y), ROT(x)(y))
          y += 1
        }
        x += 1
      }
      x = 0
      while (x < 5) {
        var y = 0
        while (y < 5) {
          a(x + 5 * y) = b(x + 5 * y) ^ (~b((x + 1) % 5 + 5 * y) & b((x + 2) % 5 + 5 * y))
          y += 1
        }
        x += 1
      }
      a(0) ^= RC(rnd)
      rnd += 1
    }
  }

  def hash(input: Array[Byte]): Array[Byte] = {
    val padLen = Rate - (input.length % Rate)
    val p = java.util.Arrays.copyOf(input, input.length + padLen)
    p(input.length) = 0x01
    p(p.length - 1) = (p(p.length - 1) | 0x80).toByte
    val a = new Array[Long](25)
    var off = 0
    while (off < p.length) {
      var i = 0
      while (i < Rate / 8) {
        var lane = 0L
        var j = 7
        while (j >= 0) { lane = (lane << 8) | (p(off + 8 * i + j) & 0xffL); j -= 1 }
        a(i) ^= lane
        i += 1
      }
      keccakF(a)
      off += Rate
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) { out(8 * i + j) = ((a(i) >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  /** Ethereum address of an affine secp256k1 public point: '0x' + EIP-55
    * checksummed hex of keccak256(X ‖ Y)[12..31] (uncompressed encoding
    * without the 0x04 tag byte). */
  def ethAddress(qx: BigInteger, qy: BigInteger): String = {
    val pub = Ecdsa.toFixed(qx, 32) ++ Ecdsa.toFixed(qy, 32)
    val raw = Ecdsa.hex(hash(pub).drop(12))
    // EIP-55: uppercase hex letter i iff nibble i of keccak256(lowercase
    // address hex) ≥ 8
    val check = Ecdsa.hex(hash(raw.getBytes("US-ASCII")))
    val sb = new StringBuilder("0x")
    var i = 0
    while (i < raw.length) {
      val ch = raw.charAt(i)
      sb.append(if (ch.isLetter && Character.digit(check.charAt(i), 16) >= 8) ch.toUpper else ch)
      i += 1
    }
    sb.toString
  }
}
