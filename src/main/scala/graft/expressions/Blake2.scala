package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Dependency-free BLAKE2 (RFC 7693) kernels for the reference's
  * `digest(value, 'blake2b' | 'blake2s')` methods (reference
  * functions.rs:62-70) — the JVM provides MD5/SHA but no BLAKE2, and no
  * external library may be added, so the compression functions are
  * implemented here directly from the RFC (public specification; test
  * vectors from RFC 7693 Appendix A/B are asserted in Blake2Spec).
  *
  * Unkeyed, full-length digests (64-byte BLAKE2b-512, 32-byte BLAKE2s-256 —
  * the defaults DataFusion's digest exposes), hex-encoded to match the
  * md5/sha2 column type contract. blake3 is a different (non-RFC) algorithm
  * and remains documented-unsupported.
  */
object Blake2 {

  // --- BLAKE2b: 64-bit words, 128-byte blocks, 12 rounds -------------------

  private val IVb = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  // message schedule permutations (RFC 7693 §2.7); rounds 10/11 of BLAKE2b
  // reuse rows 0/1
  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  def blake2b(input: Array[Byte], outLen: Int = 64): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64, s"blake2b outLen=$outLen")
    val h = IVb.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong // param block: digest len, no key
    val m = new Array[Long](16)
    var t = 0L
    var off = 0
    val len = input.length
    // all blocks before the last (the final block — even a full one — is
    // compressed with the finalization flag)
    while (len - off > 128) {
      loadB(input, off, m)
      t += 128
      compressB(h, m, t, last = false)
      off += 128
    }
    val rem = len - off
    val pad = new Array[Byte](128)
    System.arraycopy(input, off, pad, 0, rem)
    loadB(pad, 0, m)
    t += rem
    compressB(h, m, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i >> 3) >>> (8 * (i & 7))) & 0xffL).toByte
      i += 1
    }
    out
  }

  private def loadB(buf: Array[Byte], off: Int, m: Array[Long]): Unit = {
    var i = 0
    while (i < 16) {
      var v = 0L
      var j = 7
      while (j >= 0) { v = (v << 8) | (buf(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = v
      i += 1
    }
  }

  private def compressB(h: Array[Long], m: Array[Long], t: Long,
                        last: Boolean): Unit = {
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IVb, 0, v, 8, 8)
    v(12) ^= t // low word of the offset counter; high word stays 0 (< 2^64 B)
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      gB(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      gB(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      gB(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      gB(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      gB(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      gB(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      gB(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      gB(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    var i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  @inline private def gB(v: Array[Long], a: Int, b: Int, c: Int, d: Int,
                         x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
  }

  // --- BLAKE2s: 32-bit words, 64-byte blocks, 10 rounds --------------------

  private val IVs = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  def blake2s(input: Array[Byte], outLen: Int = 32): Array[Byte] = {
    require(outLen >= 1 && outLen <= 32, s"blake2s outLen=$outLen")
    val h = IVs.clone()
    h(0) ^= 0x01010000 ^ outLen
    val m = new Array[Int](16)
    var t = 0L
    var off = 0
    val len = input.length
    while (len - off > 64) {
      loadS(input, off, m)
      t += 64
      compressS(h, m, t, last = false)
      off += 64
    }
    val rem = len - off
    val pad = new Array[Byte](64)
    System.arraycopy(input, off, pad, 0, rem)
    loadS(pad, 0, m)
    t += rem
    compressS(h, m, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i >> 2) >>> (8 * (i & 3))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def loadS(buf: Array[Byte], off: Int, m: Array[Int]): Unit = {
    var i = 0
    while (i < 16) {
      var v = 0
      var j = 3
      while (j >= 0) { v = (v << 8) | (buf(off + i * 4 + j) & 0xff); j -= 1 }
      m(i) = v
      i += 1
    }
  }

  private def compressS(h: Array[Int], m: Array[Int], t: Long,
                        last: Boolean): Unit = {
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IVs, 0, v, 8, 8)
    v(12) ^= t.toInt
    v(13) ^= (t >>> 32).toInt
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 10) {
      val s = SIGMA(r)
      gS(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      gS(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      gS(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      gS(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      gS(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      gS(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      gS(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      gS(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    var i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  @inline private def gS(v: Array[Int], a: Int, b: Int, c: Int, d: Int,
                         x: Int, y: Int): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = Integer.rotateRight(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + y
    v(d) = Integer.rotateRight(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = Integer.rotateRight(v(b) ^ v(c), 7)
  }

  // --- codegen entry points (called from generated Java) -------------------

  private def hex(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  def blake2bHex(input: Array[Byte]): UTF8String =
    UTF8String.fromString(hex(blake2b(input)))
  def blake2sHex(input: Array[Byte]): UTF8String =
    UTF8String.fromString(hex(blake2s(input)))

  /** Column builder over binary/string input, hex-string output (the
    * md5/sha2 type contract). No session registration needed: the
    * expression is attached directly through the ColumnBridge shim. */
  def blake2b(c: Column): Column =
    ColumnBridge.column(Blake2Expr(ColumnBridge.expression(c), is2b = true))
  def blake2s(c: Column): Column =
    ColumnBridge.column(Blake2Expr(ColumnBridge.expression(c), is2b = false))
}

/** Catalyst expression wrapper: binary→hex-string BLAKE2 digest. The per-row
  * work delegates to the static kernels above from both the interpreted and
  * generated paths, so the expression participates in whole-stage codegen
  * (one static call per row, no reflection, no boxing). */
case class Blake2Expr(child: Expression, is2b: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = if (is2b) "blake2b" else "blake2s"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got ${other.sql} (cast first)")
  }

  override def nullSafeEval(input: Any): Any =
    if (is2b) Blake2.blake2bHex(input.asInstanceOf[Array[Byte]])
    else Blake2.blake2sHex(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val fn = if (is2b) "blake2bHex" else "blake2sHex"
    defineCodeGen(ctx, ev, c => s"graft.expressions.Blake2.$fn($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Blake2Expr = copy(child = newChild)
}
