package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprint: the MINIMUM of the
  * polynomial hashes of every `window`-byte substring, computed in one
  * O(n) pass (each step: drop the leading byte's term, multiply by the
  * base, add the new byte — the classic rolling update).
  *
  * This is the winnowing-style fingerprint of the north-star text
  * analysis mandate: two documents sharing any `window`-byte run are
  * likely to share their minimum substring hash, so equal fingerprints
  * flag near-duplication cheaply. A second custom codegen Expression
  * (after LongArrayDot) because per-character loops cannot be expressed
  * with built-in functions at O(n) — `transform(sequence(...))` would
  * recompute each substring hash from scratch (O(n*w)) and allocate.
  *
  * Deterministic: fixed base/modulus, byte-level (UTF-8), no RNG.
  * Returns NULL for inputs shorter than the window.
  */
case class RollingHashMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "rolling_hash_min"

  override def nullSafeEval(str: Any, win: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val w = win.asInstanceOf[Int]
    RollingHashMin.evalBytesOrNull(bytes, w)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (str, win) => {
      val helper =
        "graft.functions.RollingHashMin$.MODULE$"
      val res = ctx.freshName("res")
      s"""
         |java.lang.Long $res = $helper.evalBytesOrNull($str.getBytes(), $win);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHashMin =
    copy(left = newLeft, right = newRight)
}

object RollingHashMin {
  /** Base/modulus: 63-bit-safe Mersenne-ish prime arithmetic. */
  final val Base = 1000003L
  final val Mod = 2305843009213693951L // 2^61 - 1

  /** (a*b) mod (2^61-1) via 128-bit multiply + Mersenne folding. */
  private def mulmod(a: Long, b: Long): Long = {
    val hi = java.lang.Math.multiplyHigh(a, b)
    val lo = a * b
    val lo61 = lo & Mod
    val carry = (lo >>> 61) | (hi << 3)
    var r = lo61 + carry
    if (r >= Mod) r -= Mod
    r
  }

  /** O(n) min-of-all-window-hashes; null when bytes.length < window.
    * Java-boxed return so generated code can call it directly. */
  def evalBytesOrNull(bytes: Array[Byte], window: Int): java.lang.Long = {
    val n = bytes.length
    if (window <= 0 || n < window) return null
    // precompute Base^(window-1) mod Mod for the drop-term
    var pow = 1L
    var i = 1
    while (i < window) { pow = mulmod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < window) {
      h = mulmod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    var min = h
    while (i < n) {
      val drop = mulmod(bytes(i - window) & 0xffL, pow)
      h = h - drop
      if (h < 0) h += Mod
      h = mulmod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      if (h < min) min = h
      i += 1
    }
    java.lang.Long.valueOf(min)
  }

  def apply(str: Column, window: Int): Column =
    ColumnBridge.column(RollingHashMin(
      ColumnBridge.expression(str),
      ColumnBridge.expression(org.apache.spark.sql.functions.lit(window))))
}
