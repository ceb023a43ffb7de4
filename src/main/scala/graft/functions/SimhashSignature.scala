package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 60-bit frequency-weighted SimHash
  * signature of a token array, in ONE pass per document.
  *
  * Per non-empty token t: h = the top 60 bits of md5(utf8(t)) — exactly
  * `conv(substring(md5(t), 1, 15), 16, 10)` (15 hex chars = the first
  * 7.5 digest bytes, so h = (first-8-bytes-BE) >>> 4) — and each of the
  * 60 bit counters is incremented by bit b of h. Signature bit b is set
  * iff the majority test 2*count_b > n holds (ties -> 0), n = the
  * number of non-empty tokens. NULL array -> NULL; NULL/empty elements
  * are skipped; n == 0 -> NULL (a doc with no tokens has no signature —
  * mirrors the explode formulation, where such a doc produced no rows).
  *
  * Why a custom Expression (SURVEY.md §7.3 exception, the same argument
  * as [[SignLshSignature]]): the previous shape exploded to one row per
  * TOKEN (~500x the doc count) and pushed those rows through a
  * 20-lane-packed partial aggregation; correct and partial-agg'd, but
  * every token paid row-pipeline overhead plus an md5 HEX-STRING
  * materialization and a string->long `conv` parse. This expression
  * keeps the whole signature in registers per document: digest bytes ->
  * long directly (no hex round-trip), counters in a local int[60], no
  * explode, no aggregation, no shuffle — the per-doc signature table
  * goes straight into the banded self-join. Measured A/B in NOTES
  * round-5.
  */
case class SimhashSignature(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_signature"

  private val Bits = 60

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val cnt = new Array[Int](Bits)
    var n = 0
    var i = 0
    val num = a.numElements()
    while (i < num) {
      if (!a.isNullAt(i)) {
        val t = a.getUTF8String(i)
        if (t.numBytes() > 0) {
          n += 1
          val d = org.apache.commons.codec.digest.DigestUtils.md5(t.getBytes)
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
          v = v >>> 4
          var b = 0
          while (b < Bits) { cnt(b) += ((v >>> b) & 1L).toInt; b += 1 }
        }
      }
      i += 1
    }
    if (n == 0) null
    else {
      var sig = 0L
      var b = 0
      while (b < Bits) { if (2 * cnt(b) > n) sig |= 1L << b; b += 1 }
      sig
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val b = ctx.freshName("b")
      val n = ctx.freshName("n")
      val num = ctx.freshName("num")
      val cnt = ctx.freshName("cnt")
      val tok = ctx.freshName("tok")
      val dig = ctx.freshName("dig")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = 0;
         |int[] $cnt = new int[$Bits];
         |int $num = $a.numElements();
         |for (int $i = 0; $i < $num; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  org.apache.spark.unsafe.types.UTF8String $tok =
         |    $a.getUTF8String($i);
         |  if ($tok.numBytes() == 0) continue;
         |  $n++;
         |  byte[] $dig = org.apache.commons.codec.digest.DigestUtils.md5(
         |    $tok.getBytes());
         |  long $v = 0L;
         |  for (int $k = 0; $k < 8; $k++) {
         |    $v = ($v << 8) | ($dig[$k] & 0xffL);
         |  }
         |  $v = $v >>> 4;
         |  for (int $b = 0; $b < $Bits; $b++) {
         |    $cnt[$b] += (int) (($v >>> $b) & 1L);
         |  }
         |}
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $b = 0; $b < $Bits; $b++) {
         |    if (2 * $cnt[$b] > $n) $sig |= 1L << $b;
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SimhashSignature = copy(child = newChild)
}

object SimhashSignature {
  /** Column-level entry point over an ARRAY<STRING> token column. */
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimhashSignature(ColumnBridge.expression(tokens)))
}
