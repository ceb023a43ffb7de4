package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 16-min MinHash signature of a token
  * array in ONE pass per document.
  *
  * Shingle i (word 3-gram) is `tokens[i] + " " + tokens[i+1] + " " +
  * tokens[i+2]`; hash j of a shingle is the (j%8)-th 4-byte big-endian
  * slice of `sha256("s" + (j/8) + ":" + shingle)` as an unsigned 32-bit
  * value — bit-identical to
  * `conv(substring(sha2(concat('sN:', shingle), 256), 1+8*(j%8), 8),
  * 16, 10)` (8 hex chars == 4 digest bytes), the formulation the DuckDB
  * oracle replays. The result element j is the minimum of hash j over
  * all shingle POSITIONS (duplicates kept — min is insensitive).
  * NULL array, fewer than 3 tokens (no shingle exists), or any NULL
  * element -> NULL.
  *
  * Why a custom Expression (same argument as [[SimhashSignature]]): the
  * explode + 16-min-aggregate shape was the best AGGREGATE formulation
  * (digests shared across slices by subexpression elimination, partial
  * aggregation before the exchange), but every shingle still paid
  * row-pipeline overhead plus sha256-HEX materialization and a
  * string->long conv parse per slice. Here the two digests are computed
  * bytes-to-bytes per shingle (one reused MessageDigest instance, no
  * hex round-trip) and the 16 running minima live in a local long[16];
  * the per-doc signature goes straight into the band explode with no
  * shuffle. Measured A/B in NOTES round-5.
  */
case class MinhashSignature(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  private val NHashes = 16

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 3) return null
    var i = 0
    while (i < n) { if (a.isNullAt(i)) return null; i += 1 }
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val mins = Array.fill(NHashes)(Long.MaxValue)
    i = 0
    while (i <= n - 3) {
      val shingle = (a.getUTF8String(i).toString + " " +
        a.getUTF8String(i + 1).toString + " " +
        a.getUTF8String(i + 2).toString).getBytes(StandardCharsets.UTF_8)
      var g = 0
      while (g < 2) {
        md.update(if (g == 0) MinhashSignature.Salt0
          else MinhashSignature.Salt1)
        md.update(shingle)
        val d = md.digest() // resets the instance
        var j = 0
        while (j < 8) {
          val v = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
            ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
          val slot = 8 * g + j
          if (v < mins(slot)) mins(slot) = v
          j += 1
        }
        g += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftSha",
      v => s"""try {
               |  $v = java.security.MessageDigest.getInstance("SHA-256");
               |} catch (java.security.NoSuchAlgorithmException e) {
               |  throw new RuntimeException(e);
               |}""".stripMargin)
    val salt0 = ctx.addReferenceObj("salt0", MinhashSignature.Salt0, "byte[]")
    val salt1 = ctx.addReferenceObj("salt1", MinhashSignature.Salt1, "byte[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val g = ctx.freshName("g")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val sh = ctx.freshName("sh")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val slot = ctx.freshName("slot")
      val ok = ctx.freshName("ok")
      s"""
         |int $n = $a.numElements();
         |boolean $ok = $n >= 3;
         |for (int $i = 0; $ok && $i < $n; $i++) {
         |  if ($a.isNullAt($i)) $ok = false;
         |}
         |if (!$ok) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$NHashes];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i <= $n - 3; $i++) {
         |    byte[] $sh = ($a.getUTF8String($i).toString() + " " +
         |      $a.getUTF8String($i + 1).toString() + " " +
         |      $a.getUTF8String($i + 2).toString())
         |      .getBytes(java.nio.charset.StandardCharsets.UTF_8);
         |    for (int $g = 0; $g < 2; $g++) {
         |      $md.update($g == 0 ? $salt0 : $salt1);
         |      $md.update($sh);
         |      byte[] $d = $md.digest();
         |      for (int $j = 0; $j < 8; $j++) {
         |        long $v = (($d[4 * $j] & 0xffL) << 24) |
         |          (($d[4 * $j + 1] & 0xffL) << 16) |
         |          (($d[4 * $j + 2] & 0xffL) << 8) |
         |          ($d[4 * $j + 3] & 0xffL);
         |        int $slot = 8 * $g + $j;
         |        if ($v < $mins[$slot]) $mins[$slot] = $v;
         |      }
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinhashSignature = copy(child = newChild)
}

object MinhashSignature {
  private[functions] val Salt0 = "s0:".getBytes(StandardCharsets.UTF_8)
  private[functions] val Salt1 = "s1:".getBytes(StandardCharsets.UTF_8)

  /** Column-level entry point over an ARRAY<STRING> token column. */
  def apply(tokens: Column): Column =
    ColumnBridge.column(MinhashSignature(ColumnBridge.expression(tokens)))
}
