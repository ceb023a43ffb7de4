package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: sign-LSH signature of a quantized
  * ARRAY<BIGINT> vector against a set of +-1 hyperplanes.
  *
  * Bit p of the result is set iff `sum_i qe[i] * plane_p[i] >= 0`, where
  * `plane_p[i] = +1` if bit `i` of `masks(p)` is set, else `-1` (so each
  * hyperplane is one 64-bit literal; dims beyond 64 or beyond the array
  * length contribute nothing). Up to 64 planes -> the signature packs
  * into one LONG.
  *
  * Why a custom Expression (SURVEY.md §7.3 exception, same reasoning as
  * [[LongArrayDot]]): the composable form — one
  * `aggregate(zip_with(qe, planeLit, _*_), 0L, _+_)` per plane — is a
  * HigherOrderFunction tree, which is CodegenFallback: interpreted lambda
  * eval per element, re-run once PER PLANE per row (the round-3 bench
  * showed the 8-plane variant re-evaluating its quantize+project lambdas
  * 8-9x per row; the whole similarity family regressed 3-12x). This
  * expression computes ALL planes in ONE pass over the array inside
  * whole-stage codegen: per element it adds `v` to (or subtracts it from)
  * each plane's local accumulator — no allocation, no boxing, no
  * per-plane re-scan.
  *
  * Semantics: NULL array -> NULL; any NULL element -> NULL (every element
  * is visited, unlike a short-circuiting merge). Plain long arithmetic —
  * quantized unit-norm components are <= 1e6 in magnitude and vectors
  * <= 64 dims, so |projection| <= 6.4e7: overflow is impossible by
  * construction, no ANSI-mode dependence.
  */
case class SignLshSignature(child: Expression, masks: Seq[Long])
    extends UnaryExpression with ExpectsInputTypes {
  require(masks.nonEmpty && masks.length <= 64,
    s"sign-LSH supports 1..64 planes, got ${masks.length}")

  // Analysis-time contract (ADVICE r4): a non-ARRAY<BIGINT> first
  // argument — e.g. sign_lsh_signature('abc', ...) from the SQL surface
  // — fails with a typed AnalysisException instead of a runtime
  // ClassCastException, matching the masks argument's error quality.
  override def inputTypes: Seq[TypeBridge.AbstractType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sign_lsh_signature"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), 64)
    val acc = new Array[Long](masks.length)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = a.getLong(i)
      var p = 0
      while (p < masks.length) {
        if (((masks(p) >>> i) & 1L) == 1L) acc(p) += v else acc(p) -= v
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < masks.length) {
      if (acc(p) >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val accs = masks.indices.map(p => ctx.freshName(s"acc$p"))
      val decls = accs.map(acc => s"long $acc = 0L;").mkString("\n")
      // The per-plane +-v is branch-free: sign = (mask>>i & 1)*2 - 1
      // would cost a multiply per plane; a ternary on a loop-invariant-
      // free bit test JITs to a conditional move. Masks are compile-time
      // literals, so each plane's test is one shift+and against a const.
      val steps = masks.zipWithIndex.map { case (m, p) =>
        s"${accs(p)} += (((${m}L >>> $i) & 1L) == 1L) ? $v : -$v;"
      }.mkString("\n")
      val collect = masks.indices.map(p =>
        s"if (${accs(p)} >= 0L) $sig |= ${1L << p}L;").mkString("\n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), 64);
         |$decls
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) {
         |    ${ev.isNull} = true;
         |    break;
         |  }
         |  long $v = $a.getLong($i);
         |  $steps
         |}
         |if (!${ev.isNull}) {
         |  long $sig = 0L;
         |  $collect
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : SignLshSignature = copy(child = newChild)
}

object SignLshSignature {
  /** Column-level entry point (callers guarantee an ARRAY<BIGINT> input,
    * e.g. `VectorFunctions.quantize`d embeddings). */
  def apply(qe: Column, masks: Seq[Long]): Column =
    ColumnBridge.column(SignLshSignature(ColumnBridge.expression(qe), masks))
}
