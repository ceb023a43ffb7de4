package graft

import graft.functions.{LongArrayDot, MinhashSignature, RollingHashMin, SignLshSignature, SimhashSignature, SortedLongArrayIntersectSize}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** SparkSessionExtensions wiring: exposes the engine's custom Catalyst
  * expressions to SQL users, so `spark.sql("SELECT long_array_dot(a, b)")`
  * works next to the Scala Column API.
  *
  * Usage: SparkSession.builder().withExtensions(new GraftExtensions)
  * or spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.functionDescriptors.foreach(e.injectFunction)
    e.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
    e.injectOptimizerRule(_ => graft.plans.EqCountRewrite)
  }
}

object GraftExtensions {
  private[graft] val functionDescriptors = Seq(
    (new FunctionIdentifier("long_array_dot"),
      new ExpressionInfo(classOf[LongArrayDot].getName, "long_array_dot"),
      (children: Seq[Expression]) => LongArrayDot(children(0), children(1))
        : Expression),
    (new FunctionIdentifier("sorted_long_array_intersect_size"),
      new ExpressionInfo(classOf[SortedLongArrayIntersectSize].getName,
        null, "sorted_long_array_intersect_size",
        // SQL callers don't see the Scaladoc, so the precondition that
        // makes the two-pointer merge correct is stated HERE: unsorted
        // or duplicate-bearing input silently undercounts.
        "_FUNC_(a, b) - Size of the intersection of two ARRAY<BIGINT> " +
          "columns that MUST each be sorted ascending with distinct " +
          "elements (e.g. via sort_array(array_distinct(x))); unsorted " +
          "input silently undercounts. NULL array, or a NULL element " +
          "reached by the merge scan, yields NULL.",
        "> SELECT _FUNC_(array(1L, 3L, 5L), array(3L, 4L, 5L));\n  2"),
      (children: Seq[Expression]) =>
        SortedLongArrayIntersectSize(children(0), children(1)): Expression),
    (new FunctionIdentifier("sign_lsh_signature"),
      new ExpressionInfo(classOf[SignLshSignature].getName,
        null, "sign_lsh_signature",
        "_FUNC_(qe, masks) - Packed sign-LSH signature of a quantized " +
          "ARRAY<BIGINT> vector: bit p of the result is set iff the " +
          "projection of qe onto the +-1 hyperplane encoded by masks[p] " +
          "(mask bit i set = +1 component at dim i, else -1) is >= 0. " +
          "masks must be a foldable ARRAY<BIGINT> literal of 1..64 " +
          "masks; the hyperplanes compile into the generated code.",
        "> SELECT _FUNC_(array(5L, -3L), array(1L));\n  1"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "sign_lsh_signature takes (qe ARRAY<BIGINT>, masks ARRAY<BIGINT>)")
        require(children(1).foldable,
          "sign_lsh_signature masks must be a literal array " +
            "(the planes are baked into the codegen'd expression)")
        // validate the TYPE before touching the value, and the value
        // before unboxing: a NULL literal, a non-array, or a NULL mask
        // element must all surface as the contract error, not an
        // NPE/ClassCastException from the cast below
        val elemType = children(1).dataType match {
          case ArrayType(t, _) if t == LongType || t == IntegerType => t
          case t => throw new IllegalArgumentException(
            s"sign_lsh_signature masks must be ARRAY<BIGINT>, got $t")
        }
        val value = children(1).eval(InternalRow.empty)
        require(value != null,
          "sign_lsh_signature masks must be a non-NULL literal array")
        val arr = value.asInstanceOf[ArrayData]
        require((0 until arr.numElements()).forall(i => !arr.isNullAt(i)),
          "sign_lsh_signature masks must not contain NULL elements")
        val masks =
          if (elemType == LongType) arr.toLongArray().toSeq
          else arr.toIntArray().toSeq.map(_.toLong)
        SignLshSignature(children(0), masks): Expression
      }),
    (new FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinhashSignature].getName,
        null, "minhash_signature",
        "_FUNC_(tokens) - 16-min MinHash signature of an ARRAY<STRING> " +
          "token column in one pass: word-3-gram shingles, two salted " +
          "sha256 digests per shingle, element j = min over shingles of " +
          "the (j%8)-th 4-byte slice of digest j/8 (== CAST(conv(" +
          "substring(sha2(concat('sN:', shingle), 256), 1+8*(j%8), 8), " +
          "16, 10) AS BIGINT)). NULL if tokens is NULL, has fewer than " +
          "3 elements, or contains NULL.",
        "> SELECT size(_FUNC_(split('a b c d', ' ')));\n  16"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "minhash_signature takes one ARRAY<STRING> argument")
        MinhashSignature(children.head): Expression
      }),
    (new FunctionIdentifier("simhash_signature"),
      new ExpressionInfo(classOf[SimhashSignature].getName,
        null, "simhash_signature",
        "_FUNC_(tokens) - 60-bit frequency-weighted SimHash signature " +
          "of an ARRAY<STRING> token column in one pass: per non-empty " +
          "token the top 60 bits of md5 feed 60 bit-majority counters " +
          "(== CAST(conv(substring(md5(t),1,15),16,10) AS BIGINT) per " +
          "token). NULL/empty tokens are skipped; NULL if no tokens.",
        "> SELECT _FUNC_(split('a b a', ' ')) IS NOT NULL;\n  true"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "simhash_signature takes one ARRAY<STRING> argument")
        SimhashSignature(children.head): Expression
      }),
    (new FunctionIdentifier("rolling_hash_min"),
      new ExpressionInfo(classOf[RollingHashMin].getName,
        null, "rolling_hash_min",
        "_FUNC_(str, window) - Minimum Rabin-Karp polynomial hash over " +
          "every window-byte UTF-8 substring of str, in one O(n) pass " +
          "(winnowing-style document fingerprint). NULL if str is " +
          "shorter than window bytes.",
        "> SELECT _FUNC_('abcabc', 3) = _FUNC_('xxabcyy', 3);\n  true"),
      (children: Seq[Expression]) =>
        RollingHashMin(children(0), children(1)): Expression),
  )

  /** Register on an already-built session (test/REPL convenience):
    * the SQL functions plus the dot-product optimizer rewrite (via the
    * public experimental extraOptimizations hook; idempotent). */
  def install(spark: SparkSession): Unit = {
    functionDescriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.DotProductRewrite)
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.EqCountRewrite))
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.EqCountRewrite)
  }

  /** Register the sf-dir parquet tables as temp views so the whole query
    * surface is reachable from `spark.sql` — the engine's SQL front door.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      ops.Tables.table(spark, sfDir, t).createOrReplaceTempView(t)
    }
    ops.Tables.events(spark, sfDir).createOrReplaceTempView("events")
  }
}
