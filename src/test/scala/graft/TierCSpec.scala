package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Semantic checks for the approximate Tier-C operators (the exact ones
  * are covered by the DuckDB oracle gate). */
class TierCSpec extends SparkSpec {

  test("LSH top-10 recalls most of the exact top-10") {
    import spark.implicits._
    val exact = Similarity.q37SimilarityTopk(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.q37bSimilarityLsh(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    assert(approx.nonEmpty, "multi-probe LSH returned no candidates")
    // the exact top-10 here sit at cosine ~0.3 (not near-dups), where an
    // 8-bit sign-LSH is weakly discriminative by construction; require
    // non-trivial overlap rather than high recall
    assert((exact intersect approx).size >= 2,
      s"recall too low: exact=$exact approx=$approx")
  }

  test("IVF top-10 overlaps the exact top-10 and returns full rows") {
    import spark.implicits._
    val exact = Similarity.q37SimilarityTopk(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.q37cSimilarityIvf(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    assert(ivf.size === 10, s"ivf returned ${ivf.size} rows")
    assert((exact intersect ivf).nonEmpty,
      s"IVF found none of the exact top-10: exact=$exact ivf=$ivf")
  }

  test("minhash est_jaccard agrees with exact jaccard on found pairs") {
    import spark.implicits._
    val exact = Dedup.q36NearDup(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    val est = Dedup.q36bMinhashLsh(spark, sf)
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .as[(Long, Long, Double)].collect()
    assert(est.nonEmpty, "minhash-LSH found no pairs")
    // every 16/16-signature-match pair must be a true high-jaccard pair
    est.filter(_._3 == 1.0).foreach { case (a, b, _) =>
      assert(exact.getOrElse((a, b), 0.0) >= 0.5,
        s"pair ($a,$b) matched all sigs but exact jaccard is low")
    }
  }

  test("LSH embedding near-dup pairs are a subset of the exact pairs") {
    import spark.implicits._
    // exact side = the all-pairs DIAGNOSTIC (not q36d, which is
    // cell-blocked since round 9 and so itself a subset of this)
    val exact = Similarity.embeddingNearDup(
        graft.ops.Tables.embeddings(spark, sf))
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.q36fEmbeddingNeardupLsh(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "banded LSH found no pairs on the fixture")
    assert(lsh.subsetOf(exact),
      s"LSH produced pairs the exact join lacks: ${lsh.diff(exact)}")
  }

  test("cell-blocked near-dup (q36d): subset of all-pairs, high recall " +
    "on planted near-identical duplicates") {
    import spark.implicits._
    val emb = graft.ops.Tables.embeddings(spark, sf)
    val all = Similarity.embeddingNearDup(emb)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val blocked = Similarity.q36dEmbeddingNeardup(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(all),
      s"blocked emitted pairs all-pairs lacks: ${blocked.diff(all)}")
    // the blocking contract: NEAR-IDENTICAL vectors usually share a
    // cell, so planted duplicates (cosine > 0.95, the TierC LSH
    // fixture) survive the confinement at high-but-not-total recall —
    // a pair sitting ON a cell boundary can split (observed: 2/50 on
    // this seed), which is the inherent SemDeDup blocking trade-off,
    // the same one its published form accepts
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def gauss(): Array[Float] =
      unit(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = (0 until 50).flatMap { i =>
      val base = gauss()
      val noise = gauss()
      val copy = unit(base.indices.map(j =>
        base(j) + 0.2f * noise(j)).toArray)
      Seq((i.toLong, base), (1000L + i, copy))
    } ++ (0 until 50).map(i => (2000L + i, gauss()))
    val planted = rows.toDF("vec_id", "embedding")
    val found = Similarity.embeddingNearDupBlocked(planted,
        minDot = 900000000000L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expect = (0 until 50).map(i => (i.toLong, 1000L + i)).toSet
    val recall = (found intersect expect).size.toDouble / expect.size
    assert(recall >= 0.9, s"blocked recall $recall < 0.9 " +
      s"(split pairs: ${expect.diff(found)})")
  }

  test("banded LSH recall >= 0.8 on planted near-dups (cosine >= 0.95)") {
    import spark.implicits._
    // The fixture embeddings contain NO true near-dups (max pairwise
    // cosine ~0.51), so the advertised operating point — recall at
    // cosine >= 0.95 — is asserted on planted duplicates: 50 unit
    // vectors, each with a slightly perturbed copy (cosine > 0.95 by
    // construction), plus 50 unrelated vectors as background. Expected
    // recall under the 8-band x 12-bit default is
    // 1 - (1 - (1 - acos(0.95)/pi)^12)^8 ~ 0.92; assert >= 0.8 (seeded
    // RNG, so this is deterministic, not flaky).
    val rnd = new scala.util.Random(42)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def gauss(): Array[Float] =
      unit(Array.fill(64)(rnd.nextGaussian().toFloat))
    val rows = (0 until 50).flatMap { i =>
      val base = gauss()
      val noise = gauss()
      // cos(base, base + 0.2*noise) >= 1/sqrt(1 + 0.04 + 0.4*cos0) and
      // cos0 is ~0 for random 64-dim directions => comfortably > 0.95
      val copy = unit(base.indices.map(j =>
        base(j) + 0.2f * noise(j)).toArray)
      Seq((i.toLong, base), (1000L + i, copy))
    } ++ (0 until 50).map(i => (2000L + i, gauss()))
    val emb = rows.toDF("vec_id", "embedding")
    val found = Similarity.embeddingNearDupLsh(emb,
        minDot = 900000000000L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 50).map(i => (i.toLong, 1000L + i)).toSet
    // sanity: construction really produced cosine >= 0.9 pairs
    val exact = Similarity.embeddingNearDup(emb)
      .filter(col("dot_e12") >= 900000000000L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(planted.subsetOf(exact),
      s"construction failed: ${planted.diff(exact)} not >= 0.9 cosine")
    val recall = (found intersect planted).size.toDouble / planted.size
    assert(recall >= 0.8, s"recall $recall < 0.8 " +
      s"(missed ${planted.diff(found)})")
    assert(found.subsetOf(exact),
      s"LSH emitted non-near-dup pairs: ${found.diff(exact)}")
  }

  test("PQ codes: seeds encode to themselves; mix-and-match hits err 0") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)), // seed 0
      (1L, Array(0f, 1f, 0f, 1f)), // seed 1
      (2L, Array(1f, 0f, 0f, 0f)), // = seed 0 -> codes "0 0", err 0
      // sub0 matches seed 1, sub1 matches seed 0: PQ reconstructs it
      // exactly from MIXED codebook entries even though it equals no seed
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0.5f, 0.5f, 0.5f, 0.5f)) // nothing exact -> err > 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.pqEncode(emb, m = 2, k = 2, dim = 4)
      .select("vec_id", "codes", "err")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(0L) === ((0L, "0 0", 0L)))
    assert(out(1L) === ((1L, "1 1", 0L)))
    assert(out(2L) === ((2L, "0 0", 0L)))
    assert(out(3L) === ((3L, "1 0", 0L)))
    assert(out(4L)._3 > 0L)
    assert(out.size === 5)
  }

  test("kmeans update sums members into their nearest sampled centroid") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0f, 1f)), // sampled centroids, k=2
      (2L, Array(0.8f, 0.1f)), // -> cell 0
      (3L, Array(0.1f, 0.9f)), // -> cell 1
      (4L, Array(0.6f, 0f)) //    -> cell 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansUpdate(emb, k = 2)
      .select("cell_id", "dim_idx", "sum_q", "n_vecs")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0, 2400000L, 3L), (0L, 1, 100000L, 3L),
      (1L, 0, 100000L, 2L), (1L, 1, 1900000L, 2L)))
  }

  test("IVF-PQ probe: codebook vectors score their exact dot via ADC") {
    import spark.implicits._
    val adc = Similarity.q74IvfPqProbe(spark, sf)
      .select("vec_id", "est_dot_e12")
      .as[(Long, Long)].collect().toSeq
    assert(adc.size === 10, s"adc returned ${adc.size} rows")
    // determinism: a second write+probe round-trip returns identical rows
    val again = Similarity.q74IvfPqProbe(spark, sf)
      .select("vec_id", "est_dot_e12").as[(Long, Long)].collect().toSeq
    assert(adc === again)
    // a codebook vector's sub-vectors all encode to themselves, so its
    // ADC estimate IS the exact quantized dot — the zero-quantization-
    // error fixpoint of the approximation
    val emb = graft.ops.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("qe"))
      .as[(Long, Seq[Long])].collect().toMap
    val qv = emb(0L)
    val seedsInTop = adc.filter(_._1 < 16)
    assert(seedsInTop.forall { case (id, est) =>
      est === emb(id).zip(qv).map { case (a, b) => a * b }.sum
    }, s"seed rows deviated from exact: $seedsInTop")
  }

  test("simhash pairs include the true near-dup pairs") {
    import spark.implicits._
    val exact = Dedup.q36NearDup(spark, sf)
      .filter(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val sim = Dedup.q36cSimhash(spark, sf)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val caught = exact intersect sim
    assert(exact.isEmpty || caught.size * 2 >= exact.size,
      s"simhash missed too many: caught ${caught.size} of ${exact.size}")
  }

  test("trained centroids balance cells on a planted skewed fixture") {
    import spark.implicits._
    // Planted pathology for RAW-seed assignment under argmax dot: seed 0
    // has 2x the norm of every other seed and every corpus vector leans
    // slightly into seed 0's dimension, so dot(v, seed0) dominates and
    // the whole corpus lands in cell 0 — the layout collapse the
    // carried VERDICT caveat warned about. One Lloyd round pulls cell
    // 0's centroid to the corpus mean (diluted across cluster dims)
    // while dominated seeds keep their own cells, so the re-assignment
    // spreads clusters back out.
    val dim = 64
    def vec(entries: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](dim)
      entries.foreach { case (i, v) => a(i) = v }
      a
    }
    val seeds = (0 until 16).map { j =>
      if (j == 0) (0L, 0, vec(0 -> 2.0f))
      else (j.toLong, 0, vec(j -> 1.0f))
    }
    val corpus = (16 until 216).map { i =>
      val c = 1 + i % 15 // cluster dims 1..15
      (i.toLong, c, vec(0 -> 0.6f, c -> 1.0f))
    }
    val emb = (seeds ++ corpus).toDF("vec_id", "label", "embedding")
    val quantized = emb
      .select(col("vec_id"), graft.functions.VectorFunctions.quantize(col("embedding")).as("qe"))
    def maxCell(centroids: org.apache.spark.sql.DataFrame): Long =
      Similarity.coarseAssign(quantized, centroids)
        .groupBy(col("cell_id")).count()
        .agg(max(col("count"))).head().getLong(0)
    val rawSeeds = quantized.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell_id"), col("qe").as("ce"))
    val seedMax = maxCell(rawSeeds)
    val trainedMax = maxCell(Similarity.trainedCentroids(quantized))
    val total = 216L
    assert(seedMax >= total - 16,
      s"fixture not skewed enough under raw seeds: max cell $seedMax")
    assert(trainedMax <= total / 4,
      s"trained centroids did not balance: max cell $trainedMax")
    // and the full operator keeps every vector exactly once either way
    assert(Similarity.semanticDedup(emb).count() === total)
  }

  test("ArgmaxCodebookDot agrees with the literal array form at k=16") {
    import spark.implicits._
    val emb = graft.ops.Tables.embeddings(spark, sf)
    val quantized = emb.select(col("vec_id"),
      graft.functions.VectorFunctions.quantize(col("embedding")).as("qe"))
    val centroids = quantized.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell_id"), col("qe").as("ce"))
    val viaExpr = Similarity.coarseAssign(quantized, centroids)
      .select(col("vec_id"), col("cell_id"))
      .as[(Long, Long)].collect().toMap
    val viaLiteral = Similarity.coarseAssignLiteral(quantized, centroids)
      .select(col("vec_id"), col("cell_id"))
      .as[(Long, Long)].collect().toMap
    assert(viaExpr === viaLiteral)
  }

  test("PqEncodeCodes agrees with the compositional encoder (fixture)") {
    import spark.implicits._
    val emb = graft.ops.Tables.embeddings(spark, sf)
    val (m, k, dim) = (8, 16, 64)
    val subDim = dim / m
    val quantized = emb.filter(col("vec_id").isNotNull)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.quantize(col("embedding")).as("qe"))
    val seeds = quantized.filter(col("vec_id") < k)
      .select(col("vec_id"), col("qe")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1).toIndexedSeq
    val viaExpr = quantized
      .select(col("vec_id"), graft.functions.PqEncodeCodes(col("qe"),
        seeds.map(_._1),
        (0 until m).flatMap(mi => seeds.flatMap(
          _._2.slice(mi * subDim, (mi + 1) * subDim))), m, subDim)
        .as("codes"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaJoin = Similarity.packedToCodes(
      Similarity.pqPacked(emb, m, k, dim))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr === viaJoin)
  }

  test("PqEncodeCodes ties go to the lowest seed; malformed rows NULL") {
    import spark.implicits._
    // two seeds at the SAME point: every vector is equidistant from
    // both, so the dist*64+seed pack must pick seed 0, never seed 1
    val seedIds = Seq(0L, 1L)
    val flat = Seq(5L, 5L, /* m0: seed0, seed1 */ 7L, 7L) // m=2, subDim=1
    val rows = Seq(
      (1L, Seq(3L, 9L)),
      (2L, Seq(5L, 7L))
    ).toDF("vec_id", "qe")
    val out = rows.select(col("vec_id"),
      graft.functions.PqEncodeCodes(col("qe"), seedIds, flat, 2, 1)
        .as("codes")).as[(Long, Seq[Long])].collect().toMap
    assert(out(1L) === Seq(0L, 0L))
    assert(out(2L) === Seq(0L, 0L))
    // wrong-length and null vectors encode to NULL (the documented
    // divergence from the compositional path's array-of-NULLs — both
    // are unusable sentinels the store's consumers never read)
    val bad = Seq((3L, Some(Seq(1L))), (4L, Option.empty[Seq[Long]]))
      .toDF("vec_id", "qe")
    val badOut = bad.select(
      graft.functions.PqEncodeCodes(col("qe"), seedIds, flat, 2, 1)
        .as("codes")).collect()
    assert(badOut.forall(_.isNullAt(0)))
  }

  test("ArgmaxCodebookDot plans and assigns at k=256 (no literal blowup)") {
    import spark.implicits._
    val dim = 64
    // 256 deterministic centroids + 2000 vectors with a known nearest:
    // vector i points at dimension (i % 256) % 64 scaled so its argmax
    // dot is the centroid whose mask hits that dimension hardest
    val cents = (0 until 256).map { c =>
      (c.toLong, Array.tabulate(dim)(d =>
        if (d == c % dim) 1000000L + c else (c * 31 + d) % 997L))
    }
    val centroids = cents.toDF("cell_id", "ce")
    val vecs = (0 until 2000).map { i =>
      (1000L + i, Array.tabulate(dim)(d =>
        if (d == i % dim) 1000000L else 0L))
    }
    val quantized = vecs.toDF("vec_id", "qe")
    val assigned = Similarity.coarseAssign(quantized, centroids)
      .select(col("vec_id"), col("cell_id"))
      .as[(Long, Long)].collect().toMap
    assert(assigned.size === 2000)
    // independent driver-side replay of the argmax (strict >, ascending
    // cell order) over the same integer arithmetic
    val expect = vecs.map { case (id, qe) =>
      val best = cents.minBy { case (cid, ce) =>
        (-qe.indices.map(d => qe(d) * ce(d)).sum, cid)
      }._1
      id -> best
    }.toMap
    assert(assigned === expect)
  }

  test("null/odd embeddings assign to the lowest cell (oracle's " +
    "NULLS-LAST window semantics)") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(5L, 0L, 0L)), // seed/centroid 0
      (1L, Array(0L, 5L, 0L)), // seed/centroid 1
      (2L, Array(0L, 4L, 1L)), // nearest centroid 1
      (3L, null.asInstanceOf[Array[Long]]), // NULL vector
      (4L, Array(1L, 2L)) // wrong length
    )
    val quantized = rows.toDF("vec_id", "qe")
    val centroids = quantized.filter(col("vec_id") < 2)
      .select(col("vec_id").as("cell_id"), col("qe").as("ce"))
    val got = Similarity.coarseAssign(quantized, centroids)
      .select(col("vec_id"), col("cell_id"))
      .as[(Long, Long)].collect().toMap
    // the degenerate rows (3: NULL vector, 4: wrong length) get the
    // LOWEST cell — the oracle's (cdot DESC NULLS LAST, cell_id) rank.
    // The retired literal form's behavior there was Spark-PATH-DEPENDENT
    // (NULL through codegen'd element_at(arr, NULL), but 0 through the
    // interpreted LocalRelation projection — observed both ways on
    // Spark 4.1); the expression pins one answer on every path.
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L))
  }

  test("KnnMajorityLabel agrees with the window-formulation vote " +
    "(fixture)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val q = graft.ops.Tables.embeddings(spark, sf)
      .filter(col("vec_id").isNotNull)
      .select(col("vec_id"), col("label"),
        graft.functions.VectorFunctions.quantize(col("embedding"))
          .as("qe"))
    val seeds = q.filter(col("vec_id") < 32)
      .select(col("vec_id").as("sid"), col("label").as("slabel"),
        col("qe").as("sqe"))
    // the composable form the expression replaces: broadcast join +
    // per-vector top-k window + deterministic-majority window
    val byDot = Window.partitionBy(col("vec_id"))
      .orderBy(col("d").desc, col("sid"))
    val byVote = Window.partitionBy(col("vec_id"))
      .orderBy(col("v").desc, col("slabel"))
    val composed = q.filter(col("vec_id") >= 32)
      .crossJoin(broadcast(seeds))
      .select(col("vec_id"), col("sid"), col("slabel"),
        graft.functions.LongArrayDot(col("qe"), col("sqe")).as("d"))
      .withColumn("rn", row_number().over(byDot))
      .filter(col("rn") <= 5)
      .groupBy(col("vec_id"), col("slabel"))
      .agg(count(lit(1)).as("v"))
      .withColumn("rn", row_number().over(byVote))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("slabel"), col("v").cast("int"))
      .as[(Long, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val viaExpr = Similarity.q98KnnLabelProp(spark, sf)
      .select(col("vec_id"), col("plabel"), col("votes"))
      .as[(Long, Int, Int)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(viaExpr === composed)
  }

  test("KnnMajorityLabel tie-breaks: dot ties keep the lower seed id, " +
    "vote ties the lower label; malformed rows vote over the first k") {
    import spark.implicits._
    // seeds in ascending-id order: 0,1 at (1,0) with labels 7,3;
    // 2,3 at (0,1) with labels 5,5
    val labels = Seq(7L, 3L, 5L, 5L)
    val flat = Seq(1L, 0L, 1L, 0L, 0L, 1L, 0L, 1L)
    val rows = Seq(
      (1L, Some(Seq(10L, 0L))), // top2 = seeds 0,1 -> {7,3} tie -> 3
      (2L, Some(Seq(0L, 10L))), // top2 = seeds 2,3 -> {5,5} -> 5, v=2
      (3L, Option.empty[Seq[Long]]), // NULL -> first 2 -> {7,3} -> 3
      (4L, Some(Seq(1L))) // wrong length -> first 2 -> {7,3} -> 3
    ).toDF("vec_id", "qe")
    val got = rows.select(col("vec_id"),
      graft.functions.KnnMajorityLabel(col("qe"), labels, flat, 2, 2)
        .as("p")).as[(Long, Long)].collect().toMap
    assert(got === Map(
      1L -> ((1L << 32) | 3L), 2L -> ((2L << 32) | 5L),
      3L -> ((1L << 32) | 3L), 4L -> ((1L << 32) | 3L)))
    // k past the seed count caps at the panel: all 4 vote -> 5 wins 2-1-1
    val all = rows.filter(col("vec_id") === 1L).select(
      graft.functions.KnnMajorityLabel(col("qe"), labels, flat, 2, 10)
        .as("p")).as[Long].head()
    assert(all === ((2L << 32) | 5L))
  }

  test("q101: selection is the top-affinity PREFIX per source, within " +
    "the q66b integer quota, and never truncates a crossing doc") {
    import spark.implicits._
    val sel = ops.TextAnalysis.q101AffinitySelect(spark, sf)
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("affinity"), col("cum_tok"), col("tok_quota"))
      .as[(Long, String, Long, Double, Long, Long)].collect()
    assert(sel.nonEmpty)
    // budget honored, exactly: running totals stay within the quota
    sel.foreach { case (_, _, _, _, cum, q) => assert(cum <= q) }
    // per source: selected set = greedy prefix of the full affinity
    // ranking (affinity DESC, bucket, doc_id), recomputed independently
    val full = ops.TextAnalysis.q100TargetAffinity(spark, sf)
      .select(col("doc_id"), col("source"), col("n_tok"), col("affinity"))
      .as[(Long, String, Long, Double)].collect()
    val quotaBySrc = sel.groupBy(_._2).map { case (s, rs) => s -> rs.head._6 }
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 100
    }
    sel.groupBy(_._2).foreach { case (src, rs) =>
      val ranked = full.filter(_._2 == src)
        .sortBy(r => (-r._4, bucketOf(r._1), r._1))
      var cum = 0L
      val expect = ranked.takeWhile { r =>
        cum += r._3; cum <= quotaBySrc(src)
      }.map(_._1).toSet
      assert(rs.map(_._1).toSet === expect, s"source $src")
    }
  }

  test("q101b: global selection is the top-affinity prefix ACROSS " +
    "sources under one budget — the distributed prefix sum equals the " +
    "naive single-ordering recompute") {
    import spark.implicits._
    def bucketOf(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 100
    }
    val sel = ops.TextAnalysis.q101bAffinitySelectGlobal(spark, sf)
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("affinity"), col("cum_tok"), col("tok_budget"))
      .as[(Long, String, Long, Double, Long, Long)].collect()
    assert(sel.nonEmpty)
    val budget = sel.head._6
    sel.foreach { case (_, _, _, _, cum, b) =>
      assert(b === budget && cum <= budget) }
    // independent recompute: ONE global ordering, driver-side greedy
    val full = ops.TextAnalysis.q100TargetAffinity(spark, sf)
      .select(col("doc_id"), col("source"), col("n_tok"), col("affinity"))
      .as[(Long, String, Long, Double)].collect()
    val expectedBudget = full.map(_._3).sum / 2
    assert(budget === expectedBudget)
    val ranked = full.sortBy(r => (-r._4, bucketOf(r._1), r._1))
    val cums = ranked.scanLeft(0L)((acc, r) => acc + r._3).tail
    val expect = ranked.zip(cums).takeWhile(_._2 <= budget)
      .map { case (r, c) => (r._1, c) }.toMap
    assert(sel.map(_._1).toSet === expect.keySet)
    // and the REPORTED cum_tok matches the global running total (the
    // partition offsets are correct, not just the final cut)
    sel.foreach { case (id, _, _, _, c, _) => assert(expect(id) === c) }
  }

  test("q87d: the attachment stage drops exactly the non-canonical " +
    "attachment holders that survived the text near-dup stage") {
    // fixture contract (closed form, independent of sigClusters): the
    // perceptual groups are triples {3g, 3g+1, 3g+2} with min-id
    // canonical — images cover ids 0..95, audio 0..59 (a subset), so
    // the union drop set is {i < 96 : i % 3 != 0}
    val expectedDrop = (0L until 96L).filter(_ % 3 != 0).toSet
    assert(ops.Dedup.attachmentNonCanonical(spark)
      .collect().map(_.getLong(0)).toSet === expectedDrop)
    // ONE funnel run (the stages materialize eagerly — a second run
    // through the binding would double the suite's heaviest test;
    // review finding): stage identities checked on the stage list the
    // binding itself composes
    val stages = ops.Dedup.funnelStagesExtended(
      ops.TextAnalysis.injectPii(ops.Tables.documents(spark, sf)),
      Some(ops.Dedup.attachmentNonCanonical(spark)))
    assert(stages.map(_._2) === Seq("input", "pii_scrub", "exact_dedup",
      "near_dup", "attachment_dedup", "repetition", "quality",
      "segment_dedup", "decontaminate", "train_split"))
    assert(stages.map(_._1) === (0 to 9))
    val s3Ids = stages.find(_._2 == "near_dup").get._3
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val attIds = stages.find(_._2 == "attachment_dedup").get._3
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // SET identity, not just counts: survivors = s3 minus the drop set
    assert(attIds === (s3Ids diff expectedDrop))
    assert(attIds.size < s3Ids.size,
      "the stage must drop something at this fixture")
  }

  test("q61e: the elected canonical is a cluster member holding the " +
    "cluster's token maximum, tie-broken by min id") {
    val docs = ops.Tables.documents(spark, sf)
    val clusters = ops.Dedup.q61DedupClusters(spark, sf)
    val elected = ops.Dedup.q61eQualityCanonical(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(elected.nonEmpty)
    val byCluster = clusters.collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._2)
      .map { case (cid, rs) => cid -> rs.map(_._1).toSet }
    val toks = ops.TextAnalysis.qualityFilter(docs)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    // one elected row per cluster, no cluster missing
    assert(elected.map(_._1).toSet === byCluster.keySet)
    elected.foreach { case (cid, canon, size, nt) =>
      val members = byCluster(cid)
      assert(members.contains(canon), s"$canon not in cluster $cid")
      assert(size === members.size)
      assert(nt === toks(canon))
      // no member strictly longer; equal-length members have larger ids
      members.foreach { m =>
        assert(toks(m) < nt || (toks(m) == nt && m >= canon),
          s"member $m (${toks(m)} toks) beats elected $canon ($nt)")
      }
    }
    // the election differs from the min-id proxy somewhere at this
    // fixture — otherwise the operator adds nothing over q61b
    assert(elected.exists { case (cid, canon, _, _) => canon != cid },
      "every elected canonical was the min-id member")
  }

  test("q84c: exactly one tier is chosen — the smallest meeting the " +
    "floor, or the largest as fallback") {
    val rows = ops.Similarity.q84cNprobeFloor(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3, 4))
    val chosen = rows.filter(_._4)
    assert(chosen.length === 1)
    val eligible = rows.filter(_._2 >= 24L)
    val expected =
      if (eligible.nonEmpty) eligible.map(_._1).min else 4
    assert(chosen.head._1 === expected)
  }

  test("q101b: the budget ratio survives Long-overflow-scale " +
    "numerators (BigInt intermediate, round-13 ADVICE)") {
    // total(~1e5 toks) * 1e14 overflows a Long multiply; the ratio
    // 1e14/2e14 = 1/2 must still select exactly the default's rows
    val base = ops.TextAnalysis.affinitySelectGlobal(
      ops.Tables.documents(spark, sf)).select(col("doc_id")).collect()
      .map(_.getLong(0)).sorted
    val big = ops.TextAnalysis.affinitySelectGlobal(
      ops.Tables.documents(spark, sf),
      budgetNum = 100000000000000L, budgetDen = 200000000000000L)
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    assert(big === base)
  }
}
