package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("pipeline stages: resize clamps edges, frame sampling divides") {
    import spark.implicits._
    val feats = Multimodal.q45MultimodalPipeline(spark, sf)
    // resize contract: no edge exceeds 256 after the resize stage
    val over = feats
      .filter(col("width") > 256 || col("height") > 256).count()
    assert(over === 0)
    // videos sampled every 10th frame: 1 + floorMod(h,300) -> <= 30
    val vids = feats.filter(col("modality") === "video")
    assert(vids.count() > 0)
    assert(vids.filter(col("n_frames") > 30).count() === 0)
    // audio has no spatial dims
    assert(feats.filter(col("modality") === "audio" &&
      (col("width") =!= 0 || col("height") =!= 0)).count() === 0)
  }

  test("modality routing is deterministic by doc_id") {
    import spark.implicits._
    val m = Multimodal.mediaTable(spark, sf)
      .select(col("doc_id"), col("modality"))
      .as[(Long, String)].collect().toMap
    assert(m(0L) === "image" && m(1L) === "audio" && m(2L) === "video")
  }

  /** Real 5x3 PNG: red left half, blue right half. */
  private def pngBytes(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(5, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5)
      img.setRGB(x, y, if (x < 3) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Real 100-frame mono 8-bit 8kHz WAV. */
  private def wavBytes(): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val data = Array.tabulate[Byte](100)(i => (i * 3).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, 100)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeReal decodes actual PNG and WAV payloads via JDK codecs") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(), "s"),
      Multimodal.MediaRecord(2L, "audio", wavBytes(), "s"),
      Multimodal.MediaRecord(3L, "image", "just text".getBytes("UTF-8"), "s"))
    val out = Multimodal.decodeReal(recs.iterator).toSeq
    val img = out.find(_.doc_id == 1L).get
    // true raster dimensions, not stub arithmetic
    assert(img.width === 5 && img.height === 3 && img.n_frames === 1)
    // pixel-derived embedding: left-half red, right-half blue => mean R
    // (slot 4) is 3/5 of full red, mean B (slot 6) is 2/5 of full blue
    assert(math.abs(img.embedding(4) - 0.6f) < 0.01f)
    assert(math.abs(img.embedding(6) - 0.4f) < 0.01f)
    assert(math.abs(img.embedding(5)) < 0.01f) // no green anywhere
    val wav = out.find(_.doc_id == 2L).get
    // header-true frame count; sample rate and channels in the embedding
    assert(wav.n_frames === 100 && wav.width === 0 && wav.height === 0)
    assert(math.abs(wav.embedding(0) - 0.08f) < 1e-4f)
    assert(wav.embedding(1) === 1.0f)
    // non-media payload falls back to the deterministic stub, exactly
    val stub = Multimodal.decodeStub(Iterator(recs(2))).next()
    val fb = out.find(_.doc_id == 3L).get
    assert((fb.byte_len, fb.width, fb.height, fb.n_frames) ===
      (stub.byte_len, stub.width, stub.height, stub.n_frames))
    assert(fb.embedding.toSeq === stub.embedding.toSeq)
  }

  test("decodeReal decodes JPEG, GIF and BMP payloads via JDK ImageIO") {
    // same raster through the three other sniffed containers (round
    // 10): dimensions are container-exact for all of them; pixel
    // checks stay tolerant for JPEG (lossy) and GIF (palette)
    def bytesOf(fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 9) img.setRGB(x, y, 0xcc0000)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    Seq("jpg", "gif", "bmp").zipWithIndex.foreach { case (fmt, i) =>
      val payload = bytesOf(fmt)
      val rec = Multimodal.MediaRecord(i.toLong, "image", payload, "s")
      val out = Multimodal.decodeReal(Iterator(rec)).next()
      val stub = Multimodal.decodeStub(Iterator(rec)).next()
      // true raster dimensions, not the stub's hash arithmetic
      assert(out.width === 9 && out.height === 4 && out.n_frames === 1, fmt)
      assert((out.width, out.height) !== (stub.width, stub.height), fmt)
      // solid ~80% red raster: mean R high, mean G/B low even after
      // JPEG quantization / GIF palette snapping
      assert(out.embedding(4) > 0.6f, s"$fmt mean R ${out.embedding(4)}")
      assert(out.embedding(5) < 0.2f && out.embedding(6) < 0.2f, fmt)
    }
  }

  test("text payload with a permissive-magic prefix still takes the stub") {
    // ADVICE r5: '.snd' (AU) is four printable ASCII chars and the AU
    // header is permissive enough that text CAN parse via AudioSystem;
    // AU is therefore excluded from the sniff list. 'FORM' (AIFF) stays
    // sniffed but the codec itself rejects text (no 'AIFF' at offset 8).
    val texts = Seq(".snd followed by ordinary prose, long enough to span",
      "FORMatted text that is not an AIFF container at all, honest")
    texts.zipWithIndex.foreach { case (t, i) =>
      val rec = Multimodal.MediaRecord(i.toLong, "audio",
        t.getBytes("UTF-8"), "s")
      val real = Multimodal.decodeReal(Iterator(rec)).next()
      val stub = Multimodal.decodeStub(Iterator(rec)).next()
      assert((real.byte_len, real.width, real.height, real.n_frames) ===
        (stub.byte_len, stub.width, stub.height, stub.n_frames), t)
      assert(real.embedding.toSeq === stub.embedding.toSeq, t)
    }
  }

  test("decodeReal is deterministic and partition-shape preserving") {
    val recs = Seq(
      Multimodal.MediaRecord(1L, "image", pngBytes(), "s"),
      Multimodal.MediaRecord(2L, "audio", wavBytes(), "s"))
    val a = Multimodal.decodeReal(recs.iterator).toSeq
    val b = Multimodal.decodeReal(recs.iterator).toSeq
    assert(a.map(_.embedding.toSeq) === b.map(_.embedding.toSeq))
    assert(a.map(f => (f.doc_id, f.width, f.height, f.n_frames)) ===
      b.map(f => (f.doc_id, f.width, f.height, f.n_frames)))
  }

  /** Structured gray PNG: block (x/10, y/6) holds base + a cell term,
    * optionally brightness-shifted (+delta on every pixel) or with one
    * block repainted (struct changes the raster's structure). */
  private def patternPng(delta: Int, struct: Boolean): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(60, 60,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 60; x <- 0 until 60) {
      val base = (37 * (x / 10) + 89 * (y / 6) + 55) % 199
      val v0 = if (struct && x < 10 && y < 6) 255 - base else base
      val v = v0 + delta
      img.setRGB(x, y, v << 16 | v << 8 | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageAHash: brightness-invariant, structure-sensitive, and " +
    "None on undecodable/degenerate payloads") {
    val base = Multimodal.imageAHash(patternPng(0, struct = false))
    val shifted = Multimodal.imageAHash(patternPng(5, struct = false))
    val changed = Multimodal.imageAHash(patternPng(0, struct = true))
    assert(base.isDefined)
    // a uniform brightness shift cancels in the cross-multiplied mean
    // rule — the perceptual property byte hashing (q35/q46) lacks:
    // the two payloads differ byte-for-byte yet hash identically
    assert(shifted === base)
    assert(!java.util.Arrays.equals(
      patternPng(0, struct = false), patternPng(5, struct = false)))
    // repainting a block flips bits: distinct hash, past the pair
    // threshold is NOT required (one block = 1 bit floor) but equality
    // must break
    assert(changed.isDefined && changed != base)
    // undecodable bytes and rasters too small for the 6x10 grid
    assert(Multimodal.imageAHash("not an image".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.imageAHash(pngBytes()).isEmpty) // 5x3 raster
    // the hash fits the 60-bit non-negative banding contract
    assert(base.get >= 0L && base.get < (1L << 60))
  }

  test("ahash store lifecycle: admitted signatures append back and a " +
    "replayed batch admits nothing") {
    import spark.implicits._
    val store = graft.util.Ephemeral.dir("ahash_lifecycle")
    // the REAL q45c/q45d fixture (private[graft]), so this lifecycle
    // assertion cannot drift from what the declared queries run
    val sigs = Multimodal.imageSignatures(
      Multimodal.syntheticImages(spark)).cache()
    val batch = sigs.filter(col("doc_id") >= 50)
    Multimodal.ahashIndexWrite(sigs.filter(col("doc_id") < 50), store)
    val admitted = Multimodal.ahashMerge(spark, store, batch)
      .as[(Long, Long)].collect()
    // id 50 completes stored group 16 (cross-store drop); each all-new
    // group admits its lowest member
    assert(admitted.map(_._1).toSeq === (51L to 93L by 3L).toSeq)
    // the q85 posture: admitted signatures append into the index...
    Multimodal.ahashIndexWrite(
      admitted.toSeq.toDF("doc_id", "ahash"), store, mode = "append")
    // ...so an at-least-once replay of the SAME batch admits nothing
    // (every member now matches either the store or its own group's
    // appended representative)
    assert(Multimodal.ahashMerge(spark, store, batch).count() === 0L)
    sigs.unpersist()
  }

  test("sigRetract: retract-equals-rebuild, replayed retraction no-ops, " +
    "retracted content re-admits, retract-all empties loudly") {
    import spark.implicits._
    val sigs = Multimodal.imageSignatures(
      Multimodal.syntheticImages(spark)).cache()
    val store = graft.util.Ephemeral.dir("ahash_retract")
    Multimodal.ahashIndexWrite(sigs.filter(col("doc_id") < 50), store)
    val del = sigs.filter(col("doc_id") >= 40 && col("doc_id") < 50)
    Multimodal.ahashRetract(spark, store, del)
    def rows(dir: String): Seq[String] =
      spark.read.schema(
          "doc_id BIGINT, ahash BIGINT, band INT, ckey BIGINT, kb INT")
        .parquet(dir)
        .orderBy("doc_id", "band").collect().map(_.toString).toSeq
    // band rows are per-doc, so retraction IS the survivors' rebuild
    val rebuilt = graft.util.Ephemeral.dir("ahash_retract_rebuild")
    Multimodal.ahashIndexWrite(sigs.filter(col("doc_id") < 40), rebuilt)
    assert(rows(store) === rows(rebuilt))
    // at-least-once replay of the same retraction changes nothing
    Multimodal.ahashRetract(spark, store, del)
    assert(rows(store) === rows(rebuilt))
    // the takedown property: batch id 50 perceptually duplicates ONLY
    // the retracted 48/49, so it must now ADMIT (before retraction the
    // q45d lifecycle drops it as a cross-store hit); every other
    // admission is unchanged
    val admitted = Multimodal.ahashMerge(spark, store,
      sigs.filter(col("doc_id") >= 50)).as[(Long, Long)]
      .collect().map(_._1).toSeq
    assert(admitted === 50L +: (51L to 93L by 3L).toSeq)
    // audio family through the SAME sig-generic definition, retract-all
    // geometry: every bucket directory is gone (a ghost dir would keep
    // serving deleted rows — deleteEmptiedBucket fails loudly if it
    // cannot remove one), and the emptied store still merges exactly
    // like a never-populated one (the schema'd-read posture)
    val aSigs = Multimodal.audioSignatures(
      Multimodal.syntheticWavs(spark)).cache()
    val aStore = graft.util.Ephemeral.dir("ehash_retract")
    Multimodal.sigIndexWrite(aSigs.filter(col("doc_id") < 32), "ehash",
      Multimodal.EhashScheme, aStore)
    Multimodal.ehashRetract(spark, aStore,
      aSigs.filter(col("doc_id") < 32))
    assert(new java.io.File(aStore).listFiles()
      .count(_.getName.startsWith("kb=")) === 0)
    val fresh = graft.util.Ephemeral.dir("ehash_retract_fresh")
    Multimodal.sigIndexWrite(aSigs.limit(0), "ehash",
      Multimodal.EhashScheme, fresh)
    def mergeIds(dir: String): Seq[Long] =
      Multimodal.sigMerge(spark, dir, "ehash", Multimodal.EhashScheme,
        aSigs.filter(col("doc_id") >= 32)).as[(Long, Long)]
        .collect().map(_._1).toSeq
    val gotA = mergeIds(aStore)
    assert(gotA.nonEmpty && gotA === mergeIds(fresh))
    sigs.unpersist(); aSigs.unpersist(): Unit
  }

  test("sigIndexCompact bounds per-bucket files without changing the " +
    "merge's answer (merge -> compact -> probe unchanged)") {
    import spark.implicits._
    val store = graft.util.Ephemeral.dir("ahash_compaction")
    val sigs = Multimodal.imageSignatures(
      Multimodal.syntheticImages(spark)).cache()
    // three generations of appends: initial write + two admitted
    // batches, so touched buckets carry several file-sets
    Multimodal.ahashIndexWrite(sigs.filter(col("doc_id") < 30), store)
    val b1 = Multimodal.ahashMerge(spark, store,
      sigs.filter(col("doc_id") >= 30 && col("doc_id") < 60))
      .as[(Long, Long)].collect()
    Multimodal.ahashIndexWrite(b1.toSeq.toDF("doc_id", "ahash"), store,
      mode = "append")
    val b2 = Multimodal.ahashMerge(spark, store,
      sigs.filter(col("doc_id") >= 60)).as[(Long, Long)].collect()
    Multimodal.ahashIndexWrite(b2.toSeq.toDF("doc_id", "ahash"), store,
      mode = "append")
    // an at-least-once REPLAY of the b2 append: duplicate band rows
    // the compaction's DISTINCT must reclaim
    Multimodal.ahashIndexWrite(b2.toSeq.toDF("doc_id", "ahash"), store,
      mode = "append")
    def probe(): Seq[Long] = Multimodal.ahashMerge(spark, store,
      sigs.filter(col("doc_id") >= 50)).as[(Long, Long)]
      .collect().map(_._1).toSeq
    val beforeProbe = probe()
    val distinctBefore = spark.read.parquet(store).distinct().count()
    assert(spark.read.parquet(store).count() > distinctBefore,
      "the replayed append must have produced duplicate rows")
    def maxFiles(): Int = new java.io.File(store).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("kb="))
      .map(_.listFiles().count(f =>
        f.isFile && f.getName.endsWith(".parquet"))).max
    assert(maxFiles() > 1, "fixture must append several file-sets")
    val compacted = Multimodal.sigIndexCompact(spark, store, "ahash",
      maxFilesPerBucket = 1)
    assert(compacted.nonEmpty)
    assert(maxFiles() === 1)
    assert(spark.read.parquet(store).count() === distinctBefore,
      "compaction must keep exactly the distinct rows")
    assert(probe() === beforeProbe,
      "compaction must not change the pruned merge's answer")
    // idempotent: a second pass finds nothing oversized
    assert(Multimodal.sigIndexCompact(spark, store, "ahash",
      maxFilesPerBucket = 1).isEmpty)
    sigs.unpersist()
  }

  test("audioEnvelopeHash: gain-invariant, material-sensitive, None " +
    "on short/silent/unsupported payloads; 16-bit path decodes") {
    def wav8(samples: Array[Int]): Array[Byte] = {
      val data = samples.map(_.toByte)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1,
        false, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, data.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def wav16(samples: Array[Int]): Array[Byte] = {
      val data = new Array[Byte](samples.length * 2)
      samples.zipWithIndex.foreach { case (s, i) =>
        data(2 * i) = (s & 0xff).toByte
        data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val pat = Array.tabulate(600)(j => 13 * (j / 10) % 40 + 1)
    val base = Multimodal.audioEnvelopeHash(wav8(pat.map(128 + _)))
    val doubled = Multimodal.audioEnvelopeHash(wav8(pat.map(128 + 2 * _)))
    assert(base.isDefined && base === doubled) // exact gain cancellation
    // different material lands far away
    val other = Multimodal.audioEnvelopeHash(
      wav8(Array.tabulate(600)(j => 128 + (j * 29 / 10) % 40 + 1)))
    assert(other.isDefined && other != base)
    assert(java.lang.Long.bitCount(base.get ^ other.get) > 8)
    // the 16-bit signed path: same envelope pattern (negated samples
    // too — magnitude is |s|), gain-invariant against its own double
    val b16 = Multimodal.audioEnvelopeHash(
      wav16(pat.zipWithIndex.map { case (v, j) =>
        if (j % 2 == 0) v else -v }))
    val b16x2 = Multimodal.audioEnvelopeHash(
      wav16(pat.zipWithIndex.map { case (v, j) =>
        if (j % 2 == 0) 2 * v else -2 * v }))
    assert(b16.isDefined && b16 === b16x2)
    assert(b16 === base) // same envelope shape -> same hash across widths
    // degenerate payloads: None, never a corrupt hash
    assert(Multimodal.audioEnvelopeHash(wav8(Array.fill(30)(200))).isEmpty)
    assert(Multimodal.audioEnvelopeHash(
      wav8(Array.fill(600)(128))).isEmpty) // silence
    assert(Multimodal.audioEnvelopeHash(
      "not audio at all".getBytes("UTF-8")).isEmpty)
    // hashes respect the 60-bit banding contract
    assert(base.get >= 0L && base.get < (1L << 60))
  }

  test("ehash store lifecycle: admitted audio signatures append back " +
    "and a replayed batch admits nothing (generalized store trio)") {
    import spark.implicits._
    val store = graft.util.Ephemeral.dir("ehash_lifecycle")
    val sigs = Multimodal.audioSignatures(
      Multimodal.syntheticWavs(spark)).cache()
    val batch = sigs.filter(col("doc_id") >= 32)
    Multimodal.sigIndexWrite(sigs.filter(col("doc_id") < 32), "ehash",
      Multimodal.EhashScheme, store)
    val admitted = Multimodal.sigMerge(spark, store, "ehash",
        Multimodal.EhashScheme, batch)
      .as[(Long, Long)].collect()
    // id 32 completes stored group 10 (cross-store drop); each all-new
    // group admits its lowest member
    assert(admitted.map(_._1).toSeq === (33L to 57L by 3L).toSeq)
    Multimodal.sigIndexWrite(
      admitted.toSeq.toDF("doc_id", "ehash"), "ehash",
      Multimodal.EhashScheme, store, mode = "append")
    assert(Multimodal.sigMerge(spark, store, "ehash",
      Multimodal.EhashScheme, batch).count() === 0L)
    sigs.unpersist()
  }

  test("imageClusters: full-corpus disposition — groups resolve to " +
    "min-id components, unpaired signatures become singletons") {
    import spark.implicits._
    // two hamming-0 groups + one planted unique signature whose hash
    // differs from both groups in every band (exercises the singleton
    // complement path the 96-PNG fixture never hits)
    val far = (1L << 60) - 1 // all-ones: far from both groups
    // 0x3ff is 10 bits from 0 — the groups share bands 1..3 (candidate
    // pairs DO form) but fail the popcount verify (10 > 8): the planted
    // non-pair exercises verify-inside-the-join, not just banding
    val sigs = Seq(
      (10L, 0x3ffL), (11L, 0x3ffL), (12L, 0x3ffL),
      (20L, 0L), (21L, 0L),
      (99L, far)).toDF("doc_id", "ahash")
    val out = Multimodal.imageClusters(sigs)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (10L, 10L, 3L, true), (11L, 10L, 3L, false), (12L, 10L, 3L, false),
      (20L, 20L, 2L, true), (21L, 20L, 2L, false),
      (99L, 99L, 1L, true)))
  }

  test("sigClusters disposition is a PARTITION on a collision-heavy " +
    "pseudo-random signature set: every doc exactly once, one " +
    "canonical per cluster, cluster_id = member min") {
    import spark.implicits._
    // small signature alphabet forces a mixed graph: dense clusters,
    // chains through shared bands, and genuine singletons
    val sigs = (0L until 48L).map { i =>
      val v = (i * i * 2654435761L) % 5 // 5 base patterns
      (i, v * 0x0041041041041L) // spread bits so patterns differ >8
    }.toDF("doc_id", "ehash")
    val out = graft.functions.Multimodal
      .sigClusters(sigs, "ehash", graft.functions.Multimodal.EhashScheme)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(out.map(_._1).sorted === (0L until 48L))
    out.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.forall(_._3 === members.size.toLong))
      assert(members.count(_._4) === 1)
      assert(members.filter(_._4).head._1 === members.map(_._1).min)
      assert(cid === members.map(_._1).min)
    }
  }

  test("q45e: 32 clusters of 3, min-id canonical, every image covered") {
    import spark.implicits._
    val out = Multimodal.q45eImageClusters(spark, sf)
      .as[(Long, Long, Long, Boolean)].collect()
    assert(out.length === 96)
    assert(out.map(_._1).toSet === (0L until 96L).toSet)
    out.foreach { case (id, cid, size, canon) =>
      assert(cid === (id / 3) * 3) // group min
      assert(size === 3L)
      assert(canon === (id % 3 == 0))
    }
  }
}
