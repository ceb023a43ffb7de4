package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support (driver north-star): media as opaque BINARY
  * payloads with typed metadata, processed by per-partition batch
  * functions — the Scala analog of a vectorized decode UDF.
  *
  * The decode step is a STUB: this container has no image/audio codecs,
  * so `decodeStub` derives deterministic fake features from the payload
  * bytes. Everything AROUND the stub is real and load-bearing: the
  * schema (binary + struct metadata), the typed Dataset plumbing, the
  * partition-level batch shape (one iterator pass per partition, no
  * per-row task overhead), and the pushdown-friendly projections.
  *
  * Scale: payloads stay opaque bytes end-to-end (no driver collect, no
  * string conversion); decode is mapPartitions so a real codec would
  * amortize model/codec init once per partition — exactly the shape a
  * Pandas-UDF/mapInPandas pipeline has in PySpark.
  */
object Multimodal {

  /** A media row: payload is the raw bytes of the asset. */
  case class MediaRecord(doc_id: Long, modality: String,
      payload: Array[Byte], source: String)

  /** Extracted features; `embedding` stands in for a model output. */
  case class MediaFeatures(doc_id: Long, modality: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, embedding: Array[Float])

  /** Build a media table from the documents fixture: the text bytes act
    * as the opaque payload (deterministic stand-in for image bytes). */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    graft.ops.Tables.documents(s, d)
      .select(col("doc_id"),
        // deterministic modality assignment: hash-route documents
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        col("source"))
      .as[MediaRecord]
  }

  /** STUB decode: deterministic fake dimensions/frames/embedding derived
    * from payload bytes. A real implementation would invoke a codec here
    * (one init per partition); the signature and batch shape are final. */
  def decodeStub(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    // >>> per-partition init would go here (codec/model load) <<<
    records.map { r =>
      val len = r.payload.length
      val h = java.util.Arrays.hashCode(r.payload)
      def dim(seed: Int): Int = 16 + math.floorMod(h * 31 + seed, 1024)
      MediaFeatures(
        doc_id = r.doc_id,
        modality = r.modality,
        byte_len = len,
        width = if (r.modality == "audio") 0 else dim(1),
        height = if (r.modality == "audio") 0 else dim(2),
        n_frames = r.modality match {
          case "video" => 1 + math.floorMod(h, 300)
          case _ => 1
        },
        embedding = Array.tabulate(8)(i =>
          (math.floorMod(h * (i + 1), 1000) / 1000.0f)))
    }
  }

  /** STUB resize: clamps decoded dimensions to a max edge, preserving
    * aspect via integer math. Real codecs would transform `payload`;
    * the metadata contract (width/height rewritten, payload untouched)
    * is final. */
  def resizeStub(maxEdge: Int)(records: Iterator[MediaFeatures])
      : Iterator[MediaFeatures] =
    records.map { f =>
      val edge = math.max(f.width, f.height)
      if (edge <= maxEdge || edge == 0) f
      else f.copy(
        width = f.width * maxEdge / edge,
        height = f.height * maxEdge / edge)
    }

  /** STUB frame sampling: deterministic every-k-th frame count for video
    * (the real stage would emit one row per sampled frame). */
  def frameSampleStub(everyK: Int)(records: Iterator[MediaFeatures])
      : Iterator[MediaFeatures] =
    records.map { f =>
      if (f.modality == "video")
        f.copy(n_frames = (f.n_frames + everyK - 1) / everyK)
      else f
    }

  /** Full pipeline: encode -> partition-batched stub decode -> resize ->
    * frame-sample -> features. Registered as q45 WITH an oracle: the
    * stub decode is deterministic from the payload bytes (Java
    * Arrays.hashCode fold), so DuckDB can replay the exact arithmetic —
    * the plumbing (schema, partitioning, iterator batch shape) plus the
    * stub math are all hash-checked. */
  def q45MultimodalPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .repartition(col("doc_id")) // spread decode work evenly
      .mapPartitions(decodeStub)
      .mapPartitions(resizeStub(256))
      .mapPartitions(frameSampleStub(10))
      .select(col("doc_id"), col("modality"), col("byte_len"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
  }

  /** Binary scalar functions over the payload column — the oracle-checked
    * slice of the multimodal surface (octet length, sha256, base64). */
  def q46BinaryFuncs(s: SparkSession, d: String): DataFrame =
    graft.ops.Tables.documents(s, d)
      .select(col("doc_id"),
        length(col("text").cast("binary")).as("byte_len"),
        sha2(col("text").cast("binary"), 256).as("sha256_hex"),
        // Spark's base64() is MIME-wrapped at 76 chars; strip the CRLFs
        // to get canonical (RFC 4648) output like DuckDB's to_base64
        regexp_replace(base64(col("text").cast("binary")), "\r\n", "")
          .as("payload_b64"))
      .orderBy(col("doc_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q45_multimodal_pipeline" -> (q45MultimodalPipeline _),
    "q46_binary_funcs" -> (q46BinaryFuncs _),
  )

  /** 32-bit Java-int wrap of a BIGINT expression, floor-mod style.
    * DuckDB's % keeps the dividend's sign, so the naive single-mod wrap
    * is off by 2^32 whenever the intermediate is negative (caught
    * because mod-1024 residues coincidentally matched: 1024 | 2^32). */
  private def wrap32(x: String): String =
    s"(((($x) + 2147483648) % 4294967296) + 4294967296) % 4294967296" +
      " - 2147483648"

  /** floorMod of a (possibly negative) BIGINT expr by a positive m. */
  private def fmod(x: String, m: Long): String = s"((($x) % $m) + $m) % $m"

  val oracles: Map[String, String] = Map(
    // DuckDB replay of the deterministic stub pipeline: h = Java
    // Arrays.hashCode(bytes) (list_reduce fold with 32-bit wrap; fixture
    // is pure ASCII so ord(char) == byte), then the same dim/resize/
    // frame-sample integer math as decodeStub/resizeStub/frameSampleStub.
    "q45_multimodal_pipeline" ->
      s"""WITH h32 AS (
         |  SELECT doc_id,
         |    CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         |      ELSE 'video' END AS modality,
         |    CAST(length(text) AS INT) AS byte_len,
         |    list_reduce(
         |      list_prepend(CAST(1 AS BIGINT),
         |        [CAST(ord(substr(text, i, 1)) AS BIGINT)
         |         FOR i IN generate_series(1, length(text))]),
         |      (a, b) -> ${wrap32("31*a + b")}) AS h
         |  FROM documents),
         |dims AS (
         |  SELECT doc_id, modality, byte_len, h,
         |    CASE modality WHEN 'audio' THEN 0 ELSE
         |      16 + CAST(${fmod(wrap32("31*h + 1"), 1024)} AS INT)
         |    END AS w0,
         |    CASE modality WHEN 'audio' THEN 0 ELSE
         |      16 + CAST(${fmod(wrap32("31*h + 2"), 1024)} AS INT)
         |    END AS h0,
         |    CASE modality WHEN 'video' THEN
         |      1 + CAST(${fmod("h", 300)} AS INT) ELSE 1 END AS f0
         |  FROM h32),
         |resized AS (
         |  SELECT doc_id, modality, byte_len,
         |    CASE WHEN greatest(w0, h0) <= 256 OR greatest(w0, h0) = 0
         |      THEN w0 ELSE CAST(w0 * 256 // greatest(w0, h0) AS INT)
         |    END AS width,
         |    CASE WHEN greatest(w0, h0) <= 256 OR greatest(w0, h0) = 0
         |      THEN h0 ELSE CAST(h0 * 256 // greatest(w0, h0) AS INT)
         |    END AS height,
         |    CASE modality WHEN 'video' THEN CAST((f0 + 9) // 10 AS INT)
         |      ELSE f0 END AS n_frames
         |  FROM dims)
         |SELECT doc_id, modality, byte_len, width, height, n_frames
         |FROM resized ORDER BY doc_id""".stripMargin,
    "q46_binary_funcs" ->
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS byte_len,
        |  sha256(text) AS sha256_hex,
        |  to_base64(CAST(text AS BLOB)) AS payload_b64
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
