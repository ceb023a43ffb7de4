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
}
