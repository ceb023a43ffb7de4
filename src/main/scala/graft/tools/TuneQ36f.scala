package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: row counts of the banded embedding near-dup LSH across band
  * configurations, to pick a fixture default that both avoids the fixed-
  * key-space ceiling and demonstrates nonzero recall on the fixture's
  * 0.4-0.51 cosine pair range. */
object TuneQ36f {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val emb = graft.ops.Tables.embeddings(spark, s"/root/testdata/$sf")
      for ((nb, bb) <- Seq((4, 16), (8, 12), (12, 10), (16, 10), (8, 10))) {
        val n = graft.ops.Similarity.embeddingNearDupLsh(emb, nb, bb).count()
        println(s"[tune] $sf bands=$nb bits=$bb rows=$n")
      }
    }
    spark.stop()
  }
}
