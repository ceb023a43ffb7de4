package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stagewise profile of the q36b MinHash+LSH pipeline (current
  * fast shape), 2 reps each so JIT/compile lands in rep1. */
object ProfileQ36b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stageTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          stageTimes.put(si.stageId,
            (si.name.take(60),
             si.taskMetrics.executorRunTime, si.numTasks))
        }
      })
    def dumpStages(): Unit = {
      import scala.jdk.CollectionConverters._
      stageTimes.asScala.toSeq.sortBy(_._1).foreach { case (id, (n, rt, nt)) =>
        println(f"[stage] $id%4d runTimeMs=$rt%-7d tasks=$nt%-4d $n")
      }
      stageTimes.clear()
    }
    def t[A](label: String)(f: => A): Unit =
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        f
        println(f"[prof] $label rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val docs = graft.ops.Tables.documents(spark, d)
    t("docs scan")(docs.count())
    val base = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
    val sh = base.select(col("doc_id"),
      explode(transform(
        sequence(lit(0), size(col("w")) - 3),
        i => concat_ws(" ", element_at(col("w"), i + 1),
          element_at(col("w"), i + 2), element_at(col("w"), i + 3))))
        .as("shingle"))
    t("a. shingles only")(sh.count())
    val digests = (0 until 2).map(g =>
      sha2(concat(lit(s"s$g:"), col("shingle")).cast("binary"), 256))
    t("b. + 2 sha256")(sh.select(col("doc_id"),
      digests(0).as("d0"), digests(1).as("d1"))
      .filter(col("d0") =!= "").count())
    val sliced = sh.select(
      col("doc_id") +: (0 until 16).map(j =>
        conv(substring(digests(j / 8), 1 + 8 * (j % 8), 8), 16, 10)
          .cast("long").as(s"x$j")): _*)
    t("c. + 16 conv slices")(sliced.filter(col("x0") > -1).count())
    val sig = sliced.groupBy(col("doc_id")).agg(
      array((0 until 16).map(j => min(col(s"x$j"))): _*).as("mins"))
    t("d. + groupBy mins")(sig.count())
    val bands = sig.select(col("doc_id"), col("mins"),
      explode(array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          element_at(col("mins"), 2 * b + 1).as("k1"),
          element_at(col("mins"), 2 * b + 2).as("k2"))): _*))
        .as("bb"))
      .select(col("doc_id"), col("mins"), col("bb.band").as("band"),
        col("bb.k1").as("k1"), col("bb.k2").as("k2"))
    t("d2. bands")(println("  n=" + bands.count()))
    val joined = bands.as("x").hint("shuffle_hash")
      .join(bands.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.k1") === col("y.k1") &&
          col("x.k2") === col("y.k2"))
      .filter(col("x.doc_id") < col("y.doc_id"))
    t("d3. band join no nmatch")(println("  n=" + joined.count()))
    dumpStages()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("d3b. same, AQE off")(println("  n=" + joined.count()))
    println("[stage] ==== d3b stages ====")
    dumpStages()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t("d3c. AQE off, 8 parts")(println("  n=" + joined.count()))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t("d3d. AQE on, 8 parts")(println("  n=" + joined.count()))
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    val bdir = java.nio.file.Files.createTempDirectory("bands_").toString
    bands.write.mode("overwrite").parquet(bdir)
    val bp = spark.read.parquet(bdir)
    val joined2 = bp.as("x").hint("shuffle_hash")
      .join(bp.as("y").hint("shuffle_hash"),
        col("x.band") === col("y.band") && col("x.k1") === col("y.k1") &&
          col("x.k2") === col("y.k2"))
      .filter(col("x.doc_id") < col("y.doc_id"))
    t("d3e. join from parquet bands")(println("  n=" + joined2.count()))
    val nM = aggregate(
      zip_with(col("x.mins"), col("y.mins"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    t("d4. + nmatch select+distinct")(println("  n=" +
      joined.select(col("x.doc_id").as("doc_a"),
        col("y.doc_id").as("doc_b"), nM.as("n_match"))
        .filter(col("n_match") * 2 >= 16).distinct().count()))
    t("e. full q36b")(
      graft.SparkEntry.queries("q36b_minhash_lsh")(spark, d).count())
    val q = graft.SparkEntry.queries("q36b_minhash_lsh")(spark, d)
    q.collect()
    val fin = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    println("[plan] " + fin.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Reused") ||
        l.contains("Scan") || l.contains("Aggregate") ||
        l.contains("Join")).mkString("\n[plan] "))
    spark.stop()
  }
}
