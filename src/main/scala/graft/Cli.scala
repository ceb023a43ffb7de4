package graft

import graft.sources.{Ingest, Pipeline, TimeSeriesStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Command-line surface mirroring the reference's riot-graph.py
  * (ref riot-graph.py:42-89): `fetch` = backfill, `update` = incremental
  * refresh, `--noop` = dry-run counting without writing (rg.py:35),
  * `--history=N` = bounded replay (rg.py:43-50).
  *
  *   runMain graft.Cli fetch --commits=<textfile> --artifacts=<parquet>
  *     --prdim=<parquet> --store=<dir> [--history=N] [--noop]
  *   runMain graft.Cli update  ... (same inputs; reads the store's
  *     pr_events for the high-water mark)
  *
  * Inputs replace the reference's process boundaries: the git subprocess
  * becomes a commit-log text file, the CI/GitHub HTTP fetches become
  * artifact/dim tables (any Spark-readable source).
  */
object Cli {

  case class Conf(mode: String, commits: String, artifacts: String,
      prDim: String, store: String, history: Option[Int], noop: Boolean)

  def parse(args: Array[String]): Conf = {
    val opts = args.drop(1).filter(_.startsWith("--"))
      .map { a =>
        val kv = a.stripPrefix("--").split("=", 2)
        kv(0) -> (if (kv.length > 1) kv(1) else "true")
      }.toMap
    Conf(
      mode = args.headOption.getOrElse("fetch"),
      commits = opts.getOrElse("commits", sys.error("--commits required")),
      artifacts = opts
        .getOrElse("artifacts", sys.error("--artifacts required")),
      prDim = opts.getOrElse("prdim", sys.error("--prdim required")),
      store = opts.getOrElse("store", sys.error("--store required")),
      history = opts.get("history").map(_.toInt),
      noop = opts.contains("noop"))
  }

  /** Run one CLI invocation; returns (build rows, event rows) written
    * (or counted under --noop). */
  def run(spark: SparkSession, conf: Conf): (Long, Long) = {
    val commitsRaw = spark.read.text(conf.commits)
    val artifacts = spark.read.parquet(conf.artifacts)
    val prDim = spark.read.parquet(conf.prDim)

    val (builds, events) = conf.mode match {
      case "update" =>
        val stored = storedEvents(spark, conf.store)
        Pipeline.incremental(commitsRaw, artifacts, prDim, stored)
      case _ =>
        val (b, e) = Pipeline.backfill(commitsRaw, artifacts, prDim)
        conf.history match {
          case Some(n) =>
            val hi = Ingest.parseCommitLog(commitsRaw)
              .agg(max(col("commit_ts"))).head().getTimestamp(0)
            val lo = new java.sql.Timestamp(
              hi.getTime - n.toLong * 24 * 3600 * 1000)
            (b.filter(col("ts") >= lit(lo)), e.filter(col("ts") >= lit(lo)))
          case None => (b, e)
        }
    }

    val nb = builds.count()
    val ne = events.count()
    if (!conf.noop) {
      TimeSeriesStore.write(builds, s"${conf.store}/build_sizes")
      TimeSeriesStore.write(events, s"${conf.store}/pr_events")
    }
    (nb, ne)
  }

  /** Stored pr_events, or an empty typed frame when the store is new
    * (the empty-store bootstrap, rg.py:140-141 / SURVEY §1.2). */
  def storedEvents(spark: SparkSession, store: String): DataFrame = {
    val path = new java.io.File(s"$store/pr_events")
    if (path.exists()) spark.read.parquet(path.toString)
    else spark.range(0)
      .select(lit(null).cast("timestamp").as("ts"),
        lit(null).cast("long").as("pr_num"),
        lit(null).cast("string").as("hash"))
  }

  def main(args: Array[String]): Unit = {
    val conf = parse(args)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (nb, ne) = run(spark, conf)
    println(s"""{"status":"ok","builds":$nb,"events":$ne,"noop":${conf.noop}}""")
    spark.stop()
  }
}
