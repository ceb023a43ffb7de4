package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev only — the driver always passes 2): a
    // comma-separated query-name filter, so an oracle can be checked
    // end-to-end without re-dumping the whole registry
    val (sfDir, outDir, only) = args match {
      case Array(a, b) => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark) // SQL functions + optimizer rewrites
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json FIRST (round-14 verdict #1: the round's official
    // CORRECTNESS artifact landed empty with no diagnosable trail — if
    // anything below dies or times out, the driver-side compare should
    // still find the oracle file rather than nothing at all)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // verify_summary.json: query -> dumped row count (-1 = failed),
    // REWRITTEN after every query so even a killed run leaves
    // per-query evidence of how far the dump got and what each result
    // held (round-14 verdict #1's fallback artifact).
    val summary = scala.collection.mutable.LinkedHashMap[String, Long]()
    // best-effort: a summary-write failure (ENOSPC, transient FS error)
    // must never abort the remaining query dumps — the dumps are the
    // primary evidence, the summary is the fallback artifact
    def writeSummary(): Unit =
      try Files.writeString(
        Paths.get(s"$outDir/verify_summary.json"),
        summary.map { case (k, v) => s"${q(k)}: $v" }
          .mkString("{", ",", "}")): Unit
      catch { case e: Exception =>
        System.err.println(s"[verify] summary write failed: ${e.getMessage}")
      }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // count from the WRITTEN parquet (footer metadata — no
        // recompute), so the summary reflects what the driver will read.
        // Separate try (round-15 ADVICE): the dump above is the primary
        // evidence; a transient failure READING IT BACK must not record
        // the query as failed (-1) — -2 = dumped ok, count read failed.
        summary(name) = try spark.read.parquet(s"$outDir/$name").count()
          catch { case e: Throwable =>
            System.err.println(
              s"[verify] $name dumped but count read failed: ${e.getMessage}")
            -2L
          }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        summary(name) = -1L
      }
      writeSummary()
    }
    spark.stop()
  }
}
