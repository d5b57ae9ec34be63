package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // enable the driver-side oracle writers + recall contracts (skipped
    // under graft.Bench so benchmarks time operators, not test oracles)
    sys.props("graft.writeOracles") = "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // -Dgraft.verifyFilter=e02,e04: dump only matching queries (builder
    // iteration aid; the driver harness never sets it)
    val filter = sys.props.getOrElse("graft.verifyFilter", "")
      .split(",").map(_.trim).filter(_.nonEmpty)
    SparkEntry.queries
      .filter { case (name, _) => filter.isEmpty || filter.exists(name.startsWith) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
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
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // no-silent-caps evidence (ADVICE r4): bucket runs that exceeded
    // runBufferCap degrade to the windowed drain and forfeit candidate-
    // recall completeness — the count must be 0 for the "lane equals
    // oracle" claims above to be airtight, and is dumped so the claim is
    // machine-checkable per verify run.
    val ov = graft.dedup.CandidatePairs.overflowRuns(spark)
    Files.writeString(Paths.get(s"$outDir/pair_gen_overflow_runs.json"),
      s"""{"overflow_runs":$ov}""")
    if (ov > 0) System.err.println(s"[verify] WARNING: $ov bucket runs overflowed " +
      "runBufferCap — windowed-drain degrade fired; candidate recall not complete")
    spark.stop()
  }
}
