package graft

import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` output for named SparkEntry queries to
  * text files — the optimization-round evidence artifact
  * (`plans/r06/<query>_<tag>.txt`). Queries with eager side effects in
  * their builder (p04 runs the checkpoint lifecycle, s01/s02 drive a
  * streaming query, q16 collects a sketch literal) still produce the plan
  * of the RETURNED DataFrame; the side-effect cost is paid once here,
  * outside any timed window.
  *
  * Run: sbt "runMain graft.PlanDump <outDir> <tag> [q1,q2,...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r06")
    val tag = if (args.length > 1) args(1) else "before"
    val names = if (args.length > 2)
      args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "256m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), txt)
            println(s"PLAN $name -> $outDir/${name}_$tag.txt")
          } catch {
            case e: Throwable => System.err.println(s"PLAN $name FAILED: $e")
          }
        case None => System.err.println(s"no such query: $name")
      }
    }
    spark.stop()
  }
}
