package graft

import org.apache.spark.sql.SparkSession

/** Shared bench-adjacent helpers for in-round measurement tools (QueryProf,
  * PlanDump, isolation benches). Bench.scala is frozen for measurement, so
  * its private staging logic is replicated here with the SAME cache key —
  * both resolve to the same staged directory and never re-stage each
  * other's work. */
object BenchExtra {

  /** Row-group-split staged copy of the sf tables (same layout + cache key
    * as graft.Bench.stageSfTables: `cores` files per table, events.parquet
    * copied verbatim for the streaming queries). */
  def stageSfTables(spark: SparkSession, sfDir: String, parts: Int): String = {
    val src = new java.io.File(sfDir)
    val sig = Option(src.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString(",")
    val tag = java.lang.Long.toHexString(
      graft.core.Murmur3.hashString(src.getCanonicalPath + "|" + sig, 21L))
    val out = s"/tmp/graft_sf_staged_${tag}_$parts"
    val done = new java.io.File(s"$out/_STAGED")
    if (!done.exists()) {
      new java.io.File(out).mkdirs()
      val files = Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
      for (f <- files if f.getName.endsWith(".parquet")) {
        if (f.getName == "events.parquet" && f.isFile) {
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(s"$out/${f.getName}"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } else {
          spark.read.parquet(f.getAbsolutePath).repartition(parts)
            .write.mode("overwrite").parquet(s"$out/${f.getName}")
        }
      }
      done.createNewFile()
    }
    out
  }
}
