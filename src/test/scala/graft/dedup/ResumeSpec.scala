package graft.dedup

import graft.SparkTest
import graft.core.DedupConfig
import graft.corpus.CorpusGen
import graft.snapshot.SnapshotLog
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** North-rule resumability: a run killed after any committed checkpoint
  * resumes and reproduces the uninterrupted run's assignments exactly. */
class ResumeSpec extends AnyFunSuite with SparkTest {

  private val n = 400
  private val cfg = DedupConfig.default

  private def clips = CorpusGen.clips(spark, n).toDF()

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-resume-$tag").toString

  private def assignmentsOf(workDir: String): Map[String, Long] =
    CheckpointedDedup.run(clips, workDir, cfg).get
      .select("clip_id", "cluster").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  private lazy val uninterrupted: Map[String, Long] = assignmentsOf(tmpDir("full"))

  test("uninterrupted checkpointed run matches the plain pipeline") {
    val plain = DedupPipeline.run(clips, cfg)
      .select("clip_id", "cluster").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uninterrupted == plain)
  }

  test("kill after features, resume reproduces assignments") {
    val dir = tmpDir("feat")
    assert(CheckpointedDedup.run(clips, dir, cfg, stopAfter = Some("features")).isEmpty)
    assert(SnapshotLog.exists(s"$dir/features"))
    assert(!SnapshotLog.exists(s"$dir/edges"))
    assert(assignmentsOf(dir) == uninterrupted)
  }

  test("kill after edges, resume reproduces assignments") {
    val dir = tmpDir("edges")
    assert(CheckpointedDedup.run(clips, dir, cfg, stopAfter = Some("edges")).isEmpty)
    assert(SnapshotLog.exists(s"$dir/edges"))
    assert(assignmentsOf(dir) == uninterrupted)
  }

  test("kill mid-CC (after round 0), resume reproduces assignments") {
    val dir = tmpDir("cc")
    assert(CheckpointedDedup.run(clips, dir, cfg, stopAfter = Some("labels_round_0")).isEmpty)
    val snap = SnapshotLog.latestStage(s"$dir/labels")
    assert(snap.exists(_.stage == "labels_round_0"))
    assert(assignmentsOf(dir) == uninterrupted)
    // converged marker present after resume
    assert(SnapshotLog.latestStage(s"$dir/labels").exists(_.stage == "labels_converged"))
  }

  test("manifests carry per-partition lineage and metrics are appended") {
    val dir = tmpDir("lineage")
    assignmentsOf(dir)
    val m = SnapshotLog.manifest(s"$dir/features").get
    assert(m.rows == n)
    assert(m.partRows.sum == m.rows, "partition lineage must sum to row count")
    assert(m.partRows.nonEmpty)
    val metrics = Files.readString(Paths.get(dir, "metrics.jsonl"))
    assert(metrics.contains("\"stage\":\"features\""))
    assert(metrics.contains("\"stage\":\"labels_converged\""))
    assert(metrics.contains("\"stage\":\"assignments\""))
  }

  test("second run over a completed workDir is a pure read (no recompute)") {
    val dir = tmpDir("idem")
    assignmentsOf(dir)
    val v1 = SnapshotLog.latestVersion(s"$dir/assignments")
    assert(assignmentsOf(dir) == uninterrupted)
    assert(SnapshotLog.latestVersion(s"$dir/assignments") == v1, "resume must not re-commit")
  }
}
