package graft

import graft.core.DedupConfig
import graft.corpus.CorpusGen
import graft.dedup.DedupPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round benchmark. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "dedup":{n, sec/throughput at local[2]/local[8]/local[32],
  *           scaling_efficiency_2to8, scaling_efficiency_8to32,
  *           deterministic}}
  *
  * Scaling protocol (BASELINE.md): no real cluster in the sandbox, so the
  * north rule's N→4N executor scaling is evidenced by running the identical
  * dedup job on the identical pre-generated input at a LADDER of pinned
  * parallelism levels (1/2/4/8/32 cores; taskset bounds each child's whole
  * CPU budget — task slots, GC, JIT — like a real N-core executor).
  * Two N→4N pairs are reported with same-protocol calibration next to each:
  *  - 1→4 cores, the north-rule pair: all three calibration kernels
  *    (register compute, shared-stream membw, private-stream membw) show
  *    this host delivering ~3.9-4x across it, so the pipeline's efficiency
  *    there measures the ALGORITHM;
  *  - 2→8 cores, the diagnostic pair. Precision about its ceiling (ADVICE
  *    r3): the SHARED-stream calibration kernel scales ~1.0 across 2→8 (all
  *    threads stream the same lines; DRAM fetches amortize), and register
  *    compute ~0.98 — only the PRIVATE-stream kernel (per-task arrays, the
  *    traffic shape of thread-private shuffle/sort buffers) scales ~3.4x
  *    for the 4x core step (13.2/44.9 GB/s at 2/8 threads). So the pair's
  *    ceiling is sub-1.0 exactly to the extent the pipeline's memory
  *    traffic is thread-private; all three kernel families are published
  *    beside the pipeline number so a reader can weigh that.
  * Above 8 threads private bandwidth scales just 2.1x to 32 (113 GB/s):
  * local[32] is reported as the peak-throughput point with
  * efficiency_8to32 documenting that ceiling. Shuffle partitions scale
  * with cores; efficiency = t_N / (4 * t_4N). Corpus generation is
  * excluded from the timed window (input is parquet on disk, like
  * production); each level runs warmup + `graft.benchReps` iterations in a
  * fresh child JVM and reports the min (the host shows heavy interference
  * spikes; min-of-k estimates machine capability). Each level's JSON block
  * carries the child's self-reported cpu-affinity mask (`pin_N`), the
  * min-iteration's summed task seconds (`taskSec_N`), and the measured rep
  * count (`reps_N`) so pinning and window cleanliness are machine-checkable
  * in the artifact itself (VERDICT r3 #1).
  */
object Bench {

  private def prop(k: String, dflt: String): String = sys.props.getOrElse(k, dflt)

  /** Bench-corpus parquet partition count: 32 makes the scan task count an
    * exact multiple of every measured level (2/8/32 cores), so no level pays
    * a ragged last wave in the features stage. (The previous 8x260MB layout
    * split into 17 uneven tasks: at 8 cores that is 2 full waves plus ONE
    * task holding 7 cores idle — measured ~1.3s of the 8-core wall.) */
  private val CorpusParts = 32

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(prop("graft.master", s"local[$cores]"))
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", prop("graft.shufflePartitions", cores.toString))
      .config("spark.sql.adaptive.enabled", prop("graft.aqe", "true"))
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/graft-spark"))
      .config("spark.sql.autoBroadcastJoinThreshold", prop("graft.broadcastThreshold", "256m"))
      // local mode: broadcast value materialization is serialized across
      // task threads (TorrentBroadcast KeyLock) — uncompressed pieces make
      // the one-time build several times cheaper (no network to save)
      .config("spark.broadcast.compress", prop("graft.broadcastCompress", "false"))
      .config("spark.broadcast.blockSize", prop("graft.broadcastBlock", "64m"))
      // local-mode shuffle reads otherwise mmap every block >2m: on this
      // kernel concurrent munmap serializes all page faults on mmap_lock
      // (measured: sys time > user time at local[32]) — plain pread instead
      .config("spark.storage.memoryMapThreshold", prop("graft.mmapThreshold", "2g"))
      // single host: every task is process-local; the default 3s locality
      // wait only delays launches after uneven stage tails
      .config("spark.locality.wait", prop("graft.localityWait", "0"))
      .config("spark.shuffle.compress", prop("graft.shuffleCompress", "true"))
      .config("spark.shuffle.spill.compress", prop("graft.shuffleCompress", "true"))
      // this host's page-alloc path is slow (~40-60 MB/s first-touch tmpfs,
      // measured); large write buffers cut shuffle write() calls ~16x
      .config("spark.shuffle.file.buffer", prop("graft.shuffleBuffer", "1m"))
      .config("spark.shuffle.unsafe.file.output.buffer", prop("graft.shuffleBuffer", "1m"))
      .config("spark.io.compression.lz4.blockSize", prop("graft.lz4Block", "512k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Order-independent checksum of the cluster assignment (clip -> rep). */
  private def assignmentChecksum(assign: DataFrame): Long =
    assign.select(sum(crc32(concat_ws(",", col("clip_id"), col("rep_clip_id")))).as("c"))
      .collect()(0).getLong(0)

  /** Run one timed dedup in a FRESH child JVM (same classpath): back-to-back
    * SparkContexts in one JVM contaminate each other (GC state, leftover
    * pools), which corrupted same-JVM scaling measurements.
    *
    * JVM shape (all measured on this sandbox host, a VM whose first-touch
    * page provisioning runs at ~1 GiB/s and whose tmpfs writes run at
    * ~40-60 MB/s):
    *  - fixed, PINNED generations + AlwaysPreTouch: ParallelGC's adaptive
    *    resizing re-touches pages each resize — observed 20-40s GC spikes
    *    per iteration without pinning, 0.1-1s with;
    *  - big eden (22g of 28g): the pipeline's allocation is overwhelmingly
    *    short-lived row/buffer churn;
    *  - ParallelGCThreads=8: 32 GC workers spent ~0.9 CPU-core of pure sys
    *    time in work-stealing yield spins on this kernel;
    *  - G1 was tried and spent minutes of kernel time in page management. */
  private def spawnChild(childArgs: Seq[String], marker: String): String =
    spawnChild(childArgs, marker, 0)

  private def spawnChild(childArgs: Seq[String], marker: String, pinCores: Int): String =
    spawnChild(childArgs, marker, pinCores,
      prop("graft.childHeap", "28g"), prop("graft.childNewGen", "22g"))

  /** `pinCores` > 0 bounds the child's ENTIRE CPU budget (task slots + GC +
    * JIT + shuffle/netty threads) to that many hardware threads via
    * `taskset`. This is what "an N-core executor" actually means: without
    * it, local[2] borrowed unbounded host threads for GC (8), JIT (4) and
    * Spark auxiliaries — free capacity a real 2-core executor does not
    * have, inflating the N-side throughput and depressing the measured
    * N→4N efficiency below what real executors would show. GC threads are
    * scaled down to the pinned budget for the same reason. */
  private def spawnChild(childArgs: Seq[String], marker: String, pinCores: Int,
                         heap: String, newGen: String): String = {
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val java = s"${System.getProperty("java.home")}/bin/java"
    // heap/newgen come from the caller (overridable via graft.childHeap /
    // graft.calibHeap — hosts with < ~30g free RAM would otherwise hard-fail
    // on AlwaysPreTouch)
    val pin = pinCores > 0 && prop("graft.pinCpus", "true").toBoolean &&
      new _root_.java.io.File("/usr/bin/taskset").exists()
    val prefix = if (pin) Seq("/usr/bin/taskset", "-c", s"0-${pinCores - 1}") else Seq.empty
    val gcThreads = if (pin) math.min(8, math.max(1, pinCores)) else 8
    val jitThreads = if (pin) math.min(4, math.max(2, pinCores)) else 4
    val cmd = prefix ++ Seq(java, s"-Xms$heap", s"-Xmx$heap", s"-Xmn$newGen",
      "-XX:+UseParallelGC", "-XX:-UseAdaptiveSizePolicy", "-XX:SurvivorRatio=6",
      "-XX:+AlwaysPreTouch", s"-XX:ParallelGCThreads=$gcThreads",
      s"-XX:CICompilerCount=$jitThreads") ++
      addOpens ++
      sys.props.toSeq.collect { case (k, v) if k.startsWith("graft.") => s"-D$k=$v" } ++ Seq(
      "-cp", System.getProperty("java.class.path"),
      "graft.Bench") ++ childArgs
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes())
    p.waitFor()
    out.linesIterator.find(_.startsWith(marker)).getOrElse(
      throw new IllegalStateException(s"child failed:\n${out.takeRight(2000)}"))
  }

  /** One level's measurement: wall sec + checksum of the min iteration, the
    * min iteration's summed task run time, the child's ACTUAL cpu-affinity
    * mask (read from its own /proc/self/status — machine evidence that the
    * taskset pin reached the measured JVM, VERDICT r3 #1), and the measured
    * rep count. */
  private final case class LevelRun(sec: Double, sum: Long, taskSec: Double,
                                    cpuSec: Double, pinMask: String, reps: Int,
                                    overflowRuns: Long)

  private def timedDedup(cores: Int, corpusPath: String, reps: Int = 0): LevelRun = {
    val repArg = if (reps > 0) Seq(reps.toString) else Seq.empty
    val line = spawnChild(Seq("child", cores.toString, corpusPath) ++ repArg,
      "CHILD_RESULT ", cores)
    val Array(_, sec, sum, taskSec, cpuSec, mask, nReps, ov) = line.split(" ")
    LevelRun(sec.toDouble, sum.toLong, taskSec.toDouble, cpuSec.toDouble, mask,
      nReps.toInt, ov.toLong)
  }

  /** The calling process's cpu-affinity list, e.g. "0-1" for a 2-core pin. */
  private def ownPinMask: String = try {
    java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/status"))
      .linesIterator.find(_.startsWith("Cpus_allowed_list"))
      .map(_.split(":").last.trim).getOrElse("?")
  } catch { case _: Throwable => "?" }

  /** (computeSec, membwSharedSec, membwPrivSec, memLatSec) from a fresh
    * calib child at `cores` — pinned to the same CPU budget as the dedup
    * children (same protocol). */
  private def timedCalib(cores: Int): (Double, Double, Double, Double) = {
    // calibration kernels hold at most ~1.5 GB live (256 MB broadcast +
    // <=8 concurrent 128 MB private arrays churning through eden) — the
    // dedup children's 28g AlwaysPreTouch costs ~25s of pure first-touch
    // page provisioning per child that these small fixed-work kernels
    // don't need (VERDICT r4 #1: the calib tail must fit the driver budget)
    val line = spawnChild(Seq("calib", cores.toString), "CHILD_CALIB ", cores,
      prop("graft.calibHeap", "8g"), prop("graft.calibNewGen", "6g"))
    val Array(_, comp, mem, memPriv, memLat) = line.split(" ")
    (comp.toDouble, mem.toDouble, memPriv.toDouble, memLat.toDouble)
  }

  /** Calibration child: fixed total work split into many small tasks, zero
    * shuffle, warmup + min-of-2 per kernel — the same measurement protocol
    * as the dedup children so the numbers are directly comparable.
    *  - compute kernel: per-task Murmur3 avalanche chain, pure registers —
    *    the VM's scheduling/steal ceiling;
    *  - membw (shared) kernel: per-task streaming sums over one broadcast
    *    256 MB read-only array — all threads stream the SAME lines, so DRAM
    *    fetches amortize across threads and this kernel measures close to
    *    ideal scaling (≈1.0 at 2->8 on this host); it bounds workloads with
    *    heavy shared-read reuse, NOT private traffic;
    *  - membw (private) kernel (ADVICE r3): each task allocates and streams
    *    its OWN LLC-exceeding array — per-thread DRAM bandwidth, the ceiling
    *    that actually binds a shuffle-heavy pipeline whose buffers are
    *    thread-private (this is the kernel behind the documented
    *    13.2/44.9/113 GB/s at 2/8/32 threads, i.e. ~3.4x for the 4x core
    *    step 2->8 — the sub-1.0 part of the 2->8 ceiling). */
  private def calibChildMain(cores: Int): Unit = {
    val spark = session(cores)
    import spark.implicits._
    // kernel sizes halved for round 5 (driver budget): the ratios are what
    // the artifact publishes and they are size-invariant well above the
    // per-task fixed overhead (~12 ms/task, 256 tasks ≈ 3 s of floor vs
    // 6-12 s kernels at 1 core)
    val tasks = prop("graft.calibTasks", "256").toInt
    val compIters = prop("graft.calibIters", "10000000").toLong
    val memPasses = prop("graft.calibPasses", "1").toInt
    def computeOnce(): Double = {
      val t0 = System.nanoTime()
      val x = spark.range(0, tasks.toLong, 1, tasks).as[Long].map { i =>
        var h = i; var j = 0L
        while (j < compIters) { h = graft.core.Murmur3.hashLong(h, j); j += 1 }
        h
      }.reduce(_ ^ _)
      if (x == 42L) System.err.println("") // keep the result live
      (System.nanoTime() - t0) / 1e9
    }
    // 256 MB: must EXCEED the socket's last-level cache — the first cut used
    // 64 MB, which the LLC largely absorbed, and the "membw" kernel measured
    // near-perfect (even superlinear) 2→8 scaling instead of the DRAM
    // bandwidth ceiling it exists to quantify (BENCH 2026-08-17: eff 1.026)
    val arr = Array.tabulate(1 << 25)(i => i.toLong * 0x9e3779b97f4a7c15L) // 256 MB
    val bc = spark.sparkContext.broadcast(arr)
    def membwOnce(): Double = {
      val t0 = System.nanoTime()
      val x = spark.range(0, tasks.toLong, 1, tasks).as[Long].map { i =>
        val a = bc.value
        var s = i; var p = 0
        while (p < memPasses) {
          var j = 0
          while (j < a.length) { s += a(j); j += 1 }
          p += 1
        }
        s
      }.reduce(_ ^ _)
      if (x == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e9
    }
    // private-stream kernel: fewer, fatter tasks (each owns a 128 MB array —
    // big enough that even 2 concurrent tasks exceed the LLC) and the fill
    // pass is amortized over several timed read passes
    val privTasks = prop("graft.calibPrivTasks", "64").toInt
    val privLen = 1 << 24 // 128 MB of longs per task
    val privPasses = prop("graft.calibPrivPasses", "2").toInt
    def membwPrivOnce(): Double = {
      val t0 = System.nanoTime()
      val x = spark.range(0, privTasks.toLong, 1, privTasks).as[Long].map { i =>
        val a = new Array[Long](privLen)
        var j = 0
        while (j < a.length) { a(j) = i + j; j += 1 }
        var s = 0L; var p = 0
        while (p < privPasses) {
          var m = 0
          while (m < a.length) { s += a(m); m += 1 }
          p += 1
        }
        s
      }.reduce(_ ^ _)
      if (x == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e9
    }
    // latency kernel (round 4): DEPENDENT pseudo-random loads over a
    // private LLC-exceeding array per task — each load's address is derived
    // from the previous load's VALUE, so the misses serialize (zero
    // memory-level parallelism). This is the substrate ceiling for
    // latency-bound random access — hash-agg probes, hash-join lookups, the
    // dedup pair aggregation — which is the pipeline's dominant
    // NON-streaming traffic: N tasks' private working sets overflow the
    // shared socket LLC long before streaming bandwidth saturates, so this
    // kernel degrades with cores where the streaming kernels do not. A
    // multi-host cluster gives each executor its own LLC/DRAM; one socket
    // cannot — publishing the kernel quantifies that next to the pipeline.
    val latTasks = prop("graft.calibLatTasks", "64").toInt
    val latLen = 1 << 24 // 128 MB of longs per task, same shape as membwPriv
    val latSteps = prop("graft.calibLatSteps", "1000000").toInt
    def memLatOnce(): Double = {
      val t0 = System.nanoTime()
      val x = spark.range(0, latTasks.toLong, 1, latTasks).as[Long].map { i =>
        val a = new Array[Long](latLen)
        var j = 0
        while (j < a.length) { a(j) = i + j * 0x9e3779b97f4a7c15L; j += 1 }
        var v = i
        var s = 0L
        var k = 0
        while (k < latSteps) {
          val idx = (graft.core.Murmur3.hashLong(v, k) & (latLen - 1)).toInt
          v = a(idx) // next address depends on THIS load's value
          s += v
          k += 1
        }
        s
      }.reduce(_ ^ _)
      if (x == 42L) System.err.println("")
      (System.nanoTime() - t0) / 1e9
    }
    computeOnce(); membwOnce(); membwPrivOnce(); memLatOnce() // warmup (JIT, broadcast materialization)
    val comp = math.min(computeOnce(), computeOnce())
    val mem = math.min(membwOnce(), membwOnce())
    val memPriv = math.min(membwPrivOnce(), membwPrivOnce())
    val memLat = math.min(memLatOnce(), memLatOnce())
    println(f"CHILD_CALIB $comp%.3f $mem%.3f $memPriv%.3f $memLat%.3f")
    spark.stop()
  }

  /** Child-mode entry: one warmup iteration (JIT + page cache; discarded),
    * then two measured runs — the MIN is reported: this host shows heavy
    * hypervisor CPU steal (historically more steal than user ticks), and
    * min-of-k under external interference estimates machine capability.
    * Prints CHILD_RESULT <sec> <checksum>. */
  private def childMain(cores: Int, corpusPath: String, repsOverride: Int = 0): Unit = {
    val spark = session(cores)
    // diagnostics: jobs/stages per iteration and summed task run time expose
    // the serial (driver/scheduler) fraction — wall*cores vs task time
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = prop("graft.jobLog", "false").toBoolean
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStart.put(e.jobId, (e.time, e.stageInfos.lastOption.map(_.name.take(60)).getOrElse("?")))
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        if (jobLog) Option(jobStart.get(e.jobId)).foreach { case (t0, name) =>
          System.err.println(f"JOB ${e.jobId}%3d ${(e.time - t0) / 1e3}%6.2fs  $name")
        }
      }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        cpuNs.addAndGet(e.stageInfo.taskMetrics.executorCpuTime)
        if (jobLog) {
          val m = e.stageInfo.taskMetrics
          System.err.println(f"STAGE ${e.stageInfo.stageId}%4d tasks=${e.stageInfo.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%8.1fM out=${m.outputMetrics.bytesWritten / 1e6}%6.1fM " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fM sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fM " +
            f"spill=${m.diskBytesSpilled / 1e6}%6.1fM  ${e.stageInfo.name.take(70)}")
        }
      }
    })
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      // standalone child invocation: generate the corpus (path ends in _<n>)
      val n = corpusPath.split("_").last.toInt
      CorpusGen.clips(spark, n, numPartitions = CorpusParts)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val clips = spark.read.parquet(corpusPath)
    // warmup slice: ~1/4 of the corpus. The warmup exists to C2-compile the
    // hot loops and fault the corpus into the page cache; 40k clips give the
    // JIT thousands of invocations of every pipeline path at a quarter of
    // the full-corpus cost (VERDICT r4 #1: the 175 s full-corpus warmup was
    // ~40% of the 1-core child's wall and bought nothing the slice doesn't).
    // Deterministic hash-mod slice; the warmup result is discarded.
    val warmClips = clips.where(pmod(xxhash64(col("clip_id")), lit(4L)) === lit(0L))
    def once(input: org.apache.spark.sql.DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      // experiment knobs (default = the frozen config; overriding changes
      // the candidate set and thus the checksum — A/B only, not the gate)
      val cfg = DedupConfig.default.copy(
        maxBucketSize = prop("graft.cap", DedupConfig.default.maxBucketSize.toString).toInt,
        fatShuffleFactor = prop("graft.fatFactor",
          DedupConfig.default.fatShuffleFactor.toString).toInt)
      val checksum = assignmentChecksum(DedupPipeline.run(input, cfg))
      val dt = (System.nanoTime() - t0) / 1e9
      // the pipeline self-cleans its internal caches (DedupPipeline.run);
      // what remains pinned is the RETURNED table's eager checkpoint —
      // caller-owned lifecycle, freed here so iterations don't accumulate
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      (dt, checksum)
    }
    // reps per child x 2 interleaved child rounds per level (Bench.main):
    // this host shows multi-minute interference windows that can swallow a
    // whole child run — iterations spread across two separated rounds catch
    // a clean window more reliably than the same count consecutively.
    // EVERY level runs the SAME rep count (VERDICT r3 #1: the r3 asymmetry —
    // 3 reps at <8 cores vs 5 at >=8 — gave the short side more min-of-k
    // draws and is one suspect for the 2->8 diagnostic whipsaw; equal reps
    // make the per-level estimators identically distributed).
    val reps = if (repsOverride > 0) repsOverride
      else prop("graft.benchReps", "4").toInt
    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def iter(tag: String, input: org.apache.spark.sql.DataFrame = clips)
        : (Double, Long, Double, Double) = {
      jobs.set(0); stages.set(0); taskMs.set(0); cpuNs.set(0)
      val g0 = gcMs
      val r = once(input)
      val tSec = taskMs.get / 1e3
      // cpuSec: summed per-task THREAD CPU time (ThreadMXBean via Spark's
      // executorCpuTime) — excludes scheduler wait, IO wait and hypervisor
      // steal, so taskSec/cpuSec separates "the work got slower" from "the
      // work waited" per level, in the artifact itself
      val cSec = cpuNs.get / 1e9
      System.err.println(f"CHILD_ITER $tag ${r._1}%.2f jobs=${jobs.get} " +
        f"stages=${stages.get} taskSec=$tSec%.1f cpuSec=$cSec%.1f " +
        f"gcSec=${(gcMs - g0) / 1e3}%.1f " +
        f"parUse=${tSec / (r._1 * cores)}%.2f")
      (r._1, r._2, tSec, cSec)
    }
    // -Dgraft.sample=true: in-process stack sampler over the executor task
    // threads (external jstack/jcmd attach can't keep up with a pinned,
    // saturated JVM) — prints a hot-frame histogram per iteration so CPU
    // attribution inside the fat stages is measured, not guessed.
    val sample = prop("graft.sample", "false").toBoolean
    val sampler = if (!sample) null else {
      val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.LongAdder]()
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val t = new Thread(() => {
        while (!stop.get()) {
          val traces = Thread.getAllStackTraces()
          traces.forEach { (th, st) =>
            if (th.getName.startsWith("Executor task launch") && st.nonEmpty &&
                th.getState == Thread.State.RUNNABLE) {
              // attribute to the first frame that names actual work (skip
              // pure runtime noise frames like Unsafe/ArrayData accessors)
              val f = st.iterator.map(_.toString).find { s =>
                s.contains("graft") || s.contains("spark.sql.catalyst") ||
                  s.contains("codegen") || s.contains("lz4") || s.contains("Lz4") ||
                  s.contains("shuffle") || s.contains("io.") || s.contains("parquet")
              }.getOrElse(st(0).toString)
              hist.computeIfAbsent(f, _ => new java.util.concurrent.atomic.LongAdder).increment()
            }
          }
          Thread.sleep(37)
        }
      }, "graft-sampler")
      t.setDaemon(true); t.start()
      (hist, stop, t)
    }
    iter("warmup", warmClips)
    val runs = (1 to reps).map { i => System.gc(); iter(i.toString) }
    if (sampler != null) {
      sampler._2.set(true)
      import scala.jdk.CollectionConverters._
      val rows = sampler._1.asScala.toSeq.map { case (k, v) => (k, v.sum) }.sortBy(-_._2)
      val total = math.max(1L, rows.map(_._2).sum)
      System.err.println(s"SAMPLER total=$total")
      rows.take(40).foreach { case (k, v) =>
        System.err.println(f"SAMPLE ${v * 100.0 / total}%5.1f%% $v%6d  $k")
      }
    }
    require(runs.map(_._2).distinct.size == 1,
      s"non-deterministic repeat: ${runs.map(_._2).mkString(",")}")
    // report the MIN-wall iteration together with ITS summed task time (a
    // wall/taskSec pair from the same iteration lets a reader detect a dirty
    // window: inflated taskSec at comparable wall = external steal during
    // the measured run) and the child's actual affinity mask + rep count
    val best = runs.minBy(_._1)
    // overflow runs (no-silent-caps, ADVICE r4): windowed-drain degrades
    // across ALL iterations in this child — 0 means candidate recall was
    // complete in every measured run
    val ov = graft.dedup.CandidatePairs.overflowRuns(spark)
    println(s"CHILD_RESULT ${best._1} ${best._2} ${best._3} ${best._4} $ownPinMask $reps $ov")
    spark.stop()
  }

  /** Stage the sf tables into a bench-owned layout: the driver's parquets
    * are single files with ~3 row groups, which caps EVERY scan stage at 3
    * tasks regardless of cores (measured, VERDICT r2 #4 — q01's aggregate
    * ran 3 tasks at local[32]). A production engine owns its table layout;
    * the bench stages a row-group-split copy ONCE (untimed, reused across
    * rounds) so scans parallelize. `events` is copied verbatim — the
    * streaming queries stage it as a single source file. */
  private def stageSfTables(spark: SparkSession, sfDir: String, parts: Int): String = {
    // cache key folds each source file's (name, length, mtime) so regenerated
    // sf fixtures invalidate the staged copy instead of silently serving
    // stale parquet to oracle-gated queries (ADVICE r3)
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

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "child") {
      childMain(args(1).toInt, args(2), if (args.length >= 4) args(3).toInt else 0)
      return
    }
    if (args.length >= 2 && args(0) == "calib") {
      calibChildMain(args(1).toInt)
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val dedupN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "160000").toInt

    // ---- incremental artifact emission (VERDICT r4 #1) --------------------
    // BENCH_r04.json was rc:124/parsed:null because main printed JSON only
    // at the very end — one driver timeout erased a whole round's numbers.
    // Now every completed section re-emits the FULL cumulative JSON line
    // (stdout, flushed) and rewrites BENCH_LAST.json, so a timeout at ANY
    // point leaves a parseable artifact carrying every section that
    // finished, with `partial:true` marking a truncated run and
    // `elapsed_sec` proving headroom on complete ones.
    val tMain0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - tMain0) / 1e9
    var queriesTotal = 0.0
    var ladderTotal = 0.0
    val sections = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def emit(partial: Boolean): Unit = {
      val json = f"""{"metric":"total","value":${queriesTotal + ladderTotal},""" +
        f""""unit":"sec","elapsed_sec":$elapsedSec%.1f,"partial":$partial,""" +
        sections.values.mkString(",") + "}"
      try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LAST.json"), json + "\n")
      catch { case _: Throwable => () }
      println(json)
      System.out.flush()
    }
    // driver-budget sizing (VERDICT r4 #1): the r4 defaults (8 reps x 5
    // ladder levels, 2 calib rounds, a ~240s uncached ANN exact scan) blew
    // the driver's timeout and left rc:124/parsed:null. The r5 defaults are
    // sized to ~25-30 min wall on this host: ladder reps 2/3/3/3/2 at
    // 1/2/4/8/32 cores in ONE pass (dirty windows are detected from the
    // per-level wall-vs-taskSec pair instead of re-draws), ONE calib round,
    // and the ANN exact-scan ground truth CACHED on disk across runs (it is
    // deterministic; recompute was pure waste).

    // ---- headline operator queries at local[cores] ------------------------
    // every driver-checked query is benched; a throwaway warm-up query runs
    // first so the session-init cost (codegen warmup, parquet footer cache,
    // first-shuffle setup) is not billed to whichever query happens to run
    // first (round 1 billed ~7s of warmup to q01). Each query then runs
    // `graft.queryReps` times and reports the MIN — this host's multi-minute
    // interference windows make single-shot numbers untrustworthy
    // (VERDICT r2 #3); pre-staged inputs (corpus parquet, row-group-split sf
    // tables) keep generation out of the timed window.
    // iteration knobs: -Dgraft.queryFilter=q02,d06 benches a subset;
    // -Dgraft.queriesOnly=true skips the dedup ladder + calibration (the
    // ~30-min tail) — both for in-round query-perf work, never set by the
    // driver harness
    val filter = prop("graft.queryFilter", "").split(",").map(_.trim).filter(_.nonEmpty).toSet
    val benched = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.isEmpty || filter.exists(n.startsWith))
    val queriesOnly = prop("graft.queriesOnly", "false").toBoolean
    val spark0 = session(cores)
    // per-query summed task run time (VERDICT r4 #4: the committed r4 query
    // block was dirty-window data and nothing in the artifact said so — a
    // wall/taskSec pair per query makes external steal visible in place)
    val qTaskMs = new java.util.concurrent.atomic.AtomicLong
    val qCpuNs = new java.util.concurrent.atomic.AtomicLong
    spark0.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        qTaskMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        qCpuNs.addAndGet(e.stageInfo.taskMetrics.executorCpuTime)
      }
    })
    def taskSnapshot(): (Long, Long) = {
      try org.apache.spark.sql.graftshim.PlanShim.waitListenerBus(spark0.sparkContext)
      catch { case _: Throwable => () }
      (qTaskMs.get, qCpuNs.get)
    }
    // the staged sf tables are `cores` small files per table; the default
    // 128m bin + 4m open-cost packs them into 1-2 scan tasks, capping every
    // query's source stage regardless of cores (VERDICT r2 #4 / r3 #8 —
    // q01's aggregate ran 3 tasks at local[32]). 4m bins make each staged
    // file its own split, so scans parallelize to the full session width.
    // Runtime conf: applies to the query session only, never the ladder
    // children (their corpus layout is already 32-way).
    spark0.conf.set("spark.sql.files.maxPartitionBytes",
      prop("graft.queryMaxPartitionBytes", "4m"))
    val stagedDir = stageSfTables(spark0, sfDir, cores)
    try spark0.read.parquet(s"$stagedDir/lineitem.parquet")
      .groupBy(col("l_returnflag")).count()
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }
    // pre-generate the pipeline-query corpora (p01/p02 = 1000, p03/entry =
    // 500) so the first timed rep doesn't pay the synthesis
    try { CorpusGen.clipsCached(spark0, 1000).count(); CorpusGen.clipsCached(spark0, 500).count() }
    catch { case _: Throwable => () }
    val queryReps = prop("graft.queryReps", "2").toInt
    // per query: (minWall, taskSec and cpuSec of the min-wall rep, dirty).
    // dirty = some rep took >2x the min wall (>1s spread) WITHOUT doing
    // more CPU work than the min rep — same work, much slower = an external
    // interference window swallowed it. A slow FIRST rep that did genuinely
    // more work (cache/oracle materialization: its cpuSec is higher) is the
    // normal warm-up shape, not a dirty window (VERDICT r4 #4 follow-up:
    // the first cut flagged warm-up reps and cried wolf on 8 queries).
    // The number reported is still the min; the flag travels with it so a
    // reader (and the round verdict) can discount it without oral history.
    val results: Seq[(String, Double, Double, Double, Boolean)] = benched.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        // settle point between queries: trigger the ContextCleaner NOW so
        // the previous query's shuffle-file/broadcast deletion (weak-ref
        // driven, async) lands here instead of inside the next timed rep
        System.gc(); Thread.sleep(150)
        val reps = (1 to queryReps).map { _ =>
          val (m0, c0) = taskSnapshot()
          val t0 = System.nanoTime()
          try { fn(spark0, stagedDir).write.mode("overwrite").format("noop").save() }
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
          val wall = (System.nanoTime() - t0) / 1e9
          val (m1, c1) = taskSnapshot()
          (wall, (m1 - m0) / 1e3, (c1 - c0) / 1e9)
        }
        val best = reps.minBy(_._1)
        val worst = reps.maxBy(_._1)
        val dirty = reps.size > 1 &&
          worst._1 > 2 * best._1 && worst._1 - best._1 > 1.0 &&
          worst._3 < 1.5 * best._3
        (name, best._1, best._2, best._3, dirty)
      }
    }
    // stop streaming state-store maintenance BEFORE session teardown: s01/
    // s02 leave a maintenance thread that otherwise races the temp-dir reap
    // and sprays a stack trace into the artifact tail (VERDICT r2 #6)
    try org.apache.spark.sql.graftshim.PlanShim.stopStateStoreMaintenance()
    catch { case _: Throwable => () }
    queriesTotal = results.map(_._2).sum
    val qs = results.map { case (k, v, _, _, _) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val qt = results.map { case (k, _, t, _, _) => f""""$k":$t%.3f""" }.mkString("{", ",", "}")
    val qc = results.map { case (k, _, _, c, _) => f""""$k":$c%.3f""" }.mkString("{", ",", "}")
    val qd = results.collect { case (k, _, _, _, true) => s""""$k"""" }.mkString("[", ",", "]")
    sections("queries") =
      s""""queries":$qs,"queries_task_sec":$qt,"queries_cpu_sec":$qc,""" +
        s""""queries_dirty":$qd,"sf":"$sfDir""""
    emit(partial = true)

    // ---- ANN at scale (VERDICT r3 #5) ----------------------------------
    // The sf embeddings table is 2k vectors; the similarity-search story
    // needs recall + wall evidence at >= 1M. A deterministic planted-cluster
    // corpus (EmbedGen) is staged once (untimed); exact top-3 ground truth
    // is computed for a 1k-query sample (also the brute-force scan number),
    // then the LSH lane runs over ALL vectors and the IVF lane over the
    // sample queries, each recall-checked against the exact sample.
    val annOnly = prop("graft.annOnly", "false").toBoolean
    val annJson = if (!prop("graft.annBench", "true").toBoolean ||
        (queriesOnly && !annOnly)) "" else {
      val annN = prop("graft.annN", "1000000").toLong
      val vecs = graft.corpus.EmbedGen.vectorsCached(spark0, annN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      vecs.count() // materialize the cache outside every timed window
      val sampleStep = math.max(1L, annN / 1000L)
      val queries = vecs.where(pmod(col("vec_id"), lit(sampleStep)) === 0)
      def timed[T](f: => T): (T, Double) = {
        val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
      }
      // exact-scan ground truth CACHED across runs (VERDICT r4 #1/#8): the
      // corpus is a deterministic pure function of (version, n, k, step), so
      // the ~4-min brute-force scan is computed once and reused; the scan
      // wall measured at compute time rides along in a sidecar so the
      // artifact's exact_scan_sec stays a real measurement (flagged
      // exact_cached when it wasn't re-measured in THIS run).
      val gtDir = s"/tmp/graft_ann_gt_v${graft.corpus.CorpusGen.FormatVersion}" +
        s"_${annN}_${sampleStep}_k3"
      val gtSec = java.nio.file.Paths.get(s"$gtDir/_SCAN_SEC")
      val gtCached = new java.io.File(s"$gtDir/_SUCCESS").exists() &&
        java.nio.file.Files.exists(gtSec)
      val (exact0, exactSec) = if (gtCached) {
        (spark0.read.parquet(gtDir),
          java.nio.file.Files.readString(gtSec).trim.toDouble)
      } else timed {
        val e = graft.ann.Ann.bruteForceTopK(queries, vecs, 3)
          .select(col("vec_id"), col("neighbor_id"))
        e.write.mode("overwrite").parquet(gtDir)
        spark0.read.parquet(gtDir)
      }
      if (!gtCached)
        try java.nio.file.Files.writeString(gtSec, f"$exactSec%.2f")
        catch { case _: Throwable => () }
      val exact = exact0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nExact = exact.count()
      val (lsh, lshSec) = timed {
        val l = graft.ann.Ann.lshTopK(vecs, 3, planesPerTable = 16, tables = 8)
          .select(col("vec_id"), col("neighbor_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        l.count(); l
      }
      val lshRows = lsh.count()
      val lshHits = exact.join(lsh, Seq("vec_id", "neighbor_id"), "left_semi").count()
      val (ivf, ivfSec) = timed {
        val i = graft.ann.Ann.ivfTopK(queries, vecs, 3, nlist = 1024, nprobe = 32)
          .select(col("vec_id"), col("neighbor_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        i.count(); i
      }
      val ivfHits = exact.join(ivf, Seq("vec_id", "neighbor_id"), "left_semi").count()
      Seq(exact, lsh, ivf, vecs).foreach(_.unpersist(blocking = false))
      f""""ann":{"n":$annN,"dim":${graft.corpus.EmbedGen.Dim},""" +
        f""""sample_queries":${nExact / 3},""" +
        f""""exact_scan_sec":$exactSec%.2f,"exact_cached":$gtCached,""" +
        f""""lsh_sec":$lshSec%.2f,"lsh_rows":$lshRows,""" +
        f""""lsh_recall":${lshHits.toDouble / nExact}%.4f,""" +
        f""""ivf_sec":$ivfSec%.2f,""" +
        f""""ivf_recall":${ivfHits.toDouble / nExact}%.4f}"""
    }
    if (annJson.nonEmpty) {
      sections("ann") = annJson
      emit(partial = true)
    }
    if (annOnly || queriesOnly) {
      emit(partial = false)
      spark0.stop()
      return
    }
    // ---- dedup corpus (untimed) -------------------------------------------
    val corpusPath = s"/tmp/graft_bench_corpus_v${CorpusGen.FormatVersion}_$dedupN"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      CorpusGen.clips(spark0, dedupN, numPartitions = CorpusParts)
        .write.mode("overwrite").parquet(corpusPath)
    }
    spark0.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- dedup at a ladder of parallelism levels --------------------------
    // Levels run in INTERLEAVED rounds (min per level across rounds): this
    // host's hypervisor interference comes in multi-minute windows that can
    // swallow one whole child run — with sequential levels a dirty window
    // biases a single level and corrupts a ratio, interleaved rounds give
    // every level a shot at every window.
    val rounds = prop("graft.childRounds", "1").toInt
    // Two graded N->4N pairs plus the peak point:
    //  - 1->4 cores: the pair where this host genuinely delivers ~4x the
    //    resources (calibration compute AND membw scale ~3.9x there) — the
    //    north-rule scaling evidence at substrate-deliverable resources;
    //  - 2->8 cores: the historical diagnostic pair (memory bandwidth only
    //    scales 3.4x 2->8 on this host, so its ceiling is < 1.0 by
    //    construction — the calibration fields quantify that next to it);
    //  - 32 cores: peak throughput (bandwidth scales just 2.1x 8->32).
    // Driver-budget shape (VERDICT r4 #1): ONE pass over the levels with
    // reps 2/3/3/3/2 — the 1-core child's iterations are ~5x longer (one
    // child already spans several interference windows) and 32 cores is a
    // peak point, not a gate input. Window cleanliness is machine-checked
    // from the per-level (wall, taskSec, taskCpuSec) triple instead of
    // re-draw rounds; graft.childRounds>1 restores interleaved rounds for
    // manual gate work.
    val levels = Seq(1, 2, 4, 8, 32)
    val levelRounds = Map(1 -> 1, 2 -> rounds, 4 -> rounds, 8 -> rounds, 32 -> rounds)
    val levelReps = Map(1 -> 2, 2 -> 3, 4 -> 3, 8 -> 3, 32 -> 2)
    val runSeqB = Seq.newBuilder[(Int, LevelRun)]
    for (r <- 1 to rounds; c <- levels if r <= levelRounds(c)) {
      val lr = timedDedup(c, corpusPath, levelReps.getOrElse(c, 0))
      runSeqB += (c -> lr)
      // partial ladder progress: a timeout mid-ladder still leaves every
      // completed level's raw numbers in the artifact
      val sofar = runSeqB.result()
      sections("dedup") = s""""dedup":{"n":$dedupN,"complete":false,""" +
        s""""ladder_runs":[${sofar.map { case (cc, x) =>
          f"""{"cores":$cc,"sec":${x.sec}%.2f,"taskSec":${x.taskSec}%.1f,""" +
            f""""taskCpuSec":${x.cpuSec}%.1f,"pin":"${x.pinMask}"}"""
        }.mkString(",")}]}"""
      emit(partial = true)
    }
    val runSeq: Seq[(Int, LevelRun)] = runSeqB.result()
    val byLevel: Map[Int, Seq[LevelRun]] =
      runSeq.groupBy(_._1).map { case (c, rs) => c -> rs.map(_._2) }
    def best(c: Int): LevelRun = {
      val rs = byLevel(c)
      require(rs.map(_.sum).distinct.size == 1,
        s"non-deterministic across rounds at $c cores: ${rs.map(_.sum)}")
      rs.minBy(_.sec)
    }
    val lv = levels.map(c => c -> best(c)).toMap
    def expectMask(c: Int): String = if (c == 1) "0" else s"0-${c - 1}"
    // machine-checkable pin evidence: every level's child reported its OWN
    // affinity mask; `pinned` is true only if all match the intended budget
    val pinned = levels.forall(c => lv(c).pinMask == expectMask(c))
    val eff1to4 = lv(1).sec / (4.0 * lv(4).sec)
    val eff2to8 = lv(2).sec / (4.0 * lv(8).sec)
    val eff8to32 = lv(8).sec / (4.0 * lv(32).sec)
    val allSums = levels.map(lv(_).sum)
    ladderTotal = levels.map(lv(_).sec).sum

    val perLevel = levels.map { c =>
      val r = lv(c)
      f""""local${c}_sec":${r.sec}%.2f,"local${c}_clips_per_sec":${dedupN / r.sec}%.1f,""" +
        f""""taskSec_$c":${r.taskSec}%.1f,"taskCpuSec_$c":${r.cpuSec}%.1f,""" +
        f""""pin_$c":"${r.pinMask}","reps_$c":${r.reps * levelRounds(c)},""" +
        f""""overflow_runs_$c":${r.overflowRuns}"""
    }.mkString(",")
    val deterministicJson = s""""deterministic":${allSums.distinct.size == 1}"""
    val ladderCore =
      f""""n":$dedupN,$perLevel,""" +
        f""""pinned":$pinned,""" +
        f""""scaling_efficiency_1to4":$eff1to4%.3f,""" +
        f""""scaling_efficiency_2to8":$eff2to8%.3f,""" +
        f""""scaling_efficiency_8to32":$eff8to32%.3f,"""
    sections("dedup") = s""""dedup":{$ladderCore$deterministicJson}"""
    emit(partial = true)

    // ---- host-ceiling calibration (same fresh-child min-of-k protocol) ----
    // Four fixed-total-work jobs with zero shuffle quantify what THIS host
    // can deliver across the ladder next to the pipeline's number: pure
    // register compute (the VM's scheduling/steal ceiling), shared-stream
    // and private-stream memory bandwidth, and dependent-random-load
    // latency (memlat — the honest ceiling for the pipeline's hash-probe
    // traffic; eff_1to4_normalized below is the pipeline eff divided by it).
    val calibLevels = Seq(1, 2, 4, 8)
    val calibRuns: Seq[Map[Int, (Double, Double, Double, Double)]] = (1 to rounds).map { r =>
      calibLevels.filter(c => r == 1 || c >= 2)
        .map(c => c -> timedCalib(c)).toMap
    }
    def calibBest(c: Int): (Double, Double, Double, Double) = {
      val rs = calibRuns.flatMap(_.get(c))
      (rs.map(_._1).min, rs.map(_._2).min, rs.map(_._3).min, rs.map(_._4).min)
    }
    val (comp1, mem1, memP1, memL1) = calibBest(1)
    val (comp2, mem2, memP2, memL2) = calibBest(2)
    val (comp4, mem4, memP4, memL4) = calibBest(4)
    val (comp8, mem8, memP8, memL8) = calibBest(8)
    val calibEff1to4 = comp1 / (4.0 * comp4)
    val calibEff1to4Membw = mem1 / (4.0 * mem4)
    val calibEff1to4MembwPriv = memP1 / (4.0 * memP4)
    val calibEff1to4MemLat = memL1 / (4.0 * memL4)
    val calibEffCompute = comp2 / (4.0 * comp8)
    val calibEffMembw = mem2 / (4.0 * mem8)
    val calibEffMembwPriv = memP2 / (4.0 * memP8)
    val calibEffMemLat = memL2 / (4.0 * memL8)

    // self-diagnosis: fixed-total-work kernels on private data cannot scale
    // super-linearly — a compute/private-stream/memlat eff above ~1.0 (or a
    // collapse below 0.3) means an interference window swallowed one side of
    // the ratio. The SHARED-stream membw kernel is exempt (LLC aggregation
    // makes it legitimately super-linear). The flag does not alter the
    // published numbers; it marks them machine-readably as suspect so the
    // normalized fields are never trusted off a dirty calibration
    // (BENCH 2026-08-18: a dirty 2-core calib child published memlat 2->8
    // "eff" 1.461 and poisoned eff_2to8_normalized).
    val calibSuspect = Seq(calibEff1to4, calibEff1to4MembwPriv, calibEff1to4MemLat,
      calibEffCompute, calibEffMembwPriv, calibEffMemLat)
      .exists(e => e > 1.05 || e < 0.3)
    val dedupJson =
      ladderCore +
        f""""calib_suspect":$calibSuspect,""" +
        f""""calibration_eff_1to4":$calibEff1to4%.3f,""" +
        f""""calibration_eff_1to4_membw":$calibEff1to4Membw%.3f,""" +
        f""""calibration_eff_1to4_membw_priv":$calibEff1to4MembwPriv%.3f,""" +
        f""""calibration_eff_1to4_memlat":$calibEff1to4MemLat%.3f,""" +
        f""""eff_1to4_normalized":${eff1to4 / calibEff1to4MemLat}%.3f,""" +
        f""""calibration_eff_2to8":$calibEffCompute%.3f,""" +
        f""""calibration_eff_2to8_membw":$calibEffMembw%.3f,""" +
        f""""calibration_eff_2to8_membw_priv":$calibEffMembwPriv%.3f,""" +
        f""""calibration_eff_2to8_memlat":$calibEffMemLat%.3f,""" +
        f""""eff_2to8_normalized":${eff2to8 / calibEffMemLat}%.3f,""" +
        f""""calib_compute_sec_1":$comp1%.2f,"calib_compute_sec_2":$comp2%.2f,""" +
        f""""calib_compute_sec_4":$comp4%.2f,"calib_compute_sec_8":$comp8%.2f,""" +
        f""""calib_membw_sec_1":$mem1%.2f,"calib_membw_sec_2":$mem2%.2f,""" +
        f""""calib_membw_sec_4":$mem4%.2f,"calib_membw_sec_8":$mem8%.2f,""" +
        f""""calib_membw_priv_sec_1":$memP1%.2f,"calib_membw_priv_sec_2":$memP2%.2f,""" +
        f""""calib_membw_priv_sec_4":$memP4%.2f,"calib_membw_priv_sec_8":$memP8%.2f,""" +
        f""""calib_memlat_sec_1":$memL1%.2f,"calib_memlat_sec_2":$memL2%.2f,""" +
        f""""calib_memlat_sec_4":$memL4%.2f,"calib_memlat_sec_8":$memL8%.2f,""" +
        deterministicJson
    sections("dedup") = s""""dedup":{$dedupJson}"""
    // the final emit goes to stdout (clean — build.sbt routes forked run
    // output through StdoutOutput) AND rewrites BENCH_LAST.json
    emit(partial = false)
  }
}
