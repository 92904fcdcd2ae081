package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.index.{BuildConfig, IndexBuilder}
import graft.search.IndexSearcher

/** One parallelism level of the scaling benchmark, run in its OWN JVM
  * (spawned by [[graft.Bench]]) — the sandbox equivalent of one
  * spark-submit at a given executor count. A fresh JVM per level keeps the
  * comparison honest: levels don't inherit each other's JIT state, heap
  * bloat, or GC history. Self-warms (subset build + small batch) so the
  * timed runs measure the engine, not classloading/C2 compilation.
  *
  * args: cpus corpusPath nQueries k
  * stdout: one line `LEVELRESULT cpus=.. docs=.. build_secs=.. batch_secs=.. sha=..`
  */
object BenchLevel {

  private def timed[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Host-health probe: wall time of `nThreads` raw JVM threads doing FIXED
    * register-only work per thread. With 8 threads it is the co-tenancy
    * health check (healthy ~0.6 s; noisy windows read 3-5x higher). Run at
    * the LEVEL's width it measures the host's ideal-work scaling envelope:
    * on independent cores the wall is thread-count-invariant, so
    * wall(8)/wall(32) is the ceiling ANY perfectly-parallel computation can
    * reach from 8 -> 32 busy vCPUs — near 1.0 when the vCPUs are real
    * independent cores (measured 0.977 in a clean window here), well below
    * 1.0 when the host withholds cpu (steal/oversubscription). Separates
    * cpu-side throttling from memory-side contention.
    */
  private def calibrate(nThreads: Int = 8, itersPerThread: Int = 400000000): Double = {
    val t0 = System.nanoTime()
    val threads = (1 to nThreads).map { _ =>
      new Thread(() => {
        var x = 0L
        var i = 0
        while (i < itersPerThread) { x = x * 6364136223846793005L + 1442695040888963407L; i += 1 }
        if (x == 42) System.err.print("")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  /** Aggregate memory-stream bandwidth (GB/s) at `nThreads` — each thread
    * strides cache lines over its own 64 MB array. The RATIO of this
    * across the two bench levels is the single-socket ceiling for any
    * memory-bound stage: one socket shares one memory system, while a
    * real 4N-executor cluster brings 4x memory channels. Reported so
    * BENCH/BASELINE.md can normalize stage efficiencies against the
    * hardware's own scaling.
    */
  private def memBandwidth(nThreads: Int): Double = {
    val bytesPerThread = 64L << 20
    val passes = 4
    val t0 = System.nanoTime()
    val threads = (1 to nThreads).map { _ =>
      new Thread(() => {
        val arr = new Array[Long]((bytesPerThread / 8).toInt)
        var x = 0L
        var p = 0
        while (p < passes) {
          var j = 0
          while (j < arr.length) { x += arr(j); j += 8 } // one read per cache line
          p += 1
        }
        if (x == 42) System.err.print("")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    (bytesPerThread.toDouble * passes * nThreads) / secs / 1e9
  }

  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusPath = args(1)
    val nQueries = args(2).toInt
    val k = args(3).toInt
    val mode = if (args.length > 4) args(4) else "local"
    // the SELECTIVE batch runs MORE queries than the whole-vocab one: its
    // per-query work is small by design, so at the worst-case row's count
    // the N-level wall lands in the 2-5 s range where per-job fixed costs
    // floor the 8->32 ratio at ~0.33 REGARDLESS of engine quality (VERDICT
    // r4). Sizing the selective wall to >= 30 s at N makes the row an
    // honest scaling witness; QPS divides by this count.
    val nSelQueries = if (args.length > 5) args(5).toInt else nQueries

    // Bench artifacts live on tmpfs: the sandbox's virtio disk has 2-3x
    // run-to-run writeback jitter that would swamp the scaling signal (we
    // are certifying engine CPU/shuffle scaling, not the VM's disk).
    val shm = "/dev/shm/graft-bench"
    new java.io.File(shm).mkdirs()

    // Shuffle width scales with the level's cores, exactly as a real N- vs
    // 4N-executor cluster would size it (partitions ∝ total cores). With a
    // FIXED 64 at both levels, the stage-2 sort ran as 2 waves of heavy
    // tasks at 32 threads, each task getting 1/32 of the execution-memory
    // pool (vs 1/8 at local[8]) — measured as stage2-merge ANTI-scaling
    // (5.6 s at N -> 11.5 s at 4N, BENCH_r02; that run IS the isolated
    // effect of shuffle width, recorded so the width choice here stays
    // accountable). Index GEOMETRY (64 segments, 1024-doc chunks) stays
    // identical across levels, so results are bit-identical; only the
    // shuffle task granularity differs.
    val shuffleParts = math.max(64, 4 * cpus)
    // "cluster" mode runs this level as a local-cluster standalone app:
    // cpus/4 SEPARATE executor JVMs x 4 cores (the "N vs 4N executors"
    // shape of the north rule — each executor has its own heap, allocator,
    // and GC instead of one shared JVM). Worker slots get 4 GiB; executor
    // heaps 3 GiB, so total memory scales with executor count exactly as a
    // real cluster's would. Our classes reach the executor JVMs via
    // extraClassPath (same machine, same filesystem).
    val (master, clusterConfs) =
      if (mode == "cluster") {
        val execs = math.max(1, cpus / 4)
        val cores = math.min(4, cpus)
        // executor JVMs start in the worker's app dir — RELATIVE classpath
        // entries (sbt/scripts pass "target/scala-2.13/classes") must be
        // absolutized against THIS (driver) JVM's cwd or executors fail
        // with ClassNotFoundException on our classes
        val absCp = sys.props("java.class.path")
          .split(java.io.File.pathSeparator)
          .map(p => new java.io.File(p).getAbsolutePath)
          .mkString(java.io.File.pathSeparator)
        (s"local-cluster[$execs,$cores,4096]", Seq(
          "spark.executor.memory" -> "3g",
          "spark.executor.extraClassPath" -> absCp))
      } else (s"local[$cpus]", Nil)
    val builder = SparkSession.builder()
      .master(master)
      .appName(s"graft-bench-level-$cpus-$mode")
      .config("spark.sql.shuffle.partitions", shuffleParts.toString)
      // the corpus is 64 smallish files; default 128M/4M split bin-packing
      // would coalesce the scan into ~3 partitions and serialize the whole
      // read+shuffle-write map side regardless of core count
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", s"$shm/spark-n$cpus")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    clusterConfs.foreach { case (a, b) => builder.config(a, b) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = BuildConfig(numSegments = 64, outputPartitions = Some(shuffleParts), chunkDocs = 1024)

    val docs = spark.read.parquet(corpusPath)
    val nDocs = docs.count()

    // warm-up: small build + small batch (JIT the hot paths, untimed)
    val warmDir = s"$shm/warm-$cpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
    val warmIdx = IndexBuilder.build(spark, docs.where(col("doc_id") < nDocs / 10),
      "doc_id", "content", warmDir, cfg)
    val warmQueries = SyntheticCorpus.referenceQueries(nQueries).take(math.min(nQueries, 300))
    new IndexSearcher(warmIdx).searchMany(spark, warmQueries, k).count()

    // timed: one fresh build per JVM (the parent interleaves whole level
    // JVMs across rounds and takes per-level mins — cross-JVM redundancy
    // replaces in-JVM repeats)
    val indexDir = s"$shm/idx-n$cpus"
    var idx: graft.index.BuiltIndex = null
    val buildSecs = (1 to 1).map { _ =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(indexDir))
      val (b, secs) = timed {
        IndexBuilder.build(spark, docs, "doc_id", "content", indexDir, cfg)
      }
      idx = b
      secs
    }.min
    val phases = IndexBuilder.lastPhases.toSeq // default-path per-stage secs

    // timed: the ZERO-SHUFFLE build path (corpus v2 is range-partitioned +
    // sorted, the assumeContiguous contract). Same result, no stage-1
    // raw-text shuffle — the scaling headroom measurement.
    val contigDir = s"$shm/idx-contig-n$cpus"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(contigDir))
    val (_, buildContigSecs) = timed {
      IndexBuilder.build(spark, docs, "doc_id", "content", contigDir,
        cfg.copy(assumeContiguous = true))
    }
    val contigPhases = IndexBuilder.lastPhases.toSeq

    // timed: reference query set as one distributed batch. TWO timed runs,
    // min: the batch is cheap relative to the host's noise windows, and an
    // in-JVM repeat smooths sub-minute co-tenancy spikes that a single shot
    // would bake into the level's number.
    val searcher = new IndexSearcher(idx)
    val queries = SyntheticCorpus.referenceQueries(nQueries)
    var hits: Array[graft.search.QueryHit] = null
    val batchSecs = (1 to 2).map { _ =>
      val (h, secs) = timed(searcher.searchMany(spark, queries, k).collect())
      hits = h
      secs
    }.min
    val sha = IndexBuilder.sha256Hex(
      hits.sortBy(h => (h.queryId, -h.score, h.docId))
        .map(h => s"${h.queryId}:${h.docId}:${h.score}").mkString("\n"))

    // timed: the PRODUCTION-SHAPED batch — same query count and shapes over
    // <= 5% of the vocabulary (SyntheticCorpus.selectiveQueries). The
    // reference set's term union covers the whole dictionary (a deliberate
    // worst case whose cogroup moves the entire index through memory); real
    // query logs touch a sliver, and this row measures THAT shape's scaling.
    val selQueries = SyntheticCorpus.selectiveQueries(nSelQueries)
    var selHits: Array[graft.search.QueryHit] = null
    // one timed run when the wall is sized >= 30 s (the long wall itself
    // averages host noise; min-of-2 was for the sub-5 s shape), two otherwise
    val selRuns = if (nSelQueries > nQueries) 1 else 2
    val batchSelSecs = (1 to selRuns).map { _ =>
      val (h, secs) = timed(searcher.searchMany(spark, selQueries, k).collect())
      selHits = h
      secs
    }.min
    val selSha = IndexBuilder.sha256Hex(
      selHits.sortBy(h => (h.queryId, -h.score, h.docId))
        .map(h => s"${h.queryId}:${h.docId}:${h.score}").mkString("\n"))

    val calib = calibrate()
    // fixed-work-per-thread probe at the LEVEL's width (5x the health
    // probe's work so scheduler jitter amortizes): the cross-level ratio of
    // these walls is the host's ideal-work scaling envelope
    val calibWide = calibrate(cpus, itersPerThread = 2000000000)
    val membw = memBandwidth(cpus)
    val phaseKv = (phases.map { case (n, s) => f"p_$n=$s%.3f" } ++
      contigPhases.map { case (n, s) => f"pc_$n=$s%.3f" }).mkString(" ")
    println(f"LEVELRESULT cpus=$cpus docs=$nDocs build_secs=$buildSecs%.3f " +
      f"build_contig_secs=$buildContigSecs%.3f batch_secs=$batchSecs%.3f " +
      f"batch_sel_secs=$batchSelSecs%.3f sel_sha=$selSha " +
      f"calib_secs=$calib%.3f calibwide_secs=$calibWide%.3f membw_gbps=$membw%.2f sha=$sha $phaseKv")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(shm + s"/spark-n$cpus"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(shm + s"/work-$cpus"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warmDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(indexDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(contigDir))
    spark.stop()
  }
}
