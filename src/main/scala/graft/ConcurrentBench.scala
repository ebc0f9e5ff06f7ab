package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

/** Multi-tenant contention bench (dev tool): a 100 TB cluster never runs
  * one query at a time, so this drives the FULL catalog with N concurrent
  * worker threads under Spark's FAIR scheduler and compares every query's
  * wall under contention against its sequential pace in the same JVM.
  *
  * Tenancy model — one `spark.newSession()` per worker (isolated SQLConf +
  * temp views over the shared SparkContext: exactly how a multi-tenant
  * Spark deployment isolates users), each worker pinned to its own FAIR
  * pool via the `spark.scheduler.pool` thread-local, so no tenant can
  * starve another at the task-scheduler level (equal weight, FIFO within
  * pool). Conf-scoped query builders (q_range_rewrite's build-time
  * bucketWidth) stay correct because each worker builds in its own
  * session.
  *
  * Protocol: one warmup pass at sf0.001 (codegen/JIT), a sequential
  * measured pass (median of SPARK_GRAFT_CB_RUNS, default 2), then the
  * concurrent pass — a shared work queue drained by
  * SPARK_GRAFT_CB_THREADS (default 8) workers, every query executed once
  * through the noop sink. Emits per-query {seq, conc, ratio} to
  * target/concurrent_bench.json and ONE summary JSON line:
  *
  *  - `conc_wall` (makespan) vs `seq_total`: aggregate speedup — FAIR
  *    sharing must beat running the same work serially;
  *  - `max_ratio` + `over3x`: per-query contention ceiling. Ratios are
  *    reported for queries with seq >= 0.15 s (below that, fixed
  *    per-query costs — noop commit, plan build — dominate and the ratio
  *    measures overhead, not contention).
  *
  * Results + analysis live in BASELINE.md (round 14 concurrency table).
  */
object ConcurrentBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nThreads = sys.env.getOrElse("SPARK_GRAFT_CB_THREADS", "8").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_CB_RUNS", "2").toInt
    val spark = GraftSession.builder()
      .config("spark.scheduler.mode", "FAIR")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.toSeq.sorted

    def loadavg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    def execute(sess: org.apache.spark.sql.SparkSession, name: String,
                dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(sess, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[cbench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warmup (codegen/JIT per query shape)
    names.foreach(n => execute(spark, n, "/root/testdata/sf0.001"))

    // sequential pass: median of `runs` in one thread, one fresh session
    // (same tenancy shape as the workers so the comparison is apples-only)
    val seqSess = spark.newSession()
    val seqT0 = System.nanoTime()
    // Per-RUN failure count across the pass: a query failing some-but-not-
    // all of its runs still yields a healthy median below, so the median
    // alone can't carry the failure signal — flaky-under-load queries must
    // trip the same nonzero-exit gate as hard failures (r15 advice).
    var seqRunFailures = 0
    val seq = names.map { n =>
      val all = (1 to runs).map(_ => execute(seqSess, n, sfDir))
      seqRunFailures += all.count(_ < 0)
      val ts = all.filter(_ >= 0).sorted
      // LOWER median for even run counts: ts(size/2) would be the MAX of
      // runs=2, inflating every seq baseline and understating the
      // contention ratios this bench exists to gate
      n -> (if (ts.isEmpty) -1.0 else ts((ts.size - 1) / 2))
    }.toMap
    val seqWallPass = (System.nanoTime() - seqT0) / 1e9 / runs
    val seqTotal = seq.values.filter(_ >= 0).sum
    val loadSeq = loadavg // sampled at the END of the pass it labels

    // concurrent pass: N workers drain a shared queue, one FAIR pool each
    val queue = new ConcurrentLinkedQueue[String]()
    scala.util.Random.setSeed(20260815L)
    scala.util.Random.shuffle(names).foreach(queue.add) // no sorted-order bias
    val conc = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    val done = new CountDownLatch(nThreads)
    val concT0 = System.nanoTime()
    val workers = (0 until nThreads).map { i =>
      val th = new Thread(() => {
        val sess = spark.newSession()
        sess.sparkContext.setLocalProperty("spark.scheduler.pool", s"pool$i")
        var n = queue.poll()
        while (n != null) {
          conc.put(n, execute(sess, n, sfDir))
          n = queue.poll()
        }
        done.countDown()
      }, s"cbench-worker-$i")
      th.setDaemon(true); th.start(); th
    }
    done.await()
    val concWall = (System.nanoTime() - concT0) / 1e9
    val loadConc = loadavg // trailing average over the concurrent pass
    workers.foreach(_.join(1000))

    val ratioFloor = 0.15
    val rows = names.map { n =>
      val s = seq(n); val c = conc.getOrDefault(n, -1.0)
      val ratio = if (s >= ratioFloor && c >= 0) c / s else -1.0
      (n, s, c, ratio)
    }
    // failures are NOT silently excluded from the verdict: a query that
    // crashes under contention must not read as a healthy summary line.
    // seq_failures counts every failed RUN (partial failures included),
    // not just queries whose every run crashed.
    val seqFailures = seqRunFailures
    val concFailures = names.count(n => conc.getOrDefault(n, -1.0) < 0)
    val over3x = rows.filter(r => r._4 > 3.0).sortBy(-_._4)
    val maxR = rows.filter(_._4 > 0).maxByOption(_._4)
    val perQ = rows.map { case (n, s, c, r) =>
      f""""$n":{"seq":$s%.3f,"conc":$c%.3f,"ratio":$r%.2f}"""
    }.mkString("{", ",", "}")
    val file = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_REPO", sys.props("user.dir")),
      "target", "concurrent_bench.json").toAbsolutePath
    val maxJson = maxR.map { case (n, s, c, r) =>
      f""","max_ratio":{"query":"$n","seq":$s%.3f,"conc":$c%.3f,"ratio":$r%.2f}"""
    }.getOrElse("")
    val line =
      f"""{"concurrent_bench":{"threads":$nThreads,"sf":"$sfDir","runs":$runs,""" +
        f""""seq_total":$seqTotal%.2f,"seq_pass_wall":$seqWallPass%.2f,""" +
        f""""seq_failures":$seqFailures,"conc_failures":$concFailures,""" +
        f""""conc_wall":$concWall%.2f,"speedup_vs_seq":${seqWallPass / concWall}%.2f,""" +
        f""""over3x_count":${over3x.size},"over3x":[${over3x.take(10).map(r => "\"" + r._1 + "\"").mkString(",")}]""" +
        maxJson +
        f""","loadavg_seq":$loadSeq%.2f,"loadavg_conc":$loadConc%.2f,""" +
        f""""queries":$perQ}}"""
    try {
      java.nio.file.Files.createDirectories(file.getParent)
      java.nio.file.Files.writeString(file, line + "\n")
      System.err.println(s"[cbench] per-query map written to $file")
    } catch { case e: Throwable =>
      System.err.println(s"[cbench] $file write failed: ${e.getMessage}")
    }
    println(line.take(4000))
    println(
      f"""{"concurrent_summary":{"threads":$nThreads,"seq_pass_wall":$seqWallPass%.2f,""" +
        f""""conc_wall":$concWall%.2f,"speedup":${seqWallPass / concWall}%.2f,""" +
        f""""over3x_count":${over3x.size},"seq_failures":$seqFailures,""" +
        f""""conc_failures":$concFailures$maxJson}}""")
    spark.stop()
    // a crashing query is a FAILED bench run, whatever the ratios say
    if (seqFailures + concFailures > 0) sys.exit(1)
  }
}
