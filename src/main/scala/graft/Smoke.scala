package graft

import org.apache.spark.sql.functions._

/** End-to-end smoke: drive a representative slice of the public API against
  * a real scale-factor directory and print row counts + samples — the
  * quick "does it actually run" pass before the full Verify/oracle cycle;
  * the driver's t1 smoke uses SparkEntry.entry instead.
  *
  * Usage: sbt "runMain graft.Smoke /root/testdata/sf0.001"
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.getOrCreate()
    val names = SparkEntry.queries.keys.toSeq.sorted
    val toRun: Seq[String] = if (args.length > 1) args.drop(1).toSeq else names
    var failed = 0
    toRun.foreach { name =>
      val t0 = System.nanoTime()
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val rows = df.count()
        val sample = df.limit(3).collect().map(_.toString).mkString(" | ")
        println(f"[smoke] $name%-24s rows=$rows%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs  $sample")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"[smoke] $name FAILED: ${e.getMessage}")
      }
    }
    println(s"[smoke] done: ${toRun.size - failed}/${toRun.size} ok")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
