package graft
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = "/root/testdata/sf0.01"
    Seq("q1_agg", "q_broadcast_join", "q_filter", "q_map_project",
        "q_embed_topk", "q_join_inner", "q_window_fixed").foreach { name =>
      println(s"===== $name")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
