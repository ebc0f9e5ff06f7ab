package graft

import graft.streaming.Stateful

/** Pins the one reflection hazard in the library:
  * Stateful.ensureStateStoreCoordinator reaches into Spark's private
  * StreamingQueryManager.stateStoreCoordinator lazy val so batch-mode
  * transformWithState works without a dummy streaming query. If a Spark
  * upgrade removes/renames that member, THIS test names the contract
  * instead of a query failing with a cryptic reflection stack. */
class StatefulPinSpec extends SparkSpec {

  test("StreamingQueryManager.stateStoreCoordinator is reachable on this Spark " +
      "(4.1.x contract; ensureStateStoreCoordinator depends on it)") {
    // the declared method must exist...
    val m = spark.streams.getClass.getDeclaredMethod("stateStoreCoordinator")
    assert(m != null)
    // ...and invoking the helper must neither throw nor require an active
    // streaming query
    Stateful.ensureStateStoreCoordinator(spark)
  }

  test("ensureStateStoreCoordinator fails with an ACTIONABLE message when the " +
      "reflection target is missing") {
    // drive the PRODUCTION catch block through its test seam: a member name
    // that cannot exist simulates the Spark-upgrade hazard, and the real
    // translation must name the contract
    val ex = intercept[IllegalStateException] {
      Stateful.ensureStateStoreCoordinator(spark, "stateStoreCoordinator_gone")
    }
    assert(ex.getMessage.contains("stateStoreCoordinator"))
    assert(ex.getMessage.contains("streaming query"))
    assert(ex.getCause.isInstanceOf[NoSuchMethodException])
  }
}
