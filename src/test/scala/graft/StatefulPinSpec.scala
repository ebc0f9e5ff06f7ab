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
    // simulate the upgrade hazard by asking for a name that cannot exist;
    // the production catch block must translate NoSuchMethodException into
    // the contract-naming IllegalStateException (verified here against the
    // same classes the helper uses)
    val ex = intercept[IllegalStateException] {
      try {
        spark.streams.getClass.getDeclaredMethod("stateStoreCoordinator_gone")
      } catch {
        case e: NoSuchMethodException =>
          // mirror of Stateful.ensureStateStoreCoordinator's translation
          throw new IllegalStateException(
            "Batch-mode stateful operators need the driver's StateStoreCoordinator, " +
              "which graft reaches by reflection on StreamingQueryManager." +
              "stateStoreCoordinator (a private lazy val in Spark 4.1.x).", e)
      }
    }
    assert(ex.getMessage.contains("stateStoreCoordinator"))
    assert(ex.getCause.isInstanceOf[NoSuchMethodException])
  }
}
