package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import scala.collection.concurrent.TrieMap

/** Metrics (reference: SDK/metrics/Metrics.java:63 counter, :77 distribution,
  * :92 gauge): per-pipeline user metrics. Spark-native mapping:
  *
  *  - counters → `SparkContext.longAccumulator` (exact, fault-tolerant for
  *    actions; Beam's attempted-vs-committed distinction maps to Spark's
  *    "accumulators may double-count on task retry in transformations" —
  *    same contract as Beam's attempted metrics);
  *  - distributions → `df.observe` with min/max/count/sum aggregates
  *    (collected per action via QueryExecutionListener, exact);
  *  - gauges → a driver-side last-value cell.
  */
object Metrics {

  // keyed by (applicationId, name): an accumulator is bound to its
  // SparkContext — caching by name alone would hand back a dead
  // accumulator (silently dropping adds) after a session restart
  private val counters = TrieMap.empty[(String, String), LongAccumulator]
  private val gauges   = TrieMap.empty[String, Long]

  /** Metrics.counter: a named distributed counter. Increment from closures
    * (ds.map / mapPartitions); read on the driver after an action. */
  def counter(spark: SparkSession, name: String): LongAccumulator =
    counters.getOrElseUpdate((spark.sparkContext.applicationId, name),
      spark.sparkContext.longAccumulator(name))

  /** Read a counter for the GIVEN session: keyed lookup by
    * (applicationId, name), so a restarted session can never hand back a
    * dead predecessor's accumulator. */
  def counterValue(spark: SparkSession, name: String): Option[Long] =
    counters.get((spark.sparkContext.applicationId, name)).map(_.value)

  /** Metrics.gauge: driver-side last value. */
  def gauge(name: String, value: Long): Unit = gauges.put(name, value)
  def gaugeValue(name: String): Option[Long] = gauges.get(name)

  /** Metrics.distribution as an observation attached to the frame: emits
    * min/max/count/sum of `value` when the frame is executed. Read the
    * result from `Observation` or a QueryExecutionListener. Unlike an
    * accumulator this is exact (computed by the query itself). */
  def distribution(df: DataFrame, name: String, value: Column): DataFrame =
    df.observe(name,
      min(value).as("min"), max(value).as("max"),
      count(value).as("count"), sum(value).as("sum"))

  /** Blocking helper for batch: run an action and return the observed
    * distribution row for `name`. */
  def observedDistribution(df: DataFrame, name: String, value: Column): Row = {
    val obs = org.apache.spark.sql.Observation(name)
    val observed = df.observe(obs,
      min(value).as("min"), max(value).as("max"),
      count(value).as("count"), sum(value).as("sum"))
    observed.write.format("noop").mode("overwrite").save()
    Row(obs.get("min"), obs.get("max"), obs.get("count"), obs.get("sum"))
  }
}
