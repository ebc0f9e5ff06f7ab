package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Joins: the reference has only key-equality joins, all built on
  * CoGroupByKey (reference: SDK/transforms/join/CoGroupByKey.java:74;
  * extension joins sdks/java/extensions/join-library/Join.java:48,:94,:147,:201).
  *
  * Scale notes: Beam's CoGBK is always a full shuffle of both sides; here
  * Catalyst picks broadcast-hash vs shuffled-hash vs sort-merge per side
  * statistics, and AQE converts to broadcast at runtime when a side turns out
  * small. `broadcastJoin` pins the hint for dimension tables (the reference's
  * "side input join" pattern, examples/.../JoinExamples.java:82-85).
  */
object Joins {

  /** Join.innerJoin (reference: Join.java:48). */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "inner")

  /** Join.leftOuterJoin(nullValue) (reference: Join.java:94): Beam requires a
    * null substitute because KV values can't be null; we coalesce the given
    * columns to the substitute. */
  def leftOuter(left: DataFrame, right: DataFrame, keys: Seq[String],
                nullSubs: Map[String, Column] = Map.empty): DataFrame =
    substitute(left.join(right, keys, "left_outer"), nullSubs)

  /** Join.rightOuterJoin (reference: Join.java:147). */
  def rightOuter(left: DataFrame, right: DataFrame, keys: Seq[String],
                 nullSubs: Map[String, Column] = Map.empty): DataFrame =
    substitute(left.join(right, keys, "right_outer"), nullSubs)

  /** Join.fullOuterJoin (reference: Join.java:201). */
  def fullOuter(left: DataFrame, right: DataFrame, keys: Seq[String],
                nullSubs: Map[String, Column] = Map.empty): DataFrame =
    substitute(left.join(right, keys, "full_outer"), nullSubs)

  private def substitute(df: DataFrame, subs: Map[String, Column]): DataFrame =
    subs.foldLeft(df) { case (d, (c, sub)) => d.withColumn(c, coalesce(col(c), sub)) }

  /** Semi/anti (expressible in Beam by filtering CoGbkResult; named here). */
  def leftSemi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")
  def leftAnti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Side-input / broadcast join: pins a broadcast of the small side.
    * (reference: View.asMap used inside DoFn — SDK/transforms/View.java:445) */
  def broadcastJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                    how: String = "inner"): DataFrame =
    big.join(broadcast(small), keys, how)

  /** CoGroupByKey, N-way (reference: CoGroupByKey.java:74 → KV<K, CoGbkResult>
    * with per-tag iterables). Spark shape: per-input pre-aggregation to
    * (key, collect_list(value)) then chained full-outer joins on the key —
    * each input shuffles ONCE on the key, identical to Beam's union+GBK cost,
    * and the per-tag lists arrive exactly like CoGbkResult's iterables
    * (empty list when the key is absent on that side).
    */
  def coGroupByKey(key: String, inputs: Map[String, (DataFrame, Column)]): DataFrame = {
    val grouped = inputs.map { case (tag, (df, value)) =>
      df.groupBy(col(key)).agg(sort_array(collect_list(value)).as(tag))
    }
    val joined = grouped.reduce((a, b) => a.join(b, Seq(key), "full_outer"))
    // CoGbkResult yields an EMPTY iterable, not null, for absent tags.
    inputs.keys.foldLeft(joined) { (d, tag) =>
      d.withColumn(tag, coalesce(col(tag), array()))
    }
  }

  /** View.asSingleton / asList / asIterable / asMap / asMultimap (reference:
    * SDK/transforms/View.java:302, :249, :275, :445, :418): materialize a
    * SMALL side input for use inside per-element logic — the Beam contract is
    * that views fit in worker memory (they are broadcast by every runner), so
    * the collect() here is the operator's semantics, not a hot-path collect.
    * Batch: collect + broadcast; the caller uses the returned broadcast in a
    * closure. Streaming: prefer stream-static joins instead. */
  def viewAsList[T](spark: SparkSession, df: DataFrame, f: org.apache.spark.sql.Row => T)
      : org.apache.spark.broadcast.Broadcast[Seq[T]] =
    spark.sparkContext.broadcast(df.collect().toSeq.map(f))

  /** Beam's asIterable ≡ asList under Spark materialization. */
  def viewAsIterable[T](spark: SparkSession, df: DataFrame, f: org.apache.spark.sql.Row => T)
      : org.apache.spark.broadcast.Broadcast[Seq[T]] = viewAsList(spark, df, f)

  def viewAsMap[K, V](spark: SparkSession, df: DataFrame,
                      f: org.apache.spark.sql.Row => (K, V))
      : org.apache.spark.broadcast.Broadcast[Map[K, V]] =
    spark.sparkContext.broadcast(df.collect().toSeq.map(f).toMap)

  /** View.asMultimap (reference: View.java:418): key → all values. */
  def viewAsMultimap[K, V](spark: SparkSession, df: DataFrame,
                           f: org.apache.spark.sql.Row => (K, V))
      : org.apache.spark.broadcast.Broadcast[Map[K, Seq[V]]] =
    spark.sparkContext.broadcast(
      df.collect().toSeq.map(f).groupBy(_._1).map { case (k, kvs) => k -> kvs.map(_._2) })

  /** View.asSingleton (reference: View.java:302): exactly-one-element view;
    * `default` when empty (Beam's withDefaultValue), error when >1 — the
    * same contract as Beam's SingletonViewFn. */
  def viewAsSingleton[T: scala.reflect.ClassTag](spark: SparkSession, df: DataFrame,
                         f: org.apache.spark.sql.Row => T, default: Option[T] = None)
      : org.apache.spark.broadcast.Broadcast[T] = {
    val rows = df.take(2)
    val value = rows.length match {
      case 0 => default.getOrElse(
        throw new IllegalArgumentException("asSingleton on empty input with no default"))
      case 1 => f(rows(0))
      case _ => throw new IllegalArgumentException("asSingleton on multi-element input")
    }
    spark.sparkContext.broadcast(value)
  }

  // ------------------------------------------------------ windowed side inputs

  /** Beam side inputs are WINDOWED: a main element reads the view of the
    * side window its own window maps to, via a WindowMappingFn (reference:
    * SDK/values/PCollectionViews.java;
    * SDK/transforms/windowing/WindowMappingFn.java — the default maps a
    * main window to the side window containing the main window's MAXIMUM
    * timestamp). [[sideWindowFor]] is that default mapping for
    * fixed-windowed sides; compose it with either the broadcast view
    * ([[viewAsMapPerWindow]], small sides) or the join form
    * ([[windowedSideInputJoin]], any side size — the scale path). */
  def sideWindowFor(mainWindowEnd: Column, sideSizeMs: Long): Column =
    // main window max timestamp = end - 1ms (Beam IntervalWindow
    // maxTimestamp); its containing fixed side window start:
    floor((mainWindowEnd.cast("long") - 1) / sideSizeMs).cast("long") * sideSizeMs

  /** View.asMap per window: broadcast Map[(sideWindowStartMs, K), V].
    * Same bounded-side contract as [[viewAsMap]] (views fit in worker
    * memory — the collect IS the semantics); `f` extracts
    * (windowStartMs, key, value) from each side row. */
  def viewAsMapPerWindow[K, V](spark: SparkSession, side: DataFrame,
                               f: org.apache.spark.sql.Row => (Long, K, V))
      : org.apache.spark.broadcast.Broadcast[Map[(Long, K), V]] =
    spark.sparkContext.broadcast(
      side.collect().toSeq.map { r => val (w, k, v) = f(r); ((w, k), v) }.toMap)

  /** Windowed side-input join — the unbounded-scale form of a windowed
    * view: the main input (carrying its window end) joins the side keyed by
    * (side window, key) after applying the default window mapping. The
    * side is broadcast (dimension-sized per window); drop the hint for
    * genuinely large sides and let AQE pick the strategy. */
  def windowedSideInputJoin(main: DataFrame, mainWindowEnd: Column,
                            side: DataFrame, sideWindowStart: String,
                            sideSizeMs: Long, keys: Seq[String],
                            how: String = "left_outer"): DataFrame =
    main.withColumn(sideWindowStart, sideWindowFor(mainWindowEnd, sideSizeMs))
      .join(broadcast(side), sideWindowStart +: keys, how)

  /** Flatten.pCollections (reference: SDK/transforms/Flatten.java:101): bag
    * union, no dedup; unionByName tolerates column order drift. */
  def flatten(dfs: Seq[DataFrame]): DataFrame = dfs.reduce(_ unionByName _)

  /** Set ops — absent as named primitives in the reference (expressible via
    * CoGroupByKey + filter, SURVEY §2.5); named here because Catalyst plans
    * them as a single shuffle with partial aggregation. */
  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
