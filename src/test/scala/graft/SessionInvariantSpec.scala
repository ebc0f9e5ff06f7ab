package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.Triggers

/** Randomized invariant testing of the merging-session pane engine: seeded
  * random scripts (event times, keys, batch splits, early-count triggers)
  * checked against MODEL-INDEPENDENT invariants — properties derivable from
  * the Sessions definition alone, not a replay of the processor's logic
  * (which would be tautological).
  *
  * Panes are grouped by window span; a key's MAXIMAL spans (not contained
  * in any other span of that key — merges only grow spans) are its true
  * sessions, and each maximal span's last (max-index) pane carries the
  * accumulated bag. Note a window may close SILENTLY after its last
  * refinement (ClosingBehavior.FIRE_IF_NON_EMPTY — no empty duplicate
  * final pane), so the invariants address terminal panes, not is_final
  * markers:
  *
  *  1. completeness: terminal bags of a key's maximal spans partition its
  *     events exactly;
  *  2. window soundness: every event's [t, t+gap) interval lies inside its
  *     span; maximal spans are disjoint and ≥ gap long;
  *  3. pane ordering: within a maximal span every non-terminal pane has a
  *     smaller index than the terminal pane and its bag is a subset of the
  *     terminal bag (accumulating mode only unions); any is_final pane is
  *     the terminal one.
  */
class SessionInvariantSpec extends SparkSpec {
  import spark.implicits._

  private case class Pane(k: String, wstart: Long, wend: Long, values: Seq[Long],
                          idx: Int, timing: String, isFinal: Boolean)

  test("random scripts: terminal session panes partition events; spans disjoint; panes ordered") {
    val gapSec = 30L
    val rng = new scala.util.Random(20260812L)
    for (trial <- 0 until 3) {
      val nKeys = 3 + rng.nextInt(3)
      val events = (0 until 400).map { i =>
        val k = s"k${rng.nextInt(nKeys)}"
        // clustered times: bursts around random anchors so merges happen
        val anchor = rng.nextInt(20) * 120L
        (k, anchor + rng.nextInt(45), i.toLong)
      }
      val input = MemoryStream[(String, Timestamp, Long)](spark)
      val ds = input.toDF().toDF("k", "t", "v")
        .withWatermark("t", "0 seconds")
        .selectExpr("k", "CAST(unix_millis(t) AS LONG) AS ts", "v")
        .as[(String, Long, Long)]
      val panes = Triggers.sessionAggregateTriggered(ds, collectLongsFn,
        gapMs = gapSec * 1000,
        trigger = Triggers.AfterWatermarkEL(Some(Triggers.AfterCountT(1 + rng.nextInt(4))), None),
        allowedLatenessMs = 3600L * 1000)
      val name = s"sess_inv_$trial"
      val q = panes.toDF("k", "wstart", "wend", "values", "pane_index", "timing", "is_final")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").option("checkpointLocation", ckpt()).start()
      try {
        // time-ordered arrival (nothing late) in random batch sizes with
        // random micro-batch boundaries, then close everything
        var rest = events.sortBy(_._2)
        while (rest.nonEmpty) {
          val sz = 1 + rng.nextInt(200)
          val (batch, tail) = rest.splitAt(sz)
          input.addData(batch.map { case (k, sec, v) => (k, new Timestamp(sec * 1000), v) }: _*)
          if (rng.nextBoolean()) q.processAllAvailable()
          rest = tail
        }
        q.processAllAvailable()
        input.addData(("__wm", new Timestamp(100000L * 1000), 0L))
        q.processAllAvailable()

        val got = spark.table(name).collect().filter(_.getString(0) != "__wm")
          .map(r => Pane(r.getString(0), r.getAs[Long]("wstart"), r.getAs[Long]("wend"),
            r.getSeq[Long](3).toSeq, r.getAs[Int]("pane_index"),
            r.getAs[String]("timing"), r.getAs[Boolean]("is_final")))

        val byKey = events.groupBy(_._1)
        val gotByKey = got.groupBy(_.k)
        // iterate the INPUT keys, not the output's — a regression that
        // drops every pane of a key must fail loudly, not vacuously
        byKey.keys.foreach { k =>
          assert(gotByKey.contains(k), s"[$trial/$k] key produced no panes at all")
          val ps = gotByKey(k)
          val spans = ps.groupBy(p => (p.wstart, p.wend))
          val maximal = spans.keySet.filter { case (s, e) =>
            !spans.keySet.exists { case (s2, e2) =>
              (s2, e2) != (s, e) && s2 <= s && e <= e2
            }
          }
          val terminals = maximal.toSeq.sorted.map { span =>
            span -> spans(span).maxBy(_.idx)
          }
          // 1. completeness
          val ids = terminals.flatMap(_._2.values)
          assert(ids.length == ids.distinct.length,
            s"[$trial/$k] an event appears in two terminal panes")
          assert(ids.sorted == byKey(k).map(_._3).sorted,
            s"[$trial/$k] terminal panes lose or invent events")
          // 2. window soundness
          val evTime = byKey(k).map(e => e._3 -> e._2 * 1000).toMap
          terminals.foreach { case ((ws, we), p) =>
            p.values.foreach { v =>
              assert(evTime(v) >= ws && evTime(v) + gapSec * 1000 <= we,
                s"[$trial/$k] value $v at ${evTime(v)} outside window [$ws,$we)")
            }
            assert(we >= ws + gapSec * 1000, s"[$trial/$k] window shorter than gap")
          }
          terminals.map(_._1).sliding(2).filter(_.length == 2).foreach { pair =>
            assert(pair(1)._1 >= pair(0)._2,
              s"[$trial/$k] overlapping maximal spans ${pair(0)} / ${pair(1)}")
          }
          // 3. pane ordering within each maximal span
          terminals.foreach { case ((ws, we), term) =>
            val inside = ps.filter(p => p.wstart >= ws && p.wend <= we && p != term)
            inside.foreach { p =>
              assert(p.idx < term.idx,
                s"[$trial/$k] non-terminal pane index ${p.idx} >= terminal ${term.idx}")
              assert(p.values.forall(term.values.contains),
                s"[$trial/$k] pane holds values missing from the terminal bag")
              assert(!p.isFinal, s"[$trial/$k] a non-terminal pane is marked final")
            }
          }
        }
      } finally q.stop()
    }
  }
}
