package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Differential plan fuzzer: a seeded generator composes random small
  * plans — filter / derive / join / groupBy-agg / window / distinct over
  * the `events` and `lineitem` tables with random predicates and key
  * sets — renders each plan BOTH as DataFrame operations (the graft
  * surface, optimizer rules included) and as the equivalent ANSI SQL, runs
  * the SQL in DuckDB (tools/fuzz_oracle.py), and compares the full result
  * multisets. This is the correctness frontier past the hand catalog: the
  * queries nobody wrote — the same trust argument as the reference's
  * ValidatesRunner corpus (reference:
  * sdks/java/core/src/test/java/org/apache/beam/sdk/testing/ — one test
  * corpus, every runner).
  *
  * Determinism by construction: every generated output column is BIGINT
  * or VARCHAR (doubles enter only through the proven cents formula;
  * timestamps as epoch micros), no LIMIT, no order-dependent aggregate.
  * Each column carries a tracked magnitude RANGE through every stage, and
  * sum/window-sum only draw from columns whose range keeps the worst-case
  * total below 2^62 — the overflow-freedom argument, not a name
  * heuristic. Both sides canonicalize identically: columns sorted by
  * name, cells joined by \u001f with null as \u0000, rows sorted.
  *
  * SEED and N are fixed; a failure prints the seed, plan index, and both
  * the SQL and the AST — reproduce with the printed index, then freeze
  * the minimized case as a regression test here.
  */
class FuzzDifferentialSpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"
  private val Seed = 20260814L
  private val N = sys.env.getOrElse("SPARK_GRAFT_FUZZ_N", "100").toInt
  /** Result-set cap (generator invariant, checked at run time). */
  private val MaxRows = 300000L
  /** sum()/sum-over candidates must have range.hi ≤ this: hi × MaxRows
    * stays below 2^62, so no BIGINT overflow on either engine. */
  private val SumSafeHi = (Long.MaxValue / 4) / MaxRows

  // ------------------------------------------------------------- base views
  // KEEP IN LOCKSTEP with tools/fuzz_oracle.py's ev/li views.

  private def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  private lazy val evBase: DataFrame =
    GraftSession.table(spark, SfDir, "events").select(
      col("event_id"), col("user_id"), col("event_type"),
      cents(col("value")).as("cents"),
      GraftSession.epochMicros(col("ts")).as("tsus"))

  private lazy val liBase: DataFrame =
    GraftSession.table(spark, SfDir, "lineitem").select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_linenumber").cast("long").as("l_linenumber"),
      floor(col("l_quantity")).cast("long").as("qty"),
      cents(col("l_extendedprice")).as("price_cents"),
      cents(col("l_discount")).as("disc_cents"),
      col("l_returnflag"), col("l_linestatus"))

  /** (name, 'L'|'S', value range — drives literal draws AND sum-overflow
    * exclusion). */
  private type Col = (String, Char, (Long, Long))
  private val evSchema: Seq[Col] = Seq(
    ("event_id", 'L', (0L, 1100L)), ("user_id", 'L', (0L, 20L)),
    ("event_type", 'S', (0L, 0L)), ("cents", 'L', (0L, 35000L)),
    ("tsus", 'L', (1500000000000000L, 1900000000000000L)))
  private val liSchema: Seq[Col] = Seq(
    ("l_orderkey", 'L', (0L, 1600L)), ("l_partkey", 'L', (0L, 220L)),
    ("l_suppkey", 'L', (0L, 12L)), ("l_linenumber", 'L', (1L, 7L)),
    ("qty", 'L', (1L, 50L)), ("price_cents", 'L', (0L, 11000000L)),
    ("disc_cents", 'L', (0L, 10L)),
    ("l_returnflag", 'S', (0L, 0L)), ("l_linestatus", 'S', (0L, 0L)))
  private val strValues = Map(
    "event_type" -> Seq("click", "error", "purchase", "signup", "view"),
    "l_returnflag" -> Seq("A", "N", "R"), "l_linestatus" -> Seq("O", "F"))

  // ----------------------------------------------------------------- the AST

  private sealed trait Pred
  private case class Cmp(c: String, op: String, lit: Long) extends Pred
  private case class StrEq(c: String, v: String, neg: Boolean) extends Pred
  private case class StrIn(c: String, vs: Seq[String]) extends Pred
  private case class AndP(a: Pred, b: Pred) extends Pred
  private case class OrP(a: Pred, b: Pred) extends Pred

  private sealed trait Derive
  private case class Mod(c: String, k: Long) extends Derive
  private case class Plus(c: String, k: Long) extends Derive
  private case class StrLen(c: String) extends Derive

  private case class Agg(func: String, c: String, out: String) // cnt/sum/min/max/cntd

  private sealed trait Stage
  private case class FilterSt(p: Pred) extends Stage
  private case class DeriveSt(name: String, d: Derive) extends Stage
  private case class AggSt(keys: Seq[String], aggs: Seq[Agg]) extends Stage
  private case class WinSt(part: String, func: String, c: String, out: String) extends Stage
  private case class DistinctSt(cols: Seq[String]) extends Stage
  /** join a (filtered, possibly aggregated) second pipeline on
    * leftKey % m = rightKey % m; right columns arrive suffixed `_r` for
    * inner/left; semi/anti keep the left schema (EXISTS / NOT EXISTS). */
  private case class JoinSt(rightBase: String, rightStages: Seq[Stage],
                            leftKey: String, rightKey: String, m: Long,
                            how: String) extends Stage // inner|left|semi|anti
  /** UNION ALL of two differently-filtered slices of the base — only
    * valid as the FIRST stage (schema must still be the base schema). */
  private case class UnionSelfSt(p1: Pred, p2: Pred) extends Stage
  /** INTERSECT / EXCEPT (SQL set semantics: distinct rows, NULLs equal)
    * of two filtered slices — first stage only, like UnionSelfSt. The
    * slices are PROJECTED onto low-cardinality columns first: full base
    * rows are unique (event_id), so without the projection the implicit
    * dedup — the semantics under test — would never fire (a planted
    * INTERSECT ALL passed 200 plans before this). */
  private case class SetSelfSt(op: String, cols: Seq[String],
                               p1: Pred, p2: Pred) extends Stage
  /** CASE WHEN numCol > k THEN 'hi' ELSE 'lo' END — a derived string. */
  private case class CaseSt(name: String, c: String, k: Long) extends Stage

  private case class PlanSpec(base: String, stages: Seq[Stage])

  // ------------------------------------------------------------ the generator

  private final class Gen(rnd: scala.util.Random) {
    private var derived = 0
    private def fresh(p: String): String = { derived += 1; s"__$p$derived" }

    /** Distinct-value estimate from the tracked range — the fan-out-bound
      * logic must not accept a near-unique key (tsus, event_id) as
      * "closing" a join's fan-out: groupBy/distinct on such a key keeps
      * ~every row. Saturating. */
    private def cardEst(c: Col): Long = c._2 match {
      case 'S' => 8L // every string column here has ≤ 8 distinct values
      case _ => val (lo, hi) = c._3; if (hi <= lo) 1L else hi - lo + 1
    }
    private def keysBounded(keys: Seq[Col]): Boolean =
      keys.foldLeft(1L) { (acc, c) =>
        val k = cardEst(c)
        if (acc > MaxRows / math.max(k, 1L)) Long.MaxValue else acc * k
      } <= MaxRows / 4

    private def baseSchema(b: String): Seq[Col] =
      if (b == "ev") evSchema else liSchema

    private def aggOutMeta(s: Seq[Col], a: Agg): Col = a.func match {
      case "cnt" | "cntd" => (a.out, 'L', (0L, MaxRows))
      case "sum" =>
        val hi = s.find(_._1 == a.c).map(_._3._2).getOrElse(0L)
        (a.out, 'L', (0L, math.min(Long.MaxValue / 4, hi * MaxRows)))
      case _ => // min/max inherit the source's type and range
        val src = s.find(_._1 == a.c).get
        (a.out, src._2, src._3)
    }

    private def mkAggs(s: Seq[Col], keys: Seq[Col]): Seq[Agg] = {
      val nonKey = s.filterNot(c => keys.exists(_._1 == c._1))
      val out = Seq.newBuilder[Agg]
      out += Agg("cnt", "", fresh("n"))
      (0 until rnd.nextInt(3)).foreach { _ =>
        if (nonKey.nonEmpty) {
          val c = nonKey(rnd.nextInt(nonKey.size))
          val cands =
            if (c._2 == 'S') Seq("min", "max", "cntd")
            else if (c._3._2 > SumSafeHi) Seq("min", "max", "cntd")
            else Seq("sum", "min", "max", "cntd")
          out += Agg(cands(rnd.nextInt(cands.size)), c._1, fresh("a"))
        }
      }
      out.result()
    }

    private def derive(s: Seq[Col]): (String, Derive, (Long, Long)) = {
      val ls = s.filter(_._2 == 'L')
      val ss = s.filter(_._2 == 'S')
      val name = fresh("d")
      if (ls.isEmpty || (ss.nonEmpty && rnd.nextInt(3) == 0))
        (name, StrLen(ss(rnd.nextInt(ss.size))._1), (0L, 64L))
      else if (rnd.nextBoolean()) {
        val k = 2L + rnd.nextInt(200)
        (name, Mod(ls(rnd.nextInt(ls.size))._1, k), (0L, k))
      } else {
        val c = ls(rnd.nextInt(ls.size))
        val k = rnd.nextInt(10000).toLong - 5000
        (name, Plus(c._1, k), (c._3._1 + math.min(k, 0), c._3._2 + math.max(k, 0)))
      }
    }

    def pred(s: Seq[Col], depth: Int): Pred = {
      if (depth > 0 && rnd.nextInt(3) == 0) {
        val (a, b) = (pred(s, depth - 1), pred(s, depth - 1))
        if (rnd.nextBoolean()) AndP(a, b) else OrP(a, b)
      } else {
        val c = s(rnd.nextInt(s.size))
        if (c._2 == 'S') {
          val vs = strValues.getOrElse(c._1,
            if (c._1.startsWith("__c")) Seq("hi", "lo") else Seq("click", "A", "O", "x"))
          if (rnd.nextBoolean()) StrEq(c._1, vs(rnd.nextInt(vs.size)), rnd.nextBoolean())
          else StrIn(c._1, rnd.shuffle(vs).take(1 + rnd.nextInt(vs.size)))
        } else {
          val (lo, hi) = c._3
          val lit = lo + (if (hi > lo) math.abs(rnd.nextLong() % (hi - lo)) else 0L)
          Cmp(c._1, Seq("<", "<=", ">", ">=", "=", "<>")(rnd.nextInt(6)), lit)
        }
      }
    }

    def plan(): PlanSpec = {
      val base = if (rnd.nextBoolean()) "ev" else "li"
      var schema = baseSchema(base)
      val stages = Seq.newBuilder[Stage]
      // ~1 in 4 plans starts with a self set-op over two filtered slices:
      // UNION ALL (bag, full schema), or INTERSECT / EXCEPT projected
      // onto low-cardinality columns so duplicate rows exist and the
      // set-ops' implicit dedup is actually exercised
      if (rnd.nextInt(4) == 0) {
        rnd.nextInt(4) match {
          case k @ (0 | 1) =>
            val lowCard = schema.filter(c =>
              (c._3._2 - c._3._1) < 1024 || c._2 == 'S')
            val cols = rnd.shuffle(lowCard).take(1 + rnd.nextInt(2))
            if (cols.nonEmpty) {
              val (p1, p2) = (pred(cols, 1), pred(cols, 1))
              stages += SetSelfSt(if (k == 0) "intersect" else "except",
                cols.map(_._1), p1, p2)
              schema = cols
            }
          case _ =>
            stages += UnionSelfSt(pred(schema, 1), pred(schema, 1))
        }
      }
      var nStages = 1 + rnd.nextInt(4)
      var joined = false
      var boundedSinceJoin = true
      while (nStages > 0) {
        nStages -= 1
        rnd.nextInt(6) match {
          case 0 | 1 => stages += FilterSt(pred(schema, rnd.nextInt(3)))
          case 2 =>
            if (rnd.nextInt(4) == 0 && schema.exists(_._2 == 'L')) {
              // CASE derive: a new low-cardinality string column
              val ls = schema.filter(_._2 == 'L')
              val c = ls(rnd.nextInt(ls.size))
              val k = c._3._1 + (c._3._2 - c._3._1) / 2
              val name = fresh("c")
              stages += CaseSt(name, c._1, k)
              schema = schema :+ ((name, 'S', (0L, 0L)))
            } else {
              val (name, d, range) = derive(schema)
              stages += DeriveSt(name, d)
              schema = schema :+ ((name, 'L', range))
            }
          case 3 if !joined && schema.exists(_._2 == 'L') =>
            val rb = if (rnd.nextBoolean()) "ev" else "li"
            var rSchema = baseSchema(rb)
            val rStages = Seq.newBuilder[Stage]
            if (rnd.nextBoolean()) rStages += FilterSt(pred(rSchema, rnd.nextInt(2)))
            if (rnd.nextBoolean()) { // aggregate the right side (bounds fan-out)
              val keys = rnd.shuffle(rSchema).take(1 + rnd.nextInt(2))
              val aggs = mkAggs(rSchema, keys)
              rStages += AggSt(keys.map(_._1), aggs)
              rSchema = keys ++ aggs.map(a => aggOutMeta(rSchema, a))
            }
            val lks = schema.filter(_._2 == 'L')
            val rks = rSchema.filter(_._2 == 'L')
            val lk = lks(rnd.nextInt(lks.size))._1
            val rk = rks(rnd.nextInt(rks.size))._1
            val m = Seq(499L, 997L, 1499L)(rnd.nextInt(3))
            val how = rnd.nextInt(6) match {
              case 0 => "left"
              case 1 => "semi"
              case 2 => "anti"
              case _ => "inner"
            }
            stages += JoinSt(rb, rStages.result(), lk, rk, m, how)
            joined = true
            if (how == "semi" || how == "anti") {
              // schema unchanged, output ⊆ left — no fan-out to bound
            } else {
              schema = schema ++ rSchema.map { case (n, t, r) => (s"${n}_r", t, r) }
              boundedSinceJoin = false
            }
          case 3 | 4 =>
            // 0 keys = GLOBAL aggregate (one row even on empty input —
            // its own differential surface)
            val keys = rnd.shuffle(schema).take(rnd.nextInt(3))
            val aggs = mkAggs(schema, keys)
            stages += AggSt(keys.map(_._1), aggs)
            schema = keys ++ aggs.map(a => aggOutMeta(schema, a))
            // a near-unique key (tsus) keeps ~every row: only a genuinely
            // low-cardinality key set closes a join's fan-out
            boundedSinceJoin = boundedSinceJoin || keysBounded(keys)
          case 5 =>
            if (rnd.nextBoolean() && schema.size >= 2) {
              val cols = rnd.shuffle(schema).take(1 + rnd.nextInt(2))
              stages += DistinctSt(cols.map(_._1))
              schema = cols
              boundedSinceJoin = boundedSinceJoin || keysBounded(cols)
            } else {
              val part = rnd.shuffle(schema).head._1
              val out = fresh("w")
              val sumCands = schema.filter(c => c._2 == 'L' && c._3._2 <= SumSafeHi)
              val lCands = schema.filter(_._2 == 'L')
              rnd.nextInt(4) match {
                case 0 if sumCands.nonEmpty =>
                  val c = sumCands(rnd.nextInt(sumCands.size))
                  stages += WinSt(part, "sum", c._1, out)
                  schema = schema :+
                    ((out, 'L', (0L, math.min(Long.MaxValue / 4, c._3._2 * MaxRows))))
                case 1 if lCands.nonEmpty =>
                  // rank() is deterministic under ties (ties share a rank),
                  // unlike row_number — safe to hash-compare
                  val c = lCands(rnd.nextInt(lCands.size))
                  stages += WinSt(part, "rank", c._1, out)
                  schema = schema :+ ((out, 'L', (0L, MaxRows)))
                case 2 if !joined && sumCands.nonEmpty =>
                  // running sum with a RANGE frame: peers (ties) are all
                  // included, so it's tie-deterministic — unlike a ROWS
                  // frame. Pre-join only: every column is provably
                  // non-null there, sidestepping the engines' divergent
                  // null-ordering inside RANGE frames.
                  val c = sumCands(rnd.nextInt(sumCands.size))
                  stages += WinSt(part, "rsum", c._1, out)
                  schema = schema :+
                    ((out, 'L', (0L, math.min(Long.MaxValue / 4, c._3._2 * MaxRows))))
                case _ =>
                  stages += WinSt(part, "cnt", "", out)
                  schema = schema :+ ((out, 'L', (0L, MaxRows)))
              }
            }
        }
      }
      // fan-out bound: a join not followed by a BOUNDING aggregate/distinct
      // could surface ~|L|·|R|/m rows; close with a rollup on a
      // low-cardinality key (global if none qualifies — a near-unique
      // closing key would keep the fan-out)
      if (joined && !boundedSinceJoin) {
        val cands = schema.filter(c => cardEst(c) <= 1024L)
        val keys =
          if (cands.isEmpty) Seq.empty
          else Seq(cands(rnd.nextInt(cands.size)))
        stages += AggSt(keys.map(_._1), Seq(Agg("cnt", "", fresh("n"))))
      }
      PlanSpec(base, stages.result())
    }
  }

  // --------------------------------------------------------- Spark rendering

  private def sparkPred(p: Pred): Column = p match {
    case Cmp(c, "<", l) => col(c) < l
    case Cmp(c, "<=", l) => col(c) <= l
    case Cmp(c, ">", l) => col(c) > l
    case Cmp(c, ">=", l) => col(c) >= l
    case Cmp(c, "=", l) => col(c) === l
    case Cmp(c, "<>", l) => col(c) =!= l
    case Cmp(_, op, _) => throw new IllegalArgumentException(op)
    case StrEq(c, v, false) => col(c) === v
    case StrEq(c, v, true) => col(c) =!= v
    case StrIn(c, vs) => col(c).isin(vs: _*)
    case AndP(a, b) => sparkPred(a) && sparkPred(b)
    case OrP(a, b) => sparkPred(a) || sparkPred(b)
  }

  private def sparkDerive(d: Derive): Column = d match {
    case Mod(c, k) => col(c) % k
    case Plus(c, k) => col(c) + k
    case StrLen(c) => length(col(c)).cast("long")
  }

  private def sparkAgg(a: Agg): Column = a.func match {
    case "cnt" => count(lit(1)).as(a.out)
    case "sum" => sum(col(a.c)).as(a.out)
    case "min" => min(col(a.c)).as(a.out)
    case "max" => max(col(a.c)).as(a.out)
    case "cntd" => countDistinct(col(a.c)).as(a.out)
  }

  private def sparkPlan(p: PlanSpec): DataFrame = {
    val base = if (p.base == "ev") evBase else liBase
    p.stages.foldLeft(base) { (df, st) => st match {
      case FilterSt(pr) => df.filter(sparkPred(pr))
      case DeriveSt(n, d) => df.withColumn(n, sparkDerive(d))
      case AggSt(keys, aggs) =>
        df.groupBy(keys.map(col): _*).agg(sparkAgg(aggs.head), aggs.tail.map(sparkAgg): _*)
      case WinSt(part, "cnt", _, out) =>
        df.withColumn(out, count(lit(1)).over(Window.partitionBy(col(part))))
      case WinSt(part, "rank", c, out) =>
        df.withColumn(out, rank().over(
          Window.partitionBy(col(part)).orderBy(col(c))).cast("long"))
      case WinSt(part, "rsum", c, out) =>
        df.withColumn(out, sum(col(c)).over(
          Window.partitionBy(col(part)).orderBy(col(c))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)))
      case WinSt(part, _, c, out) =>
        df.withColumn(out, sum(col(c)).over(Window.partitionBy(col(part))))
      case DistinctSt(cols0) => df.select(cols0.map(col): _*).distinct()
      case UnionSelfSt(p1, p2) =>
        df.filter(sparkPred(p1)).unionAll(df.filter(sparkPred(p2)))
      case SetSelfSt(op, cols, p1, p2) =>
        val proj = df.select(cols.map(col): _*)
        val (a, b) = (proj.filter(sparkPred(p1)), proj.filter(sparkPred(p2)))
        if (op == "intersect") a.intersect(b) else a.except(b)
      case CaseSt(n, c, k) =>
        df.withColumn(n, when(col(c) > k, lit("hi")).otherwise(lit("lo")))
      case JoinSt(rb, rStages, lk, rk, m, how)
          if how == "semi" || how == "anti" =>
        // keys are non-null here (base columns or total derives), so
        // left_anti vs NOT EXISTS null-semantics cannot diverge silently
        val right0 = sparkPlan(PlanSpec(rb, rStages))
        val right = right0.select((col(rk) % m).as("__jkr"))
        df.withColumn("__jkl", col(lk) % m)
          .join(right, col("__jkl") === col("__jkr"),
            if (how == "semi") "left_semi" else "left_anti")
          .drop("__jkl")
      case JoinSt(rb, rStages, lk, rk, m, how) =>
        val right0 = sparkPlan(PlanSpec(rb, rStages))
        val right = right0.select(right0.columns.toSeq.map(c =>
          col(c).as(s"${c}_r")): _*)
        df.withColumn("__jkl", col(lk) % m)
          .join(right.withColumn("__jkr", col(s"${rk}_r") % m),
            col("__jkl") === col("__jkr"),
            if (how == "left") "left_outer" else "inner")
          .drop("__jkl", "__jkr")
    }}
  }

  // -------------------------------------------------------- DuckDB rendering

  private def sqlPred(p: Pred): String = p match {
    case Cmp(c, op, l) => s"$c $op $l"
    case StrEq(c, v, neg) => s"$c ${if (neg) "<>" else "="} '$v'"
    case StrIn(c, vs) => s"$c IN (${vs.map(v => s"'$v'").mkString(", ")})"
    case AndP(a, b) => s"(${sqlPred(a)} AND ${sqlPred(b)})"
    case OrP(a, b) => s"(${sqlPred(a)} OR ${sqlPred(b)})"
  }

  private def sqlDerive(d: Derive): String = d match {
    case Mod(c, k) => s"$c % $k"
    case Plus(c, k) => s"$c + $k"
    case StrLen(c) => s"CAST(length($c) AS BIGINT)"
  }

  private def sqlAgg(a: Agg): String = a.func match {
    case "cnt" => s"count(*) AS ${a.out}"
    case "sum" => s"CAST(sum(${a.c}) AS BIGINT) AS ${a.out}"
    case "min" => s"min(${a.c}) AS ${a.out}"
    case "max" => s"max(${a.c}) AS ${a.out}"
    case "cntd" => s"count(DISTINCT ${a.c}) AS ${a.out}"
  }

  private def sqlPlan(p: PlanSpec): String = {
    var i = 0
    def t(): String = { i += 1; s"t$i" }
    p.stages.foldLeft(s"SELECT * FROM ${p.base}") { (prev, st) => st match {
      case FilterSt(pr) => s"SELECT * FROM ($prev) ${t()} WHERE ${sqlPred(pr)}"
      case DeriveSt(n, d) => s"SELECT *, ${sqlDerive(d)} AS $n FROM ($prev) ${t()}"
      case AggSt(keys, aggs) =>
        val groupBy = if (keys.isEmpty) "" else s" GROUP BY ${keys.mkString(", ")}"
        s"SELECT ${(keys ++ aggs.map(sqlAgg)).mkString(", ")} FROM ($prev) ${t()}" +
          groupBy
      case WinSt(part, "cnt", _, out) =>
        s"SELECT *, CAST(count(*) OVER (PARTITION BY $part) AS BIGINT) AS $out " +
          s"FROM ($prev) ${t()}"
      case WinSt(part, "rank", c, out) =>
        // NULLS FIRST explicitly: Spark's asc default — DuckDB defaults to
        // NULLS LAST, a silent divergence on nullable left-join columns
        s"SELECT *, CAST(rank() OVER (PARTITION BY $part ORDER BY $c NULLS FIRST) " +
          s"AS BIGINT) AS $out FROM ($prev) ${t()}"
      case WinSt(part, "rsum", c, out) =>
        s"SELECT *, CAST(sum($c) OVER (PARTITION BY $part ORDER BY $c " +
          s"RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) " +
          s"AS $out FROM ($prev) ${t()}"
      case WinSt(part, _, c, out) =>
        s"SELECT *, CAST(sum($c) OVER (PARTITION BY $part) AS BIGINT) AS $out " +
          s"FROM ($prev) ${t()}"
      case DistinctSt(cols0) =>
        s"SELECT DISTINCT ${cols0.mkString(", ")} FROM ($prev) ${t()}"
      case UnionSelfSt(p1, p2) =>
        s"SELECT * FROM ($prev) ${t()} WHERE ${sqlPred(p1)} UNION ALL " +
          s"SELECT * FROM ($prev) ${t()} WHERE ${sqlPred(p2)}"
      case SetSelfSt(op, cols, p1, p2) =>
        val kw = if (op == "intersect") "INTERSECT" else "EXCEPT"
        val cl = cols.mkString(", ")
        s"SELECT $cl FROM ($prev) ${t()} WHERE ${sqlPred(p1)} $kw " +
          s"SELECT $cl FROM ($prev) ${t()} WHERE ${sqlPred(p2)}"
      case CaseSt(n, c, k) =>
        s"SELECT *, CASE WHEN $c > $k THEN 'hi' ELSE 'lo' END AS $n " +
          s"FROM ($prev) ${t()}"
      case JoinSt(rb, rStages, lk, rk, m, how)
          if how == "semi" || how == "anti" =>
        val rightSql = sqlPlan(PlanSpec(rb, rStages))
        val kw = if (how == "anti") "NOT EXISTS" else "EXISTS"
        s"SELECT * FROM ($prev) lt WHERE $kw (SELECT 1 FROM ($rightSql) rt " +
          s"WHERE lt.$lk % $m = rt.$rk % $m)"
      case JoinSt(rb, rStages, lk, rk, m, how) =>
        val rightSql = sqlPlan(PlanSpec(rb, rStages))
        // right columns suffixed _r BEFORE the join so names never collide
        val rCols = "SELECT " + rightColNames(rb, rStages)
          .map(c => s"$c AS ${c}_r").mkString(", ") + s" FROM ($rightSql) rr"
        val joinKw = if (how == "left") "LEFT JOIN" else "JOIN"
        s"SELECT lt.*, rt.* FROM ($prev) lt $joinKw ($rCols) rt " +
          s"ON lt.$lk % $m = rt.${rk}_r % $m"
    }}
  }

  /** Column names a sub-pipeline ends with (needed to alias the join's
    * right side) — replayed from the stages, no execution. */
  private def rightColNames(base: String, stages: Seq[Stage]): Seq[String] = {
    var cols = (if (base == "ev") evSchema else liSchema).map(_._1)
    stages.foreach {
      case DeriveSt(n, _) => cols = cols :+ n
      case CaseSt(n, _, _) => cols = cols :+ n
      case AggSt(keys, aggs) => cols = keys ++ aggs.map(_.out)
      case WinSt(_, _, _, out) => cols = cols :+ out
      case DistinctSt(cs) => cols = cs
      case _ => ()
    }
    cols
  }

  // ------------------------------------------------------- the differential

  private val Sep = "\u001f"
  private val NullCell = "\u0000"

  private def canonical(df: DataFrame, tag: String): (String, Seq[String]) = {
    val names = df.columns.toSeq
    val order = names.indices.sortBy(names)
    val rows = df.collect()
    require(rows.length <= MaxRows, s"fuzz plan $tag surfaced ${rows.length} " +
      "rows — generator bound bug")
    val lines = rows.map { r =>
      order.map { i =>
        if (r.isNullAt(i)) NullCell
        else r.get(i) match {
          case l: Long => l.toString
          case n: Int => n.toString
          case s: String => s
          case b: Boolean => if (b) "true" else "false"
          case other => throw new AssertionError(
            s"fuzz plans must emit only BIGINT/VARCHAR, got ${other.getClass}")
        }
      }.mkString(Sep)
    }.sorted.toSeq
    (names.sorted.mkString("\t"), lines)
  }

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => " "
      case c => c.toString
    }

  /** Returns (failures, non-empty-result count) — the caller asserts the
    * corpus is non-trivial, or a generator drift to all-empty predicates
    * would green-wash every compare. */
  private def runDifferential(plans: Seq[(String, PlanSpec)]): (Seq[String], Int) = {
    val sqls = plans.map { case (n, p) => n -> sqlPlan(p) }
    val workDir = java.nio.file.Files.createTempDirectory("graft-fuzz")
    val qjson = workDir.resolve("queries.json")
    java.nio.file.Files.writeString(qjson,
      sqls.map { case (n, s) => s""""$n": "${jsonEscape(s)}"""" }
        .mkString("{", ",\n", "}"))
    val outDir = workDir.resolve("duck")
    val log = new StringBuilder
    val rc = scala.sys.process.Process(
      Seq("python3", "/root/repo/tools/fuzz_oracle.py", SfDir,
        qjson.toString, outDir.toString)) ! scala.sys.process.ProcessLogger(
      l => log.append(l).append('\n'), l => log.append(l).append('\n'))
    require(rc == 0, s"fuzz_oracle.py failed:\n$log")

    val failures = Seq.newBuilder[String]
    var nonEmpty = 0
    plans.foreach { case (name, p) =>
      import scala.jdk.CollectionConverters._
      val duckLines = java.nio.file.Files.readAllLines(
        outDir.resolve(s"$name.txt")).asScala.toSeq
      if (duckLines.headOption.exists(_.startsWith("ERROR")))
        failures += s"$name: DuckDB error ${duckLines.head}\nSQL: ${sqlPlan(p)}"
      else {
        val duckHeader = duckLines.headOption.getOrElse("")
        val duckRows = duckLines.drop(1)
        val (sparkHeader, sparkRows) = canonical(sparkPlan(p), name)
        if (sparkRows.nonEmpty) nonEmpty += 1
        if (sparkHeader != duckHeader)
          failures += s"$name: column sets differ — spark[$sparkHeader] vs " +
            s"duck[$duckHeader]\nSQL: ${sqlPlan(p)}"
        else if (sparkRows != duckRows) {
          val firstDiff = sparkRows.zipAll(duckRows, "<missing>", "<missing>")
            .find(p2 => p2._1 != p2._2)
          failures += s"$name: ${sparkRows.size} spark rows vs " +
            s"${duckRows.size} duck rows; first diff $firstDiff\n" +
            s"SQL: ${sqlPlan(p)}\nAST: $p"
        }
      }
    }
    (failures.result(), nonEmpty)
  }

  /** Every stage in a plan, join sub-pipelines included — feeds the
    * shape-coverage require (a generator drift that makes a shape
    * unreachable would green-wash its differential silently). */
  private def allStages(p: PlanSpec): Seq[Stage] =
    p.stages.flatMap {
      case j @ JoinSt(rb, rStages, _, _, _, _) =>
        j +: allStages(PlanSpec(rb, rStages))
      case st => Seq(st)
    }

  private def requireShapeCoverage(plans: Seq[(String, PlanSpec)]): Unit = {
    val stages = plans.flatMap(p => allStages(p._2))
    val shape: Stage => String = {
      case JoinSt(_, _, _, _, _, how) => s"join_$how"
      case SetSelfSt(op, _, _, _) => op
      case _: UnionSelfSt => "union_all"
      case _: AggSt => "agg"
      case WinSt(_, f, _, _) => s"window_$f"
      case _: FilterSt => "filter"
      case _: DeriveSt => "derive"
      case _: DistinctSt => "distinct"
      case _: CaseSt => "case"
    }
    val counts = stages.groupBy(shape).view.mapValues(_.size).toMap
    val want = Seq("join_inner", "join_left", "join_semi", "join_anti",
      "intersect", "except", "union_all", "agg", "window_sum",
      "window_rank", "window_rsum", "window_cnt", "filter",
      "derive", "distinct", "case")
    val missing = want.filterNot(counts.getOrElse(_, 0) > 0)
    require(missing.isEmpty,
      s"fuzz corpus no longer exercises: ${missing.mkString(", ")} — $counts")
  }

  test(s"$N random plans match DuckDB exactly (seed=$Seed)") {
    val gen = new Gen(new scala.util.Random(Seed))
    val plans = (0 until N).map(i => f"q$i%03d" -> gen.plan())
    requireShapeCoverage(plans)
    val (fs, nonEmpty) = runDifferential(plans)
    assert(fs.isEmpty,
      s"${fs.size}/$N plans diverged (seed=$Seed):\n${fs.take(3).mkString("\n---\n")}")
    assert(nonEmpty >= N / 5,
      s"only $nonEmpty/$N plans returned rows — the corpus is too trivial to trust")
  }

  test("second seed: another fuzz round with the window/join mix shifted") {
    val gen = new Gen(new scala.util.Random(Seed + 1))
    val plans = (0 until math.max(20, N / 4)).map(i => f"s$i%03d" -> gen.plan())
    val (fs, nonEmpty) = runDifferential(plans)
    assert(fs.isEmpty, s"${fs.size} plans diverged (seed=${Seed + 1}):\n" +
      fs.take(3).mkString("\n---\n"))
    assert(nonEmpty >= plans.size / 5,
      s"only $nonEmpty/${plans.size} plans returned rows — corpus too trivial")
  }
}
