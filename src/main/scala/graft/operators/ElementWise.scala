package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

/** Element-wise operators: the reference's ParDo / MapElements /
  * FlatMapElements / Filter / Partition / WithKeys / ToString / Regex /
  * WithTimestamps family (reference: SDK/transforms/ParDo.java:423,
  * MapElements.java:30, FlatMapElements.java:33, Filter.java:31,
  * Partition.java:65, WithKeys.java, ToString.java:43, Regex.java,
  * WithTimestamps.java:71 — paths per SURVEY.md §2.2).
  *
  * Design: everything here is a narrow (no-shuffle) transformation expressed
  * with `org.apache.spark.sql.functions` so Catalyst keeps the whole chain
  * inside one WholeStageCodegen span and pushes filters/projections into the
  * parquet scan. Closures (`ds.map`) are offered for the typed façade but the
  * Column forms are preferred on the 100 TB path.
  */
object ElementWise {

  implicit class DataFrameOps(val df: DataFrame) extends AnyVal {

    /** MapElements: 1:1 projection (columnar form — codegen'd). */
    def mapElements(cols: Column*): DataFrame = df.select(cols: _*)

    /** Filter.by(pred). */
    def filterBy(pred: Column): DataFrame = df.filter(pred)

    /** FlatMapElements via an array-producing expression + explode.
      * 1:N without leaving codegen. */
    def flatMapElements(arrayExpr: Column, as: String): DataFrame =
      df.select(explode(arrayExpr).as(as))

    /** WithKeys.of: attach a computed key, keep the row as the value. */
    def withKeys(keyExpr: Column): DataFrame =
      df.select(keyExpr.as("key"), struct(df.columns.map(col): _*).as("value"))

    /** Keys / Values projections over a (key, value) frame. */
    def keysOnly: DataFrame   = df.select(col("key"))
    def valuesOnly: DataFrame = df.select(col("value"))

    /** KvSwap. */
    def kvSwap: DataFrame = df.select(col("value").as("key"), col("key").as("value"))

    /** Partition.of(n, fn): route each row to one of n outputs.
      * Returns the n filtered views; Catalyst collapses each to a
      * scan+filter, so downstream consumers each read only their slice.
      * (reference: SDK/transforms/Partition.java:65)
      */
    def partitionBy(n: Int, partExpr: Column): Seq[DataFrame] = {
      val tagged = df.withColumn("__part", partExpr)
      (0 until n).map(i => tagged.filter(col("__part") === i).drop("__part"))
    }

    /** WithTimestamps.of: assign/replace the event-time column. */
    def withEventTime(tsExpr: Column, as: String = "event_time"): DataFrame =
      df.withColumn(as, tsExpr)
  }

  /** Typed ParDo-ish helpers for genuine per-element logic.
    * `mapPartitions` mirrors DoFn's @Setup/@Teardown-per-bundle lifecycle
    * (reference: SDK/transforms/DoFn.java:492-595): `setup` runs once per
    * partition, like @Setup per bundle.
    */
  def parDo[T, U: Encoder](ds: Dataset[T])(setup: () => Unit)(fn: T => IterableOnce[U]): Dataset[U] =
    ds.mapPartitions { it =>
      setup()
      it.flatMap(fn(_).iterator)
    }

  /** Multi-output ParDo (reference: ParDo.MultiOutput, ParDo.java:702):
    * tag each row once, return one filtered view per tag. */
  def parDoMultiOutput(df: DataFrame, tagExpr: Column, tags: Seq[String]): Map[String, DataFrame] = {
    val tagged = df.withColumn("__tag", tagExpr)
    tags.map(t => t -> tagged.filter(col("__tag") === t).drop("__tag")).toMap
  }

  /** Regex family (reference: SDK/transforms/Regex.java — matches :51,
    * matchesKV :137, allMatches :115, find :184, findAll :248, replaceAll
    * :318, replaceFirst :342, split :365).
    * All return Column expressions to compose into selects. */
  object RegexOps {
    def matchesGroup(c: Column, pattern: String, group: Int): Column =
      regexp_extract(c, pattern, group)
    def find(c: Column, pattern: String): Column = c.rlike(pattern)
    def findAll(c: Column, pattern: String): Column = regexp_extract_all(c, lit(pattern), lit(0))
    /** allMatches with a capture group: every match's group `group`. */
    def allMatchesGroup(c: Column, pattern: String, group: Int): Column =
      regexp_extract_all(c, lit(pattern), lit(group))
    /** matchesKV (reference: Regex.java:137): extract (key, value) from two
      * capture groups of a whole-string match. */
    def matchesKV(c: Column, pattern: String, keyGroup: Int, valueGroup: Int): Column =
      struct(regexp_extract(c, pattern, keyGroup).as("key"),
             regexp_extract(c, pattern, valueGroup).as("value"))
    def replaceAll(c: Column, pattern: String, replacement: String): Column =
      regexp_replace(c, pattern, replacement)
    /** replaceFirst (reference: Regex.java:342): replace only the first
      * occurrence. Pure-Catalyst splice via regexp_instr + regexp_extract
      * (replacement is literal — no $group refs, documented narrowing). */
    def replaceFirst(c: Column, pattern: String, replacement: String): Column = {
      val pos = regexp_instr(c, lit(pattern))       // 1-based; 0 = no match
      val hit = regexp_extract(c, pattern, 0)
      when(pos === 0, c).otherwise(concat(
        substring(c, lit(1), pos - 1),
        lit(replacement),
        substr(c, pos + length(hit))))
    }
    def splitBy(c: Column, pattern: String): Column = split(c, pattern)
  }

  /** ToString.elements/kvs/iterables (reference: SDK/transforms/ToString.java). */
  object ToStringOps {
    def elements(c: Column): Column = c.cast("string")
    def kvs(k: Column, v: Column, delim: String = ","): Column =
      concat_ws(delim, k.cast("string"), v.cast("string"))
    def iterables(c: Column, delim: String = ","): Column = array_join(c, delim)
  }

  /** The jackson extension: JSON string ⇄ typed values (reference:
    * sdks/java/extensions/jackson/ParseJsons.java:48 `of(Class)`,
    * AsJsons.java:49). Beam runs an ObjectMapper per element inside a
    * MapElements; here both directions are codegen'd Catalyst expressions
    * (`from_json` / `to_json`), so parsing stays inside the scan's
    * WholeStageCodegen span. Malformed input follows Beam's strictness:
    * `parseJsons` yields null structs silently (PERMISSIVE), while
    * `parseJsonsOrDie` matches the extension's exception-on-parse-failure
    * contract (FAILFAST). */
  object JsonOps {
    def parseJsons(c: Column, schemaDdl: String): Column =
      from_json(c, org.apache.spark.sql.types.StructType.fromDDL(schemaDdl),
        Map("mode" -> "PERMISSIVE"))
    def parseJsonsOrDie(c: Column, schemaDdl: String): Column =
      from_json(c, org.apache.spark.sql.types.StructType.fromDDL(schemaDdl),
        Map("mode" -> "FAILFAST"))
    def asJsons(c: Column): Column = to_json(c)
  }
}
