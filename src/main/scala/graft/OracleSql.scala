package graft

/** DuckDB oracle SQL for each SQL-expressible query in [[SparkEntry.queries]].
  * The driver runs these at sf0.01 and hash-compares against the Spark
  * results (sorted rows, columns sorted by name) — so every aggregate /
  * computed column is aliased to the same name on both sides, and every
  * nondeterministic edge (float summation order, exact-percentile
  * interpolation) is rounded below the comparison grain on both sides.
  *
  * Queries intentionally absent (weaker rows-only check):
  *  - q_approx_quant / q_approx_unique / q_sample_any: approximate or
  *    any-n semantics, not hash-stable across engines;
  *  - q_simhash / q_lsh_ann / q_embed_neardup: xxhash64-derived (Spark's
  *    hash, no DuckDB equivalent) — covered by ScalaTest instead;
  *  - q_mm_decode: stub-codec dims derive from JVM Arrays.hashCode —
  *    covered by ScalaTest instead.
  */
object OracleSql {
  val all: Map[String, String] = Map()
}
