package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{IntegerType, LongType, ShortType}

/** Shared call-time guards. */
private[graft] object Guards {

  /** Fail-loud integral-id check, one implementation for every operator
    * family that encodes ids/keys as Long (Curation sampling/packing,
    * Similarity ANN, Windows.ewma): a silent `cast("long")` of a
    * string/UUID column nulls every value out and dies mid-job with an
    * opaque non-nullable-field encoder error — fail at call time instead
    * and tell the caller to derive a surrogate. */
  def requireIntegralId(df: DataFrame, id: Column, what: String): Unit = {
    val dt = df.select(id).schema.head.dataType
    require(dt == LongType || dt == IntegerType || dt == ShortType,
      s"$what column must be integral (got $dt); derive a surrogate id " +
        "(e.g. xxhash64) for non-numeric keys")
  }
}
