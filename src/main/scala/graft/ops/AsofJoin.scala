package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join — for every left row, the single most recent right
  * row with `right.ts <= left.ts` on the same key. Spark has no native
  * ASOF JOIN; the naive formulations both die at scale:
  *  - inequality join + argmax: the range join explodes to O(|L|·|R|) per
  *    key before the aggregate prunes it;
  *  - per-left-row subquery: correlated execution, unplannable.
  *
  * This is the composition-first design (brief tier (a)): tag and UNION the
  * two sides, then one window per key ordered by (ts, tag, tiebreak) carrying
  * the last non-null right payload forward — semantically the sorted
  * merge-scan an as-of join wants, expressed so Catalyst plans it as ONE
  * hash exchange on the key plus a per-partition sort. Shuffle volume is
  * |L|+|R| rows, never a pairwise product, and both inputs stay columnar
  * until the window. Right rows sort before left rows at equal ts, so the
  * match bound is inclusive (`>=`), matching DuckDB ASOF semantics.
  *
  * Left-outer semantics: unmatched left rows keep null right columns.
  * Determinism: if several right rows share (key, ts), the one with the
  * greatest `rightTiebreak` wins; pass a unique column (or pre-dedup) for a
  * total order.
  */
object AsofJoin {

  /** Backward as-of join (match at or before the left timestamp).
    *
    * @param rightPrefix prefix for right-side payload columns in the output
    *                    (right key/ts columns are not emitted)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String,
                   rightTiebreak: Option[String] = None,
                   rightPrefix: String = "r_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    val lSchema = org.apache.spark.sql.types.StructType(left.schema.fields)
    val rPayload = struct(payloadCols.map(col).toIndexedSeq: _*)
    val rPayloadSchema = org.apache.spark.sql.types.StructType(
      right.schema.fields.filter(f => payloadCols.contains(f.name)))
    // tiebreak keeps its NATIVE type (a cast-to-long would turn e.g. string
    // event ids into all-NULL and silently break the documented total order)
    val tbType = rightTiebreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.LongType: org.apache.spark.sql.types.DataType)

    val lTagged = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__tag"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(rPayloadSchema).as("__r"),
        lit(null).cast(tbType).as("__tb")): _*)
    // a right row with a NULL timestamp can never satisfy ts <= left.ts —
    // drop it up front (nulls-first ordering would otherwise carry its
    // payload into every left row's window)
    val rTagged = right.filter(col(rightTs).isNotNull).select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__tag"),
        lit(null).cast(lSchema).as("__l"),
        rPayload.as("__r"),
        rightTiebreak.map(col).getOrElse(lit(0L)).as("__tb")): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    rTagged.unionByName(lTagged)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(col("__l.*") +:
        payloadCols.toIndexedSeq.map(c => col(s"__m.$c").as(s"$rightPrefix$c")): _*)
  }
}
