package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Time-series joins the reference engine has no analogue for
  * (SURVEY §2.4 joins: ABSENT beyond inner-equi): as-of join and
  * range (interval) join, both built as single-shuffle plans that
  * survive the 100 TB design point.
  *
  * Neither is expressible as a plain Spark equi-join, and the naive
  * formulations are disasters at scale: an as-of join written as
  * `JOIN ON a.key = b.key AND b.ts <= a.ts` + "pick max" explodes to
  * O(|a|·|b|/keys) intermediate rows before aggregation, and a range
  * join written as a θ-join plans BroadcastNestedLoopJoin. The shapes
  * here keep everything key-partitioned:
  *
  *  - as-of: union both sides, ONE shuffle by key, one window pass
  *    that carries the latest right row forward onto each left row
  *    (the classic sort-merge as-of, in Catalyst terms).
  *  - range: equi-join on (key, time-bucket) where the bucket width
  *    equals the interval span, so each left row probes ≤ 2 buckets
  *    and the exact predicate filters candidates — a bounded fan-out
  *    hash join instead of a nested loop.
  */
object TemporalJoins {

  /** As-of join: for every left row, attach the single most recent
    * right row with the same key and `right.time <= left.time`
    * (or `<` when `strict`). Left rows with no preceding right row
    * keep nulls — left-outer semantics, |output| = |left|.
    *
    * Both time columns must be the same orderable type (use epoch-ms
    * longs for timestamps). `rightTieBreak` must uniquely order right
    * rows within (key, time) — determinism on a cluster is otherwise
    * impossible (SURVEY §7.3).
    *
    * Plan shape: unionByName → one hash-partition by key → one
    * window sort per partition. No join node at all; skew follows the
    * key distribution exactly like any keyed shuffle (salt upstream
    * if one key dominates).
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      rightPayload: Seq[String],
      rightTieBreak: String,
      strict: Boolean = false,
      prefix: String = "asof_"): DataFrame = {
    require(leftKeys.size == rightKeys.size && leftKeys.nonEmpty,
      "asOf: key lists must be non-empty and same arity")
    val tieT = right.schema(rightTieBreak).dataType

    // The payload travels as ONE struct so the attached row is atomic:
    // last(ignoreNulls) must never mix fields of different right rows
    // (a NULL field in the latest row stays NULL, not back-filled from
    // an older row). The struct is non-null on every right-side row —
    // even one whose fields are all NULL — so it alone marks "a right
    // row existed at/before this time".
    val payT = StructType(rightPayload.map(p => StructField(p, right.schema(p).dataType)).toArray)
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieT))
      .withColumn("__pay", lit(null).cast(payT))
    val r = right.select(
      leftKeys.zip(rightKeys).map { case (lk, rk) => col(rk).as(lk) } ++
        left.columns.filterNot(leftKeys.contains)
          .map(cn => lit(null).cast(left.schema(cn).dataType).as(cn)) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side"), col(rightTieBreak).cast(tieT).as("__tie"),
          struct(rightPayload.map(col): _*).as("__pay")): _*)

    // At equal time: inclusive ⇒ the right row sorts BEFORE the left
    // row (visible to it); strict ⇒ after (invisible). __tie makes the
    // order among equal-time right rows total, so last() is unique.
    val sideOrd: Column = if (strict) col("__side").desc else col("__side").asc
    val w = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(col("__t").asc +: sideOrd +: Seq(col("__tie").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__pay", last(col("__pay"), ignoreNulls = true).over(w))
    val out = rightPayload.foldLeft(carried) { (df, p) =>
      df.withColumn(prefix + p, col("__pay").getField(p))
    }
    out.filter(col("__side") === 1).drop("__t", "__side", "__tie", "__pay")
  }

  /** Range (interval) join: pairs (a, b) with equal keys and
    * `b.time ∈ [a.time + lowerMs, a.time + upperMs]`. Time columns are
    * epoch-ms longs. Right columns come back `prefix`ed.
    *
    * Bucket width = interval span ⇒ an interval of span w overlaps at
    * most 2 width-w buckets, so the a-side fans out ≤ 2× and the join
    * is a plain equi-join on (keys, bucket) that AQE/broadcast/SMJ
    * handle like any other. The exact range predicate runs on the
    * candidates only.
    */
  def rangeJoin(
      a: DataFrame, b: DataFrame,
      aKeys: Seq[String], bKeys: Seq[String],
      aTime: String, bTime: String,
      lowerMs: Long, upperMs: Long,
      prefix: String = "r_"): DataFrame = {
    require(upperMs >= lowerMs, "rangeJoin: upperMs must be >= lowerMs")
    require(aKeys.size == bKeys.size, "rangeJoin: key lists must have the same arity")
    val w = math.max(1L, upperMs - lowerMs)

    // Integer floor division — a double round-trip is exact only below
    // 2^53 and silently drops boundary pairs at epoch-nanos scale.
    // pmod's remainder is non-negative, so (x - pmod(x, w)) div w is
    // floor(x / w) for negative times too.
    def fbkt(x: Column): Column = call_function("div", x - pmod(x, lit(w)), lit(w))
    val aB = a.withColumn("__bkt", explode(array_distinct(array(
      fbkt(col(aTime) + lit(lowerMs)), fbkt(col(aTime) + lit(upperMs))))))
    val bR = b.select(b.columns.map(cn => col(cn).as(prefix + cn)).toSeq: _*)
      .withColumn("__bktr", fbkt(col(prefix + bTime)))

    val keyCond = aKeys.zip(bKeys).map { case (ak, bk) => col(ak) === col(prefix + bk) }
      .foldLeft(lit(true))(_ && _)
    aB.join(bR,
        keyCond && col("__bkt") === col("__bktr") &&
          col(prefix + bTime) >= col(aTime) + lit(lowerMs) &&
          col(prefix + bTime) <= col(aTime) + lit(upperMs))
      .drop("__bkt", "__bktr")
  }
}
