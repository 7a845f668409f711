package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** File-level zone-map pruning, shared by the Delta stats skipper and
  * the Iceberg column-bounds skipper: given a user predicate (the
  * UNRESOLVED expression of a `Column` / `expr("…")`) and per-column
  * (min, max, null-count) statistics columns, compile a MAY-MATCH
  * predicate — TRUE when a file could still contain matching rows.
  * This is the standard min/max data-skipping rule every columnar
  * engine implements (parquet row-group stats, Delta `add.stats`,
  * Iceberg manifest `lower_bounds`/`upper_bounds`).
  *
  * Soundness contract — pruning is an OPTIMIZATION layered under a
  * row-level re-application of the same predicate, so every decision
  * here errs toward KEEP:
  *  - unsupported expression shapes evaluate to TRUE (keep);
  *  - columns without statistics evaluate to TRUE;
  *  - NULL statistics values (writer didn't record them) keep;
  *  - nondeterministic functions and subqueries disable pruning for
  *    the whole conjunct ([[unsafeForPruning]]) — a per-file sample
  *    of `rand() < 0.5` is not a per-row sample;
  *  - bounds are treated as CONSERVATIVE (lo ≤ true min, hi ≥ true
  *    max), which makes truncated Iceberg string bounds sound as-is.
  *
  * The compiled result is an ordinary Column over whatever frame
  * carries the stats columns, so the evaluation itself runs wherever
  * that frame lives — cluster-side for the Delta checkpoint merge,
  * a driver-bounded manifest frame for Iceberg.
  */
object ZoneMap {

  /** Per-column statistics surface: `lo`/`hi` are the column's
    * min/max in the file's own data type (NULL = not recorded),
    * `nullCount`/`numRecords` optional (only IsNull/IsNotNull use
    * them). */
  final case class ColStats(lo: Column, hi: Column,
      nullCount: Option[Column] = None, numRecords: Option[Column] = None)

  /** Column-built predicates arrive as UnresolvedFunction NAMES
    * ("and", "=", "<=", …) — the analyzer resolves them later, but
    * file-level reasoning happens before analysis. Normalize the
    * names this pruner understands into their concrete comparison
    * nodes; unknown names stay opaque (→ conservative keep). Parser
    * output (`expr("…")`) already carries concrete nodes. */
  def normalize(e: Expression): Expression = e.transformUp {
    case f: UnresolvedFunction if f.nameParts.lengthCompare(1) == 0 =>
      val n = f.nameParts.head.toLowerCase(java.util.Locale.ROOT)
      (n, f.arguments) match {
        case ("and", Seq(l, r)) => And(l, r)
        case ("or", Seq(l, r)) => Or(l, r)
        case ("not", Seq(c)) => Not(c)
        case ("=" | "==" | "equalto", Seq(l, r)) => EqualTo(l, r)
        case ("<=>", Seq(l, r)) => EqualNullSafe(l, r)
        case ("<", Seq(l, r)) => LessThan(l, r)
        case ("<=", Seq(l, r)) => LessThanOrEqual(l, r)
        case (">", Seq(l, r)) => GreaterThan(l, r)
        case (">=", Seq(l, r)) => GreaterThanOrEqual(l, r)
        case ("in", l +: rest) if rest.nonEmpty => In(l, rest)
        case ("isnull", Seq(c)) => IsNull(c)
        case ("isnotnull", Seq(c)) => IsNotNull(c)
        case ("startswith", Seq(l, r)) => StartsWith(l, r)
        case _ => f
      }
  }

  /** Top-level conjuncts of a predicate. */
  def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** The unresolved attribute names a predicate references. */
  def attrNames(e: Expression): Set[String] = {
    val b = Set.newBuilder[String]
    e.foreach {
      case a: UnresolvedAttribute => b += a.name
      case _ => ()
    }
    b.result()
  }

  private val nondeterministicNames = Set(
    "rand", "randn", "random", "uuid", "shuffle",
    "monotonically_increasing_id", "input_file_name")

  /** Shapes file-level reasoning cannot be sound about: a
    * nondeterministic function evaluated once per FILE is not the
    * per-ROW semantics the row filter has; subqueries are opaque. */
  def unsafeForPruning(e: Expression): Boolean = e.exists {
    case f: UnresolvedFunction =>
      nondeterministicNames(f.nameParts.last.toLowerCase(java.util.Locale.ROOT))
    case _: Nondeterministic => true // Column-built rand() arrives resolved
    case _: SubqueryExpression => true
    case _ => false
  }

  /** Compile `pred` to the may-match Column. `statsOf` resolves a
    * referenced column name to its statistics columns; None = no
    * stats for that column (everything it constrains keeps). */
  def mayMatch(pred: Expression, statsOf: String => Option[ColStats]): Column = {
    if (unsafeForPruning(pred)) return lit(true)

    def litCol(l: Literal): Column = ColumnBridge.column(l)
    def attrOf(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case _ => None
    }
    // a range test against (lo, hi): absent stats or NULL bounds keep;
    // a NULL comparison result (incomparable types after coercion)
    // keeps too
    def range(name: String, f: ColStats => Column): Column =
      statsOf(name) match {
        case None => lit(true)
        case Some(st) =>
          when(st.lo.isNull || st.hi.isNull, lit(true))
            .otherwise(coalesce(f(st), lit(true)))
      }
    def prefixMay(name: String, v: Literal): Column =
      if (v.value == null) lit(false)
      else {
        val pfx = v.value.toString
        if (pfx.isEmpty) lit(true)
        else range(name, st =>
          substring(st.lo, 1, pfx.length) <= lit(pfx) &&
            substring(st.hi, 1, pfx.length) >= lit(pfx))
      }
    def may(e: Expression): Column = e match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)

      // a <> v can only be skipped when EVERY non-null row equals v
      // (null rows never match a comparison either way)
      case Not(EqualTo(a, v: Literal)) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, st => !(st.lo === st.hi && st.lo === litCol(v)))
      case Not(EqualTo(v: Literal, a)) if attrOf(a).isDefined =>
        may(Not(EqualTo(a, v)))

      case EqualTo(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, st => st.lo <= litCol(v) && st.hi >= litCol(v))
      case EqualTo(v: Literal, a) if attrOf(a).isDefined => may(EqualTo(a, v))

      case EqualNullSafe(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null)
          statsOf(attrOf(a).get).flatMap(_.nullCount)
            .map(nc => coalesce(nc > 0L, lit(true))).getOrElse(lit(true))
        else range(attrOf(a).get, st => st.lo <= litCol(v) && st.hi >= litCol(v))
      case EqualNullSafe(v: Literal, a) if attrOf(a).isDefined =>
        may(EqualNullSafe(a, v))

      case LessThan(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, st => st.lo < litCol(v))
      case LessThan(v: Literal, a) if attrOf(a).isDefined => may(GreaterThan(a, v))

      case LessThanOrEqual(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, st => st.lo <= litCol(v))
      case LessThanOrEqual(v: Literal, a) if attrOf(a).isDefined =>
        may(GreaterThanOrEqual(a, v))

      case GreaterThan(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, st => st.hi > litCol(v))
      case GreaterThan(v: Literal, a) if attrOf(a).isDefined => may(LessThan(a, v))

      case GreaterThanOrEqual(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, st => st.hi >= litCol(v))
      case GreaterThanOrEqual(v: Literal, a) if attrOf(a).isDefined =>
        may(LessThanOrEqual(a, v))

      case In(a, vs) if attrOf(a).isDefined && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val nonNull = vs.collect { case l: Literal if l.value != null => l }
        if (nonNull.isEmpty) lit(false)
        else range(attrOf(a).get, st =>
          nonNull.map(v => st.lo <= litCol(v) && st.hi >= litCol(v)).reduce(_ || _))

      case IsNull(a) if attrOf(a).isDefined =>
        statsOf(attrOf(a).get).flatMap(_.nullCount)
          .map(nc => coalesce(nc > 0L, lit(true))).getOrElse(lit(true))
      case IsNotNull(a) if attrOf(a).isDefined =>
        statsOf(attrOf(a).get) match {
          case Some(ColStats(_, _, Some(nc), Some(nr))) =>
            coalesce(nc < nr, lit(true))
          case _ => lit(true)
        }

      // PREFIX pruning (round 17): s startsWith P iff take(s, |P|) ==
      // P, and lexicographic truncation is monotone — so the file may
      // hold a match only when take(lo,|P|) ≤ P ≤ take(hi,|P|). Sound
      // under truncated (Iceberg) bounds for the same monotonicity
      // reason. LIKE 'P%' (no other wildcards) is the same test.
      case StartsWith(a, v: Literal) if attrOf(a).isDefined =>
        prefixMay(attrOf(a).get, v)
      case Like(a, v: Literal, _) if attrOf(a).isDefined &&
          v.value != null && {
            val s = v.value.toString
            s.endsWith("%") && !s.dropRight(1).exists(c => c == '%' || c == '_' || c == '\\')
          } =>
        prefixMay(attrOf(a).get,
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(
            v.value.toString.dropRight(1)),
            org.apache.spark.sql.types.StringType))

      // a literal filter: false/null drop every row — skippable
      case l: Literal if l.dataType == org.apache.spark.sql.types.BooleanType =>
        lit(l.value == true)

      case _ => lit(true)
    }
    may(pred)
  }
}
