package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types
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
    * min/max carrying the DECLARED data type `dt` (NULL = not
    * recorded), `nullCount`/`numRecords` optional (only
    * IsNull/IsNotNull use them). `dt` gates which literals a
    * comparison may compile against — see [[family]]. */
  final case class ColStats(lo: Column, hi: Column, dt: types.DataType,
      nullCount: Option[Column] = None, numRecords: Option[Column] = None)

  /** The totally-ordered coercion family of a stats/literal type.
    * A comparison compiles ONLY when the literal's family equals the
    * stats column's — Catalyst's implicit cross-family coercions
    * otherwise make the file-level bounds check inconsistent with row
    * semantics (an int column's numeric bounds compared
    * lexicographically under a LIKE prefix, or a string column's
    * lexicographic bounds compared numerically: file {"10","9"} has
    * hi "9" → 9 < 10 → pruned despite the matching "10" row). WITHIN
    * a family every coercion Spark picks is order-preserving widening
    * (byte→long, int→decimal, decimal precision growth), so bounds
    * stay bounds. Floats/doubles never reach here — both skippers
    * exclude them from stats (NaN conventions). */
  private def family(dt: types.DataType): Option[Int] = dt match {
    case types.ByteType | types.ShortType | types.IntegerType |
         types.LongType | (_: types.DecimalType) => Some(1) // numeric, exact
    case types.StringType => Some(2)
    case types.BooleanType => Some(3)
    case types.DateType => Some(4)
    case types.TimestampType => Some(5)
    case types.TimestampNTZType => Some(6)
    case _ => None
  }

  private def familyOk(st: ColStats, lits: Seq[Literal]): Boolean =
    family(st.dt) match {
      case None => false
      case f => lits.forall(l => family(l.dataType) == f)
    }

  /** Column-built predicates arrive as UnresolvedFunction NAMES
    * ("and", "=", "<=", …) — the analyzer resolves them later, but
    * file-level reasoning happens before analysis. Normalize the
    * names this pruner understands into their concrete comparison
    * nodes; unknown names stay opaque (→ conservative keep). Parser
    * output (`expr("…")`) already carries concrete nodes. */
  def normalize(e: Expression): Expression = e.transformUp {
    // SQL `x BETWEEN a AND b` parses to the RuntimeReplaceable Between
    // node in Spark 4 — unwrap it to the comparison pair the pruner
    // reasons about (it IS the most common pruning predicate)
    case Between(input, lower, upper, _) =>
      And(GreaterThanOrEqual(input, lower), LessThanOrEqual(input, upper))
    case f: UnresolvedFunction if f.nameParts.lengthCompare(1) == 0 =>
      val n = f.nameParts.head.toLowerCase(java.util.Locale.ROOT)
      (n, f.arguments) match {
        case ("and", Seq(l, r)) => And(l, r)
        case ("between", Seq(x, lo, hi)) =>
          And(GreaterThanOrEqual(x, lo), LessThanOrEqual(x, hi))
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
    // a range test against (lo, hi): absent stats, a cross-family
    // literal (coercion would break bound semantics — see [[family]])
    // or NULL bounds keep; a NULL comparison result keeps too
    def range(name: String, lits: Seq[Literal], f: ColStats => Column): Column =
      statsOf(name) match {
        case None => lit(true)
        case Some(st) if !familyOk(st, lits) => lit(true)
        case Some(st) =>
          when(st.lo.isNull || st.hi.isNull, lit(true))
            .otherwise(coalesce(f(st), lit(true)))
      }
    // prefix reasoning is lexicographic — only sound when BOTH the
    // stats column and the pattern are strings (an int column's
    // numeric bounds under LIKE '2%' would prune a file holding 20)
    def prefixMay(name: String, v: Literal): Column =
      if (v.value == null) lit(false)
      else if (v.dataType != types.StringType) lit(true)
      else {
        val pfx = v.value.toString
        if (pfx.isEmpty) lit(true)
        else statsOf(name) match {
          case Some(st) if st.dt == types.StringType =>
            range(name, Seq(v), st =>
              substring(st.lo, 1, pfx.length) <= lit(pfx) &&
                substring(st.hi, 1, pfx.length) >= lit(pfx))
          case _ => lit(true)
        }
      }
    def may(e: Expression): Column = e match {
      case And(l, r) => may(l) && may(r)
      case Or(l, r) => may(l) || may(r)

      // a <> v can only be skipped when EVERY non-null row equals v
      // (null rows never match a comparison either way)
      case Not(EqualTo(a, v: Literal)) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, Seq(v),
          st => !(st.lo === st.hi && st.lo === litCol(v)))
      case Not(EqualTo(v: Literal, a)) if attrOf(a).isDefined =>
        may(Not(EqualTo(a, v)))

      case EqualTo(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, Seq(v),
          st => st.lo <= litCol(v) && st.hi >= litCol(v))
      case EqualTo(v: Literal, a) if attrOf(a).isDefined => may(EqualTo(a, v))

      case EqualNullSafe(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null)
          statsOf(attrOf(a).get).flatMap(_.nullCount)
            .map(nc => coalesce(nc > 0L, lit(true))).getOrElse(lit(true))
        else range(attrOf(a).get, Seq(v),
          st => st.lo <= litCol(v) && st.hi >= litCol(v))
      case EqualNullSafe(v: Literal, a) if attrOf(a).isDefined =>
        may(EqualNullSafe(a, v))

      case LessThan(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, Seq(v), st => st.lo < litCol(v))
      case LessThan(v: Literal, a) if attrOf(a).isDefined => may(GreaterThan(a, v))

      case LessThanOrEqual(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, Seq(v), st => st.lo <= litCol(v))
      case LessThanOrEqual(v: Literal, a) if attrOf(a).isDefined =>
        may(GreaterThanOrEqual(a, v))

      case GreaterThan(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, Seq(v), st => st.hi > litCol(v))
      case GreaterThan(v: Literal, a) if attrOf(a).isDefined => may(LessThan(a, v))

      case GreaterThanOrEqual(a, v: Literal) if attrOf(a).isDefined =>
        if (v.value == null) lit(false)
        else range(attrOf(a).get, Seq(v), st => st.hi >= litCol(v))
      case GreaterThanOrEqual(v: Literal, a) if attrOf(a).isDefined =>
        may(LessThanOrEqual(a, v))

      case In(a, vs) if attrOf(a).isDefined && vs.nonEmpty &&
          vs.forall(_.isInstanceOf[Literal]) =>
        val nonNull = vs.collect { case l: Literal if l.value != null => l }
        if (nonNull.isEmpty) lit(false)
        else range(attrOf(a).get, nonNull, st =>
          nonNull.map(v => st.lo <= litCol(v) && st.hi >= litCol(v)).reduce(_ || _))

      case IsNull(a) if attrOf(a).isDefined =>
        statsOf(attrOf(a).get).flatMap(_.nullCount)
          .map(nc => coalesce(nc > 0L, lit(true))).getOrElse(lit(true))
      case IsNotNull(a) if attrOf(a).isDefined =>
        statsOf(attrOf(a).get) match {
          case Some(ColStats(_, _, _, Some(nc), Some(nr))) =>
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
