package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd URL canonicalization kernel.
  *
  * The declarative instr/substr formulation (kept as
  * `TextAnalysis.normalizeUrlDeclarative`, the oracle-SQL mirror)
  * re-references each derived piece (rest, prepath, hostport, …)
  * several times, and a Column tree has no sharing — the final
  * expression duplicates the upstream chain at every reference,
  * growing multiplicatively per stage. Measured: 19 s for a 5k-row
  * projection at sf0.1, nearly all of it janino compiling the
  * megamethod. This kernel is one static call per row doing the same
  * character arithmetic in Java strings.
  *
  * Exact-equivalence contract with the declarative form (and the
  * DuckDB oracle that replays it): same find-first positions
  * (fragment '#', scheme "://", query '?', path '/', port ':'), same
  * lowercase on scheme/host only, same utm_-prefix parameter drop,
  * same lexicographic parameter sort (byte order — equal to UTF-16
  * order on the ASCII alphabet URLs use), same default-port rules
  * (http:80 / https:443), empty path → "/". Strings without "://"
  * pass through unchanged. OpsSpec cross-checks kernel ≡ declarative
  * on the edge-case set.
  */
object UrlNormalizeKernel {
  def normalize(u: String): String = {
    val hash = u.indexOf('#')
    val s1 = if (hash >= 0) u.substring(0, hash) else u
    val sp = s1.indexOf("://")
    if (sp < 0) return u
    val scheme = s1.substring(0, sp).toLowerCase(java.util.Locale.ROOT)
    val rest = s1.substring(sp + 3)
    val q = rest.indexOf('?')
    val query = if (q >= 0) rest.substring(q + 1) else ""
    val prepath = if (q >= 0) rest.substring(0, q) else rest
    val d = prepath.indexOf('/')
    val hp = if (d >= 0) prepath.substring(0, d) else prepath
    val path = if (d >= 0) prepath.substring(d) else "/"
    val c = hp.indexOf(':')
    val host0 = (if (c >= 0) hp.substring(0, c) else hp).toLowerCase(java.util.Locale.ROOT)
    // IDNA (round 13): internationalized hosts canonicalize to ACE
    // (xn--) form — the browser/crawler convention — so the unicode
    // and punycode spellings of one site dedup to one URL. ASCII
    // hosts skip the check; unconvertible hosts keep the lowercase
    // form (refuse-don't-guess, the URL may not be a hostname URL).
    val host =
      if (host0.forall(_ < 0x80)) host0
      else graft.ops.Idna.toAscii(host0).getOrElse(host0)
    val port = if (c >= 0) hp.substring(c + 1) else ""
    val keepPort = port.nonEmpty &&
      !((scheme == "http" && port == "80") || (scheme == "https" && port == "443"))
    val params = query.split("&", -1)
      .filter(p => p.nonEmpty && !p.startsWith("utm_"))
    java.util.Arrays.sort(params, java.util.Comparator.naturalOrder[String]())
    val sb = new java.lang.StringBuilder(u.length)
    sb.append(scheme).append("://").append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (params.nonEmpty) {
      sb.append('?')
      var i = 0
      while (i < params.length) {
        if (i > 0) sb.append('&')
        sb.append(params(i))
        i += 1
      }
    }
    sb.toString
  }

  def normalize(u: UTF8String): UTF8String = UTF8String.fromString(normalize(u.toString))
}

/** string → canonicalized string (codegen'd). */
case class UrlNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    UrlNormalizeKernel.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.UrlNormalizeKernel.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): UrlNormalizeExpr =
    copy(child = newChild)
  override def prettyName: String = "url_normalize"
}

object UrlNormalize {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  def apply(u: Column): Column = column(UrlNormalizeExpr(expression(u)))
}
