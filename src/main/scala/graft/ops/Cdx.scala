package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDX index generation — the lookup sidecar crawl archives ship
  * beside their .warc.gz shards (Common Crawl's cdx / OpenWayback's
  * CDX(J) convention): one row per response record with the record's
  * EXACT gzip member (offset, length) in its shard, so a reader can
  * fetch one page with one ranged read + one member decode instead
  * of scanning the file. Built on the member-split machinery
  * ([[Warc.gzipMemberRanges]] with a 1-byte target → per-member
  * offsets), so producing the index is the same two-pass shape as
  * the split scan and file size is unbounded.
  *
  * Columns (the public CDX field set, minus the redundant ones):
  * `urlkey` (SURT), `timestamp` (WARC-Date digits, yyyyMMddhhmmss),
  * `url`, `mime` (HTTP Content-Type media type), `status`, `digest`
  * (md5 hex of the HTTP payload — declared stand-in for CC's
  * sha1-base32, same role), `length`/`offset` (the member's
  * compressed extent), `filename`.
  *
  * SURT key (documented subset of the public Sort-friendly URI
  * Reordering Transform): lowercase everything; drop the scheme and
  * a leading `www.`; reverse the host dot-parts comma-joined; drop
  * default ports (80/443), keep others as `:port`; `)` then the
  * path; query parameters sorted bytewise and re-joined with `&`;
  * fragment dropped. Schemeless strings → null (no host to key).
  */
object Cdx {

  /** SURT url key of one URL string; null when schemeless. */
  def surtKey(url: String): String = {
    if (url == null) return null
    val m = UrlRe.matcher(url)
    if (!m.matches() || m.group(2) == null || m.group(2).isEmpty) return null
    val hostPort = m.group(2).toLowerCase(java.util.Locale.ROOT)
    val (host0, port) = hostPort.indexOf(':') match {
      case -1 => (hostPort, "")
      case at =>
        val p = hostPort.substring(at + 1)
        (hostPort.substring(0, at), if (p == "80" || p == "443" || p.isEmpty) "" else ":" + p)
    }
    val host = if (host0.startsWith("www.") && host0.length > 4) host0.substring(4) else host0
    val rev = host.split('.').reverse.mkString(",")
    val rest = Option(m.group(3)).getOrElse("").toLowerCase(java.util.Locale.ROOT)
    val noFrag = rest.indexOf('#') match {
      case -1 => rest
      case at => rest.substring(0, at)
    }
    val (path, query) = noFrag.indexOf('?') match {
      case -1 => (noFrag, "")
      case at =>
        val q = noFrag.substring(at + 1)
        val sorted = q.split("&", -1).filter(_.nonEmpty).sorted.mkString("&")
        (noFrag.substring(0, at), if (sorted.isEmpty) "" else "?" + sorted)
    }
    rev + port + ")" + (if (path.isEmpty) "/" else path) + query
  }

  private val UrlRe =
    java.util.regex.Pattern.compile("^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)(.*)$")

  /** WARC-Date → 14-digit CDX timestamp (digits of the ISO instant). */
  def timestampOf(warcDate: String): String =
    if (warcDate == null) null
    else {
      val d = warcDate.filter(_.isDigit)
      if (d.length >= 14) d.substring(0, 14) else d
    }

  /** Media type of an HTTP message's Content-Type header (parameters
    * stripped), scanning only the head of the raw message bytes. */
  private def mimeOf(body: Array[Byte]): String = {
    var headEnd = -1
    var i = 0
    while (headEnd < 0 && i + 3 < body.length) {
      if (body(i) == '\r' && body(i + 1) == '\n' && body(i + 2) == '\r' && body(i + 3) == '\n')
        headEnd = i
      i += 1
    }
    if (headEnd < 0) return null
    new String(body, 0, headEnd, java.nio.charset.StandardCharsets.ISO_8859_1)
      .split("\r\n").drop(1).collectFirst {
        case line if line.toLowerCase(java.util.Locale.ROOT).startsWith("content-type:") =>
          val v = line.substring(line.indexOf(':') + 1).trim
          val semi = v.indexOf(';')
          (if (semi < 0) v else v.substring(0, semi)).trim.toLowerCase(java.util.Locale.ROOT)
      }.orNull
  }

  /** md5 hex of the HTTP payload (bytes after the header separator). */
  private def payloadDigest(body: Array[Byte]): String = {
    var headEnd = -1
    var i = 0
    while (headEnd < 0 && i + 3 < body.length) {
      if (body(i) == '\r' && body(i + 1) == '\n' && body(i + 2) == '\r' && body(i + 3) == '\n')
        headEnd = i
      i += 1
    }
    if (headEnd < 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(body, headEnd + 4, body.length - headEnd - 4)
    md.digest().map("%02x".format(_)).mkString
  }

  /** Build the CDX index for a set of .warc.gz shards: pass 1
    * streams each file once indexing PER-MEMBER offsets, pass 2 fans
    * members out as ranged reads (the [[Warc.splitRecords]] shape at
    * 1-byte coalescing), keeping response records only. Multi-record
    * members index every record at the member's extent (a ranged
    * reader still lands on all of them — the wayback property).
    * Unindexable files and undecodable members quarantine as
    * status = -1 rows. */
  def index(paths: DataFrame, pathCol: String): DataFrame = {
    val spark = paths.sparkSession
    import spark.implicits._
    val confEntries = Warc.confEntriesOf(spark)
    Warc.splitRanges(paths, pathCol, targetBytes = 1L)
      .as[(String, Long, Long)]
      .mapPartitions { rows =>
        // conf rebuilt once per PARTITION, not per member row — a
        // shard holds ~100k members and the conf has hundreds of keys
        val conf = Warc.confOf(confEntries)
        rows.flatMap { case (p, off, len) =>
          val filename = p.substring(p.lastIndexOf('/') + 1)
          def quarantine = Seq((null: String, null: String, null: String, null: String,
            -1, null: String, len, off, filename))
          if (off < 0) quarantine
          else {
            val buf = Warc.readRange(conf, p, off, len)
            GzipCodec.gunzip(buf).flatMap(Warc.parseStream) match {
              case Some(recs) => recs.filter(r => r.warcType == "response").map { r =>
                (surtKey(r.targetUri), timestampOf(r.warcDate), r.targetUri,
                  mimeOf(r.body), r.httpStatus.getOrElse(0), payloadDigest(r.body),
                  len, off, filename)
              }
              case None => quarantine
            }
          }
        }
      }
      .toDF("urlkey", "timestamp", "url", "mime", "status", "digest",
        "length", "offset", "filename")
  }
}
