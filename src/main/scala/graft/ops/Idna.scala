package graft.ops

/** IDNA host normalization — punycode (RFC 3492) plus the host-label
  * mapping that feeds [[Psl]] and [[DomainCap]]: the published public
  * suffix list ships punycode labels, so internationalized hostnames
  * must reach the matcher in ASCII form or they silently mis-group
  * for domain caps, host PageRank, and registrable-domain joins (the
  * round-12 verdict's finding #3).
  *
  * Scope, declared: the label mapping here is lowercase (ROOT locale)
  * + Unicode NFC before punycode — the UTS #46 subset that covers
  * real-world hostnames; the full IDNA2008 disallowed/deviation
  * tables are out of scope (a host that only differs under those
  * tables still groups consistently, which is what the corpus ops
  * need). Pure deterministic algorithm, oracle-replayable.
  *
  * Pinned in IdnaSpec against RFC 3492 §7.1 sample vectors and
  * cross-pinned against `java.net.IDN` — the JDK's independent
  * implementation (the java.text.Normalizer / Deflater precedent).
  */
object Idna {

  // RFC 3492 parameters
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(delta0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) delta0 / Damp else delta0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + ((Base - TMin + 1) * delta) / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  private def digitValue(c: Int): Int =
    if (c >= 'a' && c <= 'z') c - 'a'
    else if (c >= 'A' && c <= 'Z') c - 'A'
    else if (c >= '0' && c <= '9') c - '0' + 26
    else -1

  /** RFC 3492 §6.3 encode of one label (no `xn--` prefix). None on
    * overflow (the spec's mandated failure on crafted input). */
  def punycodeEncode(label: String): Option[String] = {
    val cps = label.codePoints().toArray
    val out = new java.lang.StringBuilder()
    cps.foreach(c => if (c < 0x80) out.append(c.toChar))
    val b = out.length()
    var h = b
    if (b > 0 && b < cps.length) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      if (m - n > (Int.MaxValue - delta) / (h + 1)) return None // overflow
      delta += (m - n) * (h + 1)
      n = m
      var i = 0
      while (i < cps.length) {
        val c = cps(i)
        if (c < n) {
          delta += 1
          if (delta == Int.MaxValue) return None
        }
        if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
        i += 1
      }
      delta += 1
      n += 1
    }
    Some(out.toString)
  }

  /** RFC 3492 §6.2 decode of one label (no `xn--` prefix). None on
    * bad digits, overflow, or unexpected basic code points. */
  def punycodeDecode(label: String): Option[String] = {
    val in = label.codePoints().toArray
    val lastDelim = label.lastIndexOf('-')
    val out = new java.util.ArrayList[Integer]()
    var p = 0
    if (lastDelim > 0) {
      while (p < lastDelim) {
        if (in(p) >= 0x80) return None
        out.add(in(p))
        p += 1
      }
      p = lastDelim + 1
    }
    var n = InitialN
    var i = 0
    var bias = InitialBias
    while (p < in.length) {
      val oldi = i
      var w = 1
      var k = Base
      var done = false
      while (!done) {
        if (p >= in.length) return None
        val d = digitValue(in(p))
        p += 1
        if (d < 0) return None
        if (d > (Int.MaxValue - i) / w) return None // overflow
        i += d * w
        val t = if (k <= bias) TMin else if (k >= bias + TMax) TMax else k - bias
        if (d < t) done = true
        else {
          if (w > Int.MaxValue / (Base - t)) return None
          w *= Base - t
          k += Base
        }
      }
      val count = out.size() + 1
      bias = adapt(i - oldi, count, oldi == 0)
      if (i / count > Int.MaxValue - n) return None
      n += i / count
      i %= count
      if (n < 0x80 || !Character.isValidCodePoint(n)) return None
      out.add(i, n)
      i += 1
    }
    val sb = new java.lang.StringBuilder()
    out.forEach(cp => sb.appendCodePoint(cp))
    Some(sb.toString)
  }

  private def mapLabel(label: String): String =
    java.text.Normalizer.normalize(
      label.toLowerCase(java.util.Locale.ROOT), java.text.Normalizer.Form.NFC)

  /** Host → ASCII (ACE) form: per label, lowercase + NFC, then
    * `xn--` + punycode for non-ASCII labels; ASCII labels (including
    * existing `xn--`) pass through. None on empty labels, labels
    * that exceed the 63-octet LDH bound after encoding, or punycode
    * overflow. A single trailing root dot is preserved semantics-
    * free by the CALLER ([[Psl.normalize]] strips it first). */
  def toAscii(host: String): Option[String] = {
    if (host == null || host.isEmpty) return None
    val labels = host.split('.')
    if (labels.isEmpty || labels.exists(_.isEmpty)) return None
    val out = new Array[String](labels.length)
    var i = 0
    while (i < labels.length) {
      val m = mapLabel(labels(i))
      val enc =
        if (m.forall(_ < 0x80)) m
        else punycodeEncode(m) match {
          case Some(p) => "xn--" + p
          case None => return None
        }
      if (enc.isEmpty || enc.length > 63) return None
      out(i) = enc
      i += 1
    }
    Some(out.mkString("."))
  }

  /** Host → display (Unicode) form: decode `xn--` labels; labels
    * that fail to decode stay as-is (the browser convention). */
  def toUnicode(host: String): String =
    if (host == null) null
    else host.split('.').map { l =>
      val low = l.toLowerCase(java.util.Locale.ROOT)
      if (low.startsWith("xn--"))
        punycodeDecode(low.substring(4)).getOrElse(l)
      else l
    }.mkString(".")
}
