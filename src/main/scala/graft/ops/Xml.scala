package graft.ops

/** Minimal from-spec XML 1.0 document parser — the shared base for
  * the XML wire formats of the crawl tier ([[Sitemap]]; RSS/Atom
  * would sit on the same seam). Reference scope: the reference
  * pipeline (`main.py`) has no XML surface; this exists because
  * crawl-discovery metadata (sitemaps, feeds) IS XML and the
  * archive-rung discipline (from the published spec, hostile bytes
  * never throw) applies unchanged.
  *
  * What is parsed, from the XML 1.0 (Fifth Edition) spec alone:
  *  - element structure with MATCHED start/end tags (§3.1 — a
  *    mismatch is a fatal well-formedness violation and yields None,
  *    the same refuse-don't-guess stance as the binary codecs),
  *    self-closing empty-element tags, attributes in either quote
  *    style (quotes REQUIRED — XML, unlike HTML);
  *  - the misc layer: XML declaration / processing instructions
  *    (§2.6), comments (§2.5, `--` inside refused as the spec
  *    demands), CDATA sections (§2.7), DOCTYPE with a bracketed
  *    internal subset (skipped as markup declarations, §2.8);
  *  - references (§4.1): the five predefined entities and decimal /
  *    hex character references; unknown entities refuse (without a
  *    DTD they are undeclared — well-formedness);
  *  - `]]>` in character data refused (§2.4).
  *
  * Namespaces are deliberately NOT resolved (prefixes stay in the
  * qname; [[Elem.local]] strips them for the common
  * match-by-local-name case) — binding-scope resolution is a layer
  * the sitemap/feed formats don't need. DTD content (external
  * subsets, parameter entities, ATTLIST defaults) is skipped, not
  * interpreted — declared.
  *
  * Caps: node count and depth bound crafted inputs, the Ogg page-cap
  * role. Everything is bounds-checked; parse never throws.
  */
object Xml {

  sealed trait Node
  final case class Text(s: String) extends Node

  final case class Elem(name: String, attrs: List[(String, String)],
      children: List[Node]) extends Node {
    /** Local part of the qname (namespace prefixes unresolved). */
    def local: String = {
      val i = name.indexOf(':')
      if (i < 0) name else name.substring(i + 1)
    }
    def attr(n: String): Option[String] = attrs.collectFirst {
      case (k, v) if k == n => v
    }
    /** Child elements by LOCAL name. */
    def elems(localName: String): List[Elem] = children.collect {
      case e: Elem if e.local == localName => e
    }
    /** Concatenated descendant text (character data + CDATA). */
    def text: String = {
      val sb = new StringBuilder
      def walk(e: Elem): Unit = e.children.foreach {
        case Text(s) => sb.append(s)
        case c: Elem => walk(c)
      }
      walk(this)
      sb.toString
    }
  }
  /** Every element with the given LOCAL name, document order
    * (pre-order; nested matches are collected too — declared). The
    * record-selection walk of the `xml` source. */
  def collectByLocal(root: Elem, local: String): List[Elem] = {
    val out = List.newBuilder[Elem]
    def walk(e: Elem): Unit = {
      if (e.local == local) out += e
      e.children.foreach { case c: Elem => walk(c); case _ => }
    }
    walk(root)
    out.result()
  }

  private val MaxNodes = 1 << 20
  private val MaxDepth = 256

  /** Parse one document: optional prolog/misc, exactly one root
    * element, optional trailing misc. None on any well-formedness
    * violation. */
  def parse(input: String): Option[Elem] = {
    val p = new P(input)
    p.skipMisc()
    val root = p.element(0)
    root match {
      case Some(r) =>
        p.skipMisc()
        if (p.pos == input.length) Some(r) else None
      case None => None
    }
  }

  private final class P(s: String) {
    var pos = 0
    var nodes = 0

    private def ws(): Unit =
      while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\r' || s.charAt(pos) == '\n')) pos += 1

    private def startsWith(t: String): Boolean = s.startsWith(t, pos)

    /** Skip whitespace, comments, PIs, and one DOCTYPE (prolog/misc
      * layer). Returns false on malformed constructs. */
    def skipMisc(): Boolean = {
      var go = true
      while (go) {
        ws()
        if (startsWith("<!--")) {
          val end = s.indexOf("-->", pos + 4)
          // '--' must not occur inside the comment (§2.5)
          if (end < 0 || s.substring(pos + 4, end).contains("--")) { pos = s.length + 1; return false }
          pos = end + 3
        } else if (startsWith("<?")) {
          val end = s.indexOf("?>", pos + 2)
          if (end < 0) { pos = s.length + 1; return false }
          pos = end + 2
        } else if (startsWith("<!DOCTYPE")) {
          // skip to the matching '>', honoring one [ ... ] internal subset
          var i = pos + 9
          var depth = 0
          var done = false
          while (!done && i < s.length) {
            s.charAt(i) match {
              case '[' => depth += 1
              case ']' => depth -= 1
              case '>' if depth == 0 => done = true
              case _ =>
            }
            i += 1
          }
          if (!done) { pos = s.length + 1; return false }
          pos = i
        } else go = false
      }
      true
    }

    private def name(): Option[String] = {
      val from = pos
      while (pos < s.length && {
        val c = s.charAt(pos)
        c.isLetterOrDigit || c == '_' || c == ':' || c == '-' || c == '.'
      }) pos += 1
      if (pos == from) None
      else {
        val n = s.substring(from, pos)
        val c0 = n.charAt(0)
        if (c0.isLetter || c0 == '_' || c0 == ':') Some(n) else None
      }
    }

    /** §4.1 references over a raw text run. None on undeclared
      * entities / malformed char refs / stray '&'. */
    private def decode(raw: String): Option[String] = {
      if (raw.indexOf('&') < 0) return Some(raw)
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        val c = raw.charAt(i)
        if (c != '&') { sb.append(c); i += 1 }
        else {
          val semi = raw.indexOf(';', i + 1)
          if (semi < 0) return None
          val ent = raw.substring(i + 1, semi)
          val rep: Option[String] = ent match {
            case "lt" => Some("<"); case "gt" => Some(">")
            case "amp" => Some("&"); case "apos" => Some("'")
            case "quot" => Some("\"")
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try {
                val cp = Integer.parseInt(ent.substring(2), 16)
                if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp))) else None
              } catch { case _: Exception => None }
            case _ if ent.startsWith("#") =>
              try {
                val cp = Integer.parseInt(ent.substring(1))
                if (Character.isValidCodePoint(cp)) Some(new String(Character.toChars(cp))) else None
              } catch { case _: Exception => None }
            case _ => None // undeclared entity: well-formedness violation
          }
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None => return None
          }
        }
      }
      Some(sb.toString)
    }

    private def attrList(): Option[List[(String, String)]] = {
      val out = List.newBuilder[(String, String)]
      var go = true
      while (go) {
        val save = pos
        ws()
        name() match {
          case Some(n) =>
            ws()
            if (pos >= s.length || s.charAt(pos) != '=') return None
            pos += 1; ws()
            if (pos >= s.length) return None
            val q = s.charAt(pos)
            if (q != '"' && q != '\'') return None
            pos += 1
            val end = s.indexOf(q, pos)
            if (end < 0) return None
            val raw = s.substring(pos, end)
            if (raw.contains('<')) return None // §3.1: AttValue excludes RAW '<' (&lt; is fine)
            val v = decode(raw) match {
              case Some(d) => d
              case None => return None
            }
            out += ((n, v))
            pos = end + 1
          case None => pos = save; go = false
        }
      }
      Some(out.result())
    }

    /** One element at `pos` (must point at '<'). */
    def element(depth: Int): Option[Elem] = {
      if (depth > MaxDepth) return None
      nodes += 1
      if (nodes > MaxNodes) return None
      if (pos >= s.length || s.charAt(pos) != '<') return None
      pos += 1
      val tag = name() match { case Some(n) => n; case None => return None }
      val attrs = attrList() match { case Some(a) => a; case None => return None }
      ws()
      if (startsWith("/>")) { pos += 2; return Some(Elem(tag, attrs, Nil)) }
      if (pos >= s.length || s.charAt(pos) != '>') return None
      pos += 1
      val children = List.newBuilder[Node]
      var textFrom = pos
      def flushText(until: Int): Boolean = {
        if (until > textFrom) {
          val raw = s.substring(textFrom, until)
          if (raw.contains("]]>")) return false // §2.4
          decode(raw) match {
            case Some(d) => if (d.nonEmpty) children += Text(d)
            case None => return false
          }
        }
        true
      }
      while (true) {
        val lt = s.indexOf('<', pos)
        if (lt < 0) return None // unterminated element
        pos = lt
        if (startsWith("</")) {
          if (!flushText(lt)) return None
          pos += 2
          val close = name() match { case Some(n) => n; case None => return None }
          ws()
          if (close != tag || pos >= s.length || s.charAt(pos) != '>') return None
          pos += 1
          return Some(Elem(tag, attrs, children.result()))
        } else if (startsWith("<![CDATA[")) {
          if (!flushText(lt)) return None
          val end = s.indexOf("]]>", pos + 9)
          if (end < 0) return None
          val t = s.substring(pos + 9, end)
          if (t.nonEmpty) children += Text(t)
          nodes += 1
          pos = end + 3
          textFrom = pos
        } else if (startsWith("<!--")) {
          if (!flushText(lt)) return None
          val end = s.indexOf("-->", pos + 4)
          if (end < 0 || s.substring(pos + 4, end).contains("--")) return None
          pos = end + 3
          textFrom = pos
        } else if (startsWith("<?")) {
          if (!flushText(lt)) return None
          val end = s.indexOf("?>", pos + 2)
          if (end < 0) return None
          pos = end + 2
          textFrom = pos
        } else {
          if (!flushText(lt)) return None
          element(depth + 1) match {
            case Some(e) => children += e
            case None => return None
          }
          textFrom = pos
        }
      }
      None // unreachable
    }
  }
}
