package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Deflate, GzipCodec}

/** From-spec DEFLATE ENCODER pinned against java.util.zip.Inflater —
  * the independent decoder the whole ecosystem runs — plus the
  * in-repo from-spec inflate (written round 10 against Deflater
  * fixtures; a different author-path than this round-11 encoder).
  */
class DeflateSpec extends AnyFunSuite {

  private def jdkInflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    // JDK-documented nowrap quirk: raw-deflate input needs one extra
    // dummy byte for the inflater to report finished
    inf.setInput(b ++ Array[Byte](0))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) fail("inflater starved: truncated stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private val corpora: Seq[(String, Array[Byte])] = {
    val rnd = new scala.util.Random(42)
    val text = ("the quick brown fox jumps over the lazy dog. " * 500).getBytes("UTF-8")
    Seq(
      "empty" -> Array.emptyByteArray,
      "one byte" -> Array[Byte](7),
      "two bytes" -> Array[Byte](7, 7),
      "all same" -> Array.fill[Byte](100000)('a'),
      "repeating text" -> text,
      "random (incompressible)" -> Array.fill[Byte](70000)(rnd.nextInt().toByte),
      "byte cycle" -> Array.tabulate[Byte](1000)(i => i.toByte),
      "stored boundary 65535" -> Array.fill[Byte](65535)(rnd.nextInt().toByte),
      "stored boundary 65536" -> Array.fill[Byte](65536)(rnd.nextInt().toByte),
      "long-distance match" -> {
        // a 100-byte motif at the start, garbage for ~30000 bytes, the
        // motif again just inside the 32 KiB window
        val motif = Array.tabulate[Byte](100)(i => (i * 7).toByte)
        val mid = Array.fill[Byte](30000)(rnd.nextInt().toByte)
        motif ++ mid ++ motif
      },
      "run far beyond 258" -> (Array.fill[Byte](5000)('x') ++ "tail".getBytes),
      "mixed structure" -> {
        val sb = new StringBuilder
        (0 until 2000).foreach(i => sb.append(s"""{"id":$i,"name":"row $i","flag":${i % 2 == 0}}\n"""))
        sb.toString.getBytes("UTF-8")
      })
  }

  test("every corpus round-trips byte-exact through the JDK Inflater AND our inflate") {
    for ((name, data) <- corpora) {
      val packed = Deflate.compress(data)
      assert(jdkInflate(packed).toSeq == data.toSeq, s"jdk: $name")
      assert(GzipCodec.inflate(packed).map(_.toSeq).contains(data.toSeq), s"ours: $name")
    }
  }

  test("compressible input actually compresses; incompressible stays ~stored") {
    val repetitive = ("subscribe to our newsletter today " * 3000).getBytes("UTF-8")
    val ours = Deflate.compress(repetitive).length
    assert(ours < repetitive.length / 10,
      s"repetitive text: $ours vs ${repetitive.length}")
    // within 2x of zlib level 6 on structured text (sanity, not a race)
    val d = new java.util.zip.Deflater(6, true)
    d.setInput(repetitive); d.finish()
    val buf = new Array[Byte](repetitive.length)
    val jdk = d.deflate(buf)
    d.end()
    assert(ours <= jdk * 2, s"ours=$ours jdk=$jdk")
    // incompressible input must not blow up: stored-mode bound
    val rnd = new scala.util.Random(1)
    val noise = Array.fill[Byte](50000)(rnd.nextInt().toByte)
    assert(Deflate.compress(noise).length <= noise.length + 5 * (noise.length / 65535 + 1) + 16)
  }

  test("deterministic bytes: same input, same output") {
    val data = ("determinism " * 1000).getBytes("UTF-8")
    assert(Deflate.compress(data).toSeq == Deflate.compress(data).toSeq)
  }

  test("fuzz: random sizes and contents round-trip") {
    val rnd = new scala.util.Random(7)
    (0 until 120).foreach { _ =>
      val n = rnd.nextInt(5000)
      val data = new Array[Byte](n)
      // mix compressible and random segments
      var i = 0
      while (i < n) {
        if (rnd.nextBoolean()) {
          val b = rnd.nextInt().toByte
          val run = math.min(n - i, 1 + rnd.nextInt(300))
          java.util.Arrays.fill(data, i, i + run, b)
          i += run
        } else { data(i) = rnd.nextInt().toByte; i += 1 }
      }
      assert(jdkInflate(Deflate.compress(data)).toSeq == data.toSeq)
    }
  }

  test("gzip() members decode through the JDK GZIPInputStream and gunzip") {
    val data = ("gzip framing check " * 800).getBytes("UTF-8")
    val member = GzipCodec.gzip(data)
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(member))
    assert(in.readAllBytes().toSeq == data.toSeq)
    assert(GzipCodec.gunzip(member).map(_.toSeq).contains(data.toSeq))
    assert(member.length < data.length / 5)
  }

  test("zlib() streams decode through the JDK Inflater (zlib mode) and our inflate path") {
    val data = ("zlib framing check " * 800).getBytes("UTF-8")
    val z = GzipCodec.zlib(data)
    val inf = new java.util.zip.Inflater() // zlib wrapper mode
    inf.setInput(z)
    val buf = new Array[Byte](data.length + 16)
    val n = inf.inflate(buf)
    assert(inf.finished(), "jdk did not accept the zlib framing")
    inf.end()
    assert(buf.take(n).toSeq == data.toSeq)
    // (CMF*256+FLG) % 31 == 0 — the RFC 1950 check the JDK enforces
    assert((((z(0) & 0xFF) * 256 + (z(1) & 0xFF)) % 31) == 0)
  }

  test("package-merge lengths: complete Kraft sum, limit respected, optimal on known case") {
    val freqs = Array[Long](40, 30, 15, 10, 4, 1)
    for (limit <- Seq(3, 4, 15)) {
      val len = Deflate.lengthLimited(freqs, limit)
      assert(len.forall(_ <= limit))
      val kraft = len.filter(_ > 0).map(l => math.pow(2, -l)).sum
      assert(math.abs(kraft - 1.0) < 1e-12, s"limit=$limit kraft=$kraft")
    }
    // limit 3 forces uniform-ish lengths over 6 symbols: 2,2,3,3,3,3 or equivalent
    val l3 = Deflate.lengthLimited(freqs, 3)
    assert(l3.sorted.toSeq == Seq(2, 2, 3, 3, 3, 3))
    // single symbol gets length 1
    assert(Deflate.lengthLimited(Array[Long](0, 9, 0), 15).toSeq == Seq(0, 1, 0))
  }

  test("canonical code assignment matches RFC 1951 worked example") {
    // RFC 1951 §3.2.2 example: lengths (3,3,3,3,3,2,4,4) → codes
    // 010 011 100 101 110 00 1110 1111
    val codes = Deflate.canonicalCodes(Array(3, 3, 3, 3, 3, 2, 4, 4))
    assert(codes.toSeq == Seq(2, 3, 4, 5, 6, 0, 14, 15))
  }
}
