package graft

import graft.ops.{Vp8, Vp8Enc}

/** Differential driver against the system libwebp: encodes every
  * [[Vp8Cases]] stream, checks own-decoder self-consistency, and
  * writes `<name>.webp` + `<name>.yuv` (tracked planes, Y then U
  * then V, tight) to /tmp/vp8diff for the out-of-band reference
  * cross-check — a ctypes script that calls `WebPDecodeYUV` on each
  * .webp and diffs against the .yuv:
  *
  * {{{
  * sbt "Test/runMain graft.Vp8Diff"
  * python3 - <<'EOF'
  * import ctypes, os
  * lib = ctypes.CDLL("libwebp.so.7")
  * lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
  * lib.WebPDecodeYUV.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
  *     ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
  *     ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
  *     ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
  *     ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
  * d = "/tmp/vp8diff"; fails = 0
  * for n in sorted(f[:-5] for f in os.listdir(d) if f.endswith(".webp")):
  *     webp = open(f"{d}/{n}.webp", "rb").read()
  *     want = open(f"{d}/{n}.yuv", "rb").read()
  *     dw, dh = ctypes.c_int(), ctypes.c_int()
  *     up = ctypes.POINTER(ctypes.c_uint8)(); vp = ctypes.POINTER(ctypes.c_uint8)()
  *     st, uvs = ctypes.c_int(), ctypes.c_int()
  *     yp = lib.WebPDecodeYUV(webp, len(webp), ctypes.byref(dw), ctypes.byref(dh),
  *                            ctypes.byref(up), ctypes.byref(vp),
  *                            ctypes.byref(st), ctypes.byref(uvs))
  *     if not yp: print(n, "REFUSED"); fails += 1; continue
  *     w, h = dw.value, dh.value; uw, uh = (w + 1) // 2, (h + 1) // 2
  *     got = (b"".join(ctypes.string_at(ctypes.addressof(yp.contents) + r * st.value, w) for r in range(h))
  *          + b"".join(ctypes.string_at(ctypes.addressof(up.contents) + r * uvs.value, uw) for r in range(uh))
  *          + b"".join(ctypes.string_at(ctypes.addressof(vp.contents) + r * uvs.value, uw) for r in range(uh)))
  *     if got != want: print(n, "MISMATCH"); fails += 1
  * print("failures:", fails)
  * EOF
  * }}}
  *
  * The last full run (367 cases) had zero mismatches; the digest
  * pins in [[Vp8EncSpec]] freeze that verified state. */
object Vp8Diff {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/tmp/vp8diff"); dir.mkdirs()
    dir.listFiles().foreach(_.delete())
    var fail = 0
    for ((name, w, h, f, params) <- Vp8Cases.all) {
      val (y, u, v) = Vp8Cases.gray(w, h, f)
      try {
        val enc = Vp8Enc.encode(w, h, y, u, v, params)
        java.nio.file.Files.write(new java.io.File(dir, s"$name.webp").toPath, enc.webp)
        val packed = enc.y ++ enc.u ++ enc.v
        java.nio.file.Files.write(new java.io.File(dir, s"$name.yuv").toPath, packed)
        Vp8.decode(enc.webp) match {
          case None => println(s"$name: OWN DECODE REFUSED"); fail += 1
          case Some(fr) =>
            val got = fr.y ++ fr.u ++ fr.v
            if (java.util.Arrays.equals(got, packed)) println(s"$name: self OK")
            else {
              val i = got.indices.find(i => got(i) != packed(i)).get
              println(s"$name: SELF MISMATCH at $i (of ${got.length}): " +
                s"got ${got(i) & 0xFF} want ${packed(i) & 0xFF}")
              fail += 1
            }
        }
      } catch {
        case e: Exception => println(s"$name: ENCODER ERROR ${e.getMessage}"); fail += 1
      }
    }
    println(s"self-consistency failures: $fail / ${Vp8Cases.all.size}")

    // ---- lossy + ALPH containers: every (filter, compress) combo ----
    // writes <name>.webp + <name>.rgba (tracked RGB + original alpha)
    // for the WebPDecodeRGBA cross-check
    import graft.ops.WebpCodec
    var afail = 0; var acount = 0
    for (filter <- 0 to 3; compress <- 0 to 1;
         (w, h) <- Seq((32, 32), (33, 17))) {
      acount += 1
      val name = s"alpha-$filter-$compress-${w}x$h"
      val (container, rgba) = Vp8Cases.alphaCase(filter, compress, w, h)
      java.nio.file.Files.write(new java.io.File(dir, s"$name.webp").toPath, container)
      java.nio.file.Files.write(new java.io.File(dir, s"$name.rgba").toPath, rgba)
      WebpCodec.decode(container) match {
        case Some(img) if img.channels == 4 && java.util.Arrays.equals(img.pixels, rgba) =>
          println(s"$name: self OK")
        case Some(img) =>
          println(s"$name: SELF MISMATCH (channels=${img.channels})"); afail += 1
        case None => println(s"$name: OWN DECODE REFUSED"); afail += 1
      }
    }
    println(s"alpha self-consistency failures: $afail / $acount")
  }
}
