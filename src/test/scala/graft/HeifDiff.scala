package graft

import graft.ops.Heif

/** Differential driver against the system libheif + libavif: builds
  * every (format, rotation, mirror, alpha, size) combination with
  * the in-repo builder, parses it back, and writes
  * `/tmp/heifdiff/<name>.bin` + `<name>.expect` (one line:
  * `dispW dispH codedW codedH`) for the ctypes cross-parse —
  * libheif's `heif_image_handle_get_width/height` must equal the
  * displayed dims, libavif's parse-only `decoder->image` the coded
  * dims. See HeifSpec for the frozen digest pins. */
object HeifDiff {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("/tmp/heifdiff"); dir.mkdirs()
    dir.listFiles().foreach(_.delete())
    var fail = 0; var count = 0
    for (avif <- Seq(true, false); rot <- Seq(0, 90, 180, 270);
         mirror <- Seq(None, Some(0), Some(1)); alpha <- Seq(false, true);
         (w, h) <- Seq((123, 77), (640, 480))) {
      count += 1
      val name = s"${if (avif) "avif" else "heic"}-$rot-${mirror.getOrElse("n")}-$alpha-${w}x$h"
      val bytes = Heif.build(avif, w, h, rot, mirror, alpha)
      java.nio.file.Files.write(new java.io.File(dir, s"$name.bin").toPath, bytes)
      Heif.parse(bytes) match {
        case Some(m) =>
          val swap = rot == 90 || rot == 270
          val (ew, eh) = if (swap) (h, w) else (w, h)
          val ok = m.width == ew && m.height == eh &&
            m.codedWidth == w && m.codedHeight == h &&
            m.rotationCcw == rot && m.mirrorAxis == mirror && m.hasAlpha == alpha &&
            m.codec == (if (avif) "av01" else "hvc1") &&
            m.brand == (if (avif) "avif" else "heic") &&
            m.itemCount == (if (alpha) 2 else 1)
          if (ok) println(s"$name: self OK") else { println(s"$name: SELF MISMATCH $m"); fail += 1 }
          java.nio.file.Files.write(new java.io.File(dir, s"$name.expect").toPath,
            s"${m.width} ${m.height} ${m.codedWidth} ${m.codedHeight}".getBytes("US-ASCII"))
        case None => println(s"$name: PARSE REFUSED"); fail += 1
      }
    }
    // grid (tiled) containers — round 17: libheif must report the
    // grid's OUTPUT dims (post-irot); libavif the coded output dims
    for (avif <- Seq(true, false); rot <- Seq(0, 90);
         (rows, cols, tw, th, ow, oh) <- Seq((2, 2, 64, 64, 128, 128), (2, 3, 512, 512, 1440, 960));
         inIdat <- Seq(false, true); wide <- Seq(false, true)) {
      count += 1
      val name = s"grid-${if (avif) "avif" else "heic"}-$rot-${rows}x$cols-$inIdat-$wide"
      val bytes = Heif.buildGrid(avif, tw, th, rows, cols, ow, oh,
        gridIspe = true, inIdat = inIdat, rotationCcw = rot, wideFields = wide)
      java.nio.file.Files.write(new java.io.File(dir, s"$name.bin").toPath, bytes)
      Heif.parse(bytes) match {
        case Some(m) =>
          val (ew, eh) = if (rot == 90) (oh, ow) else (ow, oh)
          val ok = m.width == ew && m.height == eh &&
            m.codedWidth == ow && m.codedHeight == oh &&
            m.gridRows == rows && m.gridCols == cols &&
            m.codec == (if (avif) "av01" else "hvc1") &&
            m.itemCount == rows * cols + 1
          if (ok) println(s"$name: self OK") else { println(s"$name: SELF MISMATCH $m"); fail += 1 }
          java.nio.file.Files.write(new java.io.File(dir, s"$name.expect").toPath,
            s"${m.width} ${m.height} ${m.codedWidth} ${m.codedHeight}".getBytes("US-ASCII"))
        case None => println(s"$name: PARSE REFUSED"); fail += 1
      }
    }
    println(s"heif self-consistency failures: $fail / $count")
  }
}
