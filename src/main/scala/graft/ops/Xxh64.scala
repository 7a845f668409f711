package graft.ops

/** XXH64 — the 64-bit xxHash variant, from the published algorithm
  * description (the xxHash spec; also RFC 8878 §3.1.1, which uses its
  * low 32 bits as the zstd frame content checksum). Pure function of
  * the input bytes and seed; pinned in ZstdSpec against the
  * INDEPENDENT XXHash64 implementation that ships in lz4-java (a
  * separate codebase from both this file and zstd-jni).
  *
  * The algorithm: four parallel 64-bit accumulators over 32-byte
  * stripes (round = rotl31(acc + lane·P2)·P1), a merge fold, then a
  * tail loop over the remaining 8/4/1-byte units, then the avalanche
  * finalizer. All arithmetic is wrapping Long math, which is exactly
  * JVM semantics.
  */
object Xxh64 {
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private def rotl(x: Long, r: Int): Long = java.lang.Long.rotateLeft(x, r)

  private def le64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  private def round(acc: Long, lane: Long): Long =
    rotl(acc + lane * P2, 31) * P1

  private def mergeRound(hash: Long, acc: Long): Long =
    (hash ^ round(0L, acc)) * P1 + P4

  def hash(b: Array[Byte], from: Int, until: Int, seed: Long = 0L): Long = {
    val len = until - from
    var i = from
    var h =
      if (len >= 32) {
        var a1 = seed + P1 + P2
        var a2 = seed + P2
        var a3 = seed
        var a4 = seed - P1
        while (i + 32 <= until) {
          a1 = round(a1, le64(b, i)); a2 = round(a2, le64(b, i + 8))
          a3 = round(a3, le64(b, i + 16)); a4 = round(a4, le64(b, i + 24))
          i += 32
        }
        var hh = rotl(a1, 1) + rotl(a2, 7) + rotl(a3, 12) + rotl(a4, 18)
        hh = mergeRound(hh, a1); hh = mergeRound(hh, a2)
        hh = mergeRound(hh, a3); hh = mergeRound(hh, a4)
        hh
      } else seed + P5
    h += len.toLong
    while (i + 8 <= until) {
      h = rotl(h ^ round(0L, le64(b, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= until) {
      h = rotl(h ^ (le32(b, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < until) {
      h = rotl(h ^ ((b(i) & 0xFFL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  def hash(b: Array[Byte]): Long = hash(b, 0, b.length, 0L)
}
