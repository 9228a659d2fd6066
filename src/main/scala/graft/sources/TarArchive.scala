package graft.sources

/** POSIX ustar archive writer + independent reader, pure JVM, zero
  * dependencies — the shard container a training-data pipeline packs
  * curated samples into before the trainer reads them as sequential
  * shards (the public WebDataset convention: plain uncompressed tar,
  * one member per sample, ranged reads by member offset). Deliberately
  * minimal scope: regular-file members, names ≤ 100 bytes, fixed
  * deterministic metadata (mode 0644, uid/gid 0, mtime 0) so identical
  * member lists produce identical shard BYTES — the property that makes
  * shard layout SQL-replayable (q167) and shards content-addressable.
  *
  * Layout (public ustar spec): each member is a 512-byte header
  * (name, octal size, checksum over the header with the checksum field
  * blanked, typeflag '0', magic "ustar") followed by the data padded to
  * a 512-byte boundary; the archive ends with two zero blocks. The
  * reader walks headers, VERIFIES each checksum and the magic, and
  * returns None on anything malformed — never a guessed index.
  */
object TarArchive {

  /** One member in the archive index: `dataOffset` is the absolute byte
    * offset of the member's payload inside the shard (slice-ready). */
  final case class TarEntry(memberNo: Int, name: String, dataOffset: Long,
      size: Long)

  private val BlockSize = 512
  private def padded(size: Long): Long =
    (size + BlockSize - 1) / BlockSize * BlockSize

  /** Header + padded payload footprint of one member. */
  def entryBytes(size: Long): Long = BlockSize + padded(size)

  /** Trailing terminator: two zero blocks. */
  val TerminatorBytes: Int = 2 * BlockSize

  private def writeOctal(h: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    // width-1 octal digits, NUL-terminated (the ustar convention)
    val s = java.lang.Long.toOctalString(v)
    require(s.length <= width - 1, s"value $v overflows $width-byte octal field")
    val pad = width - 1 - s.length
    var i = 0
    while (i < pad) { h(off + i) = '0'; i += 1 }
    s.getBytes("US-ASCII").copyToArray(h, off + pad)
    h(off + width - 1) = 0
  }

  /** Encode members in the given order. Deterministic: identical input
    * lists yield identical bytes. */
  def encodeTar(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val total = members.map { case (_, d) => entryBytes(d.length.toLong) }.sum +
      TerminatorBytes
    require(total <= Int.MaxValue, "shard exceeds 2 GiB; lower the shard target")
    val out = new Array[Byte](total.toInt)
    var off = 0
    members.foreach { case (name, data) =>
      // getBytes("US-ASCII") would silently replace non-ASCII chars with
      // '?' and the archive would decode to a DIFFERENT name — reject
      // loudly instead (printable ASCII is the deterministic-name contract)
      require(name.forall(c => c >= 0x20 && c < 0x7f),
        s"ustar member name must be printable ASCII, got '$name'")
      val nb = name.getBytes("US-ASCII")
      require(nb.length > 0 && nb.length <= 100,
        s"ustar member name must be 1..100 bytes, got ${nb.length}")
      val h = new Array[Byte](BlockSize)
      nb.copyToArray(h, 0)
      writeOctal(h, 100, 8, 0x1a4) // mode 0644
      writeOctal(h, 108, 8, 0) // uid
      writeOctal(h, 116, 8, 0) // gid
      writeOctal(h, 124, 12, data.length.toLong) // size
      writeOctal(h, 136, 12, 0) // mtime (fixed: determinism)
      h(156) = '0' // typeflag: regular file
      "ustar".getBytes("US-ASCII").copyToArray(h, 257) // magic + NUL at 262
      h(263) = '0'; h(264) = '0' // version "00"
      // checksum: header summed with the checksum field as spaces,
      // stored as 6 octal digits + NUL + space
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0L
      var i = 0
      while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
      val cs = java.lang.Long.toOctalString(sum)
      val pad = 6 - cs.length
      var j = 0
      while (j < pad) { h(148 + j) = '0'; j += 1 }
      cs.getBytes("US-ASCII").copyToArray(h, 148 + pad)
      h(154) = 0; h(155) = ' '
      h.copyToArray(out, off)
      data.copyToArray(out, off + BlockSize)
      off += entryBytes(data.length.toLong).toInt
    }
    out // trailing zero blocks are already zero
  }

  private def parseOctal(b: Array[Byte], off: Int, width: Int): Option[Long] = {
    var v = 0L; var i = off; var seen = false
    val end = off + width
    while (i < end && (b(i) == ' ' && !seen)) i += 1 // leading spaces
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0'); i += 1; seen = true
    }
    if (seen) Some(v) else None
  }

  /** Walk the archive: checksum-verified member index, or None on any
    * malformed header, bad magic, truncation, or missing terminator. */
  def decodeTar(bytes: Array[Byte]): Option[Seq[TarEntry]] = {
    try {
      val out = scala.collection.mutable.ArrayBuffer.empty[TarEntry]
      var off = 0
      var done = false
      while (!done) {
        if (off + BlockSize > bytes.length) return None // no terminator
        var allZero = true
        var i = 0
        while (allZero && i < BlockSize) {
          if (bytes(off + i) != 0) allZero = false
          i += 1
        }
        if (allZero) {
          // terminator: require the second zero block too
          if (off + 2 * BlockSize > bytes.length) return None
          var z = true; var j = 0
          while (z && j < BlockSize) {
            if (bytes(off + BlockSize + j) != 0) z = false
            j += 1
          }
          if (!z) return None
          done = true
        } else {
          if (new String(bytes, off + 257, 5, "US-ASCII") != "ustar") return None
          val stored = parseOctal(bytes, off + 148, 8).getOrElse(return None)
          var sum = 0L
          var j = 0
          while (j < BlockSize) {
            sum += (if (j >= 148 && j < 156) ' '.toInt
                    else bytes(off + j) & 0xff)
            j += 1
          }
          if (sum != stored) return None
          val size = parseOctal(bytes, off + 124, 12).getOrElse(return None)
          var nameEnd = off
          while (nameEnd < off + 100 && bytes(nameEnd) != 0) nameEnd += 1
          if (nameEnd == off) return None
          val name = new String(bytes, off, nameEnd - off, "US-ASCII")
          val dataOff = off + BlockSize
          if (dataOff + size > bytes.length) return None
          out += TarEntry(out.length, name, dataOff.toLong, size)
          off += entryBytes(size).toInt
        }
      }
      Some(out.toSeq)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Exact payload slice for one indexed member. */
  def memberBytes(bytes: Array[Byte], e: TarEntry): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, e.dataOffset.toInt,
      (e.dataOffset + e.size).toInt)
}
