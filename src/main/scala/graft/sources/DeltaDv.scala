package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Delta Lake DELETION-VECTOR codec, from the public protocol
  * (delta.io PROTOCOL.md "Deletion Vectors") and the public
  * RoaringFormatSpec — no delta or roaring jars.
  *
  * On disk a DV is a serialized "RoaringBitmapArray" in the Portable
  * format: magic 1681511377 (4 bytes LE), a little-endian int64 count
  * of 32-bit bitmaps, then that many standard portable 32-bit
  * RoaringBitmaps in index order (index i covers row positions
  * `[i·2³², (i+1)·2³²)`). Each 32-bit bitmap: cookie 12346 (no run
  * containers, followed by a 4-byte container count and per-container
  * 4-byte offsets) or 12347 (run containers present: container count
  * rides the cookie's upper 16 bits, a run bitset follows, offsets
  * only at ≥ 4 containers); then per container a 2-byte key and
  * 2-byte (cardinality−1); then the containers — sorted uint16 arrays
  * (≤ 4096 values), 8 KiB bitmaps, or (start, extra-length) run
  * pairs.
  *
  * Storage ([[DvDescriptor.storageType]]): `"p"` an absolute file
  * path; `"u"` a file under the table root whose name derives from a
  * Z85-encoded UUID (`<prefix?><20-char z85>` →
  * `<root>/<prefix>/deletion_vector_<uuid>.bin`); `"i"` the bitmap
  * bytes themselves Z85-inlined in the log. DV FILES carry a 1-byte
  * version (1) then per-DV `[4-byte BE size][data][4-byte BE CRC32]`
  * with the add action's `offset` pointing at the size word —
  * big-endian framing around little-endian bitmap data, exactly as
  * delta-spark's DataOutputStream framing writes it. */
object DeltaDv {

  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
                                offset: Long, sizeInBytes: Int,
                                cardinality: Long)

  private val Magic = 1681511377

  // ------------------------------------------------------------- Z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyz" +
      "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85 (ZeroMQ base85): 5 chars → 4 bytes, big-endian groups. */
  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 length ${s.length} not divisible by 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"invalid z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      val o = i / 5 * 4
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
    }
    out
  }

  /** Zero-pad to a 4-byte multiple, then encode — the inline-DV
    * convention (the log's sizeInBytes records the unpadded length). */
  def z85EncodePadded(bytes: Array[Byte]): String = {
    val rem = bytes.length % 4
    if (rem == 0) z85Encode(bytes)
    else z85Encode(bytes ++ new Array[Byte](4 - rem))
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, "z85 encodes 4-byte groups")
    val sb = new StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) {
        sb.append(Z85Alphabet(((v / div) % 85).toInt))
        div /= 85
      }
      i += 4
    }
    sb.toString
  }

  // ------------------------------------------ roaring bitmap (portable)

  /** Deleted row positions from a serialized RoaringBitmapArray. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt() == Magic,
      "not a portable RoaringBitmapArray (bad magic)")
    val nBitmaps = buf.getLong()
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"bad bitmap count $nBitmaps")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var b = 0L
    while (b < nBitmaps) {
      val high = b << 32
      readBitmap32(buf, v32 => out += (high | (v32 & 0xffffffffL)))
      b += 1
    }
    out.toArray
  }

  /** Deleted positions from a STANDARD portable 64-bit roaring bitmap
    * (RoaringBitmap's `Roaring64NavigableMap` portable spec): 8-byte
    * LE bucket count, then per bucket a 4-byte LE high key + one
    * 32-bit portable bitmap. This is the serialization Iceberg v3
    * deletion vectors embed in Puffin `deletion-vector-v1` blobs —
    * distinct from Delta's RoaringBitmapArray framing above (magic +
    * implicit bucket index), but sharing the 32-bit container codec. */
  def deserializePortable64(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val nBuckets = buf.getLong()
    require(nBuckets >= 0 && nBuckets <= Int.MaxValue,
      s"bad 64-bit roaring bucket count $nBuckets")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var b = 0L
    while (b < nBuckets) {
      val high = buf.getInt().toLong << 32
      readBitmap32(buf, v32 => out += (high | (v32 & 0xffffffffL)))
      b += 1
    }
    out.toArray
  }

  /** One standard portable 32-bit roaring bitmap, values to `emit`. */
  private def readBitmap32(buf: ByteBuffer, emit: Int => Unit): Unit = {
    val cookie = buf.getInt()
    val (nContainers, runBits: Option[Array[Byte]]) =
      if ((cookie & 0xffff) == 12347) {
        val n = (cookie >>> 16) + 1
        val bits = new Array[Byte]((n + 7) / 8)
        buf.get(bits)
        (n, Some(bits))
      } else if (cookie == 12346) (buf.getInt(), None)
      else throw new IllegalArgumentException(
        s"not a portable roaring bitmap (cookie $cookie)")
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort() & 0xffff
      cards(i) = (buf.getShort() & 0xffff) + 1
      i += 1
    }
    // offset header: always for cookie 12346; for 12347 only at >= 4
    // containers — skipped either way, containers follow in key order
    if (runBits.isEmpty || nContainers >= 4) {
      var j = 0
      while (j < nContainers) { buf.getInt(); j += 1 }
    }
    def isRun(i: Int): Boolean =
      runBits.exists(bits => (bits(i / 8) & (1 << (i % 8))) != 0)
    i = 0
    while (i < nContainers) {
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort() & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort() & 0xffff
          val extra = buf.getShort() & 0xffff
          var v = start
          while (v <= start + extra) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) { // array container
        var k = 0
        while (k < cards(i)) { emit(base | (buf.getShort() & 0xffff)); k += 1 }
      } else { // bitmap container: 1024 × int64
        var w = 0
        while (w < 1024) {
          var word = buf.getLong()
          val wordBase = base | (w << 6)
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            emit(wordBase | bit)
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
  }

  /** Serialize positions as a portable RoaringBitmapArray — the
    * format's standard container choice per 2^16 block: an ARRAY of
    * sorted shorts up to 4096 values, a fixed 8 KiB BITMAP beyond
    * (the crossover where the bitmap is smaller). The write side of
    * every DV-producing DML commit; any conformant reader accepts
    * both container kinds. */
  def serialize(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "row positions must be >= 0")
    val byHigh = positions.distinct.sorted.groupBy(_ >>> 32)
    val nBitmaps = if (byHigh.isEmpty) 0L else byHigh.keys.max + 1
    val bitmaps = (0L until nBitmaps).map(b =>
      bitmap32Bytes(byHigh.getOrElse(b, Nil)
        .map(v => (v & 0xffffffffL).toInt)))
    val total = 12 + bitmaps.map(_.length).sum
    val out = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    out.putInt(Magic).putLong(nBitmaps)
    bitmaps.foreach(out.put)
    out.array()
  }

  /** One portable 32-bit roaring bitmap serialized — the container
    * body both 64-bit framings share (Delta's implicit-index array
    * above, the standard keyed form below). */
  private def bitmap32Bytes(vals: Seq[Int]): Array[Byte] = {
    val byKey = vals.groupBy(v => v >>> 16).toSeq.sortBy(_._1)
    def containerBytes(vs: Seq[Int]): Int =
      if (vs.size <= 4096) vs.size * 2 else 8192
    val body = ByteBuffer.allocate(
      8 + byKey.size * 8 + byKey.map(kv => containerBytes(kv._2)).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    body.putInt(12346).putInt(byKey.size)
    byKey.foreach { case (k, vs) =>
      body.putShort(k.toShort).putShort((vs.size - 1).toShort)
    }
    var off = 4 + 4 + byKey.size * 4 + byKey.size * 4
    byKey.foreach { case (_, vs) =>
      body.putInt(off); off += containerBytes(vs)
    }
    byKey.foreach { case (_, vs) =>
      if (vs.size <= 4096)
        vs.sorted.foreach(v => body.putShort((v & 0xffff).toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val low = v & 0xffff
          words(low >>> 6) |= (1L << (low & 63))
        }
        words.foreach(body.putLong)
      }
    }
    body.array()
  }

  /** STANDARD portable 64-bit roaring serialization — the write-side
    * inverse of [[deserializePortable64]] (what Iceberg v3 deletion
    * vectors embed in Puffin blobs): 8-byte LE bucket count, then per
    * NON-EMPTY bucket its 4-byte LE high key + one portable 32-bit
    * bitmap. Distinct from Delta's framing above (magic + implicit
    * dense bucket index); same 32-bit container codec. */
  def serializePortable64(positions: Seq[Long]): Array[Byte] = {
    require(positions.forall(_ >= 0), "row positions must be >= 0")
    val byHigh = positions.distinct.sorted.groupBy(_ >>> 32)
      .toSeq.sortBy(_._1)
    val bodies = byHigh.map { case (k, vs) =>
      k -> bitmap32Bytes(vs.map(v => (v & 0xffffffffL).toInt))
    }
    val out = ByteBuffer.allocate(8 + bodies.map(4 + _._2.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.putLong(bodies.size.toLong)
    bodies.foreach { case (k, b) => out.putInt(k.toInt); out.put(b) }
    out.array()
  }

  // ------------------------------------------------------- DV storage

  /** The serialized bitmap bytes for a descriptor: inline Z85 payload,
    * or the framed slice of a DV file (size word checked against the
    * descriptor, CRC32 verified). */
  /** The on-disk file a descriptor references — None for inline
    * payloads ("i" storage, which live in the log itself). What
    * [[bitmapBytes]] opens and what retention (vacuum) must treat as
    * referenced. */
  def dvFilePath(tableRoot: Path, dv: DvDescriptor): Option[Path] =
    dv.storageType match {
      case "p" => Some(new Path(dv.pathOrInlineDv))
      case "u" =>
        // <prefix?><20-char z85 uuid>; the prefix (if any) is a
        // directory level under the table root
        val enc = dv.pathOrInlineDv
        require(enc.length >= 20, s"malformed u-storage DV id '$enc'")
        val (prefix, z) = enc.splitAt(enc.length - 20)
        val bytes = z85Decode(z)
        val bb = ByteBuffer.wrap(bytes)
        val uuid = new java.util.UUID(bb.getLong(), bb.getLong())
        val name = s"deletion_vector_$uuid.bin"
        Some(if (prefix.isEmpty) new Path(tableRoot, name)
        else new Path(new Path(tableRoot, prefix), name))
      case _ => None
    }

  def bitmapBytes(fs: FileSystem, tableRoot: Path,
                  dv: DvDescriptor): Array[Byte] = dv.storageType match {
    case "i" =>
      // z85 works in 4-byte groups; writers zero-pad the payload and
      // the log's sizeInBytes is the unpadded length — trim back
      val raw = z85Decode(dv.pathOrInlineDv)
      if (dv.sizeInBytes > 0 && dv.sizeInBytes <= raw.length)
        raw.take(dv.sizeInBytes)
      else raw
    case "u" | "p" =>
      val file = dvFilePath(tableRoot, dv).get
      val in = fs.open(file)
      try {
        in.seek(dv.offset)
        val size = in.readInt() // big-endian framing
        require(size == dv.sizeInBytes,
          s"DV at $file:${dv.offset} declares $size bytes, the log " +
            s"says ${dv.sizeInBytes}")
        val data = new Array[Byte](size)
        in.readFully(data)
        val crc = in.readInt()
        val check = new java.util.zip.CRC32
        check.update(data)
        require((check.getValue & 0xffffffffL) == (crc & 0xffffffffL),
          s"DV at $file:${dv.offset} fails its CRC32 — corrupt file")
        data
      } finally in.close()
    case other => throw new IllegalArgumentException(
      s"unknown DV storageType '$other'")
  }

  /** Write a single-DV file in the on-disk framing (version byte,
    * BE size, data, BE CRC32) and return (pathOrInlineDv for "u"
    * storage, offset, size). Used by specs and future DELETE support. */
  def writeDvFile(fs: FileSystem, tableRoot: Path,
                  positions: Seq[Long]): (String, Long, Int) = {
    val data = serialize(positions)
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val enc = z85Encode(bb.array())
    val file = new Path(tableRoot, s"deletion_vector_$uuid.bin")
    val out = fs.create(file, false)
    try {
      out.writeByte(1) // format version
      out.writeInt(data.length)
      out.write(data)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      out.writeInt(crc.getValue.toInt)
    } finally out.close()
    (enc, 1L, data.length)
  }
}
