package graft.io

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import java.util.zip.CRC32

/** Deletion-vector codec for [[DeltaRead]] — the public Delta protocol's
  * row-level delete mechanism (delta-io PROTOCOL.md "Deletion Vectors"):
  * an `add` action may carry a `deletionVector` descriptor whose bitmap
  * marks ROW INDEXES of that one data file as deleted; a reader must
  * hide exactly those rows. This is the most common modern-writer
  * feature (Databricks enables it by default), so without it every DV'd
  * table hits [[DeltaRead]]'s loud reject.
  *
  * Wire format, all from the public spec:
  *  - descriptor `storageType`: `"u"` = on-disk file whose name derives
  *    from a Z85-encoded UUID (the last 20 chars of `pathOrInlineDv`;
  *    any leading remainder is a directory prefix under the table
  *    root), `"p"` = absolute path, `"i"` = the bitmap payload itself
  *    Z85-inlined into `pathOrInlineDv`.
  *  - on-disk file: 1 format-version byte (must be 1), then at
  *    `offset`: payload size (4-byte big-endian), the payload, and a
  *    CRC-32 of the payload (4-byte big-endian).
  *  - payload: magic 1681511377 (4-byte little-endian) + a "portable"
  *    RoaringBitmapArray — an 8-byte little-endian bitmap count, then
  *    each 32-bit RoaringBitmap in the standard portable
  *    serialization, keys implicit 0..n-1; a set bit v in bitmap i
  *    means row index (i << 32) | v is deleted.
  *
  * The 32-bit bitmaps reuse `org.roaringbitmap.RoaringBitmap` (already
  * on the Spark classpath — Spark itself depends on it for shuffle
  * tracking), so the decode is the library's own portable-format
  * reader, not a hand-rolled container walk. Encode twins exist for
  * every decode so the spec can build protocol-shaped fixtures (and a
  * future DELETE in DeltaWrite has its write path ready). */
object DeltaDv {

  /** The add action's `deletionVector` descriptor, verbatim. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  /** Z85 (ZeroMQ base-85) alphabet — what Delta uses for DV UUIDs and
    * inline payloads. 4 bytes ↔ 5 chars, big-endian base-85. */
  private val Z85 =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Index: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85.zipWithIndex.foreach { case (c, i) => a(c) = i }
    a
  }

  def z85Encode(bytes: Array[Byte]): String = {
    require(bytes.length % 4 == 0, s"z85 encodes 4-byte groups, got ${bytes.length}")
    val sb = new java.lang.StringBuilder(bytes.length / 4 * 5)
    var i = 0
    while (i < bytes.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (bytes(i + j) & 0xffL); j += 1 }
      val out = new Array[Char](5)
      var k = 4
      while (k >= 0) { out(k) = Z85((v % 85).toInt); v /= 85; k -= 1 }
      sb.append(out)
      i += 4
    }
    sb.toString
  }

  def z85Decode(s: String): Array[Byte] = {
    require(s.length % 5 == 0, s"z85 decodes 5-char groups, got length ${s.length}")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0; var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Index(c) else -1
        require(d >= 0, s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(o + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      o += 4
      i += 5
    }
    out
  }

  /** Magic heading the portable RoaringBitmapArray payload. */
  private val Magic = 1681511377

  /** On-disk DV file for a descriptor. `"u"`: the UUID in the LAST 20
    * chars of pathOrInlineDv names `deletion_vector_<uuid>.bin` under
    * the table root (under the remainder as a prefix dir, when
    * present); `"p"`: pathOrInlineDv IS the absolute path. `"i"` never
    * reaches disk. */
  def dvFile(table: String, d: Descriptor): Path = d.storageType match {
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20, s"uuid-typed DV path too short: '$enc'")
      val prefix = enc.dropRight(20)
      val bb = ByteBuffer.wrap(z85Decode(enc.takeRight(20)))
      val uuid = new UUID(bb.getLong, bb.getLong)
      val name = s"deletion_vector_$uuid.bin"
      if (prefix.isEmpty) Paths.get(table, name) else Paths.get(table, prefix, name)
    case "p" => Paths.get(d.pathOrInlineDv)
    case other => throw new UnsupportedOperationException(
      s"deletion vector storageType '$other' is not in the public protocol (u/i/p)")
  }

  /** Deleted row indexes of one descriptor, ascending. Every frame is
    * verified before trust: file format version, payload size vs the
    * descriptor, CRC-32, magic, and decoded cardinality vs the
    * descriptor — a DV is row-VISIBILITY metadata, so a torn or
    * mismatched read must fail loudly, never mask the wrong rows. */
  def deletedRows(table: String, d: Descriptor): Array[Long] = {
    val payload = d.storageType match {
      case "i" =>
        val data = z85Decode(d.pathOrInlineDv)
        require(data.length >= d.sizeInBytes,
          s"inline DV shorter (${data.length}) than descriptor sizeInBytes ${d.sizeInBytes}")
        java.util.Arrays.copyOfRange(data, 0, d.sizeInBytes)
      case _ =>
        val all = Files.readAllBytes(dvFile(table, d))
        require(all.nonEmpty && all(0) == 1,
          s"unsupported DV file format version ${if (all.isEmpty) "(empty)" else all(0)}")
        val bb = ByteBuffer.wrap(all) // big-endian frame, per spec
        bb.position(d.offset.getOrElse(1))
        val size = bb.getInt
        require(size == d.sizeInBytes,
          s"DV payload size $size != descriptor sizeInBytes ${d.sizeInBytes}")
        val payload = new Array[Byte](size)
        bb.get(payload)
        val stored = bb.getInt
        val c = new CRC32(); c.update(payload)
        require(c.getValue == (stored.toLong & 0xffffffffL),
          "DV checksum mismatch — refusing a torn deletion vector")
        payload
    }
    decodePayload(payload, d.cardinality)
  }

  /** Portable RoaringBitmapArray payload → sorted 64-bit row indexes. */
  private def decodePayload(data: Array[Byte], cardinality: Long): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = bb.getInt
    require(magic == Magic, s"bad DV magic $magic (want $Magic)")
    val n = bb.getLong
    require(n >= 0 && n <= Int.MaxValue, s"implausible DV bitmap count $n")
    val out = Array.newBuilder[Long]
    var i = 0
    while (i < n) {
      val rb = new org.roaringbitmap.RoaringBitmap()
      rb.deserialize(bb)
      // deserialize reads from the buffer position without advancing it
      bb.position(bb.position() + rb.serializedSizeInBytes())
      val hi = i.toLong << 32
      rb.forEach(new org.roaringbitmap.IntConsumer {
        override def accept(v: Int): Unit = out += (hi | Integer.toUnsignedLong(v))
      })
      i += 1
    }
    val rows = out.result()
    require(rows.length.toLong == cardinality,
      s"DV cardinality mismatch: decoded ${rows.length}, descriptor said $cardinality")
    rows
  }

  /** Encode twin of [[decodePayload]]: the portable payload (magic +
    * bitmap array) for a set of row indexes. */
  def encodePayload(rows: Seq[Long]): Array[Byte] = {
    require(rows.nonEmpty, "an empty DV is meaningless — drop the descriptor instead")
    require(rows.forall(_ >= 0), "row indexes are non-negative")
    val byHi = rows.groupBy(r => (r >>> 32).toInt)
    val bitmaps = (0 to byHi.keys.max).map { hi =>
      val rb = new org.roaringbitmap.RoaringBitmap()
      byHi.getOrElse(hi, Nil).foreach(r => rb.add((r & 0xffffffffL).toInt))
      rb.runOptimize()
      rb
    }
    val size = 4 + 8 + bitmaps.map(_.serializedSizeInBytes()).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Magic)
    bb.putLong(bitmaps.length.toLong)
    bitmaps.foreach(_.serialize(bb))
    bb.array()
  }

  /** Write a single-blob on-disk DV file (format-version byte + one
    * size|payload|crc frame at offset 1) and return a complete `"u"`
    * descriptor whose UUID-derived name the file was given. The spec's
    * fixture writer — and the storage half a DELETE in DeltaWrite
    * would need. */
  def writeDvFile(table: String, rows: Seq[Long], uuid: UUID = UUID.randomUUID()):
      Descriptor = {
    val payload = encodePayload(rows)
    val c = new CRC32(); c.update(payload)
    val bb = ByteBuffer.allocate(1 + 4 + payload.length + 4) // big-endian frame
    bb.put(1.toByte)
    bb.putInt(payload.length)
    bb.put(payload)
    bb.putInt(c.getValue.toInt)
    val ub = ByteBuffer.allocate(16)
    ub.putLong(uuid.getMostSignificantBits).putLong(uuid.getLeastSignificantBits)
    val d = Descriptor("u", z85Encode(ub.array()), Some(1), payload.length,
      rows.distinct.size.toLong)
    Files.write(dvFile(table, d), bb.array())
    d
  }

  /** The descriptor's inline (`"i"`) twin for the same rows. */
  def inlineDescriptor(rows: Seq[Long]): Descriptor = {
    val payload = encodePayload(rows)
    // z85 needs a multiple of 4; pad, and let sizeInBytes bound the read
    val padded = java.util.Arrays.copyOf(payload, (payload.length + 3) / 4 * 4)
    Descriptor("i", z85Encode(padded), None, payload.length, rows.distinct.size.toLong)
  }
}
