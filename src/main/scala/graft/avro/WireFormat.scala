package graft.avro

import java.nio.ByteBuffer

/** Registry wire format for Avro-encoded values, modeled on the Confluent
  * framing the reference's serializers use (`application.yml:11-16`): a magic
  * byte, the schema id, then the Avro binary body. Two framings coexist,
  * dispatched by the magic byte, so the engine speaks both id schemes and the
  * fingerprint design is not load-bearing:
  *
  *  - `[0x00][int32 id][body]` — Confluent's exact layout: ids are small
  *    per-registry monotonic ints ([[ConfluentFileRegistry]]), which is what
  *    makes the reference's "schema replication" a real id-mapping problem
  *    (`README.adoc:11-12,27`)
  *  - `[0x47][int64 id][body]` — graft framing ('G'): ids are 64-bit Rabin
  *    fingerprints ([[SchemaRegistry.fingerprint]]), content-addressed and
  *    registry-independent
  */
object WireFormat {

  val GraftMagic: Byte = 0x47 // 'G'
  val ConfluentMagic: Byte = 0x00

  def frame(schemaId: Long, body: Array[Byte], magic: Byte = GraftMagic): Array[Byte] =
    magic match {
      case GraftMagic =>
        val out = ByteBuffer.allocate(9 + body.length)
        out.put(GraftMagic).putLong(schemaId).put(body)
        out.array()
      case ConfluentMagic =>
        require(schemaId >= 0 && schemaId <= Int.MaxValue,
          s"Confluent framing carries int32 ids, got $schemaId")
        val out = ByteBuffer.allocate(5 + body.length)
        out.put(ConfluentMagic).putInt(schemaId.toInt).put(body)
        out.array()
      case other => throw new IllegalArgumentException(s"unknown wire magic $other")
    }

  /** (schemaId, body), auto-detecting the framing by magic byte. Throws on
    * unknown magic — a framing mismatch must fail loudly, not decode
    * garbage. */
  def unframe(bytes: Array[Byte]): (Long, Array[Byte]) = {
    require(bytes.length >= 5,
      s"not a framed Avro value (len=${bytes.length})")
    val bb = ByteBuffer.wrap(bytes)
    val magic = bb.get()
    val headerLen = magic match {
      case GraftMagic     => 9
      case ConfluentMagic => 5
      case other => throw new IllegalArgumentException(
        s"not a framed Avro value (magic=$other, len=${bytes.length})")
    }
    require(bytes.length >= headerLen,
      s"truncated frame (magic=$magic, len=${bytes.length})")
    val id = if (magic == GraftMagic) bb.getLong else bb.getInt.toLong
    val body = new Array[Byte](bytes.length - headerLen)
    bb.get(body)
    (id, body)
  }
}
