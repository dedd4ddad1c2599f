package graft.avro

import java.nio.ByteBuffer

/** Registry wire format for Avro-encoded values, modeled on the Confluent
  * framing the reference's serializers use (`application.yml:11-16`):
  * a magic byte, the schema id, then the Avro binary body. Confluent uses
  * `[0x00][int32 id]`; graft ids are 64-bit Rabin fingerprints
  * ([[SchemaRegistry.fingerprint]]), so the frame is `[0x47][int64 id]` —
  * one byte of magic ('G') plus 8 id bytes. A consumer resolves the WRITER
  * schema per record from the id, which is what makes mixed-schema topics
  * and in-flight schema evolution safe.
  */
object WireFormat {

  val Magic: Byte = 0x47 // 'G'
  val HeaderLen: Int = 1 + 8

  def frame(schemaId: Long, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(HeaderLen + body.length)
    out.put(Magic).putLong(schemaId).put(body)
    out.array()
  }

  /** (schemaId, body). Throws on bad magic — a framing mismatch must fail
    * loudly, not decode garbage. */
  def unframe(bytes: Array[Byte]): (Long, Array[Byte]) = {
    require(bytes.length >= HeaderLen && bytes(0) == Magic,
      s"not a graft-framed Avro value (len=${bytes.length}, " +
        s"magic=${if (bytes.nonEmpty) bytes(0) else -1})")
    val bb = ByteBuffer.wrap(bytes)
    bb.get()
    val id = bb.getLong
    val body = new Array[Byte](bytes.length - HeaderLen)
    bb.get(body)
    (id, body)
  }
}
