package graft

import graft.operators.MultimodalQueries.parseImageDims
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level image header parsing: the decode stage must read dimensions
  * from real PNG/JPEG structures, including JPEGs whose SOF segment comes
  * after APPn/quantization segments (the common camera layout). */
class MultimodalSpec extends AnyFunSuite {

  private def be16(v: Int) = Array[Byte](((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int) = Array[Byte](
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  test("PNG IHDR width/height") {
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes ++ be32(1920) ++ be32(1080) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // IHDR body + dummy CRC
    assert(parseImageDims(png) === Some(("png", 1920, 1080)))
  }

  test("JPEG SOF0 after APP0 and DQT segments") {
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++ new Array[Byte](14)
    val dqt = Array[Byte](0xff.toByte, 0xdb.toByte) ++ be16(67) ++ new Array[Byte](65)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(480) ++ be16(640) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ dqt ++ sof0 ++
      Array[Byte](1, 2, 3)
    assert(parseImageDims(jpeg) === Some(("jpeg", 640, 480)))
  }

  test("JPEG fill bytes and standalone markers before SOF are skipped") {
    // FF padding (fill bytes) before a marker is legal, as are standalone
    // RSTn/TEM markers that carry no length field
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(100) ++ be16(200) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    val withFill = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ sof0
    assert(parseImageDims(withFill) === Some(("jpeg", 200, 100)))
    val withRst = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x01) ++ sof0
    assert(parseImageDims(withRst) === Some(("jpeg", 200, 100)))
  }

  test("JPEG whose SOF dims end exactly at the buffer end still parses") {
    // SOI + SOF0 + len + precision + h + w = 11 bytes, nothing after width
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xc0.toByte) ++
      be16(17) ++ Array[Byte](8) ++ be16(480) ++ be16(640)
    assert(parseImageDims(jpeg) === Some(("jpeg", 640, 480)))
    // one byte shorter: dims truncated → None, no exception
    assert(parseImageDims(jpeg.dropRight(1)) === None)
  }

  test("progressive JPEG (SOF2) is handled; garbage is rejected") {
    val sof2 = Array[Byte](0xff.toByte, 0xc2.toByte) ++ be16(17) ++ Array[Byte](8) ++
      be16(32) ++ be16(64) ++ Array[Byte](3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++ sof2
    assert(parseImageDims(jpeg) === Some(("jpeg", 64, 32)))
    assert(parseImageDims("not an image at all".getBytes) === None)
    assert(parseImageDims(Array[Byte](0xff.toByte, 0xd8.toByte, 0, 0)) === None)
  }
}
