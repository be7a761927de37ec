package graft

import graft.ext.Multimodal

/** The codec-free image-header parser (Multimodal.parseImageDims):
  * exercised against hand-laid byte arrays (not just the builders), the
  * builder→parser round trip across dimension edge cases, and the query
  * over real testdata. */
class ImageDimsSpec extends SparkSpec {

  test("PNG: hand-laid signature + IHDR parses; corrupt variants do not") {
    // hand-assembled, independent of pngFixture: 8-byte signature,
    // 13-byte IHDR length, 'IHDR', w=260 (0x104), h=3 — big-endian
    val png: Array[Byte] = (Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I'.toInt, 'H'.toInt, 'D'.toInt, 'R'.toInt,
      0, 0, 1, 4, 0, 0, 0, 3,
      8, 2, 0, 0, 0, 0, 0, 0, 0) map (_.toByte)).toArray
    assert(Multimodal.parseImageDims(png) === Some(("png", 260, 3)))
    val badSig = png.clone(); badSig(0) = 0x88.toByte
    assert(Multimodal.parseImageDims(badSig) === None)
    val badType = png.clone(); badType(12) = 'X'.toByte
    assert(Multimodal.parseImageDims(badType) === None)
    assert(Multimodal.parseImageDims(png.take(20)) === None, "truncated header")
  }

  test("JPEG: marker walk skips APP0/COM segments to SOF0; dims big-endian") {
    val jpeg = Multimodal.jpegFixture(1039, 783, "a comment of some length")
    assert(Multimodal.parseImageDims(jpeg) === Some(("jpeg", 1039, 783)))
    // no SOF before the bytes end -> None, not a crash
    val noSof = jpeg.take(30)
    assert(Multimodal.parseImageDims(noSof) === None)
    assert(Multimodal.parseImageDims(Array[Byte](1, 2, 3)) === None)
  }

  test("builder -> parser round trip across edge dimensions") {
    for ((w, h) <- Seq((16, 16), (255, 256), (256, 255), (1039, 783), (1, 1))) {
      assert(Multimodal.parseImageDims(Multimodal.pngFixture(w, h))
        === Some(("png", w, h)), s"png $w x $h")
      assert(Multimodal.parseImageDims(Multimodal.jpegFixture(w, h, "c"))
        === Some(("jpeg", w, h)), s"jpeg $w x $h")
    }
  }

  test("mm_image_dims query: parsed dims equal fixture arithmetic, every doc") {
    val got = Multimodal.imageDims(spark, sf0001).collect()
    assert(got.length === 500)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === (if (id % 2 == 0) "png" else "jpeg"), s"doc $id")
      assert(r.getLong(2) === 16 + id % 1024, s"doc $id width")
      assert(r.getLong(3) === 16 + (id * 7) % 768, s"doc $id height")
      assert(r.getLong(4) ===
        (if (id % 2 == 0) 33L else 46L + id.toString.length), s"doc $id bytes")
    }
  }
}
