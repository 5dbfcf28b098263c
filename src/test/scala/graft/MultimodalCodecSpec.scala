package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.MultimodalPack.ImageCodec

/** Pure-JVM checks on the real PNG codec path (javax.imageio): the
  * encode→decode round trip must reproduce the deterministic image
  * contract the DuckDB oracles recompute from text — dimensions from the
  * first two payload bytes, 3 bands, pixels tiled from the payload —
  * and the q73 nearest-neighbor resample must equal direct index math.
  */
class MultimodalCodecSpec extends AnyFunSuite {

  private def payloads: Seq[Array[Byte]] = Seq(
    "a".getBytes("UTF-8"),
    "ab".getBytes("UTF-8"),
    "key agg row scan slow fast table value part".getBytes("UTF-8"),
    ("x" * 553).getBytes("UTF-8"),
    Array.tabulate(200)(i => ((i * 37 + 11) % 127).max(1).toByte))

  test("PNG round trip preserves dims, bands, and tiled pixels exactly") {
    for (p <- payloads) {
      val png = ImageCodec.encodePng(p)
      // a real PNG stream, not a passthrough: magic bytes
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val (w, h, bands, gray) = ImageCodec.decode(png)
      assert(w == 1 + (p(0) & 0xff) % 64)
      val b1 = if (p.length > 1) p(1) & 0xff else 0
      assert(h == 1 + b1 % 64)
      assert(bands == 3)
      assert(gray.length == w * h)
      for (i <- 0 until w * h)
        assert((gray(i) & 0xff) == (p(i % p.length) & 0xff),
          s"pixel $i of ${p.length}-byte payload")
    }
  }

  test("nearest-neighbor 2x downsample equals direct index math") {
    val p = "the quick brown fox jumps over the lazy dog 0123456789".getBytes("UTF-8")
    val (w, h, _, gray) = ImageCodec.decode(ImageCodec.encodePng(p))
    val ow = math.max(w / 2, 1); val oh = math.max(h / 2, 1)
    for (y <- 0 until oh; x <- 0 until ow) {
      val src = 2 * y * w + 2 * x
      assert((gray(src) & 0xff) == (p(src % p.length) & 0xff))
    }
  }
}
