package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Blosc

/** Frame-level tests for the c-blosc 1.x codec. The split multi-block
  * frame is constructed BY HAND here (independent of Blosc.compress) to
  * pin the reader to the on-disk format numcodecs' c-blosc emits —
  * byte-shuffled lanes, per-block bstarts, split streams, raw-stream
  * fallback — not merely to our own writer's subset. */
class BloscSpec extends AnyFunSuite {

  private def doubles(n: Int)(f: Int => Double): Array[Byte] = {
    val raw = new Array[Byte](n * 8)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putDouble(f(i)))
    raw
  }

  test("compress/decompress round trip (compressible + incompressible)") {
    val smooth = doubles(512)(i => i / 7.0) // high lanes near-constant
    assert(Blosc.decompress(Blosc.compress(smooth, 8)).toSeq == smooth.toSeq)
    assert(Blosc.compress(smooth, 8).length < smooth.length, "lz4 should pay here")
    // pseudo-random bytes: memcpyed fallback must round trip too
    val rnd = new Array[Byte](4096)
    var x = 123456789L
    (0 until 4096).foreach { i =>
      x = x * 6364136223846793005L + 1442695040888963407L
      rnd(i) = (x >>> 56).toByte
    }
    assert(Blosc.decompress(Blosc.compress(rnd, 8)).toSeq == rnd.toSeq)
    // empty buffer
    assert(Blosc.decompress(Blosc.compress(Array.emptyByteArray, 8)).isEmpty)
  }

  test("hand-built split multi-block lz4 frame (the numcodecs shape) decodes") {
    // 2048 bytes, typesize 8, blocksize 1024 → 2 blocks, each split into
    // 8 streams of 128 bytes (blocksize/typesize = 128 ≥ MIN_BUFFERSIZE)
    val typesize = 8
    val blocksize = 1024
    val raw = doubles(256)(i => (i % 16).toDouble) // repetitive → compresses
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()

    def shuffleBlock(src: Array[Byte], off: Int, len: Int): Array[Byte] = {
      // independent re-implementation of the byte shuffle for the test
      val out = new Array[Byte](len)
      val items = len / typesize
      for (i <- 0 until items; t <- 0 until typesize)
        out(t * items + i) = src(off + i * typesize + t)
      out
    }

    val body = new java.io.ByteArrayOutputStream()
    val bstarts = new Array[Int](2)
    var frameOff = 16 + 4 * 2 // header + bstarts table
    for (blk <- 0 until 2) {
      bstarts(blk) = frameOff
      val sh = shuffleBlock(raw, blk * blocksize, blocksize)
      val neblock = blocksize / typesize // 128 per lane stream
      for (lane <- 0 until typesize) {
        val streamMax = lz4.maxCompressedLength(neblock)
        val buf = new Array[Byte](streamMax)
        val csize = lz4.compress(sh, lane * neblock, neblock, buf, 0, streamMax)
        val head = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        if (csize < neblock) { // compressed stream
          head.putInt(0, csize); body.write(head.array())
          body.write(buf, 0, csize); frameOff += 4 + csize
        } else { // c-blosc stores the stream raw when lz4 doesn't pay
          head.putInt(0, neblock); body.write(head.array())
          body.write(sh, lane * neblock, neblock); frameOff += 4 + neblock
        }
      }
    }
    val payload = body.toByteArray
    val frame = new Array[Byte](16 + 8 + payload.length)
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    frame(0) = 2; frame(1) = 1
    frame(2) = (0x01 | (1 << 5)).toByte // byte-shuffle | lz4, split (no bit4)
    frame(3) = typesize.toByte
    bb.putInt(4, raw.length); bb.putInt(8, blocksize); bb.putInt(12, frame.length)
    bb.putInt(16, bstarts(0)); bb.putInt(20, bstarts(1))
    System.arraycopy(payload, 0, frame, 24, payload.length)

    assert(Blosc.decompress(frame).toSeq == raw.toSeq)
  }

  test("leftover block (shorter than blocksize) does not split") {
    // 1536 bytes at blocksize 1024 → block 1 is a 512-byte leftover with
    // ONE stream even though the frame is split-eligible otherwise
    val typesize = 8
    val blocksize = 1024
    val raw = doubles(192)(i => (i % 8).toDouble)
    val lz4 = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    def shuffleBlock(off: Int, len: Int): Array[Byte] = {
      val out = new Array[Byte](len)
      val items = len / typesize
      for (i <- 0 until items; t <- 0 until typesize)
        out(t * items + i) = raw(off + i * typesize + t)
      out
    }
    val body = new java.io.ByteArrayOutputStream()
    val bstarts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var frameOff = 16 + 8
    // block 0: split into 8 lanes
    val sh0 = shuffleBlock(0, blocksize)
    bstarts += frameOff
    for (lane <- 0 until typesize) {
      val ne = blocksize / typesize
      val buf = new Array[Byte](lz4.maxCompressedLength(ne))
      val cs = lz4.compress(sh0, lane * ne, ne, buf, 0, buf.length)
      val head = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      val (w, wl) = if (cs < ne) (buf, cs) else (sh0.slice(lane * ne, lane * ne + ne), ne)
      head.putInt(0, wl); body.write(head.array()); body.write(w, 0, wl)
      frameOff += 4 + wl
    }
    // block 1: 512-byte leftover, ONE stream
    val sh1 = shuffleBlock(blocksize, 512)
    bstarts += frameOff
    val buf1 = new Array[Byte](lz4.maxCompressedLength(512))
    val cs1 = lz4.compress(sh1, 0, 512, buf1, 0, buf1.length)
    val h1 = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    val (w1, wl1) = if (cs1 < 512) (buf1, cs1) else (sh1, 512)
    h1.putInt(0, wl1); body.write(h1.array()); body.write(w1, 0, wl1)

    val payload = body.toByteArray
    val frame = new Array[Byte](16 + 8 + payload.length)
    val bb = ByteBuffer.wrap(frame).order(ByteOrder.LITTLE_ENDIAN)
    frame(0) = 2; frame(1) = 1
    frame(2) = (0x01 | (1 << 5)).toByte
    frame(3) = typesize.toByte
    bb.putInt(4, raw.length); bb.putInt(8, blocksize); bb.putInt(12, frame.length)
    bb.putInt(16, bstarts(0)); bb.putInt(20, bstarts(1))
    System.arraycopy(payload, 0, frame, 24, payload.length)
    assert(Blosc.decompress(frame).toSeq == raw.toSeq)
  }

  test("zlib inner codec and memcpyed frames decode") {
    val raw = doubles(128)(i => i.toDouble)
    // zlib, one block, dont-split, no shuffle
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!d.finished()) zbuf.write(tmp, 0, d.deflate(tmp))
    val z = zbuf.toByteArray
    val f1 = new Array[Byte](16 + 4 + 4 + z.length)
    val b1 = ByteBuffer.wrap(f1).order(ByteOrder.LITTLE_ENDIAN)
    f1(0) = 2; f1(1) = 1; f1(2) = (0x10 | (3 << 5)).toByte; f1(3) = 8
    b1.putInt(4, raw.length); b1.putInt(8, raw.length); b1.putInt(12, f1.length)
    b1.putInt(16, 20); b1.putInt(20, z.length)
    System.arraycopy(z, 0, f1, 24, z.length)
    assert(Blosc.decompress(f1).toSeq == raw.toSeq)
    // memcpyed
    val f2 = new Array[Byte](16 + raw.length)
    val b2 = ByteBuffer.wrap(f2).order(ByteOrder.LITTLE_ENDIAN)
    f2(0) = 2; f2(1) = 1; f2(2) = 0x02; f2(3) = 8
    b2.putInt(4, raw.length); b2.putInt(8, raw.length); b2.putInt(12, f2.length)
    System.arraycopy(raw, 0, f2, 16, raw.length)
    assert(Blosc.decompress(f2).toSeq == raw.toSeq)
  }

  test("blosclz is rejected loudly") {
    val g = new Array[Byte](32)
    val gb = ByteBuffer.wrap(g).order(ByteOrder.LITTLE_ENDIAN)
    g(0) = 2; g(2) = 0x10; g(3) = 8 // blosclz (codec 0), dont-split
    gb.putInt(4, 8); gb.putInt(8, 8); gb.putInt(12, 32)
    gb.putInt(16, 20); gb.putInt(20, 4) // one stream, 4 "compressed" bytes
    assertThrows[RuntimeException](Blosc.decompress(g))
  }

  test("bit-shuffle hand vectors pin the c-blosc bit order") {
    // elem_size 1, n = 8: element e has ONLY bit e set, so plane p's
    // byte has exactly bit e set where element e's bit p is set — the
    // identity permutation on this vector (a classic transpose pin)
    val idVec = Array[Byte](1, 2, 4, 8, 16, 32, 64, 0x80.toByte)
    assert(graft.sources.Blosc.bitShuffleBuf(idVec, 1).toSeq == idVec.toSeq)
    // 8 elements all 0x01 -> plane 0 (byte 0, bit 0) = 0xFF, rest 0
    val ones = Array.fill[Byte](8)(1)
    val sh = graft.sources.Blosc.bitShuffleBuf(ones, 1)
    assert(sh(0) == 0xFF.toByte && sh.drop(1).forall(_ == 0), sh.toSeq.toString)
    // elem_size 2: element bytes interleave as planes byte0-bits then
    // byte1-bits — element 3 (0-based) with byte1 = 0x02 sets plane
    // (jj=1, ii=1) = plane 9, bit 3
    val two = new Array[Byte](16)
    two(2 * 3 + 1) = 0x02
    val sh2 = graft.sources.Blosc.bitShuffleBuf(two, 2)
    assert(sh2(9) == 0x08.toByte && sh2.patch(9, Nil, 1).forall(_ == 0),
      sh2.toSeq.toString)
    // non-multiple-of-8 element count: the trailing partial group is
    // stored VERBATIM (c-blosc: size -= size % 8, leftovers memcpy'd)
    val ragged = Array.tabulate[Byte](11)(i => (i * 37 + 5).toByte)
    val shr = graft.sources.Blosc.bitShuffleBuf(ragged, 1)
    assert(shr.drop(8).toSeq == ragged.drop(8).toSeq,
      "partial 8-element group must pass through unshuffled")
    // inverse property across shapes and typesizes
    val rnd = new scala.util.Random(0xb17)
    for (ts <- Seq(1, 2, 4, 8); n <- Seq(0, 1, 7, 8, 64, 129)) {
      val raw = Array.fill[Byte](ts * n)(rnd.nextInt().toByte)
      val fwd = graft.sources.Blosc.bitShuffleBuf(raw, ts)
      val back = new Array[Byte](raw.length)
      graft.sources.Blosc.bitUnshuffle(fwd, raw.length, ts, back, 0)
      assert(back.toSeq == raw.toSeq, s"ts=$ts n=$n")
    }
  }

  test("bit-shuffled lz4 frames round-trip end to end (incl. multi-block decode)") {
    // compressible doubles through the writer's single-block path
    val raw = new Array[Byte](8 * 999)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 999).foreach(i => bb.putDouble(8 * i, (i % 17).toDouble))
    val frame = Blosc.compress(raw, 8, bitShuffle = true)
    assert((frame(2) & 0x04) != 0 && (frame(2) & 0x01) == 0, "flags must say bit-shuffle")
    assert(frame.length < raw.length, "bit-shuffle + lz4 should compress this")
    assert(Blosc.decompress(frame).toSeq == raw.toSeq)
    // hand-built TWO-block bit-shuffled zlib frame: per-block transform,
    // ragged second block (the shape an external c-blosc writer emits)
    val n = 300 * 8 // 300 f8 elements
    val raw2 = Array.tabulate[Byte](n)(i => ((i * 131) % 251).toByte)
    val blocksize = 1600 // 200 elements; second block 100 elements
    def shufBlock(off: Int, len: Int): Array[Byte] =
      graft.sources.Blosc.bitShuffleBuf(
        java.util.Arrays.copyOfRange(raw2, off, off + len), 8)
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(6); d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream()
      val t = new Array[Byte](4096)
      while (!d.finished()) o.write(t, 0, d.deflate(t))
      d.end(); o.toByteArray
    }
    val c0 = deflate(shufBlock(0, 1600))
    val c1 = deflate(shufBlock(1600, 800))
    val frame2 = new Array[Byte](16 + 8 + 4 + c0.length + 4 + c1.length)
    val fb = ByteBuffer.wrap(frame2).order(ByteOrder.LITTLE_ENDIAN)
    frame2(0) = 2; frame2(1) = 1
    frame2(2) = (0x04 | 0x10 | (3 << 5)).toByte // bit-shuffle | dont-split | zlib
    frame2(3) = 8
    fb.putInt(4, n); fb.putInt(8, blocksize); fb.putInt(12, frame2.length)
    fb.putInt(16, 24); fb.putInt(20, 24 + 4 + c0.length) // bstarts
    fb.putInt(24, c0.length)
    System.arraycopy(c0, 0, frame2, 28, c0.length)
    fb.putInt(28 + c0.length, c1.length)
    System.arraycopy(c1, 0, frame2, 32 + c0.length, c1.length)
    assert(Blosc.decompress(frame2).toSeq == raw2.toSeq,
      "multi-block bit-shuffle decode diverged")
  }
}
