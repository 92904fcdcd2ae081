package graft.codec

import java.io.{ByteArrayOutputStream}

/** Variable-length + zig-zag integer codecs.
  *
  * Semantics replicate the reference's VByte varints
  * (`core/store/dataio.go` WriteUvarint: 7 bits per byte, low bits first,
  * high-bit continuation) and zig-zag (`core/util/zigzag/`).
  * Pure Scala — used inside per-partition encode/decode kernels; never a UDF.
  */
object Varint {
  def writeUvarint(out: ByteArrayOutputStream, value0: Long): Unit = {
    var value = value0
    while ((value & ~0x7FL) != 0L) {
      out.write(((value & 0x7F) | 0x80).toInt)
      value >>>= 7
    }
    out.write(value.toInt)
  }

  /** Read an unsigned varint from `buf` at `pos`; returns (value, newPos). */
  def readUvarint(buf: Array[Byte], pos: Int): (Long, Int) = {
    var p = pos
    var shift = 0
    var result = 0L
    var b = 0
    do {
      b = buf(p) & 0xFF
      result |= (b & 0x7FL) << shift
      shift += 7
      p += 1
    } while ((b & 0x80) != 0)
    (result, p)
  }

  @inline def zigzagEncode(v: Long): Long = (v << 1) ^ (v >> 63)
  @inline def zigzagDecode(v: Long): Long = (v >>> 1) ^ -(v & 1L)
}

/** Monotonic block codec — the role of the reference's
  * `MonotonicBlockPackedWriter` (`core/util/packed/monotonic.go` idea:
  * approximate a monotone sequence by a linear model and pack only the
  * residuals). Layout: zigzag-varint(first), zigzag-varint(avgSlope), then a
  * [[ForBlock]] of the residuals `v_i - (first + i*avgSlope)`. For a dense
  * ascending docId run the residuals sit near zero — a couple of bits per
  * value versus FOR's log2(range) — and the composition reuses ForBlock's
  * property-tested bit packing. Works for ANY Long sequence (residual FOR
  * is sign-safe); it only COMPRESSES well when the input is near-linear.
  */
object MonotonicBlock {
  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length + 8)
    Varint.writeUvarint(out, values.length.toLong)
    if (values.isEmpty) return out.toByteArray
    val first = values(0)
    val avg = if (values.length == 1) 0L else (values(values.length - 1) - first) / (values.length - 1)
    Varint.writeUvarint(out, Varint.zigzagEncode(first))
    Varint.writeUvarint(out, Varint.zigzagEncode(avg))
    val residuals = new Array[Long](values.length)
    var i = 0
    while (i < values.length) { residuals(i) = values(i) - (first + i * avg); i += 1 }
    val packed = ForBlock.encode(residuals)
    out.write(packed, 0, packed.length)
    out.toByteArray
  }

  def decode(buf: Array[Byte]): Array[Long] = {
    val (nL, p0) = Varint.readUvarint(buf, 0)
    val n = nL.toInt
    if (n == 0) return Array.emptyLongArray
    val (zf, p1) = Varint.readUvarint(buf, p0)
    val (za, p2) = Varint.readUvarint(buf, p1)
    val first = Varint.zigzagDecode(zf)
    val avg = Varint.zigzagDecode(za)
    // decode residuals in place (an offset read, not a tail copy — this
    // runs per block on the hot query path)
    val residuals = ForBlock.decode(buf, p2)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = first + i * avg + residuals(i); i += 1 }
    out
  }
}

/** Shared decoders of a posting block's per-occurrence streams — ONE
  * implementation of each on-disk layout, used by the query-side readers
  * (`TermReader`) and the compaction rewrites (`Compaction`). CheckIndex
  * deliberately keeps its own validation walk (an integrity checker that
  * reused the production decoder would inherit its bugs).
  *
  * Positions stream: per posting, freq varint deltas (first absolute, then
  * gaps) — `core/index/freqproxtermswriterperfield.go:96-122`.
  * Offsets stream: per occurrence varint(start - prevStart) [prevStart
  * resets per posting] + varint(end - start) — same file, offsets branch.
  */
object ProxStreams {
  /** (flat ascending positions, per-posting run starts; n(freqs)+1 entries). */
  def decodePositions(posBytes: Array[Byte], freqs: Array[Int]): (Array[Int], Array[Int]) = {
    var total = 0
    var j = 0
    while (j < freqs.length) { total += freqs(j); j += 1 }
    val flat = new Array[Int](total)
    val starts = new Array[Int](freqs.length + 1)
    var p = 0
    var w = 0
    j = 0
    while (j < freqs.length) {
      starts(j) = w
      var prev = 0
      var k = 0
      while (k < freqs(j)) {
        val (delta, p2) = Varint.readUvarint(posBytes, p)
        prev += delta.toInt
        flat(w) = prev
        w += 1; p = p2; k += 1
      }
      j += 1
    }
    starts(freqs.length) = w
    (flat, starts)
  }

  /** (flat start offsets, flat end offsets, per-posting run starts). */
  def decodeOffsets(offBytes: Array[Byte], freqs: Array[Int]): (Array[Int], Array[Int], Array[Int]) = {
    var total = 0
    var j = 0
    while (j < freqs.length) { total += freqs(j); j += 1 }
    val fs = new Array[Int](total)
    val fe = new Array[Int](total)
    val starts = new Array[Int](freqs.length + 1)
    var p = 0
    var w = 0
    j = 0
    while (j < freqs.length) {
      starts(j) = w
      var prevStart = 0
      var k = 0
      while (k < freqs(j)) {
        val (ds, p1) = Varint.readUvarint(offBytes, p)
        val (len, p2) = Varint.readUvarint(offBytes, p1)
        val s = prevStart + ds.toInt
        fs(w) = s
        fe(w) = s + len.toInt
        prevStart = s
        w += 1; p = p2; k += 1
      }
      j += 1
    }
    starts(freqs.length) = w
    (fs, fe, starts)
  }

  /** Payload stream: per occurrence varint(payloadLen) + payloadLen raw
    * bytes, aligned with the positions stream (the reference's per-position
    * payload encoding, `core/index/freqproxtermswriterperfield.go:96-122`:
    * `posDelta<<1 | hasPayload` then length + bytes; our layout always
    * writes the length, 0 = empty payload).
    * @return (per-occurrence payload byte arrays, per-posting run starts;
    *         n(freqs)+1 entries)
    */
  def decodePayloads(payBytes: Array[Byte], freqs: Array[Int]): (Array[Array[Byte]], Array[Int]) = {
    var total = 0
    var j = 0
    while (j < freqs.length) { total += freqs(j); j += 1 }
    val out = new Array[Array[Byte]](total)
    val starts = new Array[Int](freqs.length + 1)
    var p = 0
    var w = 0
    j = 0
    while (j < freqs.length) {
      starts(j) = w
      var k = 0
      while (k < freqs(j)) {
        val (len, p1) = Varint.readUvarint(payBytes, p)
        out(w) = java.util.Arrays.copyOfRange(payBytes, p1, p1 + len.toInt)
        p = p1 + len.toInt
        w += 1; k += 1
      }
      j += 1
    }
    starts(freqs.length) = w
    (out, starts)
  }
}

/** Frame-of-reference bit-packed block codec.
  *
  * Mirrors the layout idea of the reference's `BlockPackedWriter`
  * (`core/util/packed/blockpacked.go:15-75`): per block a header token
  * `(bitsPerValue << 1) | minIsZero`, a zig-zag varint minimum when present,
  * then the deltas-from-min bit-packed at `bitsPerValue`. We do not copy the
  * file format — this is our own byte layout with the same FOR semantics.
  */
object ForBlock {
  /** Encode `values` (non-negative not required; min-offset handles sign). */
  def encode(values: Array[Long]): Array[Byte] = {
    val out = new ByteArrayOutputStream(values.length + 8)
    Varint.writeUvarint(out, values.length.toLong)
    if (values.isEmpty) return out.toByteArray
    var min = Long.MaxValue
    var i = 0
    while (i < values.length) { if (values(i) < min) min = values(i); i += 1 }
    var maxDelta = 0L
    i = 0
    while (i < values.length) { val d = values(i) - min; if (d > maxDelta) maxDelta = d; i += 1 }
    val bpvRaw = if (maxDelta == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(maxDelta)
    // accumulator-based packing is correct up to 56 bits; wider values are
    // stored raw (8 LE bytes each, bpv sentinel 64)
    val bpv = if (bpvRaw > 56) 64 else bpvRaw
    val minIsZero = if (min == 0L) 1 else 0
    out.write((bpv << 1) | minIsZero)
    if (minIsZero == 0) Varint.writeUvarint(out, Varint.zigzagEncode(min))
    if (bpv == 64) {
      i = 0
      while (i < values.length) {
        val d = values(i) - min
        var k = 0
        while (k < 8) { out.write(((d >>> (k * 8)) & 0xFF).toInt); k += 1 }
        i += 1
      }
    } else if (bpv > 0) {
      // bit-pack deltas LSB-first into a long accumulator
      var acc = 0L
      var accBits = 0
      i = 0
      while (i < values.length) {
        val d = values(i) - min
        acc |= (d << accBits)
        accBits += bpv
        if (accBits >= 64) {
          var k = 0
          while (k < 8) { out.write(((acc >>> (k * 8)) & 0xFF).toInt); k += 1 }
          accBits -= 64
          acc = if (accBits == 0) 0L else (d >>> (bpv - accBits))
        }
        i += 1
      }
      if (accBits > 0) {
        val nBytes = (accBits + 7) / 8
        var k = 0
        while (k < nBytes) { out.write(((acc >>> (k * 8)) & 0xFF).toInt); k += 1 }
      }
    }
    out.toByteArray
  }

  def decode(buf: Array[Byte], from: Int = 0): Array[Long] = {
    var (nL, p) = Varint.readUvarint(buf, from)
    val n = nL.toInt
    if (n == 0) return Array.emptyLongArray
    val header = buf(p) & 0xFF; p += 1
    val bpv = header >>> 1
    val minIsZero = (header & 1) == 1
    var min = 0L
    if (!minIsZero) {
      val (zz, p2) = Varint.readUvarint(buf, p)
      min = Varint.zigzagDecode(zz); p = p2
    }
    val out = new Array[Long](n)
    if (bpv == 0) {
      java.util.Arrays.fill(out, min)
      return out
    }
    if (bpv == 64) {
      var i = 0
      while (i < n) {
        var d = 0L
        var k = 0
        while (k < 8) { d |= (buf(p) & 0xFFL) << (k * 8); p += 1; k += 1 }
        out(i) = d + min
        i += 1
      }
      return out
    }
    val mask = (1L << bpv) - 1L
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < n) {
      while (accBits < bpv) {
        acc |= (buf(p) & 0xFFL) << accBits
        accBits += 8
        p += 1
      }
      val d = acc & mask
      acc = acc >>> bpv
      accBits -= bpv
      out(i) = d + min
      i += 1
    }
    out
  }
}
