package graft.bm25

/** BM25 similarity replicating lucene-go's `BM25Similarity` bit-for-bit.
  *
  * Math (reference `core/search/similaritybm25.go`):
  *  - idf(n, N) = ln(1 + (N - n + 0.5) / (n + 0.5))          (`:250-252`)
  *    where N = docCount (docs having the field), NOT maxDoc  (`:136-141`)
  *  - avgdl = sumTotalTermFreq / docCount                     (`:255-257`)
  *  - weight = boost * idf                                    (`:160-175`)
  *  - cache[i] = 1 / (k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl))
  *    with LENGTH_TABLE[i] = i (identity, 0..255)             (`:176-199,14-28`)
  *  - score(freq, norm) = w - w / (1 + freq * cache[norm & 0xFF])  (`:235-246`)
  *
  * Quirk Q1 (rank-identity critical, SURVEY.md §2.4): lucene-go stores the
  * raw field length as the norm and masks `norm & 0xFF` against an identity
  * table, so the effective doc length is `fieldLength mod 256` — this
  * differs from Java Lucene's SmallFloat encoding and is replicated here
  * because lucene-go is the stated oracle.
  *
  * Determinism: scores are computed in plain Scala `Double` arithmetic with
  * the reference's exact operation order; never re-associated by Catalyst.
  */
object Bm25 {
  val K1: Double = 1.2
  val B: Double = 0.75

  def idf(docFreq: Long, docCount: Long): Double =
    math.log(1.0 + (docCount - docFreq + 0.5) / (docFreq + 0.5))

  def avgFieldLength(sumTotalTermFreq: Long, docCount: Long): Double =
    sumTotalTermFreq.toDouble / docCount.toDouble

  /** Per-term norm cache: cache(i) = 1 / (k1*((1-b) + b*i/avgdl)).
    * One array per (query, avgdl); shared across terms (weight factors out).
    */
  def buildCache(avgdl: Double, k1: Double = K1, b: Double = B): Array[Double] = {
    val cache = new Array[Double](256)
    var i = 0
    while (i < 256) {
      cache(i) = 1.0 / (k1 * ((1 - b) + b * i.toDouble / avgdl))
      i += 1
    }
    cache
  }

  /** Norm cache for an arbitrary byte->length decoding (the
    * [[NormMode]]-aware variant): cache(i) = 1/(k1*((1-b) + b·L[i]/avgdl))
    * with L = the mode's LENGTH_TABLE. [[buildCache]] is the Mod256
    * (identity-table) special case — bit-identical to it for that mode. */
  def buildCacheFor(normMode: String, avgdl: Double,
                    k1: Double = K1, b: Double = B): Array[Double] = {
    val table = NormMode.lengthTable(normMode)
    val cache = new Array[Double](256)
    var i = 0
    while (i < 256) {
      cache(i) = 1.0 / (k1 * ((1 - b) + b * table(i).toDouble / avgdl))
      i += 1
    }
    cache
  }

  /** score = weight - weight / (1 + freq * cache[normByte]); normByte must
    * already be `(fieldLength & 0xFF)`. Reference `similaritybm25.go:235-246`.
    */
  @inline def score(weight: Double, freq: Int, normByte: Int, cache: Array[Double]): Double =
    weight - weight / (1.0 + freq.toDouble * cache(normByte))

  /** Fractional-freq variant (sloppy-phrase freq is a sum of 1/(1+width)
    * increments). Bit-identical to [[score]] for whole freqs. */
  @inline def scoreF(weight: Double, freq: Double, normByte: Int, cache: Array[Double]): Double =
    weight - weight / (1.0 + freq * cache(normByte))
}

/** Norm (field-length) byte encodings — SURVEY.md §2.4 Q1's two worlds:
  *
  *  - [[Mod256]] (default, the ORACLE-PARITY mode): lucene-go stores the raw
  *    field length and masks `norm & 0xFF` against an identity LENGTH_TABLE
  *    (`core/search/similaritybm25.go:14-28,243`), so the effective length
  *    is `fieldLength mod 256` — replicated because lucene-go is the stated
  *    oracle.
  *  - [[JavaLucene]]: Java Lucene's `SmallFloat.intToByte4` 4-bit-mantissa
  *    float encoding — lossless for lengths < 24, lossy-monotone above —
  *    which is what BM25Similarity in Apache Lucene actually stores. Offered
  *    behind config for Java-Lucene score comparability; NOT the oracle mode.
  *
  * The mode is recorded in the index manifest; appends must match (a mixed
  * index would score the same length two different ways). Readers build the
  * BM25 norm cache from the mode's LENGTH_TABLE ([[Bm25.buildCacheFor]]).
  */
object NormMode {
  val Mod256 = "mod256"
  val JavaLucene = "javalucene"

  /** Encode a field length as the stored norm byte. */
  def encode(fieldLength: Int, mode: String): Byte = mode match {
    case Mod256 => (fieldLength & 0xFF).toByte
    case JavaLucene => SmallFloat.intToByte4(fieldLength)
    case other => throw new IllegalArgumentException(s"unknown norm mode '$other'")
  }

  /** LENGTH_TABLE of the mode: decoded field length per unsigned byte value
    * (the table BM25's norm cache is built over). */
  def lengthTable(mode: String): Array[Int] = mode match {
    case Mod256 => Array.tabulate(256)(identity)
    case JavaLucene => Array.tabulate(256)(i => SmallFloat.byte4ToInt(i.toByte))
    case other => throw new IllegalArgumentException(s"unknown norm mode '$other'")
  }
}

/** Java Lucene's `SmallFloat` int<->byte4 encoding (reimplemented from the
  * published algorithm: a float-like code with a 3-bit stored mantissa +
  * implicit leading bit and a shift exponent, where the first
  * `NUM_FREE_VALUES` byte values encode small integers exactly). Properties
  * (tested): exact for 0..23, monotone non-decreasing, and
  * `byte4ToInt(intToByte4(i)) <= i` with equality on representable values.
  */
object SmallFloat {
  private def longToInt4(i: Long): Int = {
    require(i >= 0, s"only non-negative lengths: $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      val encoded = (i >>> shift).toInt & 0x07 // drop the implicit leading bit
      encoded | ((shift + 1) << 3)             // shift+1: 0 marks subnormals
    }
  }

  private def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4 = longToInt4(Int.MaxValue.toLong)
  /** Byte values below this encode the integer identically (exact range). */
  val NumFreeValues: Int = 255 - MaxInt4

  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"norm length must be non-negative: $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  def byte4ToInt(b: Byte): Int = {
    val i = b & 0xFF
    if (i < NumFreeValues) i
    else Math.toIntExact(NumFreeValues + int4ToLong(i - NumFreeValues))
  }
}
