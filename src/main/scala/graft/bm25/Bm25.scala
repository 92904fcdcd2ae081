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
