package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** The "no silent caps" contract: a truncated LSH bucket reports exactly how
  * many ids it dropped, and the operators surface the count after the run.
  */
class LshCapSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("boundedPairs reports dropped ids and pairs only the kept prefix") {
    var dropped = 0
    val pairs = LshBuckets.boundedPairs(Array(5L, 1L, 4L, 2L, 3L), 3, d => dropped += d).toVector
    assert(dropped == 2)
    assert(pairs == Vector((1L, 2L), (1L, 3L), (2L, 3L)))
    // under the cap: no report
    var dropped2 = 0
    LshBuckets.boundedPairs(Array(2L, 1L), 3, d => dropped2 += d).toVector
    assert(dropped2 == 0)
    var dropped3 = 0
    val pw = LshBuckets.boundedPairsWith(Array((9L, "x"), (7L, "y"), (8L, "z")), 2,
      d => dropped3 += d).toVector
    assert(dropped3 == 1 && pw == Vector(((7L, "y"), (8L, "z"))))
  }

  test("a synthetic hot bucket truncates with an audited count, and the kept prefix is still verified") {
    import spark.implicits._
    // six IDENTICAL docs => every band-bucket holds all six ids; cap at 3
    val docs = (0L until 6L).map(i =>
      (i, "alpha beta gamma delta epsilon zeta eta theta iota kappa")).toDF("doc_id", "text")
    val out = MinHashLsh.nearDuplicates(spark, docs, "doc_id", "text",
      MinHashLsh.Params(maxBucket = 3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // only the 3 smallest ids survive the cap in every bucket -> their pairs
    assert(out == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    // and with the cap lifted, all 15 pairs of the 6 identical docs appear
    val full = MinHashLsh.nearDuplicates(spark, docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full.size == 15)
  }
}
