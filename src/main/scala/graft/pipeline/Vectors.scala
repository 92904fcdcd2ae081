package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-column operators (similarity search + near-dup) for the
  * LLM-training-pipeline side of the engine. Vectors are `array<float>`
  * columns; all similarity math accumulates in Double with a fixed
  * sequential op order so results are reproducible across runs and
  * replicable by the DuckDB oracles.
  */
object VectorOps {
  /** Cosine similarity, one sequential pass (dot + both norms). */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def normalize(a: Array[Float]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < a.length) { n += a(i).toDouble * a(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    Array.tabulate(a.length)(j => a(j) * inv)
  }
}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — ONE narrow map (cosine per row,
  * query vector in the task closure) followed by `orderBy().limit(k)`,
  * which Catalyst executes as TakeOrderedAndProject: a per-partition
  * bounded heap + driver merge of partitions × k rows. No shuffle of the
  * corpus; this IS the exhaustive oracle and the correctness reference.
  *
  * Scale path: IVF (inverted-file) partition pruning — spherical k-means
  * centroids (deterministic init + Lloyd iterations), vectors stored in
  * parquet PARTITIONED BY centroid; a query ranks centroids, probes only
  * the nProbe nearest partitions (parquet partition pruning: non-probed
  * buckets are never read), exact cosine within them. Results are
  * rank-identical to brute force RESTRICTED to the probed buckets
  * (property-tested); recall vs full brute force is the standard IVF
  * trade driven by nProbe.
  */
object Ann {

  /** Exact top-k by cosine (ordered by 6dp-rounded cosine desc, id asc —
    * rounding-first keeps ranks stable across fp paths). */
  def bruteForceTopK(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    import spark.implicits._
    emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, VectorOps.cosine(v, query)) }
      .toDF("vec_id", "c")
      .select(col("vec_id"), round(col("c"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic spherical k-means: init = the k lowest-id vectors
    * (normalized), then `iters` Lloyd steps (assign by max cosine, new
    * centroid = normalized mean). Centroid count is driver-small by
    * design (the IVF coarse quantizer).
    */
  def trainCentroids(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
                     k: Int, iters: Int = 3): Array[Array[Double]] = {
    import spark.implicits._
    val vecs: Dataset[(Long, Array[Float])] = emb
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
    var centroids: Array[Array[Double]] =
      vecs.orderBy("id").limit(k).collect().map { case (_, v) => VectorOps.normalize(v) }
    var it = 0
    while (it < iters) {
      val cs = centroids
      val sums = vecs.map { case (_, v) =>
        (Ivf.assign(cs, v), VectorOps.normalize(v))
      }.rdd.reduceByKey { (a, b) =>
        val out = new Array[Double](a.length)
        var j = 0
        while (j < a.length) { out(j) = a(j) + b(j); j += 1 }
        out
      }.collect()
      val next = centroids.clone()
      sums.foreach { case (cid, sum) =>
        var n = 0.0
        var j = 0
        while (j < sum.length) { n += sum(j) * sum(j); j += 1 }
        if (n > 0) next(cid) = sum.map(_ / math.sqrt(n))
      }
      centroids = next
      it += 1
    }
    centroids
  }
}

object Ivf {
  /** Nearest centroid by dot with the normalized vector (= max cosine). */
  def assign(centroids: Array[Array[Double]], v: Array[Float]): Int = {
    val nv = VectorOps.normalize(v)
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var j = 0
      val cen = centroids(c)
      while (j < cen.length) { d += cen(j) * nv(j); j += 1 }
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Build the IVF store: vectors written to parquet PARTITIONED BY their
    * centroid assignment — probing prunes whole directories at scan time.
    * The trained centroids are PERSISTED beside the partitioned vectors
    * (`_centroids` parquet — the underscore prefix hides it from Spark's
    * partition discovery), so a search service reopens the store with
    * [[load]] instead of re-training or side-channeling the quantizer.
    * Returns the trained centroids (driver-small).
    */
  def build(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
            dir: String, nCentroids: Int, iters: Int = 3): Array[Array[Double]] = {
    import spark.implicits._
    val centroids = Ann.trainCentroids(spark, emb, idCol, vecCol, nCentroids, iters)
    emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (Ivf.assign(centroids, v), id, v) }
      .toDF("centroid", "vec_id", "v")
      .write.mode("overwrite").partitionBy("centroid").parquet(dir)
    centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("cid", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_centroids")
    centroids
  }

  /** Reopen a committed IVF store: read the persisted coarse quantizer back
    * (cid-ordered). Searches over the reloaded store are identical to
    * searches over the just-built one (AnnSpec reopen test). */
  def load(spark: SparkSession, dir: String): Array[Array[Double]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/_centroids")
      .select(col("cid"), col("centroid"))
      .as[(Int, Array[Double])]
      .collect().sortBy(_._1).map(_._2)
  }

  /** Probe the nProbe centroid partitions nearest to the query and return
    * the exact top-k within them. The isin predicate on the partition
    * column prunes non-probed directories from the scan entirely.
    */
  def search(spark: SparkSession, dir: String, centroids: Array[Array[Double]],
             query: Array[Float], nProbe: Int, k: Int): DataFrame = {
    import spark.implicits._
    val probed = probeSet(centroids, query, nProbe)
    spark.read.parquet(dir)
      .where(col("centroid").isin(probed: _*))
      .select(col("vec_id"), col("v"))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, VectorOps.cosine(v, query)) }
      .toDF("vec_id", "c")
      .select(col("vec_id"), round(col("c"), 6).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** The nProbe centroid ids nearest to the query (ranked by cosine). */
  def probeSet(centroids: Array[Array[Double]], query: Array[Float], nProbe: Int): Seq[Int] = {
    val nq = VectorOps.normalize(query)
    centroids.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.length) { d += c(j) * nq(j); j += 1 }
      (i, d)
    }.sortBy { case (i, d) => (-d, i) }.take(nProbe).map(_._1).toSeq
  }
}

/** Embedding near-duplicate pairs: random-hyperplane (sign) LSH with
  * deterministic ±1 hyperplanes, candidates = pairs sharing >= 1 of the T
  * h-bit sketches, verified with the EXACT cosine before reporting. The
  * hyperplane signs come from a closed-form integer mix so any system
  * (the DuckDB oracle does) can recompute the identical buckets — the
  * operator's output is exactly reproducible, bucketing included.
  *
  * Recall follows 1-(1-p^h)^T with p = 1 - theta/pi: near-noise pairs
  * (cos 0.4, this synthetic corpus) see ~0.7; real near-duplicates
  * (cos >= 0.9, p = 0.856) are found with prob > 0.999998 at the
  * defaults. Missed pairs are the ONLY approximation — reported pairs
  * carry exact cosine.
  */
object EmbeddingNearDup {

  /** +1/-1 hyperplane component for (table t, bit b, component j) of a
    * dim-dimensional vector. The stride is `dim` so distinct (bit, j)
    * pairs never collide — a fixed stride smaller than dim would alias
    * components across bits and correlate the sketch bits (recall would
    * silently fall below the documented curve). dim=64 reproduces the q38
    * oracle's formula exactly. */
  def sign(t: Int, b: Int, j: Int, h: Int, dim: Int = 64): Double = {
    val idx = ((t.toLong * h + b) * dim + j + 1)
    if ((idx * 2654435761L) % 4294967296L >= 2147483648L) 1.0 else -1.0
  }

  /** Dense sign table for (tables × h × dim) — precomputed once per
    * executor task instead of re-deriving the integer mix per component
    * per vector (T·h·d multiplies/mods per vector add up at 10^9 rows). */
  def signTable(tables: Int, h: Int, dim: Int): Array[Double] = {
    val tab = new Array[Double](tables * h * dim)
    var t = 0
    while (t < tables) {
      var b = 0
      while (b < h) {
        var j = 0
        while (j < dim) {
          tab((t * h + b) * dim + j) = sign(t, b, j, h, dim)
          j += 1
        }
        b += 1
      }
      t += 1
    }
    tab
  }

  /** h-bit sketch of v under table t (tab from [[signTable]] with the same
    * dim; falls back to on-the-fly signs when tab is null). */
  def sketch(v: Array[Float], t: Int, h: Int, tab: Array[Double] = null, dim: Int = 0): Long = {
    var key = 0L
    var b = 0
    while (b < h) {
      var s = 0.0
      var j = 0
      if (tab != null) {
        val off = (t * h + b) * dim
        while (j < v.length) { s += tab(off + j) * v(j); j += 1 }
      } else {
        while (j < v.length) { s += sign(t, b, j, h, v.length) * v(j); j += 1 }
      }
      if (s > 0) key |= (1L << b)
      b += 1
    }
    key
  }

  def pairs(spark: SparkSession, emb: DataFrame, idCol: String, vecCol: String,
            tau: Double, h: Int = 6, tables: Int = 32,
            maxBucket: Int = 100000): DataFrame = {
    import spark.implicits._
    val vecs = emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("v"))
      .as[(Long, Array[Float])]
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val buckets = vecs.mapPartitions { it =>
        var tab: Array[Double] = null
        var dim = 0
        it.flatMap { case (id, v) =>
          if (tab == null || dim != v.length) { dim = v.length; tab = signTable(tables, h, dim) }
          val localTab = tab
          val localDim = dim
          (0 until tables).iterator.map(t => (t, sketch(v, t, h, localTab, localDim), id))
        }
      }.toDF("t", "key", "vec_id")
      val dropped = spark.sparkContext.longAccumulator("embed-lsh-dropped-ids")
      val cand = buckets.as[(Int, Long, Long)]
        .groupByKey(r => (r._1, r._2))
        .flatMapGroups { (_, it) =>
          LshBuckets.boundedPairs(it.map(_._3).toArray, maxBucket, d => dropped.add(d.toLong))
        }
        .distinct()
        .toDF("vec_a", "vec_b")
      // exact-cosine verification over candidate pairs only
      val va = vecs.toDF("vec_a", "xa")
      val vb = vecs.toDF("vec_b", "xb")
      val verified = cand.join(va, "vec_a").join(vb, "vec_b")
        .as[(Long, Long, Array[Float], Array[Float])]
        .map { case (b, a, xa, xb) => (a, b, VectorOps.cosine(xa, xb)) }
        .toDF("vec_a", "vec_b", "c")
        .where(col("c") >= tau)
        .select(col("vec_a"), col("vec_b"), round(col("c"), 6).as("cosine"))
        .orderBy("vec_a", "vec_b")
      val out = verified.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out.count()
      LshBuckets.warnIfDropped("EmbeddingNearDup.pairs", dropped)
      out
    } finally vecs.unpersist(blocking = false)
  }
}
