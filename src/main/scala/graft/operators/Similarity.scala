package graft.operators

import graft.functions.vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shape: the query set is always the small side — broadcast it,
  * scan the corpus exactly once, and keep only top-k per query. The
  * corpus is never shuffled in full: the row_number window operates on
  * (|queries| × |corpus|) scored rows *after* projection to
  * (query_id, id, cos) — 3 narrow columns — and at 1000 executors the
  * LSH variant cuts the scored space to candidate buckets only.
  */
object Similarity {

  /** Exact brute-force top-k cosine (the correctness baseline).
    * Cosine is rounded to 4dp before ranking, ties broken by id — so
    * ranking is reproducible across engines and partitionings.
    *
    * Ranking is the bounded [[graft.functions.TopKByScore]] aggregate,
    * not a row_number window: the window form shuffles every scored
    * row into |queries| reducers (skewed, unbounded memory) before
    * discarding all but k; the aggregate keeps ≤ k per query per map
    * task, so the shuffle is O(partitions·k) rows however large the
    * corpus.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String, k: Int): DataFrame =
    rankTopK(
      corpus.crossJoin(broadcast(queries))
        .select(col(qId), col(id),
          round(vector.cosine(col(vec), col(qVec)), 4).as("cos")),
      qId, id, k)

  /** groupBy(qId) + bounded top-k agg + explode back to ranked rows. */
  private def rankTopK(scored: DataFrame, qId: String, id: String, k: Int): DataFrame =
    scored
      .groupBy(col(qId))
      .agg(vector.topKBy(col("cos"), col(id).cast("long"), k).as("top"))
      .select(col(qId), explode(col("top")).as("t"))
      .select(col(qId), col("t.id").as(id), col("t.score").as("cos"),
        col("t.rank").as("rank"))

  /** Deterministic pseudo-gaussian hyperplanes (fixed seed). */
  private[graft] def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit bucket per band of `bits` random hyperplanes: returns
    * df + `bucket_<band>` int columns. Used both for ANN candidate
    * generation and as the blocking key for embedding dedup at scale.
    */
  def hyperplaneBuckets(df: DataFrame, vec: String, dim: Int,
      bits: Int, bands: Int, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(dim, bits * bands, seed)
    (0 until bands).foldLeft(df) { (d, bi) =>
      val key = (0 until bits).map { j =>
        val p = planes(bi * bits + j).toSeq
        when(vector.dot(col(vec), typedLit(p)) >= 0.0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      d.withColumn(s"bucket_$bi", key)
    }
  }

  /** Train IVF centroids on a deterministic corpus sample with local
    * Lloyd iterations (spherical k-means: assign by max dot on
    * normalized vectors, re-normalize means). Driver-side ON A SAMPLE
    * only — the standard IVF recipe (FAISS trains coarse quantizers on
    * a sample too): at 100 TB the corpus never participates in
    * training, only in the single distributed assignment pass.
    * Deterministic: sample = lowest xxhash64 ids, fixed seed init.
    */
  private[graft] def trainCentroids(corpus: DataFrame, vec: String,
      nCells: Int, dim: Int, sampleN: Int = 4096, iters: Int = 8): Array[Array[Double]] = {
    val sample = corpus
      .select(col(vec).as("v"), xxhash64(col(vec)).as("h"))
      .orderBy(col("h")).limit(sampleN)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= nCells, s"sample ${sample.length} smaller than nCells $nCells")
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    val points = sample.map(normalize)
    var centroids = points.take(nCells).map(_.clone())
    (0 until iters).foreach { _ =>
      val sums   = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Int](nCells)
      points.foreach { p =>
        var best = 0; var bestDot = Double.MinValue
        var c = 0
        while (c < nCells) {
          var d = 0.0; var j = 0
          while (j < dim) { d += p(j) * centroids(c)(j); j += 1 }
          if (d > bestDot) { bestDot = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old else normalize(sums(c))
      }
    }
    centroids
  }

  /** Array of `struct(-dot(vec, centroid_i), i)` — array_sort on it
    * orders cells best-first (struct sort is by first field asc), so
    * element 1 is the assignment and a slice is the probe list. Pure
    * codegen'd expressions via the native vec_dot.
    */
  private def cellRanking(vec: Column, centroids: Array[Array[Double]]): Column =
    array_sort(array(centroids.zipWithIndex.map { case (c, i) =>
      struct((-vector.dot(vec, typedLit(c.toSeq))).as("negdot"), lit(i).as("cell"))
    }: _*))

  /** Append the nearest-centroid `cell` id: trains spherical-k-means
    * centroids on a deterministic sample ([[trainCentroids]]), then
    * ONE map-only distributed pass assigns every row — no shuffle.
    * The blocking step shared by IVF ANN and SemDeDup-style
    * semantic dedup ([[Dedup.semanticNearDupPairs]]).
    */
  def assignCells(df: DataFrame, vec: String, dim: Int, nCells: Int,
      sampleN: Int = 4096): DataFrame = {
    val centroids = trainCentroids(df, vec, nCells, dim, sampleN)
    df.withColumn("cell",
      element_at(cellRanking(col(vec), centroids), 1).getField("cell"))
  }

  /** IVF (inverted-file) ANN — the cell-probing scale path:
    *
    *   1. train `nCells` spherical-k-means centroids on a sample
    *      (driver-side, see [[trainCentroids]]);
    *   2. ONE distributed pass assigns each corpus row its nearest
    *      cell (pure map, no shuffle);
    *   3. each query probes its `nProbe` nearest cells; candidates =
    *      corpus rows in probed cells (equi-join on cell id, queries
    *      broadcast);
    *   4. exact cosine re-rank via the bounded top-k aggregate.
    *
    * vs LSH: cells adapt to the data distribution (hyperplanes are
    * data-blind), so recall per candidate examined is typically
    * higher; the cost is the training step. Work scales with
    * |corpus|·nProbe/nCells per query instead of |corpus|.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String,
      dim: Int, k: Int, nCells: Int = 32, nProbe: Int = 4,
      sampleN: Int = 4096): DataFrame = {
    val centroids = trainCentroids(corpus, vec, nCells, dim, sampleN)
    val assigned = corpus.select(col(id), col(vec),
      element_at(cellRanking(col(vec), centroids), 1).getField("cell").as("cell"))
    val probes = queries.select(col(qId), col(qVec),
        explode(transform(slice(cellRanking(col(qVec), centroids), 1, nProbe),
          s => s.getField("cell"))).as("cell"))
    val cand = assigned.join(broadcast(probes), "cell")
    rankTopK(
      cand.select(col(qId), col(id),
        round(vector.cosine(col(vec), col(qVec)), 4).as("cos")),
      qId, id, k)
  }

  /** LSH-bucketed ANN: candidates = corpus rows sharing any band
    * bucket with the query; exact cosine re-rank within candidates.
    * Recall < 1 by design; raise `bands` (more candidates) or lower
    * `bits` (bigger buckets) to trade cost for recall.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String,
      dim: Int, k: Int, bits: Int = 4, bands: Int = 4): DataFrame = {
    val cb = hyperplaneBuckets(corpus, vec, dim, bits, bands)
    val qb = hyperplaneBuckets(queries, qVec, dim, bits, bands)
    val bandStruct = (d: DataFrame, idc: String, vc: String) =>
      d.select(col(idc), col(vc),
        explode(array((0 until bands).map(bi =>
          struct(lit(bi).as("band"), col(s"bucket_$bi").as("key"))): _*)).as("b"))
        .select(col(idc), col(vc), col("b.band").as("band"), col("b.key").as("key"))
    val c = bandStruct(cb, id, vec)
    val q = bandStruct(qb, qId, qVec)
    val cand = c.join(broadcast(q), Seq("band", "key"))
      .select(col(qId), col(qVec), col(id), col(vec)).distinct()
    rankTopK(
      cand.select(col(qId), col(id),
        round(vector.cosine(col(vec), col(qVec)), 4).as("cos")),
      qId, id, k)
  }

  /** Product-quantization codebooks: `m` subspaces × `ksub` L2
    * centroids each, trained with local Lloyd iterations on the same
    * deterministic lowest-xxhash64 sample as [[trainCentroids]] (the
    * FAISS recipe — codebooks come from a sample, the corpus only
    * pays the single distributed encode pass). Returned shape:
    * codebooks(j)(k) = centroid k of subspace j, each of dim/m floats.
    */
  private[graft] def trainPqCodebooks(corpus: DataFrame, vec: String, dim: Int,
      m: Int, ksub: Int, sampleN: Int = 4096, iters: Int = 8): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val dsub = dim / m
    val sample = corpus
      .select(col(vec).as("v"), xxhash64(col(vec)).as("h"))
      .orderBy(col("h")).limit(sampleN)
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= ksub, s"sample ${sample.length} smaller than ksub $ksub")
    (0 until m).toArray.map { j =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      var cents = pts.take(ksub).map(_.clone())
      (0 until iters).foreach { _ =>
        val sums   = Array.fill(ksub)(new Array[Double](dsub))
        val counts = new Array[Int](ksub)
        pts.foreach { p =>
          var best = 0; var bestD = Double.MaxValue; var c = 0
          while (c < ksub) {
            var d = 0.0; var i = 0
            while (i < dsub) { val t = p(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dsub) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
      }
      cents
    }
  }

  /** PQ encode: adds `<vec>_pq: array<int>` of m codes — per subspace
    * the argmin-L2 centroid, computed as argmax(x·c − ‖c‖²/2) so each
    * candidate is ONE codegen'd vec_dot on the sliced subvector plus
    * a literal. Entirely map-side; codebooks ride as expression
    * literals, no broadcast state. m bytes replace dim floats — the
    * 64-dim float32 embedding compresses 64× at ADC-search quality.
    */
  def pqEncode(df: DataFrame, vec: String, dim: Int,
      codebooks: Array[Array[Array[Double]]]): DataFrame = {
    val m = codebooks.length
    val dsub = dim / m
    df.withColumn(s"${vec}_pq", array((0 until m).map { j =>
      val sub = slice(col(vec), j * dsub + 1, dsub)
      element_at(array_sort(array(codebooks(j).zipWithIndex.map { case (c, k) =>
        struct((-(vector.dot(sub, typedLit(c.toSeq)) -
          lit(c.map(x => x * x).sum / 2.0))).as("negscore"), lit(k).as("code"))
      }: _*)), 1).getField("code")
    }: _*))
  }

  /** PQ ANN via asymmetric distance computation: queries score
    * against the RECONSTRUCTED corpus vectors (q·x̂ = Σⱼ qⱼ·c_{j,code}
    * — the ADC identity), so the search never touches the original
    * floats: one encode pass over the corpus, then a scan of the
    * O(m)-int code column per query with the bounded top-k aggregate.
    * The compressed-domain scale path between brute force (exact,
    * full floats) and IVF (pruned, full floats); recall floor vs
    * brute force asserted in RecallSpec.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String,
      dim: Int, k: Int, m: Int = 8, ksub: Int = 64,
      sampleN: Int = 4096): DataFrame = {
    val cbs = trainPqCodebooks(corpus, vec, dim, m, ksub, sampleN)
    val enc = pqEncode(corpus, vec, dim, cbs)
      .select(col(id), col(s"${vec}_pq").as("codes"))
    val cbLit = typedLit(cbs.map(_.map(_.toSeq).toSeq).toSeq)
    val xhat = flatten(transform(col("codes"), (c, j) =>
      element_at(element_at(cbLit, j + 1), c + 1)))
    val scored = enc.crossJoin(broadcast(queries))
      .select(col(qId), col(id),
        round(vector.cosine(col(qVec), xhat), 4).as("cos"))
    rankTopK(scored, qId, id, k)
  }

  /** IVF-PQ composed index: coarse cell pruning (IVF) over
    * PQ-compressed codes scored by asymmetric distance — the standard
    * billion-scale ANN layout (one coarse quantizer to skip
    * (1 − nProbe/nCells) of the corpus, m-byte codes instead of dim
    * floats for what remains). Codes quantize the RAW vectors
    * (by_residual = false), so the cell assignment and the codebooks
    * train independently from the same deterministic sample. Per
    * query the scan is |corpus|·nProbe/nCells code rows through the
    * bounded top-k aggregate; the original float column is never read
    * by the search — at 100 TB the float tier can live on cold
    * storage. Recall floor vs brute force asserted in RecallSpec
    * (compounds the IVF pruning loss and the PQ reconstruction loss).
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame,
      id: String, vec: String, qId: String, qVec: String,
      dim: Int, k: Int, nCells: Int = 32, nProbe: Int = 4,
      m: Int = 8, ksub: Int = 64, sampleN: Int = 4096): DataFrame = {
    val centroids = trainCentroids(corpus, vec, nCells, dim, sampleN)
    val cbs = trainPqCodebooks(corpus, vec, dim, m, ksub, sampleN)
    val enc = pqEncode(corpus, vec, dim, cbs)
      .select(col(id), col(s"${vec}_pq").as("codes"),
        element_at(cellRanking(col(vec), centroids), 1).getField("cell").as("cell"))
    val probes = queries.select(col(qId), col(qVec),
      explode(transform(slice(cellRanking(col(qVec), centroids), 1, nProbe),
        s => s.getField("cell"))).as("cell"))
    val cbLit = typedLit(cbs.map(_.map(_.toSeq).toSeq).toSeq)
    val xhat = flatten(transform(col("codes"), (c, j) =>
      element_at(element_at(cbLit, j + 1), c + 1)))
    val cand = enc.join(broadcast(probes), "cell")
    rankTopK(
      cand.select(col(qId), col(id),
        round(vector.cosine(col(qVec), xhat), 4).as("cos")),
      qId, id, k)
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127,
    * q = round(x/scale) as a byte array. A float32 embedding store is
    * 4× the bytes of int8 at ≲1% cosine error — at 100 TB of
    * embeddings that is the difference between one storage tier and
    * the next. Adds `<vec>_q8: array<tinyint>` + `<vec>_scale: float`;
    * all-zero vectors quantize to zeros (scale 0, no division).
    * Pure expression work (one interpreted HOF pass per row over a
    * pre-materialized array — the §5b-safe HOF shape).
    */
  /** Johnson–Lindenstrauss random projection: `vec` (dim `dim`) →
    * `<vec>_rp` (dim `outDim`) through a fixed pseudo-gaussian matrix
    * scaled 1/√outDim — the dimensionality-reduction front of a
    * coarse-then-fine ANN pipeline (project, search cheap in k dims,
    * re-rank exact in d dims). ENTIRELY map-side: one codegen'd
    * `vec_dot` against a literal row per output component, no
    * shuffle, matrix fixed by (dim, outDim, seed) so executors need
    * no broadcast state. Distance/angle preservation is asserted
    * empirically in SimilaritySpec (JL: ε ~ √(ln n / outDim)).
    */
  def randomProject(df: DataFrame, vec: String, dim: Int, outDim: Int,
      seed: Long = 11L): DataFrame = {
    val planes = hyperplanes(dim, outDim, seed)
    val scale = 1.0 / math.sqrt(outDim)
    df.withColumn(s"${vec}_rp", array(planes.toIndexedSeq.map(p =>
      vector.dot(col(vec), typedLit(p.toSeq)) * scale): _*))
  }

  def quantizeInt8(df: DataFrame, vec: String): DataFrame = {
    val scale = (array_max(transform(col(vec), x => abs(x))) / lit(127.0f)).cast("float")
    df.withColumn(s"${vec}_scale", scale)
      .withColumn(s"${vec}_q8",
        when(col(s"${vec}_scale") > 0.0f,
          transform(col(vec), x =>
            round(x.cast("double") / col(s"${vec}_scale")).cast("byte")))
          .otherwise(transform(col(vec), _ => lit(0).cast("byte"))))
  }

  /** Inverse of [[quantizeInt8]]: `<vec>_deq: array<float>` ≈ the
    * original within scale/2 per element.
    */
  def dequantizeInt8(df: DataFrame, vec: String): DataFrame =
    df.withColumn(s"${vec}_deq",
      transform(col(s"${vec}_q8"),
        x => (x.cast("float") * col(s"${vec}_scale")).cast("float")))

  /** FULL-CORPUS distributed spherical k-means (Lloyd's) — the topic-
    * clustering operator for mixture curation, vs [[trainCentroids]]
    * which fits on a driver-side sample (the IVF recipe). Every
    * iteration is one distributed pass:
    *
    *   - assignment: map-side argmax dot against the k·dim centroid
    *     LITERALS baked into codegen'd `vec_dot` calls — no shuffle,
    *     no broadcast state to manage;
    *   - re-estimation: posexplode to (cell, dim, x) and ONE
    *     partial-agg shuffle of per-(cell, dim) sums — the shuffle
    *     carries O(partitions·k·dim) aggregate rows, never vectors;
    *   - the k·dim new means come to the driver (same O(k·dim)
    *     footprint PageRank's dangling-mass frame rides at), are
    *     re-normalized, and seed the next iteration. Empty cells keep
    *     their centroid.
    *
    * Deterministic init from the xxhash64-ordered sample. Iterations
    * rescan the input projection — at 100 TB persist the normalized
    * projection once upstream (here the memoized Tables cache already
    * serves that role).
    *
    * Returns (id, cell, cos) — the assignment plus its centroid
    * cosine (the per-point objective; Σ(1−cos) is the spherical
    * inertia).
    */
  def kmeansAssign(df: DataFrame, id: String, vec: String, dim: Int, k: Int,
      iters: Int = 5, sampleN: Int = 4096): DataFrame = {
    val nrm = sqrt(vector.dot(col(vec), col(vec)))
    val base = df.select(col(id),
      when(nrm > 0.0, transform(col(vec), x => x.cast("double") / nrm))
        .otherwise(transform(col(vec), x => x.cast("double") * 0.0)).as("vn"))
    var centroids = trainCentroids(df, vec, k, dim, sampleN, iters = 1)
    (1 to iters).foreach { _ =>
      val stats = base
        .withColumn("cell",
          element_at(cellRanking(col("vn"), centroids), 1).getField("cell"))
        .select(col("cell"), posexplode(col("vn")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(sum(col("x")).as("s"))
        .collect()
      val sums = Array.fill(k)(new Array[Double](dim))
      stats.foreach(r => sums(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = centroids.zipWithIndex.map { case (old, c) =>
        val n = math.sqrt(sums(c).map(x => x * x).sum)
        if (n == 0.0) old else sums(c).map(_ / n)
      }
    }
    val ranked = element_at(cellRanking(col("vn"), centroids), 1)
    base.select(col(id), ranked.getField("cell").as("cell"),
      round(-ranked.getField("negdot"), 4).as("cos"))
  }

  /** Grid-blocked DBSCAN density census over an embedding column:
    * per-point ε-neighborhood size (self included) and the
    * core / border / noise role — the density-clustering complement of
    * [[kmeansAssign]] (cluster extraction over the core points is
    * [[Dedup.connectedComponents]] on the core–core neighbor edges).
    *
    * Exactness: components quantize to integer 1e-7 units (the
    * engine-portable embedding convention), so distances² are exact
    * BIGINT sums and the ≤ ε² decision has no float boundary.
    *
    * Scale shape: candidate pairs come from a grid on the FIRST TWO
    * components with cell width ε — a projection never expands a
    * distance, so any true ε-neighbor lies in the 3×3 neighboring
    * cells and the blocking is exact-complete. Pruning power scales
    * with spread/ε: in the near-dup regime (ε small) the grid is
    * sparse and work is near-linear; as ε approaches the data spread
    * it degrades toward all-pairs — callers wanting coarse structure
    * at 100 TB should go through [[kmeansAssign]] instead. The pair
    * set is checkpointed once and feeds both the count and the
    * border-of-core semi-join.
    */
  def gridDbscan(df: DataFrame, id: String, vec: String, eps: Double,
      minPts: Int): DataFrame = {
    require(eps > 0.0, s"eps must be > 0: $eps")
    require(minPts >= 1, s"minPts must be >= 1: $minPts")
    val epsU = math.round(eps * 1.0e7)
    val qv = transform(col(vec),
      x => floor(x.cast("double") * 1.0e7 + 0.5).cast("long"))
    // grid cell from the quantized first two components (double div is
    // safe: |units| ≤ ~2e7 ≪ 2^53)
    val pts = df.select(col(id).cast("long").as("pid"), qv.as("v"))
      .withColumn("cx",
        floor(element_at(col("v"), 1).cast("double") / epsU.toDouble).cast("long"))
      .withColumn("cy",
        floor(element_at(col("v"), 2).cast("double") / epsU.toDouble).cast("long"))
      .persist()
    val probe = pts.select(col("pid").as("ia"), col("v").as("va"),
        col("cx"), col("cy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("ia"), col("va"),
        (col("cx") + col("dx")).as("kx"), (col("cy") + col("dy")).as("ky"))
    val nbrs = probe
      .join(pts.select(col("pid").as("ib"), col("v").as("vb"),
        col("cx").as("kx"), col("cy").as("ky")), Seq("kx", "ky"))
      .filter(col("ia") =!= col("ib"))
      // native codegen sqdist (bit-identical; the HOF form interprets)
      .withColumn("d2", graft.functions.vector.sqdistLong(col("va"), col("vb")))
      .filter(col("d2") <= lit(epsU * epsU))
      .select(col("ia"), col("ib"))
      .localCheckpoint(true)
    val counts = pts.select(col("pid"))
      .join(nbrs.groupBy(col("ia")).agg(count(lit(1)).as("c")),
        col("pid") === col("ia"), "left")
      .select(col("pid"), (coalesce(col("c"), lit(0L)) + 1L).as("n_nb"))
      .withColumn("is_core", col("n_nb") >= minPts)
      .localCheckpoint(true)
    val cores = counts.filter(col("is_core")).select(col("pid").as("cid"))
    val borders = nbrs
      .join(cores, col("ib") === col("cid"), "left_semi")
      .select(col("ia").as("pid")).distinct()
      .withColumn("near_core", lit(true))
    val out = counts
      .join(borders, Seq("pid"), "left")
      .select(col("pid"), col("n_nb"),
        when(col("is_core"), "core")
          .when(coalesce(col("near_core"), lit(false)), "border")
          .otherwise("noise").as("role"))
      .orderBy(col("pid"))
      .localCheckpoint(true)
    pts.unpersist(false)
    out
  }
}
