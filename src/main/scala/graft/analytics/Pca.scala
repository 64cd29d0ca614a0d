package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA over the embedding corpus — the dimensionality-
  * reduction half of the vector toolchain (next to the IVF/PQ ANN
  * tiers): project d-dim embeddings onto the top-k principal
  * components for cheaper downstream search/clustering, and report
  * how much variance each component captures.
  *
  * Execution shape, built for the 100 TB case:
  *
  *  1. **Sufficient statistics in ONE corpus pass.** n, Σv (d) and
  *     the Gram matrix Σ v⊗v (d²) via the mergeable array-sum
  *     aggregate [[graft.functions.VecSumAgg]] — the outer product is
  *     a pure per-row `transform×transform` expression, each partition
  *     contributes one (d²+d)-double buffer, and the exchange carries
  *     partials, never rows. No `RowMatrix`, no per-element explode.
  *  2. **Driver-side eigensolve of the d×d covariance.** d is the
  *     embedding width (64 here, ≤ a few thousand in practice), so
  *     C = G/n − μμᵀ is kilobytes: a deterministic cyclic-Jacobi
  *     sweep costs microseconds and no cluster round-trips — the same
  *     train-small/apply-big split as the IVF codebook fit.
  *  3. **Distributed projection as pure column arithmetic.** The k
  *     basis vectors become literals; each score is one codegen'd
  *     `array_dot` minus a precomputed scalar — a narrow map over the
  *     corpus, no shuffle, no UDF.
  *
  * Determinism: double addition is merge-order sensitive, so partial
  * sums can differ across runs at ~1e-15 relative; every reported
  * number is Det-rounded at 4 decimals, far above that noise floor
  * (the same contract as the cosine gates). The per-component sign is
  * fixed (largest-|coordinate| positive), removing the eigenvector
  * sign ambiguity.
  */
object Pca {

  val NumComponents = 8

  /** Fitted model: row `basis(j)` is the j-th principal axis (unit
    * norm, sign-fixed), `eigenvalues(j)` its variance along that axis,
    * `totalVar` the covariance trace (= Σ all d eigenvalues). */
  case class PcaModel(n: Long, mean: Array[Double],
                      eigenvalues: Array[Double], basis: Array[Array[Double]],
                      totalVar: Double) {

    /** Append a length-k `pc` column: the centered projection of `v`
      * onto each retained axis, as pure per-row expressions over the
      * basis literals (dot(v,w) − dot(μ,w) — the μ term folds to a
      * scalar literal, so centering never materializes v−μ). */
    def project(vecs: DataFrame): DataFrame = {
      import graft.functions.VectorFunctions._
      vecs.withColumn("pc", array(basis.toIndexedSeq.map { w =>
        array_dot(col("v"), typedLit(w)) - lit(ddot(mean, w))
      }: _*))
    }
  }

  private def ddot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** One-pass distributed moments: (n, Σv, full symmetric Σ v⊗v) via
    * the native [[graft.functions.VectorMoments]] aggregate — one
    * primitive buffer per partition reaches the exchange. */
  private[analytics] def moments(vecs: DataFrame): (Long, Array[Double], Array[Array[Double]]) = {
    import graft.functions.VectorMoments.{unpack, vector_moments}
    val r = vecs.agg(vector_moments(col("v")).as("m")).head()
    unpack(r.getSeq[Double](0).toArray)
  }

  /** Deterministic cyclic-Jacobi eigensolve of a symmetric matrix
    * (classic rotation formulas; fixed sweep order, convergence on the
    * off-diagonal Frobenius mass). Returns (eigenvalues, eigenvectors
    * as COLUMNS of v) unordered. */
  private[analytics] def jacobiEig(aIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = Array.tabulate(d, d)((i, j) => aIn(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass: Double = {
      var s = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    var sweep = 0
    while (sweep < 50 && offMass > 1e-22) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val tau = s / (1.0 + c)
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < d) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - s * (aiq + tau * aip); a(p)(i) = a(i)(p)
                a(i)(q) = aiq + s * (aip - tau * aiq); a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - s * (viq + tau * vip)
              v(i)(q) = viq + s * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit on the corpus frame (vec_id, v, …): one distributed moment
    * pass, then the driver-side eigensolve. Components are ordered by
    * eigenvalue desc (axis index asc on exact ties) and sign-fixed:
    * the largest-|coordinate| entry is made positive (first index on
    * ties), so the basis is unique, not merely unique-up-to-sign. */
  private[analytics] def fit(vecs: DataFrame, k: Int = NumComponents): PcaModel = {
    val (n, s, g) = moments(vecs)
    val d = s.length
    require(n > 1, s"PCA needs > 1 vector, got $n")
    val mu = s.map(_ / n)
    val cov = Array.tabulate(d, d)((i, j) => g(i)(j) / n - mu(i) * mu(j))
    val (vals, vecsM) = jacobiEig(cov)
    val order = (0 until d).sortBy(j => (-vals(j), j))
    val top = order.take(k)
    val basis = top.map { j =>
      val w = Array.tabulate(d)(i => vecsM(i)(j))
      var best = 0
      var i = 1
      while (i < d) { if (math.abs(w(i)) > math.abs(w(best))) best = i; i += 1 }
      if (w(best) < 0) w.map(x => -x) else w
    }.toArray
    PcaModel(n, mu, top.map(vals).toArray, basis,
      totalVar = (0 until d).map(i => cov(i)(i)).sum)
  }

  /** s15 gate: fit on the embedding corpus, project it back
    * distributed, and report per component: eigenvalue, variance
    * fraction, cumulative fraction, and the projected scores' actual
    * mean/variance. The last two are the end-to-end check — by the
    * PCA identity the projected variance along axis j IS λⱼ and the
    * projected mean is 0, so the distributed projection path must
    * reproduce the eigensolve's numbers (Verify pins this as the
    * `s15_proj_var_eq_eig` invariant). Rows-only gate (eigensolves
    * aren't SQL). */
  def s15PcaReduce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vecs = Dedup.normalizedVectors(spark, dir).cache()
    try {
      val m = fit(vecs, NumComponents)
      val p = m.project(vecs).select(col("pc"))
      val aggs = (0 until NumComponents).flatMap { j =>
        val e = col("pc").getItem(j)
        Seq(sum(e), sum(e * e))
      } :+ count(lit(1)).asInstanceOf[Column]
      val r = p.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getLong(2 * NumComponents).toDouble
      var cum = 0.0
      (0 until NumComponents).map { j =>
        val mean = r.getDouble(2 * j) / n
        val ex2 = r.getDouble(2 * j + 1) / n
        cum += m.eigenvalues(j) / m.totalVar
        (j + 1, Det.droundD(m.eigenvalues(j), 4),
          Det.droundD(m.eigenvalues(j) / m.totalVar, 4),
          Det.droundD(cum, 4),
          Det.droundD(mean, 4),
          Det.droundD(ex2 - mean * mean, 4))
      }.toDF("component", "eigenvalue", "var_frac", "cum_frac",
        "proj_mean", "proj_var")
        .orderBy("component")
    } finally vecs.unpersist()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s15_pca_reduce" -> s15PcaReduce _,
  )

  /** Eigensolves aren't SQL-expressible → rows-only + invariants. */
  val oracleSql: Map[String, String] = Map.empty
}
