package graft.operators

/** Symmetric eigendecomposition by cyclic Jacobi rotations — the
  * driver-side solver `embed_pca` runs on its d×d covariance (d = the
  * embedding width, so the matrix is KB-sized at any corpus scale; the
  * corpus-sized work is the one-pass moment aggregation that produced
  * it). Deterministic by construction: fixed (p, q) sweep order, a
  * fixed sweep cap, pure double arithmetic, ties in the final ordering
  * broken by original index — the same inputs yield the same
  * decomposition on every run and every machine.
  */
object Jacobi {

  /** Eigenvalues (descending) and matching eigenvectors (returned as
    * rows of the second array) of symmetric `m`. Off-diagonal mass
    * converges quadratically; `sweeps` = 30 is far past convergence
    * for any well-scaled input.
    */
  def eigh(m: Array[Array[Double]], sweeps: Int = 30,
      tol: Double = 1e-14): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)

    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < d) {
        var j = i + 1
        while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var scale = 0.0
    for (i <- 0 until d; j <- 0 until d) scale = math.max(scale, math.abs(a(i)(j)))
    val stop = tol * math.max(1.0, scale * scale)

    var sweep = 0
    while (sweep < sweeps && offMass() > stop) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // Rotate rows/columns p and q of a.
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            // Accumulate the rotation into the eigenvector basis.
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    // Descending eigenvalue order; ties break on the original index so
    // the output is a total order.
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    val evals = order.map(i => a(i)(i)).toArray
    val evecs = order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray
    (evals, evecs)
  }
}
