package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-side eigensolver `embed_pca` runs: known spectra,
  * the eigen equation, orthonormality, deterministic ordering.
  */
class JacobiSpec extends AnyFunSuite {

  private def matmulVec(m: Array[Array[Double]], v: Array[Double]): Array[Double] =
    m.map(row => row.lazyZip(v).map(_ * _).sum)

  test("recovers a known spectrum exactly (block 2x2 + isolated)") {
    // [[2,1,0],[1,2,0],[0,0,5]] has eigenvalues 5, 3, 1 with
    // eigenvectors e3, (1,1,0)/√2, (1,-1,0)/√2.
    val m = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (evals, evecs) = Jacobi.eigh(m)
    assert(evals.length === 3)
    assert(math.abs(evals(0) - 5.0) < 1e-12)
    assert(math.abs(evals(1) - 3.0) < 1e-12)
    assert(math.abs(evals(2) - 1.0) < 1e-12)
    // Eigen equation and orthonormality for every pair.
    for (c <- 0 until 3) {
      val mv = matmulVec(m, evecs(c))
      for (i <- 0 until 3)
        assert(math.abs(mv(i) - evals(c) * evecs(c)(i)) < 1e-10,
          s"component $c violates C*v = lambda*v at row $i")
      val norm = evecs(c).map(x => x * x).sum
      assert(math.abs(norm - 1.0) < 1e-12)
      for (p <- 0 until c) {
        val dot = evecs(c).lazyZip(evecs(p)).map(_ * _).sum
        assert(math.abs(dot) < 1e-10, s"components $c and $p not orthogonal")
      }
    }
  }

  test("deterministic: identical inputs yield identical decompositions") {
    val m = Array.tabulate(8, 8)((i, j) =>
      1.0 / (i + j + 1.0)) // Hilbert matrix: symmetric, ill-conditioned
    val (e1, v1) = Jacobi.eigh(m)
    val (e2, v2) = Jacobi.eigh(m)
    assert(e1.toSeq === e2.toSeq)
    assert(v1.map(_.toSeq).toSeq === v2.map(_.toSeq).toSeq)
    // Descending order holds on a non-trivial spectrum.
    e1.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
  }

  test("degenerate spectrum orders ties by original index") {
    val m = Array(
      Array(3.0, 0.0),
      Array(0.0, 3.0))
    val (evals, evecs) = Jacobi.eigh(m)
    assert(evals.toSeq === Seq(3.0, 3.0))
    // No rotation ever fires on a diagonal matrix, so the basis stays
    // e0, e1 in index order — the documented total order.
    assert(evecs(0).toSeq === Seq(1.0, 0.0))
    assert(evecs(1).toSeq === Seq(0.0, 1.0))
  }
}
