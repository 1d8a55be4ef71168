package graft.geom

/**
 * Tiny dense least-squares machinery for the polynomial-fit operators (degree-2
 * Warp, polynomial SRGR — reference WarpOp.java:105 warpPolynomialOrder=2,
 * SRGROp.java:45 polynomial fit). The engine aggregates normal-equation moments
 * DISTRIBUTED (groupBy + sum), collects only the tiny per-scene moment matrix,
 * and solves with no-pivot Gaussian elimination (normal-equation matrices are SPD).
 * Gates built on these compare planted-truth-recovery BOOLEANS, the established
 * pattern for the driver-fit operators (q_warp_poly / q_xcorr_frac).
 */
object LinSolve {

  /** No-pivot Gaussian elimination, a (n x n) row-major, b rhs; both mutated. */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = b.length
    var k = 0
    while (k < n) {
      var i = k + 1
      while (i < n) {
        val f = a(i)(k) / a(k)(k)
        var j = k
        while (j < n) { a(i)(j) -= f * a(k)(j); j += 1 }
        b(i) -= f * b(k)
        i += 1
      }
      k += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

}
