package graft.functions

/** Seeded sequential-model-based optimization (SMBO) with a Gaussian-
  * process surrogate and expected-improvement acquisition — the
  * distributed re-expression of the reference's Bayesian hyper-parameter
  * search (supervised_classifier.py:227,507: skopt BayesSearchCV with
  * log-uniform Real spaces, random_state pinned; polysemous_words.py:733
  * uses the same gp_minimize machinery).
  *
  * Division of labor at scale: the OBJECTIVE (a model fit + scoring) is
  * the expensive, fully distributed part — each evaluation is a Spark
  * job over the cluster. The surrogate lives on the driver and is
  * model-sized by construction: n ≤ a few dozen evaluated points, so the
  * GP solve is an O(n³) Cholesky on a ≤ 30×30 matrix and the acquisition
  * scan is over a fixed candidate lattice — never anything proportional
  * to the data. That is exactly how skopt splits the work on one
  * machine; the cluster replaces only the inside of f().
  *
  * Everything is DETERMINISTIC: a fixed space-filling initial design
  * (no RNG), a fixed candidate lattice, exact tie-breaks by candidate
  * index, and fixed kernel hyper-parameters — two runs produce the same
  * trajectory, which is what lets the spec pin the search against the
  * plain grid's argmax.
  *
  * Surrogate-family divergence, documented: where the reference calls
  * forest_minimize (polysemous_words.py:273), skopt fits a RANDOM-FOREST
  * surrogate instead of this GP. Same SMBO family — a regressor over
  * evaluated points proposes the next point by an acquisition function —
  * different surrogate. The GP is used here because it needs no RNG at
  * all (an RF surrogate bootstraps rows and subsamples features per
  * tree), which keeps every trajectory bit-reproducible, and because the
  * searched spaces are low-dimensional fully numeric boxes where a
  * smooth surrogate loses nothing. Consumers warm-start on the full
  * reference grid, so results match-or-beat the grid argmax regardless
  * of which surrogate proposes the refinements.
  */
object Smbo {

  /** One evaluated point: normalized coords in [0,1]^d, the raw params,
    * the objective value (None = degenerate evaluation, scored below
    * every real one), and whether it came from the initial design. */
  final case class Eval(x: Array[Double], params: Array[Double],
      value: Option[Double], init: Boolean)

  /** RBF kernel with unit signal variance and fixed length-scale —
    * skopt's Matern default differs in smoothness, not in behavior at
    * this design size; a FIXED length-scale keeps the run reproducible
    * (no marginal-likelihood optimization, which would add a driver-side
    * iterative solve for no auditability gain). */
  private val LengthScale = 0.5
  private val Jitter = 1e-8

  private def kernel(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.exp(-s / (2.0 * LengthScale * LengthScale))
  }

  /** In-place Cholesky solve of (K + jitter·I) z = y for the lower
    * triangle; n ≤ ~30, driver-side. */
  private def choleskySolve(k: Array[Array[Double]], ys: Array[Double]): Array[Double] = {
    val n = ys.length
    val l = Array.ofDim[Double](n, n)
    var i = 0
    while (i < n) {
      var j = 0
      while (j <= i) {
        var s = k(i)(j)
        var m = 0
        while (m < j) { s -= l(i)(m) * l(j)(m); m += 1 }
        if (i == j) l(i)(i) = math.sqrt(math.max(s, Jitter))
        else l(i)(j) = s / l(j)(j)
        j += 1
      }
      i += 1
    }
    // forward then backward substitution
    val z = new Array[Double](n)
    i = 0
    while (i < n) {
      var s = ys(i)
      var m = 0
      while (m < i) { s -= l(i)(m) * z(m); m += 1 }
      z(i) = s / l(i)(i)
      i += 1
    }
    val out = new Array[Double](n)
    i = n - 1
    while (i >= 0) {
      var s = z(i)
      var m = i + 1
      while (m < n) { s -= l(m)(i) * out(m); m += 1 }
      out(i) = s / l(i)(i)
      i -= 1
    }
    out
  }

  /** Standard normal CDF via erf (commons-math3, driver-side only — the
    * acquisition never touches a hash-gated output). */
  private def phi(z: Double): Double = math.exp(-z * z / 2.0) / math.sqrt(2.0 * math.Pi)
  private def bigPhi(z: Double): Double =
    0.5 * (1.0 + org.apache.commons.math3.special.Erf.erf(z / math.sqrt(2.0)))

  /** Expected improvement of posterior (mu, sigma) over incumbent best. */
  private def ei(mu: Double, sigma: Double, best: Double): Double = {
    if (sigma <= 0) return 0.0
    val z = (mu - best) / sigma
    sigma * (z * bigPhi(z) + phi(z))
  }

  /** Maximize f over `candidates` (raw-parameter rows spanning the
    * space): evaluate the `init` design first, then `total - init.size`
    * EI-argmax picks. `normalize` maps raw params to [0,1]^d for the
    * kernel. Returns the full trajectory in evaluation order. */
  def maximize(init: Seq[Array[Double]], candidates: Seq[Array[Double]],
      total: Int, normalize: Array[Double] => Array[Double],
      f: Array[Double] => Option[Double]): Seq[Eval] =
    maximizeFrom(init.map(p => p -> f(p)), candidates, total, normalize, f)

  /** Same loop, but the warm-start design arrives ALREADY evaluated —
    * lets a caller batch-score the whole init set in one distributed
    * pass (the q_param_sweep explode plan) instead of one job per
    * point. */
  def maximizeFrom(pre: Seq[(Array[Double], Option[Double])],
      candidates: Seq[Array[Double]],
      total: Int, normalize: Array[Double] => Array[Double],
      f: Array[Double] => Option[Double]): Seq[Eval] = {
    require(pre.nonEmpty && total >= pre.size)
    val evals = scala.collection.mutable.ArrayBuffer.empty[Eval]
    pre.foreach { case (p, v) => evals += Eval(normalize(p), p, v, init = true) }
    val cands = candidates.map(p => (p, normalize(p)))
    while (evals.size < total) {
      val done = evals.toArray
      // numeric objective with degenerate evaluations pinned below every
      // real score, centered/scaled for the unit-variance kernel
      val raw = done.map(_.value.getOrElse(-1.0))
      val mean = raw.sum / raw.length
      val sd0 = math.sqrt(raw.map(v => (v - mean) * (v - mean)).sum / raw.length)
      val sd = if (sd0 < 1e-12) 1.0 else sd0
      val ys = raw.map(v => (v - mean) / sd)
      val n = done.length
      val gram = Array.tabulate(n, n) { (i, j) =>
        kernel(done(i).x, done(j).x) + (if (i == j) Jitter else 0.0)
      }
      val alpha = choleskySolve(gram, ys)
      val best = ys.max
      var bestEi = -1.0
      var pick = -1
      var ci = 0
      while (ci < cands.length) {
        val (_, cx) = cands(ci)
        val seen = done.exists(e => java.util.Arrays.equals(e.x, cx))
        if (!seen) {
          val ks = done.map(e => kernel(e.x, cx))
          var mu = 0.0
          var i = 0
          while (i < n) { mu += ks(i) * alpha(i); i += 1 }
          // cheap diagonal posterior variance bound: exact v needs a
          // second triangular solve; 1 - kᵀα-style underestimates can go
          // negative, so solve properly against the Gram for correctness
          val w = choleskySolve(gram, ks)
          var kv = 0.0
          i = 0
          while (i < n) { kv += ks(i) * w(i); i += 1 }
          val s2 = math.max(1.0 + Jitter - kv, 0.0)
          val e = ei(mu, math.sqrt(s2), best)
          if (e > bestEi + 1e-15) { bestEi = e; pick = ci } // index tie-break
        }
        ci += 1
      }
      if (pick < 0) return evals.toSeq // lattice exhausted
      val p = cands(pick)._1
      evals += Eval(cands(pick)._2, p, f(p), init = false)
    }
    evals.toSeq
  }
}
