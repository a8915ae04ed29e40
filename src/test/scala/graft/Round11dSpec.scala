package graft

import graft.queries.{QueryDef, Round11dQueries}

/** Round-11d operator invariants:
  *
  *  - pipe_doremi_mix: every weight column sums to 1 (exact-DECIMAL
  *    normalization), the EG tilt is directionally right — the
  *    max-excess domain's weight strictly increases step over step and
  *    the zero-excess (best-loss) domain's strictly decreases, and the
  *    final weight ordering agrees with the excess ordering at the
  *    extremes;
  *  - pipe_dp_stats: the release decomposes exactly (noisy = true +
  *    noise), the seeded Laplace noise has the right dispersion
  *    (median |noise| ≈ ln 2 / ε), and the mechanism is deterministic
  *    across runs.
  */
class Round11dSpec extends SparkSpec {

  private def q(name: String) =
    QueryDef.toQueriesMap(Round11dQueries.defs)(name)

  test("pipe_doremi_mix: weights normalize and the EG tilt is directional") {
    val rows = q("pipe_doremi_mix")(spark, sf()).collect()
    assert(rows.length > 1, "need multiple domains")
    // columns: source, n_docs, avg_surprisal, excess, w0, w1, w2, w3
    for (c <- 4 to 7) {
      val s = rows.map(_.getDouble(c)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"w${c - 4} sums to $s, not 1")
    }
    val byExcess = rows.sortBy(_.getDouble(3))
    val best = byExcess.head // excess = 0 (the min-loss domain)
    val worst = byExcess.last
    assert(best.getDouble(3) == 0.0)
    assert(worst.getDouble(3) > 0.0, "fixture domains must differ in loss")
    // EG upweights high-excess domains and downweights the best domain
    (4 to 6).foreach { c =>
      assert(worst.getDouble(c + 1) > worst.getDouble(c),
        s"max-excess weight did not increase at step ${c - 3}")
      assert(best.getDouble(c + 1) < best.getDouble(c),
        s"zero-excess weight did not decrease at step ${c - 3}")
    }
    // final ordering agrees at the extremes
    assert(rows.maxBy(_.getDouble(7)).getString(0) == worst.getString(0))
    assert(rows.minBy(_.getDouble(7)).getString(0) == best.getString(0))
  }

  test("pipe_dp_stats: exact decomposition, Laplace dispersion, determinism") {
    val a = q("pipe_dp_stats")(spark, sf()).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      // noisy = true + noise bit-exactly (both computed from the same
      // rounded noise value)
      assert(r.getDouble(4) == r.getLong(2) + r.getDouble(3))
      assert(r.getDouble(3) != 0.0, "seeded Laplace noise is never exactly 0")
    }
    // Laplace(1/ε): median |noise| = ln 2 / ε ≈ 0.693 — loose band
    val med = a.map(r => math.abs(r.getDouble(3))).sorted.apply(a.length / 2)
    assert(med > 0.2 && med < 2.0, s"median |noise| $med outside Laplace band")
    val b = q("pipe_dp_stats")(spark, sf()).collect()
    assert(a.toSeq == b.toSeq, "the seeded mechanism must be deterministic")
  }
}
