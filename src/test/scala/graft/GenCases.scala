package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic scalacheck sampling shared by the property suites
  * (PropertySpec, PipelineOpsSpec, Round9Spec): n fixed-seed draws from
  * a generator — reproducible across runs, no silent flake surface.
  * One definition, so a change to the sampling strategy (e.g. retrying
  * generator failure instead of dropping the case) lands everywhere. */
object GenCases {
  def apply[A](g: Gen[A], n: Int, seedBase: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seedBase + i)))
}
