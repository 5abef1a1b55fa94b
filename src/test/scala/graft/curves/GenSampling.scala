package graft

import org.scalacheck.Gen

/** Minimal property-check harness: the offline cache has scalacheck but not
  * the scalatestplus bridge, so we sample generators directly. */
trait GenSampling {
  def forAllSamples[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    var produced = 0
    var attempts = 0
    while (produced < n && attempts < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); produced += 1 }
      seed = seed.next
      attempts += 1
    }
    require(produced > 0, "generator produced no samples")
  }
}
