package graft

import graft.run.LifecycleBench
import org.scalatest.funsuite.AnyFunSuite

/** The timed lifecycle walk must complete the production call sequence
  * (land → cadence refresh → gates → rebuild → vacuum) and report one
  * positive wall-time per stage — the smoke contract behind the bench
  * artifact's "lifecycle" block. Correctness of each stage is pinned
  * by its own spec (OrchestratorSpec, AnnRebuildSpec, VacuumSpec,
  * GraphPlaneLifecycleSpec); this proves the WALK composes them.
  */
class LifecycleBenchSpec extends AnyFunSuite with SparkTestBase {

  test("one walk reports every stage with positive time") {
    val stages = LifecycleBench.run(spark, "/root/testdata/sf0.001",
      walks = 1)
    assert(stages.map(_._1) === (LifecycleBench.Stages :+ "lifecycle_total"))
    stages.foreach { case (s, t) =>
      assert(t > 0.0, s"stage $s reported no time")
    }
    val total = stages.take(LifecycleBench.Stages.size).map(_._2).sum
    assert(math.abs(stages.last._2 - total) < 1e-9,
      "lifecycle_total must be the stage sum")
  }
}
