package graft.random

import org.apache.spark.sql.SparkSession
import graft.DArray

/** The modern `Generator` facade (reference
  * `dask_array/random/_generator.py:16`): the same sampler surface as
  * [[RandomState]] — numpy unified the method set, only construction and
  * stream policy differ — plus `spawn`, the modern API's key addition:
  * child generators with DISJOINT stream keyspaces.
  *
  * `spawn` is how the reference parallelizes randomness (a spawned child
  * per block, `_generator.py` / numpy SeedSequence): here every draw is
  * already position-keyed and partitioning-independent, so spawning is
  * purely about stream separation — child i reseeds with a golden-ratio
  * mix of (parent seed, child index, depth salt), giving independent
  * streams without any shared state. */
final class Generator(spark: SparkSession, dir: String, seed: Long = 0L)
    extends RandomState(spark, dir, seed) {

  /** numpy `Generator.random` — the `random_sample` rename. */
  def random(size: Long): DArray = random_sample(size)

  /** n child generators over disjoint stream keyspaces. Like numpy's
    * SeedSequence, spawning is counted: a second `spawn` yields FRESH
    * children, while a replayed parent replays its whole spawn tree. */
  private var spawned = 0
  def spawn(n: Int): Seq[Generator] = {
    val out = (0 until n).map { i =>
      new Generator(spark, dir, RandomState.streamFor(seed ^ 0x5DEECE66DL, spawned + i + 1L))
    }
    spawned += n
    out
  }
}

object Generator {
  /** `default_rng` (numpy's constructor name). */
  def defaultRng(spark: SparkSession, dir: String, seed: Long = 0L): Generator =
    new Generator(spark, dir, seed)
}
