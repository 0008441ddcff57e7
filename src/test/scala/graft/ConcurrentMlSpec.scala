package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.ml.{MlPredict, ModelCatalog, TextGenModel}

/** Slow model that records its peak in-flight concurrency. */
object SlowModel extends TextGenModel {
  val name = "slow-test-model"
  val inFlight = new AtomicInteger(0)
  val peak = new AtomicInteger(0)
  override def generate(prompt: String): String = {
    val cur = inFlight.incrementAndGet()
    peak.updateAndGet(p => math.max(p, cur))
    Thread.sleep(50)
    inFlight.decrementAndGet()
    s"slow:$prompt"
  }
}

class ConcurrentMlSpec extends SparkSpec {
  test("generateConcurrent overlaps calls, preserves order, matches sequential output") {
    import spark.implicits._
    ModelCatalog.registerTextGen(SlowModel)
    val df = (1 to 24).map(i => (i.toLong, s"p$i")).toDF("id", "text").repartition(1)

    val t0 = System.nanoTime()
    val seq = MlPredict.generate(df, "slow-test-model", "text").select("id", "response")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val tSeq = (System.nanoTime() - t0) / 1e9

    SlowModel.peak.set(0)
    val t1 = System.nanoTime()
    val conc = MlPredict.generateConcurrent(df, "slow-test-model", "text", concurrency = 8)
      .select("id", "response").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val tConc = (System.nanoTime() - t1) / 1e9

    assert(conc.sortBy(_._1) == seq.sortBy(_._1), "results must match the sequential path")
    assert(SlowModel.peak.get() > 1, s"calls must overlap (peak=${SlowModel.peak.get()})")
    assert(tConc < tSeq, f"concurrent ($tConc%.2fs) should beat sequential ($tSeq%.2fs)")
  }
}
