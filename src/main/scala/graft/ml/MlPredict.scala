package graft.ml

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** ML_PREDICT as a DataFrame stage (reference: lateral-join TVF usage,
  * LAB1-Walkthrough.md:69-70; all observed calls are 1-row-in/1-row-out, so a
  * column-append is the faithful shape — SURVEY.md §2.3 J3).
  *
  * Two physical paths:
  *  - `embed`/`generate`: plain UDFs — fine for local (cheap, deterministic)
  *    models; evaluated row-local inside the projection.
  *  - `generateBatched`: mapPartitions with explicit batching — the path for
  *    remote providers, amortising HTTP round-trips per partition with bounded
  *    batch size (reference caps: 30 s/tool call, LAB1-Walkthrough.md:146).
  */
object MlPredict {

  def embed(df: DataFrame, modelName: String, inCol: String, outCol: String = "embedding"): DataFrame = {
    val model = ModelCatalog.embedding(modelName)
    val u = udf((s: String) => model.embed(if (s == null) "" else s))
    df.withColumn(outCol, u(col(inCol)))
  }

  /** [[embed]] with identical inputs deduplicated first: each DISTINCT text
    * calls the model once and every row inherits its vector through one
    * equi-join keyed on the text. The production lever for model-call cost
    * on clone-heavy corpora (mirrored pages, boilerplate — and for remote
    * providers each duplicate call is real money): the sf1 10x-clone corpus
    * embeds 10x fewer rows (q34 65.5 -> 53.5 s; the rest of that fixture
    * is its exact vector search, not the embed). NULL and ""
    * conflate deliberately — [[embed]] maps both through embed(""), so the
    * output is row-identical to the direct path. Cost when inputs are
    * mostly unique: one extra shuffle of (text, vec); prefer plain [[embed]]
    * there.
    */
  def embedDistinct(df: DataFrame, modelName: String, inCol: String,
                    outCol: String = "embedding"): DataFrame = {
    require(inCol != outCol, s"embedDistinct: inCol and outCol are both '$inCol'")
    val model = ModelCatalog.embedding(modelName)
    val u = udf((s: String) => model.embed(if (s == null) "" else s))
    // embed() REPLACES a pre-existing outCol in place (withColumn
    // semantics); reproduce that here — the join would otherwise produce
    // an ambiguous duplicate column. A stray key-named column is likewise
    // dropped up front rather than clobbered-then-leaked.
    val key = "__embed_distinct_key"
    val base = df.drop(outCol).drop(key)
    val keyed = base.withColumn(key, coalesce(col(inCol).cast("string"), lit("")))
    val vecs = keyed.select(key).distinct().withColumn(outCol, u(col(key)))
    val outCols = (if (df.columns.contains(outCol)) df.columns.filterNot(_ == key)
                   else df.columns.filterNot(_ == key) :+ outCol).map(col)
    keyed.join(vecs, key).drop(key).select(outCols.toIndexedSeq: _*)
  }

  def generate(df: DataFrame, modelName: String, inCol: String, outCol: String = "response"): DataFrame = {
    val model = ModelCatalog.textGen(modelName)
    val u = udf((s: String) => model.generate(if (s == null) "" else s))
    df.withColumn(outCol, u(col(inCol)))
  }

  /** Batched per-partition text generation (remote-provider path). */
  def generateBatched(df: DataFrame, modelName: String, inCol: String,
                      outCol: String = "response", batchSize: Int = 32): DataFrame = {
    val model = ModelCatalog.textGen(modelName)
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(inCol)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val outs = model.generateBatch(batch.map(r => Option(r.getString(idx)).getOrElse("")))
        // lazyZip would silently drop rows (or misalign) on a short/long
        // provider response — fail the task loudly instead
        require(outs.size == batch.size,
          s"model '${model.name}' returned ${outs.size} outputs for a batch of ${batch.size}")
        batch.lazyZip(outs).map { (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }(Encoders.row(schema))
  }

  /** Bounded-concurrency per-partition generation: `concurrency` in-flight
    * model calls per task, input order preserved (sliding window, no batch
    * barrier). The physical shape for latency-bound remote providers
    * (reference: 30 s/call tool timeouts, LAB1-Walkthrough.md:146) — a
    * partition of N rows completes in ~N/concurrency · avg-latency with no
    * driver involvement; per-call `timeout` fails the task instead of
    * wedging the stage. Shared machinery: core.ConcurrentPartitions.
    */
  def generateConcurrent(df: DataFrame, modelName: String, inCol: String,
                         outCol: String = "response", concurrency: Int = 8,
                         timeout: scala.concurrent.duration.FiniteDuration =
                           graft.core.ConcurrentPartitions.DefaultTimeout): DataFrame = {
    val model = ModelCatalog.textGen(modelName)
    val schema = df.schema.add(outCol, StringType)
    val idx = df.schema.fieldIndex(inCol)
    graft.core.ConcurrentPartitions.mapConcurrent(df, schema, concurrency, timeout) { r =>
      Seq(model.generate(Option(r.getString(idx)).getOrElse("")))
    }
  }
}
