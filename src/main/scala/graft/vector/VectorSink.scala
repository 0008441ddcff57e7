package graft.vector

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

/** Vector-collection sink (S6 — the reference's continuous
  * `INSERT INTO documents_vectordb SELECT …, embedding FROM …, LATERAL
  * TABLE(ML_PREDICT('llm_embedding_model', …))` flow feeding MongoDB Atlas,
  * terraform/lab2-vector-search/main.tf:238-263).
  *
  * Each micro-batch's rows POST to the remote collection from inside
  * `foreachPartition` — partition-parallel, batched (`batchSize` documents per
  * request), nothing ever collected to the driver. The remote side upserts by
  * doc id, which matches the topic-compaction semantics of the reference's
  * sink connector.
  */
object VectorSink {

  def writeStream(df: DataFrame, store: RemoteVectorStore,
                  idCol: String, chunkCol: String, embCol: String,
                  checkpoint: String, batchSize: Int = 256): DataStreamWriter[Row] =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeBatch(batch, store, idCol, chunkCol, embCol, batchSize)
      }

  /** Batch variant (also the foreachBatch body). Ids travel as strings — the
    * reference's collections declare `document_id STRING`; numeric ids
    * stringify losslessly.
    */
  def writeBatch(df: DataFrame, store: RemoteVectorStore,
                 idCol: String, chunkCol: String, embCol: String,
                 batchSize: Int = 256): Unit =
    df.select(col(idCol).cast("string"), col(chunkCol), col(embCol))
      .foreachPartition { (it: Iterator[Row]) =>
        it.grouped(batchSize).foreach { g =>
          store.insert(g.map(r =>
            ScoredDocUpsert(r.getString(0), r.getString(1), r.getSeq[Float](2).toArray)))
        }
      }
}
