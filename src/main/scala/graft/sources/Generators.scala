package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic data generation + deterministic replay utilities, mirroring the
  * reference's datagen contracts (SURVEY.md §2.1 S7-S9). All generators build
  * on `spark.range` — fully distributed, no driver-side row creation.
  */
object Generators {

  /** ShadowTraffic-style ride stream (S9): `zones` steady Poisson-ish arrivals
    * plus one surge zone at a much higher rate during a surge window
    * (reference: terraform/lab3-.../data-gen/generators/surge-rides.json:36-41).
    * Deterministic: all randomness is hash-derived from the row id.
    */
  def rideRequests(spark: SparkSession, zones: Seq[String], surgeZone: String,
                   baseStart: Timestamp, hours: Int, ratePerZonePerHour: Int,
                   surgeMultiplier: Int = 10, surgeStartHour: Int = 0, surgeHours: Int = 1): DataFrame = {
    require(zones.contains(surgeZone), "surge zone must be one of zones")
    val perZone = zones.zipWithIndex.map { case (z, zi) =>
      val isSurge = z == surgeZone
      val n = ratePerZonePerHour * hours
      val base = spark.range(n).select(
        (lit(zi.toLong) * 1000000 + col("id")).as("gen_id"),
        lit(z).as("pickup_zone"),
        // spread evenly across the span with hash jitter
        (lit(baseStart.getTime / 1000).cast("long") +
          (col("id") * (hours * 3600L) / n) +
          pmod(xxhash64(col("id"), lit(zi)), lit(60))).as("epoch_s"))
      if (!isSurge) base
      else {
        // extra surge traffic concentrated in [surgeStartHour, surgeStartHour+surgeHours)
        val extra = spark.range(ratePerZonePerHour.toLong * surgeHours * surgeMultiplier).select(
          (lit(900000000L) + col("id")).as("gen_id"),
          lit(z).as("pickup_zone"),
          (lit(baseStart.getTime / 1000 + surgeStartHour * 3600L).cast("long") +
            (col("id") * (surgeHours * 3600L) / (ratePerZonePerHour.toLong * surgeHours * surgeMultiplier)) +
            pmod(xxhash64(col("id"), lit(999)), lit(30))).as("epoch_s"))
        base.unionByName(extra)
      }
    }
    perZone.reduce(_ unionByName _)
      .select(
        concat(lit("req-"), col("gen_id")).as("request_id"),
        concat(lit("user"), pmod(col("gen_id"), lit(500)), lit("@example.com")).as("customer_email"),
        col("pickup_zone"),
        element_at(typedLit(zones), (pmod(col("gen_id"), lit(zones.size)) + 1).cast("int")).as("drop_off_zone"),
        (pmod(xxhash64(col("gen_id"), lit(1)), lit(4000)).cast("double") / 100.0 + 5.0).as("price"),
        (pmod(xxhash64(col("gen_id"), lit(2)), lit(4)) + 1).cast("int").as("number_of_passengers"),
        timestamp_seconds(col("epoch_s")).as("request_ts"))
  }

  /** FK-consistent order stream over existing dimension tables (S9, Lab1):
    * every order references a real customer and product id, order price =
    * product price (reference: data-gen/generators/orders.json:5-29).
    */
  def orders(spark: SparkSession, customers: DataFrame, custKey: String,
             products: DataFrame, prodKey: String, prodPrice: String,
             n: Long, start: Timestamp, spanSeconds: Long,
             maxDimRows: Int = 10000): DataFrame = {
    // Dimension collect is DELIBERATELY driver-side and hard-capped: the FK
    // pools are fixture-sized by contract (the reference's generators embed
    // 100 customers / 17 products — data-gen/generators/orders.json). The cap
    // keeps a misconfigured call from turning the generator into a driver OOM;
    // generating against genuinely large dims would need a broadcast-join
    // design instead, which event fixtures don't warrant.
    val custIds = customers.select(col(custKey)).orderBy(custKey).limit(maxDimRows)
      .collect().map(_.get(0))
    val prodRows = products.select(col(prodKey), col(prodPrice)).orderBy(prodKey).limit(maxDimRows)
      .collect().map(r => (r.get(0), r.getDouble(1)))
    val bc = spark.sparkContext.broadcast((custIds, prodRows))
    import spark.implicits._
    spark.range(n).map { i =>
      val (cs, ps) = bc.value
      val c = cs(math.floorMod(i * 2654435761L, cs.length).toInt)
      val (p, price) = ps(math.floorMod(i * 40503L + 7, ps.length).toInt)
      (s"order-$i", c.toString, p.toString, price,
        new Timestamp(start.getTime + (i * spanSeconds * 1000) / math.max(n, 1)))
    }.toDF("order_id", "customer_id", "product_id", "price", "order_ts")
  }

  /** Timestamp rebase for deterministic replay (S7/S8): shift a captured
    * dataset so its span ends exactly at `alignTo` rounded down to a window
    * boundary, keeping rows sorted by event time — the reference's technique
    * for making replayed data land in exact windows and never fall below the
    * watermark (scripts/lab4_datagen.py:306-325, publish_lab3_data.py:143-170).
    */
  def rebaseAligned(df: DataFrame, tsCol: String, alignTo: Timestamp, windowSeconds: Long): DataFrame = {
    val maxTs = df.agg(max(col(tsCol))).head().getTimestamp(0)
    val alignedEnd = (alignTo.getTime / 1000 / windowSeconds) * windowSeconds
    val shiftSec = alignedEnd - maxTs.getTime / 1000
    df.withColumn(tsCol, col(tsCol) + expr(s"INTERVAL $shiftSec SECOND"))
      .sortWithinPartitions(col(tsCol)) // per-partition order for replay
  }
}
