package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Lateral
import graft.sources.{Generators, MarkdownDocs, TableRegistry}
import graft.vector.{IvfIndex, KnnJoin}

class TableRegistrySpec extends SparkSpec {
  test("create/describe/alter/drop lifecycle") {
    TableRegistry.createTable(TableRegistry.TableDef(
      name = "rides",
      schema = Some(StructType(Seq(StructField("zone", StringType), StructField("ts", TimestampType)))),
      primaryKey = Seq("zone"),
      load = s => s.range(1).selectExpr("'z1' as zone", "current_timestamp() as ts")))
    assert(TableRegistry.exists("rides"))
    TableRegistry.alterWatermark("rides", "ts", "5 seconds")
    val d = TableRegistry.describe("rides").toMap
    assert(d("WATERMARK").contains("ts"))
    assert(d("PRIMARY KEY") == "zone")
    assert(TableRegistry.scan(spark, "rides").count() == 1)
    assert(TableRegistry.dropTable("rides"))
    assert(!TableRegistry.exists("rides"))
  }

  test("Tables loads events from both TIMESTAMP(NANOS) fixtures and micros replicas") {
    import spark.implicits._
    // driver fixture: nanos-as-long path
    val fixture = graft.core.Tables(spark, sfDir, "events")
    assert(fixture.schema("ts").dataType == TimestampNTZType)
    val fixtureMax = fixture.agg(max("ts")).head.getAs[java.time.LocalDateTime](0)

    // replica shape (scripts/gen_sf1.py): DuckDB downcasts to TIMESTAMP(MICROS);
    // the loader must branch on the arriving type, not assume nanos
    val tmp = java.nio.file.Files.createTempDirectory("microsevents").toString
    fixture.limit(100).write.mode("overwrite").parquet(s"$tmp/stage")
    val micros = spark.read.parquet(s"$tmp/stage")
    micros.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val loaded = graft.core.Tables(spark, tmp, "events")
    assert(loaded.schema("ts").dataType == TimestampNTZType)
    assert(loaded.count() == 100)
    assert(!loaded.agg(max("ts")).head.getAs[java.time.LocalDateTime](0).isAfter(fixtureMax))
  }

  test("CTAS registers a queryable definition; SET/get round-trips") {
    TableRegistry.createTableAs(spark, "doc_counts",
      graft.core.Tables(spark, sfDir, "documents").groupBy("lang").count())
    assert(TableRegistry.scan(spark, "doc_counts").count() > 0)
    TableRegistry.set("sql.state-ttl", "1 HOURS")
    assert(TableRegistry.get("sql.state-ttl").contains("1 HOURS"))
    TableRegistry.dropTable("doc_counts")
  }
}

class LateralSpec extends SparkSpec {
  test("applyScalar star-expands a struct expression (1-row lateral)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val out = Lateral.applyScalar(df, struct((col("v") * 2).as("doubled"), lit("x").as("tag")))
    assert(out.columns.toSeq == Seq("k", "v", "doubled", "tag"))
    assert(out.filter(col("k") === "b").head().getAs[Double]("doubled") == 4.0)
  }

  test("applyTable emits 0..n rows per input (general UDTF)") {
    import spark.implicits._
    val df = Seq(("a", 2), ("b", 0), ("c", 3)).toDF("k", "n")
    val out = Lateral.applyTable(df, StructType(Seq(StructField("i", IntegerType)))) { r =>
      (0 until r.getInt(1)).map(i => org.apache.spark.sql.Row(i))
    }
    assert(out.count() == 5)
    assert(out.filter(col("k") === "b").count() == 0)
  }
}

class GeneratorsSpec extends SparkSpec {
  test("rideRequests: surge zone dominates its window; schema matches the reference") {
    val zones = Seq("uptown", "midtown", "french_quarter")
    val df = Generators.rideRequests(spark, zones, "french_quarter",
      Timestamp.valueOf("2024-03-01 00:00:00"), hours = 3, ratePerZonePerHour = 60,
      surgeMultiplier = 10, surgeStartHour = 1, surgeHours = 1)
    assert(df.schema.fieldNames.toSeq == Seq("request_id", "customer_email", "pickup_zone",
      "drop_off_zone", "price", "number_of_passengers", "request_ts"))
    val counts = df.filter(col("request_ts").between(
      Timestamp.valueOf("2024-03-01 01:00:00"), Timestamp.valueOf("2024-03-01 02:00:00")))
      .groupBy("pickup_zone").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("french_quarter") > 5 * counts("uptown"), s"surge must dominate: $counts")
    // deterministic
    val again = Generators.rideRequests(spark, zones, "french_quarter",
      Timestamp.valueOf("2024-03-01 00:00:00"), hours = 3, ratePerZonePerHour = 60,
      surgeMultiplier = 10, surgeStartHour = 1, surgeHours = 1)
    assert(df.agg(bit_xor(xxhash64(col("request_id")))).head().getLong(0) ==
      again.agg(bit_xor(xxhash64(col("request_id")))).head().getLong(0))
  }

  test("orders: FK-consistent against dims, price copied from product") {
    val customers = graft.core.Tables(spark, sfDir, "customer")
    val products = graft.core.Tables(spark, sfDir, "part")
    val o = Generators.orders(spark, customers, "c_custkey", products, "p_partkey", "p_retailprice",
      n = 200, Timestamp.valueOf("2024-01-01 00:00:00"), spanSeconds = 3600)
    assert(o.count() == 200)
    val joined = o.join(products, o("product_id") === products("p_partkey").cast("string"))
    assert(joined.count() == 200, "every order must reference a real product")
    assert(joined.filter(o("price") =!= col("p_retailprice")).count() == 0)
  }

  test("rebaseAligned shifts the max timestamp onto a window boundary") {
    import spark.implicits._
    val df = Seq(Timestamp.valueOf("2020-01-01 00:07:13"), Timestamp.valueOf("2020-01-01 03:22:05"))
      .toDF("ts")
    val out = Generators.rebaseAligned(df, "ts", Timestamp.valueOf("2024-06-01 12:34:56"), 300)
    val maxTs = out.agg(max(col("ts"))).head().getTimestamp(0)
    assert(maxTs.getTime / 1000 % 300 == 0, s"max ts must land on a 5-min boundary: $maxTs")
    assert(maxTs.toString.startsWith("2024-06-01 12:3"))
  }
}

class MarkdownDocsSpec extends SparkSpec {
  test("parses frontmatter fields and body") {
    import spark.implicits._
    val md =
      """---
        |title: Flood Policy
        |pages: 12
        |section_reference: 44 CFR 61
        |fraud_categories: [staging, inflation]
        |policy_keywords: [flood, nfip]
        |---
        |Body text about flood claims.
        |Second line.""".stripMargin
    val df = Seq((md, "file:///tmp/policy.md")).toDF("value", "file")
    val out = MarkdownDocs.parse(df, "value", "file").head()
    assert(out.getAs[String]("title") == "Flood Policy")
    assert(out.getAs[Int]("pages") == 12)
    assert(out.getAs[String]("section_reference") == "44 CFR 61")
    assert(out.getAs[scala.collection.Seq[String]]("fraud_categories").toSeq == Seq("staging", "inflation"))
    assert(out.getAs[scala.collection.Seq[String]]("policy_keywords").toSeq == Seq("flood", "nfip"))
    assert(out.getAs[String]("text").startsWith("Body text"))
    assert(out.getAs[Int]("char_count") == out.getAs[String]("text").length)
  }
}

class IvfSpec extends SparkSpec {
  test("IVF recall vs exact knn is high with enough probes") {
    val emb = graft.core.Tables(spark, sfDir, "embeddings")
    val corpus = emb.select(col("vec_id"), col("embedding"))
    val ivf = IvfIndex.build(corpus, "vec_id", "embedding", nLists = 8, iterations = 2)
    val queries = emb.filter(col("vec_id") < 15)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val approx = ivf.search(queries, "qid", "qvec", k = 3, nProbes = 4)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = KnnJoin(queries,
      emb.select(col("vec_id").as("nid"), col("embedding").as("nvec")), 3)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (approx intersect exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall too low (approx=${approx.size}, exact=${exact.size})")
    // full probe = exact (modulo ties): probing all lists must reproduce exact knn
    val full = ivf.search(queries, "qid", "qvec", k = 3, nProbes = 8)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact, "probing every list must equal exact knn")
  }
}
