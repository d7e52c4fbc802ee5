package graft.sources

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

class SinksAndProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp(name: String): String =
    Paths.get(System.getProperty("java.io.tmpdir"), "graft_sinks", name).toString

  test("S4 snapshot replace then S5 append round-trip") {
    val p = tmp("snap")
    Sinks.writeSnapshot(Seq((1, "a"), (2, "b")).toDF("k", "v"), p)
    assert(Sinks.readLake(spark, p).count() == 2)
    Sinks.writeSnapshot(Seq((3, "c")).toDF("k", "v"), p)      // replace
    assert(Sinks.readLake(spark, p).count() == 1)
    Sinks.appendBatch(Seq((4, "d")).toDF("k", "v"), p)        // append
    assert(Sinks.readLake(spark, p).count() == 2)
  }

  test("date-partitioned layout prunes partitions on read") {
    val p = tmp("bydate")
    val df = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("order_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
    Sinks.writePartitionedByDate(df, p, "order_date")
    val pruned = Sinks.readLake(spark, p)
      .filter(col("order_date") === "1995-02-01")
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter must appear as PartitionFilters, not a data filter
    assert(scan.contains("PartitionFilters") && scan.contains("order_date"),
      s"no partition pruning in:\n$scan")
    assert(pruned.count() ==
      df.filter(col("order_date") === "1995-02-01").count())
  }

  test("mergeSchema read null-fills columns older batches lack") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_states/drift_spec"
    Seq((1L, "a")).toDF("id", "t").write.mode("overwrite").parquet(s"$dir/b1")
    Seq((2L, "b", "en")).toDF("id", "t", "lang")
      .write.mode("overwrite").parquet(s"$dir/b2")
    val got = Sinks.readMergedParquet(spark, s"$dir/b1", s"$dir/b2")
      .orderBy("id").collect().map(r =>
        (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSeq
    assert(got == Seq((1L, "a", None), (2L, "b", Some("en"))))
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    Seq("g_orders_b", "g_lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a previously-failed run can leave the managed location behind
      val loc = Paths.get(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (Files.exists(loc)) {
        import scala.jdk.CollectionConverters._
        Files.walk(loc).iterator().asScala.toSeq.reverse
          .foreach(p => Files.deleteIfExists(p))
      }
    }
    val sf = "/root/testdata/sf0.001"
    Sinks.writeBucketed(graft.Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice"), "g_orders_b", "o_orderkey", 4)
    Sinks.writeBucketed(graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "g_lineitem_b", "o_orderkey", 4)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("g_orders_b")
        .join(spark.table("g_lineitem_b"), "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("jdbc writer constructs without a live database") {
    // no RDBMS in the container: assert the writer path fails on
    // connection, not on API construction
    val e = intercept[Exception] {
      Sinks.writeJdbc(Seq((1, "a")).toDF("k", "v"),
        "jdbc:postgresql://localhost:1/none", "t")
    }
    assert(e.getMessage != null)
  }

  test("header probe: detects offset header, skips preamble") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_sinks")
    Files.createDirectories(dir)
    val f = dir.resolve("excel_like.csv")
    Files.writeString(f,
      """report generated,2024-01-01,,
        |,,,
        |VIN,City,Year,Make
        |V1,Seattle,2020,TESLA
        |V2,Tacoma,2019,KIA""".stripMargin)
    val df = HeaderProbe.readCsvAutoHeader(spark, f.toString,
      expected = Seq("vin", "city", "year", "make"))
    assert(df.columns.toSeq == Seq("vin", "city", "year", "make"))
    val rows = df.orderBy("vin").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "Seattle")
  }

  test("header probe resolves paths through Hadoop FileSystem, not java.nio") {
    // an explicit scheme URI breaks java.nio.Paths.get but is exactly what
    // hdfs://- or s3a://-hosted inputs look like; Hadoop's local FS serves it
    val f = Paths.get(System.getProperty("java.io.tmpdir"), "graft_sinks",
      "excel_like.csv")
    val df = HeaderProbe.readCsvAutoHeader(spark, s"file:$f",
      expected = Seq("vin", "city", "year", "make"))
    assert(df.count() == 2)
    // bounded probe: headLines reads n lines even when the file has fewer
    assert(FsUtil.headLines(s"file:$f", 100,
      spark.sparkContext.hadoopConfiguration).length == 5)
  }

  test("header probe: hard error when nothing scores") {
    val dir = Paths.get(System.getProperty("java.io.tmpdir"), "graft_sinks")
    val f = dir.resolve("headerless.csv")
    Files.writeString(f, "1,2,3\n4,5,6")
    assertThrows[IllegalArgumentException] {
      HeaderProbe.readCsvAutoHeader(spark, f.toString,
        expected = Seq("vin", "city"))
    }
  }

  test("json-lines and orc round-trip with schema preserved") {
    val df = Seq((1L, "a b", 1.5), (2L, "c", -0.25))
      .toDF("id", "text", "score")
    Sinks.writeJson(df, tmp("docs_json"))
    val json = Sinks.readJson(spark, tmp("docs_json"))
    assert(json.select("id", "text", "score").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a b", 1.5), (2L, "c", -0.25)))
    Sinks.writeOrc(df, tmp("docs_orc"))
    val orc = Sinks.readOrc(spark, tmp("docs_orc"))
    // files round-trip name+type; nullability widens on read (file
    // formats don't persist required-ness)
    assert(orc.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(orc.orderBy("id").as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a b", 1.5), (2L, "c", -0.25)))
  }

  test("orc scan gets pushed filters like parquet") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 2)
    Sinks.writeOrc(df, tmp("orc_push"))
    val q = Sinks.readOrc(spark, tmp("orc_push")).filter(col("id") > 500)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"filter not pushed to ORC scan:\n$plan")
  }

  test("salted join equals plain join (exactly-once pairs)") {
    val sf = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "k")
    val o = graft.Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "k")
    val plain = li.join(o, "k").count()
    val salted = graft.operators.SaltedJoin.innerOnKey(li, o, "k", saltFactor = 7).count()
    assert(salted == plain, s"salted=$salted plain=$plain")
  }
}
