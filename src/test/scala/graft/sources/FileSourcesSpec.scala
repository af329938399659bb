package graft.sources

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class FileSourcesSpec extends AnyFunSuite with SparkSpec {

  test("CSV and JSON round-trip the orders table losslessly") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_io").toString
    val orders = graft.model.Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val schema = orders.schema

    FileSources.writeCsv(orders, s"$dir/csv")
    val fromCsv = FileSources.readCsv(spark, s"$dir/csv", schema)
    assert(fromCsv.exceptAll(orders).count() == 0 && orders.exceptAll(fromCsv).count() == 0)

    FileSources.writeJson(orders, s"$dir/json")
    val fromJson = FileSources.readJson(spark, s"$dir/json", schema)
    assert(fromJson.exceptAll(orders).count() == 0 && orders.exceptAll(fromJson).count() == 0)

    FileSources.writeOrc(orders, s"$dir/orc")
    val fromOrc = FileSources.readOrc(spark, s"$dir/orc", schema)
    assert(fromOrc.exceptAll(orders).count() == 0 && orders.exceptAll(fromOrc).count() == 0)
  }

  test("jdbc round-trip against embedded Derby: fact rows with exact decimals") {
    import spark.implicits._
    val url = "jdbc:derby:memory:graftdb;create=true"
    // channel_data-shaped rows (db_model.py:49-54) incl. NUMERIC(25,6)
    val fact = (1 to 500).map { i =>
      (i.toLong, (i % 7).toLong, new java.sql.Timestamp(i * 1000L),
        BigDecimal(i * 10).setScale(6) / 3)
    }.toDF("id", "channel_id", "ts", "value")
      .select($"id", $"channel_id", $"ts", $"value".cast("decimal(25,6)"))
    FileSources.writeJdbc(fact, url, "channel_data", mode = "overwrite")
    // additional append (the D6 sink mode)
    FileSources.writeJdbc(fact.filter($"id" <= 10)
      .withColumn("id", $"id" + 1000L), url, "channel_data")
    val back = FileSources.jdbcReader(spark, url, "channel_data",
      "id", 1L, 1100L, 8).load()
    assert(back.count() == 510)
    val cmp = back.filter($"id" <= 500)
    assert(cmp.exceptAll(fact).count() == 0 && fact.exceptAll(cmp).count() == 0)
    // partitioned read really split the scan
    assert(back.rdd.getNumPartitions == 8)
  }
}
