package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Expectations._

/** Data-quality expectations: warn counts without touching rows, drop
  * removes only offenders, quarantine surfaces offenders with every
  * violated rule named, fail pre-flights before any output exists, and
  * the counts ride the downstream action (observe), not an extra pass.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha", 10),
    (2L, null.asInstanceOf[String], 20),
    (3L, "gamma", -5),
    (4L, "delta", 300)
  ).toDF("id", "name", "qty")

  test("warn keeps every row and counts violations on the first action") {
    val v = validate(docs, Seq(
      Expectation("name_set", col("name").isNotNull),
      Expectation("qty_pos", col("qty") > 0)))
    assert(v.kept.count() === 4)
    assert(v.metrics() === Map("name_set" -> 1L, "qty_pos" -> 1L))
  }

  test("drop removes exactly the offending rows; null predicate counts as violation") {
    val v = validate(docs, Seq(
      Expectation("qty_pos", col("qty") > 0, Drop),
      // NULL name makes (length(name) > 3) NULL -> treated as violated
      Expectation("name_long", length(col("name")) > 3, Drop)))
    assert(v.kept.select("id").as[Long].collect().sorted === Array(1L, 4L))
    assert(v.metrics() === Map("qty_pos" -> 1L, "name_long" -> 1L))
  }

  test("quarantine carries every violated rule name, not just the first") {
    val v = validate(docs, Seq(
      Expectation("name_set", col("name").isNotNull, Quarantine),
      Expectation("qty_small", col("qty") < 100, Quarantine),
      Expectation("qty_pos", col("qty") > 0, Warn)))
    assert(v.kept.select("id").as[Long].collect().sorted === Array(1L, 3L))
    val q = v.quarantined.select(col("id"), col(ReasonCol))
      .as[(Long, Seq[String])].collect().toMap
    assert(q === Map(2L -> Seq("name_set"), 4L -> Seq("qty_small")))
    // warn-only violator (id=3, qty<0) is kept and NOT quarantined
    assert(!q.contains(3L))
  }

  test("fail aborts with the rule name and violation count") {
    val ex = intercept[FailedExpectationException] {
      validate(docs, Seq(Expectation("qty_pos", col("qty") > 0, Fail)))
    }
    assert(ex.rule === "qty_pos" && ex.rows === 1L)
  }

  test("no rules: frame passes through untouched, metrics empty") {
    val v = validate(docs, Nil)
    assert(v.kept.count() === 4 && v.metrics().isEmpty)
    assert(v.quarantined.isEmpty)
  }

  test("parallel entities report into a plain collector without racing (serialized callback)") {
    val root = Files.createTempDirectory("graft_exp_par").toString
    val names = (1 to 6).map(i => s"e$i")
    names.foreach { n =>
      Files.createDirectories(Paths.get(s"$root/stage/$n"))
      Files.writeString(Paths.get(s"$root/stage/$n/data.csv"),
        """id,qty,updated_at,rec_id
          |1,5,2024-01-01 00:00:00,1
          |2,-1,2024-01-01 00:00:00,2
          |""".stripMargin)
    }
    var reported = Map.empty[String, Map[String, Long]] // plain, unsynchronized
    val cfg = Warehouse.Config(names.map(n =>
      Warehouse.Entity(n, "csv", s"$root/stage/$n",
        Seq("id", "qty", "updated_at", "rec_id"),
        Seq("id" -> "bigint", "qty" -> "bigint",
          "updated_at" -> "timestamp", "rec_id" -> "bigint"),
        Seq("id"), "updated_at", "rec_id",
        expectations = Seq(Expectation("qty_pos", col("qty") > 0, Drop)))))
    Warehouse.runBatch(spark, cfg, s"$root/out", entityParallelism = 4,
      onExpectations = (name, m) => reported += name -> m)
    // every entity's report arrived exactly once, none lost to a race
    assert(reported.keySet === names.toSet)
    assert(reported.values.forall(_ === Map("qty_pos" -> 1L)))
  }

  test("runBatch: quarantine layer written, clean layer excludes offenders, callback fires") {
    val root = Files.createTempDirectory("graft_exp").toString
    Files.createDirectories(Paths.get(s"$root/stage/item"))
    Files.writeString(Paths.get(s"$root/stage/item/item.csv"),
      """item_id,price,updated_at,rec_id
        |1,100,2024-01-01 00:00:00,11
        |2,-3,2024-01-01 00:00:00,12
        |3,,2024-01-01 00:00:00,13
        |""".stripMargin)
    var reported = Map.empty[String, Map[String, Long]]
    val out = Warehouse.runBatch(spark,
      Warehouse.Config(Seq(Warehouse.Entity("item", "csv", s"$root/stage/item",
        Seq("item_id", "price", "updated_at", "rec_id"),
        Seq("item_id" -> "bigint", "price" -> "bigint",
          "updated_at" -> "timestamp", "rec_id" -> "bigint"),
        Seq("item_id"), "updated_at", "rec_id",
        expectations = Seq(
          Expectation("price_set", col("price").isNotNull, Quarantine),
          Expectation("price_pos", col("price") > 0, Quarantine))))),
      s"$root/out",
      onExpectations = (name, m) => reported += name -> m)
    assert(out("clean/item").select("item_id").as[Long].collect().sorted
      === Array(1L))
    val quarantined = out("quarantine/item")
      .select(col("item_id"), col(ReasonCol)).as[(Long, Seq[String])]
      .collect().toMap
    // row 3's NULL price violates BOTH rules (NULL comparison = violation)
    assert(quarantined === Map(
      2L -> Seq("price_pos"), 3L -> Seq("price_set", "price_pos")))
    assert(reported("item") === Map("price_set" -> 1L, "price_pos" -> 2L))
    // quarantine layer persisted on disk for triage
    assert(spark.read.parquet(s"$root/out/quarantine/item").count() === 2)
  }
}
