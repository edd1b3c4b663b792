package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("StageReader.csv: all-text stage schema + audit columns") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/orders.csv"),
      "orderid,amount,orderdate\n1,10.50,2024-01-01\n2,notanumber,2024-01-02\n")
    val stage = StageReader.csv(spark, dir, Seq("orderid", "amount", "orderdate"))
    assert(stage.schema.filter(!_.name.startsWith("_")).forall(_.dataType.typeName == "string"))
    val r = stage.select($"orderid", $"_stg_file_name".contains("orders.csv"),
        $"_stg_file_load_ts".isNotNull, $"_stg_file_size" > 0)
      .as[(String, Boolean, Boolean, Boolean)].collect().sortBy(_._1)
    assert(r.toSeq == Seq(("1", true, true, true), ("2", true, true, true)))
  }

  test("StageReader attaches the content MD5 of the staged file (_stg_file_md5)") {
    val dir = Files.createTempDirectory("graft_md5").toString
    val content = "orderid,amount\n1,10.50\n2,7.25\n"
    Files.writeString(java.nio.file.Paths.get(s"$dir/orders.csv"), content)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(content.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val md5s = StageReader.csv(spark, dir, Seq("orderid", "amount"))
      .select("_stg_file_md5").distinct().as[String].collect().toSeq
    assert(md5s == Seq(expected))
    // names needing URI escaping still join (input_file_name percent-
    // encodes; the binaryFile path does not)
    val dir2 = Files.createTempDirectory("graft_md5sp").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir2/ord ers 1.csv"), content)
    val md5s2 = StageReader.csv(spark, dir2, Seq("orderid", "amount"))
      .select("_stg_file_md5").distinct().as[String].collect().toSeq
    assert(md5s2 == Seq(expected))
  }

  test("StageReader.typed: TRY_CAST semantics — garbage becomes null, job survives") {
    val dir = Files.createTempDirectory("graft_csv2").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/o.csv"),
      "orderid,amount,orderdate\n1,10.50,2024-01-01\n2,notanumber,junkdate\n")
    val stage = StageReader.csv(spark, dir, Seq("orderid", "amount", "orderdate"))
    val clean = StageReader.typed(stage,
      Seq("orderid" -> "BIGINT", "amount" -> "DECIMAL(10,2)", "orderdate" -> "DATE"))
    val rows = clean.select($"orderid", $"amount".isNull, $"orderdate".isNull)
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, false, false), (2L, true, true)))
  }

  test("StageReader.json: declared-field extraction from JSON staging") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/agents.json"),
      """{"agentid": "7", "name": "A", "phone": "123", "extra": "ignored"}
        |{"agentid": "8", "name": "B", "phone": "456"}
        |""".stripMargin)
    val stage = StageReader.json(spark, dir, Seq("agentid", "name", "phone"))
    val rows = stage.select("agentid", "name").as[(String, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(("7", "A"), ("8", "B")))
    assert(!stage.columns.contains("extra"))
  }

  test("StageReader.orc/parquet: typed columnar drops coerce to the text stage contract") {
    val dir = Files.createTempDirectory("graft_orc").toString
    // a typed upstream drop: long id, double amount, extra column
    val src = Seq((1L, 10.5d, "x"), (2L, 99.0d, "y"))
      .toDF("orderid", "amount", "ignored_extra")
    src.write.orc(s"$dir/orc")
    src.write.parquet(s"$dir/parquet")
    Seq("orc" -> StageReader.orc(spark, s"$dir/orc", Seq("orderid", "amount", "missing_col")),
        "parquet" -> StageReader.parquet(spark, s"$dir/parquet", Seq("orderid", "amount", "missing_col")))
      .foreach { case (fmt, stage) =>
        // all-text contract: declared cols string, missing declared col null
        assert(stage.schema.filter(!_.name.startsWith("_")).forall(_.dataType.typeName == "string"), fmt)
        val rows = stage.select("orderid", "amount", "missing_col")
          .as[(String, String, Option[String])].collect().sortBy(_._1)
        assert(rows.toSeq == Seq(("1", "10.5", None), ("2", "99.0", None)), fmt)
        assert(stage.select($"_stg_file_md5").head.getString(0) != null, fmt)
        // downstream typing works exactly like the text formats
        val typed = StageReader.typed(stage, Seq("orderid" -> "bigint", "amount" -> "double"))
        assert(typed.select(sum($"amount")).head.getDouble(0) == 109.5, fmt)
      }
  }

  test("StageReader.parquet fails loudly on case-colliding source columns") {
    val dir = Files.createTempDirectory("graft_case").toString
    // an upstream drop carrying BOTH 'OrderID' and 'orderid' — under
    // case-insensitive resolution either could satisfy the declared
    // column; last-wins would silently pick one
    val prev = spark.conf.get("spark.sql.caseSensitive", "false")
    spark.conf.set("spark.sql.caseSensitive", "true")
    try {
      Seq((1L, 2L, "x")).toDF("OrderID", "orderid", "other")
        .write.parquet(s"$dir/p")
      val ex = intercept[IllegalArgumentException] {
        StageReader.parquet(spark, s"$dir/p", Seq("orderid", "other"))
      }
      assert(ex.getMessage.contains("ambiguous"))
      // columns NOT matching any declared column may collide freely
      val ok = StageReader.parquet(spark, s"$dir/p", Seq("other"))
      assert(ok.select("other").as[String].collect().toSeq == Seq("x"))
    } finally spark.conf.set("spark.sql.caseSensitive", prev)
  }

  test("StageReader.cleanSnapshot: stage → typed → SCD1 latest per key") {
    val dir = Files.createTempDirectory("graft_csv3").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/v.csv"),
      "k,v,ts\n1,old,2024-01-01\n1,new,2024-02-01\n2,only,2024-01-15\n")
    val stage = StageReader.csv(spark, dir, Seq("k", "v", "ts"))
    val snap = StageReader.cleanSnapshot(stage,
      Seq("k" -> "BIGINT", "ts" -> "DATE"), Seq("k"), Seq(col("ts").desc))
    val rows = snap.select("k", "v").as[(Long, String)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "new"), (2L, "only")))
  }

  test("DataGen.menu is deterministic, distributed, and shaped like the reference") {
    val m1 = DataGen.menu(spark, 1000)
    val m2 = DataGen.menu(spark, 1000)
    assert(m1.count() == 1000)
    assert(m1.exceptAll(m2).count() == 0) // deterministic
    val cats = m1.select("category").distinct().as[String].collect().toSet
    assert(cats == DataGen.categories.toSet)
    val bad = m1.where(!col("item_name").isin(
      DataGen.itemNames.values.flatten.toSeq.map(x => x: Any): _*)).count()
    assert(bad == 0)
    assert(m1.where($"price_cents" < 5000 || $"price_cents" > 50000).count() == 0)
    val nonVegCats = m1.where($"item_type" === "Non-Veg")
      .select("category").distinct().as[String].collect().toSet
    assert(nonVegCats.subsetOf(Set("Appetizers", "Main Course")))
  }

  test("DataGen corpus tables: deterministic, test-schema-shaped, with planted structure") {
    // documents: schema matches the test corpus; ~5% planted near-dups
    val d = DataGen.documents(spark, 2000)
    assert(d.columns.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(d.exceptAll(DataGen.documents(spark, 2000)).count() == 0)
    assert(d.where(length($"text") =!= $"n_chars").count() == 0)
    val nearDups = d.as("a").join(DataGen.documents(spark, 2000).as("b"),
      expr("b.text = concat(a.text, ' extra') and a.doc_id = b.doc_id - 3"))
      .count()
    assert(nearDups > 50 && nearDups < 200, s"planted near-dup rate off: $nearDups")

    // embeddings: fixed dim, clusterable — same-label vectors sit
    // closer to their centroid than to other labels' (by construction)
    val e = DataGen.embeddings(spark, 1000, dim = 16, labels = 4)
    assert(e.columns.toSeq == Seq("vec_id", "embedding", "label"))
    assert(e.where(size($"embedding") =!= 16).count() == 0)
    val spread = e.groupBy("label")
      .agg(avg(aggregate(zip_with($"embedding", $"embedding", (x, _) => x * x),
        lit(0.0d), (acc, x) => acc + x)).as("sq"))
      .count()
    assert(spread == 4)

    // events: per-user timestamps advance (sessionizable), types from
    // the reference set
    val ev = DataGen.events(spark, 20000, users = 100)
    assert(ev.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    val types = ev.select("event_type").distinct().as[String].collect().toSet
    assert(types == Set("view", "click", "purchase", "signup", "error"))
    val span = ev.groupBy("user_id")
      .agg((max($"ts").cast("long") - min($"ts").cast("long")).as("span"))
      .agg(min("span")).head().getLong(0)
    assert(span > 1000, s"per-user time span too tight for sessionization: $span")
  }
}
