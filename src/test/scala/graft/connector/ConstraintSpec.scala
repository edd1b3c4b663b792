package graft.connector

import java.nio.file.Files

import graft.SparkSpec

/** ANSI table constraints on graft tables: CHECK is write-ENFORCED on
  * EVERY path (SQL INSERT, UPDATE/MERGE rewrites, library/path writes
  * — the guard is fused into `SnapshotStore.writeVersionData`'s
  * projection, so there is no unguarded back door), PRIMARY KEY /
  * UNIQUE are accepted as informational metadata only over the merge
  * keys (where the engine's one-row-per-key invariant actually backs
  * the claim). `ALTER TABLE ADD CONSTRAINT` validates existing rows
  * (Spark's AddCheckConstraintExec) before the catalog records it.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft-cons").toString
  locally {
    spark.conf.set("spark.sql.catalog.cons", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cons.root", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cons.ns")
  }

  private def violates(body: => Any): String = {
    val e = intercept[Exception](body)
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
  }

  test("CHECK in CREATE TABLE is enforced on SQL INSERT") {
    spark.sql("""CREATE TABLE cons.ns.t1 (
                   k BIGINT, cents BIGINT,
                   CONSTRAINT non_negative CHECK (cents >= 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO cons.ns.t1 VALUES (1, 10), (2, 0)")
    assert(spark.table("cons.ns.t1").count() == 2)
    val msg = violates(
      spark.sql("INSERT INTO cons.ns.t1 VALUES (3, -5)"))
    assert(msg.toLowerCase.contains("non_negative") ||
      msg.toLowerCase.contains("check"), msg)
    // the failed statement committed nothing
    assert(spark.table("cons.ns.t1").count() == 2)
    // NULL passes (ANSI: only FALSE violates)
    spark.sql("INSERT INTO cons.ns.t1 VALUES (4, NULL)")
    assert(spark.table("cons.ns.t1").count() == 3)
  }

  test("CHECK guards the library/path write door too") {
    spark.sql("""CREATE TABLE cons.ns.t2 (
                   k BIGINT, cents BIGINT,
                   CONSTRAINT pos CHECK (cents > 0))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val root = s"$warehouse/ns/t2"
    // a path-based upsert bypasses the catalog entirely — the fused
    // write guard must still reject the violating row
    val msg = violates(
      Seq((9L, -1L)).toDF("k", "cents")
        .write.format("graft").mode("append").save(root))
    assert(msg.toLowerCase.contains("pos"), msg)
    assert(spark.table("cons.ns.t2").count() == 0)
    Seq((9L, 1L)).toDF("k", "cents")
      .write.format("graft").mode("append").save(root)
    assert(spark.table("cons.ns.t2").count() == 1)
  }

  test("UPDATE and MERGE rewrites cannot smuggle a violating row") {
    spark.sql("""CREATE TABLE cons.ns.t3 (
                   k BIGINT, cents BIGINT,
                   CONSTRAINT cap CHECK (cents <= 100))
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO cons.ns.t3 VALUES (1, 10), (2, 20)")
    val msg = violates(
      spark.sql("UPDATE cons.ns.t3 SET cents = 500 WHERE k = 1"))
    assert(msg.toLowerCase.contains("cap"), msg)
    assert(spark.table("cons.ns.t3").where($"cents" > 100).count() == 0)
    Seq((2L, 9999L)).toDF("sk", "sc").createOrReplaceTempView("cons_merge_src")
    val msg2 = violates(spark.sql(
      """MERGE INTO cons.ns.t3 t USING cons_merge_src s ON t.k = s.sk
        |WHEN MATCHED THEN UPDATE SET cents = s.sc""".stripMargin))
    assert(msg2.toLowerCase.contains("cap"), msg2)
    // a legal update still lands
    spark.sql("UPDATE cons.ns.t3 SET cents = 99 WHERE k = 1")
    assert(spark.table("cons.ns.t3").where($"k" === 1).head().getLong(1) == 99)
  }

  test("ADD CONSTRAINT validates existing rows; DROP re-opens the door") {
    spark.sql("""CREATE TABLE cons.ns.t4 (k BIGINT, cents BIGINT)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    spark.sql("INSERT INTO cons.ns.t4 VALUES (1, -7), (2, 3)")
    // existing data violates → the ALTER must refuse, nothing recorded
    val msg = violates(spark.sql(
      "ALTER TABLE cons.ns.t4 ADD CONSTRAINT nn CHECK (cents >= 0)"))
    assert(msg.toLowerCase.contains("nn") || msg.toLowerCase.contains("check"), msg)
    spark.sql("INSERT INTO cons.ns.t4 VALUES (3, -1)") // still unconstrained
    // clean the data, add for real, and the constraint bites
    spark.sql("DELETE FROM cons.ns.t4 WHERE cents < 0")
    spark.sql("ALTER TABLE cons.ns.t4 ADD CONSTRAINT nn CHECK (cents >= 0)")
    val msg2 = violates(spark.sql("INSERT INTO cons.ns.t4 VALUES (4, -9)"))
    assert(msg2.toLowerCase.contains("nn") || msg2.toLowerCase.contains("check"), msg2)
    // duplicate name refuses
    val dup = violates(spark.sql(
      "ALTER TABLE cons.ns.t4 ADD CONSTRAINT nn CHECK (cents >= 1)"))
    assert(dup.contains("already exists"), dup)
    // DROP CONSTRAINT removes enforcement
    spark.sql("ALTER TABLE cons.ns.t4 DROP CONSTRAINT nn")
    spark.sql("INSERT INTO cons.ns.t4 VALUES (5, -2)")
    assert(spark.table("cons.ns.t4").where($"cents" < 0).count() == 1)
    // dropping an unknown name refuses without IF EXISTS
    val unk = violates(spark.sql("ALTER TABLE cons.ns.t4 DROP CONSTRAINT nope"))
    assert(unk.contains("nope"), unk)
    spark.sql("ALTER TABLE cons.ns.t4 DROP CONSTRAINT IF EXISTS nope")
  }

  test("a refused constraint fails CREATE without leaving an orphaned table") {
    // PRIMARY KEY over a non-key column refuses — and the refusal must
    // arrive BEFORE the base table commits, or the corrected retry
    // hits TableAlreadyExists on a table the user never created
    val bad = intercept[Exception](spark.sql(
      """CREATE TABLE cons.ns.t6 (k BIGINT, v BIGINT,
           CONSTRAINT pk PRIMARY KEY (v) NOT ENFORCED)
         USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')"""))
    assert(Iterator.iterate(bad: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("merge keys"))))
    // the corrected statement succeeds — no orphan blocked it
    spark.sql("""CREATE TABLE cons.ns.t6 (k BIGINT, v BIGINT,
                   CONSTRAINT pk PRIMARY KEY (k) NOT ENFORCED)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    assert(spark.table("cons.ns.t6").count() == 0)
    // raw constraint.* TBLPROPERTIES cannot smuggle an unvalidated
    // constraint through CREATE either
    val raw = intercept[Exception](spark.sql(
      """CREATE TABLE cons.ns.t7 (k BIGINT) USING graft
         TBLPROPERTIES ('keys'='k', 'constraint.check.x'='1=1')"""))
    assert(Iterator.iterate(raw: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(t => Option(t.getMessage).exists(_.contains("CONSTRAINT clauses"))))
  }

  test("PRIMARY KEY / UNIQUE accepted only over the merge keys") {
    spark.sql("""CREATE TABLE cons.ns.t5 (
                   k BIGINT, v STRING,
                   CONSTRAINT pk PRIMARY KEY (k) NOT ENFORCED)
                 USING graft TBLPROPERTIES ('keys'='k', 'numBuckets'='2')""")
    val cons = new GraftCatalog {
      initialize("c5", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("root", warehouse)))
    }.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("ns"), "t5")).constraints()
    assert(cons.exists(c => c.name() == "pk"))
    // a uniqueness claim over a NON-key column is unenforceable → refuse
    val msg = violates(spark.sql(
      "ALTER TABLE cons.ns.t5 ADD CONSTRAINT uq UNIQUE (v) NOT ENFORCED"))
    assert(msg.contains("merge keys"), msg)
    // constraints cannot be smuggled through raw TBLPROPERTIES
    val raw = violates(spark.sql(
      "ALTER TABLE cons.ns.t5 SET TBLPROPERTIES ('constraint.check.x'='1=1')"))
    assert(raw.toLowerCase.contains("add/drop constraint"), raw)
  }
}
