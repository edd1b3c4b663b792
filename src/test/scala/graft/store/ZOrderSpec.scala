package graft.store

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-zorder-$tag").toString

  private def grid(n: Int): org.apache.spark.sql.DataFrame =
    (0 until n * n).map(i => (i.toLong, i % n, i / n))
      .toDF("k", "x", "y").repartition(8)

  test("compactWithStatus reports attribution: (v, true) only when THIS call committed") {
    // r18 — the contract the chaos layout verifier depends on: a
    // nothing-fragmented no-op returns the PRE-EXISTING head (which
    // can be any rival's commit, any layout) with committed = false;
    // only (v, true) says the returned version's v=<v>- dirs are this
    // call's own rewrite.
    val root = tmpDir("cws") + "/t"
    val merge = SnapshotStore.upsertMerge(Seq("k"))
    SnapshotStore.init(spark, root,
      (1L to 8L).map(k => (k, k)).toDF("k", "v"), Seq("k"), numBuckets = 2)
    SnapshotStore.commitDelta(spark, root,
      Seq((1L, 10L)).toDF("k", "v"), Seq("k"), merge)
    // consolidate whatever multi-file buckets the init's parallel
    // write left, so the next compact is a GENUINE no-op
    SnapshotStore.compact(spark, root): Unit
    val head = SnapshotStore.latestVersion(spark, root).get
    assert(SnapshotStore.compactWithStatus(spark, root) == (head, false),
      "a no-op compact must return the pre-existing head, not claim it")
    // fragment a bucket via a merge-on-read tombstone sidecar, then
    // the compact genuinely rewrites and owns its returned version
    SnapshotStore.commitDeletes(spark, root,
      Seq(Tuple1(2L)).toDF("k"), Seq("k"))
    val (v, committed) = SnapshotStore.compactWithStatus(spark, root)
    assert(committed, "a rewriting compact must report attribution")
    assert(v == SnapshotStore.latestVersion(spark, root).get)
    assert(SnapshotStore.read(spark, root).count() == 7)
  }

  test("z-ordered chunks are local in EVERY dimension; lexicographic chunks are not") {
    val n = 64
    val df = grid(n) // uniform n×n grid
    val z = df.withColumn("z", ZOrder.code(df, Seq("x", "y"), bits = 6))
      .orderBy("z").select("x", "y").as[(Int, Int)].collect()
    val lex = df.orderBy("x", "y").select("x", "y").as[(Int, Int)].collect()
    def maxSpan(rows: Array[(Int, Int)], chunk: Int): (Int, Int) =
      rows.grouped(chunk).map { c =>
        (c.map(_._1).max - c.map(_._1).min, c.map(_._2).max - c.map(_._2).min)
      }.toSeq.unzip match { case (xs, ys) => (xs.max, ys.max) }
    val (zx, zy) = maxSpan(z, 64)   // ideal: aligned 8×8 quads, span 7
    val (lx, ly) = maxSpan(lex, 64) // one x-column per chunk: y spans it all
    assert(zx <= 31 && zy <= 31, s"z spans ($zx, $zy) not local")
    assert(lx <= 1 && ly == n - 1)
    assert(math.max(zx, zy) < math.max(lx, ly))
  }

  test("string codes are nondecreasing in string order; nulls take bucket 0") {
    val strs = (0 until 300).map(i => f"key-${(i * 37) % 300}%04d")
    val df = (strs :+ null).toDF("s")
    val got = df.withColumn("c", ZOrder.code(df, Seq("s"), bits = 5))
      .select("s", "c").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1)))
    got.filter(_._1.isEmpty).foreach { case (_, c) => assert(c == 0L) }
    val sorted = got.collect { case (Some(s), c) => (s, c) }.sortBy(_._1)
    sorted.sliding(2).filter(_.length == 2).foreach { pair =>
      val ((s1, c1), (s2, c2)) = (pair(0), pair(1))
      assert(c1 <= c2, s"code regressed from $s1($c1) to $s2($c2)")
    }
    // and the codes actually spread (quantiles placed boundaries)
    assert(sorted.map(_._2).distinct.size > 16)
  }

  test("compact(zOrderBy + split): per-file stats prune a non-leading dimension that lexicographic clustering cannot") {
    val n = 64
    def build(tag: String, zorder: Boolean): String = {
      val root = tmpDir(tag)
      SnapshotStore.init(spark, root, grid(n), Seq("k"), numBuckets = 1,
        statsCols = Seq("x", "y"))
      val v =
        if (zorder) SnapshotStore.compact(spark, root, minFiles = 2,
          zOrderBy = Seq("x", "y"), zOrderBits = 6, maxRecordsPerFile = 256L)
        else SnapshotStore.compact(spark, root, minFiles = 2,
          clusterBy = Seq("x", "y"), maxRecordsPerFile = 256L)
      assert(v == 1L, s"$tag fixture must actually compact")
      root
    }
    val zRoot = build("zfiles", zorder = true)
    val lexRoot = build("lexfiles", zorder = false)

    def keptFiles(root: String): (Int, Int) = {
      val m = SnapshotStore.readManifest(spark, root, 1L)
      val total = m.buckets(0).fileStats.size
      (SnapshotStore.pruneFiles(m, 0, "y", 0, 7).get.size, total)
    }
    val (zKept, zTotal) = keptFiles(zRoot)
    val (lexKept, lexTotal) = keptFiles(lexRoot)
    assert(zTotal >= 8 && lexTotal >= 8, s"split produced ($zTotal, $lexTotal) files")
    // lexicographic files each span the full y range — nothing prunes;
    // z-ordered files cover hyper-rectangles — most of them prune
    assert(lexKept == lexTotal)
    assert(zKept * 2 <= zTotal, s"z kept $zKept of $zTotal")

    // pruning is still exact: both layouts return the same rows, equal
    // to the full scan + filter
    val expected = (0 until n * n).filter(i => i / n <= 7)
      .map(i => (i.toLong, i % n, i / n)).toSet
    Seq(zRoot, lexRoot).foreach { root =>
      val got = SnapshotStore.readRange(spark, root, "y", 0, 7)
        .select("k", "x", "y").as[(Long, Int, Int)].collect().toSet
      assert(got == expected, s"pruned read at $root diverged")
    }
    // bucket-level stats carried over exactly
    val m0 = SnapshotStore.readManifest(spark, zRoot, 0L)
    val m1 = SnapshotStore.readManifest(spark, zRoot, 1L)
    assert(m1.buckets(0).stats == m0.buckets(0).stats)
  }
}
