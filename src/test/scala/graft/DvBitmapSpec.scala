package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.sources.DvBitmap

/** Compressed deletion bitmaps (r12): the scan-side replacement for the
  * r11 (fkey, pos) anti-join. Pure-kernel tests here; the storage/read
  * integration lives in ManifestStoreSpec, the zero-exchange plan pin in
  * PlanSpec.
  */
class DvBitmapSpec extends SparkSpec {

  private def check(ps: Array[Long]): Unit = {
    val bm = DvBitmap.build(ps)
    val set = ps.toSet
    assert(bm.cardinality == set.size.toLong)
    for (p <- set) assert(bm.contains(p), s"missing $p")
    // absent positions around each present one
    for (p <- set.take(1000); q <- Seq(p - 1, p + 1) if !set(q) && q >= 0)
      assert(!bm.contains(q), s"false positive $q")
    assert(bm.positions.toSeq == set.toSeq.sorted)
    val back = DvBitmap.deserialize(bm.serialize)
    assert(back.cardinality == bm.cardinality)
    assert(back.positions.toSeq == bm.positions.toSeq)
  }

  test("sparse chunks (array containers) round-trip") {
    check(Array(0L, 1L, 65535L, 65536L, 131071L, 1000000L, (1L << 33) + 7L))
  }

  test("dense chunk crosses into a bitset container") {
    // 10k positions inside one 65536 chunk → bitset (array caps at 4096)
    val rnd = new scala.util.Random(7)
    check(Array.fill(10000)(rnd.nextInt(65536).toLong))
    // and a mixed bitmap: one dense + one sparse chunk
    check(Array.tabulate(5000)(i => (i * 13 % 65536).toLong) ++
      Array(70000L, 80000L, 1L << 20))
  }

  test("duplicates collapse; empty bitmap behaves") {
    val bm = DvBitmap.build(Array(5L, 5L, 5L, 9L))
    assert(bm.cardinality == 2L && bm.contains(5L) && !bm.contains(6L))
    val empty = DvBitmap.build(Array.empty[Long])
    assert(empty.cardinality == 0L && !empty.contains(0L))
    assert(DvBitmap.deserialize(empty.serialize).cardinality == 0L)
  }

  test("union merges disjoint and overlapping sets") {
    val a = DvBitmap.build(Array(1L, 3L, 70000L))
    val b = DvBitmap.build(Array(2L, 3L, 80000L, 1L << 22))
    val u = DvBitmap.union(a, b)
    assert(u.positions.toSeq == Seq(1L, 2L, 3L, 70000L, 80000L, 1L << 22))
  }

  test("randomized parity against a reference set (dense + sparse mix)") {
    val rnd = new scala.util.Random(42)
    val ps = Array.fill(50000)(math.abs(rnd.nextLong()) % 3000000L)
    check(ps)
    // split → union == whole
    val (l, r) = ps.splitAt(ps.length / 2)
    val u = DvBitmap.union(DvBitmap.build(l), DvBitmap.build(r))
    assert(u.positions.toSeq == ps.toSet.toSeq.sorted)
  }

  test("deleted() hook: per-file keying, absent files never deleted") {
    val m = Map(
      UTF8String.fromString("file:/a.parquet") -> DvBitmap.build(Array(7L)))
    assert(DvBitmap.deleted(m, UTF8String.fromString("file:/a.parquet"), 7L))
    assert(!DvBitmap.deleted(m, UTF8String.fromString("file:/a.parquet"), 8L))
    assert(!DvBitmap.deleted(m, UTF8String.fromString("file:/b.parquet"), 7L))
  }

  test("loadBitmaps reads both the bitmap format and the legacy (fkey,pos) rows") {
    import SharedSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dvload").toString
    // legacy interchange format: one row per position
    Seq(("k1", 3L), ("k1", 9L), ("k2", 0L)).toDF("fkey", "pos")
      .coalesce(1).write.parquet(s"$dir/legacy")
    // r12 format: one bitmap row per file
    val bm = DvBitmap.build(Array(9L, 100000L))
    Seq(("k1", bm.serialize, bm.cardinality)).toDF("fkey", "bitmap", "n")
      .coalesce(1).write.parquet(s"$dir/bitmap")
    val loaded = DvBitmap.loadBitmaps(spark, Seq(s"$dir/legacy", s"$dir/bitmap"))
    assert(loaded.keySet == Set("k1", "k2"))
    // k1 fragments union across formats
    assert(loaded("k1").positions.toSeq == Seq(3L, 9L, 100000L))
    assert(loaded("k2").positions.toSeq == Seq(0L))
  }
}
