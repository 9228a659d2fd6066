package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ustar shard packing: the decoder is checked against a HAND-BUILT
  * archive (an independent writer living in this spec), and the packing
  * operator against hand-derived assignment arithmetic — the
  * VideoContainerSpec discipline applied to tar. */
class TarShardsSpec extends SparkSpec {

  /** Independent longhand ustar writer: one member, explicit field
    * layout, checksum summed here rather than by TarArchive. */
  private def handBuiltTar(name: String, data: Array[Byte]): Array[Byte] = {
    val padded = (data.length + 511) / 512 * 512
    val out = new Array[Byte](512 + padded + 1024)
    val h = new Array[Byte](512)
    name.getBytes("US-ASCII").copyToArray(h, 0)
    def oct(off: Int, width: Int, v: Long): Unit = {
      val s = ("0" * 32 + java.lang.Long.toOctalString(v)).takeRight(width - 1)
      s.getBytes("US-ASCII").copyToArray(h, off)
      h(off + width - 1) = 0
    }
    oct(100, 8, 0x1a4); oct(108, 8, 0); oct(116, 8, 0)
    oct(124, 12, data.length.toLong); oct(136, 12, 0)
    h(156) = '0'
    "ustar".getBytes("US-ASCII").copyToArray(h, 257)
    h(263) = '0'; h(264) = '0'
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(b => sum += b & 0xff)
    val cs = ("000000" + java.lang.Long.toOctalString(sum)).takeRight(6)
    cs.getBytes("US-ASCII").copyToArray(h, 148)
    h(154) = 0; h(155) = ' '
    h.copyToArray(out, 0)
    data.copyToArray(out, 512)
    out
  }

  test("decodes a hand-built ustar archive; slices the exact payload") {
    val data = "hello shard".getBytes("US-ASCII")
    val tar = handBuiltTar("a.txt", data)
    val entries = TarArchive.decodeTar(tar).getOrElse(fail("decode failed"))
    assert(entries.length == 1)
    val e = entries.head
    assert(e.name == "a.txt" && e.dataOffset == 512 && e.size == data.length)
    assert(TarArchive.memberBytes(tar, e).toSeq == data.toSeq)
  }

  test("encoder round-trip: member order, offsets, padding, terminator") {
    val members = Seq(
      ("x" -> Array.tabulate(5)(_.toByte)),
      ("name-with-more-chars" -> Array.tabulate(513)(i => (i % 251).toByte)),
      ("z" -> Array.empty[Byte]),
      ("w" -> Array.tabulate(512)(i => (255 - i % 256).toByte)))
    val tar = TarArchive.encodeTar(members)
    // footprints: 512+512, 512+1024, 512+0, 512+512; terminator 1024
    assert(tar.length == 1024 + 1536 + 512 + 1024 + 1024)
    val entries = TarArchive.decodeTar(tar).getOrElse(fail("decode failed"))
    assert(entries.map(_.name) == members.map(_._1))
    assert(entries.map(_.dataOffset) == Seq(512L, 1024 + 512L, 1024 + 1536 + 512L, 1024 + 1536 + 512 + 512L))
    entries.zip(members).foreach { case (e, (_, d)) =>
      assert(e.size == d.length)
      assert(TarArchive.memberBytes(tar, e).toSeq == d.toSeq)
    }
  }

  test("malformed archives return None: truncation, checksum, magic, terminator") {
    val good = TarArchive.encodeTar(Seq("a" -> Array[Byte](1, 2, 3)))
    assert(TarArchive.decodeTar(good).isDefined)
    for (cut <- Seq(100, 600, good.length - 700, good.length - 1))
      assert(TarArchive.decodeTar(good.take(cut)).isEmpty, s"cut=$cut")
    val badSum = good.clone(); badSum(20) = 'Q'.toByte // name change breaks checksum
    assert(TarArchive.decodeTar(badSum).isEmpty)
    val badMagic = good.clone(); badMagic(257) = 'X'.toByte
    assert(TarArchive.decodeTar(badMagic).isEmpty)
    intercept[IllegalArgumentException] {
      TarArchive.encodeTar(Seq(("n" * 101) -> Array[Byte](1)))
    }
    // non-ASCII names would silently decode to a different name — rejected
    intercept[IllegalArgumentException] {
      TarArchive.encodeTar(Seq("naïve" -> Array[Byte](1)))
    }
  }

  test("pack+index: hand-derived assignment, slices verified, oversized member packs alone") {
    import spark.implicits._
    val blobs = Seq(
      ("m1", Array.tabulate(100)(_.toByte)),
      ("m2", Array.tabulate(700)(i => (i % 127).toByte)),
      ("m3", Array.tabulate(2000)(i => (i % 83).toByte)) // 512+2048 > target alone
    ).toDF("name", "bytes")
    val shards = TarShards.pack(blobs, targetShardBytes = 1024, salt = "t")
    val idx = TarShards.index(shards).collect()
    assert(idx.forall(_.getInt(1) >= 0)) // no sentinel rows
    // every member appears exactly once with its exact payload checksum
    val byName = idx.map(r => r.getString(2) -> r).toMap
    assert(byName.keySet == Set("m1", "m2", "m3"))
    val sums = Map(
      "m1" -> (0 until 100).map(_.toLong).sum,
      "m2" -> (0 until 700).map(i => (i % 127).toLong).sum,
      "m3" -> (0 until 2000).map(i => (i % 83).toLong).sum)
    sums.foreach { case (n, s) => assert(byName(n).getLong(5) == s, n) }
    // per shard: length = member footprints + the 1024-byte terminator,
    // offsets = 512 + running footprint sum in member order (so the
    // oversized m3 — footprint 2560 > target — still packs, alone)
    idx.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getInt(1))
      val foot = ordered.map(r => TarArchive.entryBytes(r.getLong(4)))
      assert(ordered.head.getLong(6) == foot.sum + 1024)
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(3) == foot.take(i).sum + 512)
      }
    }
  }

  test("bucket isolation: adding a member repacks only its own bucket's shards") {
    import spark.implicits._
    val rows = (0 until 400).map(i =>
      (s"m-$i", Array.tabulate(80 + i % 300)(j => ((i + j) % 256).toByte)))
    def shardBytes(data: Seq[(String, Array[Byte])]): Map[String, Seq[Byte]] =
      TarShards.pack(data.toDF("name", "bytes"), targetShardBytes = 2048)
        .collect()
        .map(r => r.getString(0) -> r.getAs[Array[Byte]]("shard_bytes").toSeq)
        .toMap
    val before = shardBytes(rows)
    val added = ("m-new", Array.tabulate(150)(_.toByte))
    val after = shardBytes(rows :+ added)
    // the new member lands in exactly one 2-hex bucket; every shard in
    // every OTHER bucket must be byte-identical — the content-addressed
    // assignment's incremental-repack guarantee (1/256 of shards touched)
    val newBucket = after.keys.filterNot(before.contains).map(_.take(2)) ++
      before.collect { case (k, v) if after.get(k).exists(_ != v) => k.take(2) }
    assert(newBucket.toSet.size == 1, s"expected one touched bucket, got $newBucket")
    val touched = newBucket.head
    before.foreach { case (sid, bytes) =>
      if (!sid.startsWith(touched))
        assert(after(sid) == bytes, s"shard $sid changed outside bucket $touched")
    }
  }

  test("packPaired: samples stay atomic and adjacent in name order") {
    import spark.implicits._
    // 80 samples × (image-ish + text) members with varying sizes; a tiny
    // shard target forces many shard boundaries — no pair may straddle one
    val rows = (0 until 80).flatMap { i =>
      val smp = s"s-$i"
      Seq(
        (smp, s"$smp.img", Array.tabulate(300 + (i % 11) * 40)(j => ((i + j) % 256).toByte)),
        (smp, s"$smp.txt", Array.tabulate(40 + i % 60)(j => ((i * 3 + j) % 256).toByte)))
    }
    val idx = TarShards.index(TarShards.packPaired(
        rows.toDF("sample", "name", "bytes"), targetShardBytes = 2048))
      .orderBy(col("shard_id"), col("member_no")).collect()
    assert(idx.length == 160)
    // group members by basename: both live in the same shard, adjacent,
    // .img (name-order first) immediately before .txt
    idx.groupBy(_.getString(2).split('.').head).foreach { case (smp, ms) =>
      assert(ms.length == 2, s"$smp split across shards or lost a member")
      val Array(a, b) = ms.sortBy(_.getInt(1))
      assert(a.getString(0) == b.getString(0), s"$smp pair split across shards")
      assert(a.getInt(1) + 1 == b.getInt(1), s"$smp members not adjacent")
      assert(a.getString(2).endsWith(".img") && b.getString(2).endsWith(".txt"))
    }
    // determinism across partitionings, sample-level
    val again = TarShards.index(TarShards.packPaired(
        rows.toDF("sample", "name", "bytes").repartition(9), targetShardBytes = 2048))
      .orderBy(col("shard_id"), col("member_no")).collect()
    assert(idx.sameElements(again))
  }

  test("duplicate names stay deterministic via the content-hash tie-break") {
    import spark.implicits._
    // many members sharing ONE name (identical __ord): order inside the
    // bucket must fall back to md5(bytes), so shard bytes are stable
    // across partitionings even when ties straddle a shard boundary
    val rows = (0 until 60).map(i =>
      ("same-name", Array.tabulate(400 + (i % 7))(j => ((i * 13 + j) % 256).toByte)))
    def run(parts: Int) =
      TarShards.index(TarShards.pack(
        rows.toDF("name", "bytes").repartition(parts), targetShardBytes = 2048))
        .orderBy(col("shard_id"), col("member_no")).collect()
    val a = run(1); val b = run(7)
    assert(a.length == 60 && a.sameElements(b))
    // and the packed archives themselves are byte-identical
    def bytesOf(parts: Int) =
      TarShards.pack(rows.toDF("name", "bytes").repartition(parts),
        targetShardBytes = 2048)
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("shard_bytes").toSeq)
        .toMap
    assert(bytesOf(1) == bytesOf(5))
  }

  test("pack is deterministic across input partitionings") {
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      (s"doc-$i", Array.tabulate(50 + i % 400)(j => ((i * 31 + j) % 256).toByte)))
    val a = TarShards.index(TarShards.pack(
      rows.toDF("name", "bytes").repartition(1), targetShardBytes = 4096))
      .orderBy(col("shard_id"), col("member_no")).collect()
    val b = TarShards.index(TarShards.pack(
      rows.toDF("name", "bytes").repartition(13), targetShardBytes = 4096))
      .orderBy(col("shard_id"), col("member_no")).collect()
    assert(a.length == 300 && a.sameElements(b))
  }
}
