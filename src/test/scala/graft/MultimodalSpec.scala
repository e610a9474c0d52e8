package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing specs: schema, distribution shape, and the real
  * JDK codecs behind every decode/transform operator.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: binary payload + typed metadata struct, real codec bytes") {
    val schema = media.toDF().schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(media.count() == 500)
    // payloads carry real container magics per modality
    val byMod = media.collect().groupBy(_.modality)
    assert(byMod("image").forall(r => (r.payload(0) & 0xff) == 0x89 &&
      r.payload(1) == 'P'))                       // PNG signature
    assert(byMod("audio").forall(r => new String(r.payload.take(4)) == "RIFF"))
    assert(byMod("video").forall(r => new String(r.payload.take(3)) == "GIF"))
  }

  test("extractFeatures dispatches each modality to its real codec") {
    val feats = Multimodal.extractFeatures(media)
      .collect().map(f => f.doc_id -> f).toMap
    // doc 0: image — n_units = w*h pixels, value_sum = gray sum
    val (w, h) = (1, 1) // 1 + 0 % 64, 1 + 0 % 48
    assert(feats(0L).modality == "image")
    assert(feats(0L).n_units == w.toLong * h)
    assert(feats(0L).value_sum == (for { y <- 0 until h; x <- 0 until w }
      yield (7L * x + 13L * y) % 251).sum)
    // doc 1: audio — n_units = sample count, value_sum = abs amplitude sum
    val n = 64 + 1 % 128
    assert(feats(1L).modality == "audio")
    assert(feats(1L).n_units == n.toLong)
    assert(feats(1L).value_sum ==
      (0 until n).map(i => math.abs(((31L + 17L * i) % 2048) - 1024)).sum)
    // doc 2: video — n_units = frame count, value_sum = gray sum over frames
    val nf = 2 + 2 % 4
    assert(feats(2L).modality == "video")
    assert(feats(2L).n_units == nf.toLong)
    assert(feats(2L).value_sum == (for { f <- 0 until nf; y <- 0 until 6; x <- 0 until 8 }
      yield (2L + 11L * f + 7L * x + 13L * y) % 251).sum)
    // corrupt payload → (-1, -1) sentinel, batch survives
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(9L, "image", Array[Byte](1, 2, 3),
      Multimodal.MediaMeta(0, 0, 0))).toDS()
    val s = Multimodal.extractFeatures(bad).collect().head
    assert(s.n_units == -1L && s.value_sum == -1L)
  }

  test("resizeImages: real nearest-neighbor PNG round trip matches the formula") {
    val images = Multimodal.imageTable(spark, sf)
    val got = Multimodal.decodeImageFeatures(Multimodal.resizeImages(images, 16, 12))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    got.keys.toSeq.sorted.take(5).foreach { id =>
      val (w, h) = ((1 + id % 64).toInt, (1 + id % 48).toInt)
      val expSum = (for { y <- 0 until 12; x <- 0 until 16 } yield {
        val (sx, sy) = ((x.toLong * w / 16).toInt, (y.toLong * h / 12).toInt)
        (id + 7L * sx + 13L * sy) % 251
      }).sum
      assert(got(id) == ((16, 12, expSum)), s"doc $id")
    }
    // corrupt payload: empty-payload row, downstream decode yields sentinel
    import spark.implicits._
    val bad = Seq(Multimodal.ImageRow(3L, Array[Byte](1, 2, 3))).toDS()
    val s = Multimodal.decodeImageFeatures(Multimodal.resizeImages(bad, 16, 12))
      .collect().head
    assert(s.getLong(0) == 3L && s.getInt(1) == -1)
  }

  test("sampleVideoFrames: real GIF frame walk keeps strided frames with exact sums") {
    val frames = Multimodal.sampleVideoFrames(Multimodal.videoTable(spark, sf), 2)
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    val got = frames.collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    got.keys.toSeq.sorted.take(5).foreach { case (id, fi) =>
      val expSum = (for { y <- 0 until 6; x <- 0 until 8 }
        yield (id + 11L * fi + 7L * x + 13L * y) % 251).sum
      assert(got((id, fi)) == ((8, 6, expSum)), s"doc $id frame $fi")
    }
    // every doc contributes ceil(nFrames/2) kept frames
    val perDoc = frames.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.keys.toSeq.sorted.take(5).foreach { id =>
      assert(perDoc(id) == (2 + id % 4 + 1) / 2, s"doc $id")
    }
  }

  test("GIF round-trip: frame count, dims and pixel sum recover the formula; corrupt bytes yield sentinel") {
    import spark.implicits._
    val videos = Multimodal.videoTable(spark, sf)
    val got = Multimodal.decodeVideoFeatures(videos)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))))
      .toMap
    got.keys.toSeq.sorted.take(5).foreach { id =>
      val f = (2 + id % 4).toInt
      val expSum = (for { fi <- 0 until f; y <- 0 until 6; x <- 0 until 8 }
        yield (id + 11L * fi + 7L * x + 13L * y) % 251).sum
      assert(got(id) == ((f, 8, 6, expSum)), s"doc $id")
    }
    val bad = Seq(Multimodal.VideoRow(7L, Array[Byte](71, 73, 70))).toDS()
    val s = Multimodal.decodeVideoFeatures(bad).collect().head
    assert(s.getLong(0) == 7L && s.getInt(1) == -1 && s.getLong(4) == -1L)
  }

  test("WAV round-trip: decode recovers the generating formula; corrupt bytes yield sentinel") {
    import spark.implicits._
    val audio = Multimodal.audioTable(spark, sf)
    val got = Multimodal.decodeAudioFeatures(audio)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // recompute expectations for 5 docs straight from the formula
    got.keys.toSeq.sorted.take(5).foreach { id =>
      val n = (64 + id % 128).toInt
      val expSum = (0 until n).map(i => math.abs(((id * 31 + 17L * i) % 2048) - 1024)).sum
      assert(got(id) == ((8000, n.toLong, expSum)), s"doc $id")
    }
    // a corrupt payload must not fail the batch — sentinel row instead
    val bad = Seq(Multimodal.AudioRow(99L, Array[Byte](1, 2, 3))).toDS()
    val s = Multimodal.decodeAudioFeatures(bad).collect().head
    assert(s.getLong(0) == 99L && s.getInt(1) == -1 &&
      s.getLong(2) == -1L && s.getLong(3) == -1L)
  }

  test("image histogram: 8 bins per image incl. zeros; counts match the formula") {
    import spark.implicits._
    val got = Multimodal.imageHistogram(Multimodal.imageTable(spark, sf))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ids = got.keys.map(_._1).toSeq.distinct.sorted.take(3)
    ids.foreach { id =>
      val (w, h) = ((1 + id % 64).toInt, (1 + id % 48).toInt)
      val exp = new Array[Long](8)
      for (y <- 0 until h; x <- 0 until w)
        exp(((id + 7L * x + 13L * y) % 251).toInt / 32) += 1
      (0 until 8).foreach { b =>
        assert(got((id, b)) == exp(b), s"doc $id bin $b")
      }
      assert(exp.sum == w.toLong * h)
    }
    val bad = Seq(Multimodal.ImageRow(42L, Array[Byte](1, 2))).toDS()
    val s = Multimodal.imageHistogram(bad).collect()
    assert(s.length == 1 && s.head.getLong(0) == 42L && s.head.getInt(1) == -1)
  }

  test("WAV analysis: zero crossings and energy match the formula; sentinel on corrupt") {
    import spark.implicits._
    val got = Multimodal.analyzeAudio(Multimodal.audioTable(spark, sf))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    got.keys.toSeq.sorted.take(5).foreach { id =>
      val n = (64 + id % 128).toInt
      val v = (0 until n).map(i => ((id * 31 + 17L * i) % 2048) - 1024)
      val crossings = (1 until n).count(i => (v(i) < 0) != (v(i - 1) < 0)).toLong
      val energy = v.map(x => x * x).sum
      assert(got(id) == ((n.toLong, crossings, energy)), s"doc $id")
    }
    val bad = Seq(Multimodal.AudioRow(99L, Array[Byte](82, 73, 70))).toDS()
    val s = Multimodal.analyzeAudio(bad).collect().head
    assert(s.getLong(0) == 99L && s.getLong(1) == -1L &&
      s.getLong(2) == -1L && s.getLong(3) == -1L)
  }

  test("audio fingerprint: decoded energy-delta bits match an independent recompute; sentinel on corrupt") {
    import spark.implicits._
    val got = Multimodal.audioFingerprint(Multimodal.audioTable(spark, sf))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    got.keys.toSeq.sorted.take(8).foreach { id =>
      val n = (64 + id % 128).toInt
      val v = (0 until n).map(i => ((id * 31 + 17L * i) % 2048) - 1024)
      val nf = n / 8
      val e = (0 until nf).map(j => (0 until 8).map(k => v(8 * j + k) * v(8 * j + k)).sum)
      val total = e.sum
      val fp = (0 until math.min(nf - 1, 16))
        .filter(b => e(b + 1) > e(b)).map(b => 1L << b).sum +
        (0 until math.min(nf, 16))
          .filter(b => e(b) * nf > total).map(b => 1L << (b + 16)).sum
      assert(got(id) == ((nf.toLong, fp)), s"doc $id")
    }
    // fingerprints are 32-bit and non-degenerate corpus-wide
    assert(got.values.forall { case (_, fp) => fp >= 0 && fp < (1L << 32) })
    assert(got.values.map(_._2).toSet.size > 50, "fingerprints must discriminate")
    val bad = Seq(Multimodal.AudioRow(77L, Array[Byte](82, 73))).toDS()
    val s = Multimodal.audioFingerprint(bad).collect().head
    assert(s.getLong(0) == 77L && s.getLong(1) == -1L && s.getLong(2) == -1L)
  }

  test("perceptual hash: decoded-PNG bits match an independent formula recompute") {
    import spark.implicits._
    // independent reimplementation from the generator formula (no codec):
    // the gate must read the SAME bits out of the real decoded PNG
    def expected(id: Long): (Long, Long) = {
      val w = (1 + id % 64).toInt; val h = (1 + id % 48).toInt
      val means = new Array[Long](64)
      for (by <- 0 until 8; bx <- 0 until 8) {
        val y0 = by * h / 8; val y1 = math.max((by + 1) * h / 8, y0 + 1)
        val x0 = bx * w / 8; val x1 = math.max((bx + 1) * w / 8, x0 + 1)
        val px = for { y <- y0 until y1; x <- x0 until x1 }
          yield (id + 7L * x + 13L * y) % 251
        means(by * 8 + bx) = px.sum / px.size
      }
      val m = means.sum / 64
      val bits = means.map(v => if (v > m) 1L else 0L)
      (bits.take(32).foldLeft(0L)(_ * 2 + _), bits.drop(32).foldLeft(0L)(_ * 2 + _))
    }
    val got = Multimodal.imagePHash(Multimodal.imageTable(spark, sf))
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    got.keys.toSeq.sorted.take(8).foreach { id =>
      assert(got(id) == expected(id), s"doc $id phash")
    }
    // sentinel on corrupt payload
    val bad = Seq(Multimodal.ImageRow(99L, Array[Byte](1, 2, 3))).toDS()
    val sr = Multimodal.imagePHash(bad).collect().head
    assert(sr.getLong(3) == -1L && sr.getLong(4) == -1L)
    // exact-dup images (identical hash) exist in the synthetic corpus, so
    // the banded pairs gate surfaces hamming-0 pairs and never all-pairs
    val pairs = SparkEntry.queries("dedup_image_phash")(spark, sf)
    assert(pairs.filter(col("hamming") === 0).count() > 0)
  }

  test("keyframe fingerprints: decoded-GIF hashes match the formula; dup pairs share offsets") {
    import spark.implicits._
    // frame content is fully determined by (id + 11f) mod 251 — two videos
    // share a frame iff their offset sets intersect; recompute a few
    // fingerprints independently from the formula
    def fhash(id: Long, f: Int): Long =
      (for { y <- 0 until 6; x <- 0 until 8 } yield (id + 11L * f + 7 * x + 13 * y) % 251)
        .foldLeft(0L)((h, p) => (h * 31 + p) % 2147483647L)
    val got = Multimodal.videoFrameHashes(Multimodal.videoTable(spark, sf))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (id <- 0L to 7L; f <- 0 until (2 + id % 4).toInt)
      assert(got((id, f)) == fhash(id, f), s"doc $id frame $f")
    // videos 1 (offsets {1,12,23}) and 12 (offsets {12,23}) share 2 frames
    val pairs = SparkEntry.queries("dedup_video_frames")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.get((1L, 12L)).contains(2L),
      s"videos 1 and 12 must share exactly 2 keyframes, got ${pairs.get((1L, 12L))}")
    // sentinel on corrupt payload never pairs
    val bad = Seq(Multimodal.VideoRow(99L, Array[Byte](71, 73, 70))).toDS()
    val sr = Multimodal.videoFrameHashes(bad).collect().head
    assert(sr.getInt(1) == -1 && sr.getLong(2) == -1L)
  }

  test("stream_image_ingest: statuses equal an independent replay of band+Hamming dedup") {
    import spark.implicits._
    val out = SparkEntry.queries("stream_image_ingest")(spark, sf).persist()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.count() == nDocs, "one status per arrival")
    assert(out.filter(col("version") =!= col("doc_id") % 3 + 1).count() == 0,
      "version is the arrival batch")
    assert(out.filter(col("status") === "ok").count() > 0,
      "first arrivals survive")
    // independent replay: hash every arrival through the REAL codec path,
    // band-join against earlier arrivals, Hamming <= 10 verify
    val ph = Multimodal.imagePHash(
        spark.read.parquet(s"$sf/documents.parquet").select(col("doc_id"))
          .as[Long].map(id => Multimodal.ImageRow(id, Multimodal.pngBytes(id % 97))))
      .select(col("doc_id"), col("phash_hi"), col("phash_lo"),
        (col("doc_id") % 3).as("m"))
    val pb = ph.select(col("doc_id"), col("m"),
      col("phash_hi").as("h1"), col("phash_lo").as("h2"),
      explode(array(
        shiftright(col("phash_hi"), 16),
        col("phash_hi") % 65536 + 65536,
        shiftright(col("phash_lo"), 16) + 131072,
        col("phash_lo") % 65536 + 196608)).as("bk"))
    val expect = pb.as("x").join(pb.as("y"),
        col("x.bk") === col("y.bk") && (col("y.m") < col("x.m") ||
          (col("y.m") === col("x.m") && col("y.doc_id") < col("x.doc_id"))))
      .filter(expr("bit_count(x.h1 ^ y.h1) + bit_count(x.h2 ^ y.h2)") <= 10)
      .select(col("x.doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val got = out.filter(col("status") === "dup")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expect, s"dup set mismatch: extra=${got -- expect}, missing=${expect -- got}")
    out.unpersist()
  }
}
