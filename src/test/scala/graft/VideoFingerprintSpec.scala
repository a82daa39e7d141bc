package graft

import graft.ext.{ImageHash, VideoFingerprint}

/** ISO-BMFF keyframe extraction + video near-dup invariants: hand-built
  * containers exercising every sample-table geometry (uniform and
  * per-sample stsz, single- and multi-chunk stsc/stco, co64, missing
  * stss), planted perceptual twins, and the matched-keyframe threshold.
  */
class VideoFingerprintSpec extends SparkSpec {
  import spark.implicits._

  // ---- minimal box builders -------------------------------------------
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xFFFFFFFFL)

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload

  private def fullBox(typ: String, body: Array[Byte]): Array[Byte] =
    box(typ, be32(0) ++ body)

  private val ftyp = box("ftyp", "isom".getBytes ++ be32(0))

  /** Assemble a playable-enough MP4: moov with the given sample-table
    * boxes, then mdat carrying `samples` back to back. Chunk offsets in
    * `stcoOffsets` are RELATIVE to the mdat payload start and fixed up
    * here.
    */
  private def mp4(stss: Option[Seq[Int]], sizes: Either[Long, Seq[Long]],
      sampleCount: Int, chunkRuns: Seq[(Int, Int)], relOffsets: Seq[Long],
      samples: Array[Byte], co64: Boolean = false): Array[Byte] = {
    val stsz = fullBox("stsz", sizes match {
      case Left(u) => be32(u) ++ be32(sampleCount.toLong)
      case Right(ss) => be32(0) ++ be32(ss.length.toLong) ++
        ss.flatMap(be32).toArray
    })
    val stsc = fullBox("stsc", be32(chunkRuns.length.toLong) ++
      chunkRuns.flatMap { case (fc, spc) => be32(fc.toLong) ++ be32(spc.toLong) ++ be32(1L) }.toArray)
    val stssBox = stss.map(ss => fullBox("stss",
      be32(ss.length.toLong) ++ ss.flatMap(i => be32(i.toLong)).toArray))
    // two passes: the absolute chunk offsets depend on moov's size,
    // which depends on the stco box size (not its values) — sizes are
    // stable across the passes
    def build(abs: Seq[Long]): Array[Byte] = {
      val stco =
        if (co64) fullBox("co64", be32(abs.length.toLong) ++ abs.flatMap(be64).toArray)
        else fullBox("stco", be32(abs.length.toLong) ++ abs.flatMap(be32).toArray)
      val stbl = box("stbl", stssBox.getOrElse(Array.emptyByteArray) ++
        stsz ++ stsc ++ stco)
      val moov = box("moov", box("trak", box("mdia", box("minf", stbl))))
      ftyp ++ moov ++ box("mdat", samples)
    }
    val probe = build(relOffsets)
    val mdatPayloadStart = probe.length - samples.length
    build(relOffsets.map(_ + mdatPayloadStart))
  }

  private def gray(seed: Int, perturbAt: Int): Array[Byte] = {
    // reuse the 16x16 BMP shape the image spec uses
    val stride = 48
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    out.write('B'); out.write('M')
    out.write(le32(54 + stride * 16)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(16)); out.write(le32(-16))
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(stride * 16))
    out.write(le32(0)); out.write(le32(0)); out.write(le32(0)); out.write(le32(0))
    for (y <- 0 until 16; x <- 0 until 16) {
      val base = ((x * 7 + y * 11) * seed) % 256
      val v = if (perturbAt >= 0 && x == perturbAt && y == 0) (base + 8) % 256
      else base
      out.write(v); out.write(v); out.write(v)
    }
    out.toByteArray
  }

  private def dhashOf(b: Array[Byte]): Long =
    ImageHash.dHash(ImageHash.decodeLuma(b).get).get

  test("keyframes: uniform stsz, one chunk, stss selects the sync samples") {
    val frames = Seq(gray(31, -1), gray(57, -1), gray(97, -1),
      gray(131, -1), gray(151, -1))
    assert(frames.map(_.length).distinct.size == 1)
    val sz = frames.head.length.toLong
    val v = mp4(Some(Seq(1, 3, 5)), Left(sz), 5, Seq((1, 5)), Seq(0L),
      frames.flatten.toArray)
    val got = VideoFingerprint.keyframePayloads(v, 8)
    assert(got.size == 3)
    assert(got.map(dhashOf) ==
      Seq(frames(0), frames(2), frames(4)).map(dhashOf))
  }

  test("keyframes: per-sample sizes, two chunks, co64 offsets") {
    val frames = Seq(gray(31, -1), gray(57, -1), gray(97, -1))
    val pad = Array.fill[Byte](17)(9) // non-frame junk between chunks
    val sizes = frames.map(_.length.toLong)
    // chunk 1: samples 1-2 at rel 0; chunk 2: sample 3 after the junk
    val samples = frames(0) ++ frames(1) ++ pad ++ frames(2)
    val v = mp4(Some(Seq(1, 3)), Right(sizes), 3, Seq((1, 2), (2, 1)),
      Seq(0L, (frames(0).length + frames(1).length + pad.length).toLong),
      samples, co64 = true)
    val got = VideoFingerprint.keyframePayloads(v, 8)
    assert(got.size == 2)
    assert(got.map(dhashOf) == Seq(frames(0), frames(2)).map(dhashOf))
  }

  test("keyframes: missing stss means every sample is sync, capped") {
    val frames = Seq(gray(31, -1), gray(57, -1), gray(97, -1))
    val sz = frames.head.length.toLong
    val v = mp4(None, Left(sz), 3, Seq((1, 3)), Seq(0L), frames.flatten.toArray)
    assert(VideoFingerprint.keyframePayloads(v, 8).size == 3)
    assert(VideoFingerprint.keyframePayloads(v, 2).size == 2)
  }

  test("keyframes: garbage, truncation, and non-mp4 fail closed") {
    assert(VideoFingerprint.keyframePayloads(null, 8).isEmpty)
    assert(VideoFingerprint.keyframePayloads(Array[Byte](1, 2, 3), 8).isEmpty)
    assert(VideoFingerprint.keyframePayloads(gray(31, -1), 8).isEmpty)
    val frames = Seq(gray(31, -1), gray(57, -1))
    val sz = frames.head.length.toLong
    val whole = mp4(Some(Seq(1, 2)), Left(sz), 2, Seq((1, 2)), Seq(0L),
      frames.flatten.toArray)
    // cut mid-mdat: the second sync sample's slice falls outside and skips
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 100)
    assert(VideoFingerprint.keyframePayloads(cut, 8).size == 1)
  }

  test("videoNearDupPairs: full twin pairs, partial overlap does not") {
    def video(kfSeeds: Seq[Int], perturbKf0: Boolean): Array[Byte] = {
      val kfs = kfSeeds.zipWithIndex.map { case (s, i) =>
        gray(s, if (perturbKf0 && i == 0) 0 else -1)
      }
      // interleave non-sync junk frames (different seeds entirely)
      val all = Seq(kfs(0), gray(9991, -1), kfs(1), gray(9992, -1), kfs(2))
      val sz = all.head.length.toLong
      mp4(Some(Seq(1, 3, 5)), Left(sz), 5, Seq((1, 5)), Seq(0L),
        all.flatten.toArray)
    }
    val rows = Seq(
      (10L, video(Seq(31, 57, 97), perturbKf0 = false)),
      (11L, video(Seq(31, 57, 97), perturbKf0 = true)), // full twin of 10
      (20L, video(Seq(31, 201, 223), perturbKf0 = false)), // shares ONE kf with 10
      (30L, video(Seq(131, 151, 173), perturbKf0 = false))) // stranger
    val df = rows.toDF("media_id", "payload")
    val got = VideoFingerprint.videoNearDupPairs(spark, df)
      .select("id1", "id2", "matched1", "matched2", "nkf1", "nkf2")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 11L, 3L, 3L, 3L, 3L)))
    // lowering the threshold surfaces the one-keyframe overlap too
    val loose = VideoFingerprint.videoNearDupPairs(spark, df,
        minMatchedKeyframes = 1)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(loose == Set((10L, 11L), (10L, 20L), (11L, 20L)))
  }

  test("sceneCuts: hard cuts flagged, continuous footage silent") {
    // video A: three visually distinct scenes -> cuts at kf 1 and 2;
    // video B: the same frame three times -> no cuts
    def video(seeds: Seq[Int]): Array[Byte] = {
      val kfs = seeds.map(s => gray(s, -1))
      val all = Seq(kfs(0), gray(9991, -1), kfs(1), gray(9992, -1), kfs(2))
      mp4(Some(Seq(1, 3, 5)), Left(all.head.length.toLong), 5,
        Seq((1, 5)), Seq(0L), all.flatten.toArray)
    }
    val df = Seq(
      (1L, video(Seq(31, 97, 151))),
      (2L, video(Seq(31, 31, 31)))).toDF("media_id", "payload")
    val cuts = VideoFingerprint.sceneCuts(spark, df, cutHamming = 10)
      .select("media_id", "cut_kf").as[(Long, Int)].collect().toSet
    assert(cuts === Set((1L, 1), (1L, 2)))
  }

  test("videoNearDupPairs: band join, never an all-pairs stage") {
    val frames = Seq(gray(31, -1), gray(57, -1), gray(97, -1))
    val sz = frames.head.length.toLong
    val v = mp4(Some(Seq(1, 2, 3)), Left(sz), 3, Seq((1, 3)), Seq(0L),
      frames.flatten.toArray)
    val df = Seq((1L, v), (2L, v)).toDF("media_id", "payload")
    val plan = VideoFingerprint.videoNearDupPairs(spark, df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
  test("keyframes: corrupt uniform stsz sample_count fails closed") {
    // an adversarial u32 sample_count in the UNIFORM stsz path must be
    // rejected before allocating the size table (advice r14): every
    // sample needs >= 1 byte of file, so count > file size is corrupt
    val frames = Seq(gray(31, -1))
    val v = mp4(Some(Seq(1)), Left(frames.head.length.toLong),
      Int.MaxValue - 5, Seq((1, 1)), Seq(0L), frames.flatten.toArray)
    assert(VideoFingerprint.keyframePayloads(v, 8).isEmpty)
  }

  test("incrementalVideoDedup: census-gated reps; one-scene overlap admits") {
    import spark.implicits._
    def video(kfSeeds: Seq[Int], perturbKf0: Boolean): Array[Byte] = {
      val kfs = kfSeeds.zipWithIndex.map { case (s, i) =>
        gray(s, if (perturbKf0 && i == 0) 0 else -1)
      }
      val all = Seq(kfs(0), gray(9991, -1), kfs(1), gray(9992, -1), kfs(2))
      val sz = all.head.length.toLong
      mp4(Some(Seq(1, 3, 5)), Left(sz), 5, Seq((1, 5)), Seq(0L),
        all.flatten.toArray)
    }
    def seeds(id: Int): Seq[Int] = Seq(id * 6 + 31, id * 6 + 33, id * 6 + 35)
    // corpus: even ids, plain; batch: odd ids — %10==1 full twin of the
    // in-corpus id-1, %10==5 full twin of batch peer id-2, %10==7 shares
    // ONLY keyframe 0 with in-corpus id-3 (below the census threshold)
    val corpus = (0 until 20 by 2)
      .map(i => (i.toLong, video(seeds(i), perturbKf0 = false)))
      .toDF("media_id", "payload")
    val batch = (1 until 20 by 2).map { i =>
      val payload =
        if (i % 10 == 1) video(seeds(i - 1), perturbKf0 = true)
        else if (i % 10 == 5) video(seeds(i - 2), perturbKf0 = true)
        else if (i % 10 == 7)
          video(seeds(i - 3).head +: seeds(i).tail, perturbKf0 = false)
        else video(seeds(i), perturbKf0 = false)
      (i.toLong, payload)
    }.toDF("media_id", "payload")
    val index = VideoFingerprint.videoBucketIndex(spark, corpus)
    val got = VideoFingerprint.incrementalVideoDedup(spark, batch, index)
      .select("media_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.length == 10)
    got.foreach { case (id, rep, dup) =>
      if (id % 10 == 1) assert(rep == id - 1 && dup, s"corpus twin $id -> $rep")
      else if (id % 10 == 5) assert(rep == id - 2 && dup, s"batch twin $id -> $rep")
      else assert(rep == id && !dup, s"admit $id -> $rep")
    }
  }

  test("incrementalVideoDedup: unparseable containers admit (no evidence)") {
    import spark.implicits._
    val frames = Seq(gray(31, -1), gray(57, -1), gray(97, -1))
    val ok = mp4(Some(Seq(1, 2, 3)), Left(frames.head.length.toLong), 3,
      Seq((1, 3)), Seq(0L), frames.flatten.toArray)
    val corpus = Seq((0L, ok)).toDF("media_id", "payload")
    val batch = Seq(
      (1L, Array[Byte](0, 0, 0)),
      (3L, ok)).toDF("media_id", "payload")
    val index = VideoFingerprint.videoBucketIndex(spark, corpus)
    val got = VideoFingerprint.incrementalVideoDedup(spark, batch, index)
      .select("media_id", "rep_id", "is_dup")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // id 3 is a byte-identical copy of the accepted corpus video 0
    assert(got == Seq((1L, 1L, false), (3L, 0L, true)))
  }
}
