package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, TextOps, VectorOps}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq("x").toDF("dummy").select(c).head().getAs[T](0)

  test("chunkWindows: stride overlap, exact offsets, remainder tail, " +
      "zero-token docs skipped, params validated") {
    import graft.ops.TextOps
    // doc 1: 10 tokens, window 4 stride 3 -> starts 0,3,6,9
    val toks = (1 to 10).map(i => s"t$i")
    val df = Seq((1L, toks.mkString(" ")), (2L, "   "), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = TextOps.chunkWindows(df, "doc_id", "text", 4, 3)
      .orderBy("doc_id", "c_idx").collect()
    val d1 = out.filter(_.getLong(0) == 1L)
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(d1.toSeq === Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10"),
      (3L, 9L, 1L, "t10")))           // remainder tail, never padded
    // overlap property: consecutive windows share window - stride tokens
    assert(d1(0)._4.split(' ').takeRight(1).toSeq ===
      d1(1)._4.split(' ').take(1).toSeq)
    // whitespace-only doc -> no chunks; single-token doc -> one chunk
    assert(!out.exists(_.getLong(0) == 2L))
    assert(out.filter(_.getLong(0) == 3L).map(_.getString(4)).toSeq ===
      Seq("solo"))
    // every doc token reconstructs exactly once from the stride-aligned
    // head (first `stride` tokens) of each chunk
    val heads = d1.flatMap(_._4.split(' ').take(3)).toSeq
    assert(heads === toks)
    intercept[IllegalArgumentException] {
      TextOps.chunkWindows(df, "doc_id", "text", 4, 5) // stride > window
    }
  }

  test("polyHash matches the mod-P polynomial recurrence") {
    // fold('abc') = (0*31+97)*31+98)*31+99 = 96354 (== String.hashCode
    // for short ASCII strings, before any mod wrap)
    val h = Seq("abc").toDF("s").select(TextOps.polyHash(col("s"))).head().getLong(0)
    assert(h === 96354L)
    assert(h === "abc".hashCode.toLong)
  }

  test("tokens drops empties; shingles window correctly") {
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(TextOps.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(TextOps.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(short === Seq("a b"))
  }

  test("minHash signature has k components, values < P") {
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    val sig = df.select(TextOps.minHash(
      TextOps.shingleHashes(col("t"), 3), 16)).head().getSeq[Long](0)
    assert(sig.length === 16)
    assert(sig.forall(v => v >= 0 && v < TextOps.P))
  }

  test("identical texts collide on every LSH band; disjoint texts on none") {
    val df = Seq(
      (1, "alpha beta gamma delta epsilon zeta"),
      (2, "alpha beta gamma delta epsilon zeta"),
      (3, "one two three four five six seven")).toDF("id", "t")
    val sigs = df.select(col("id"), TextOps.lshBands(
      TextOps.minHash(TextOps.shingleHashes(col("t"), 3), 16), 4, 4).as("b"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1) === sigs(2))
    assert(sigs(1).intersect(sigs(3)).isEmpty)
  }

  test("simHash is stable and within 32 bits") {
    val df = Seq("spark catalyst tungsten codegen").toDF("t")
    val s1 = df.select(TextOps.simHash(col("t"))).head().getLong(0)
    val s2 = df.select(TextOps.simHash(col("t"))).head().getLong(0)
    assert(s1 === s2)
    assert(s1 >= 0 && s1 < (1L << 32))
  }

  test("hamming distance via bit_count of xor") {
    val df = Seq((0b1011L, 0b0011L)).toDF("a", "b")
    assert(df.select(TextOps.hamming(col("a"), col("b"))).head().getInt(0) === 1)
  }

  test("winnow: fingerprints are a subset of gram hashes, deduped") {
    val df = Seq("abcdefghijklmnopqrstuvwxyz").toDF("t")
    val fp = df.select(TextOps.winnow(col("t"), 8, 4)).head().getSeq[Long](0)
    assert(fp.nonEmpty)
    assert(fp.distinct.length === fp.length)
  }

  test("langId picks the max-stopword-hit language deterministically") {
    val en = Seq("the cat sat on the mat and a dog").toDF("t")
      .select(TextOps.langId(col("t"))).head().getString(0)
    assert(en === "en")
    val de = Seq("der hund und die katze ist ein tier").toDF("t")
      .select(TextOps.langId(col("t"))).head().getString(0)
    assert(de === "de")
  }
}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot/norm/cosine fold left in array order") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val dot = df.select(VectorOps.dot(col("a"), col("b"))).head().getDouble(0)
    assert(dot === 32.0)
    val cos = df.select(VectorOps.cosine(col("a"), col("a"))).head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
  }

  test("lshSignature is deterministic and bucket-bounded") {
    val df = Seq(Tuple1(Seq.fill(64)(0.25f))).toDF("v")
    val s1 = df.select(VectorOps.lshSignature(col("v"), 4)).head().getLong(0)
    val s2 = df.select(VectorOps.lshSignature(col("v"), 4)).head().getLong(0)
    assert(s1 === s2)
    assert(s1 >= 0 && s1 < 16)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mkDf = {
    val rows = Seq(
      Row(1L, "image", "abcdef".getBytes("UTF-8"),
        Row("png", 32, 32, null.asInstanceOf[Integer])),
      Row(2L, "video", ("x" * 100).getBytes("UTF-8"),
        Row("h264", 640, 480, Integer.valueOf(3000))),
      Row(3L, "audio", null, Row("pcm", null.asInstanceOf[Integer],
        null.asInstanceOf[Integer], Integer.valueOf(1500))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.schema)
  }

  test("headerDims parses real PNG/JPEG container headers (no decoder " +
      "library): dimensions without touching a pixel") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR, width 640 x height 360 (ISO 15948 §11.2.2)
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0x00, 0x00, 0x00, 0x0D, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x02, 0x80, // width 640
      0x00, 0x00, 0x01, 0x68, // height 360
      0x08, 0x06, 0x00, 0x00, 0x00)
    assert(Multimodal.headerDims(png) === ("png", 640, 360))
    // JPEG: SOI, APP0 (16-byte segment), SOF0 with 240x320 (T.81 B.2.2)
    val jpeg = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10) ++ new Array[Byte](14) ++ b(
      0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x00, 0xF0, // height 240
      0x01, 0x40, // width 320
      0x03) ++ new Array[Byte](20)
    assert(Multimodal.headerDims(jpeg) === ("jpeg", 320, 240))
    // truncated/unknown payloads degrade, never throw
    assert(Multimodal.headerDims("not an image".getBytes)._1 ===
      "unknown")
    assert(Multimodal.headerDims(b(0xFF, 0xD8, 0x00, 0x00)) ===
      ("jpeg", -1, -1))
    // and the column form runs in the partition batch pass
    val rows = Seq(Row(10L, "image", png,
      null.asInstanceOf[Row]), Row(11L, "image", jpeg,
      null.asInstanceOf[Row]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.schema)
    val out = Multimodal.withHeaderDims(df).orderBy("id").collect()
    assert(out(0).getAs[String]("codec_detected") === "png")
    assert(out(0).getAs[Int]("px_width") === 640)
    assert(out(1).getAs[Int]("px_height") === 240)
  }

  test("decodeFeatures: schema, checksum and deterministic fake features") {
    val out = Multimodal.decodeFeatures(mkDf).orderBy("id").collect()
    assert(out.length === 3)
    val r1 = out(0)
    assert(r1.getAs[Int]("n_bytes") === 6)
    // checksum = mod-P polynomial fold over the bytes
    val expected = "abcdef".getBytes("UTF-8")
      .foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % graft.ops.TextOps.P)
    assert(r1.getAs[Long]("checksum") === expected)
    assert(r1.getAs[Seq[Float]]("features").length === 8)
    // null payload -> empty features, zero checksum
    assert(out(2).getAs[Int]("n_bytes") === 0)
    assert(out(2).getAs[Long]("checksum") === 0L)
  }

  test("decodeFeatures runs a REAL pixel decode for JRE-shipped image " +
      "codecs: a 2x2 PNG round-trips to exact channel/quadrant stats; " +
      "non-image payloads keep the byte-fold fallback") {
    // a real PNG, written by the JRE encoder: red green / blue white
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    assert(Multimodal.headerDims(png) === ("png", 2, 2))
    val rows = Seq(Row(1L, "image", png, null.asInstanceOf[Row]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Multimodal.schema)
    val fRow = Multimodal.decodeFeatures(df).head()
    val feats = fRow.getSeq[Float](fRow.fieldIndex("features"))
    // integer BT.601 lumas: red 76, green 149, blue 29, white 255
    val expected = Seq(0.5f, 0.5f, 0.5f, 509f / 1020f,
      76f / 255f, 149f / 255f, 29f / 255f, 1.0f)
    feats.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6f, s"$feats vs $expected")
    }
    // a truncated PNG body (valid header, broken stream) degrades to
    // byte features — never throws
    val broken = png.take(30)
    val bRows = Seq(Row(2L, "image", broken, null.asInstanceOf[Row]))
    val bdf = spark.createDataFrame(
      spark.sparkContext.parallelize(bRows), Multimodal.schema)
    val bRow = Multimodal.decodeFeatures(bdf).head()
    val bFeats = bRow.getSeq[Float](bRow.fieldIndex("features"))
    assert(bFeats.length === 8)
  }

  test("sampleFrames emits one row per everyMs of duration") {
    val frames = Multimodal.sampleFrames(mkDf, everyMs = 1000)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames(2L) === 3) // 3000 ms / 1000
    assert(frames(1L) === 1) // no duration -> 1 frame minimum
    // frame bytes of id=2 partition the payload
    val total = Multimodal.sampleFrames(mkDf, 1000)
      .filter(col("id") === 2)
      .select(sum(length(col("frame_bytes")))).head().getLong(0)
    assert(total === 100)
  }

  test("resizeMeta rewrites width/height only") {
    val out = Multimodal.resizeMeta(mkDf, 64, 64)
      .select("meta.width", "meta.height", "meta.codec")
      .orderBy("id").collect()
    assert(out.forall(r => r.getInt(0) === 64 && r.getInt(1) === 64))
    assert(out(0).getString(2) === "png")
  }
}

class SkewJoinSpec extends SparkSpec {
  import graft.engine.Tables
  import graft.ops.SkewJoin

  test("salted join is row-identical to the plain join") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val dims = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    val plain = ev.join(dims, "user_id")
    val salted = SkewJoin.saltedJoin(ev, dims, "user_id", s = 8,
      probeId = col("event_id"))
    assert(salted.count() === plain.count())
    assert(salted.select("event_id", "n_events")
      .exceptAll(plain.select("event_id", "n_events")).count() === 0)
  }
}

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.TemporalJoins

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOf picks the latest right row at-or-before, null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 09:00:00"))) // no prior right row
      .toDF("lid", "k", "lts")
    val right = Seq(
      ("u1", 100L, ts("2024-01-01 09:30:00")),
      ("u1", 101L, ts("2024-01-01 10:00:00")), // ties lid=1 (inclusive)
      ("u1", 102L, ts("2024-01-01 11:00:00")),
      ("u2", 200L, ts("2024-01-01 23:00:00"))) // after left — no match
      .toDF("k", "rid", "rts")
    val out = TemporalJoins.asOf(left, right, Seq("k"), "lts", "rts")
      .orderBy("lid").collect()
    // equal timestamps match (backward-INCLUSIVE: rid 101, not 100)
    assert(out(0).getAs[Long]("rid") === 101L)
    assert(out(1).getAs[Long]("rid") === 102L)
    assert(out(2).isNullAt(out(2).fieldIndex("rid")))
  }

  test("asOf forward picks the EARLIEST right row at-or-after") {
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    val l = ev.filter($"event_type" === "click")
      .select($"event_id".as("lid"), $"user_id", $"ts".as("lts"))
    val r = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("rid"), $"ts".as("rts"))
    val fast = TemporalJoins.asOf(l, r, Seq("user_id"), "lts", "rts",
      direction = "forward").select($"lid", $"rid")
    val rr = r.toDF("u2", "rid", "rts")
    val brute = l.join(rr, $"user_id" === $"u2" && $"rts" >= $"lts",
        "left_outer")
      .groupBy($"lid")
      .agg(min(struct($"rts", $"rid")).getField("rid").as("rid"))
    assert(fast.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(fast).count() === 0)
  }

  test("asOf equals the brute-force latest-at-or-before join on events") {
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    val l = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("lid"), $"user_id", $"ts".as("lts"))
    val r = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("rid"), $"ts".as("rts"))
    val fast = TemporalJoins.asOf(l, r, Seq("user_id"), "lts", "rts")
      .select($"lid", $"rid")
    // brute force: max-rts row per left row among rts <= lts
    val rr = r.toDF("u2", "rid", "rts")
    val brute = l.join(rr, $"user_id" === $"u2" && $"rts" <= $"lts",
        "left_outer")
      .groupBy($"lid")
      .agg(max(struct($"rts", $"rid")).getField("rid").as("rid"))
    assert(fast.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(fast).count() === 0)
  }

  test("rangeCount equals the brute-force inequality join") {
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    val l = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "click").select($"user_id", $"ts")
    val banded = TemporalJoins.rangeCount(l, r, Seq("user_id"), "ts", "ts",
      -300, 0, "n").select($"event_id", $"n")
    val rr = r.withColumnRenamed("ts", "cts")
    val brute = l.join(rr,
        l("user_id") === rr("user_id") &&
          unix_micros($"cts") >= unix_micros(l("ts")) - 300000000L &&
          unix_micros($"cts") < unix_micros(l("ts")), "left_outer")
      .groupBy(l("event_id"))
      .agg(sum(when($"cts".isNotNull, 1L).otherwise(0L)).as("n"))
    assert(banded.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(banded).count() === 0)
  }

  test("asOf matches an in-memory reference model on random corpora") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      def rts() = ts("2024-01-01 00:00:00").getTime + rnd.nextInt(500000)
      // unique (key, ts) on the right — the as-of contract
      val rightRows = rnd.shuffle(
        (0 until 120).map(i => (s"k${rnd.nextInt(6)}", rts(), i.toLong)))
        .distinctBy(r => (r._1, r._2))
      val leftRows = (0 until 80).map(i =>
        (s"k${rnd.nextInt(8)}", rts(), (1000 + i).toLong))
      val left = leftRows.toDF("k", "lms", "lid")
        .select($"k", timestamp_millis($"lms").as("lts"), $"lid")
      val right = rightRows.toDF("k", "rms", "rid")
        .select($"k", timestamp_millis($"rms").as("rts"), $"rid")
      val got = TemporalJoins.asOf(left, right, Seq("k"), "lts", "rts")
        .select($"lid", $"rid").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap
      // reference model: scan-and-pick per left row
      val byKey = rightRows.groupBy(_._1)
      val want = leftRows.map { case (k, lms, lid) =>
        val cand = byKey.getOrElse(k, Seq.empty).filter(_._2 <= lms)
        lid -> (if (cand.isEmpty) -1L
                else cand.maxBy(r => (r._2, r._3))._3)
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("rangeCount matches an in-memory reference model on random corpora") {
    for (seed <- Seq(3, 11)) {
      val rnd = new scala.util.Random(seed)
      def rms() = ts("2024-01-01 00:00:00").getTime + rnd.nextInt(120000)
      val leftRows = (0 until 60).map(i =>
        (s"k${rnd.nextInt(5)}", rms(), i.toLong))
      val rightRows = (0 until 150).map(_ => (s"k${rnd.nextInt(6)}", rms()))
      val left = leftRows.toDF("k", "lms", "lid")
        .select($"k", timestamp_millis($"lms").as("lts"), $"lid")
      val right = rightRows.toDF("k", "rms")
        .select($"k", timestamp_millis($"rms").as("rts"))
      // window [-30s, +10s) — asymmetric, spans bin boundaries
      val got = TemporalJoins.rangeCount(left, right, Seq("k"),
          "lts", "rts", -30, 10, "n").select($"lid", $"n").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byKey = rightRows.groupBy(_._1)
      val want = leftRows.map { case (k, lms, lid) =>
        lid -> byKey.getOrElse(k, Seq.empty).count { case (_, rm) =>
          rm >= lms - 30000 && rm < lms + 10000
        }.toLong
      }.toMap
      assert(got === want, s"seed $seed")
    }
  }

  test("rangeCount plans an equi-join, never a nested loop") {
    val ev = graft.engine.Tables.load(spark, sfDir, "events")
    val l = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", $"ts")
    val r = ev.filter($"event_type" === "click").select($"user_id", $"ts")
    val plan = TemporalJoins.rangeCount(l, r, Seq("user_id"), "ts", "ts",
      -300, 0).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
  }
}

class BinaryQuantSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Similarity

  test("binaryQuantTopK results come from the true hamming-top-preK set " +
      "and re-rank by exact cosine") {
    val embs = graft.engine.Tables.load(spark, sfDir, "embeddings")
    val probes = embs.filter($"vec_id" < 10)
    val out = Similarity.binaryQuantTopK(embs, probes,
      "embedding", "vec_id", k = 3, preK = 20)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // per probe: EXACTLY k ranked rows, cosine non-increasing by rank
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, rs) =>
      assert(rs.length === 3)
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq === (1 to 3))
      val cs = sorted.map(_.getAs[Double]("cos_sim")).toSeq
      assert(cs === cs.sorted.reverse)
    }
    // INDEPENDENT reference: recompute sign bits + hamming in plain
    // Scala from the collected vectors, take the true hamming-top-preK
    // set per probe (with the same id tie-break), and require every
    // returned candidate AND its hamming to agree with it
    val vecs = embs.select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sig(v: Array[Float]): (Long, Long) = {
      var s1 = 0L; var s2 = 0L
      for (j <- 0 until 32) {
        if (v(j) > 0) s1 |= (1L << j)
        if (v(j + 32) > 0) s2 |= (1L << j)
      }
      (s1, s2)
    }
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val sigs = vecs.map { case (id, v) => id -> sig(v) }
    for (qId <- 0L until 10L) {
      val (qs1, qs2) = sigs(qId)
      val ranked = sigs.toSeq.filter(_._1 != qId)
        .map { case (id, (s1, s2)) =>
          (id, ham(qs1, s1) + ham(qs2, s2)) }
        .sortBy { case (id, h) => (h, id) }
      val top20 = ranked.take(20).toMap
      rows.filter(_.getAs[Long]("q_id") == qId).foreach { r =>
        val id = r.getAs[Long]("id")
        assert(top20.contains(id), s"probe $qId candidate $id not in top20")
        assert(top20(id) === r.getAs[Int]("hamming"))
      }
    }
  }
}

class ApproxDistinctSpec extends SparkSpec {
  import graft.dialect.EdgeSql
  import graft.engine.Tables
  private def load(n: String) = Tables.load(spark, sfDir, n)

  test("approx=true compiles count(distinct) to an HLL sketch within 5%") {
    val approx = EdgeSql.query(spark, load,
      """sql edge approx=true "select count(distinct user_id) as n from events"""")
      .head().getLong(0)
    val exact = EdgeSql.query(spark, load,
      """sql edge "select count(distinct user_id) as n from events"""")
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }
}

class SessionWindowSpec extends SparkSpec {
  import spark.implicits._
  import graft.streaming.StreamOps

  test("sessionize groups gap-separated activity per key") {
    val df = Seq(
      ("2024-01-01 00:00:00", "u1"), ("2024-01-01 00:00:30", "u1"),
      ("2024-01-01 01:00:00", "u1"), // new session after the gap
      ("2024-01-01 00:00:10", "u2"))
      .toDF("ts0", "k").select(to_timestamp($"ts0").as("ts"), $"k")
    val out = StreamOps.sessionize(df, "ts", "k", gapSeconds = 60)
    assert(out.count() === 3) // u1 x2 sessions + u2 x1
    assert(out.filter($"k" === "u1").count() === 2)
  }
}

class DedupApiSpec extends SparkSpec {
  import graft.engine.Tables
  import graft.ops.{Dedup, Similarity}

  private lazy val docs = Tables.load(spark, sfDir, "documents")
  private lazy val embs = Tables.load(spark, sfDir, "embeddings")

  test("exact dedup groups by content key") {
    val out = Dedup.exact(docs, md5(col("text")), "doc_id")
    assert(out.count() === docs.select("text").distinct().count())
  }

  test("minhashCandidates matches the oracle-checked q29 pair set") {
    val api = Dedup.minhashCandidates(docs, "text", "doc_id")
      .select("id_a", "id_b")
    val q29 = graft.ops.PipelineQueries
      .queries("q29_dedup_minhash_lsh")(spark, sfDir)
      .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
    assert(api.exceptAll(q29).count() === 0)
    assert(q29.exceptAll(api).count() === 0)
  }

  test("simhashClusters equals q30") {
    val api = Dedup.simhashClusters(docs, "text", "doc_id")
    val q30 = graft.ops.PipelineQueries
      .queries("q30_dedup_simhash")(spark, sfDir)
    assert(api.count() === q30.count())
  }

  test("jaccardPairs respects the threshold") {
    val out = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.5)
    assert(out.filter(col("jaccard") < 0.5).count() === 0)
  }

  test("prefix filtering stays COMPLETE under adversarial hot shingles") {
    // every doc gets the same boilerplate prefix -> its shingles have
    // df = N (the hot-token worst case that makes a raw inverted-index
    // join quadratic). The prefix-filtered result must still equal the
    // raw-formulation reference exactly.
    val corpus = docs.limit(120).select(col("doc_id"),
      concat(lit("terms of service apply to all content herein " +
        "all rights reserved by the original author "), col("text"))
        .as("text"))
    val fast = Dedup.jaccardPairs(corpus, "text", "doc_id", threshold = 0.5)
    // raw reference: full inverted-index join (the oracle formulation)
    val sh = corpus.select(col("doc_id").as("id"),
      explode(graft.functions.F.shingleHashes(col("text"), 3)).as("h"))
    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val raw = sh.join(sh.toDF("id2", "h2"),
        col("h") === col("h2") && col("id") < col("id2"))
      .groupBy(col("id").as("id_a"), col("id2").as("id_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.toDF("id_a", "na"), "id_a")
      .join(sz.toDF("id_b", "nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    assert(fast.exceptAll(raw).count() === 0)
    assert(raw.exceptAll(fast).count() === 0)
    assert(raw.count() > 0) // boilerplate pushes pairs over threshold
  }

  test("duplicateSpans counts verbatim cross-doc spans exactly") {
    import spark.implicits._
    val nine = (1 to 9).map(i => s"t$i").mkString(" ")  // 2 rolling 8-spans
    val in = Seq(
      (0L, nine),                                  // shares both with doc 1
      (1L, nine),                                  // verbatim twin
      (2L, (1 to 8).map(i => s"u$i").mkString(" ")), // 1 span, unique
      (3L, "too short")                            // < 8 tokens: no spans
    ).toDF("doc_id", "text")
    for (variant <- Seq(Dedup.SpanExact, Dedup.SpanHashFirst)) {
      val out = Dedup.duplicateSpans(in, "text", "doc_id",
          variant = variant)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(out.toSeq === Seq((0L, 2L, 2L, 2L), (1L, 2L, 2L, 2L),
        (2L, 1L, 0L, 1L)), s"variant=$variant")
    }
  }

  test("hash-first duplicateSpans equals the exact-string path on the " +
      "corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val a = Dedup.duplicateSpans(docs, "text", "doc_id",
      variant = Dedup.SpanExact)
    val b = Dedup.duplicateSpans(docs, "text", "doc_id",
      variant = Dedup.SpanHashFirst)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("hash-first equals exact on a duplicate-seeded corpus (hot span " +
      "in many docs + near-miss one-token variants)") {
    import spark.implicits._
    val hot = (1 to 12).map(i => s"w$i").mkString(" ") // shared verbatim
    val rows = (0 until 40).map { i =>
      // every doc carries the hot span plus a near-miss variant that
      // differs in exactly one token (same length, never a duplicate)
      // and a unique tail — dup and non-dup spans interleave per doc
      val miss = (1 to 12).map(j =>
        if (j == 7) s"m${i}x" else s"w$j").mkString(" ")
      (i.toLong, s"$hot $miss unique$i tail$i")
    } :+ (99L, "short doc")
    val docs = rows.toDF("doc_id", "text")
    val a = Dedup.duplicateSpans(docs, "text", "doc_id",
      variant = Dedup.SpanExact)
    val b = Dedup.duplicateSpans(docs, "text", "doc_id",
      variant = Dedup.SpanHashFirst)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    // sanity: the seed actually produces both dup and non-dup spans
    val any = a.orderBy("id").collect()
    assert(any.exists(r => r.getLong(2) > 0) &&
      any.exists(r => r.getLong(1) > r.getLong(2)))
  }

  test("SpanAuto selection: exact below the shuffle threshold, " +
      "hash-first above, and the estimate is avgLen*rows*spanTokens") {
    assert(Dedup.spanShuffleEstimate(300.0, 1000L, 8) === 300.0 * 1000 * 8)
    // sf0.1-ish volume (~140 MB estimated span shuffle) -> exact
    assert(Dedup.selectSpanVariant(300.0, 60000L, 8) === Dedup.SpanExact)
    // 100 TB-ish volume -> hash-first
    assert(Dedup.selectSpanVariant(300.0, 1L << 32, 8)
      === Dedup.SpanHashFirst)
    // exact boundary: >= threshold flips
    assert(Dedup.selectSpanVariant(Dedup.SpanHashFirstThresholdBytes,
      1L, 1) === Dedup.SpanHashFirst)
    assert(Dedup.selectSpanVariant(Dedup.SpanHashFirstThresholdBytes - 1,
      1L, 1) === Dedup.SpanExact)
  }

  test("spanCoverage merges overlapping spans, splits on gaps, and " +
      "counts same-doc repeats as duplicates") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"a$i").mkString(" ")
    val run = (1 to 10).map(i => s"y$i").mkString(" ")
    val x8 = (1 to 8).map(i => s"x$i").mkString(" ")
    val in = Seq(
      (0L, ten),                                   // verbatim twin of 1
      (1L, ten),
      (2L, (1 to 8).map(i => s"u$i").mkString(" ")), // 1 span, unique
      (3L, "too short"),                           // < 8 tokens: no spans
      (4L, s"$x8 z $x8"),     // same-DOC repeat: two intervals, gap at "z"
      (5L, s"$run p5a p5b"),  // 10-token run shared with 6: 3 spans MERGE
      (6L, s"$run q6a q6b")
    ).toDF("doc_id", "text")
    val out = Dedup.spanCoverage(in, "text", "doc_id").orderBy("id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (0L, 10L, 10L, 1L), (1L, 10L, 10L, 1L),
      (2L, 8L, 0L, 0L), (3L, 2L, 0L, 0L),
      (4L, 17L, 16L, 2L),
      (5L, 12L, 10L, 1L), (6L, 12L, 10L, 1L)))
  }

  test("exactSubstrDedup drops exactly the covered tokens and rebuilds " +
      "the survivors in order") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"a$i").mkString(" ")
    val run = (1 to 10).map(i => s"y$i").mkString(" ")
    val x8 = (1 to 8).map(i => s"x$i").mkString(" ")
    val in = Seq(
      (0L, ten), (1L, ten),
      (2L, (1 to 8).map(i => s"u$i").mkString(" ")),
      (3L, "too short"),
      (4L, s"$x8 z $x8"),
      (5L, s"$run p5a p5b"), (6L, s"$run q6a q6b")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrDedup(in, "text", "doc_id").orderBy("id")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, 10L, 0L, ""), (1L, 10L, 0L, ""),
      (2L, 8L, 8L, (1 to 8).map(i => s"u$i").mkString(" ")),
      (3L, 2L, 2L, "too short"),
      (4L, 17L, 1L, "z"),
      (5L, 12L, 2L, "p5a p5b"), (6L, 12L, 2L, "q6a q6b")))
  }

  test("spanCoverage and exactSubstrDedup: the hash-first 100 TB form " +
      "equals the exact-string form on the corpus and on a " +
      "duplicate-seeded adversary") {
    import spark.implicits._
    val hot = (1 to 12).map(i => s"w$i").mkString(" ")
    val seeded = ((0 until 30).map { i =>
      val miss = (1 to 12).map(j =>
        if (j == 7) s"m${i}x" else s"w$j").mkString(" ")
      (i.toLong, s"$hot $miss unique$i tail$i")
    } :+ (99L, "short doc")).toDF("doc_id", "text")
    for (docs <- Seq(Tables.load(spark, sfDir, "documents"), seeded)) {
      val ce = Dedup.spanCoverage(docs, "text", "doc_id",
        variant = Dedup.SpanExact)
      val ch = Dedup.spanCoverage(docs, "text", "doc_id",
        variant = Dedup.SpanHashFirst)
      assert(ce.exceptAll(ch).count() === 0 &&
        ch.exceptAll(ce).count() === 0, "coverage variants diverge")
      val se = Dedup.exactSubstrDedup(docs, "text", "doc_id",
        variant = Dedup.SpanExact)
      val sh = Dedup.exactSubstrDedup(docs, "text", "doc_id",
        variant = Dedup.SpanHashFirst)
      assert(se.exceptAll(sh).count() === 0 &&
        sh.exceptAll(se).count() === 0, "removal variants diverge")
    }
  }

  test("coverage and removal agree on the corpus: covered + kept = total " +
      "per doc") {
    val docs = Tables.load(spark, sfDir, "documents")
    val cov = Dedup.spanCoverage(docs, "text", "doc_id")
      .select(col("id"), col("n_tokens"), col("covered_tokens"))
    val cut = Dedup.exactSubstrDedup(docs, "text", "doc_id")
      .select(col("id"), col("kept_tokens"))
    val bad = cov.join(cut, "id")
      .filter(col("covered_tokens") + col("kept_tokens") =!= col("n_tokens"))
    assert(bad.count() === 0)
  }

  test("token_spans rejects a non-positive span width at plan time") {
    intercept[IllegalArgumentException] {
      graft.functions.F.tokenSpans(org.apache.spark.sql.functions
        .lit("a b c"), 0)
    }
  }

  test("embeddingNearDups verified by exact cosine") {
    val out = Dedup.embeddingNearDups(embs, "embedding", "vec_id")
    assert(out.filter(col("cos_sim") < 0.35).count() === 0)
  }

  test("LSH bits / semdedup cells derive from corpus size") {
    // ~1024 rows per bucket, floor 4 bits, cap 20 bits
    assert(Dedup.deriveBits(0L) === 4)
    assert(Dedup.deriveBits(500L) === 4)
    assert(Dedup.deriveBits(16L * 1024L) === 4)
    assert(Dedup.deriveBits(17L * 1024L) === 5)
    assert(Dedup.deriveBits(1L << 20) === 10)       // 1M rows -> 1024 buckets
    assert(Dedup.deriveBits(100L * 1000L * 1000L * 1000L) === 20) // capped
    assert(Dedup.deriveCells(0L) === 16)
    assert(Dedup.deriveCells(1L << 20) === 1024)
    assert(Dedup.deriveCells(1L << 40) === 16384)   // broadcast cap
    // the derived geometry is recorded and bounds realized cardinality
    val idx = Dedup.embeddingIndex(embs, "embedding", "vec_id")
    val bits = idx.select(col("bits")).head().getInt(0)
    val tables = idx.select(col("tables")).head().getInt(0)
    assert(bits === Dedup.deriveBits(embs.count()))
    assert(tables === Dedup.deriveTables(bits))
    assert(idx.filter(size(col("sigs")) =!= tables).count() === 0)
    assert(idx.select(posexplode(col("sigs"))).distinct().count()
      <= (tables.toLong << bits))
  }

  test("deriveTables calibrates OR-amplification to the recall target") {
    // wider signatures need more tables (p^bits shrinks)
    val l4 = Dedup.deriveTables(4)
    val l12 = Dedup.deriveTables(12)
    val l20 = Dedup.deriveTables(20)
    assert(l4 < l12 && l12 < l20 && l20 <= 64)
    // the derived L actually clears the target: 1-(1-p^b)^L >= R
    for ((b, l) <- Seq((4, l4), (12, l12), (20, l20))) {
      val p = 1.0 - math.acos(0.9) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(p, b), l)
      assert(recall >= 0.9, s"bits=$b L=$l -> $recall")
    }
    // a single table only clears the target while bits is tiny
    assert(Dedup.deriveTables(20, targetRecall = 0.9, atCosine = 0.9999)
      === 1)
  }

  test("bruteForceTopK returns k ranked neighbors per probe") {
    val probes = embs.filter(col("vec_id") < 3)
    val out = Similarity.bruteForceTopK(embs, probes, "embedding", "vec_id", 5)
    assert(out.groupBy("q_id").count().filter(col("count") =!= 5).count() === 0)
    // rank 1 has the max similarity per probe
    val r1 = out.filter(col("rank") === 1).select("q_id", "cos_sim")
    val mx = out.groupBy("q_id").agg(max("cos_sim").as("cos_sim"))
    assert(r1.exceptAll(mx).count() === 0)
  }

  test("lshTopK searches only the probe bucket") {
    val probes = embs.filter(col("vec_id") < 5)
    val out = Similarity.lshTopK(embs, probes, "embedding", "vec_id", 3)
    assert(out.filter(col("rank") > 3).count() === 0)
  }

  test("semdedup drops exactly the vectors with a lower-id similar cell-mate") {
    import graft.functions.F
    val out = Dedup.semdedup(embs, "embedding", "vec_id",
      numCells = 8, threshold = 0.3)
    assert(out.count() === embs.count()) // every row labeled exactly once
    // brute-force reference: within the SAME cell assignment, a vector
    // is dropped iff some lower-id cell-mate has cosine >= threshold
    val v = embs.select(col("vec_id").as("id"), col("embedding").as("v"))
      .join(out.select(col("id"), col("cell_id")), "id")
    val refDropped = v.toDF("a", "va", "ca")
      .join(v.toDF("b", "vb", "cb"), col("ca") === col("cb") && col("a") < col("b"))
      .filter(F.dotF(col("va"), col("vb")) /
        (sqrt(F.dotF(col("va"), col("va"))) * sqrt(F.dotF(col("vb"), col("vb"))))
        >= 0.3)
      .select(col("b").as("id")).distinct()
    val gotDropped = out.filter(col("keep") === 0).select("id")
    assert(gotDropped.exceptAll(refDropped).count() === 0)
    assert(refDropped.exceptAll(gotDropped).count() === 0)
    assert(refDropped.count() > 0) // non-vacuous at this threshold
  }

  test("containmentPairs catches an excerpt Jaccard misses, and stays " +
      "complete against the raw formulation") {
    import graft.functions.F
    // doc 9001 = the first 10 tokens of the LONGEST doc, embedded in
    // nothing else: containment(9001 -> host) ~ 1.0 while
    // Jaccard(9001, host) stays far below 0.5
    val base = docs.limit(60)
    val hostId = base.orderBy(col("n_chars").desc).select("doc_id")
      .head().getLong(0)
    val excerpt = base.filter(col("doc_id") === hostId)
      .select(lit(9001L).as("doc_id"),
        expr("array_join(slice(filter(split(text, ' '), t -> t != ''), 1, 10), ' ')")
          .as("text"))
    val corpus = base.select(col("doc_id"), col("text")).union(excerpt)
    val cont = Dedup.containmentPairs(corpus, "text", "doc_id",
      threshold = 0.8)
    assert(cont.filter(col("id_a") === 9001 && col("id_b") === hostId)
      .count() === 1)
    val jac = Dedup.jaccardPairs(corpus, "text", "doc_id", threshold = 0.5)
    assert(jac.filter((col("id_a") === hostId && col("id_b") === 9001) ||
      (col("id_a") === 9001 && col("id_b") === hostId)).count() === 0)
    // completeness: equals the raw inverted-index formulation exactly
    val sh = corpus.select(col("doc_id").as("id"),
      explode(F.shingleHashes(col("text"), 3)).as("h"))
    val sz = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val raw = sh.join(sh.toDF("id2", "h2"),
        col("h") === col("h2") && col("id") =!= col("id2"))
      .groupBy(col("id").as("doc_a"), col("id2").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.toDF("doc_a", "na"), "doc_a")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") / col("na")).as("containment"))
      .filter(col("containment") >= 0.8)
    val fast = cont.toDF("doc_a", "doc_b", "containment")
    assert(fast.exceptAll(raw).count() === 0)
    assert(raw.exceptAll(fast).count() === 0)
  }

  test("incrementalEmbeddingDedup: new batch vs standing index equals " +
      "the full-corpus pair set restricted to cross-batch pairs") {
    val corpus = embs.filter(col("vec_id") % 5 =!= 0)
    val batch = embs.filter(col("vec_id") % 5 === 0)
    val idx = Dedup.embeddingIndex(corpus, "embedding", "vec_id")
    val inc = Dedup.incrementalEmbeddingDedup(batch, idx,
      "embedding", "vec_id")
    // reference: full-corpus near-dup pairs, keeping only pairs that
    // cross the batch/corpus split (either orientation)
    val full = Dedup.embeddingNearDups(embs, "embedding", "vec_id")
    val ref = full
      .filter((col("id_a") % 5 === 0) =!= (col("id_b") % 5 === 0))
      .select(
        when(col("id_a") % 5 === 0, col("id_a")).otherwise(col("id_b"))
          .as("new_id"),
        when(col("id_a") % 5 === 0, col("id_b")).otherwise(col("id_a"))
          .as("corpus_id"))
    val got = inc.select("new_id", "corpus_id")
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("semdedup accepts k-means-refined centroids") {
    val cents = Similarity.kmeansCentroids(embs, "embedding", "vec_id",
      k = 8, iters = 2)
    val out = Dedup.semdedup(embs, "embedding", "vec_id", cents, 0.3)
    assert(out.count() === embs.count())
    assert(out.select("cell_id").distinct().count() <= 8)
  }

  test("crossSourceMatrix equals the oracle-checked q87 rollup") {
    val api = Dedup.crossSourceMatrix(docs, "text", "doc_id", "source")
      .withColumnRenamed("label_x", "source_x")
      .withColumnRenamed("label_y", "source_y")
    val q87 = graft.ops.PipelineQueries
      .queries("q87_cross_source_dups")(spark, sfDir)
    assert(api.exceptAll(q87).count() === 0)
    assert(q87.exceptAll(api).count() === 0)
  }

  test("hardNegatives stay in-bucket, below the ceiling, ranked") {
    import graft.functions.F
    val probes = embs.filter(col("vec_id") < 5)
    // bits pinned -> single table, so the one-bucket assertion below holds
    val out = Similarity.hardNegatives(embs, probes, "embedding", "vec_id",
      k = 3, maxSim = 0.3, bits = 4)
    assert(out.filter(col("cos_sim") >= 0.3).count() === 0)
    assert(out.filter(col("rank") > 3).count() === 0)
    assert(out.filter(col("q_id") === col("id")).count() === 0)
    // every negative shares its probe's LSH bucket
    val b = embs.select(col("vec_id"), F.vecLsh(col("embedding"), 4).as("bk"))
    val mismatched = out
      .join(b.toDF("q_id", "q_bk"), "q_id")
      .join(b.toDF("id", "n_bk"), "id")
      .filter(col("q_bk") =!= col("n_bk"))
    assert(mismatched.count() === 0)
  }
}

class PackingSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Packing

  private def docs(ns: Seq[Int]) =
    ns.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("doc_id", "n_tok")

  test("every doc packs exactly once; offsets stay inside the sequence") {
    val in = docs(Seq(100, 200, 300, 50, 512, 600, 10, 10, 10))
    val out = Packing.sequencePack(in, col("n_tok"), "doc_id",
      seqLen = 512, shards = 2)
    assert(out.count() === 9)
    assert(out.filter(col("start_offset") < 0 ||
      col("start_offset") >= 512).count() === 0)
    assert(out.filter(col("seq_id") < 0).count() === 0)
  }

  test("single shard packs greedily: seq boundary at the running sum") {
    val in = docs(Seq(300, 300, 300)) // cum 300, 600, 900
    val out = Packing.sequencePack(in, col("n_tok"), "doc_id",
      seqLen = 512, shards = 1, shardExpr = Some(lit(0L)))
      .select("doc_id", "seq_id", "start_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // doc0 starts at 0 (seq 0), doc1 at 300 (seq 0), doc2 at 600 (seq 1)
    assert(out.toSeq === Seq((0L, 0L, 0L), (1L, 0L, 300L), (2L, 1L, 88L)))
  }

  test("a doc longer than seqLen legitimately skips start sequences") {
    val in = docs(Seq(2000, 10)) // doc1 starts at 2000 -> seq 3
    val out = Packing.sequencePack(in, col("n_tok"), "doc_id",
      seqLen = 512, shards = 1, shardExpr = Some(lit(0L)))
      .select("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq === Seq((0L, 0L), (1L, 3L)))
  }

  test("packingStats accounts every doc") {
    val in = docs(Seq.fill(40)(100))
    val packed = Packing.sequencePack(in, col("n_tok"), "doc_id",
      seqLen = 512, shards = 4)
    val stats = Packing.packingStats(packed)
    assert(stats.agg(sum("n_docs")).head().getLong(0) === 40L)
  }

  test("seq_id is exact past the double-mantissa range (pure integer div)") {
    // cum > 2^53: a double intermediate would round; integer div must not
    val big = (1L << 53) + 4097L
    val in = Seq((0L, big), (1L, 100L)).toDF("doc_id", "n_tok")
    val out = Packing.sequencePack(in, col("n_tok"), "doc_id",
      seqLen = 512, shards = 1, shardExpr = Some(lit(0L)))
      .select("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(out.toSeq === Seq((0L, 0L), (1L, big / 512L)))
  }

  test("a pre-existing shard/seq_id column is rejected, not shadowed") {
    val in = docs(Seq(10, 20)).withColumn("shard", lit(99))
    val ex = intercept[IllegalArgumentException](
      Packing.sequencePack(in, col("n_tok"), "doc_id", seqLen = 512))
    assert(ex.getMessage.contains("shard"))
  }
}

class DialectExprAggSpec extends SparkSpec {
  import graft.dialect.EdgeSql
  import graft.engine.Tables
  private def load(n: String) = Tables.load(spark, sfDir, n)

  test("aggregate over an expression (unnamed-function passthrough)") {
    val df = EdgeSql.query(spark, load,
      """sql edge "select event_type, sum(value * 2) as dbl """ +
        """from events group by event_type order by event_type"""")
    val direct = load("events").groupBy(col("event_type"))
      .agg(sum(expr("cast(value * 2 as decimal(18,2))")).cast("double").as("dbl"))
      .orderBy(col("event_type"))
    assert(df.collect().toSeq === direct.collect().toSeq)
  }
}

class CleanPipelineSpec extends SparkSpec {
  import graft.engine.Tables
  import graft.ops.CleanPipeline

  private val specJson = """
    {"pipeline": {"id": "doc_id", "text": "text", "stages": [
      {"op": "dedup_exact"},
      {"op": "neardup_jaccard", "threshold": 0.5, "shingle_n": 3},
      {"op": "quality_min_tokens", "min": 20},
      {"op": "split", "train": 80, "valid": 10}
    ]}}"""

  test("spec parses to typed stages") {
    val spec = CleanPipeline.fromJson(specJson)
    assert(spec.stages.length === 4)
    assert(spec.stages(1) === CleanPipeline.NeardupJaccard(0.5, 3))
  }

  test("compiled pipeline matches the hand-written q57 counts") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run(specJson, docs)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
    val q57 = graft.ops.PipelineQueries
      .queries("q57_clean_pipeline")(spark, sfDir)
    assert(out.exceptAll(q57).count() === 0)
    assert(q57.exceptAll(out).count() === 0)
  }

  test("chunk stage: quality-filter then chunk — carried columns ride " +
      "onto chunks, text becomes the chunk window, equals the q185 " +
      "operator on the survivors") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "quality_min_tokens", "min": 20},
        {"op": "chunk", "window": 64, "stride": 48}
      ]}}""", docs)
    // carried columns (lang, source) ride onto every chunk row
    assert(Seq("lang", "source", "c_idx", "start_tok", "n_tok")
      .forall(out.columns.contains), out.columns.mkString(","))
    val survivors = docs.filter(
      size(expr("filter(split(text, ' '), t -> t != '')")) >= 20)
    val expect = graft.ops.TextOps.chunkWindows(
      survivors, "doc_id", "text", 64, 48)
    val got = out.select(col("doc_id"), col("c_idx"), col("start_tok"),
      col("n_tok"), col("text").as("chunk_text"))
    assert(got.exceptAll(expect).count() === 0)
    assert(expect.exceptAll(got).count() === 0)
  }

  test("normalize stage: NFC unifies decomposed twins so dedup_exact " +
      "catches them; without it the twin survives") {
    import spark.implicits._
    val in = Seq(
      (1L, "café au lait"),       // composed
      (2L, "cafe\u0301 au lait"),  // decomposed twin, same text
      (3L, "something else entirely")
    ).toDF("doc_id", "text")
    // WITHOUT normalize: the twins are different byte strings
    val bare = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "dedup_exact"}
      ]}}""", in)
    assert(bare.count() === 3L,
      "non-NFC twins should defeat a bare content-hash dedup")
    // WITH normalize first: the decomposed twin dedups away
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "normalize", "form": "NFC"},
        {"op": "dedup_exact"}
      ]}}""", in)
    assert(out.select("doc_id").as[Long].collect().sorted
      === Array(1L, 3L))
  }

  test("exact_substr stage rewrites text in place, drops emptied docs " +
      "by default, and carried columns survive") {
    import spark.implicits._
    val ten = (1 to 10).map(i => s"a$i").mkString(" ")
    val uniq = "one two three four five six seven eight nine"
    val in = Seq(
      (0L, ten, "en"), (1L, ten, "en"),   // verbatim twins: fully covered
      (2L, uniq, "de")
    ).toDF("doc_id", "text", "lang")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "exact_substr", "span_tokens": 8}
      ]}}""", in)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
    assert(out.head().getAs[String]("lang") === "de")
    assert(out.head().getAs[String]("text") === uniq)
    val keep = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "exact_substr", "span_tokens": 8, "drop_empty": false}
      ]}}""", in)
    assert(keep.count() === 3L)
    assert(keep.filter(col("doc_id") === 0L).head()
      .getAs[String]("text") === "")
  }

  test("lang filter and redaction stages") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "lang_keep", "langs": ["en"]},
        {"op": "redact_numbers"}
      ]}}""", docs)
    assert(out.filter(col("lang") =!= "en").count() === 0)
    assert(out.filter(col("text").rlike("[0-9]")).count() === 0)
  }

  test("boilerplate_max stage equals the q81 signal applied as a filter") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "boilerplate_max", "max_pct": 50, "df_pct": 5}
      ]}}""", docs)
    // reference: q81 counts with the same cut applied by hand
    val q81 = graft.ops.PipelineQueries
      .queries("q81_boilerplate_shingles")(spark, sfDir)
      .filter(col("n_boiler") * 100 <= col("n_shingles") * 50)
    assert(out.count() === q81.count())
    assert(out.select("doc_id").exceptAll(q81.select("doc_id")).count() === 0)
  }

  test("neardup_keep_best stage keeps exactly q88's is_kept set " +
      "plus unpaired docs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "neardup_keep_best", "quality": "n_chars"}
      ]}}""", docs)
    val verdicts = graft.ops.Dedup.nearDupKeepList(
      docs, "text", "doc_id", "n_chars")
    val expected = docs.count() -
      verdicts.filter(col("is_kept") === 0).count()
    assert(out.count() === expected)
    // no dropped doc survives
    assert(out.join(verdicts.filter(col("is_kept") === 0)
      .select(col("id").as("doc_id")), Seq("doc_id")).count() === 0)
  }

  test("cross-modal pipeline: text and vector stages compose over a " +
      "joined frame") {
    val docs = Tables.load(spark, sfDir, "documents")
    val embs = Tables.load(spark, sfDir, "embeddings")
    val joined = docs.join(embs, docs("doc_id") === embs("vec_id"))
      .drop("vec_id")
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "dedup_exact"},
        {"op": "semdedup", "vec": "embedding", "cells": 8, "threshold": 0.3},
        {"op": "quality_min_tokens", "min": 5},
        {"op": "split", "train": 80, "valid": 10}
      ]}}""", joined)
    assert(out.count() > 0)
    assert(out.columns.contains("split"))
    // the semdedup stage actually dropped someone
    assert(out.count() < joined.count())
  }

  test("hamming_dedup stage drops radius-3 pairs on the production " +
      "geometry; incremental_hamming gates against a standing simhash " +
      "index") {
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents")
    // within-batch: equals the library pair set (higher id drops)
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "hamming_dedup", "radius": 3, "band_bits": 16}]}}""", docs)
    val drops = graft.ops.Dedup.hammingPairs(docs, "text", "doc_id",
        radius = 3, bandBits = 16)
      .select(col("id_b")).distinct().count()
    assert(out.count() === docs.count() - drops)
    // standing gate: index on < 400, batch >= 400; a synthetic twin of
    // a corpus doc must drop, the rest must match the library result
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
      .unionByName(corpus.filter(col("doc_id") === 7L)
        .withColumn("doc_id", col("doc_id") + 9000L))
    val idxDir = java.nio.file.Files.createTempDirectory("simidx")
      .resolve("idx").toString
    graft.ops.IndexStore.write(
      graft.ops.Dedup.simhashIndex(corpus, "text", "doc_id"), idxDir)
    val gated = CleanPipeline.run(
      s"""{"pipeline": {"stages": [
        {"op": "incremental_hamming", "index": "$idxDir"}]}}""", batch)
    // the verbatim twin (hamming 0) is gone
    assert(gated.filter(col("doc_id") === 9007L).count() === 0)
    val expectedDropped = graft.ops.Dedup.incrementalHamming(batch,
        graft.ops.IndexStore.read(spark, idxDir).get, "text", "doc_id")
      .select(col("new_id")).distinct().count()
    assert(gated.count() === batch.count() - expectedDropped)
  }

  test("incremental_neardup stage gates against a standing index path") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val idxDir = java.nio.file.Files.createTempDirectory("incstage")
      .resolve("idx").toString
    graft.ops.Dedup.shingleIndex(corpus, "text", "doc_id")
      .write.parquet(idxDir)
    val out = CleanPipeline.run(
      s"""{"pipeline": {"stages": [
        {"op": "incremental_neardup", "index": "$idxDir"}]}}""", batch)
    val expectedDropped = graft.ops.Dedup.incrementalJaccard(batch,
        spark.read.parquet(idxDir), "text", "doc_id")
      .select(col("new_id")).distinct().count()
    assert(out.count() === batch.count() - expectedDropped)
    assert(expectedDropped > 0) // the gate actually dropped someone
  }

  test("incremental_embdedup stage gates on a standing embedding index " +
      "(IndexStore-committed, recorded geometry)") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val corpus = embs.filter(col("vec_id") < 400)
    val batch = embs.filter(col("vec_id") >= 400)
    val idxDir = java.nio.file.Files.createTempDirectory("incemb")
      .resolve("idx").toString
    graft.ops.IndexStore.write(
      graft.ops.Dedup.embeddingIndex(corpus, "embedding", "vec_id",
        bits = 4, tables = 2), idxDir)
    val out = CleanPipeline.run(
      s"""{"pipeline": {"id": "vec_id", "stages": [
        {"op": "incremental_embdedup", "index": "$idxDir",
         "threshold": 0.35}]}}""", batch)
    val expectedDropped = graft.ops.Dedup.incrementalEmbeddingDedup(batch,
        graft.ops.IndexStore.read(spark, idxDir).get, "embedding",
        "vec_id", threshold = 0.35)
      .select(col("new_id")).distinct().count()
    assert(out.count() === batch.count() - expectedDropped)
    assert(expectedDropped > 0) // the gate actually dropped someone
  }

  test("incremental_exactdedup stage gates on the standing bloom+hash state") {
    import spark.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("incexact")
      .resolve("state").toString
    // seed the standing state through the ingest gate
    graft.streaming.StreamOps.exactDedupIngestBatch(
      Seq(1L -> "alpha beta", 2L -> "gamma delta").toDF("doc_id", "text"),
      stateDir, "text", "doc_id")
    val crawl = Seq(10L -> "alpha beta", 11L -> "epsilon zeta")
      .toDF("doc_id", "text")
    val out = CleanPipeline.run(
      s"""{"pipeline": {"stages": [
        {"op": "incremental_exactdedup", "state": "$stateDir"}]}}""", crawl)
    assert(out.select("doc_id").as[Long].collect().sorted === Array(11L))
  }

  test("semdedup stage keeps exactly Dedup.semdedup's keep=1 set") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "vec_id", "stages": [
        {"op": "semdedup", "vec": "embedding", "cells": 8, "threshold": 0.3}
      ]}}""", embs)
    val ref = graft.ops.Dedup
      .semdedup(embs, "embedding", "vec_id", 8, 0.3)
      .filter(col("keep") === 1)
    assert(out.count() === ref.count())
    assert(out.select(col("vec_id"))
      .exceptAll(ref.select(col("id"))).count() === 0)
  }

  test("cluster_balance stage caps every cell at quota with the " +
      "deterministic hash rank (== Curation.clusterBalance)") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "vec_id", "stages": [
        {"op": "cluster_balance", "vec": "embedding", "cells": 8,
         "quota": 10}
      ]}}""", embs)
    // reproduce the stage's decision from the library pieces
    val e = embs.select(col("vec_id").as("id"),
      col("embedding").as("v"),
      graft.functions.F.dotF(col("embedding"), col("embedding")).as("n2"))
    val cents = e.orderBy(col("id")).limit(8)
      .select(col("id").as("cent_id"), col("v").as("cv"),
        col("n2").as("cn2"))
    val assigned = graft.ops.Dedup
      .semdedup(embs, "embedding", "vec_id", cents, threshold = 2.0)
      .select(col("id"), col("cell_id").as("cell"))
    val ref = graft.ops.Curation.clusterBalance(assigned, quota = 10)
    assert(out.count() === ref.count())
    assert(out.count() === 80) // 8 cells x quota 10, all cells full
    assert(out.select(col("vec_id"))
      .exceptAll(ref.select(col("id"))).count() === 0)
    // stage keeps all original columns (left_semi, no projection)
    assert(out.columns.toSet === embs.columns.toSet)
  }

  test("weighted_sample stage == Curation.weightedSample with " +
      "flattening weights, original columns kept") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "weighted_sample", "source": "source", "k": 25}
      ]}}""", docs)
    val ref = graft.ops.Curation.weightedSample(docs, "text", "doc_id",
      "source", graft.ops.Curation.flatteningWeights(docs, "source"), 25)
    assert(out.count() === 25)
    assert(out.select(col("doc_id"))
      .exceptAll(ref.select(col("id"))).count() === 0)
    assert(out.columns.toSet === docs.columns.toSet)
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Dedup

  test("chains collapse to the min label (transitive closure)") {
    // components: {1,2,3,4} via chain, {10,11}, isolated pairs only
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) === 1L && labels(2L) === 1L &&
      labels(3L) === 1L && labels(4L) === 1L)
    assert(labels(10L) === 10L && labels(11L) === 10L)
  }

  test("a 60-node path converges within maxIter=10 (pointer jumping)") {
    // diameter 60 — plain neighbor-min propagation would need ~60
    // rounds; the label(label) hop makes it O(log d), and a
    // non-converged exit throws instead of returning partial labels
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 60)
    assert(labels.values.forall(_ === 1L))
  }

  test("real near-dup pairs consolidate to one representative per cluster") {
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.5)
    val labels = Dedup.connectedComponents(pairs)
    // every doc's label is <= its own id and labels are member ids
    assert(labels.filter(col("label") > col("id")).count() === 0)
  }

  test("refreshComponents: folding pair batches in ANY order equals the " +
      "one-shot components (union-find star compression is exact)") {
    // pseudo-random graph: rings + chords, sliced into 3 batches
    val n = 60L
    val all = (0L until n).flatMap { i =>
      Seq((i, (i + 1) % n), (i, (i * 7 + 3) % n))
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val oneShot = Dedup.connectedComponents(all.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (seed <- Seq(1, 5)) {
      val batches = all.groupBy(p => (p._1 * seed + p._2) % 3)
        .toSeq.sortBy(_._1).map(_._2)
      var labels = Dedup.connectedComponents(batches.head
        .toDF("id_a", "id_b"))
      batches.tail.foreach { b =>
        labels = Dedup.refreshComponents(labels, b.toDF("id_a", "id_b"))
      }
      val folded = labels.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(folded === oneShot, s"fold != rebuild for slicing $seed")
    }
  }

  test("iteration lineage is truncated — final plan is O(1), not O(rounds)") {
    // a 6-long chain needs several min-label rounds; with per-round
    // localCheckpoint the returned plan must start from the materialized
    // RDD of the LAST round only (no Join pyramid replaying history)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs)
    val plan = labels.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"),
      s"expected checkpoint-truncated plan, got:\n$plan")
    assert(labels.collect().map(_.getLong(1)).forall(_ === 1L))
  }
}

class BlobStoreSpec extends SparkSpec {
  import graft.ops.BlobStore
  import org.apache.spark.sql.functions._

  test("externalize/hydrate round-trips and dedups identical payloads") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("blobs").toString
    val rows = Seq(
      (1L, "img", "payload-one"),
      (2L, "img", "payload-two"),
      (3L, "img", "payload-one"), // duplicate content -> same blob file
      (4L, "img", null)
    ).toDF("id", "modality", "s")
      .withColumn("payload", expr("cast(s as binary)")).drop("s")
    val slim = BlobStore.externalize(rows, "payload", "edge", "photos", dir)
    val refs = slim.orderBy("id").collect().map(_.getAs[String]("payload"))
    assert(refs(0) === refs(2))
    assert(refs(0) != refs(1))
    assert(refs(3) == null)
    assert(refs(0).startsWith("edge.photos.") && refs(0).endsWith(".blob"))
    // distinct contents -> exactly two blob files on disk
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".blob")) === 2)
    val back = BlobStore.hydrate(slim, "payload", dir).orderBy("id")
      .collect().map(r => Option(r.getAs[Array[Byte]]("payload"))
        .map(new String(_, "UTF-8")).orNull)
    assert(back.toSeq === Seq("payload-one", "payload-two", "payload-one", null))
  }
}

class IvfApiSpec extends SparkSpec {
  import graft.engine.Tables
  import graft.ops.Similarity

  test("ivfTopK matches the oracle-checked q47 output") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val api = Similarity.ivfTopK(embs, col("id") < 20, "embedding",
      "vec_id", k = 3, numCentroids = 16)
      .select(col("q_id"), col("rank"), col("id").as("vec_id"), col("cos_sim"))
    val q47 = graft.ops.PipelineQueries
      .queries("q47_ann_ivf_topk")(spark, sfDir)
    assert(api.exceptAll(q47).count() === 0)
    assert(q47.exceptAll(api).count() === 0)
  }

  test("k-means refinement does not worsen the clustering objective") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val seed = embs
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv"),
        graft.functions.F.dotF(col("embedding"), col("embedding")).as("cn2"))
      .filter(col("cent_id") < 16)
    val refined = Similarity.kmeansCentroids(embs, "embedding", "vec_id",
      k = 16, iters = 3)
    assert(refined.count() === 16)
    val before = Similarity.inertia(embs, seed, "embedding", "vec_id")
    val after = Similarity.inertia(embs, refined, "embedding", "vec_id")
    assert(after <= before * (1.0 + 1e-9),
      s"inertia worsened: $before -> $after")
    // refined centroids drive the same search API
    val topk = Similarity.ivfTopK(embs, col("id") < 5, "embedding",
      "vec_id", k = 3, numCentroids = 16, kmeansIters = 2)
    assert(topk.count() > 0)
  }

  test("quantizedKmeans is reproducible and partitions the corpus") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val a = Similarity.quantizedKmeans(embs, "embedding", "vec_id",
      k = 16, iters = 2)
    val b = Similarity.quantizedKmeans(
      embs.repartition(7), "embedding", "vec_id", k = 16, iters = 2)
    // integer sums are exact under any partial-agg order: a different
    // physical partitioning MUST yield the identical assignment
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
    assert(a.count() === embs.count())
    assert(a.agg(countDistinct(col("cell_id"))).head().getLong(0) <= 16L)
    // cell_size is consistent with the assignment itself
    val sizes = a.groupBy("cell_id").count()
      .join(a.select("cell_id", "cell_size").distinct(), "cell_id")
    assert(sizes.filter(col("count") =!= col("cell_size")).count() === 0)
  }
}

class IncrementalDedupSpec extends SparkSpec {
  import graft.engine.Tables
  import graft.ops.Dedup

  test("new batch dedups against the standing corpus index") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val index = Dedup.shingleIndex(corpus, "text", "doc_id")
    val inc = Dedup.incrementalJaccard(batch, index, "text", "doc_id")
    // must equal the cross-partition subset of full-corpus pairs
    val full = Dedup.jaccardPairs(docs, "text", "doc_id")
      .filter(col("id_a") < 400 && col("id_b") >= 400)
      .select(col("id_b").as("new_id"), col("id_a").as("corpus_id"),
        col("jaccard"))
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
  }

  test("legacy bare (id, h) index form still verifies exactly") {
    val docs = Tables.load(spark, sfDir, "documents").limit(200)
    val corpus = docs.filter(col("doc_id") < 100)
    val batch = docs.filter(col("doc_id") >= 100)
    val bare = corpus.select(col("doc_id").as("id"),
      explode(graft.functions.F.shingleHashes(col("text"), 3)).as("h"))
    val viaBare = Dedup.incrementalJaccard(batch, bare, "text", "doc_id")
    val viaEnriched = Dedup.incrementalJaccard(batch,
      Dedup.shingleIndex(corpus, "text", "doc_id"), "text", "doc_id")
    assert(viaBare.exceptAll(viaEnriched).count() === 0)
    assert(viaEnriched.exceptAll(viaBare).count() === 0)
  }

  test("randomized corpora: incremental equals the batch cross-subset " +
      "at three thresholds (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // word pool small enough to force overlaps, docs of 1..8 tokens so
    // prefix lengths hit every boundary case (incl. single-shingle docs)
    def doc(i: Long) = (i, (0 until (1 + rnd.nextInt(8)))
      .map(_ => s"w${rnd.nextInt(12)}").mkString(" "))
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val all = (0L until 60L).map(doc).toDF("doc_id", "text")
      val corpus = all.filter(col("doc_id") < 40)
      val batch = all.filter(col("doc_id") >= 40)
      val inc = Dedup.incrementalJaccard(batch,
        Dedup.shingleIndex(corpus, "text", "doc_id"), "text", "doc_id",
        shingleN = 3, threshold = t)
      val full = Dedup.jaccardPairs(all, "text", "doc_id", 3, t)
        .filter(col("id_a") < 40 && col("id_b") >= 40)
        .select(col("id_b").as("new_id"), col("id_a").as("corpus_id"),
          col("jaccard"))
      assert(inc.exceptAll(full).count() === 0, s"extra pairs at t=$t")
      assert(full.exceptAll(inc).count() === 0, s"missing pairs at t=$t")
    }
  }

  test("refreshShingleIndex equals a from-scratch rebuild without " +
      "touching corpus text") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") < 400)
    val batch = docs.filter(col("doc_id") >= 400)
    val refreshed = Dedup.refreshShingleIndex(
      Dedup.shingleIndex(corpus, "text", "doc_id"), batch, "text", "doc_id")
    val rebuilt = Dedup.shingleIndex(docs, "text", "doc_id")
    assert(refreshed.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(refreshed).count() === 0)
  }

  test("refreshEmbeddingIndex appends with the index's recorded width") {
    val embs = Tables.load(spark, sfDir, "embeddings")
    val corpus = embs.filter(col("vec_id") < 400)
    val batch = embs.filter(col("vec_id") >= 400)
    val idx = Dedup.embeddingIndex(corpus, "embedding", "vec_id")
    val bits = idx.select(col("bits")).head().getInt(0)
    val tables = idx.select(col("tables")).head().getInt(0)
    val refreshed = Dedup.refreshEmbeddingIndex(idx, batch,
      "embedding", "vec_id")
    val rebuilt = Dedup.embeddingIndex(embs, "embedding", "vec_id", bits,
      tables)
    assert(refreshed.exceptAll(rebuilt).count() === 0)
    assert(rebuilt.exceptAll(refreshed).count() === 0)
    // a legacy index without the width column is refused, not misjoined
    val ex = intercept[IllegalArgumentException](
      Dedup.refreshEmbeddingIndex(idx.drop("bits"), batch,
        "embedding", "vec_id"))
    assert(ex.getMessage.contains("bits"))
    // an EMPTY index (first batch) neither throws nor drops anyone
    val empty = idx.limit(0)
    assert(Dedup.incrementalEmbeddingDedup(batch, empty,
      "embedding", "vec_id").count() === 0)
    assert(Dedup.refreshEmbeddingIndex(empty, batch,
      "embedding", "vec_id").count() === batch.count())
  }

  test("adversarial hot shingle: a universal boilerplate token neither " +
      "blows up candidates nor changes results") {
    import spark.implicits._
    // every doc shares one boilerplate 3-gram; true near-dups only
    // between doc 0 and doc 1000 (same body). A raw h-join would pair
    // every batch doc with every corpus doc through the hot shingle.
    val boiler = "terms of service apply here"
    def body(i: Long) = (0 until 12).map(j => s"w${i}_$j").mkString(" ")
    val corpus = (0L until 200L).map(i => (i, s"$boiler ${body(i)}"))
      .toDF("doc_id", "text")
    val batch = ((1000L, s"$boiler ${body(0)}") ::
      (1001L to 1050L).map(i => (i, s"$boiler ${body(i)}")).toList)
      .toDF("doc_id", "text")
    val idx = Dedup.shingleIndex(corpus, "text", "doc_id")
    val out = Dedup.incrementalJaccard(batch, idx, "text", "doc_id",
      shingleN = 3, threshold = 0.5).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 1000L && out.head.getLong(1) === 0L)
    // the hot shingle (df = corpus size) must fall out of every corpus
    // prefix: no index row with maximal df survives the prefix cut
    val hotH = idx.groupBy("h").agg(max(col("df")).as("d"))
      .orderBy(col("d").desc).limit(1).collect().head.getLong(0)
    val hotPrefixRows = idx
      .filter(col("pos") <= col("n") - ceil(col("n") * 0.5).cast("int"))
      .filter(col("h") === hotH).count()
    assert(hotPrefixRows === 0L)
  }
}

class PipelineStagesSpec extends SparkSpec {
  import graft.engine.Tables
  import graft.ops.CleanPipeline

  test("simhash and minhash dedup stages reduce the corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val before = docs.count()
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "simhash_dedup"},
        {"op": "minhash_dedup", "est_sim": 0.9}
      ]}}""", docs)
    val after = out.count()
    assert(after > 0 && after <= before)
    // representatives survive: min doc_id still present
    assert(out.agg(org.apache.spark.sql.functions.min("doc_id"))
      .head().getLong(0) === 0L)
  }
}

/** The curation family (DSIR / domain mixture / bigram-LM quality) as
  * CleanPipeline stages — each must reproduce its library operator's
  * decision exactly from the JSON spec. */
/** Gopher repetition signals (Rae et al. 2021 A1.1) + the
  * repetition_max stage: hand-computed lattice values, short-doc
  * passthrough, and the drop decision. */
class RepetitionSignalsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val docs = Seq(
    (1L, "a b a b a b"), // 2-grams: "a b"x3, "b a"x2; 3-grams: 2+2
    (2L, "x y z w"),     // all n-grams distinct
    (3L, "q")            // too short for any n-gram
  ).toDF("doc_id", "text")

  test("per-doc ppm signals match hand computation; short docs read 0") {
    val got = graft.ops.Curation
      .repetitionSignals(docs, "text", "doc_id")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      // doc 1: tot2=5 top2=3 dup2=5; tot3=4 top3=2 dup3=4
      (1L, 6L, 600000L, 1000000L, 500000L, 1000000L),
      // doc 2: tot2=3 top2=1 dup2=0; tot3=2 top3=1 dup3=0
      (2L, 4L, 333333L, 0L, 500000L, 0L),
      (3L, 1L, 0L, 0L, 0L, 0L)))
  }

  test("repetition_max stage drops exactly the docs over the ceilings") {
    def runJson(j: String) = graft.ops.CleanPipeline.run(j, docs)
    val kept = runJson("""{"pipeline": {"id": "doc_id", "stages": [
        {"op": "repetition_max", "max_dup2_ppm": 900000}]}}""")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
    // top3 ceiling alone: both gram-bearing docs sit at 500000 — a
    // 600000 ceiling drops nothing
    assert(runJson("""{"pipeline": {"id": "doc_id", "stages": [
        {"op": "repetition_max", "max_top3_ppm": 600000}]}}""")
      .count() === 3L)
    // and a 400000 ceiling drops both gram-bearing docs
    assert(runJson("""{"pipeline": {"id": "doc_id", "stages": [
        {"op": "repetition_max", "max_top3_ppm": 400000}]}}""")
      .select("doc_id").as[Long].collect().toSet === Set(3L))
  }
}

class CurationStagesSpec extends SparkSpec {
  import spark.implicits._
  import graft.engine.Tables
  import graft.ops.{CleanPipeline, Curation, IndexStore}

  test("dsir_gate e2e: a crawl gated on a STANDING IndexStore-committed " +
      "DSIR index keeps exactly the docs scoring >= the threshold") {
    val docs = Tables.load(spark, sfDir, "documents")
    val idx = Curation.dsirIndex(docs.filter($"lang" === "en"), docs,
      "text", numBuckets = 256)
    val dir = java.nio.file.Files.createTempDirectory("dsirgate").toString
    IndexStore.write(idx, dir)
    // threshold at the median weight so the gate genuinely splits
    val scores = Curation.dsirScores(IndexStore.read(spark, dir).get,
        docs, "text", "doc_id")
      .select($"doc_id", $"weight_q").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minW = scores.map(_._2).sorted.apply(scores.length / 2)
    val expect = scores.filter(_._2 >= minW).map(_._1).toSet
    val out = CleanPipeline.run(s"""
      {"pipeline": {"stages": [
        {"op": "dsir_gate", "index": "$dir", "min_weight_q": $minW}
      ]}}""", docs)
    assert(out.columns.toSet === docs.columns.toSet)
    val kept = out.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < scores.length)
  }

  test("bm25_gate e2e: a crawl gated on a STANDING seed postings index " +
      "keeps exactly the docs whose max BM25 score >= the threshold") {
    import graft.ops.Retrieval
    val docs = Tables.load(spark, sfDir, "documents")
    // seeds = a handful of docs describing the target domain
    val seeds = docs.filter($"doc_id" < 8)
    val idx = Retrieval.postingsIndex(seeds, "text", "doc_id")
    val dir = java.nio.file.Files.createTempDirectory("bm25gate").toString
    IndexStore.write(idx, dir)
    val crawl = docs.filter($"doc_id" >= 8)
    val scores = Retrieval.bm25ScoresVsSeedIndex(
        IndexStore.read(spark, dir).get, crawl, "text", "doc_id")
      .groupBy($"q_id").agg(max($"score_q").as("m")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minS = scores.map(_._2).sorted.apply(scores.length / 2)
    val expect = scores.filter(_._2 >= minS).map(_._1).toSet
    val out = CleanPipeline.run(s"""
      {"pipeline": {"stages": [
        {"op": "bm25_gate", "index": "$dir", "min_score_q": $minS}
      ]}}""", crawl)
    assert(out.columns.toSet === crawl.columns.toSet)
    val kept = out.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < scores.length)
  }

  test("blocklist stage drops exactly the contains() docs via trigram " +
      "pruning") {
    import graft.ops.Retrieval
    val docs = Tables.load(spark, sfDir, "documents")
    // blocklist = the corpus's most frequent bigram as a literal phrase
    val idx = Retrieval.postingsIndex(docs, "text", "doc_id")
    val pr = Retrieval.positionRows(idx)
    val top = pr.as("a").join(pr.as("b"),
        col("a.id") === col("b.id") && col("b.p") === col("a.p") + 1)
      .groupBy(col("a.term").as("w1"), col("b.term").as("w2"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w1"), col("w2")).limit(1).head()
    val phrase = s"${top.getString(0)} ${top.getString(1)}"
    val dir = java.nio.file.Files.createTempDirectory("blk")
      .resolve("pats").toString
    Seq(phrase).toDF("pat").write.parquet(dir)
    val out = CleanPipeline.run(s"""
      {"pipeline": {"stages": [
        {"op": "blocklist", "patterns": "$dir"}
      ]}}""", docs)
    val kept = out.select($"doc_id").collect().map(_.getLong(0)).toSet
    val expect = docs.filter(!col("text").contains(phrase))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === expect)
    assert(kept.nonEmpty && kept.size < docs.count())
  }

  test("domain_mixture stage draws exactly q106's per-source counts") {
    val docs = Tables.load(spark, sfDir, "documents")
    val out = CleanPipeline.run("""
      {"pipeline": {"stages": [
        {"op": "domain_mixture", "source": "source", "budget_bp": 6000}
      ]}}""", docs)
    val got = out.groupBy($"source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Curation.domainMixture(docs, "text", "doc_id", "source")
      .select($"source", $"n_sampled").collect()
      .map(r => (r.getString(0), r.getLong(1))).filter(_._2 > 0).toMap
    assert(got === want)
    assert(got.values.sum > 0)
  }

  test("lm_quality_max drops high-surprisal docs and keeps docs with " +
      "no bigram evidence") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "zq xv qqq zzz pqr wk"),
      (4L, "hello")).toDF("doc_id", "text")
    val scores = Curation.lmScores(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    // the junk doc's bigrams are all singletons -> strictly higher
    // mean surprisal than the two near-duplicate sentences
    assert(scores(3L) > scores(1L) && scores(3L) > scores(2L))
    val out = CleanPipeline.run(s"""
      {"pipeline": {"id": "doc_id", "stages": [
        {"op": "lm_quality_max", "max_score_q": ${scores(2L)}}
      ]}}""", docs)
    val kept = out.select($"doc_id").collect().map(_.getLong(0)).toSet
    // 3 dropped by the threshold; 4 has no bigrams and passes
    assert(kept === Set(1L, 2L, 4L))
  }
}

/** Measured-recall gate for the OR-amplified hyperplane LSH: on a
  * seeded corpus with KNOWN near-dup pairs, the derived (bits, tables)
  * geometry must find >= 90% of the cosine >= 0.9 ground truth, while a
  * single table at the same width demonstrably decays — the quality
  * half of the cost/quality trade the corpus-derived parameters make. */
class LshRecallSpec extends SparkSpec {
  import graft.ops.{Dedup, Similarity}

  private val dim = 64
  private val bits = 12 // the wide-signature regime where decay bites

  // 200 gaussian bases, each with a perturbed twin at cosine ~0.93-0.98
  private lazy val vectors: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    def gauss() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val bases = (0 until 200).map(i => (i.toLong, gauss()))
    val twins = bases.map { case (i, v) =>
      val eps = 0.2 + 0.1 * (i % 3) // 0.2 / 0.3 / 0.4
      val n = gauss()
      (1000L + i, v.zip(n).map { case (x, y) => x + eps.toFloat * y })
    }
    bases ++ twins
  }

  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < dim) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / math.sqrt(na * nb)
  }

  // ground truth: every unordered pair at cosine >= 0.9
  private lazy val truth: Set[(Long, Long)] = (for {
    i <- vectors.indices.iterator
    j <- (i + 1) until vectors.size
    if cosLocal(vectors(i)._2, vectors(j)._2) >= 0.9
  } yield (math.min(vectors(i)._1, vectors(j)._1),
    math.max(vectors(i)._1, vectors(j)._1))).toSet

  private def found(tables: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    Dedup.embeddingNearDups(df, "embedding", "vec_id", bits = bits,
        threshold = 0.9, tables = tables)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("derived tables clear the 0.9 recall target where one table " +
      "decays (the deriveBits cost fix no longer trades away recall)") {
    assert(truth.size >= 150, s"seed produced only ${truth.size} pairs")
    val l = Dedup.deriveTables(bits)
    val multi = found(l)
    val single = found(1)
    // precision stays exact on both paths (cosine-verified candidates)
    assert(multi.forall(truth), "multi returned a non-truth pair")
    val recallMulti = multi.size.toDouble / truth.size
    val recallSingle = single.size.toDouble / truth.size
    assert(recallMulti >= 0.9,
      s"multi-table recall $recallMulti < 0.9 (L=$l, bits=$bits)")
    assert(recallSingle < recallMulti,
      s"single $recallSingle !< multi $recallMulti")
  }

  test("incremental dedup through a multi-table index matches the " +
      "batch pair set on the same geometry") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val corpus = df.filter(col("vec_id") < 1000)
    val batch = df.filter(col("vec_id") >= 1000)
    val l = Dedup.deriveTables(bits)
    val idx = Dedup.embeddingIndex(corpus, "embedding", "vec_id",
      bits = bits, tables = l)
    val inc = Dedup.incrementalEmbeddingDedup(batch, idx,
        "embedding", "vec_id", threshold = 0.9)
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    val full = found(l).filter { case (a, b) => a < 1000 && b >= 1000 }
    assert(inc === full)
    // and the recorded geometry round-trips through a refresh
    val refreshed = Dedup.refreshEmbeddingIndex(idx, batch,
      "embedding", "vec_id")
    assert(refreshed.select("bits", "tables").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq === Seq((bits, l)))
  }

  test("a mixed-geometry index is refused, not silently mis-bucketed") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val a = Dedup.embeddingIndex(df.filter(col("vec_id") < 100),
      "embedding", "vec_id", bits = 4)
    val b = Dedup.embeddingIndex(df.filter(col("vec_id") >= 1000),
      "embedding", "vec_id", bits = 8)
    val mixed = a.unionByName(b)
    val batch = df.filter(col("vec_id") === 0L)
    val ex = intercept[IllegalArgumentException](
      Dedup.incrementalEmbeddingDedup(batch, mixed, "embedding", "vec_id")
        .count())
    assert(ex.getMessage.contains("mixed-geometry"))
    val ex2 = intercept[IllegalArgumentException](
      Dedup.refreshEmbeddingIndex(mixed, batch, "embedding", "vec_id")
        .count())
    assert(ex2.getMessage.contains("mixed-geometry"))
  }

  test("lshTopK with derived tables recovers neighbors a single table " +
      "misses") {
    import spark.implicits._
    val df = vectors.toDF("vec_id", "embedding")
    val probes = df.filter(col("vec_id") < 40) // 40 bases; twin = +1000
    val l = Dedup.deriveTables(bits)
    def hits(tables: Int) =
      Similarity.lshTopK(df, probes, "embedding", "vec_id", k = 1,
          bits = bits, tables = tables)
        .filter(col("id") === col("q_id") + 1000L).count()
    val multi = hits(l)
    assert(multi >= 36, s"multi-table found $multi/40 twins") // >= 90%
    assert(hits(1) < multi)
  }
}

class RollupSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.{IndexStore, Rollup}

  private def events = graft.engine.Tables.load(spark, sfDir, "events")

  test("served rollup equals the direct aggregate, any fold order") {
    val dims = Seq("event_type")
    val direct = events
      .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("bucket_day"),
        floor(hour(col("ts")) / 6).as("bucket_i"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"),
        min(col("value")).as("min_value"), max(col("value")).as("max_value"),
        (sum(col("value").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_value"))
      .orderBy(col("bucket_day"), col("bucket_i"), col("event_type"))
      .collect().map(_.toString)
    // two different delta orders must serve the identical answer
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
      val roll = order.tail.foldLeft(Rollup.build(
          events.filter(pmod(col("event_id"), lit(3)) === order.head),
          "ts", "minute", dims, "value")) { (r, i) =>
        Rollup.refresh(r, events.filter(pmod(col("event_id"), lit(3)) === i),
          "ts", dims, "value")
      }
      val served = Rollup.serve(roll, "hour", 6, dims)
        .select(date_format(col("bucket_ts"), "yyyy-MM-dd").as("bucket_day"),
          col("bucket_i"), col("event_type"), col("n"), col("sum_value"),
          col("min_value"), col("max_value"), col("avg_value"))
        .orderBy(col("bucket_day"), col("bucket_i"), col("event_type"))
        .collect().map(_.toString)
      assert(served === direct)
    }
  }

  test("late data folds into its bucket — no watermark drop") {
    import spark.implicits._
    val day1 = Seq((1L, "2024-01-01 00:10:00", "a", 1.50),
      (2L, "2024-01-02 00:00:00", "a", 2.00))
      .toDF("event_id", "s", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val late = Seq((3L, "2024-01-01 00:10:30", "a", 3.25))
      .toDF("event_id", "s", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val roll = Rollup.refresh(
      Rollup.build(day1, "ts", "minute", Seq("event_type"), "value"),
      late, "ts", Seq("event_type"), "value")
    val b = roll.filter(col("grain_ts") === lit("2024-01-01 00:10:00")
        .cast("timestamp")).collect()
    assert(b.length === 1)
    assert(b.head.getAs[Long]("n") === 2L)
    assert(b.head.getAs[java.math.BigDecimal]("sum_dec_value")
      .compareTo(new java.math.BigDecimal("4.75")) === 0)
  }

  test("geometry discipline: mixed grains and finer-than-grain serving fail loudly") {
    import spark.implicits._
    val df = Seq((1L, "2024-01-01 00:10:07", "a", 1.0))
      .toDF("event_id", "s", "event_type", "value")
      .withColumn("ts", col("s").cast("timestamp"))
    val mIdx = Rollup.build(df, "ts", "minute", Seq("event_type"), "value")
    val hIdx = Rollup.build(df, "ts", "hour", Seq("event_type"), "value")
    intercept[IllegalArgumentException] {
      Rollup.merge(mIdx, hIdx, Seq("event_type"))
    }
    intercept[IllegalArgumentException] {
      Rollup.grainOf(mIdx.unionByName(hIdx))
    }
    intercept[IllegalArgumentException] {
      Rollup.serve(hIdx, "minute", 10) // hour rollup can't serve minutes
    }
  }

  test("refreshStore maintains the standing rollup crash-atomically via IndexStore") {
    val dir = java.nio.file.Files.createTempDirectory("rollup")
      .resolve("roll").toString
    val dims = Seq("event_type")
    Rollup.refreshStore(spark, dir,
      events.filter(pmod(col("event_id"), lit(2)) === 0),
      "ts", "minute", dims, "value")
    assert(IndexStore.currentVersion(spark, dir) === Some(1L))
    Rollup.refreshStore(spark, dir,
      events.filter(pmod(col("event_id"), lit(2)) === 1),
      "ts", "minute", dims, "value")
    assert(IndexStore.currentVersion(spark, dir) === Some(2L))
    val served = Rollup.serve(IndexStore.read(spark, dir).get, "day", 1, dims)
      .agg(sum(col("n"))).collect().head.getLong(0)
    assert(served === events.count())
  }
}

class BloomSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.functions.BloomHash
  import graft.ops.Dedup

  test("no false negatives, FP rate near theory, geometry recorded") {
    import spark.implicits._
    val corpus = (0L until 2000L).map(i => (i, i * 31 + 7)).toDF("id", "h")
      .repartition(8) // partial buffers must OR across partitions
    val idx = Dedup.bloomIndex(corpus, "h", shards = 2, bitsPerKey = 10)
    assert(Dedup.bloomMeta(idx) === (16384, 4, 2)) // nextpow2(10*2000/2)
    // every corpus key must hit (Bloom never misses)
    val selfHits = Dedup.bloomGate(corpus, idx, "h")
      .filter(!col("bloom_hit")).count()
    assert(selfHits === 0L)
    // disjoint probe keys: FP rate ~ (1-e^(-kn/m))^k ~ 1.6% at 10 b/key
    val probes = (0L until 2000L).map(i => (i, i * 131071 + 3)).toDF("id", "h")
    val fp = Dedup.bloomGate(probes, idx, "h")
      .filter(col("bloom_hit")).count()
    assert(fp < 100, s"false-positive count $fp way above theory (~32)")
  }

  test("probe positions: KM double hashing, k distinct, oracle-replicable") {
    // h2 odd + power-of-two m => the k positions are pairwise distinct
    for (h <- Seq(0L, 1L, 17L, 2147483646L, -5L)) {
      val ps = (0 until 4).map(i => BloomHash.position(h, i, 1024))
      assert(ps.distinct.size === 4, s"h=$h positions $ps")
      assert(ps.forall(p => p >= 0 && p < 1024))
    }
    // negative hashes normalize like the SQL ((h%P)+P)%P
    assert(BloomHash.position(-5L, 2, 4096) ===
      BloomHash.position(-5L + BloomHash.P, 2, 4096))
  }

  test("mergeBloomIndexes is exact set-union; mixed geometry fails loudly") {
    import spark.implicits._
    val a = (0L until 500L).map(i => (i, i * 31 + 7)).toDF("id", "h")
    val b = (500L until 1000L).map(i => (i, i * 31 + 7)).toDF("id", "h")
    val m = 4096
    val ia = Dedup.bloomIndex(a, "h", shards = 2, k = 4, mBits = m)
    val ib = Dedup.bloomIndex(b, "h", shards = 2, k = 4, mBits = m)
    val union = Dedup.bloomIndex(a.unionByName(b), "h", shards = 2,
      k = 4, mBits = m)
    val merged = Dedup.mergeBloomIndexes(ia, ib)
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select(col("shard"), col("words")).orderBy(col("shard"))
      .collect().map(r => (r.getLong(0),
        r.getSeq[Long](1).toList)).toList
    assert(key(merged) === key(union))
    intercept[IllegalArgumentException] {
      Dedup.mergeBloomIndexes(ia,
        Dedup.bloomIndex(b, "h", shards = 2, k = 4, mBits = 2 * m))
    }
    intercept[IllegalArgumentException] {
      Dedup.bloomMeta(ia.unionByName(
        Dedup.bloomIndex(b, "h", shards = 2, k = 4, mBits = 2 * m)))
    }
  }

  test("exactDedupIngestBatch: gates batches, replays idempotently, regrows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bloomgate")
      .resolve("state").toString
    def gate(rows: Seq[(Long, String)]) = graft.streaming.StreamOps
      .exactDedupIngestBatch(rows.toDF("doc_id", "text"), dir,
        "text", "doc_id", shards = 2, bitsPerKey = 8)
    // batch 1: all new, one in-batch dup (lowest id survives)
    val k1 = gate(Seq(1L -> "alpha beta", 2L -> "gamma", 7L -> "alpha beta"))
      .select("doc_id").as[Long].collect().sorted
    assert(k1 === Array(1L, 2L))
    // batch 2: one cross-batch dup, one new
    val k2 = gate(Seq(10L -> "gamma", 11L -> "delta"))
      .select("doc_id").as[Long].collect().sorted
    assert(k2 === Array(11L))
    // replay batch 2 after a "crash": same kept set, index unchanged
    val before = graft.ops.IndexStore.read(spark, s"$dir/hashes").get
      .collect().map(_.toString).sorted
    val k2r = gate(Seq(10L -> "gamma", 11L -> "delta"))
      .select("doc_id").as[Long].collect().sorted
    assert(k2r === Array(11L))
    val after = graft.ops.IndexStore.read(spark, s"$dir/hashes").get
      .collect().map(_.toString).sorted
    assert(after === before)
    // auto-geometry regrow: flood with distinct docs; the bloom width
    // must outgrow its first-batch derivation (which was the 64 floor)
    val (m0, _, _) = Dedup.bloomMeta(
      graft.ops.IndexStore.read(spark, s"$dir/bloom").get)
    gate((100L until 300L).map(i => (i, s"doc nr $i")))
    val (m1, _, s1) = Dedup.bloomMeta(
      graft.ops.IndexStore.read(spark, s"$dir/bloom").get)
    assert(m1 > m0)
    assert(m1 === Dedup.deriveBloomBits(graft.ops.IndexStore
      .read(spark, s"$dir/hashes").get.count(), 8, s1))
  }

  test("bloom_agg / bloom_maybe registered as SQL functions") {
    val s = spark
    new graft.functions.GraftExtensions().registrations.foreach {
      case (id, info, builder) =>
        if (!s.sessionState.functionRegistry.functionExists(id))
          s.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    import s.implicits._
    (0L until 100L).map(i => (i, i * 31 + 7)).toDF("id", "h")
      .createOrReplaceTempView("bloom_in")
    val words = s.sql(
      "SELECT bloom_agg(h, 1024, 4) AS w FROM bloom_in")
    words.createOrReplaceTempView("bloom_words")
    val missing = s.sql("""
      SELECT count(*) AS miss FROM bloom_in, bloom_words
      WHERE NOT bloom_maybe(w, h, 1024, 4)""").collect().head.getLong(0)
    assert(missing === 0L)
  }
}

class IvfIndexSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.{IndexStore, Similarity}

  private def embs = graft.engine.Tables.load(spark, sfDir, "embeddings")

  test("standing index at nprobe=1 reproduces ivfTopK exactly") {
    val idx = Similarity.ivfIndex(embs, "embedding", "vec_id",
      numCentroids = 8)
    val viaIndex = Similarity.ivfSearchIndex(idx,
        embs.filter(col("vec_id") < 5), "embedding", "vec_id",
        k = 3, nprobe = 1)
      .select("q_id", "id", "rank").collect().map(_.toString).sorted
    val direct = Similarity.ivfTopK(embs, col("id") < 5, "embedding",
        "vec_id", k = 3, numCentroids = 8)
      .select("q_id", "id", "rank").collect().map(_.toString).sorted
    assert(viaIndex.nonEmpty)
    assert(viaIndex === direct)
  }

  test("incremental fold equals the from-scratch index; replay-safe") {
    val first = embs.filter(col("vec_id") < 30)
    val batch = embs.filter(col("vec_id") >= 30 && col("vec_id") < 60)
    val folded = Similarity.refreshIvfIndex(
      Similarity.ivfIndex(first, "embedding", "vec_id", numCentroids = 4),
      batch, "embedding", "vec_id")
    // seed centroids = 4 smallest ids, all inside `first`, so the
    // from-scratch index over the union has the SAME cells
    val scratch = Similarity.ivfIndex(
      embs.filter(col("vec_id") < 60), "embedding", "vec_id",
      numCentroids = 4)
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("role", "id", "cent_id").collect()
      .map(_.toString).sorted
    assert(key(folded) === key(scratch))
    // replaying the same batch leaves the index unchanged
    assert(key(Similarity.refreshIvfIndex(folded, batch,
      "embedding", "vec_id")) === key(folded))
  }

  test("nprobe widens recall monotonically toward brute force") {
    val idx = Similarity.ivfIndex(embs, "embedding", "vec_id",
      numCentroids = 16)
    val probes = embs.filter(col("vec_id") < 20)
    val truth = Similarity.bruteForceTopK(embs, probes, "embedding",
        "vec_id", k = 5)
      .select(col("q_id"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def hits(np: Int): Int = Similarity.ivfSearchIndex(idx, probes,
        "embedding", "vec_id", k = 5, nprobe = np)
      .select(col("q_id"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .intersect(truth).size
    val h1 = hits(1); val h4 = hits(4); val h16 = hits(16)
    assert(h1 <= h4 && h4 <= h16)
    assert(h16 === truth.size) // nprobe = all cells == exhaustive
  }

  test("roundtrips through IndexStore") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx")
      .resolve("idx").toString
    val idx = Similarity.ivfIndex(embs.filter(col("vec_id") < 100),
      "embedding", "vec_id", numCentroids = 4)
    IndexStore.write(idx, dir)
    val back = IndexStore.read(spark, dir).get
    assert(Similarity.ivfCentroids(back).count() === 4)
    val served = Similarity.ivfSearchIndex(back,
      embs.filter(col("vec_id") >= 100 && col("vec_id") < 105),
      "embedding", "vec_id", k = 2)
    assert(served.groupBy(col("q_id")).count()
      .filter(col("count") =!= 2).count() === 0)
  }
}

class LengthPctGateSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.{CleanPipeline, IndexStore, Sketches}

  test("length_pct_gate drops docs below their source's standing p-pct " +
      "length; unseen sources pass") {
    val dir = java.nio.file.Files.createTempDirectory("qgate")
      .resolve("qh").toString
    // history: source a has lengths 10..100; source b 1..10
    val hist = ((1 to 91).map(i => ("a", (i + 9).toLong)) ++
      (1 to 10).map(i => ("b", i.toLong))).toDF("k", "n")
    IndexStore.write(
      Sketches.quantileHistogram(hist, "k", "n").localCheckpoint(), dir)
    def doc(words: Int) = (1 to words).map(i => s"w$i").mkString(" ")
    val batch = Seq(
      (1L, "a", doc(80)),  // well above a's p50 -> keep
      (2L, "a", doc(5)),   // below a's p50 -> drop
      (3L, "b", doc(5)),   // at/above b's p50 -> keep
      (4L, "zz", doc(1)))  // unseen source -> pass
      .toDF("doc_id", "source", "text")
    val out = CleanPipeline.run(s"""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "length_pct_gate", "index": "$dir", "pct": 50,
         "source": "source"}
      ]}}""", batch).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(1L, 3L, 4L))
  }
}

class RecencyClampSpec extends SparkSpec {
  import spark.implicits._

  test("q157 weight clamps to 0 past 32 weeks (no JVM shift wrap)") {
    // JVM int shifts use `n & 31`: an unclamped 2^20 >> 32 wraps back
    // to 2^20 (full weight) while DuckDB's >> saturates to 0. Events
    // 40 weeks old must contribute weight 0, not 2^20.
    val dir = java.nio.file.Files.createTempDirectory("recency").toString
    val wk = 604800000000L // one week in micros
    val base = 1700000000000000L
    Seq(
      (1L, "a", 10L, new java.sql.Timestamp(base / 1000)),         // now: w=2^20
      (2L, "a", 11L, new java.sql.Timestamp((base - 40 * wk) / 1000)), // 40wk: w=0
      (3L, "b", 12L, new java.sql.Timestamp((base - 33 * wk) / 1000)), // 33wk: w=0
      (4L, "b", 13L, new java.sql.Timestamp((base - 7 * wk) / 1000)))  // 7wk: w=2^13
      .toDF("event_id", "event_type", "user_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.ops.TemporalQueries.queries("q157_recency_decay")(
      spark, dir)
      .select("etype", "recency_q", "hottest_user")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out("a") === ((1048576L, 10L)))       // old event adds 0
    assert(out("b") === ((8192L, 13L)))          // 33wk adds 0; 7 half-lives = 2^20 >> 7
  }
}

class HeaderParseSpec extends SparkSpec {
  import graft.ops.Multimodal
  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("JPEG scan skips 0xFF fill bytes and stops at SOS/EOI") {
    // APP0, two fill bytes, then SOF0 — the fill bytes must not be
    // read as a marker with a length field (T.81 B.1.1.2)
    val padded = b(0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00,
      0xFF, 0xFF, // inter-segment padding
      0xFF, 0xC0, 0x00, 0x11, 0x08,
      0x00, 0xF0, 0x01, 0x40, 0x03) ++ new Array[Byte](20)
    assert(Multimodal.headerDims(padded) === ("jpeg", 320, 240))
    // SOS before any SOF: a truncated pre-SOF stream must stop, not
    // walk entropy-coded bytes as if they were segments
    val sosFirst = b(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x08) ++
      new Array[Byte](30)
    assert(Multimodal.headerDims(sosFirst) === ("jpeg", -1, -1))
  }

  test("GIF and BMP header dims parse without a decoder") {
    val gif = "GIF89a".getBytes("ISO-8859-1") ++
      b(0x40, 0x01, 0xF0, 0x00) ++ new Array[Byte](10) // 320 x 240 LE
    assert(Multimodal.headerDims(gif) === ("gif", 320, 240))
    val bmp = b('B', 'M') ++ new Array[Byte](16) ++
      b(0x80, 0x02, 0x00, 0x00) ++ // width 640
      b(0x98, 0xFE, 0xFF, 0xFF) ++ // height -360 (top-down)
      new Array[Byte](10)
    assert(Multimodal.headerDims(bmp) === ("bmp", 640, 360))
  }

  test("WAV header yields sample rate and duration from fmt/data " +
      "chunk arithmetic alone") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val fmt = "fmt ".getBytes ++ le32(16) ++
      b(0x01, 0x00, 0x01, 0x00) ++ // PCM, mono
      le32(16000) ++ le32(32000) ++ // rate, byteRate
      b(0x02, 0x00, 0x10, 0x00)
    val data = "data".getBytes ++ le32(64000) // 2 s at 32000 B/s
    val wav = "RIFF".getBytes ++ le32(4 + fmt.length + data.length) ++
      "WAVE".getBytes ++ fmt ++ data
    assert(Multimodal.audioHeader(wav) === ("wav", 16000, 2000))
    assert(Multimodal.audioHeader("RIFFxxxxWAVE".getBytes) ===
      ("wav", -1, -1))
    assert(Multimodal.audioHeader("nope".getBytes) ===
      ("unknown", -1, -1))
  }
}

class QualitySpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Quality
  import graft.ops.Quality._

  test("constraint suite: pass/fail semantics, tolerance, unique, ref") {
    val df = Seq(
      (1L, Some(10.0), "A"), (2L, Some(0.5), "N"),
      (3L, None, "R"), (4L, Some(2.0), "X"), (4L, Some(3.0), "A"))
      .toDF("id", "v", "flag")
    val dim = Seq(1L, 2L, 3L).toDF("id")
    val out = Quality.verify(df, Seq(
      Complete("c_v_complete", "v"),            // 4/5 -> fail at 100
      Complete("c_v_complete80", "v", 80),      // 4/5 -> pass at 80
      InRange("c_v_range", "v", 0.0, 10.0),     // null fails -> 4/5
      InSet("c_flag", "flag", Seq("A", "N", "R"), 80), // 4/5 pass
      Satisfies("c_id_pos", "id > 0"),          // 5/5 pass
      Unique("c_id_unique", "id"),              // dup id=4 -> 4/5 fail
      Ref("c_id_ref", "id", dim, "id", 60)))    // 3/5 (id=4 x2 orphan)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("c_v_complete") === ((4L, 5L, false)))
    assert(out("c_v_complete80") === ((4L, 5L, true)))
    assert(out("c_v_range") === ((4L, 5L, false)))
    assert(out("c_flag") === ((4L, 5L, true)))
    assert(out("c_id_pos") === ((5L, 5L, true)))
    assert(out("c_id_unique") === ((4L, 5L, false)))
    assert(out("c_id_ref") === ((3L, 5L, true)))
  }

  test("quality check command: JSON spec over a registered table, " +
      "ref resolves through the catalog") {
    val dir = java.nio.file.Files.createTempDirectory("qual")
    Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("k", "s").write.parquet(dir.resolve("t.parquet").toString)
    Seq(1L, 2L).toDF("k")
      .write.parquet(dir.resolve("d.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("t", dir.resolve("t.parquet").toString)
    cat.registerTable("d", dir.resolve("d.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val reply = engine.execute("""quality check where table = t and spec = {"checks": [
      {"kind": "complete", "name": "s_complete", "col": "s", "min_pct": 60},
      {"kind": "unique", "name": "k_unique", "col": "k"},
      {"kind": "ref", "name": "k_ref", "col": "k", "ref_table": "d",
       "ref_col": "k", "min_pct": 50}]}""")
    assert(reply.contains(""""check_name":"s_complete""""), reply)
    assert(reply.contains(""""metric_num":2"""), reply)
    assert(reply.contains(""""pass":true"""), reply)
  }

  test("unique: pinned NULL semantics — every null row is its own " +
      "group (SQL UNIQUE), only duplicated non-null values fail") {
    // three NULLs + two distinct values: metric 5/5, pass
    val ok = Seq(Some("a"), Some("b"), None, None, None).toDF("s")
    val r1 = Quality.verify(ok, Seq(Unique("u", "s"))).head()
    assert((r1.getLong(1), r1.getLong(2), r1.getBoolean(3)) ===
      ((5L, 5L, true)))
    // duplicated non-null value fails even with nulls present:
    // distinct-non-null 1 + nulls 1 = 2 of 3
    val dup = Seq(Some("a"), Some("a"), None).toDF("s")
    val r2 = Quality.verify(dup, Seq(Unique("u", "s"))).head()
    assert((r2.getLong(1), r2.getLong(2), r2.getBoolean(3)) ===
      ((2L, 3L, false)))
  }
}

class MatViewSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.MatView
  import graft.ops.MatView.AggSpec

  private val aggs = Seq(AggSpec("count", "1", "n"),
    AggSpec("sum", "v", "sv"), AggSpec("min", "v", "mn"),
    AggSpec("max", "v", "mx"))

  test("fold == rebuild for any batch split (distributivity)") {
    val rows = (1 to 200).map(i => (s"k${i % 7}", (i * 37 % 101).toLong))
    val all = rows.toDF("k", "v")
    val oneShot = MatView.partials(all, Seq("k"), aggs)
      .orderBy("k").collect().toSeq
    for (cut <- Seq(1, 50, 199)) {
      val (a, b) = rows.splitAt(cut)
      val folded = MatView.fold(
        MatView.partials(a.toDF("k", "v"), Seq("k"), aggs),
        MatView.partials(b.toDF("k", "v"), Seq("k"), aggs),
        Seq("k"), aggs).orderBy("k").collect().toSeq
      assert(folded === oneShot, s"cut=$cut")
    }
  }

  test("matview commands: create/refresh/get round-trip; refresh " +
      "uses the RECORDED spec; keys stay through a one-sided batch") {
    val dir = java.nio.file.Files.createTempDirectory("mv")
    Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("k", "v")
      .write.parquet(dir.resolve("base.parquet").toString)
    Seq(("b", 10L), ("c", 7L)).toDF("k", "v")
      .write.parquet(dir.resolve("batch.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("base", dir.resolve("base.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val p = dir.resolve("mv1").toString
    val created = engine.execute(s"matview create where table = base " +
      s"""and path = $p and spec = {"keys": ["k"], "aggs": [
        {"fn": "count", "alias": "n"}, {"fn": "sum", "expr": "v",
         "alias": "sv"}, {"fn": "max", "expr": "v", "alias": "mx"}]}""")
    assert(created.contains("2 groups"), created)
    engine.execute(s"matview refresh where path = $p and " +
      s"source = ${dir.resolve("batch.parquet")}")
    val got = engine.execute(s"matview get where path = $p")
    // a: untouched; b: folded; c: new key from the batch
    assert(got.contains(""""k":"a","n":2,"sv":6,"mx":5"""), got)
    assert(got.contains(""""k":"b","n":2,"sv":12,"mx":10"""), got)
    assert(got.contains(""""k":"c","n":1,"sv":7,"mx":7"""), got)
  }

  test("foldDelete: count/sum subtract, emptied groups retire " +
      "(fold-with-deletes == rebuild); min/max and missing count " +
      "hit the IVM boundary loudly") {
    val csAggs = Seq(AggSpec("count", "1", "n"),
      AggSpec("sum", "v", "sv"))
    val all = Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 3L), ("c", 9L))
      .toDF("k", "v")
    val dels = Seq(("a", 5L), ("c", 9L)).toDF("k", "v")
    val after = MatView.foldDelete(
      MatView.partials(all, Seq("k"), csAggs), dels, Seq("k"), csAggs)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // c retired entirely; a subtracted; b untouched == one-shot rebuild
    assert(after === Seq(("a", 1L, 1L), ("b", 2L, 5L)))
    // min/max in the spec → the standard IVM boundary, loudly
    val err = intercept[IllegalStateException] {
      MatView.foldDelete(MatView.partials(all, Seq("k"), aggs), dels,
        Seq("k"), aggs)
    }
    assert(err.getMessage.contains("not self-maintainable"), err.getMessage)
    // no count agg → a fully-deleted group could never retire: loud
    val sumOnly = Seq(AggSpec("sum", "v", "sv"))
    val err2 = intercept[IllegalStateException] {
      MatView.foldDelete(MatView.partials(all, Seq("k"), sumOnly), dels,
        Seq("k"), sumOnly)
    }
    assert(err2.getMessage.contains("count"), err2.getMessage)
  }

  test("matview delete command: folds tombstones under the recorded " +
      "spec, aborts on a non-subset batch, refuses min/max specs") {
    val dir = java.nio.file.Files.createTempDirectory("mvdel")
    Seq(("a", 1L), ("a", 5L), ("b", 2L)).toDF("k", "v")
      .write.parquet(dir.resolve("base.parquet").toString)
    Seq(("a", 5L)).toDF("k", "v")
      .write.parquet(dir.resolve("dels.parquet").toString)
    // 10 rows of k=z that were never folded in: non-subset delete
    Seq.fill(10)(("z", 1L)).toDF("k", "v")
      .write.parquet(dir.resolve("bad.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("base", dir.resolve("base.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val p = dir.resolve("mv2").toString
    engine.execute(s"matview create where table = base " +
      s"""and path = $p and spec = {"keys": ["k"], "aggs": [
        {"fn": "count", "alias": "n"}, {"fn": "sum", "expr": "v",
         "alias": "sv"}]}""")
    val out = engine.execute(s"matview delete where path = $p and " +
      s"source = ${dir.resolve("dels.parquet")}")
    assert(out.contains("2 groups remain"), out)
    val got = engine.execute(s"matview get where path = $p")
    assert(got.contains(""""k":"a","n":1,"sv":1"""), got)
    assert(got.contains(""""k":"b","n":1,"sv":2"""), got)
    // non-subset delete: detected via negative count, state intact
    val err = intercept[IllegalArgumentException] {
      engine.execute(s"matview delete where path = $p and " +
        s"source = ${dir.resolve("bad.parquet")}")
    }
    assert(err.getMessage.contains("not a subset"), err.getMessage)
    assert(engine.execute(s"matview get where path = $p")
      .contains(""""k":"a","n":1,"sv":1"""))
    // a min/max view refuses the delete path loudly
    val p2 = dir.resolve("mv3").toString
    engine.execute(s"matview create where table = base " +
      s"""and path = $p2 and spec = {"keys": ["k"], "aggs": [
        {"fn": "count", "alias": "n"}, {"fn": "max", "expr": "v",
         "alias": "mx"}]}""")
    val err2 = intercept[IllegalStateException] {
      engine.execute(s"matview delete where path = $p2 and " +
        s"source = ${dir.resolve("dels.parquet")}")
    }
    assert(err2.getMessage.contains("not self-maintainable"),
      err2.getMessage)
  }
}

class ProfileSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Profile

  test("profile: one-pass per-column stats, nulls and lengths exact; " +
      "approx mode stays within HLL error; command renders") {
    val df = Seq(
      (1L, Some("aa"), Some(1.5)), (2L, Some("bbbb"), None),
      (3L, None, Some(2.5)), (4L, Some("aa"), Some(1.5)))
      .toDF("id", "s", "v")
    val p = Profile.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getAs[Long]("n_rows") === 4L)
    assert(p("id").getAs[Long]("n_nulls") === 0L)
    assert(p("id").getAs[Long]("n_distinct") === 4L)
    assert(p("s").getAs[Long]("n_nulls") === 1L)
    assert(p("s").getAs[Long]("n_distinct") === 2L)
    assert(p("s").getAs[Long]("len_min") === 2L)
    assert(p("s").getAs[Long]("len_max") === 4L)
    assert(p("s").getAs[Long]("len_avg") === 2L) // (2+4+2)/3 floor
    assert(p("v").getAs[Long]("n_distinct") === 2L)
    assert(p("v").getAs[String]("min_s") === "1.5")
    assert(p("id").isNullAt(p("id").fieldIndex("len_min")))
    // approx mode: HLL estimate close on a small distinct set
    val ap = Profile.profile(df, exact = false).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    assert(math.abs(ap("id") - 4L) <= 1L)
    // command surface
    val dir = java.nio.file.Files.createTempDirectory("prof")
    df.write.parquet(dir.resolve("t.parquet").toString)
    val cat = new graft.engine.Catalog(spark)
    cat.registerTable("t", dir.resolve("t.parquet").toString)
    val engine = new graft.engine.Engine(spark, cat)
    val reply = engine.execute("profile table where table = t")
    assert(reply.contains(""""col_name":"s""""), reply)
    assert(reply.contains(""""n_distinct":2"""), reply)
  }
}

class HammingPairsSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.F

  test("hammingPairs == brute-force radius search (exactness), each " +
      "pair once; simhash64's upper half is decorrelated") {
    val docs = graft.engine.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val brute = docs.select(col("doc_id").as("id"),
        F.simhash64(col("text")).as("sig"))
    val b2 = brute.toDF("id_b", "sig_b")
    val expect = brute.crossJoin(b2)
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"),
        expr("bit_count(sig ^ sig_b)").as("hamming"))
      .filter(col("hamming") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.ops.Dedup.hammingPairs(docs, "text", "doc_id",
        radius = 3, bandBits = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === expect)
    assert(got.length === got.toSet.size) // exactly once per pair
    // decorrelation sanity: the upper 32 bits are not a copy of the
    // lower (they vote on the avalanched hash)
    val s = brute.limit(50).collect().map(_.getLong(1))
    assert(s.exists(v => (v >>> 32) != (v & 0xFFFFFFFFL)))
    // pigeonhole precondition enforced
    intercept[IllegalArgumentException](
      graft.ops.Dedup.hammingPairs(docs, "text", "doc_id",
        radius = 4, bandBits = 16))
  }
}

class HtmlPiiStagesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.CleanPipeline

  test("html_extract stage unwraps markup so downstream dedup sees " +
      "the content; markup-only docs empty out") {
    import spark.implicits._
    val in = Seq(
      (1L, "<html><body><p>same content here</p></body></html>"),
      (2L, "<div class=\"x\">same <b>content</b> here</div>" +
        "<script>var t = 1;</script>"),
      (3L, "<p>different words entirely</p>")
    ).toDF("doc_id", "text")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "html_extract"},
        {"op": "dedup_exact"}
      ]}}""", in)
    // docs 1 and 2 carry the SAME text under different markup — only
    // the extraction makes the dedup gate see that
    assert(out.select("doc_id").as[Long].collect().sorted
      === Array(1L, 3L))
    assert(out.filter(col("doc_id") === 1L).head().getAs[String]("text")
      === "same content here")
  }

  test("redact_pii stage masks emails/IPs/phones, leaves prose intact") {
    import spark.implicits._
    val in = Seq((1L,
      "reach bob.smith+a@corp-mail.example.co at +1-555-0199 " +
        "or node 192.168.4.27 port eight")).toDF("doc_id", "text")
    val out = CleanPipeline.run("""
      {"pipeline": {"id": "doc_id", "text": "text", "stages": [
        {"op": "redact_pii"}
      ]}}""", in)
    assert(out.head().getAs[String]("text") ===
      "reach <EMAIL> at <PHONE> or node <IP> port eight")
  }
}
