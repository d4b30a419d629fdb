package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.io.Writers
import graft.multimodal.Multimodal
import graft.streaming.Streams

class IoStreamingMultimodalSpec extends AnyFunSuite with SparkFixture {

  private def tmp(): String =
    Files.createTempDirectory("graft-io").toFile.getAbsolutePath

  test("partitionedOverwrite rewrites only the written partitions (T3)") {
    import spark.implicits._
    val path = tmp() + "/t"
    Seq(("2026-01-01", "A", 1.0), ("2026-01-02", "B", 2.0))
      .toDF("scan_date", "ticker", "v")
      .write.partitionBy("scan_date").parquet(path)
    // overwrite only 01-02 with new content; 01-01 must survive
    Writers.partitionedOverwrite(
      Seq(("2026-01-02", "B", 99.0)).toDF("scan_date", "ticker", "v"),
      path, "scan_date", clusterCols = Seq("ticker"))
    val out = spark.read.parquet(path).collect()
      .map(r => r.getAs[Any]("scan_date").toString -> r.getAs[Double]("v")).toMap
    assert(out == Map("2026-01-01" -> 1.0, "2026-01-02" -> 99.0))
  }

  test("mergeUpsert updates matched keys in place, partition-scoped (J3)") {
    import spark.implicits._
    val path = tmp() + "/m"
    Seq(("2026-01-01", "A", 1.0), ("2026-01-01", "B", 2.0), ("2026-01-02", "C", 3.0))
      .toDF("scan_date", "ticker", "v")
      .write.partitionBy("scan_date").parquet(path)
    Writers.mergeUpsert(spark, path,
      Seq(("2026-01-01", "B", 42.0)).toDF("scan_date", "ticker", "v"),
      keys = Seq("scan_date", "ticker"), updateCols = Seq("v"),
      partitionCol = Some("scan_date"))
    val out = spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("ticker") -> r.getAs[Double]("v")).toMap
    assert(out == Map("A" -> 1.0, "B" -> 42.0, "C" -> 3.0))
  }

  test("ORC sink/source round-trips with pushdown reaching the scan") {
    import spark.implicits._
    val path = tmp() + "/orc"
    val df = (1 to 100).map(i => (f"2026-01-${i % 3 + 1}%02d", i.toLong, i * 1.5))
      .toDF("scan_date", "id", "v")
    Writers.orcAppend(df, path, partitionCol = Some("scan_date"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("scan_date", org.apache.spark.sql.types.StringType)))
    val back = graft.io.Readers.orc(spark, path, schema).where(col("id") > 90)
    assert(back.count() == 10)
    val p = back.queryExecution.executedPlan.toString()
    assert(p.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)"), p.take(600))
  }

  test("alreadyRan guards batch reruns: skip when the date has rows (P14)") {
    import spark.implicits._
    val path = tmp() + "/g"
    // missing sink -> not run yet (reference swallows table-not-found)
    assert(!Writers.alreadyRan(spark, path, "scan_date", "2026-01-01"))
    var runs = 0
    assert(Writers.runIfNotAlready(spark, path, "scan_date", "2026-01-01") {
      runs += 1
      Seq(("2026-01-01", "A", 1.0)).toDF("scan_date", "ticker", "v")
        .write.partitionBy("scan_date").parquet(path)
    })
    assert(runs == 1)
    // same date again -> guard trips, job body must not execute
    assert(!Writers.runIfNotAlready(spark, path, "scan_date", "2026-01-01") {
      runs += 1
    })
    assert(runs == 1)
    // a different date is free to run
    assert(Writers.alreadyRan(spark, path, "scan_date", "2026-01-01"))
    assert(!Writers.alreadyRan(spark, path, "scan_date", "2026-01-02"))
  }

  test("keyedJson writes one doc partition per key; csvReport single file (S15/S16)") {
    import spark.implicits._
    val base = tmp()
    val df = Seq(("2026-03-18_AAPL", 7), ("2026-03-18_NVDA", 8)).toDF("doc_id", "score")
    Writers.keyedJson(df, base + "/docs", "doc_id")
    val dirs = new java.io.File(base + "/docs").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("_doc_id=2026-03-18_AAPL", "_doc_id=2026-03-18_NVDA"))
    Writers.csvReport(df, base + "/report")
    val csvs = new java.io.File(base + "/report").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(csvs.length == 1)
    assert(spark.read.option("header", "true").csv(base + "/report").count() == 2)
  }

  test("ensureTable + archiveSnapshot DDL round-trip (S17/S18)") {
    // clean slate: a prior aborted run may have left catalog/warehouse state
    for (t <- Seq("graft_t17", "graft_t17_archive")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Writers.ensureTable(spark, "graft_t17", "id BIGINT, v DOUBLE")
    Writers.ensureTable(spark, "graft_t17", "id BIGINT, v DOUBLE") // idempotent
    spark.sql("INSERT INTO graft_t17 VALUES (1, 2.5)")
    Writers.archiveSnapshot(spark, "graft_t17", "graft_t17_archive")
    assert(spark.table("graft_t17_archive").count() == 1)
    spark.sql("DROP TABLE graft_t17")
    spark.sql("DROP TABLE graft_t17_archive")
  }

  test("windowed streaming aggregation with watermark (MemoryStream)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = Streams.windowedTypeAgg(df, window_ = "10 minutes", watermark = "20 minutes")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("update").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2026-03-18 10:$m%02d:00")
      mem.addData((ts(1), "view", 1.0), (ts(2), "view", 2.0), (ts(11), "click", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg").collect()
      val viewRow = rows.find(_.getAs[String]("event_type") == "view").get
      assert(viewRow.getAs[Long]("cnt") == 2L)
      assert(viewRow.getAs[Double]("sum_value") == 3.0)
    } finally q.stop()
  }

  test("streaming sessionize matches batch gaps-and-islands (q167 twin, event-time)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapMs = 1800000L
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .where($"user_id" < 6)
      .select($"user_id", unix_millis(col("ts").cast("timestamp")).as("ms"),
        $"value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(e => (e._2, e._1))
    assert(ev.length > 20)
    // the batch query IS the expected value: event-time close + a
    // watermark flush makes the stream emit every session the islands
    // query produces. Compare on (user, start, end, n) — double session
    // sums fold in stream arrival order, which equal-ms ties make
    // nondeterministic across shuffles.
    val expected = graft.queries.TimeSeries
      .q167Sessionize(spark, "/root/testdata/sf0.001")
      .where($"user_id" < 6)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
      .toSet
    assert(expected.size > 10)
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val out = Streams.sessionize(
      mem.toDF().toDF("user_id", "ts", "value"), gapMs)
    val q = out.writeStream.format("memory").queryName("sess_q167")
      .outputMode("append").start()
    try {
      // two micro-batches split by time: sessions spanning the split must
      // continue from state, not restart
      val cut = ev(ev.length / 2)._2
      def toRow(e: (Long, Long, Double)) =
        (e._1, new java.sql.Timestamp(e._2), e._3)
      mem.addData(ev.filter(_._2 <= cut).map(toRow).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(ev.filter(_._2 > cut).map(toRow).toIndexedSeq: _*)
      q.processAllAvailable()
      // watermark-advancing sentinel: flushes every open session through
      // the EventTimeTimeout path (the sentinel's own session stays open)
      mem.addData((9999L, new java.sql.Timestamp(ev.map(_._2).max + 10L * 86400000L), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess_q167").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
        .filter(_._1 != 9999L).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming dedup drops replayed signal keys (P14 incremental)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, String, Int)]
    val df = mem.toDF().toDF("event_time", "ticker", "scan_date", "score")
    val q = Streams.dedupedSignals(df, "event_time").writeStream
      .format("memory").queryName("sig_dedup").outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2026-03-18 09:00:00")
      mem.addData((t, "AAPL", "2026-03-18", 7), (t, "AAPL", "2026-03-18", 7),
        (t, "NVDA", "2026-03-18", 8))
      q.processAllAvailable()
      assert(spark.table("sig_dedup").count() == 2) // replay dropped
    } finally q.stop()
  }

  test("streaming document dedup drops digest replays, keeps text intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("event_time", "doc_id", "text")
    val q = Streams.dedupedDocs(df, "event_time").writeStream
      .format("memory").queryName("doc_dedup").outputMode("append").start()
    try {
      val t = java.sql.Timestamp.valueOf("2026-03-18 09:00:00")
      // same normalized text under different ids/case -> one survivor
      mem.addData((t, 1L, "Spark joins fast"), (t, 2L, "  spark JOINS fast "),
        (t, 3L, "a different document"))
      q.processAllAvailable()
      val out = spark.table("doc_dedup")
      assert(out.count() == 2)
      assert(out.columns.toSeq == Seq("event_time", "doc_id", "text")) // digest dropped
    } finally q.stop()
  }

  test("streaming near-dup suppression: replays dup against first-seen, cross-batch state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")
    val q = Streams.nearDupDocStream(df).writeStream
      .format("memory").queryName("near_dup").outputMode("append").start()
    try {
      def doc(i: Long, seed: String) =
        (i, (1 to 30).map(j => s"$seed${(i * 7 + j * 13) % 97}").mkString(" "))
      // batch 1: 10 distinct docs
      mem.addData((0L until 10L).map(doc(_, "alpha")): _*)
      q.processAllAvailable()
      val b1 = spark.table("near_dup").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
      assert(b1.size == 10 && b1.values.forall(_ == -1L), b1)
      // batch 2: exact replays of 0..4 under new ids + 5 fresh docs.
      // Exact copies have identical sigs -> same bucket -> always caught.
      val replays = (0L until 5L).map(i => (100L + i, doc(i, "alpha")._2))
      mem.addData(replays ++ (10L until 15L).map(doc(_, "beta")): _*)
      q.processAllAvailable()
      val b2 = spark.table("near_dup").collect()
        .map(r => (r.getAs[Long]("doc_id"),
          (r.getAs[Long]("dup_of"), r.getAs[Int]("hamming")))).toMap
      (0L until 5L).foreach(i => assert(b2(100L + i) == (i, 0), b2))
      (10L until 15L).foreach(i => assert(b2(i)._1 == -1L, b2))
    } finally q.stop()
  }

  test("streaming bracket tracker fills once per trade with kernel precedence (X1 live)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.TradeBar]
    val fills = Streams.bracketStream(mem.toDS())
    val q = fills.writeStream.format("memory").queryName("bracket_fills")
      .outputMode("append").start()
    try {
      def bar(id: Long, t: Long, h: Double, l: Double, c: Double) =
        Streams.TradeBar(id, t, h, l, c, entry_ts = 100L, timeout_ts = 10000L,
          target_mult = 1.40, stop_mult = 0.75, slippage = 1.02)
      // batch 1: entries for trades 1 & 2, no exits yet
      mem.addData(bar(1L, 100L, 10.1, 9.9, 10.0), bar(2L, 100L, 10.1, 9.9, 10.0))
      q.processAllAvailable()
      assert(spark.table("bracket_fills").count() == 0)
      // batch 2: trade 1 hits target across batches; trade 2 hits stop
      mem.addData(bar(1L, 200L, 15.0, 10.0, 14.6), bar(2L, 200L, 10.2, 7.0, 7.1))
      q.processAllAvailable()
      val out = spark.table("bracket_fills").collect()
        .map(r => r.getAs[Long]("trade_id") -> r.getAs[String]("exit_reason")).toMap
      assert(out == Map(1L -> "target", 2L -> "stop"))
      // batch 3: more bars after the fill are ignored (done state)
      mem.addData(bar(1L, 300L, 20.0, 5.0, 12.0))
      q.processAllAvailable()
      assert(spark.table("bracket_fills").count() == 2)
    } finally q.stop()
  }

  test("streaming MinHash dedup matches the batch operator across micro-batches (q111 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"text")
    // the q111 fixture: 20 mutated re-submissions under shifted ids
    val batchRows = corpus.where($"doc_id" < 20)
      .select(($"doc_id" + 5000).as("doc_id"),
        concat($"text", lit(" graft incremental batch tail")).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = graft.operators.Dedup
      .minhashNearDupsAgainst(corpus, batchRows.toSeq.toDF("doc_id", "text"),
        "doc_id", "text", shingleN = 3, k = 32, bands = 32, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(expected.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val out = Streams.minhashDedupStream(
      mem.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text",
      shingleN = 3, k = 32, bands = 32, threshold = 0.5)
    val q = out.writeStream.format("memory").queryName("mh_dedup")
      .outputMode("append").start()
    try {
      // two micro-batches: incrementality, not just one-shot parity
      val (first, second) = batchRows.splitAt(10)
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("mh_dedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming decontamination matches batch q89 across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val d = spark.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val test = d.where($"doc_id" < 10)
    // q89's fixture: natural train docs + planted copies of test docs
    val trainRows = d.where($"doc_id" >= 10)
      .unionByName(d.where($"doc_id" < 5)
        .select(($"doc_id" + 2000).as("doc_id"), $"text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = graft.queries.TrainingData.q89Decontaminate(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    val mem = MemoryStream[(Long, String)]
    val out = Streams.decontaminateStream(
      mem.toDF().toDF("doc_id", "text"), test)
    val q = out.writeStream.format("memory").queryName("deconta")
      .outputMode("append").start()
    try {
      val (a, b) = trainRows.splitAt(trainRows.length / 2)
      mem.addData(a.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(b.toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("deconta").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming paragraph dedup matches batch keep-first on corpus-known paragraphs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, "alpha unique\nshared boilerplate para\nbeta unique"),
      (2L, "gamma unique\nanother known para")).toDF("doc_id", "text")
    // arrivals repeat corpus paragraphs + bring novel ones
    val arrivals = Seq(
      (10L, "shared boilerplate para\nnovel ten"),
      (11L, "novel eleven\nanother known para\nshared boilerplate para"),
      (12L, "entirely novel\nall of it"))
    // batch truth: append each arrival to the corpus — corpus occurrences
    // are earlier (smaller ids), so every corpus-known paragraph drops
    val expected = graft.operators.Paragraphs.dedupParagraphs(
        corpus.unionByName(arrivals.toDF("doc_id", "text")), "doc_id", "text")
      .where($"doc_id" >= 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val mem = MemoryStream[(Long, String)]
    val out = Streams.paraDedupStream(mem.toDF().toDF("doc_id", "text"), corpus)
    val q = out.writeStream.format("memory").queryName("paradedup")
      .outputMode("append").start()
    try {
      mem.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("paradedup").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("corrupt files in a scan directory skip cleanly under ignoreCorruptFiles") {
    import spark.implicits._
    // the 100 TB ops reality: one truncated/garbage part file must not
    // kill a million-file scan when the job opts into skipping it
    val dir = Files.createTempDirectory("graft-corrupt").toFile.getAbsolutePath
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "v").write.mode("overwrite").parquet(dir)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-garbage.parquet"),
      "this is not parquet".getBytes("UTF-8"))
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    try {
      spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
      val rows = spark.read.schema("id BIGINT, v STRING").parquet(dir).collect()
      assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("streaming CDC chunk intake stores each chunk digest once across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = Streams.cdcChunkStream(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("cdcstream")
      .outputMode("append").start()
    try {
      val base = (0 until 60).map(i => s"tok${i % 19} w${i % 11}").mkString(" ")
      mem.addData((1L, base))
      q.processAllAvailable()
      val b1 = spark.table("cdcstream").collect()
      val nChunks = graft.operators.Chunker
        .contentDefinedChunks(Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text")
        .count()
      assert(b1.length.toLong == nChunks, "batch 1 stores every chunk once")
      // batch 2: an exact re-crawl (nothing new) + a one-token edit
      val edited = { val t = base.split(" ").toBuffer; t(60) = "EDITED"; t.mkString(" ") }
      mem.addData((2L, base), (3L, edited))
      q.processAllAvailable()
      val b2 = spark.table("cdcstream").collect()
      val newRows = b2.length - b1.length
      // the re-crawl contributes 0; the edit re-sends only its own chunk(s)
      assert(newRows >= 1 && newRows <= 3,
        s"edit should re-store a bounded neighborhood, got $newRows new chunks")
      assert(b2.map(_.getAs[String]("digest")).distinct.length == b2.length,
        "no digest stored twice")
    } finally q.stop()
  }

  test("streaming SemDeDup matches batch drops for corpus-known near-dups") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(11)
    val corpusRows = (0L until 40L).map(i => (i, Seq.fill(8)(rnd.nextGaussian())))
    val corpus = corpusRows.toDF("vec_id", "v")
    val cents = graft.operators.SemDedup.smallestIdCentroids(corpus, "vec_id", "v", 4)
    // twins of corpus vectors 3 and 17 must drop; fresh vectors keep
    val arrivals = Seq(
      (100L, corpusRows(3)._2.map(_ * 1.01 + 0.001)),
      (101L, Seq.fill(8)(rnd.nextGaussian())),
      (102L, corpusRows(17)._2.map(_ * 1.01 + 0.001)),
      (103L, Seq.fill(8)(rnd.nextGaussian())))
    val expected = graft.operators.SemDedup.semDedupWith(
        corpus.unionByName(arrivals.toDF("vec_id", "v")), "vec_id", "v",
        cents, threshold = 0.95)
      .where($"id" >= 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(expected.count(!_._3) == 2, expected.toString) // twins really drop
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = Streams.semDedupStream(
      mem.toDF().toDF("vec_id", "v"), corpus, cents, threshold = 0.95)
    val q = out.writeStream.format("memory").queryName("semdedupstream")
      .outputMode("append").start()
    try {
      mem.addData(arrivals.take(2): _*)
      q.processAllAvailable()
      mem.addData(arrivals.drop(2): _*)
      q.processAllAvailable()
      val got = spark.table("semdedupstream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(got == expected)
    } finally q.stop()
  }

  test("Gopher gate runs on a stream unchanged — the metrics are a pure projection") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clean = (1 to 6).map(_ =>
      "the quick brown fox jumps over and that lazy dog").mkString("\n")
    val mem = MemoryStream[(Long, String)]
    val out = graft.operators.Gopher.metrics(
      mem.toDF().toDF("id", "text"), "text")
      .select($"id", $"gopher_pass")
    val q = out.writeStream.format("memory").queryName("gopherstream")
      .outputMode("append").start()
    try {
      mem.addData((1L, clean), (2L, "too short"))
      q.processAllAvailable()
      val got = spark.table("gopherstream").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == Map(1L -> true, 2L -> false))
    } finally q.stop()
  }

  test("multimodal: feature extraction plumbing is deterministic and null-safe") {
    import spark.implicits._
    val df = Seq(
      (1L, "image/png", "payload-one".getBytes("UTF-8")),
      (2L, "image/png", "payload-one".getBytes("UTF-8")), // identical payload
      (3L, "audio/wav", "different".getBytes("UTF-8")),
      (4L, "video/mp4", null.asInstanceOf[Array[Byte]]))
      .toDF("id", "mime", "payload")
    val out = Multimodal.extractFeatures(df, "payload")
    val rows = out.orderBy("id").collect()
    val f1 = rows(0).getAs[scala.collection.Seq[Float]]("features")
    val f2 = rows(1).getAs[scala.collection.Seq[Float]]("features")
    val f3 = rows(2).getAs[scala.collection.Seq[Float]]("features")
    assert(f1.length == Multimodal.featureDim)
    assert(f1 == f2)              // deterministic
    assert(f1 != f3)              // payload-sensitive
    assert(f1.forall(v => v >= -1.0f && v < 1.0f))
    assert(rows(3).isNullAt(rows(3).fieldIndex("features"))) // null payload
    assert(rows(3).getAs[Long]("n_bytes") == 0L)
    val kinds = Multimodal.withMediaKind(df, "mime").select("id", "media_kind")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(1L -> "image", 2L -> "image", 3L -> "audio", 4L -> "video"))
  }

  test("multimodal: real PNG decode recovers exact closed-form channel sums") {
    import spark.implicits._
    val (w, h) = (16, 12)
    def expected(seed: Long, c: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield java.lang.Math.floorMod(seed * 31 + x * 7 + y * 13 + c * 101, 256)).sum
    val df = Seq(
      (7L, Multimodal.syntheticPng(7L, w, h)),
      (9L, Multimodal.syntheticPng(9L, w, h)),
      (13L, "not an image at all".getBytes("UTF-8")), // corrupt blob
      (14L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val rows = Multimodal.imageStats(df, "payload").orderBy("id").collect()
    Seq(0, 1).foreach { i =>
      val seed = rows(i).getLong(0)
      assert(rows(i).getAs[Int]("width") == w)
      assert(rows(i).getAs[Int]("height") == h)
      assert(rows(i).getAs[Long]("sum_r") == expected(seed, 0))
      assert(rows(i).getAs[Long]("sum_g") == expected(seed, 1))
      assert(rows(i).getAs[Long]("sum_b") == expected(seed, 2))
    }
    // corrupt + null payloads: stats null, rows kept
    Seq(2, 3).foreach { i =>
      assert(rows(i).isNullAt(rows(i).fieldIndex("width")))
      assert(rows(i).isNullAt(rows(i).fieldIndex("sum_r")))
    }
    assert(rows.length == 4)
  }

  test("multimodal: real resize re-encodes decodable payloads at target dims") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticPng(1L, 16, 12)),
      (2L, "corrupt".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.resizeImages(df, "payload", 8, 6)
    val stats = Multimodal.imageStats(out.drop("payload"), "resized")
      .orderBy("id").collect()
    assert(stats(0).getAs[Int]("width") == 8)
    assert(stats(0).getAs[Int]("height") == 6)
    assert(stats(1).isNullAt(stats(1).fieldIndex("width"))) // corrupt -> null
  }

  test("multimodal: real WAV decode recovers exact closed-form sample sums") {
    import spark.implicits._
    val n = 320
    def sample(seed: Long, t: Int): Long =
      java.lang.Math.floorMod(seed * 31 + t * 7L, 65536L) - 32768L
    val df = Seq(
      (5L, Multimodal.syntheticWav(5L, n)),
      (6L, "definitely not audio".getBytes("UTF-8")),
      (7L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val rows = Multimodal.audioStats(df, "payload").orderBy("id").collect()
    val exp = (0 until n).map(sample(5L, _))
    assert(rows(0).getAs[Int]("channels") == 1)
    assert(rows(0).getAs[Int]("sample_rate") == 8000)
    assert(rows(0).getAs[Long]("n_samples") == n.toLong)
    assert(rows(0).getAs[Long]("sum_amp") == exp.sum)
    assert(rows(0).getAs[Long]("sum_abs_amp") == exp.map(math.abs).sum)
    Seq(1, 2).foreach { i =>
      assert(rows(i).isNullAt(rows(i).fieldIndex("channels")))
      assert(rows(i).isNullAt(rows(i).fieldIndex("sum_amp")))
    }
  }

  test("multimodal: stereo WAV reports FRAMES, not total 16-bit values") {
    import spark.implicits._
    val nFrames = 100
    // interleaved stereo: L sample = t, R sample = -t
    val pcm = new Array[Byte](nFrames * 4)
    (0 until nFrames).foreach { t =>
      def put(off: Int, s: Short): Unit = {
        pcm(off) = (s & 0xff).toByte; pcm(off + 1) = ((s >> 8) & 0xff).toByte
      }
      put(4 * t, t.toShort); put(4 * t + 2, (-t).toShort)
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      8000f, 16, 2, 4, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val r = Multimodal.audioStats(df, "payload").collect()(0)
    assert(r.getAs[Int]("channels") == 2)
    assert(r.getAs[Long]("n_samples") == nFrames.toLong) // frames, not 2x
    assert(r.getAs[Long]("sum_amp") == 0L)               // L + R cancel
    assert(r.getAs[Long]("sum_abs_amp") == 2L * (0 until nFrames).sum)
  }

  test("multimodal: real animated-GIF decode emits exact per-frame sums") {
    import spark.implicits._
    def expSum(seed: Long, f: Int, w: Int, h: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield java.lang.Math.floorMod(seed * 31 + f * 17 + x * 7 + y * 13, 8) * 32L).sum
    val df = Seq(
      (1L, Multimodal.syntheticGif(1L, 7, 5, 3)),
      (2L, "not a gif".getBytes("UTF-8")))
      .toDF("id", "payload")
    val rows = Multimodal.videoFrameStats(df, "payload")
      .orderBy("id", "frame_idx").collect()
    assert(rows.length == 4) // 3 frames + 1 corrupt row
    (0 until 3).foreach { f =>
      assert(rows(f).getAs[Int]("frame_idx") == f)
      assert(rows(f).getAs[Int]("width") == 7 && rows(f).getAs[Int]("height") == 5)
      assert(rows(f).getAs[Long]("sum_gray") == expSum(1L, f, 7, 5))
    }
    assert(rows(3).isNullAt(rows(3).fieldIndex("frame_idx"))) // corrupt kept
  }

  test("multimodal: MP4 box walk recovers brand/duration/tracks/codecs " +
      "closed-form; both mvhd versions; corrupt and truncated kept null") {
    import spark.implicits._
    // seed 4: v1 mvhd (4%4==0), 2 tracks (1+4%3), brand mp42, avc1?
    // no — 4%3=1 -> hev1 video + (4+1)%2=1 -> opus audio
    // seed 5: v0 mvhd, 3 tracks, 5%3=2 -> dash brand, vp09 + mp4a + opus
    val full5 = Multimodal.syntheticMp4(5L)
    val df = Seq(
      (4L, Multimodal.syntheticMp4(4L)),
      (5L, full5),
      (6L, "not an mp4 at all........".getBytes("UTF-8")),
      (7L, full5.take(full5.length / 2)))
      .toDF("id", "payload")
    val rows = Multimodal.mp4Probe(df, "payload").orderBy("id").collect()
    val r4 = rows(0)
    assert(r4.getAs[String]("major_brand") == "mp42")
    assert(r4.getAs[Int]("timescale") == 600 * (1 + 4 % 3))
    assert(r4.getAs[Long]("duration_units") == 1000L + (4L * 37) % 100000)
    assert(r4.getAs[Long]("duration_ms") ==
      r4.getAs[Long]("duration_units") * 1000 / r4.getAs[Int]("timescale"))
    assert(r4.getAs[Int]("n_tracks") == 2)
    assert(r4.getAs[String]("codecs") == "hev1,opus")
    val r5 = rows(1)
    assert(r5.getAs[String]("major_brand") == "dash")
    assert(r5.getAs[Int]("n_tracks") == 3)
    assert(r5.getAs[String]("codecs") == "vp09,mp4a,opus")
    // corrupt modes: wrong magic AND truncated-box, both null, rows kept
    Seq(rows(2), rows(3)).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("major_brand")))
      assert(r.isNullAt(r.fieldIndex("n_tracks")))
    }
    assert(rows.length == 4)
  }

  test("multimodal: MP4 mvhd timescale 0 (and >2^31) is a structural " +
      "violation — all-null row KEPT, never a divide-by-zero crash") {
    import spark.implicits._
    // minimal box-grammar-correct file with a pathological mvhd
    def box(t: String, body: Array[Byte]): Array[Byte] = {
      val size = body.length + 8
      Array(((size >> 24) & 0xff).toByte, ((size >> 16) & 0xff).toByte,
        ((size >> 8) & 0xff).toByte, (size & 0xff).toByte) ++
        t.getBytes("ISO-8859-1") ++ body
    }
    def be32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def file(timescale: Long): Array[Byte] =
      box("ftyp", "isom".getBytes("ISO-8859-1") ++ be32(512L) ++
        "isom".getBytes("ISO-8859-1")) ++
        box("moov", box("mvhd", Array[Byte](0, 0, 0, 0) ++ be32(0L) ++
          be32(0L) ++ be32(timescale) ++ be32(1000L)))
    val df = Seq(
      (1L, file(0L)),              // ts = 0: would divide by zero
      (2L, file(0x80000000L)),     // ts = 2^31: wraps negative via toInt
      (3L, file(600L)))            // control: valid
      .toDF("id", "payload")
    val rows = Multimodal.mp4Probe(df, "payload").orderBy("id").collect()
    assert(rows.length == 3)
    Seq(rows(0), rows(1)).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("timescale")))
      assert(r.isNullAt(r.fieldIndex("duration_ms")))
    }
    assert(rows(2).getAs[Int]("timescale") == 600)
    assert(rows(2).getAs[Long]("duration_ms") == 1000L * 1000L / 600L)
  }

  test("multimodal: WARC walk splits concatenated records with exact " +
      "lengths and byte sums; optional headers go null with the record " +
      "kept; any violation refuses the whole payload as one null row") {
    import spark.implicits._
    val full = Multimodal.syntheticWarc(7L) // 4 records (1 + 7%4)
    // hand-built: a record WITHOUT type/uri headers (legal WARC)
    val bare = ("WARC/1.0\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n")
      .getBytes("ISO-8859-1")
    // violations: no Content-Length; separator truncated
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nxy\r\n\r\n")
      .getBytes("ISO-8859-1")
    val df = Seq(
      (1L, full),
      (2L, bare),
      (3L, noLen),
      (4L, full.take(full.length - 3)),
      (5L, "not a warc at all.......".getBytes("UTF-8")))
      .toDF("id", "payload")
    val rows = Multimodal.warcProbe(df, "payload")
      .orderBy("id", "rec_idx").collect()
    val r1 = rows.filter(_.getLong(0) == 1L)
    assert(r1.length == 4)
    r1.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Int]("rec_idx") == i)
      val expType = java.lang.Math.floorMod(7L + i, 3L) match {
        case 0L => "response"; case 1L => "request"; case _ => "metadata"
      }
      assert(r.getAs[String]("warc_type") == expType)
      assert(r.getAs[String]("target_uri") == s"http://ex.test/7/$i")
      val len = 10L + (7L * 7 + i * 13) % 50
      assert(r.getAs[Long]("content_length") == len)
      val sum = (0L until len)
        .map(p => java.lang.Math.floorMod(7L * 31 + i * 17 + p * 7, 256L))
        .sum
      assert(r.getAs[Long]("block_sum") == sum)
    }
    val r2 = rows.filter(_.getLong(0) == 2L)
    assert(r2.length == 1 && r2.head.getAs[Long]("content_length") == 3L)
    assert(r2.head.isNullAt(r2.head.fieldIndex("warc_type"))) // optional
    assert(r2.head.getAs[Long]("block_sum") == 'a' + 'b' + 'c')
    Seq(3L, 4L, 5L).foreach { id =>
      val r = rows.filter(_.getLong(0) == id)
      assert(r.length == 1, s"id $id")
      assert(r.head.isNullAt(r.head.fieldIndex("rec_idx")), s"id $id")
      assert(r.head.isNullAt(r.head.fieldIndex("content_length")))
    }
  }

  test("multimodal: EXIF walk reads make/orientation/dims in BOTH byte " +
      "orders; corrupt and truncated kept null") {
    import spark.implicits._
    val full3 = Multimodal.syntheticJpegExif(3L) // odd seed -> MM
    val df = Seq(
      (2L, Multimodal.syntheticJpegExif(2L)),    // even seed -> II
      (3L, full3),
      (4L, "not a jpeg".getBytes("UTF-8")),
      (5L, full3.take(full3.length / 2)))
      .toDF("id", "payload")
    val rows = Multimodal.exifProbe(df, "payload").orderBy("id").collect()
    val r2 = rows(0)
    assert(r2.getAs[String]("byte_order") == "II")
    assert(r2.getAs[String]("make") == "CAM2")
    assert(r2.getAs[Int]("orientation") == (1 + 2 % 8))
    assert(r2.getAs[Long]("exif_width") == 640L + (2 * 13) % 1024)
    assert(r2.getAs[Long]("exif_height") == 480L + (2 * 17) % 768)
    val r3 = rows(1)
    assert(r3.getAs[String]("byte_order") == "MM")
    assert(r3.getAs[String]("make") == "CAM3")
    assert(r3.getAs[Int]("orientation") == (1 + 3 % 8))
    assert(r3.getAs[Long]("exif_width") == 640L + (3 * 13) % 1024)
    Seq(rows(2), rows(3)).foreach { r =>
      assert(r.isNullAt(r.fieldIndex("byte_order")))
      assert(r.isNullAt(r.fieldIndex("make")))
    }
    assert(rows.length == 4)
  }

  test("multimodal: frame sampling explodes n rows per video") {
    import spark.implicits._
    val df = Seq((1L, "0123456789abcdef".getBytes("UTF-8"))).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "payload", 4).collect()
    assert(frames.length == 4)
    val slices = frames.map(r => new String(r.getAs[Array[Byte]]("frame_payload"), "UTF-8"))
    assert(slices.toSeq == Seq("0123", "4567", "89ab", "cdef"))
  }

  test("streaming transition extraction matches the batch census (q200 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .where($"user_id" < 8)
      .select($"user_id", unix_millis(col("ts").cast("timestamp")).as("ms"),
        $"event_id", $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(e => (e._2, e._3))
    assert(ev.length > 50)
    val expected = graft.operators.Sequences.transitionCensus(
        ev.toSeq.toDF("user_id", "ms", "event_id", "event_type"),
        "user_id", Seq(col("ms"), col("event_id")), "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(expected.values.sum == ev.length - ev.map(_._1).distinct.length)
    val mem = MemoryStream[(Long, Long, Long, String)]
    val out = Streams.transitionStream(
      mem.toDF().toDF("user_id", "ms", "event_id", "event_type"))
    val q = out.writeStream.format("memory").queryName("trans_q200")
      .outputMode("append").start()
    try {
      // two micro-batches split mid-stream: the (prev -> curr) pair that
      // SPANS the split must come from state, not restart
      val cut = ev(ev.length / 2)._2
      mem.addData(ev.filter(_._2 <= cut).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(ev.filter(_._2 > cut).toIndexedSeq: _*)
      q.processAllAvailable()
      val got = spark.table("trans_q200").collect()
        .groupBy(r => (r.getString(1), r.getString(2)))
        .map { case (k, rs) => k -> rs.length.toLong }
      assert(got == expected)
    } finally q.stop()
  }

  test("asOfNearestStream: clickless users emit null matches; backward tie wins") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double, String)]
    val out = Streams.asOfNearestStream(
      mem.toDF().toDF("user_id", "ms", "event_id", "value", "event_type"), 1000L)
    val q = out.writeStream.format("memory").queryName("asof_edge")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, 100L, 10L, 1.0, "error"),            // user 1: no clicks at all
        (2L, 190L, 20L, 9.0, "click"),
        (2L, 200L, 21L, 2.0, "error"),            // equidistant clicks:
        (2L, 210L, 22L, 8.0, "click"))            // backward must win the tie
      q.processAllAvailable()
      mem.addData((99L, 99999L, 0L, 0.0, "click")) // watermark sentinel
      q.processAllAvailable()
      mem.addData((99L, 111111L, 1L, 0.0, "click"))
      q.processAllAvailable()
      val rows = spark.table("asof_edge").collect()
        .filter(_.getLong(0) != 99L)
        .map(r => r.getLong(0) -> (r.isNullAt(4), r.getString(6))).toMap
      assert(rows(1L) == ((true, "backward")))    // null fill, batch's default dir
      assert(rows(2L) == ((false, "backward")))   // tie to the prior click
      val tie = spark.table("asof_edge").collect().find(_.getLong(0) == 2L).get
      assert(tie.getDouble(4) == 9.0 && tie.getLong(5) == 190L)
    } finally q.stop()
  }

  test("streaming nearest as-of matches the batch operator (q208 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // horizon > the fixture's whole 30-day span, so the stream's bounded
    // forward search equals batch's unbounded one and parity is exact
    val horizonMs = 40L * 86400000L
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .where($"user_id" < 8 && $"event_type".isin("error", "click"))
      .select($"user_id", unix_millis(col("ts").cast("timestamp")).as("ms"),
        $"event_id", $"value", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .sortBy(e => (e._2, e._3))
    assert(ev.count(_._5 == "error") > 50)
    val expected = graft.queries.TimeSeries
      .q208AsofNearest(spark, "/root/testdata/sf0.001")
      .where($"user_id" < 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(4), r.getLong(5), r.getString(6)))
      .toMap
    assert(expected.size == ev.count(_._5 == "error"))
    val mem = MemoryStream[(Long, Long, Long, Double, String)]
    val src = mem.toDF().toDF("user_id", "ms", "event_id", "value", "event_type")
    val out = Streams.asOfNearestStream(src, horizonMs)
    val q = out.writeStream.format("memory").queryName("asof_q208")
      .outputMode("append").start()
    try {
      // two micro-batches split mid-stream: errors whose nearest click is
      // on the other side of the split must resolve from state
      val cut = ev(ev.length / 2)._2
      mem.addData(ev.filter(_._2 <= cut).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(ev.filter(_._2 > cut).toIndexedSeq: _*)
      q.processAllAvailable()
      // watermark sentinels past max(ms) + horizon ripen every error;
      // second sentinel triggers the timeout batch after the watermark
      // from the first has been committed
      val far = ev.map(_._2).max + horizonMs + 1000L
      mem.addData((999L, far, 0L, 0.0, "click"))
      q.processAllAvailable()
      mem.addData((999L, far + 1000L, 1L, 0.0, "click"))
      q.processAllAvailable()
      val got = spark.table("asof_q208").collect()
        .filter(_.getLong(0) != 999L)
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getDouble(4), r.getLong(5), r.getString(6)))
        .toMap
      assert(got.size == expected.size, s"${got.size} vs ${expected.size}")
      assert(got == expected)
    } finally q.stop()
  }

  test("streaming HLL registers match the batch sketch at every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val b = 6
    val keys = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_id").collect().map(_.getLong(0))
    val mem = MemoryStream[Long]
    val src = mem.toDF().toDF("event_id")
    val out = Streams.hllRegisterStream(src, "event_id", b)
    val q = out.writeStream.format("memory").queryName("hll_stream")
      .outputMode("complete").start()
    try {
      val chunks = keys.grouped(math.max(1, keys.length / 3)).toSeq
      var seen = Seq.empty[Long]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        val streamed = spark.table("hll_stream").collect()
          .map(r => r.getAs[Long]("reg") -> r.getAs[Long]("max_rank")).toMap
        val batch = graft.operators.Sketches
          .hllRegisters(seen.toDF("event_id"), Nil, "event_id", b)
          .collect().map(r => r.getAs[Long]("reg") -> r.getAs[Long]("max_rank")).toMap
        assert(streamed == batch, s"prefix of ${seen.length}")
        // the state bound the design claims: never more than 2^b registers
        assert(streamed.size <= (1 << b))
      }
    } finally q.stop()
  }

  test("streaming CMS cells match the batch sketch across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (depth, width) = (3, 64)
    val keys = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type").collect().map(_.getString(0))
    val mem = MemoryStream[String]
    val src = mem.toDF().toDF("k")
    val out = Streams.cmsStream(src, "k", depth, width)
    val q = out.writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      val half = keys.length / 2
      mem.addData(keys.take(half).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(keys.drop(half).toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("cms_stream").collect()
        .map(r => (r.getAs[Int]("row"), r.getAs[Long]("cell")) -> r.getAs[Long]("c")).toMap
      val batch = graft.operators.Sketches
        .cmsBuild(keys.toSeq.toDF("k"), "k", depth, width)
        .collect()
        .map(r => (r.getAs[Int]("row"), r.getAs[Long]("cell")) -> r.getAs[Long]("c")).toMap
      assert(streamed == batch)
      assert(streamed.size <= depth * width)
    } finally q.stop()
  }

  test("streaming KMV equals the batch sketch at every prefix, k-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val k = 32
    // event types repeat heavily: distinct-insert semantics get exercised
    val keys = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(concat($"event_type", lit(":"), ($"user_id" % 20).cast("string")))
      .collect().map(_.getString(0))
    val mem = MemoryStream[String]
    val src = mem.toDF().toDF("k")
    val out = Streams.kmvStream(src, "k", k)
    val q = out.writeStream.format("memory").queryName("kmv_stream")
      .outputMode("complete").start()
    try {
      val chunks = keys.grouped(math.max(1, keys.length / 3)).toSeq
      var seen = Seq.empty[String]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        val streamed = spark.table("kmv_stream").collect()
          .map(r => r.getAs[Long]("rank") -> r.getAs[Long]("h")).toMap
        val batch = graft.operators.Sketches
          .kmvSketch(seen.toDF("k").withColumn("g", lit("all")), "g", "k", k)
          .collect().map(r => r.getAs[Long]("rank") -> r.getAs[Long]("h")).toMap
        assert(streamed == batch, s"prefix of ${seen.length}")
        assert(streamed.size <= k) // the fixed-state claim
      }
    } finally q.stop()
  }

  test("streaming skyline equals the batch frontier at every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    val rows = IndexedSeq.tabulate(120)(i =>
      (i.toLong, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
    val mem = MemoryStream[(Long, Double, Double)]
    val src = mem.toDF().toDF("id", "x", "y")
    val dims = Seq(("x", true), ("y", false))
    val out = Streams.skylineStream(src, "id", dims)
    val q = out.writeStream.format("memory").queryName("sky_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(40).toSeq
      var seen = IndexedSeq.empty[(Long, Double, Double)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        val streamed = spark.table("sky_stream").collect()
          .map(_.getLong(0)).toSet
        val batch = graft.operators.Skyline
          .skyline(seen.toDF("id", "x", "y"), "id", dims)
          .collect().map(_.getLong(0)).toSet
        assert(streamed === batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming rolling burst matches the batch RANGE-frame peak at every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", (unix_millis($"ts")).as("ms"))
      .orderBy("ms").collect().map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)]
    val src = mem.toDF().toDF("user_id", "ms")
    val out = Streams.rollingBurstStream(src, windowMs = 60000L)
    val q = out.writeStream.format("memory").queryName("burst_stream")
      .outputMode("update").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(Long, Long)]
      val latest = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        spark.table("burst_stream").collect().foreach { r =>
          latest(r.getLong(0)) = (r.getLong(1), r.getLong(2))
        }
        val batch = graft.operators.Intervals.rollingBurst(
            seen.toDF("user_id", "ms"), "user_id", "ms",
            windowMs = 60000L, topK = Int.MaxValue)
          .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
        assert(latest.toMap === batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming gap census matches batch burstiness at every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", unix_millis($"ts").as("ms"))
      .orderBy("ms").collect().map(r => (r.getLong(0), r.getLong(1)))
    val mem = MemoryStream[(Long, Long)]
    val src = mem.toDF().toDF("user_id", "ms")
    val q = Streams.gapCensusStream(src).writeStream.format("memory")
      .queryName("gap_stream").outputMode("update").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(Long, Long)]
      val latest = scala.collection.mutable.Map.empty[Long, org.apache.spark.sql.Row]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        spark.table("gap_stream").collect().foreach(r => latest(r.getLong(0)) = r)
        val streamed = graft.operators.Intervals.burstinessFromCensus(
            latest.values.toSeq.map(r => (r.getLong(0), r.getLong(1),
              BigDecimal(r.getString(2)), BigDecimal(r.getString(3))))
              .toDF("user_id", "n", "s1", "s2"),
            "user_id", "n", "s1", "s2")
          .where($"n_gaps" > 0)
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
        val batch = graft.operators.Intervals.burstiness(
            seen.toDF("user_id", "ms"), "user_id", "ms")
          .collect().map(r => r.getLong(0) ->
            ((r.getLong(1), r.getDouble(2), Option(r.get(3))))).toMap
        assert(streamed === batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming page-hinkley matches the batch fold at every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .groupBy($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).cast("double").as("x"))
      .orderBy("day", "event_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val mem = MemoryStream[(String, String, Double)]
    val src = mem.toDF().toDF("key", "ord", "x")
    val q = Streams.pageHinkleyStream(src, delta = 1.0, threshold = 25.0)
      .writeStream.format("memory").queryName("ph_stream")
      .outputMode("update").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(String, String, Double)]
      val latest = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk.toIndexedSeq: _*)
        q.processAllAvailable()
        spark.table("ph_stream").collect().foreach(r => latest(r.getString(0)) = r)
        val streamed = latest.map { case (k, r) =>
          k -> ((r.getLong(1), r.getLong(2), Option(r.get(3)),
            r.getDouble(4), r.getDouble(5)))
        }.toMap
        val batch = graft.operators.ChangePoint.pageHinkley(
            seen.toDF("k", "d", "x"), "k", "d", "x", 1.0, 25.0)
          .collect().map(r => r.getString(0) ->
            ((r.getLong(1), r.getLong(2), Option(r.get(3)),
              r.getDouble(4), r.getDouble(5)))).toMap
        assert(streamed === batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming KS census matches batch census and statistic at every prefix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, buckets) = (0L, 49000L, 64)
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select((round($"value" * 100)).cast("long").as("v"),
        (dayofmonth($"ts") > 15).as("r"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val w = (hi - lo) / buckets + 1
    def bucket(v: Long): Long = math.min(buckets - 1L, math.max(0L, (v - lo) / w))
    val mem = MemoryStream[(Long, Boolean)]
    val src = mem.toDF().toDF("v", "r")
    val out = Streams.ksCensusStream(src, "v", col("r"), lo, hi, buckets)
    val q = out.writeStream.format("memory").queryName("ks_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(Long, Boolean)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        val streamed = spark.table("ks_stream").collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
        // census parity: same buckets, same (a, b) counts
        val batchCensus = seen.groupBy(t => bucket(t._1))
          .map { case (b, ts) =>
            b -> (ts.count(!_._2).toLong, ts.count(_._2).toLong) }
        assert(streamed === batchCensus, s"prefix of ${seen.length}")
        // statistic parity: D from the streamed census equals the batch
        // operator run on bucket-quantized values
        val (na, nb) = (seen.count(!_._2).toLong, seen.count(_._2).toLong)
        if (na > 0 && nb > 0) {
          val sortedB = streamed.keys.toSeq.sorted
          var (ca, cb, best) = (0L, 0L, 0L)
          sortedB.foreach { b =>
            ca += streamed(b)._1; cb += streamed(b)._2
            best = math.max(best, math.abs(ca * nb - cb * na))
          }
          val batchD = graft.operators.Divergence.ksTwoSample(
              seen.map(t => (bucket(t._1), t._2)).toDF("v", "r"), "v", col("r"))
            .head()
          assert(batchD.getLong(3) === best, s"prefix of ${seen.length}")
        }
        assert(streamed.size <= buckets)
      }
    } finally q.stop()
  }

  test("streamed KS census also yields W1: parity with batch wasserstein1") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, buckets) = (0L, 49000L, 64)
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select((round($"value" * 100)).cast("long").as("v"),
        (dayofmonth($"ts") > 15).as("r"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val w = (hi - lo) / buckets + 1
    def bucket(v: Long): Long = math.min(buckets - 1L, math.max(0L, (v - lo) / w))
    val mem = MemoryStream[(Long, Boolean)]
    val out = Streams.ksCensusStream(mem.toDF().toDF("v", "r"), "v", col("r"),
      lo, hi, buckets)
    val q = out.writeStream.format("memory").queryName("w1_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(Long, Boolean)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        // W1 derived from the streamed census == batch operator on
        // bucket-quantized values, scaled back to value units by width
        val derived = graft.operators.Divergence.wassersteinFromCensus(
            spark.table("w1_stream"), "b", "ca", "cb", width = w)
          .head().getAs[Double]("w1")
        val batch = graft.operators.Divergence.wasserstein1(
            seen.map(t => (bucket(t._1), t._2)).toDF("v", "r"), "v", col("r"))
          .head().getAs[Double]("w1")
        // op-order differs by one rounding (num*width then divide vs
        // divide then *w), so compare within a few ulps, not bit-equal
        assert(math.abs(derived - batch * w) <= 8 * math.ulp(derived),
          s"prefix of ${seen.length}: derived $derived vs batch*${w} ${batch * w}")
      }
    } finally q.stop()
  }

  test("streamed KS census also yields TV: parity with batch totalVariation " +
      "semantics on the bucketed values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, buckets) = (0L, 49000L, 64)
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select((round($"value" * 100)).cast("long").as("v"),
        (dayofmonth($"ts") > 15).as("r"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val w = (hi - lo) / buckets + 1
    def bucket(v: Long): Long = math.min(buckets - 1L, math.max(0L, (v - lo) / w))
    val mem = MemoryStream[(Long, Boolean)]
    val out = Streams.ksCensusStream(mem.toDF().toDF("v", "r"), "v", col("r"),
      lo, hi, buckets)
    val q = out.writeStream.format("memory").queryName("tv_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(Long, Boolean)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        val row = graft.operators.Divergence.tvFromCensus(
            spark.table("tv_stream"), "b", "ca", "cb").head()
        // reference: exact rational TV over the same bucketed census
        val (na, nb) = (seen.count(!_._2).toLong, seen.count(_._2).toLong)
        if (na == 0L || nb == 0L) {
          assert(row.isNullAt(3), s"empty side -> null tv (${seen.length})")
        } else {
          val byB = seen.groupBy(t => bucket(t._1))
          val num = byB.values.map { ts =>
            val ca = ts.count(!_._2).toLong; val cb = ts.count(_._2).toLong
            math.abs(ca * nb - cb * na)
          }.sum
          val expected = num.toDouble / (2.0 * na * nb)
          assert(row.getAs[Double]("tv") == expected,
            s"prefix of ${seen.length}")
        }
      }
    } finally q.stop()
  }

  test("streaming SPRT census feeds the identical verdict walk as batch " +
      "sprt on every prefix (q331 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", dayofmonth($"ts").cast("long").as("day"),
        ($"value" > 50.0).cast("long").as("hit"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mem = MemoryStream[(String, Long, Long)]
    val out = Streams.sprtCensusStream(
      mem.toDF().toDF("event_type", "day", "hit"), "event_type", "day", "hit")
    val q = out.writeStream.format("memory").queryName("sprt_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(String, Long, Long)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        def key(r: org.apache.spark.sql.Row) =
          (r.getString(0), r.getLong(1)) ->
            ((r.getAs[Long]("cum_n"), r.getAs[Long]("cum_s"),
              r.getAs[Double]("llr"), r.getAs[String]("state")))
        val streamed = graft.operators.Eval.sprtFromCensus(
            spark.table("sprt_stream"), "sc", "p", "n", "s",
            400L, 500L, 50L, 50L)
          .collect().map(key).toMap
        val batch = graft.operators.Eval.sprt(
            seen.toDF("event_type", "day", "hit"),
            "event_type", "day", "hit", 400L, 500L, 50L, 50L)
          .collect().map(key).toMap
        assert(streamed == batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming Kalman census feeds the identical filtered state as " +
      "the batch operator on every prefix (q394 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type", date_format($"ts", "yyyy-MM-dd").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val mem = MemoryStream[(String, String, Long)]
    val out = Streams.kalmanCensusStream(
      mem.toDF().toDF("event_type", "day", "cents"),
      "event_type", "day", "cents")
    val q = out.writeStream.format("memory").queryName("kalman_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(String, String, Long)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
        val streamed = graft.operators.Forecast.kalmanLevelFromCensus(
            spark.table("kalman_stream"), "k", "p", "cents",
            q = 0.05, r = 1.0, p0 = 1.0)
          .collect().map(key).toMap
        val batchCensus = seen.toDF("event_type", "day", "cents")
          .groupBy($"event_type", $"day")
          .agg(org.apache.spark.sql.functions.sum($"cents").as("cents"))
        val batch = graft.operators.Forecast.kalmanLevelFromCensus(
            batchCensus, "event_type", "day", "cents",
            q = 0.05, r = 1.0, p0 = 1.0)
          .collect().map(key).toMap
        assert(streamed == batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming experiment census feeds identical Welch statistics " +
      "as batch welchT on every prefix (q335 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"event_type",
        dayofweek(to_date($"ts")).isin(1, 7).cast("long").as("wk"),
        round($"value" * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val mem = MemoryStream[(String, Long, Long)]
    val out = Streams.experimentCensusStream(
      mem.toDF().toDF("event_type", "wk", "cents"),
      "event_type", "wk", "cents")
    val q = out.writeStream.format("memory").queryName("welch_stream")
      .outputMode("complete").start()
    try {
      val chunks = rows.grouped(math.max(1, rows.length / 3)).toSeq
      var seen = IndexedSeq.empty[(String, Long, Long)]
      chunks.foreach { chunk =>
        seen = seen ++ chunk
        mem.addData(chunk: _*)
        q.processAllAvailable()
        def key(r: org.apache.spark.sql.Row) = r.getString(0) ->
          ((r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
            Option(r.getAs[Double]("t")), Option(r.getAs[Double]("df")),
            Option(r.getAs[Double]("cohen_d"))))
        val streamed = graft.operators.Eval.welchTFromCensus(
            spark.table("welch_stream"), "sc", "n_a", "n_b",
            "sa", "sb", "qa", "qb")
          .collect().map(key).toMap
        val batch = graft.operators.Eval.welchT(
            seen.toDF("event_type", "wk", "cents"),
            "event_type", org.apache.spark.sql.functions.col("wk") === 1L,
            "cents")
          .collect().map(key).toMap
        assert(streamed == batch, s"prefix of ${seen.length}")
      }
    } finally q.stop()
  }

  test("streaming funnel matches batch depth across micro-batches (q278 twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val steps = Seq("view", "click", "purchase")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .where($"user_id" < 8)
      .select($"user_id", unix_millis($"ts".cast("timestamp")).as("ms"),
        $"event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(e => (e._2, e._3))
    assert(ev.length > 20)
    // the batch operator IS the expected value (same events, same
    // (ts, type) fold order — the stream feeds in event-time order)
    val expected = graft.operators.Funnel.depthPerEntity(
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .where($"user_id" < 8),
        "user_id", "ts", "event_type", steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val mem = MemoryStream[(Long, Long, String)]
    val out = graft.streaming.Streams.funnelStream(
      mem.toDF().toDF("user_id", "ms", "event_type"), steps)
    val q = out.writeStream.format("memory").queryName("funnel_twin")
      .outputMode("append").start()
    try {
      // split mid-stream: stages crossing the cut must continue from
      // state, not restart at 0
      val cut = ev(ev.length / 2)._2
      mem.addData(ev.filter(_._2 <= cut).toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(ev.filter(_._2 > cut).toIndexedSeq: _*)
      q.processAllAvailable()
      val advances = spark.table("funnel_twin").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
      // final stage per user = max advance (0 when none emitted)
      val got = expected.keys.map(u =>
        u -> advances.filter(_._1 == u).map(_._2).maxOption.getOrElse(0)).toMap
      assert(got === expected)
      // each advance's step name matches its stage, stages emit in order
      advances.groupBy(_._1).values.foreach { as =>
        val ordered = as.sortBy(_._4).map(_._2)
        assert(ordered.toSeq == (1 to ordered.length).toSeq, as.toSeq.toString)
      }
      advances.foreach { case (_, st, nm, _) => assert(nm == steps(st - 1)) }
    } finally q.stop()
  }
}
