package graft

import org.apache.spark.sql.functions._
import graft.core.Pipe

/** Misc infra coverage (SURVEY.md §2 rows 52–56). */
class PipeSpec extends SparkSpec {
  import spark.implicits._

  test("timed wraps an action and reports wall seconds") {
    val ((cnt, secs)) = Pipe(Seq(1, 2, 3).toDF("v")).timed(_.count())
    assert(cnt == 3L && secs > 0.0)
  }

  test("describe and isEmpty") {
    val p = Pipe(Seq((1, "a")).toDF("k", "v"))
    assert(p.describe.contains("k") && p.describe.contains("v"))
    assert(!p.isEmpty)
    assert(Pipe(spark.emptyDataFrame).isEmpty)
  }

  test("throughCommand pipes partitions through an external binary") {
    val out = Pipe(Seq((1L, "a"), (2L, "b"), (30L, "c")).toDF("n", "s"))
      .throughCommand(
        Seq("awk", "-F", "\t", "{printf \"%d\\t%s\\n\", $1*2, $2}"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n2",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("s",
            org.apache.spark.sql.types.StringType))))
      .df.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((2L, "a"), (4L, "b"), (60L, "c")))
  }

  test("throughCommand reaps its child when the iterator is abandoned " +
      "(limit stops consuming mid-partition)") {
    // limit(1) abandons the partition iterators before they drain; the
    // task-completion listener must destroy the spawned processes — an
    // unreaped child (plus its pipes and blocked writer thread) would
    // linger until the executor JVM exits. The sentinel arg makes OUR
    // children greppable in this JVM's process table.
    val sentinel = s"graft_reap_${System.nanoTime()}"
    val taken = Pipe(spark.range(0, 10000).toDF("v").repartition(4))
      .throughCommand(Seq("sh", "-c", s": $sentinel; cat"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.LongType))))
      .df.limit(1).collect()
    assert(taken.length == 1)
    val deadline = System.currentTimeMillis() + 10000
    def alive(): Int = {
      val p = new ProcessBuilder("sh", "-c",
        s"ps -ef | grep '$sentinel' | grep -v grep | wc -l").start()
      val n = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim.toInt
      p.waitFor(); n
    }
    var n = alive()
    while (n > 0 && System.currentTimeMillis() < deadline) {
      Thread.sleep(200); n = alive()
    }
    assert(n == 0, s"$n external processes still alive after abandonment")
  }

  test("throughCommand surfaces a non-zero exit as a task failure") {
    val e = intercept[org.apache.spark.SparkException] {
      Pipe(Seq(1, 2, 3).toDF("v"))
        .throughCommand(Seq("sh", "-c", "cat > /dev/null; exit 3"),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v",
              org.apache.spark.sql.types.IntegerType))))
        .df.count()
    }
    assert(e.getMessage.contains("exited with 3") ||
      Option(e.getCause).exists(_.getMessage.contains("exited with 3")))
  }

  /** Stand-in R interpreter: accepts Rscript's `-e <program>` calling
    * convention and applies a fixed matrix transform to the stdin TSV
    * (col1*2, col2+1). Exercises ALL of the rscript plumbing — process
    * spawn per partition, stdin feed, TSV parse, double cast — with only
    * the interpreter itself faked (no R runtime in this environment). */
  private def fakeRscript(): String = {
    val p = java.nio.file.Paths.get("target", "fake_rscript.sh").toAbsolutePath
    java.nio.file.Files.writeString(p,
      "#!/bin/sh\nexec awk -F'\\t' '{printf \"%s\\t%s\\n\", $1*2, $2+1}'\n")
    p.toFile.setExecutable(true)
    p.toString
  }

  test("rscript pipes partitions through an R-style interpreter") {
    val out = Pipe(Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0)).toDF("x", "y"))
      .rscript("res <- $_ * 1", outCols = 2, binary = fakeRscript())
      .df.collect().map(r => (r.getDouble(0), r.getDouble(1))).sortBy(_._1)
    assert(out.toSeq == Seq((2.0, 11.0), (4.0, 21.0), (6.0, 31.0)))
  }

  test("Pig RSCRIPT statement routes through the configured interpreter") {
    val csv = java.nio.file.Files.createTempDirectory("graft_rs").toString
    Seq((1.0, 10.0), (2.0, 20.0)).toDF("x", "y")
      .write.mode("overwrite").option("delimiter", ",").csv(csv)
    spark.conf.set("graft.rscript.binary", fakeRscript())
    try {
      val res = graft.piglatin.PigScript.run(spark,
        s"""a = LOAD '$csv' USING PigStorage(',') AS (x:double, y:double);
           |b = RSCRIPT a USING 'res <- dbscan($$_, eps=0.42)';
           |""".stripMargin).relation("b")
      val rows = res.collect().map(r => (r.getDouble(0), r.getDouble(1)))
        .sortBy(_._1)
      assert(rows.toSeq == Seq((2.0, 11.0), (4.0, 21.0)))
    } finally spark.conf.unset("graft.rscript.binary")
  }

  test("split branches cover the predicate space") {
    val branches = Pipe(Seq(1, 2, 3, 4).toDF("v"))
      .splitInto(col("v") <= 2, col("v") > 2)
    assert(branches.map(_.df.count()).sum == 4)
  }

  test("materialize round-trips through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mat").toString
    val p = Pipe(Seq((1L, "x")).toDF("id", "s")).materialize(s"$dir/m")
    assert(p.df.collect().head.getLong(0) == 1L)
  }

  test("skewed join matches plain join results") {
    val big = Pipe((1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, i))
      .toDF("k", "v"))                                 // key 1 is 90% hot
    val dim = Pipe(Seq((1L, "hot"), (950L, "cold")).toDF("dk", "name"))
    val plain = big.joinOn(dim, col("k") === col("dk")).df
      .select("k", "v", "name").collect().toSet
    val salted = big.joinSkewed(dim, "k", "dk", saltBuckets = 8).df
      .select("k", "v", "name").collect().toSet
    assert(salted == plain)
    assert(salted.size == 901)
  }

  test("bucketed tables join without an exchange") {
    // (warehouse dir is a static conf — tables land in ./spark-warehouse;
    // drop catalog entries AND leftover dirs from prior JVMs)
    Seq("graft_buck_a", "graft_buck_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = java.nio.file.Paths.get(s"spark-warehouse/$t")
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    val a = Pipe(Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "va"))
    val b = Pipe(Seq((1L, 10), (2L, 20)).toDF("k", "vb"))
    a.storeBucketed("graft_buck_a", 4, Seq("k"))
    b.storeBucketed("graft_buck_b", 4, Seq("k"))
    // disable auto-broadcast so the plan would otherwise need a shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_buck_a")
        .join(spark.table("graft_buck_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected exchange in:\n$plan")
      assert(joined.count() == 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("materializer reuses snapshots across identical dataflows") {
    import graft.core.Materializer
    val base = java.nio.file.Files.createTempDirectory("graft_mm").toString
    def flow = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_totalprice") > 100000).select("o_orderkey", "o_totalprice")
    val (first, reused1) = Materializer.materialize(flow, base)
    val (second, reused2) = Materializer.materialize(flow, base) // rebuilt plan
    assert(!reused1 && reused2)             // second run hits the snapshot
    assert(first.count() == second.count())
    // a DIFFERENT dataflow gets a different key
    val other = spark.read.parquet(s"$sfDir/orders.parquet")
      .where(col("o_totalprice") > 200000).select("o_orderkey", "o_totalprice")
    assert(Materializer.planKey(other) != Materializer.planKey(flow))
  }

  test("rankBy keeps rows with null ranking keys") {
    val df = Seq(Some("b"), None, Some("a")).toDF("k")
    val out = Pipe(df).rankBy(col("k"), "rnk").df
    assert(out.count() == 3)            // the null-keyed row survives
  }

  test("rankBy on a near-unique key: correct ranks, no forced broadcast") {
    // a near-unique ranking key makes the distinct-key table ≈ the whole
    // relation: the old broadcast-ranks idiom would ship it to the
    // driver (OOM at scale). The distributed prefix-rank path must not
    // plan a BroadcastExchange when the key table exceeds the threshold.
    val df = spark.range(0, 5000)
      .selectExpr("id", "CAST(id * 7 % 4999 AS LONG) AS k") // 4999 distinct
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024") // 1 KB
      val ranked = Pipe(df).rankBy(col("k"), "rnk").df
      val plan = ranked.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange"),
        s"rank table must not broadcast for near-unique keys:\n${plan.take(2000)}")
      // ties share a rank; rank = 1 + #rows with strictly-smaller key
      val got = ranked.select("k", "rnk").as[(Long, Long)].collect().toMap
      assert(got(0L) == 1L)
      assert(got(4998L) == 5000L)     // k=0 is duplicated, shifting all later ranks by 1
      val expected3 = 1L + df.where(col("k") < 3).count()
      assert(got(3L) == expected3)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("zipWithIndex matches orderBy ground truth without an RDD round-trip") {
    val df = spark.range(0, 1000).selectExpr("id", "id * 13 % 997 AS v")
    val out = Pipe(df).zipWithIndex(Seq(col("v"), col("id")), "idx").df
    val got = out.orderBy("idx").select("v").as[Long].collect()
    val expected = df.orderBy(col("v"), col("id")).select("v").as[Long].collect()
    assert(got.sameElements(expected))
    assert(out.select("idx").as[Long].collect().sorted.sameElements(0L until 1000L))
  }

  test("connected components with a reliable checkpoint dir") {
    import graft.dedup.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(cc(4L) == 1L && cc(3L) == 1L && cc(11L) == 10L)
    // the reliable checkpoint actually wrote state to the dir
    assert(new java.io.File(dir).listFiles != null &&
      new java.io.File(dir).listFiles.nonEmpty)
  }

  test("delay passes a sample through after per-partition waits") {
    val df = spark.range(0, 100).toDF("id")
    val all = Pipe(df).delay(sampleFactor = 1.0, waitMs = 1).df.count()
    assert(all == 100)
    val some = Pipe(df).delay(sampleFactor = 0.2, waitMs = 0).df.count()
    assert(some > 0 && some < 100)
  }

  test("toDot exports the optimized plan as a DOT digraph") {
    val dot = Pipe(spark.range(0, 10).toDF("id").where(col("id") > 3)).toDot
    assert(dot.startsWith("digraph plan {"))
    assert(dot.contains("->") || dot.count(_ == '\n') >= 3) // ≥1 edge or nodes
  }

  test("jdbc LOAD/STORE round-trip through embedded Derby (JdbcStorage)") {
    val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    val opts = Map(
      "url" -> s"jdbc:derby:$dbDir/db;create=true",
      "dbtable" -> "t_sup",
      "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val src = spark.read.parquet(s"$sfDir/supplier.parquet")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    Pipe(src).store("", format = "jdbc", options = opts)
    val back = Pipe.load(spark, "", format = "jdbc", options = opts).df
    assert(back.count() == src.count())
    assert(back.select(sum("s_suppkey")).head().getLong(0) ==
      src.select(sum("s_suppkey")).head().getLong(0))
  }

  test("binary columnar LOAD/STORE round-trip via ORC (BinStorage analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val src = spark.read.parquet(s"$sfDir/nation.parquet")
    Pipe(src).store(s"$dir/nation_orc", format = "orc")
    val back = Pipe.load(spark, s"$dir/nation_orc", format = "orc").df
    assert(back.orderBy("n_nationkey").collect()
      .sameElements(src.orderBy("n_nationkey").collect()))
  }

  test("partitionBy co-locates keys") {
    val p = Pipe(Seq((1, "a"), (2, "b"), (1, "c")).toDF("k", "v"))
      .partitionBy(4, col("k"))
    assert(p.df.rdd.getNumPartitions == 4)
  }

  test("stratified hash sample applies per-stratum rates deterministically") {
    val df = (1 to 2000).map(i => (i.toLong, if (i % 2 == 0) "big" else "rare"))
      .toDF("id", "grp")
    val out = Pipe(df).stratifiedSampleByHash(col("grp"),
      Map("rare" -> 100), defaultPercent = 10, col("id")).df
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("rare") == 1000L) // 100% of the rare stratum survives
    assert(byGrp("big") > 50L && byGrp("big") < 200L) // ~10% of 1000
    // deterministic: same rows on a different partitioning
    val again = Pipe(df.repartition(13)).stratifiedSampleByHash(col("grp"),
      Map("rare" -> 100), defaultPercent = 10, col("id")).df
      .select("id").as[Long].collect().toSet
    assert(again == out.select("id").as[Long].collect().toSet)
  }

  test("quota sample caps every group at k, deterministically across " +
      "partitionings, and stays stable under corpus growth") {
    val df = (1 to 900).map(i =>
      (i.toLong, Seq("tiny", "mid", "big")(i % 10 min 2))).toDF("id", "grp")
    // big ≈ 720 rows, mid ≈ 90, tiny = 90 — cap at 100: big truncates to
    // exactly 100, the others keep everything
    val out = Pipe(df).quotaSampleByHash(col("grp"), 100, col("id")).df
    val byGrp = out.groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(byGrp("big") == 100L)
    assert(byGrp.filter(_._1 != "big").values.forall(_ <= 100L))
    assert(out.count() == byGrp.values.sum)
    val ids = out.select("id").as[Long].collect().toSet
    // identical choice on a hostile partitioning
    val again = Pipe(df.repartition(17)).quotaSampleByHash(
      col("grp"), 100, col("id")).df.select("id").as[Long].collect().toSet
    assert(again == ids)
    // growth stability: adding rows never RESELECTS the survivors — a
    // previously kept row only leaves if a new row hashes ahead of it,
    // so the grown selection's top-k prefix is a subset relation, not a
    // reshuffle. Verify: kept rows of the grown corpus that existed
    // before are exactly the old survivors minus displaced ones.
    val grown = df.union((901 to 1000).map(i =>
      (i.toLong, "big")).toDF("id", "grp"))
    val keptOld = Pipe(grown).quotaSampleByHash(col("grp"), 100, col("id"))
      .df.select("id").as[Long].collect().toSet.filter(_ <= 900L)
    assert(keptOld.subsetOf(ids))
  }

  test("skyline keeps exactly the Pareto-optimal set, any partitioning") {
    // (1,5)..(5,1) form the Pareto front; the rest are dominated
    val rows = Seq((1, 1.0, 5.0), (2, 2.0, 4.0), (3, 3.0, 3.0),
      (4, 4.0, 2.0), (5, 5.0, 1.0), // front
      (6, 5.0, 5.0), (7, 2.0, 4.5), (8, 3.0, 3.0001))
    val df = rows.toDF("id", "price", "size")
    Seq(df, df.repartition(7)).foreach { in =>
      val sky = Pipe(in).skyline(Seq("price", "size")).df
      assert(sky.select("id").as[Int].collect().toSet == Set(1, 2, 3, 4, 5))
      // the merge must sit behind a shuffle so the local phase stays wide
      // (coalesce(1) would fuse the whole scan into one task)
      assert(sky.queryExecution.executedPlan.toString.contains("Exchange"),
        "skyline final pass must be separated from the local pass by an exchange")
    }
  }

  test("skyline maximize flips a dimension; null and NaN dims never survive") {
    // minimize price, MAXIMIZE quality
    val df = Seq(
      (1, 1.0, java.lang.Double.valueOf(1.0)),
      (2, 2.0, java.lang.Double.valueOf(9.0)),
      (3, 3.0, java.lang.Double.valueOf(5.0)), // dominated by 2
      (4, 0.5, null.asInstanceOf[java.lang.Double]), // null dim → excluded
      (5, 0.1, java.lang.Double.valueOf(Double.NaN))) // NaN dim → excluded
      .toDF("id", "price", "quality")
    val got = Pipe(df).skyline(Seq("price", "quality"), maximize = Set("quality"))
      .df.select("id").as[Int].collect().toSet
    assert(got == Set(1, 2))
  }

  test("skyline ties: equal points do not dominate each other, both survive") {
    val df = Seq((1, 2.0, 2.0), (2, 2.0, 2.0), (3, 2.0, 3.0)).toDF("id", "a", "b")
    val got = Pipe(df).skyline(Seq("a", "b")).df.select("id").as[Int].collect().toSet
    assert(got == Set(1, 2))
  }
}
