package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Bar, Foo, SparkSpec}
import graft.operators.Records._

class RecordOpsSpec extends SparkSpec {
  import spark.implicits._

  test("branch routes every record to exactly one port") {
    val df = Seq(1, 2, 3, 4, 5).toDF("n")
    val ports = df.branch(when($"n" % 2 === 0, "even").otherwise("odd"))
    assert(ports.port("even").as[Int].collect().sorted === Seq(2, 4))
    assert(ports.port("odd").as[Int].collect().sorted === Seq(1, 3, 5))
    assert(ports.all.count() === 5)
  }

  test("extract multi-emit across partition counts") {
    for (parts <- Seq(1, 4, 8)) {
      val ds = spark.range(10).map(_.toInt).repartition(parts)
      val out = ds.extract(n => Seq(n, n + 100)).collect().sorted
      assert(out === ((0 until 10) ++ (100 until 110)).toArray)
    }
  }

  test("restructure keeps same-named, nulls missing, casts widened") {
    val df = Seq((1, "a")).toDF("id", "name")
    val out = df.restructure(StructType(Seq(
      StructField("id", LongType), StructField("extra", StringType))))
    assert(out.schema.map(f => (f.name, f.dataType)) ===
      Seq(("id", LongType), ("extra", StringType)))
    assert(out.collect().head.isNullAt(1))
  }

  test("convert emits converted and passes original through") {
    val df = Seq((1, "x")).toDF("id", "name")
    val (conv, orig) = df.convert(upper($"name").as("u"))
    assert(conv.columns === Array("u"))
    assert(orig.columns === Array("id", "name"))
  }
}

class GroupOpsSpec extends SparkSpec {
  import spark.implicits._

  private def bars = Seq(
    Bar(Some(1), Some(10), 5), Bar(Some(2), Some(10), 7),
    Bar(Some(3), Some(20), 1), Bar(Some(4), None, 9), Bar(Some(5), None, 2)).toDS()

  test("cogroup groups null keys together (reference null==null semantics)") {
    val foos = Seq(Foo(Some(10), "a"), Foo(None, "nullfoo"), Foo(Some(30), "lonely")).toDS()
    val out = Groups.cogroup(foos, bars)(_.id, _.fooId) { (k, fs, bs) =>
      val nb = bs.size
      fs.map(f => (f.name, k, nb))
    }.collect().toSet
    // null master key meets the two null-key bars
    assert(out === Set(("a", Some(10), 2), ("nullfoo", None, 2), ("lonely", Some(30), 0)))
  }

  test("cogroupN slices a 3-input union into per-input sorted iterators") {
    import org.apache.spark.sql.Row
    for (parts <- Seq(1, 4)) {
      val a = Seq((1, "n1"), (2, "n2"), (4, "n4")).toDF("k", "name").repartition(parts)
      val b = Seq((1, 30), (1, 10), (2, 5)).toDF("k", "sv").repartition(parts)
      val c = Seq((1, 7L), (3, 9L), (3, 2L)).toDF("k", "cv").repartition(parts)
      val out = Groups.cogroupN(
        Seq(a, b, c), keys = Seq("k"),
        orders = Seq(Nil, Seq("sv"), Seq("cv")),
        outSchema = StructType(Seq(
          StructField("k", IntegerType), StructField("name", StringType),
          StructField("svs", StringType), StructField("cvs", StringType)))) { (key, its) =>
        Iterator.single(Row(
          key.getInt(0),
          its(0).map(_.getString(1)).mkString(","),
          its(1).map(_.getInt(1)).mkString(","),   // asserts sv sort order
          its(2).map(_.getLong(1)).mkString(","))) // asserts cv sort order
      }.collect().map(r => r.getInt(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
      assert(out === Map(
        1 -> (("n1", "10,30", "7")),
        2 -> (("n2", "5", "")),
        3 -> (("", "", "2,9")),   // key only in the streamed input
        4 -> (("n4", "", ""))))   // key only in a buffered input
    }
  }

  test("groupSort delivers groups in secondary-sort order across partitions") {
    for (parts <- Seq(1, 4)) {
      val ds = bars.repartition(parts)
      val firsts = Groups.groupSort(ds)(_.fooId)($"v".desc) { (k, it) =>
        Iterator.single(k -> it.next().v)
      }.collect().toMap
      assert(firsts === Map(Some(10) -> 7, Some(20) -> 1, None -> 9))
    }
  }

  test("fold reduces per key with map-side partials") {
    val folded = Groups.fold(bars)(_.fooId)((a, b) => a.copy(v = a.v + b.v))
      .map { case (k, b) => k -> b.v }.collect().toMap
    assert(folded === Map(Some(10) -> 12, Some(20) -> 1, None -> 11))
  }

  test("summarize strictNulls raises on null aggregation input") {
    val df = Seq((Some(1), "k"), (None, "k")).toDF("v", "key")
    val strict = Groups.summarize(df, Seq("key"),
      Seq(Groups.SummarizeSpec(Groups.SummarizeOp.Sum, "v", "s")), strictNulls = true)
    val e = intercept[Exception](strict.collect())
    assert(e.getMessage.contains("null value in aggregation input") ||
      e.getCause != null && e.getCause.getMessage.contains("null value"))
    // non-strict skips nulls, SQL-style
    val lax = Groups.summarize(df, Seq("key"),
      Seq(Groups.SummarizeSpec(Groups.SummarizeOp.Sum, "v", "s")))
    assert(lax.select("s").as[Long].collect() === Array(1L))
  }

  test("summarize widens integral sums to long") {
    val df = Seq((1.toShort, "k"), (2.toShort, "k")).toDF("v", "key")
    val out = Groups.summarize(df, Seq("key"),
      Seq(Groups.SummarizeSpec(Groups.SummarizeOp.Sum, "v", "s")))
    assert(out.schema("s").dataType === LongType)
  }
}

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private def masters = Seq(Foo(Some(10), "m1"), Foo(Some(10), "m2"), Foo(Some(20), "m3")).toDF()
  private def txs = Seq(Bar(Some(1), Some(10), 0), Bar(Some(2), Some(20), 0),
    Bar(Some(3), Some(99), 0), Bar(Some(4), None, 0)).toDF()
      // align key name with master (and keep column names unique)
      .select(col("id").as("txid"), col("fooId").as("id"), col("v"))

  test("masterJoin: first-match by explicit order; missed port keeps tx schema") {
    val ports = Joins.masterJoin(
      tx = txs, master = masters, keys = Seq("id"),
      output = Seq(col("id"), col("v"), col("name")),
      masterOrder = Seq(col("name").asc))
    val found = ports.found.select("id", "name").as[(Int, String)].collect().toSet
    assert(found === Set((10, "m1"), (20, "m3"))) // m1 < m2 -> first match
    // missed: unmatched key 99; null tx key never matches under === semantics
    assert(ports.missed.columns === txs.columns)
    assert(ports.missed.select("id").as[Option[Int]].collect().toSet === Set(Some(99), None))
  }

  test("masterJoin nullSafeKeys matches null==null like the reference") {
    val m = Seq(Foo(None, "nullmaster"), Foo(Some(20), "m")).toDF()
    val ports = Joins.masterJoin(
      tx = txs, master = m, keys = Seq("id"),
      output = Seq(col("v"), col("name")), nullSafeKeys = true)
    assert(ports.found.select("name").as[String].collect().toSet === Set("nullmaster", "m"))
  }

  test("masterCheck found/missed partition the tx set") {
    val ports = Joins.masterCheck(txs, masters, Seq("id"))
    assert(ports.found.count() + ports.missed.count() === txs.count())
  }

  test("masterJoinSelect applies the user hook per transaction") {
    val ms = Seq(Foo(Some(10), "a"), Foo(Some(10), "bb"), Foo(Some(20), "c")).toDS()
    val ts = Seq(Bar(Some(1), Some(10), 1), Bar(Some(2), Some(10), 5), Bar(Some(3), Some(30), 1)).toDS()
    val (found, missed) = Joins.masterJoinSelect(ms, ts)(_.id, _.fooId)(
      // hook: only masters with name length == tx.v qualify
      (cands, t) => cands.find(_.name.length == t.v.min(2)))(
      (m, t) => (t.id.get, m.name))
    assert(found.collect().toSet === Set((1, "a"), (2, "bb")))
    assert(missed.collect().map(_.id.get).toSet === Set(3))
  }

  test("masterJoinSelectBroadcast matches the shuffled selection path") {
    val ms = Seq(Foo(Some(10), "a"), Foo(Some(10), "bb"), Foo(Some(20), "c")).toDS()
    val ts = Seq(Bar(Some(1), Some(10), 1), Bar(Some(2), Some(10), 5), Bar(Some(3), Some(30), 1)).toDS()
    val (found, missed) = Joins.masterJoinSelectBroadcast(ms, ts)(_.id, _.fooId)(
      (cands, t) => cands.find(_.name.length == t.v.min(2)))(
      (m, t) => (t.id.get, m.name))
    assert(found.collect().toSet === Set((1, "a"), (2, "bb")))
    assert(missed.collect().map(_.id.get).toSet === Set(3))
    // zero-shuffle contract: no Exchange anywhere in the found plan
    assert(!found.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("masterJoinSelectBy matches the typed hook path and stays relational") {
    val ms = Seq(Foo(Some(10), "a"), Foo(Some(10), "bb"), Foo(Some(20), "c")).toDS()
    val ts = Seq(Bar(Some(1), Some(10), 1), Bar(Some(2), Some(10), 5), Bar(Some(3), Some(30), 1)).toDS()
    // same selection as the hook test: masters with name length == min(tx.v, 2),
    // first by name — predicate references BOTH sides, so the pre-join
    // first-match fast path cannot express it
    val ports = Joins.masterJoinSelectBy(
      tx = ts.toDF(), master = ms.toDF().withColumnRenamed("id", "fooId"),
      keys = Seq("fooId"), txId = Seq("id"),
      preference = Seq(col("name")),
      output = Seq(col("id").as("txid"), col("name")),
      predicate = length(col("name")) === least(col("v"), lit(2)))
    assert(ports.found.as[(Int, String)].collect().toSet === Set((1, "a"), (2, "bb")))
    assert(ports.missed.select("id").as[Int].collect().toSet === Set(3))
    // the point of this path: no typed serde anywhere in the plan
    val plan = ports.found.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapGroups"), plan)
  }

  test("groupView fails fast above maxRows instead of collecting unbounded") {
    val big = spark.range(100).map(i => Foo(Some(i.toInt), s"n$i"))
    val e = intercept[IllegalArgumentException] {
      Views.groupView(big, maxRows = 10)(_.id)
    }
    assert(e.getMessage.contains("maxRows"))
    assert(e.getMessage.contains("join"))
    // under the bound it still builds
    assert(Views.groupView(big, maxRows = 100)(_.id).find(Some(3)).head.name === "n3")
  }

  test("broadcast master joins produce BroadcastHashJoin plans") {
    val ports = Joins.masterJoin(
      tx = txs, master = masters, keys = Seq("id"),
      output = Seq(col("v"), col("name")), broadcastMaster = true)
    val plan = ports.found.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}

class SamplingSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.operators.Sampling

  test("deterministicSplit hits the requested proportions and is stable") {
    val ids = (0L until 10000L).toDF("id")
    val split = Sampling.deterministicSplit(ids, col("id"),
      Seq("train" -> 80, "valid" -> 10, "test" -> 10))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum === 10000L)
    assert(math.abs(counts("train") - 8000L) < 200, counts.toString) // hash uniformity
    assert(math.abs(counts("valid") - 1000L) < 150, counts.toString)
    // stability: identical assignment on re-run (no RNG state)
    val again = Sampling.deterministicSplit(ids, col("id"),
      Seq("train" -> 80, "valid" -> 10, "test" -> 10))
    assert(split.except(again).count() === 0L)
  }

  test("hashBucket handles 64-bit and negative ids without overflow (ANSI-safe)") {
    // snowflake-scale and negative ids: the naive id*2654435761 product
    // overflows Long and throws under ANSI mode; the split multiply must not
    val ids = Seq(0L, 1L, 3500000000L, 912345678901234567L, Long.MaxValue, -5L, Long.MinValue)
      .toDF("id")
    val buckets = ids.select(Sampling.hashBucket(col("id"), 100).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 100), buckets.mkString(","))
    // deterministic
    assert(buckets === ids.select(Sampling.hashBucket(col("id"), 100).as("b"))
      .as[Long].collect())
  }

  test("temperatureMix allocates by count^(1/T), flattens as T grows, deterministic") {
    // 900 'big' + 100 'small' records
    val df = ((0L until 900L).map(("big", _)) ++ (1000L until 1100L).map(("small", _)))
      .toDF("src", "id")
    def mix(t: Double) = Sampling.temperatureMix(df, "src", col("id"), budget = 200L, t)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    val t1 = mix(1.0) // natural: ~180/20
    assert(t1.values.sum <= 200 && math.abs(t1("big") - 180L) <= 2, t1.toString)
    val t2 = mix(2.0) // sqrt-flattened: 3:1 instead of 9:1
    assert(t2("small") > t1("small") && math.abs(t2("big") - 150L) <= 2, t2.toString)
    // a starved source is capped at its population, never oversampled:
    // budget 400 at ~uniform T requests ~200 from small, which has 100
    val capped = Sampling.temperatureMix(df, "src", col("id"), budget = 400L, 1000.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(capped("small") === 100L, capped.toString)
    // deterministic row SET, not just sizes
    val a = Sampling.temperatureMix(df, "src", col("id"), 200L, 2.0).collect().toSet
    val b = Sampling.temperatureMix(df, "src", col("id"), 200L, 2.0).collect().toSet
    assert(a === b)
  }

  test("tokenBudgetMix: whole docs until the allocation, never past it") {
    // 'big': 90 docs × 100 tokens (9000); 'small': 100 docs × 10 tokens (1000)
    val df = ((0L until 90L).map(i => ("big", i, 100L)) ++
      (1000L until 1100L).map(i => ("small", i, 10L))).toDF("src", "id", "tok")
    val mixed = Sampling.tokenBudgetMix(df, "src", "id", col("tok"),
      budgetTokens = 2000L, temperature = 2.0)
    val toks = mixed.groupBy("src").agg(sum("tok").as("t")).as[(String, Long)]
      .collect().toMap
    // T=2 weights √9000 : √1000 = 3 : 1 → allocations ~1500 / ~500 tokens
    // (integer weight quantization can shave one unit off an allocation);
    // whole-document taking undershoots by < one document, never overshoots
    assert(toks("big") <= 1500L && toks("big") >= 1400L, toks.toString)
    assert(toks("small") <= 500L && toks("small") >= 480L, toks.toString)
    // a starved source contributes everything it has
    val capped = Sampling.tokenBudgetMix(df, "src", "id", col("tok"),
      budgetTokens = 100000L, temperature = 2.0)
      .groupBy("src").agg(sum("tok").as("t")).as[(String, Long)].collect().toMap
    assert(capped("small") === 1000L, capped.toString)
    // deterministic SET
    val a = mixed.collect().toSet
    val b = Sampling.tokenBudgetMix(df, "src", "id", col("tok"), 2000L, 2.0)
      .collect().toSet
    assert(a === b)
  }

  test("capPerGroup keeps at most k per group, all of smaller groups") {
    val df = (Seq.tabulate(100)(i => ("big", i.toLong)) ++
      Seq.tabulate(3)(i => ("small", 1000L + i))).toDF("g", "id")
    val capped = Sampling.capPerGroup(df, Seq("g"), k = 10, id = col("id"))
    val byG = capped.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(byG("big") === 10L)
    assert(byG("small") === 3L)
    // deterministic choice: same 10 ids every time
    val again = Sampling.capPerGroup(df, Seq("g"), k = 10, id = col("id"))
    assert(capped.except(again).count() === 0L)
  }

  test("stratifiedSample approximates per-stratum fractions, drops unlisted strata") {
    val df = (Seq.tabulate(2000)(i => ("en", i.toLong)) ++
      Seq.tabulate(2000)(i => ("de", 10000L + i)) ++
      Seq.tabulate(100)(i => ("xx", 20000L + i))).toDF("lang", "id")
    val s = Sampling.stratifiedSample(df, "lang", Map("en" -> 0.5, "de" -> 0.1), seed = 7L)
    val byLang = s.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(byLang("en") - 1000L) < 150, byLang.toString)
    assert(math.abs(byLang("de") - 200L) < 100, byLang.toString)
    assert(!byLang.contains("xx"))
  }
}
