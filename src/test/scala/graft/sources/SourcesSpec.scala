package graft.sources

import org.apache.hadoop.io.{LongWritable, Text}
import org.apache.hadoop.mapreduce.lib.input.SequenceFileInputFormat
import org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

class SourcesSpec extends graft.SparkSpec {

  test("hadoop source round-trips a SequenceFile with per-record conversion") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seq").toString + "/data"
    val n = 1000
    spark.sparkContext.parallelize(0 until n, 4)
      .map(i => (new LongWritable(i.toLong), new Text(s"v$i")))
      .saveAsNewAPIHadoopFile(dir, classOf[LongWritable], classOf[Text],
        classOf[SequenceFileOutputFormat[LongWritable, Text]])
    val df = Sources.hadoop(spark, dir,
      classOf[SequenceFileInputFormat[LongWritable, Text]],
      classOf[LongWritable], classOf[Text],
      StructType(Seq(StructField("k", LongType), StructField("v", StringType))))(
      // copy out of the reusable Writables immediately (the contract)
      (k, v) => Row(k.get(), v.toString))
    assert(df.count() === n.toLong)
    // record identity survives the format boundary (reused-Writable bugs
    // show up as every row carrying the split's last record)
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === (0 until n).map(i => i.toLong -> s"v$i").toMap)
  }

  test("hadoop source applies per-source configuration overlays") {
    // per-source conf must not leak into the session's Hadoop conf
    val dir = java.nio.file.Files.createTempDirectory("graft-seq2").toString + "/data"
    // Writables are not java-serializable: construct them executor-side
    spark.sparkContext.parallelize(Seq(1L), 1)
      .map(i => (new LongWritable(i), new Text("x")))
      .saveAsNewAPIHadoopFile(dir, classOf[LongWritable], classOf[Text],
        classOf[SequenceFileOutputFormat[LongWritable, Text]])
    val df = Sources.hadoop(spark, dir,
      classOf[SequenceFileInputFormat[LongWritable, Text]],
      classOf[LongWritable], classOf[Text],
      StructType(Seq(StructField("k", LongType))),
      conf = Map("graft.test.marker" -> "set"))((k, _) => Row(k.get()))
    assert(df.count() === 1L)
    assert(spark.sparkContext.hadoopConfiguration.get("graft.test.marker") === null)
  }

  test("csvQuarantine: malformed lines route to quarantine with the raw line; valid stay typed") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-csvq").toString + "/data"
    val lines = Seq(
      "1,O,100.50",   // valid
      "2,F",          // wrong token count (short)
      "3,O,notanum",  // type mismatch in the double column
      "4,P,7.25",     // valid
      "5,F,1.00,extra" // wrong token count (long)
    )
    spark.createDataset(lines)(org.apache.spark.sql.Encoders.STRING)
      .coalesce(1).write.text(dir)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", org.apache.spark.sql.types.DoubleType)))
    val (valid, quarantine) = Sources.csvQuarantine(spark, dir, schema)
    val v = valid.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(v.toSeq === Seq((1L, "O", 100.50), (4L, "P", 7.25)))
    val q = quarantine.select(col("raw_line")).collect().map(_.getString(0)).toSet
    assert(q === Set("2,F", "3,O,notanum", "5,F,1.00,extra"))
    graft.Caches.clear(spark, blocking = true)
  }

  test("csvQuarantine honors reader options (delimiter) and passes a fully-clean feed through") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-csvq2").toString + "/data"
    spark.createDataset(Seq("1|O|2.50", "2|P|7.00"))(
      org.apache.spark.sql.Encoders.STRING).coalesce(1).write.text(dir)
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType),
      StructField("v", org.apache.spark.sql.types.DoubleType)))
    val (valid, quarantine) = Sources.csvQuarantine(spark, dir, schema,
      options = Map("delimiter" -> "|"))
    assert(valid.count() === 2L)
    assert(quarantine.count() === 0L)
    assert(valid.filter(col("k") === 1L).select("v").head().getDouble(0) === 2.50)
    graft.Caches.clear(spark, blocking = true)
  }
}
