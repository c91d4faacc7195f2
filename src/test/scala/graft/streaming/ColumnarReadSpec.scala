package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.SnapshotTable

/** The vectorized connector decode ([[SnapshotColumnarReader]]) —
  * row/columnar parity across every supported type including nulls,
  * schema-evolution null vectors, and the plan-shape evidence that the
  * columnar path actually engages (the value gates alone cannot show
  * WHICH decoder produced the rows).
  */
class ColumnarReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val provider = classOf[SnapshotSourceProvider].getName

  test("columnar and row decoders agree on every type, nulls included") {
    import spark.implicits._
    val t = graft.Scratch.dir("columnar_parity")
    val df = spark.range(10000L).select(
      col("id").as("k"),
      when(col("id") % 7 === 0, null).otherwise(col("id") * 3).as("l"),
      when(col("id") % 5 === 0, null)
        .otherwise(col("id").cast("int")).as("i"),
      when(col("id") % 3 === 0, null)
        .otherwise(col("id").cast("double") / 7.0).as("d"),
      (col("id") % 11).cast("float").as("f"),
      (col("id") % 2 === 0).as("b"),
      when(col("id") % 13 === 0, null)
        .otherwise(concat(lit("s_"), col("id"))).as("s"),
      encode(concat(lit("b_"), col("id")), "UTF-8").as("bin"),
      timestamp_micros(col("id") * 1000000L).as("ts"),
      date_add(lit("2020-01-01").cast("date"), (col("id") % 365).cast("int"))
        .as("dt"))
    SnapshotTable.commit(df.repartition(3), t, 1L)

    def readAll(rowDecode: Boolean) = {
      // The factory consults the property at planning; scope it to the
      // read and restore after.
      val saved = System.getProperty("graft.snapshot.rowDecode")
      try {
        if (rowDecode) System.setProperty("graft.snapshot.rowDecode", "true")
        else System.clearProperty("graft.snapshot.rowDecode")
        spark.read.format(provider).load(t)
          .orderBy("k").collect().map(_.toSeq.map {
            case a: Array[Byte] => a.toSeq
            case v => v
          })
      } finally {
        if (saved == null) System.clearProperty("graft.snapshot.rowDecode")
        else System.setProperty("graft.snapshot.rowDecode", saved)
      }
    }
    val colwise = readAll(rowDecode = false)
    val rowwise = readAll(rowDecode = true)
    assert(colwise.length === 10000)
    assert(colwise.toSeq === rowwise.toSeq)
    // And the columnar path actually engaged.
    val plan = spark.read.format(provider).load(t).select("k")
      .queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"the connector read must take the vectorized path; got:\n$plan")
  }

  test("pushed range probes skip row groups inside admitted files") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val t = graft.Scratch.dir("rowgroup_skip")
    val file = s"$t/data/gen=1/part-00000.parquet"
    // One sorted multi-row-group file (tiny row groups force many
    // groups — production's many-groups-per-GB-file shape in
    // miniature); publish it as a plain path-only manifest so FILE
    // pruning cannot help and any skipping must happen at the row
    // group level.
    val msg = SnapshotSource.messageTypeOf(StructType(Seq(
      StructField("k", LongType), StructField("v", LongType))))
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sessionState.newHadoopConf())
    org.apache.parquet.hadoop.example.GroupWriteSupport.setSchema(msg, conf)
    val w = org.apache.parquet.hadoop.example.ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withConf(conf).withRowGroupSize(4096L).build()
    val fac = new org.apache.parquet.example.data.simple.SimpleGroupFactory(msg)
    (0L until 20000L).foreach { k =>
      val g = fac.newGroup()
      g.add("k", k)
      g.add("v", k * 2)
      w.write(g)
    }
    w.close()
    SnapshotTable.publish(spark, t, 1L, Seq(file))
    val nGroups = {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(file), conf))
      try r.getFooter.getBlocks.size finally r.close()
    }
    assert(nGroups >= 4, s"fixture must span several row groups; got $nGroups")
    val d0 = SnapshotColumnarReader.groupsDecoded.get()
    val s0 = SnapshotColumnarReader.groupsSkipped.get()
    val got = spark.read.format(provider).load(t)
      .filter(col("k") >= 100L && col("k") <= 200L)
      .agg(sum("v")).head().getLong(0)
    assert(got === (100L to 200L).map(_ * 2).sum)
    val decoded = SnapshotColumnarReader.groupsDecoded.get() - d0
    val skipped = SnapshotColumnarReader.groupsSkipped.get() - s0
    assert(decoded + skipped === nGroups.toLong,
      s"every group must be decided: $decoded decoded + $skipped skipped != $nGroups")
    assert(skipped > 0, "a narrow range over a sorted file must skip groups")
    assert(decoded <= 2L,
      s"the [100, 200] probe spans at most 2 of $nGroups sorted groups; decoded $decoded")
    // An unfiltered scan still decodes everything (no false skips).
    // sum, not count(): a bare count() is now answered from MANIFEST
    // stats (the aggregate pushdown) and decodes zero groups.
    val d1 = SnapshotColumnarReader.groupsDecoded.get()
    assert(spark.read.format(provider).load(t).agg(sum("v")).head().getLong(0)
      === (0L until 20000L).map(_ * 2).sum)
    assert(SnapshotColumnarReader.groupsDecoded.get() - d1 === nGroups.toLong)
  }

  test("schema evolution serves null vectors for columns the file never carried") {
    import spark.implicits._
    val t = graft.Scratch.dir("columnar_evo")
    SnapshotTable.commit(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), t, 1L)
    SnapshotTable.commit(
      Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("k", "v", "extra"),
      t, 2L, carryFrom = Some(1L))
    val got = spark.read.format(provider).load(t)
      .orderBy("k").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(got.map(r => if (r.isNullAt(2)) -1L else r.getLong(2)).toSeq
      === Seq(-1L, -1L, 30L, 40L))
  }
}
