package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The N-Quads DataSource V2: short-name registration, per-file
  * partitioning, URI repair, malformed-line skipping, and column pruning
  * pushed all the way into the reader. */
class NQuadsSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(): String = {
    val dir = Files.createTempDirectory("nquads_spec").toString
    Files.write(java.nio.file.Paths.get(dir, "a.nq"), java.util.Arrays.asList(
      "<http://ex/s1> <http://ex/p> \"v one\" <http://ex/g1> .",
      "<http://ex/s2> <http://www.w3.org/ns/prov#wasQuotedFrom> <broken.example/x> . MALFORMED",
      "<http://ex/s2> <http://www.w3.org/ns/prov#wasQuotedFrom> \"q\" <http://ex/g2> .",
      "garbage line that is not a quad"))
    Files.write(java.nio.file.Paths.get(dir, "b.nq"), java.util.Arrays.asList(
      "<http://ex/s3> <http://ex/p> \"v three\" <http://ex/g3> ."))
    dir
  }

  test("reads shards in parallel partitions, skipping malformed lines") {
    val dir = writeFixture()
    val df = spark.read.format("nquads").load(dir)
    val rows = df.collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(rows === Set(("http://ex/s1", "v one"), ("http://ex/s2", "q"),
      ("http://ex/s3", "v three")))
    assert(df.rdd.getNumPartitions === 2) // one per file
  }

  test("wasQuotedFrom URI repair runs before parsing") {
    val dir = Files.createTempDirectory("nquads_spec2").toString
    // object IRI missing http:// — fix_dataset_uris.py analogue repairs
    // it; r10's generalized grammar parses IRI-object triples too (the
    // real dump's dominant shape), so the repaired IRI must come back
    Files.write(java.nio.file.Paths.get(dir, "a.nq"), java.util.Arrays.asList(
      "<http://ex/s> <http://ex/wasQuotedFrom> <broken.example/x> .",
      "<http://ex/s> <http://ex/p> \"kept\" <http://ex/g> ."))
    val df = spark.read.format("nquads").load(dir)
    assert(df.count() === 2)
    val repaired = df.filter(org.apache.spark.sql.functions.col("predicate")
      === "http://ex/wasQuotedFrom").collect()
    assert(repaired.length === 1)
    assert(repaired(0).getAs[String]("obj") === "http://broken.example/x")
    assert(repaired(0).getAs[String]("graph") === "",
      "triple without a graph term carries the empty graph")
  }

  test("column pruning reaches the reader (scan ReadSchema shrinks)") {
    val dir = writeFixture()
    val df = spark.read.format("nquads").load(dir).select("obj")
    df.collect()
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    }.orElse(df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b.scan.readSchema()
    })
    assert(scan.isDefined, df.queryExecution.executedPlan.toString)
    assert(scan.get.fieldNames.toSeq === Seq("obj"), scan.get.treeString)
  }

  test("filter pushdown reaches the reader and is recorded on the scan") {
    val dir = writeFixture()
    val df = spark.read.format("nquads").load(dir)
      .filter(col("subject") === "http://ex/s1")
    val rows = df.collect()
    assert(rows.map(_.getString(2)).toSeq === Seq("v one"))
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    } match {
      case Some(s: graft.sources.NQuadsScan) =>
        assert(s.pushedFilters.nonEmpty, "no filters pushed")
      case other => fail(s"unexpected scan: $other")
    }
  }

  test("write path round-trips through the connector, overwrite truncates") {
    val dir = Files.createTempDirectory("nquads_write").toString
    val df = Seq(
      ("http://ex/s1", "http://ex/p", "v one", "http://ex/g1"),
      ("http://ex/s2", "http://ex/p", "v two", "http://ex/g2"))
      .toDF("subject", "predicate", "obj", "graph")
    df.write.format("nquads").mode("append").save(dir)
    val back = spark.read.format("nquads").load(dir)
    assert(back.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("http://ex/s1", "http://ex/s2"))
    // overwrite drops the old shards
    Seq(("http://ex/s9", "http://ex/p", "v nine", "http://ex/g9"))
      .toDF("subject", "predicate", "obj", "graph")
      .write.format("nquads").mode("overwrite").save(dir)
    assert(spark.read.format("nquads").load(dir)
      .collect().map(_.getString(0)).toSeq === Seq("http://ex/s9"))
  }

  test("connector round-trip matches the Column-transform parser row for row") {
    val viaSource = graft.sources.NQuads.qNquadsSource(spark, sfDir)
    val viaParse = graft.sources.NQuads.qNquadsParse(spark, sfDir)
    assert(viaSource.except(viaParse).count() === 0)
    assert(viaParse.except(viaSource).count() === 0)
    assert(viaSource.count() === viaParse.count())
  }
}
