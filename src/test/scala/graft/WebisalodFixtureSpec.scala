package graft

import graft.sources.NQuads
import org.apache.spark.sql.functions._

/** Real-dump ingestion: the committed fixture
  * `src/test/resources/webisalod-instances.sample.nq` is a 1015-line
  * slice of the genuine public WebIsALOD dump (webdatacommons.org, CC
  * data — the corpus the reference parses in Read_And_Clean.py) in its
  * ORIGINAL broken form: every prov#wasQuotedFrom object is missing its
  * `http://` scheme, exactly the malformation fix_dataset_uris.py
  * repairs. Unlike the synthesized round-trip gates (q_nquads_parse /
  * q_nquads_source), this exercises the reader against all four line
  * shapes the real dump carries — IRI objects, plain literals, typed
  * literals (`"2"^^<xsd:integer>`), and graph-tagged quads with the
  * dump's irregular whitespace — plus genuinely malformed IRIs.
  *
  * The pinned counts reproduce the reference pipeline's accounting
  * (Read_And_Clean.py:108-151: contexts → concept subjects →
  * wasDerivedFrom → prov#value rawTexts), computed independently with a
  * reference Python parse of the fixture. */
class WebisalodFixtureSpec extends SparkSpec {

  private val fixture = "src/test/resources/webisalod-instances.sample.nq"

  private lazy val quads = {
    val df = spark.read.format("nquads").load(fixture)
    df.persist()
    df.count() // materialize once for the whole suite
    df
  }

  test("every non-blank line of the real dump parses (980 of 1015, 35 blank)") {
    assert(quads.count() === 980L)
  }

  test("URI repair fires on genuinely malformed wasQuotedFrom lines (fix_dataset_uris.py)") {
    val wqf = quads.filter(col("predicate") === NQuads.WasQuotedFrom)
    assert(wqf.count() === 119L)
    assert(wqf.filter(!col("obj").startsWith("http://")).count() === 0L,
      "reader must repair the missing scheme before parsing")
    // and the fixture really is broken on disk — the repair is load-bearing
    val raw = spark.read.text(fixture)
    assert(raw.filter(col("value").contains("wasQuotedFrom> <http://")).count() === 0L)
  }

  test("context/concept accounting matches the reference parse: 47 concepts, 35 contexts") {
    assert(quads.filter(col("subject").startsWith(NQuads.ConceptPrefix))
      .select("subject").distinct().count() === 47L)
    assert(quads.filter(col("graph") =!= "").select("graph").distinct().count() === 35L)
  }

  test("typed literals parse to their bare lexical form") {
    val freq = quads.filter(col("predicate") ===
      "http://webisa.webdatacommons.org/ontology#hasFrequency")
    assert(freq.count() === 35L)
    assert(freq.filter(!col("obj").rlike("^[0-9]+$")).count() === 0L,
      "the ^^<xsd:integer> suffix must not leak into obj")
  }

  test("Read_And_Clean rawText extraction: concept→ctx→wasDerivedFrom→prov#value") {
    // the reference walks, per concept context, wasDerivedFrom to the
    // sentence nodes and collects their prov#value texts
    // (Read_And_Clean.py:140-149); as a relational plan that is two
    // equi-joins — pinned to the independently computed totals
    val conceptCtx = quads
      .filter(col("subject").startsWith(NQuads.ConceptPrefix) && col("graph") =!= "")
      .select(col("subject").as("concept"), col("graph").as("ctx")).distinct()
    val derived = quads.filter(col("predicate") === NQuads.WasDerivedFrom)
      .select(col("subject").as("ctx"), col("obj").as("sentence"))
    val values = quads.filter(col("predicate") === NQuads.ProvValue)
      .select(col("subject").as("sentence"), col("obj").as("raw_text"))
    val texts = conceptCtx.join(derived, "ctx").join(values, "sentence")
    assert(texts.count() === 121L)
    assert(texts.select("concept").distinct().count() === 19L)
    assert(values.count() === 119L)
  }

  test("predicate pushdown reaches the reader on the real dump") {
    val scan = quads.filter(col("predicate") === NQuads.ProvValue)
    // semantics regardless of pushdown:
    assert(scan.count() === 119L)
    val fresh = spark.read.format("nquads").load(fixture)
      .filter(col("predicate") === NQuads.ProvValue)
    val plan = fresh.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [EqualTo(predicate,"), plan.take(1500))
  }
}
