package graft.rdf

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** RDF / SPARQL-BGP support (reference: src/main/scala/dbis/piglet/op/
  * RDFLoad.scala, BGPFilter.scala, Tuplify.scala; mm grouping by subject).
  *
  * Triples live as a plain (s, p, o) DataFrame, so every SPARQL basic
  * graph pattern compiles to equi-joins Catalyst can reorder/broadcast;
  * predicate-constant filters push into the scan.
  */
object Rdf {

  /** The shared N-Triples line parse (`<iri>|_:blank  <iri>  token .`):
    * ONE copy of the grammar for both load variants — a fix applied to
    * one must not leave the other parsing differently. */
  private def parseLines(spark: SparkSession, path: String): DataFrame = {
    val line = spark.read.text(path)
    val pat = """^\s*(<[^>]*>|_:\S+)\s+(<[^>]*>)\s+(.*?)\s*\.\s*$"""
    line.select(
        regexp_extract(col("value"), pat, 1).as("s"),
        regexp_extract(col("value"), pat, 2).as("p"),
        regexp_extract(col("value"), pat, 3).as("o"))
      .where(col("s") =!= "" && col("p") =!= "")
  }

  /** RDFLOAD: parse an N-Triples text file into (s, p, o). The line
    * grammar is a pure regex — a narrow, codegen'd map over the text
    * scan. */
  def loadNTriples(spark: SparkSession, path: String): DataFrame =
    parseLines(spark, path)
      .select(strip(col("s")).as("s"), strip(col("p")).as("p"),
        strip(col("o")).as("o"))

  /** RDFLOAD with piglet's token fidelity: IRIs keep their `<>`, literals
    * keep their quotes; only a typed literal's `^^<datatype>` suffix is
    * dropped (reference truth/groupedrdf.data renders `"2000-07-04"` for
    * an `^^xsd:date` literal). [[loadNTriples]] is the cleaned
    * Spark-native variant the graft API exposes. */
  def loadNTriplesRaw(spark: SparkSession, path: String): DataFrame =
    parseLines(spark, path)
      .withColumn("o", regexp_replace(col("o"), "\\^\\^<[^>]*>$", ""))

  private def strip(c: Column): Column =
    when(c.startsWith("<") && c.endsWith(">"), c.substr(lit(2), length(c) - 2))
      // typed ("5"^^<xsd:int>) and language-tagged ("x"@en) literals keep
      // only the quoted lexical form; plain literals lose their quotes.
      // An unterminated/malformed quoted token falls back to the RAW
      // token — regexp_extract would return "" on no-match, silently
      // turning a corrupt line into an empty object
      .when(c.startsWith("\"") && c.rlike("^\"(?:[^\"\\\\]|\\\\.)*\""),
        regexp_extract(c, "^\"((?:[^\"\\\\]|\\\\.)*)\"", 1))
      .otherwise(c)

  /** TUPLIFY: group triples by subject into a predicate→objects map
    * (reference: op/Tuplify.scala). Multi-valued predicates — two triples
    * sharing (s, p) — are ubiquitous in RDF, so the map value is an ARRAY
    * of objects (map_from_entries on raw pairs throws on duplicate keys
    * under Spark's default dedup policy). One shuffle on subject. */
  def tuplify(triples: DataFrame): DataFrame =
    triples.groupBy(col("s"), col("p"))
      .agg(sort_array(collect_list(col("o"))).as("os"))
      .groupBy(col("s"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("p"), col("os")))))
        .as("po"))

  /** One triple pattern of a BGP: each position is either a variable name
    * (starts with '?') or a constant. */
  final case class Pattern(s: String, p: String, o: String)

  private def isVar(x: String) = x.startsWith("?")

  /** BGP_FILTER: match a conjunctive basic graph pattern against the
    * triple store; returns one column per distinct variable.
    *
    * Compilation: each pattern is a constant-filtered scan of the triples
    * relation; shared variables become equi-join keys. Star-joins (shared
    * subject) and path-joins (o→s chains) both reduce to joins Catalyst
    * reorders; constant filters prune at the parquet scan.
    */
  def bgpFilter(triples: DataFrame, patterns: Seq[Pattern]): DataFrame = {
    require(patterns.nonEmpty,
      "bgpFilter needs at least one triple pattern (an empty BGP has no " +
        "variable bindings to return)")
    val scans = patterns.map { pat =>
      var scan = triples
      if (!isVar(pat.s)) scan = scan.where(col("s") === pat.s)
      if (!isVar(pat.p)) scan = scan.where(col("p") === pat.p)
      if (!isVar(pat.o)) scan = scan.where(col("o") === pat.o)
      val varPos = Seq(("s", pat.s), ("p", pat.p), ("o", pat.o))
        .filter { case (_, v) => isVar(v) }
      // a variable repeated WITHIN one pattern (e.g. ?x <p> ?x) implies
      // equality between its positions — filter it, project it once
      varPos.groupBy(_._2).values.foreach { occ =>
        occ.map(_._1).sliding(2).foreach {
          case Seq(a, b) => scan = scan.where(col(a) === col(b))
          case _ => ()
        }
      }
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      val varCols = varPos.flatMap { case (c, v) =>
        if (seen.add(v)) Some(col(c).as(v.drop(1))) else None
      }
      // an all-constant pattern is an EXISTENCE test (SPARQL gives the
      // empty mapping multiplicity 1): limit to one row so the crossJoin
      // below doesn't multiply other bindings by the match count
      if (varCols.isEmpty) scan.select().limit(1)
      else scan.select(varCols: _*)
    }
    scans.reduceLeft { (l, r) =>
      val shared = l.columns.intersect(r.columns).toSeq
      if (shared.nonEmpty) l.join(r, shared) else l.crossJoin(r)
    }
  }

  /** Derive a deterministic triple set from relational rows — the test
    * stand-in for an N-Triples corpus (subject = entity iri, one triple
    * per column). */
  def fromColumns(df: DataFrame, idCol: String, prefix: String): DataFrame = {
    val cols = df.columns.filterNot(_ == idCol)
    val triples = cols.map { c =>
      df.select(
        concat(lit(s"$prefix/"), col(idCol).cast("string")).as("s"),
        lit(s"$prefix#$c").as("p"),
        col(c).cast("string").as("o"))
    }
    triples.reduce(_.unionByName(_))
  }
}
