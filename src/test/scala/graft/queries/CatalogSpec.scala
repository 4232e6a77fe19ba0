package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Catalog hygiene: the invariants the harness contract depends on but no
  * single query test would catch — name uniqueness/shape, oracle table
  * references, and a non-degenerate bench set. */
class CatalogSpec extends AnyFunSuite {

  private val knownTables = Set("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  test("query names are unique and harness-shaped") {
    val names = Catalog.all.map(_.name)
    assert(names.distinct.size == names.size,
      names.groupBy(identity).collect { case (n, g) if g.size > 1 => n })
    names.foreach(n => assert(n.matches("q\\d+[a-z]?(_[a-z0-9]+)+"), n))
  }

  test("every oracle references only driver-provided tables") {
    // every FROM/JOIN target must be a known table or a CTE defined in the
    // same statement (the driver creates views only for knownTables)
    val ident = "([a-zA-Z_][a-zA-Z0-9_]*)"
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).foreach {
      case (name, sql) =>
        val ctes = s"(?i)$ident\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:NOT\\s+)?(?:MATERIALIZED\\s*)?\\(".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        // subquery aliases: FROM ( ... ) alias
        val aliases = s"(?i)\\)\\s*$ident".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val targets = s"(?i)(?:FROM|JOIN)\\s+$ident".r
          .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
        val unknown = targets -- knownTables -- ctes -- aliases --
          Set("range", "read_parquet", "unnest", "generate_series")
        assert(unknown.isEmpty, s"$name references unknown tables: $unknown")
    }
  }

  test("the bench headliner set is substantial and all-oracled-or-audited") {
    val bench = Catalog.all.filter(_.bench)
    assert(bench.size >= 20)
    // headliners are gate-verified (oracled) except the documented
    // engine-internal exception: q38's bucketed cosine dedup (hash family
    // is engine-internal; its recall gate is q39)
    val unoracled = bench.filterNot(_.oracle.isDefined).map(_.name)
    assert(unoracled == Seq("q38_dedup_cosine_lsh"),
      s"bench without oracle: $unoracled")
  }
}
