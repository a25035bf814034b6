package graft

/** Driver-contract consistency: suite keys are globally unique (a duplicate
  * would be silently dropped by the map merge), every oracle key has a
  * query, and the flagship entry returns rows. */
class SparkEntrySpec extends SparkSpec {

  test("query names are unique across suites") {
    val suites = Seq(queries.Tpch, queries.OpsRelational, queries.OpsScalar,
      queries.OpsExtensibility, queries.OpsLlm, queries.OpsEvents,
      queries.OpsSql, queries.OpsTemporal, queries.OpsCuration,
      queries.OpsImage, queries.OpsSelection, queries.OpsWeb)
    val all = suites.flatMap(_.defs.keys)
    val dupes = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(all.size == SparkEntry.queries.size)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("every bench headline name resolves to a query") {
    val missing = Bench.headline.filterNot(SparkEntry.queries.contains)
    assert(missing.isEmpty, s"bench names without a query: $missing")
    val dupes = Bench.headline.groupBy(identity)
      .collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate bench names: $dupes")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with empty results at sf0.001: $empty")
  }
}
