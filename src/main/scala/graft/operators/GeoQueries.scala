package graft.operators

import graft.QuerySpec

/** Geospatial parity queries (SURVEY.md §2.8) — filled in with the geo
  * kernel milestone (M4). DuckDB's spatial extension is not loadable
  * offline, so geo oracles are expressed as arithmetic identities (e.g.
  * point roundtrips, closed-form Web-Mercator formulas); full geometry
  * correctness lives in ScalaTest golden fixtures.
  */
object GeoQueries {
  def specs: Seq[QuerySpec] = Seq.empty
}
