package graft.queries

/** The full query catalog — SparkEntry.queries/oracleSql derive from this,
  * so every QueryDef added here is automatically picked up by Verify
  * (correctness vs DuckDB) and Bench (timing).
  */
object Catalog {
  val all: Seq[QueryDef] =
    RelationalQueries.defs ++
      TpchQueries.defs ++
      TensorQueries.defs ++
      TextQueries.defs ++
      EventQueries.defs ++
      DedupQueries.defs ++
      MLQueries.defs ++
      SeededQueries.defs

  lazy val byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap

  require(all.size == byName.size, "duplicate query names in catalog")
}
