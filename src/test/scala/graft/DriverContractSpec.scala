package graft

/** Guards the driver contract itself: entry() smoke, oracle keys ⊆ query
  * keys, every query runs at the smallest SF with well-formed output
  * columns (the driver sorts columns by name before hashing — duplicate or
  * empty names would silently corrupt the compare).
  */
class DriverContractSpec extends SparkSpec {

  test("entry() returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; rows-only queries are the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert((q -- o).isEmpty, s"rows-only drift: ${q -- o}")
  }

  test("every declared query runs at sf0.001 with sane output columns") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val cols = df.columns
        val bad =
          (if (cols.distinct.length != cols.length) Seq(s"duplicate columns: ${cols.mkString(",")}") else Nil) ++
            (if (cols.exists(_.trim.isEmpty)) Seq("empty column name") else Nil) ++
            (if (cols.exists(_.startsWith("__"))) Seq(s"internal column leaked: ${cols.filter(_.startsWith("__")).mkString(",")}") else Nil)
        df.count() // must execute
        bad.map(b => s"$name: $b")
      } catch {
        case e: Throwable => Seq(s"$name: ${e.getClass.getSimpleName} ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
