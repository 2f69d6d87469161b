package graft

/** Dev tool: print the physical plan of any registered query.
  * Usage: runMain graft.Explain <name> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q32_lsh_pairs"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val s = Engine.local(8)
    SparkEntry.queries(name)(s, dir).explain("formatted")
    s.stop()
  }
}
