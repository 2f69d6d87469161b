package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Referential cascade deletion — the right-to-be-forgotten primitive.
  *
  * Given a seed set of keys to erase in one table and the foreign-key
  * graph connecting it to its descendants, compute the transitive
  * delete closure: every child row that references a deleted parent
  * row (directly or through intermediate tables) is deleted too, so
  * the surviving warehouse has NO orphans — an order whose customer
  * was erased cannot linger, nor can that order's line items.
  *
  * Shape at scale: the walk is driver-side over the TABLE graph (a
  * handful of nodes), never over data. Per edge it costs one
  * left-semi join of the child on its FK column against the parent's
  * deleted-key set — deleted keys are usually a small fraction, so
  * AQE broadcasts them and no child ever full-shuffles; the kept
  * face is the mirror left-anti join. No collects: key sets stay
  * distributed end to end.
  *
  * The FK graph must be acyclic (checked loudly): erasure semantics
  * under cyclic references need application-level tie-breaking that a
  * generic walk cannot guess.
  */
object Cascade {

  /** child.childCol references parent.parentCol. */
  final case class Fk(childTable: String, childCol: String,
      parentTable: String, parentCol: String)

  /** Kept/deleted faces of one table after the cascade. */
  final case class Erased(kept: DataFrame, deleted: DataFrame)

  /** Transitive delete closure from `seedKeys` (a one-column frame of
    * `seedCol` values) applied to `tables(seedTable)`.
    *
    * Multi-parent children (a fact referencing two dimensions) delete
    * when ANY referenced parent row is deleted — the union of the
    * per-edge semi-joins. Tables unreachable from the seed pass
    * through untouched (kept = input, deleted = empty).
    */
  def deleteClosure(tables: Map[String, DataFrame], fks: Seq[Fk],
      seedTable: String, seedCol: String, seedKeys: DataFrame)
      : Map[String, Erased] = {
    require(tables.contains(seedTable),
      s"cascade seed table '$seedTable' not in ${tables.keys.mkString(",")}")
    fks.foreach { fk =>
      require(tables.contains(fk.childTable) && tables.contains(fk.parentTable),
        s"FK $fk references a table not in ${tables.keys.mkString(",")}")
      require(fk.childTable != fk.parentTable,
        s"self-referencing FK $fk needs fixpoint iteration (hierarchy " +
          "erasure), which this one-pass DAG walk deliberately refuses")
    }
    // Topological order over the FK DAG, parents before children, so
    // each table's deleted set is final when its children consume it.
    val order = topoOrder(tables.keySet, fks)

    val seedSet = seedKeys.select(col(seedKeys.columns.head).as(seedCol))
    val deleted = scala.collection.mutable.Map[String, DataFrame]()
    for (t <- order) {
      val df = tables(t)
      val fromSeed: Option[DataFrame] =
        if (t == seedTable)
          Some(df.join(seedSet, df(seedCol) === seedSet(seedCol), "left_semi"))
        else None
      val fromParents: Seq[DataFrame] = fks
        .filter(fk => fk.childTable == t && deleted.contains(fk.parentTable))
        .map { fk =>
          val pDel = deleted(fk.parentTable)
            .select(col(fk.parentCol).as("__pk")).distinct()
          df.join(pDel, df(fk.childCol) === pDel("__pk"), "left_semi")
        }
      val parts = fromSeed.toSeq ++ fromParents
      if (parts.nonEmpty)
        // Union of per-edge matches can repeat a row hit via several
        // parents — collapse with distinct (row-level, bounded by the
        // child's own deleted mass, never a data-sized blowup).
        deleted(t) = parts.reduce(_ unionByName _).distinct()
    }
    tables.map { case (t, df) =>
      t -> (deleted.get(t) match {
        case None => Erased(df, df.limit(0))
        case Some(d) =>
          val dd = d.localCheckpoint(true) // read by kept AND the caller
          val pk = dd.columns
          // Anti-join on the FULL row is wrong under duplicate rows;
          // anti-join on the same key columns the semis matched is
          // equivalent and cheaper — but the semis matched whole rows.
          // Keep it row-exact: anti on all columns.
          Erased(df.join(dd, df.columns.map(c => df(c) <=> dd(c))
            .reduce(_ && _), "left_anti"), dd)
      })
    }
  }

  /** Orphan audit: child rows whose FK value no longer resolves in the
    * parent — zero after a correct cascade. One aggregate per edge.
    */
  def orphanCounts(tables: Map[String, Erased], fks: Seq[Fk]): DataFrame = {
    val frames = fks.map { fk =>
      val child = tables(fk.childTable).kept
      val parent = tables(fk.parentTable).kept
        .select(col(fk.parentCol).as("__pk")).distinct()
      child.join(parent, child(fk.childCol) === parent("__pk"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(s"${fk.childTable}.${fk.childCol}").as("edge"),
          col("n_orphans"))
    }
    frames.reduce(_ unionByName _)
  }

  private def topoOrder(nodes: Set[String], fks: Seq[Fk]): Seq[String] = {
    // Kahn's algorithm over parent→child edges; deterministic by name.
    val children = fks.groupBy(_.parentTable)
      .map { case (p, es) => p -> es.map(_.childTable).toSet }
    var inDeg = nodes.map { n =>
      n -> fks.count(fk => fk.childTable == n &&
        fk.parentTable != fk.childTable)
    }.toMap
    val out = Seq.newBuilder[String]
    var ready = inDeg.filter(_._2 == 0).keys.toSeq.sorted
    var remaining = nodes
    while (ready.nonEmpty) {
      val n = ready.head
      ready = ready.tail
      out += n
      remaining -= n
      for (c <- children.getOrElse(n, Set.empty).toSeq.sorted
           if remaining(c)) {
        val d = inDeg(c) - fks.count(fk =>
          fk.childTable == c && fk.parentTable == n)
        inDeg = inDeg.updated(c, d)
        if (d == 0) ready = (ready :+ c).sorted
      }
    }
    require(remaining.isEmpty,
      s"cascade FK graph has a cycle through: ${remaining.mkString(",")}")
    out.result()
  }
}
