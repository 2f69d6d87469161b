package graft.operators

/** The one copy of the index-family batch-commit protocol rules
  * (TextIndex / Similarity ivfAppend* / Dedup bandIndexAppend — see
  * DEVIATIONS.md §11): batch ids name partition directories, the
  * ledger row is the commit point, a committed id is exactly-once,
  * and a retry of an uncommitted id first deletes its orphan dirs.
  * Centralized so the three families cannot drift — and so callers
  * that must tolerate a replayed already-committed batch (the
  * streaming sinks) can catch a TYPE instead of string-matching an
  * exception message.
  */
private[graft] object IndexCommit {

  /** Thrown when a batch id already has a ledger row. Subtype of
    * IllegalArgumentException so contract-level callers/specs that
    * treat it as a plain argument error keep working; streaming
    * replay handlers catch THIS type.
    */
  final class AlreadyCommittedException(msg: String)
    extends IllegalArgumentException(msg)

  /** Batch ids are partition DIRECTORY names (replace-by-batch deletes
    * them by glob), so they must be path- and glob-safe; an all-digit
    * id would make partition-type inference read the batch column as
    * a NUMBER and the committed-batch filter's string cast would then
    * defeat partition pruning.
    */
  def requireSaneBatchId(batch: String): Unit = {
    require(batch != "build", "batch id 'build' is reserved for the build")
    require(batch.matches("[A-Za-z0-9._-]+"),
      s"batch id must match [A-Za-z0-9._-]+ (it names a partition " +
        s"directory), got '$batch'")
    require(batch.exists(!_.isDigit),
      s"batch id must contain a non-digit (got '$batch'): all-digit ids " +
        "flip the partition column to a numeric type on read")
  }

  /** Exactly-once guard: a batch id with a ledger row is done. */
  def requireNotCommitted(batch: String, committed: Set[String],
      ledgerPath: String): Unit =
    if (committed.contains(batch))
      throw new AlreadyCommittedException(
        s"batch '$batch' is already committed in the ledger at $ledgerPath" +
          " — appends are exactly-once per batch id; pick a new id")

  /** Replace-by-batch: delete the orphan partition dirs a previous
    * attempt at this id left behind (`glob` like "shard=*&#47;batch=b1").
    */
  def dropOrphanDirs(spark: org.apache.spark.sql.SparkSession,
      root: String, glob: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.globStatus(new org.apache.hadoop.fs.Path(root, glob)) match {
      case null => ()
      case orphans => orphans.foreach(o => fs.delete(o.getPath, true))
    }
  }
}
