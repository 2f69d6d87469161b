package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column battery: binary payload + typed metadata plumbing.
  * The SQL-visible surface (byte length, digest, head slice) oracles
  * against DuckDB; the batch decode path (mapPartitions stub decoder) is
  * covered by ScalaTest and registered as a rows-only check.
  */
object MultimodalOps {

  val defs: Seq[QueryDef] = Seq(

    // ---- binary column + metadata projection ----------------------------
    QueryDef("q50_multimodal_meta",
      (s, dir) => {
        val media = Multimodal.asMediaTable(
          Tables.table(s, dir, "documents"), "doc_id", "text", "image")
        media.select(
            col("media_id"),
            col("meta.n_bytes").as("n_bytes"),
            col("meta.width").as("width"),
            md5(col("payload")).as("digest"),
            base64(col("payload").substr(1, 12)).as("head_b64"))
          .orderBy("media_id")
      },
      Some("""
        SELECT doc_id AS media_id,
               CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
               CAST(octet_length(CAST(text AS BLOB)) % 1024 + 32 AS INT) AS width,
               md5(text) AS digest,
               to_base64(CAST(substr(text, 1, 12) AS BLOB)) AS head_b64
        FROM documents ORDER BY media_id""")),

    // ---- batch decode (stub decoder) — rows-only check -------------------
    // Real semantics tested in MultimodalSpec; not ANSI-SQL-expressible
    // (mapPartitions with an injected decoder).
    QueryDef("q51_multimodal_decode",
      (s, dir) => {
        val media = Multimodal.asMediaTable(
          Tables.table(s, dir, "documents"), "doc_id", "text", "image")
        Multimodal.decodeFeatures(media, new Multimodal.StubDecoder(8))
          .select(col("media_id"), col("feature"))
          .orderBy("media_id")
      },
      None))
}
