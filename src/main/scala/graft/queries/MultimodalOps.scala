package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column battery: binary payload + typed metadata plumbing.
  * Both the SQL-visible surface (byte length, digest, head slice) and the
  * batch decode path (mapPartitions stub decoder) oracle against DuckDB —
  * the stub's md5-derived features are reconstructible in pure SQL.
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

    // ---- batch decode (real decoder, stub fallback) -----------------------
    // The gate runs the PRODUCTION decoder: ImageHistogramDecoder
    // attempts a real javax.imageio pixel decode per payload and
    // extracts a grayscale histogram (spec-gated on generated PNGs in
    // MultimodalSpec). The synthetic corpus's payloads are text bytes —
    // not decodable images — so every row routes to the md5
    // StubDecoder fallback, whose feature[i] = digest byte i IS
    // SQL-expressible: the oracle reconstructs each byte from the md5
    // hex string (strpos-based hex-digit arithmetic). The vector is
    // exploded to (media_id, i, v) rows because the gate comparator
    // cannot sort array cells; values rounded to 4 decimals (float32
    // representation error ~6e-8 is far below the min distance of
    // k/255 from any 4-decimal half-boundary, ~2e-7, so both engines
    // round identically).
    QueryDef("q51_multimodal_decode",
      (s, dir) => {
        val media = Multimodal.asMediaTable(
          Tables.table(s, dir, "documents"), "doc_id", "text", "image")
        Multimodal.decodeFeatures(media,
          new Multimodal.ImageHistogramDecoder(8, new Multimodal.StubDecoder(8)))
          .select(col("media_id"), posexplode(col("feature")).as(Seq("i", "v")))
          .select(col("media_id"), col("i"),
            round(col("v").cast("double"), 4).as("v"))
          .orderBy("media_id", "i")
      },
      Some("""
        WITH h AS (SELECT doc_id AS media_id, md5(text) AS hx FROM documents),
             idx AS (SELECT CAST(unnest(range(8)) AS INT) AS i)
        SELECT h.media_id, idx.i,
               round((16.0 * (strpos('0123456789abcdef', substr(h.hx, idx.i*2+1, 1)) - 1)
                      + (strpos('0123456789abcdef', substr(h.hx, idx.i*2+2, 1)) - 1))
                     / 255.0, 4) AS v
        FROM h CROSS JOIN idx
        ORDER BY 1, 2""")))
}
