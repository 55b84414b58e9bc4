package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Document chunking — the proper fix for the reference's hard token-length
  * assert (reference `vectrekker/main.py:175-178`; splitting is its
  * acknowledged TODO at `main.py:177`): long documents become overlapping
  * fixed-size token windows, each independently embeddable.
  *
  * Pure expression pipeline (split + sequence + posexplode + slice) — chunk
  * enumeration is computed per row inside codegen and explodes to one row per
  * chunk; at 100 TB this is a map-only operator, no shuffle.
  */
object Chunker {

  /** One row per chunk: (idCol, chunk_id, chunk_text, n_tokens).
    * Chunks are `chunkTokens` tokens long with `overlap` tokens shared
    * between consecutive chunks; the last chunk may be shorter. Documents
    * shorter than one chunk yield exactly one chunk. Rows with a NULL text
    * are dropped (filtered explicitly — decide upstream if they should be
    * empty chunks instead).
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    val input  = df.filter(col(textCol).isNotNull)
    val toks   = TextFunctions.tokens(col(textCol))
    val n      = size(toks)
    // number of extra chunks past the first: ceil(max(0, n-chunk) / stride),
    // via double floor (exact for realistic token counts)
    val nExtra = floor((greatest(lit(0), n - chunkTokens) + lit(stride - 1)).cast("double") / lit(stride.toDouble)).cast("int")
    input.select(col(idCol), toks.as("__toks"), nExtra.as("__n_extra"))
      .select(col(idCol), col("__toks"), posexplode(sequence(lit(0), col("__n_extra"))))
      .select(
        col(idCol),
        col("col").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("col") * stride + 1, lit(chunkTokens))).as("chunk_text"),
        size(slice(col("__toks"), col("col") * stride + 1, lit(chunkTokens))).cast("long").as("n_tokens"))
  }
}
