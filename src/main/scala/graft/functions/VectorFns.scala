package graft.functions

/** Embedding-vector expression builders (cosine/dot over ARRAY<FLOAT>).
  *
  * Both engines compute the dot product as the same left-to-right fold over
  * double-cast elements, so results are bit-identical (IEEE addition applied
  * in the same order) — no rounding tolerance needed in the oracle. The
  * fixture embeddings are unit-normalized, so dot == cosine.
  */
object VectorFns {

  /** Spark SQL: dot product of two ARRAY<FLOAT> expressions. */
  def dotSql(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      s"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  /** DuckDB mirror of [[dotSql]] (numeric struct index; prepend-init fold). */
  def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS DOUBLE), list_transform(list_zip($a, $b), " +
      s"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))), (acc, x) -> acc + x)"
}
