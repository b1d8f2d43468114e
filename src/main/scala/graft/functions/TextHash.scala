package graft.functions

/** Deterministic text-hashing expression builders for the dedup family
  * (SURVEY.md §2B "LLM-pipeline"). All are Spark SQL higher-order-function
  * fragments (codegen-friendly, no UDFs, no JVM-specific hash) chosen so the
  * DuckDB oracle can replicate them arithmetic-op for arithmetic-op:
  * a polynomial rolling hash over code points mod a prime, affine minhash
  * permutations, and a bitwise simhash fold.
  *
  * The reference has no hashing surface at all — computation is delegated to
  * handler callbacks (/root/reference/README.md:35); these make
  * fingerprinting first-class and portable.
  */
object TextHash {
  /** Prime modulus for the polynomial hash; keeps a*h well inside Long. */
  val P = 1000000007L

  /** The stopword list shared by every quality rule (q48 stop_ratio, q129
    * low-stopword gate) — one constant rendered into both dialects so the
    * gates can never disagree across queries or engines.
    */
  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to")
  def stopWordsSparkArray: String = StopWords.mkString("array('", "','", "')")
  def stopWordsDuckList: String = StopWords.mkString("['", "','", "']")

  /** Number of minhash permutations and LSH bands (r = Sigs/Bands rows). */
  val MinhashSigs = 16
  val MinhashBands = 4

  /** polyhash(s) = fold over chars: (acc*31 + codepoint) mod P, acc0 = 0. */
  def polyHashSql(s: String): String =
    s"aggregate(transform(sequence(1, length($s)), i -> CAST(ascii(substring($s, i, 1)) AS BIGINT)), " +
      s"CAST(0 AS BIGINT), (acc, x) -> (acc * 31 + x) % $P)"

  /** Distinct word 3-gram shingles of a words array `w` (requires size>=3). */
  def shinglesSql(w: String): String =
    s"array_distinct(transform(sequence(1, size($w) - 2), i -> concat_ws(' ', slice($w, i, 3))))"

  /** Distinct word n-gram shingles of a words array `w`; empty array when
    * size<n. Generalizes [[shinglesSql]]; 13 is the decontamination width.
    * The IF guard makes the expression total — Catalyst may evaluate it
    * outside a caller's size filter (e.g. inside a pushed join predicate),
    * where a descending sequence would feed slice a zero start. DuckDB's
    * range(negative) is already empty, so the dialects agree.
    */
  def nGramsSql(w: String, n: Int): String =
    s"IF(size($w) >= $n, array_distinct(transform(sequence(1, size($w) - ${n - 1}), " +
      s"i -> concat_ws(' ', slice($w, i, $n)))), array())"

  /** Distinct polyhashes of every element of a string-array expr `arr`. */
  def hashedSetSql(arr: String): String =
    s"array_distinct(transform($arr, s -> ${polyHashSql("s")}))"

  /** Minhash signature (MinhashSigs affine permutations) of a hash-set expr. */
  def minhashSql(hh: String): String =
    s"transform(sequence(0, ${MinhashSigs - 1}), i -> " +
      s"array_min(transform($hh, h -> ((2*i + 1) * h + 1000003*i + 12345) % $P)))"

  /** 32-bit simhash of a hash-set expr: bit j set iff the +1/-1 vote of all
    * feature hashes' j-th bits is positive.
    */
  def simhashSql(hh: String): String =
    s"aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) -> acc + " +
      s"IF(aggregate($hh, CAST(0 AS BIGINT), (a2, h2) -> a2 + IF((shiftright(h2, j) & 1) = 1, 1, -1)) > 0, " +
      s"shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"

  // ---- DuckDB oracle mirrors (dialect: list_* functions, fold init via
  // list_prepend since DuckDB 1.0 list_reduce has no init argument) ----

  def duckPolyHash(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($s)+1), " +
      s"i -> CAST(ascii(substr($s, CAST(i AS INT), 1)) AS BIGINT))), (acc,x) -> (acc*31+x) % $P)"

  def duckShingles(w: String): String =
    s"list_distinct(list_transform(range(len($w)-2), i -> " +
      s"$w[CAST(i+1 AS INT)]||' '||$w[CAST(i+2 AS INT)]||' '||$w[CAST(i+3 AS INT)]))"

  def duckNGrams(w: String, n: Int): String =
    s"list_distinct(list_transform(range(len($w)-${n - 1}), i -> " +
      s"array_to_string($w[CAST(i+1 AS INT):CAST(i+$n AS INT)], ' ')))"

  def duckHashedSet(arr: String): String =
    s"list_distinct(list_transform($arr, s -> ${duckPolyHash("s")}))"

  def duckMinhash(hh: String): String =
    s"list_transform(range(${MinhashSigs}), i -> " +
      s"list_min(list_transform($hh, h -> ((2*i+1)*h + 1000003*i + 12345) % $P)))"

  def duckSimhash(hh: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), range(32)), (acc,j) -> acc + " +
      s"CASE WHEN list_reduce(list_prepend(CAST(0 AS BIGINT), $hh), (a2,h2) -> " +
      s"a2 + CASE WHEN (h2 >> CAST(j AS INT)) & 1 = 1 THEN 1 ELSE -1 END) > 0 " +
      s"THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END)"

  // ---- Quality gates and split assignment (single source of truth for
  // q129's reason bitmask, q133's pipeline gate, and the q123/q133
  // leakage-safe split: the composed pipeline must be incapable of
  // disagreeing with the standalone stages it composes) ----

  /** The five per-doc quality metrics over a words-array expr `w`, as
    * SELECT expressions; the gate predicates below are stated over their
    * aliases. Two dialect renderings of one definition.
    */
  def qualityMetricsSpark(w: String): Seq[String] = Seq(
    s"CAST(size($w) AS BIGINT) AS n_words",
    s"CAST(size(array_distinct($w)) AS BIGINT) AS n_distinct",
    s"CAST(size(filter($w, x -> array_contains($stopWordsSparkArray, x))) AS BIGINT) AS n_stop",
    s"IF(size($w) >= 3, CAST(size(${shinglesSql(w)}) AS BIGINT), CAST(0 AS BIGINT)) AS uniq3",
    s"CAST(greatest(size($w) - 2, 0) AS BIGINT) AS total3")

  def qualityMetricsDuck(w: String): Seq[String] = Seq(
    s"CAST(len($w) AS BIGINT) AS n_words",
    s"CAST(len(list_distinct($w)) AS BIGINT) AS n_distinct",
    s"CAST(len(list_filter($w, x -> list_contains($stopWordsDuckList, x))) AS BIGINT) AS n_stop",
    s"CASE WHEN len($w) >= 3 THEN CAST(len(${duckShingles(w)}) AS BIGINT) ELSE 0 END AS uniq3",
    s"CAST(GREATEST(len($w)-2, 0) AS BIGINT) AS total3")

  /** The four drop reasons (C4/Gopher-style), dialect-neutral SQL over the
    * metric aliases; all integer cross-multiplications, no float threshold.
    * Bit order is the q129 reasons contract.
    */
  val GateTooShort = "n_words < 20"
  val GateRepetitive = "total3 > 0 AND uniq3 * 50 < total3 * 49"
  val GateLowStopword = "n_stop * 20 < n_words"
  val GateLowTtr = "n_distinct * 10 <= n_words * 3"

  /** keep = no gate fires (metrics are never NULL, so NOT is two-valued). */
  val QualityKeep: String =
    s"NOT ($GateTooShort) AND NOT ($GateRepetitive) AND " +
      s"NOT ($GateLowStopword) AND NOT ($GateLowTtr)"

  /** Deterministic ~80/10/10 train/val/test assignment from an id expr via
    * the md5-prefix trick (fixed-width lowercase hex compares numerically:
    * 'cc'/256 = 80%, 'e6'/256 = 90%). No RNG, reproducible across engines;
    * key it on a duplicate group's canonical id for leakage-safety.
    */
  def splitCaseSpark(id: String): String = {
    val b = s"substring(md5(CAST(CAST($id AS STRING) AS BINARY)), 1, 2)"
    s"CASE WHEN $b < 'cc' THEN 'train' WHEN $b < 'e6' THEN 'val' ELSE 'test' END"
  }
  def splitCaseDuck(id: String): String = {
    val b = s"substring(md5(CAST($id AS VARCHAR)), 1, 2)"
    s"CASE WHEN $b < 'cc' THEN 'train' WHEN $b < 'e6' THEN 'val' ELSE 'test' END"
  }
}
