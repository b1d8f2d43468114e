package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  test("withExtensions sessions get graft_* functions in plain SQL") {
    val shared = TestSpark.spark // ensure the shared context exists
    // getOrCreate returns the active session (ignoring extensions), so drop
    // the active/default references to force a genuinely new session whose
    // build path applies the extensions; restore the shared one after.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = s.sql("SELECT graft_polyhash('abc') AS h").collect()(0).getLong(0)
      val expected = ((('a'.toLong * 31 + 'b') % 1000000007L) * 31 + 'c') % 1000000007L
      assert(r == expected)
      val d = s.sql(
        "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()(0).getDouble(0)
      assert(d == 11.0)
      val di = s.sql(
        "SELECT graft_doti(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
        .collect()(0).getLong(0)
      assert(di == 32L)
      val sq = s.sql(
        "SELECT graft_sqdisti(array(1L, 2L), array(4L, 6L)) AS d")
        .collect()(0).getLong(0)
      assert(sq == 25L)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
