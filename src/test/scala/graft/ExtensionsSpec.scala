package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions injection path: a session built with
  * GraftExtensions resolves vec_dot without any runtime registration. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) makes vec_dot resolvable at build time") {
    // Force the fixture session into existence first so its SparkContext is
    // reused, then build a SEPARATE session object with the extensions.
    val base = SparkFixture.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val withExt = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      try {
        val r = withExt.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
          .collect()(0).getDouble(0)
        assert(r == 11.0)
      } finally {
        // Session objects share the context; only clear the references.
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
