package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("graft SQL functions register via SparkSessionExtensions") {
    // extensions bind at session-creation time; force a NEW session (it
    // shares any existing SparkContext) and restore the default after.
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT graft_nfc('café') AS nfc, " +
          "graft_truncate_words('alpha beta gamma delta', 12) AS cut")
        .head()
      assert(r.getString(0) == "caf\u00e9",
        "combining acute must NFC-compose")
      assert(r.getString(1) == "alpha beta")
    } finally {
      SparkSession.clearActiveSession()
      prevDefault match {
        case Some(s) => SparkSession.setDefaultSession(s)
        case None    => ()
      }
    }
  }
}
