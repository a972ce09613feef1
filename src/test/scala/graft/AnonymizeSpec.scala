package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import graft.operators.Anonymize

class AnonymizeSpec extends SparkSpec {
  import spark.implicits._

  test("nonce is deterministic per seed") {
    assert(Anonymize.nonce(42L) == Anonymize.nonce(42L))
    assert(Anonymize.nonce(42L) != Anonymize.nonce(43L))
  }

  test("ID_OWNER digest matches a reference sha-256 computation") {
    val (pre, suf) = Anonymize.nonce(7L)
    val df = Seq(("Alice", "Smith")).toDF("first", "last")
    val got = df.select(Anonymize.idOwnerExpr(Seq("first", "last"),
      pre, suf).as("id")).as[String].collect()(0)
    val exp = MessageDigest.getInstance("SHA-256")
      .digest(s"${pre}AliceSmith$suf".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(got == exp)
  }

  test("anonymize: rows preserved, private cols replaced by ID_OWNER") {
    val df = Seq((1, "Alice"), (2, "Bob"), (3, "Alice"))
      .toDF("k", "name")
    val (anonym, priv) = Anonymize.anonymize(df, Seq("name"), Seq("name"))
    assert(anonym.count() == 3)
    assert(!anonym.columns.contains("name"))
    assert(anonym.columns.contains("ID_OWNER"))
    // same private value -> same pseudonym
    val ids = anonym.select("k", "ID_OWNER").as[(Int, String)]
      .collect().toMap
    assert(ids(1) == ids(3) && ids(1) != ids(2))
    assert(priv.count() == 2) // deduplicated dimension
  }

  test("null private values fill with ---- before hashing") {
    val df = Seq((1, Some("Alice")), (2, None)).toDF("k", "name")
    val (anonym, _) = Anonymize.anonymize(df, Seq("name"), Seq("name"))
    assert(anonym.count() == 2) // null row survives via the fill
  }
}
