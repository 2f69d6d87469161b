package graft

import graft.functions.JsonExtract._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class JsonExtractSpec extends SparkSpec {

  private def one(json: String): Row =
    df("user STRING", Row(json))
      .select(userId(col("user")).as("id"), userName(col("user")).as("n"),
        userGroupId(col("user")).as("g"))
      .head()

  test("strict JSON with object group") {
    val r = one("""{"_id":"u1","name":"Ann","group":{"_id":"g9"}}""")
    assert(r.toSeq == Seq("u1", "Ann", "g9"))
  }

  test("id-variant keys fall back (_id → id, group._id → group.id)") {
    val r = one("""{"id":"u2","name":"Bob","group":{"id":"g8"}}""")
    assert(r.toSeq == Seq("u2", "Bob", "g8"))
  }

  test("python-repr payload with scalar group") {
    val r = one("{'_id': 'u3', 'name': 'Chi', 'group': 'g7'}")
    assert(r.toSeq == Seq("u3", "Chi", "g7"))
  }

  test("null and garbage payloads extract to nulls") {
    assert(one(null).toSeq == Seq(null, null, null))
    assert(one("not json at all").toSeq == Seq(null, null, null))
  }

  test("looseJson normalizes None/True/False tokens") {
    val r = df("s STRING", Row("{'a': None, 'b': True, 'c': False}"))
      .select(looseJson(col("s"))).head().getString(0)
    assert(r == """{"a": null, "b": true, "c": false}""")
  }

  private def cf0(json: String): String = {
    val r = df("cf STRING", Row(json))
      .select(customField0(col("cf")).as("v")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("cf0: val branch with key normalization") {
    assert(cf0("""[{"key":" Tinh-Trang-KH ","val":"OK"}]""") == "OK")
  }

  test("cf0: empty val falls through to value (Python `or` truthiness)") {
    assert(cf0("""[{"key":"tinh-trang-kh","val":"","value":"V2"}]""") == "V2")
  }

  test("cf0: values list trims, drops empties, dedups order-preserving, joins") {
    assert(cf0("""[{"key":"tinh-trang-kh","values":[" b ","a","b",""]}]""") == "b | a")
  }

  test("cf0: whitespace-only val wins truthiness then strips to null (no fallback)") {
    // Python: raw=' ' is truthy → selected; strip → '' → dropped → None,
    // WITHOUT falling through to "value".
    assert(cf0("""[{"key":"tinh-trang-kh","val":" ","value":"V2"}]""") == null)
  }

  test("cf0: first matching element wins; no match → null") {
    assert(cf0("""[{"key":"x","val":"no"},{"key":"tinh-trang-kh","text":"T"}]""") == "T")
    assert(cf0("""[{"key":"x","val":"no"}]""") == null)
    assert(cf0(null) == null)
  }

  test("cf0: python-repr array with name fallback") {
    assert(cf0("[{'key': 'tinh-trang-kh', 'val': None, 'name': 'NM'}]") == "NM")
  }
}
