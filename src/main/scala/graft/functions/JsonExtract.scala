package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON payload extraction layer (SURVEY.md §2.2 P3-P9, P13).
  *
  * The reference's API payloads carry object-typed fields (`user`,
  * `fromUser`, `fromGroup`, `group`) and an array field (`customFields`)
  * that arrive as a dict, a JSON string, or a Python-repr string
  * (reference utils.py:16-26 `safe_eval`). Here every extractor takes a
  * STRING column and goes through `from_json` after [[looseJson]]
  * normalization — pure built-ins, whole-stage-codegen-friendly.
  */
object JsonExtract {

  /** Normalize a loose payload string into strict JSON (the `safe_eval`
    * analog, reference utils.py:16-26): Python-repr single quotes →
    * double quotes, None/True/False → null/true/false. Handles the doc
    * shapes the Callio API actually emits (flat reprs without embedded
    * apostrophes); payloads already in strict JSON pass through
    * unchanged. Strings containing literal apostrophes inside values are
    * out of scope (documented deviation — the reference's
    * `ast.literal_eval` accepts them, we null them via from_json failure).
    */
  def looseJson(c: Column): Column = {
    val singleToDouble = regexp_replace(c, "'", "\"")
    val noneFixed = regexp_replace(
      regexp_replace(
        regexp_replace(singleToDouble, ": None", ": null"),
        ": True", ": true"),
      ": False", ": false")
    noneFixed
  }

  /** Schema for `user`-like objects where `group` is itself an object. */
  val userStructSchema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("id", StringType),
    StructField("name", StringType),
    StructField("group", StructType(Seq(
      StructField("_id", StringType), StructField("id", StringType))))))

  /** Schema variant where `group` is a bare scalar string. */
  val userScalarGroupSchema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("id", StringType),
    StructField("name", StringType), StructField("group", StringType)))

  private def userObj(user: Column): Column =
    from_json(looseJson(user), userStructSchema)

  private def userObjScalarGroup(user: Column): Column =
    from_json(looseJson(user), userScalarGroupSchema)

  // A nested-type mismatch (scalar `group` against the struct schema, or
  // vice versa) nulls the ENTIRE permissive from_json result, so every
  // extractor parses under both schemas and coalesces per field — the
  // shape that parses wins, mirroring safe_eval's shape tolerance.

  /** `user` → `._id` else `.id` (reference utils.py:158-174). */
  def userId(user: Column): Column = {
    val u = userObj(user); val v = userObjScalarGroup(user)
    coalesce(u.getField("_id"), u.getField("id"),
      v.getField("_id"), v.getField("id"))
  }

  /** `user` → `.name` (reference utils.py:177-187). */
  def userName(user: Column): Column =
    coalesce(userObj(user).getField("name"),
      userObjScalarGroup(user).getField("name"))

  /** `user` → `.group._id` / `.group.id` / scalar `.group`
    * (reference utils.py:190-203). Parsed twice — once with an object
    * `group`, once with a scalar — and coalesced, because the payload
    * legitimately carries either shape.
    */
  def userGroupId(user: Column): Column = {
    val obj = userObj(user).getField("group")
    coalesce(obj.getField("_id"), obj.getField("id"),
      userObjScalarGroup(user).getField("group"))
  }

  /** Simple object flatten used for `fromUser`/`fromGroup`/staff `group`
    * (reference runner.py:283-298, 329-331): `field` of the parsed object.
    */
  def objField(payload: Column, field: String): Column =
    from_json(looseJson(payload), userStructSchema).getField(field)

  // ---------------------------------------------------------------------
  // customFields → customField_0_val (reference utils.py:104-155).
  // ---------------------------------------------------------------------

  /** Element schema of the customFields array. `val`/`value`/`text`/`name`
    * are scalars; `values` is the list-valued variant.
    */
  val customFieldSchema: ArrayType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("val", StringType), StructField("value", StringType),
    StructField("values", ArrayType(StringType)),
    StructField("text", StringType), StructField("name", StringType))))

  /** The reference's cf0 derivation (utils.py:104-155), faithfully:
    * 1. first element whose normalized key equals `targetKey`
    *    (trim+lowercase, utils.py:127-128);
    * 2. raw = first *truthy* (non-null, non-empty — Python `or`
    *    semantics, untrimmed) of val | value | values | text | name
    *    (utils.py:134);
    * 3. listify, trim items, drop empties, order-preserving dedup,
    *    `" | "` join (utils.py:138-153); empty result → null.
    */
  /** Evaluate `c` ONCE and feed the result to `body` as a bound lambda
    * variable. A Scala `val` holding a Column DUPLICATES its expression
    * tree at every reference — and from_json / higher-order lambdas are
    * CodegenFallback, so no common-subexpression elimination rescues
    * the duplicates at runtime (the cf0 derivation references its
    * parsed match ~8 times: measured ~4x the whole query's cost at
    * sf0.1). Routing the value through a one-element transform binds it
    * to a lambda variable, which IS a runtime reference.
    */
  private def bindOnce(c: Column, body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  def customField0(customFields: Column, targetKey: String = "tinh-trang-kh"): Column = {
    val arr = from_json(looseJson(customFields), customFieldSchema)
    bindOnce(element_at(
        filter(arr, x => lower(trim(x.getField("key"))) === targetKey), 1), m => {
      def truthy(c: Column): Column = c.isNotNull && c =!= ""
      val raw = when(truthy(m.getField("val")), array(m.getField("val")))
        .when(truthy(m.getField("value")), array(m.getField("value")))
        .when(m.getField("values").isNotNull && size(m.getField("values")) > 0,
          m.getField("values"))
        .when(truthy(m.getField("text")), array(m.getField("text")))
        .when(truthy(m.getField("name")), array(m.getField("name")))
      bindOnce(raw, r =>
        bindOnce(array_distinct(filter(transform(r, trim(_)), x => x =!= "")),
          cleaned =>
            when(m.isNull || r.isNull || size(cleaned) === 0,
              lit(null).cast(StringType))
              .otherwise(array_join(cleaned, " | "))))
    })
  }
}
