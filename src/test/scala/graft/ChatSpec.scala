package graft

import org.apache.spark.sql.functions._

import graft.ops.Chat

/** SFT conversation ops: the messages-convention parse (with
  * quarantine), the role-grammar validator on hand-built positives
  * and negatives, and the template render order. */
class ChatSpec extends SparkSuite {
  import spark.implicits._

  private def turnsOf(rows: (Long, String)*) =
    Chat.parseConversations(rows.toSeq.toDF("doc_id", "json"), "doc_id", "json")

  test("parse: long rows in turn order; malformed/missing/empty quarantine as -1") {
    val t = turnsOf(
      (1L, """{"messages":[{"role":"user","content":"hi"},{"role":"assistant","content":"yo"}]}"""),
      (2L, "not json at all"),
      (3L, """{"other": 5}"""),
      (4L, """{"messages":[]}"""))
      .as[(Long, Int, String, String)].collect().sortBy(r => (r._1, r._2))
    assert(t.toSeq == Seq(
      (1L, 0, "user", "hi"), (1L, 1, "assistant", "yo"),
      (2L, -1, null, null), (3L, -1, null, null), (4L, -1, null, null)))
  }

  test("validate: system optional, strict alternation, must end on assistant") {
    def msgs(roles: String*): String =
      s"""{"messages":[${roles.map(r => s"""{"role":"$r","content":"x"}""").mkString(",")}]}"""
    val cases = Seq(
      (1L, msgs("user", "assistant")) -> true,
      (2L, msgs("system", "user", "assistant", "user", "assistant")) -> true,
      (3L, msgs("assistant", "user")) -> false,          // starts wrong
      (4L, msgs("user", "user", "assistant")) -> false,  // double user
      (5L, msgs("user", "assistant", "user")) -> false,  // ends on user
      (6L, msgs("system")) -> false,                     // no body
      (7L, "junk") -> false,                             // quarantined
      // null role inside a >=2-turn conversation: the comparison is
      // NULL per-element — the verdict must coalesce to false, not
      // surface as a NULL callers filtering valid=false never see
      (8L, """{"messages":[{"role":null,"content":"x"},{"role":"assistant","content":"y"}]}""") -> false,
      (9L, msgs("user") + "") -> false)                  // single turn
    val got = Chat.validateAlternation(turnsOf(cases.map(_._1): _*))
      .select($"id", $"valid").as[(Long, Boolean)].collect().toMap
    cases.foreach { case ((id, _), want) => assert(got(id) == want, s"id=$id") }
  }

  test("render: template in turn order") {
    val got = Chat.renderTemplate(turnsOf(
      (1L, """{"messages":[{"role":"system","content":"S"},{"role":"user","content":"U"},{"role":"assistant","content":"A"}]}""")))
      .select($"text").as[String].collect().head
    assert(got == "<|system|>\nS<|end|>\n<|user|>\nU<|end|>\n<|assistant|>\nA<|end|>\n")
  }

  test("packer round trip over the corpus: shape and the id%7 plant") {
    val docs = sf("documents")
    val packed = Chat.packConversations(docs, "doc_id", "text")
    val turns = Chat.parseConversations(packed, "doc_id", "json")
    assert(turns.where($"turn" === -1).count() == 0)
    val valid = Chat.validateAlternation(turns)
      .select($"id", $"valid").as[(Long, Boolean)].collect()
    valid.foreach { case (id, v) => assert(v == (id % 7 != 0), s"id=$id") }
    // JSON escaping survives hostile content
    val hostile = Seq((1L, "he said \"hi\"\n\\ backslash")).toDF("doc_id", "text")
    val back = Chat.parseConversations(
      Chat.packConversations(hostile, "doc_id", "text"), "doc_id", "json")
      .where($"turn" === 0).select($"content").as[String].collect().head
    assert(back.contains("he said \"hi\"") && back.contains("\\ backslash"))
  }
}
