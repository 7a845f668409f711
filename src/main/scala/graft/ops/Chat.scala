package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Conversation (SFT) corpus preparation — the ops an instruction-
  * tuning data pipeline runs between "raw conversation JSONL" and
  * "token-ready training text": parse the messages convention, check
  * the role grammar, and render a chat template. All three are pure
  * column expressions / aggregations (codegen'd, no UDFs); per-
  * conversation state is bounded by the turn count, and the only
  * shuffle is the one groupBy(conversation) that any per-dialog
  * operation fundamentally needs.
  *
  * The wire convention is the `{"messages": [{"role": ...,
  * "content": ...}]}` shape the OpenAI/ShareGPT-style SFT corpora
  * standardized on.
  */
object Chat {

  private val MessagesSchema = StructType(Seq(
    StructField("messages", ArrayType(StructType(Seq(
      StructField("role", StringType),
      StructField("content", StringType)))))))

  /** Parse conversation JSON to long rows (id, turn, role, content).
    * Malformed JSON, a JSON without a messages array, and an empty
    * conversation all quarantine as a single turn = -1 row (the
    * archive-rung contract) — `posexplode_outer` emits exactly that
    * null row for a null/empty array. */
  def parseConversations(df: DataFrame, idCol: String, jsonCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      from_json(col(jsonCol), MessagesSchema).getField("messages").as("msgs"))
      .select(col("id"), posexplode_outer(col("msgs")))
      .select(col("id"), coalesce(col("pos"), lit(-1)).as("turn"),
        col("col.role").as("role"), col("col.content").as("content"))

  /** Per-conversation role-grammar check — the SFT convention: an
    * optional leading `system`, then strictly alternating
    * `user`/`assistant` starting with user and ending with
    * assistant. Implemented as an aggregation over the sorted turn
    * array (state = one conversation, no Window): (id, n_turns,
    * valid). */
  def validateAlternation(turns: DataFrame): DataFrame = {
    val sorted = turns.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("turn"), col("role")))).as("ts"))
      .select(col("id"), transform(col("ts"), t => t.getField("role")).as("roles"))
    // drop an optional leading system, then the parity rule
    val body = when(element_at(col("roles"), 1) === "system",
      slice(col("roles"), lit(2), size(col("roles")))).otherwise(col("roles"))
    // coalesce: a NULL role inside the conversation makes the
    // element comparison (and so the forall) NULL — that's a
    // malformed conversation, and callers filtering valid = false
    // must see it, not a NULL verdict
    sorted.select(col("id"), size(col("roles")).as("n_turns"),
      coalesce(
        size(body) >= 2 && size(body) % 2 === 0 &&
          forall(zip_with(body, sequence(lit(0), size(body) - 1),
            (r, i) => r === when(i % 2 === 0, "user").otherwise("assistant")),
            x => x),
        lit(false)).as("valid"))
  }

  /** Render one training text per conversation with a minimal chat
    * template: `<|role|>\ncontent<|end|>\n` per turn, turn order. */
  def renderTemplate(turns: DataFrame): DataFrame =
    turns.groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("turn"), col("role"), col("content")))).as("ts"))
      .select(col("id"),
        array_join(transform(col("ts"), t =>
          concat(lit("<|"), t.getField("role"), lit("|>\n"),
            t.getField("content"), lit("<|end|>\n"))), "").as("text"))

  /** Gate packer: one conversation JSON per document from id
    * arithmetic — id%3+1 user/assistant pairs, a leading system turn
    * when id%4 == 0, and a planted GRAMMAR VIOLATION when id%7 == 0
    * (the closing assistant turn becomes a second user turn), so the
    * validator has real negatives. Content derives from the corpus
    * text (JSON-escaped). */
  def packConversations(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col(idCol).isNotNull)
      .select(col(idCol).cast("long"), coalesce(col(textCol), lit("")))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val snippet = text.take(40)
        val pairs = (id % 3 + 1).toInt
        val b = Vector.newBuilder[(String, String)]
        if (id % 4 == 0) b += (("system", s"You are helper $id."))
        var p = 0
        while (p < pairs) {
          b += (("user", s"Q$p: $snippet"))
          val lastRole = if (p == pairs - 1 && id % 7 == 0) "user" else "assistant"
          b += ((lastRole, s"A$p for doc $id"))
          p += 1
        }
        val msgs = b.result().map { case (role, content) =>
          s"""{"role":${jsonStr(role)},"content":${jsonStr(content)}}"""
        }
        (id, s"""{"messages":[${msgs.mkString(",")}]}""")
      })
      .toDF("doc_id", "json")
  }

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}
