package graft.llm

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer

/** Mega-prompt payload codec (the "100x fewer API calls" mechanism —
  * reference: ondine/strategies/json_batch_strategy.py:35-99).
  *
  * Wire shape, built DataFrame-side by BatchAggregator with `to_json`:
  *
  *   <marker line>
  *   [{"id":0,"prompt":"..."},{"id":1,"prompt":"..."}]
  *
  * The model must reply `[{"id":0,"result":"..."}, ...]`. Ids are the
  * row's `_row_index` so disaggregation maps results back positionally
  * with gaps padded to null (reference: batch_disaggregator_stage.py:130-163).
  *
  * Jackson is used (already on the Spark classpath) only inside clients and
  * tests; DataFrame-side parsing uses `from_json`.
  */
object BatchCodec {
  private lazy val mapper = new ObjectMapper()

  /** First line of every mega-prompt: the instruction that tells the model
    * (and lets any client recognize) batch mode. */
  val BatchMarker =
    "Answer each item. Reply ONLY with a JSON array of {\"id\",\"result\"} objects."

  /** Build a mega-prompt from (rowIndex, prompt) items. Executor-side: the
    * Invoke operator batches partition-locally (no shuffle), so encoding
    * happens next to the call, not in a separate DataFrame stage. */
  def encodeMegaPrompt(marker: String, items: Seq[(Long, String)]): String = {
    val arr = mapper.createArrayNode()
    items.foreach { case (id, p) =>
      val o = arr.addObject()
      o.put("id", id)
      o.put("prompt", p)
    }
    marker + "\n" + mapper.writeValueAsString(arr)
  }

  /** Decode the items array from a full mega-prompt. */
  def decodeItems(megaPrompt: String): Seq[(Long, String)] = {
    val json = megaPrompt.substring(megaPrompt.indexOf('\n') + 1)
    val root = mapper.readTree(json)
    val out = ArrayBuffer.empty[(Long, String)]
    val it = root.elements()
    while (it.hasNext) {
      val node: JsonNode = it.next()
      out += ((node.get("id").asLong(), node.get("prompt").asText()))
    }
    out.toSeq
  }

  /** Encode a {"id","result"} reply array with proper JSON escaping —
    * results may themselves be JSON text (structured-output mode). */
  def encodeResults(items: Seq[(Long, String)]): String = {
    val arr = mapper.createArrayNode()
    items.foreach { case (id, r) =>
      val o = arr.addObject()
      o.put("id", id)
      o.put("result", r)
    }
    mapper.writeValueAsString(arr)
  }

  /** Decode a {"id","result"} reply array; malformed input yields Nil so the
    * caller can apply the partial-failure path. */
  def decodeResults(reply: String): Seq[(Long, String)] = try {
    val root = mapper.readTree(extractJsonArray(reply))
    val out = ArrayBuffer.empty[(Long, String)]
    val it = root.elements()
    while (it.hasNext) {
      val node = it.next()
      if (node.has("id") && node.has("result"))
        out += ((node.get("id").asLong(),
          if (node.get("result").isNull) null else node.get("result").asText()))
    }
    out.toSeq
  } catch { case _: Exception => Nil }

  /** Strict → code-fence → first-bracket fallback extraction chain
    * (reference: ondine/stages/response_parser_stage.py:60-81). */
  def extractJsonArray(text: String): String = {
    val t = text.trim
    if (t.startsWith("[")) t
    else {
      val fence = "```(?:json)?\\s*(\\[[\\s\\S]*?\\])\\s*```".r
      fence.findFirstMatchIn(t).map(_.group(1)).getOrElse {
        val i = t.indexOf('[')
        val j = t.lastIndexOf(']')
        if (i >= 0 && j > i) t.substring(i, j + 1) else t
      }
    }
  }
}
