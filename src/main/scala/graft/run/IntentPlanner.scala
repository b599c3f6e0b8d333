package graft.run

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.DataFrame

import graft.core._
import graft.llm.LlmClient

/** Intent layer: "describe the task, get a pipeline" (reference:
  * ondine/orchestration/intent/planner.py:365-456). Exactly ONE structured
  * LLM call drafts (input_columns, output_columns, prompt_template,
  * response_format) from the user's goal plus a bounded data sample; the
  * draft is then defensively validated against the REAL schema — a
  * hallucinated column name or an input/output overlap is a clear error
  * here, not a cryptic failure at execution time
  * (planner.py:241-283). Nothing is executed by plan() itself.
  */
object IntentPlanner {

  /** System message for the drafting call (planner.py:316-325 contract:
    * never invent columns; template must use {column} placeholders). */
  val PlannerSystem: String =
    "You are an expert data-engineering assistant. Given a small sample " +
      "of tabular data and a user's goal, you draft the configuration for " +
      "an LLM batch-processing pipeline. You choose which existing " +
      "columns to feed into the prompt, which new columns the model " +
      "should produce, the prompt template itself, and the response " +
      "format. You never invent column names that are not in the " +
      "provided sample. The prompt template MUST reference each input " +
      "column with {column_name} placeholders. Reply with ONLY a JSON " +
      "object with keys: input_columns (array), output_columns (array), " +
      "prompt_template (string), system_message (string or null), " +
      "response_format (\"raw\" or \"json\"), rationale (string)."

  /** The LLM's draft, parsed but not yet validated. */
  final case class Draft(
      inputColumns: Seq[String],
      outputColumns: Seq[String],
      promptTemplate: String,
      systemMessage: Option[String],
      responseFormat: String,
      rationale: String)

  /** A validated plan: a runnable spec + the drafting provenance. */
  final case class Plan(spec: PipelineSpec, goal: String, rationale: String) {
    /** Execute the drafted pipeline (the Plan.build().run() arc). */
    def run(df: DataFrame, client: LlmClient,
            runDir: Option[String] = None): EnrichResult =
      new Enricher(spec, client, runDir).enrich(df)

    /** Projected spend for `df` under the drafted spec (10-row sample,
      * sample-based confidence — the reference Plan.estimated_cost). */
    def estimatedCost(df: DataFrame): CostEstimate =
      CostEstimator.estimate(df, spec)

    /** Human-reviewable rendering of the draft — inspect/edit before
      * running (the reference's Plan.preview_yaml). */
    def preview: String = {
      val o = spec.output
      s"""goal: $goal
         |rationale: $rationale
         |input_columns: ${spec.dataset.inputColumns.mkString("[", ", ", "]")}
         |output_columns: ${o.outputColumns.mkString("[", ", ", "]")}
         |prompt_template: ${spec.prompt.template}
         |system_message: ${spec.prompt.systemMessage.getOrElse("~")}
         |response_format: ${o.responseFormat.toString.toLowerCase}
         |model: ${spec.llm.model}
         |max_budget: ${spec.processing.maxBudget.getOrElse("~")}""".stripMargin
    }
  }

  /** Drafting prompt: goal + schema + ≤`sampleRows` truncated rows
    * (planner.py:328-345 — the prompt is the whole contract). */
  def buildPrompt(goal: String, columns: Seq[String],
                  sampleJson: Seq[String]): String = {
    val mapper = new ObjectMapper()
    s"Goal:\n$goal\n\n" +
      s"Available columns:\n${mapper.writeValueAsString(columns.toArray)}\n\n" +
      s"Sample rows (truncated, up to ${sampleJson.size}):\n" +
      sampleJson.mkString("[\n", ",\n", "\n]") + "\n\n" +
      "Draft a pipeline configuration that achieves the goal using only " +
      "the available columns. Return the draft in the required structured " +
      "shape."
  }

  /** One structured drafting call + defensive validation → Plan.
    *
    * Driver-side by design: the ≤`sampleRows`-row sample is the one
    * deliberate materialization (the reference shows the LLM up to 50
    * rows, planner.py:217-233); long string cells truncate to 200 chars
    * before leaving the executors.
    */
  def plan(df: DataFrame, goal: String, budget: BigDecimal,
           client: LlmClient, model: String = "mock",
           sampleRows: Int = 50): Plan = {
    val cleanGoal = Option(goal).map(_.trim).getOrElse("")
    require(cleanGoal.nonEmpty, "goal must be a non-empty description of the task")
    require(budget > 0, s"budget must be positive, got $budget")

    val columns = df.columns.toSeq
    // truncate long cells BEFORE collecting (essays/base64 stay small)
    import org.apache.spark.sql.functions.{col, substring}
    val truncated = df.select(columns.map { c =>
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.StringType =>
          substring(col(c), 1, 200).as(c)
        case _ => col(c)
      }
    }: _*)
    val sample = truncated.limit(sampleRows).toJSON.collect().toSeq
    require(sample.nonEmpty, "cannot plan against an empty dataset")

    val reply = client.invoke(
      buildPrompt(cleanGoal, columns, sample), Some(PlannerSystem))
    val draft = parseDraft(reply.text)
    validate(draft, columns, cleanGoal, budget, model)
  }

  /** Driver-side JSON extraction with the same fallback chain as the
    * response parser stage (strict → ```json fence → brace scan) —
    * drafting models wrap JSON in chat prose too. */
  private def extractJsonString(text: String): Option[String] = {
    val mapper = new ObjectMapper()
    def tryParse(s: String): Option[String] =
      try { mapper.readTree(s); Some(s) } catch { case _: Exception => None }
    tryParse(text.trim).orElse {
      val fence = """(?s)```(?:json)?\s*(\{.*?\})\s*```""".r
      fence.findFirstMatchIn(text).map(_.group(1)).flatMap(tryParse)
    }.orElse {
      val i = text.indexOf('{'); val j = text.lastIndexOf('}')
      if (i >= 0 && j > i) tryParse(text.substring(i, j + 1)) else None
    }
  }

  /** Parse the draft JSON (strict, then the fenced/brace fallback the
    * response parser uses — drafting models wrap JSON too). */
  def parseDraft(text: String): Draft = {
    val json = extractJsonString(text).getOrElse(
      throw new IllegalArgumentException(
        s"planner reply is not JSON: ${text.take(200)}"))
    val mapper = new ObjectMapper()
    val n = mapper.readTree(json)
    def strs(k: String): Seq[String] = {
      val arr = n.path(k)
      require(arr.isArray, s"draft field '$k' must be a JSON array")
      (0 until arr.size).map(i => arr.get(i).asText)
    }
    Draft(
      inputColumns = strs("input_columns"),
      outputColumns = strs("output_columns"),
      promptTemplate = n.path("prompt_template").asText(""),
      systemMessage = Option(n.path("system_message").textValue()),
      responseFormat = n.path("response_format").asText("raw"),
      rationale = n.path("rationale").asText(""))
  }

  /** Defensive checks (planner.py:241-283), then spec assembly. */
  private def validate(draft: Draft, dataCols: Seq[String], goal: String,
                       budget: BigDecimal, model: String): Plan = {
    val colSet = dataCols.toSet
    val missing = draft.inputColumns.filterNot(colSet)
    require(missing.isEmpty,
      s"LLM drafted input_columns ${missing.mkString("[", ", ", "]")} not " +
        s"present in data. Available columns: ${dataCols.sorted.mkString(", ")}")
    val overlap = draft.inputColumns.toSet intersect draft.outputColumns.toSet
    require(overlap.isEmpty,
      s"input_columns and output_columns overlap: ${overlap.toSeq.sorted.mkString(", ")}; " +
        "output_columns must be new columns")
    require(draft.outputColumns.nonEmpty, "draft has no output_columns")
    require(draft.promptTemplate.nonEmpty, "draft has no prompt_template")
    // placeholders must be drafted inputs (no invented columns in the template)
    val placeholders = TemplateCompiler.variables(draft.promptTemplate, None)
    val phantom = placeholders.filterNot(colSet)
    require(phantom.isEmpty,
      s"prompt_template references columns not in the data: ${phantom.mkString(", ")}")

    val fmt = draft.responseFormat.toLowerCase match {
      case "raw" if draft.outputColumns.size > 1 =>
        ResponseFormat.Json // auto-promote: multi-column needs parsing
      case "raw"  => ResponseFormat.Raw
      case "json" => ResponseFormat.Json
      case other => throw new IllegalArgumentException(
        s"LLM drafted unsupported response_format '$other'; expected raw|json")
    }
    val spec = PipelineSpec(
      dataset = DatasetSpec(inputColumns = draft.inputColumns),
      prompt = PromptSpec(template = draft.promptTemplate,
        systemMessage = draft.systemMessage),
      llm = LlmSpec(model = model),
      processing = ProcessingSpec(maxBudget = Some(budget)),
      output = OutputSpec(outputColumns = draft.outputColumns,
        responseFormat = fmt))
    spec.validate()
    Plan(spec, goal, draft.rationale)
  }
}
