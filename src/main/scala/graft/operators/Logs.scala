package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log-body analytics over the flattened log table the OTLP readers and the
  * seal export produce — the queries an operator asks of LOG CONTENT beyond
  * row-level scans: what message shapes exist, and how often.
  *
  * Reference anchor: the flattened log schema (body, severity, service —
  * /root/reference/src/include/otlp_schema.hpp logs columns) is the
  * reference's storage surface; template mining itself is beyond-reference
  * surface, built the Spark way.
  */
object Logs {

  /** Log TEMPLATE mining — the batch-deterministic core of the Drain idea
    * (He et al. 2017, "Drain: An Online Log Parsing Approach with Fixed
    * Depth Tree"): messages are grouped by token count, and a token
    * position is a PARAMETER position when the number of distinct tokens
    * observed there (within the group) exceeds `maxDistinct`; a message's
    * template keeps its own tokens at constant positions and masks
    * parameter positions with `<*>`. Returns one row per (template,
    * token count) with its message count.
    *
    * Unlike streaming Drain, the rule is a pure function of the corpus
    * (no arrival-order dependence, no similarity threshold drift), so the
    * same data always yields the same templates in any engine — which is
    * what makes an exact SQL oracle possible.
    *
    * Shape at 100 TB: one explode to (token-count, position, token) rows
    * partial-aggregated on low-cardinality uniform keys (lengths ×
    * positions); the variable-position table is kilobytes and broadcasts
    * back; template assembly is MAP-ONLY over each row's own token array
    * (no second explode); the final rollup shuffles template-keyed
    * partials. The corpus is never joined to itself. */
  def logTemplates(logs: DataFrame, maxDistinct: Int = 8,
                   bodyCol: String = "body"): DataFrame = {
    require(maxDistinct >= 1, "maxDistinct must be positive")
    val toks = logs
      .where(col(bodyCol).isNotNull && trim(col(bodyCol)) =!= "")
      .select(split(trim(col(bodyCol)), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
    // distinct tokens per (token count, position): tiny, uniform keys
    val varPos = toks
      .select(col("n"), posexplode(col("toks")))
      .groupBy("n", "pos").agg(countDistinct("col").as("card"))
      .where(col("card") > maxDistinct)
      .groupBy("n").agg(sort_array(collect_list("pos")).as("var_pos"))
    toks.join(broadcast(varPos), Seq("n"), "left")
      .withColumn("vp", coalesce(col("var_pos"),
        array().cast("array<int>")))
      // i is 0-based, matching posexplode's pos
      .withColumn("template", concat_ws(" ",
        expr("transform(toks, (t, i) -> " +
          "IF(array_contains(vp, CAST(i AS INT)), '<*>', t))")))
      .groupBy(col("template"), col("n").as("n_tokens"))
      .agg(count(lit(1)).as("n_logs"))
  }

  /** Classify log bodies against a KNOWN template set (the output of
    * [[logTemplates]], typically mined from yesterday's corpus): adds a
    * `template` column holding the best match — same token count, every
    * constant position equal — or null for novel shapes. When several
    * templates match, the most specific (fewest `<*>` slots, then lexical)
    * wins, deterministically.
    *
    * MAP-ONLY AND STATELESS: the template set compiles into a plan-literal
    * CASE cascade (templates are a mined artifact — hundreds, not
    * millions), so this attaches to any STREAMING plan in append mode with
    * no state store — the batch-mines/stream-classifies split that makes
    * template analytics deployable on a live log stream. */
  def matchTemplates(logs: DataFrame, templates: Seq[String],
                     bodyCol: String = "body"): DataFrame = {
    require(templates.nonEmpty, "empty template set")
    require(templates.size <= 10000,
      "template set too large for a plan-literal cascade; shard it")
    val toks = split(trim(col(bodyCol)), "\\s+")
    val ordered = templates.distinct
      .sortBy(t => (t.trim.split("\\s+").count(_ == "<*>"), t))
    val arms = ordered.map { t =>
      val tt = t.trim.split("\\s+")
      // try_element_at: ANSI mode makes plain element_at a runtime error
      // on bodies shorter than the template (evaluation order of the
      // combined predicate is not guaranteed to check length first)
      val cond = tt.zipWithIndex.collect {
        case (tok, i) if tok != "<*>" =>
          try_element_at(toks, lit(i + 1)) === lit(tok)
      }.foldLeft(size(toks) === tt.length)(_ && _)
      when(cond, lit(t))
    }
    logs.withColumn("template",
      coalesce(arms :+ lit(null).cast("string"): _*))
  }

  /** Parameter extraction for one template: the values that filled each
    * `<*>` slot, with occurrence counts — the drill-down a template view
    * links to. MAP-ONLY filter on the template's shape (token count +
    * constant-position equality) followed by one slot-keyed partial agg. */
  def templateParams(logs: DataFrame, template: String,
                     bodyCol: String = "body"): DataFrame = {
    val tToks = template.trim.split("\\s+")
    val n = tToks.length
    require(tToks.contains("<*>"), "template has no <*> parameter slots")
    val slots = tToks.zipWithIndex.filter(_._1 == "<*>").map(_._2)
    val base = logs
      .where(col(bodyCol).isNotNull && trim(col(bodyCol)) =!= "")
      .select(split(trim(col(bodyCol)), "\\s+").as("toks"))
      .where(size(col("toks")) === n)
    val constMatch = tToks.zipWithIndex.collect {
      case (t, i) if t != "<*>" => // try_: ANSI-safe under filter reordering
        try_element_at(col("toks"), lit(i + 1)) === lit(t)
    }.reduceOption(_ && _).getOrElse(lit(true))
    base.where(constMatch)
      .select(explode(array(slots.map(i =>
        struct(lit(i).as("slot"),
          element_at(col("toks"), i + 1).as("value"))): _*)).as("p"))
      .select(col("p.slot").as("slot"), col("p.value").as("value"))
      .groupBy("slot", "value").agg(count(lit(1)).as("n"))
  }
}
