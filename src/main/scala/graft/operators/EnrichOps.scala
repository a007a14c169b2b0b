package graft.operators

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.io.StableJson

/** LLM-enrichment orchestration (SURVEY §2.11 L1-L3; reference
  * process/llm_table_runner.py, speech_issue_classifier.py,
  * ridiculous_sentences_weekly.py:296-403). The model call sits behind an
  * injectable, serializable client so tests run deterministic stubs (no
  * network); the Spark side owns batching, retry, validation, repair,
  * bisection, and resume.
  */
object EnrichOps {

  /** Injectable model interface — one instance per executor partition. */
  trait ModelClient extends Serializable {
    def complete(prompt: String): String
  }

  /** Deterministic stub for offline tests and dry runs. */
  final class StubModelClient(fn: String => String) extends ModelClient {
    def complete(prompt: String): String = fn(prompt)
  }

  final case class EnrichConfig(
      idCol: String,
      varCols: Seq[String],          // ≤5 template variables (reference cap)
      outputCol: String,
      promptTemplate: String,        // "{colName}" placeholders
      maxRetries: Int = 3,
      requireNonEmpty: Boolean = true,
      maxWords: Int = 0,
      regexMustMatch: Option[String] = None,
      stripCitations: Boolean = false)

  /** Output cleaning (llm_table_runner.py:118-130): citation markers
    * stripped, whitespace collapsed, word clamp.
    */
  def cleanOutput(s: String, stripCitations: Boolean, maxWords: Int): String = {
    var t = Option(s).getOrElse("")
    if (stripCitations) t = t.replaceAll("\\[\\d+]", "")
    t = t.replaceAll("\\s+", " ").trim
    if (maxWords > 0) {
      val words = t.split(" ").filter(_.nonEmpty)
      if (words.length > maxWords) t = words.take(maxWords).mkString(" ")
    }
    t
  }

  private def render(template: String, vars: Map[String, String]): String =
    vars.foldLeft(template) { case (acc, (k, v)) =>
      acc.replace("{" + k + "}", Option(v).getOrElse(""))
    }

  /** L1 generic row enrich: render → call → clean → validate → one repair
    * retry → output column (null when invalid after repair). mapPartitions
    * so a real client initializes once per partition.
    */
  def enrichRows(df: DataFrame, cfg: EnrichConfig,
                 clientFactory: () => ModelClient): DataFrame = {
    val varCols = cfg.varCols.take(5)
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField(cfg.outputCol, StringType, nullable = true))
    val varIdx = varCols.map(c => c -> inSchema.fieldIndex(c)).toMap
    val template = cfg.promptTemplate
    val (retries, nonEmpty, maxWords, regex, strip) =
      (cfg.maxRetries, cfg.requireNonEmpty, cfg.maxWords, cfg.regexMustMatch, cfg.stripCitations)

    val enc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      val client = clientFactory()
      def validate(s: String): Boolean =
        (!nonEmpty || s.nonEmpty) && regex.forall(r => s.matches(r))
      def callValidated(prompt: String): String = {
        var last: String = null
        var attempt = 0
        var p = prompt
        while (attempt < math.max(1, retries)) {
          val raw = Try(client.complete(p)).getOrElse(null)
          if (raw != null) {
            val cleaned = cleanOutput(raw, strip, maxWords)
            if (validate(cleaned)) return cleaned
            last = cleaned
            p = prompt + "\n\nThe previous output was invalid. Return a corrected answer."
          }
          attempt += 1
        }
        null
      }
      it.map { row =>
        val vars = varIdx.map { case (c, i) =>
          c -> Option(row.get(i)).map(String.valueOf).getOrElse("")
        }
        Row.fromSeq(row.toSeq :+ callValidated(render(template, vars)))
      }
    }(enc)
  }

  /** L2 closed-set classification: enrich then canonicalize into the label
    * domain (speech_issue_classifier.py:52-78,172-181): exact
    * case-insensitive match, else substring containment, else fallback.
    */
  def classifyRows(df: DataFrame, cfg: EnrichConfig, labels: Seq[String],
                   fallback: String, clientFactory: () => ModelClient): DataFrame = {
    val enriched = enrichRows(df, cfg, clientFactory)
    val canon = labels.foldRight(lit(fallback)) { case (l, acc) =>
      when(lower(trim(col(cfg.outputCol))) === l.toLowerCase, lit(l))
        .otherwise(acc)
    }
    val contained = labels.foldRight(canon) { case (l, acc) =>
      when(lower(col(cfg.outputCol)).contains(l.toLowerCase), lit(l)).otherwise(acc)
    }
    enriched.withColumn(cfg.outputCol,
      when(col(cfg.outputCol).isNull, lit(fallback))
        .otherwise(when(canon =!= fallback, canon).otherwise(contained)))
  }

  /** M9 resumable variant: only rows whose id lacks a non-blank output in
    * `existing` are sent to the model; prior outputs are kept.
    */
  def enrichResumable(input: DataFrame, existing: DataFrame, cfg: EnrichConfig,
                      clientFactory: () => ModelClient): DataFrame = {
    val delta = MergeOps.missingDelta(input, existing, cfg.idCol, cfg.outputCol)
    val freshlyDone = enrichRows(delta, cfg, clientFactory)
    val kept = input.join(
        existing.filter(col(cfg.outputCol).isNotNull && trim(col(cfg.outputCol)) =!= "")
          .select(col(cfg.idCol), col(cfg.outputCol)),
        Seq(cfg.idCol), "inner")
    kept.unionByName(freshlyDone)
  }

  /** L3 batch JSON scoring with strict echo-back validation
    * (ridiculous_sentences_weekly.py:296-403 + experiments bisection):
    * per group, batches of `batchSize` are prompted with a JSON candidate
    * list; the reply must contain every id exactly once with an int score
    * (clamped 1-100); invalid replies get repair retries, then the batch
    * bisects; a single item that still fails scores null.
    */
  def scoreBatches(df: DataFrame, keyCol: String, idCol: String, textCol: String,
                   batchSize: Int, maxRetries: Int,
                   clientFactory: () => ModelClient): DataFrame = {
    val spark = df.sparkSession
    val enc = Encoders.row(StructType(Seq(
      StructField(keyCol, StringType), StructField(idCol, StringType),
      StructField("score", org.apache.spark.sql.types.LongType, nullable = true))))
    val rowEnc = Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING)

    val grouped = df.select(col(keyCol).cast("string"), col(idCol).cast("string"),
      col(textCol).cast("string")).as(rowEnc)
      .groupByKey(_._1)(Encoders.STRING)

    grouped.flatMapGroups { (key: String, it: Iterator[(String, String, String)]) =>
      val client = clientFactory()
      val items = it.map(t => (t._2, t._3)).toVector

      def scoreBatch(batch: Vector[(String, String)]): Map[String, Option[Long]] = {
        val expected = batch.map(_._1)
        val prompt = buildScoringPrompt(batch)
        var p = prompt
        var attempt = 0
        while (attempt < math.max(1, maxRetries)) {
          Try {
            val parsed = parseScores(client.complete(p), expected)
            return parsed.map { case (k, v) => k -> Some(v) }
          }.failed.foreach { e =>
            p = prompt + s"\n\nThe previous output was invalid because: ${e.getMessage}\nReturn only corrected valid JSON."
          }
          attempt += 1
        }
        if (batch.size > 1) {
          val (l, r) = batch.splitAt(batch.size / 2)
          scoreBatch(l) ++ scoreBatch(r)
        } else batch.map(_._1 -> None).toMap
      }

      items.grouped(batchSize).flatMap { batch =>
        val scores = scoreBatch(batch.toVector)
        batch.map { case (id, _) =>
          Row(key, id, scores.getOrElse(id, None).map(Long.box).orNull)
        }
      }
    }(enc)
  }

  /** Scoring prompt (ridiculous_sentences_weekly.py:296-331 shape). */
  def buildScoringPrompt(batch: Seq[(String, String)]): String = {
    val payload = StableJson.write(batch.map { case (id, text) =>
      Map("candidate_id" -> id, "sentence" -> text)
    })
    s"""Score each candidate sentence from 1 to 100.
       |Return ONLY valid JSON: an array of {"candidate_id": "...", "score": N}
       |with every candidate_id exactly once.
       |Candidates:
       |$payload""".stripMargin
  }

  /** Echo-back validation (ridiculous_sentences_weekly.py:334-361): every
    * expected id exactly once, no extras, int scores clamped to [1,100].
    */
  def parseScores(text: String, expectedIds: Seq[String]): Map[String, Long] = {
    val json = extractJsonPayload(text)
    val items = StableJson.parse(json) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].get("scores") match {
        case Some(v: Seq[_]) => v
        case _ => throw new IllegalArgumentException("JSON payload is not a list.")
      }
      case v: Seq[_] => v
      case _ => throw new IllegalArgumentException("JSON payload is not a list.")
    }
    val scores = items.collect { case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      val cid = mm.get("candidate_id").map(String.valueOf).getOrElse("").trim
      val score = mm.get("score").flatMap(v => Try(String.valueOf(v).toDouble.toLong).toOption)
      (cid, score)
    }.collect { case (cid, Some(s)) if cid.nonEmpty => cid -> math.max(1L, math.min(100L, s)) }
      .toMap
    val missing = expectedIds.filterNot(scores.contains)
    val extras = scores.keys.filterNot(expectedIds.toSet)
    if (missing.nonEmpty || extras.nonEmpty)
      throw new IllegalArgumentException(
        s"Invalid score payload. Missing=${missing.take(5)} Extras=${extras.take(5).toSeq}")
    scores
  }

  /** Lenient JSON extraction (markdown fences, prose wrapping). */
  def extractJsonPayload(text: String): String = {
    val t = text.trim
    if (t.startsWith("[") || t.startsWith("{")) t
    else {
      val starts = Seq(t.indexOf('['), t.indexOf('{')).filter(_ >= 0)
      if (starts.isEmpty) throw new IllegalArgumentException("No JSON payload found.")
      val s = starts.min
      val e = math.max(t.lastIndexOf(']'), t.lastIndexOf('}'))
      if (e <= s) throw new IllegalArgumentException("No JSON payload found.")
      t.substring(s, e + 1)
    }
  }
}
