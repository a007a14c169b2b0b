package graft.io

/** Canonical JSON serialization (SURVEY §2.1 S9; reference
  * normalize.py:68-70 stable_json_dumps): sorted keys, compact separators,
  * non-ASCII preserved, unknown types stringified — byte-stable across
  * runs so manifests diff cleanly and record hashes are reproducible.
  */
object StableJson {

  def write(value: Any): String = value match {
    case null => "null"
    case b: Boolean => if (b) "true" else "false"
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) {
      val asLong = d.toLong
      s"$asLong.0"
    } else d.toString
    case s: String => quote(s)
    case m: collection.Map[_, _] =>
      m.toSeq.map { case (k, v) => (String.valueOf(k), v) }
        .sortBy(_._1)
        .map { case (k, v) => quote(k) + ":" + write(v) }
        .mkString("{", ",", "}")
    case s: Iterable[_] => s.map(write).mkString("[", ",", "]")
    case other => quote(String.valueOf(other))
  }

  private def quote(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  // ObjectMapper is thread-safe for readTree and expensive to build — one
  // shared instance serves all executor threads
  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse JSON into Map[String,Any]/Seq[Any]/String/Long/Double/Boolean/null
    * (jackson-backed; jackson ships with Spark).
    */
  def parse(json: String): Any = fromNode(mapper.readTree(json))

  /** Top-level object keys in DOCUMENT order (Map would lose it). */
  def topLevelKeys(json: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val node = mapper.readTree(json)
    if (node != null && node.isObject) node.fieldNames().asScala.toSeq else Nil
  }

  private def fromNode(n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull) null
    else if (n.isObject) n.properties().asScala.map(e => e.getKey -> fromNode(e.getValue)).toMap
    else if (n.isArray) n.elements().asScala.map(fromNode).toVector
    else if (n.isBoolean) n.asBoolean()
    else if (n.isIntegralNumber) n.asLong()
    else if (n.isFloatingPointNumber) n.asDouble()
    else n.asText()
  }
}
