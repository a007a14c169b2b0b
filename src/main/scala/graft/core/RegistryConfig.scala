package graft.core

/** External table-registry configuration (SURVEY §1.3; reference
  * configs/oireachtas/tables.yml + write_policies.yml): the engine's
  * registry can load from the same two-file YAML shape the reference
  * uses, so a table/policy edit is a config change, not a recompile.
  * `TableRegistry.specs` (the Scala constants) stays the golden copy —
  * the committed configs/ files are generated from it by [[write]] and
  * the spec asserts load(write(specs)) == specs for all 31 tables.
  *
  * The parser is a dependency-free YAML SUBSET (exactly the constructs
  * those two files use): indentation-nested maps, `key: value` scalars,
  * inline lists `[a, b]`, inline maps `{k: v}` (nesting allowed), block
  * lists of either, quoted strings, and `#` comments. It is NOT a
  * general YAML engine — anchors, multi-line scalars, flow nesting
  * beyond one brace level of lists-in-maps are out of scope.
  */
object RegistryConfig {

  // ---------------- YAML-subset parser ----------------

  private final case class Line(indent: Int, text: String)

  private def stripComment(s: String): String = {
    val sb = new StringBuilder
    var inS = false; var inD = false; var done = false
    for (c <- s if !done) c match {
      case '\'' if !inD => inS = !inS; sb += c
      case '"' if !inS => inD = !inD; sb += c
      case '#' if !inS && !inD => done = true
      case c2 => sb += c2
    }
    sb.result().replaceAll("\\s+$", "")
  }

  private def logicalLines(yaml: String): Vector[Line] =
    yaml.linesIterator.map(stripComment).filter(_.trim.nonEmpty)
      .map(l => Line(l.takeWhile(_ == ' ').length, l.trim)).toVector

  /** Split `s` on top-level commas (bracket/brace/quote aware). */
  private def splitTop(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inS = false; var inD = false
    for (c <- s) c match {
      case '\'' if !inD => inS = !inS; cur += c
      case '"' if !inS => inD = !inD; cur += c
      case '[' | '{' if !inS && !inD => depth += 1; cur += c
      case ']' | '}' if !inS && !inD => depth -= 1; cur += c
      case ',' if depth == 0 && !inS && !inD => out += cur.result().trim; cur.clear()
      case c2 => cur += c2
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Split an inline-map entry `key: value` at the first top-level colon. */
  private def keyValue(s: String): (String, String) = {
    var depth = 0; var inS = false; var inD = false; var i = 0; var at = -1
    while (i < s.length && at < 0) {
      s.charAt(i) match {
        case '\'' if !inD => inS = !inS
        case '"' if !inS => inD = !inD
        case '[' | '{' if !inS && !inD => depth += 1
        case ']' | '}' if !inS && !inD => depth -= 1
        case ':' if depth == 0 && !inS && !inD => at = i
        case _ =>
      }
      i += 1
    }
    if (at < 0) (s.trim, "") else (s.take(at).trim, s.drop(at + 1).trim)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  /** Parse an inline scalar / list / map value. */
  def parseValue(v: String): Any = {
    val t = v.trim
    if (t.startsWith("[") && t.endsWith("]"))
      splitTop(t.substring(1, t.length - 1)).map(parseValue)
    else if (t.startsWith("{") && t.endsWith("}"))
      splitTop(t.substring(1, t.length - 1)).map { kv =>
        val (k, value) = keyValue(kv); unquote(k) -> parseValue(value)
      }.toMap
    else unquote(t)
  }

  /** Parse a whole document into nested Map[String, Any] / Seq[Any] /
    * String.
    */
  def parse(yaml: String): Map[String, Any] = {
    val lines = logicalLines(yaml)
    def block(from: Int, indent: Int): (Any, Int) = {
      if (from >= lines.length) return (Map.empty[String, Any], from)
      if (lines(from).text.startsWith("- ")) {
        // block list: collect items at this indent
        val items = Vector.newBuilder[Any]
        var i = from
        while (i < lines.length && lines(i).indent == indent && lines(i).text.startsWith("- ")) {
          items += parseValue(lines(i).text.drop(2))
          i += 1
        }
        (items.result(), i)
      } else {
        val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
        var i = from
        while (i < lines.length && lines(i).indent == indent && !lines(i).text.startsWith("- ")) {
          val (k, v) = keyValue(lines(i).text)
          if (v.nonEmpty) { m(unquote(k)) = parseValue(v); i += 1 }
          else {
            // nested block under this key
            val childIndent = if (i + 1 < lines.length) lines(i + 1).indent else indent
            if (i + 1 < lines.length && childIndent > indent) {
              val (child, next) = block(i + 1, childIndent)
              m(unquote(k)) = child; i = next
            } else { m(unquote(k)) = ""; i += 1 }
          }
        }
        (m.toMap, i)
      }
    }
    block(0, lines.headOption.map(_.indent).getOrElse(0))._1 match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case other => Map("value" -> other)
    }
  }

  // ---------------- registry load / write ----------------

  private def strSeq(v: Any): Seq[String] = v match {
    case s: Seq[_] => s.map(String.valueOf)
    case s: String if s.nonEmpty => Seq(s)
    case _ => Nil
  }

  /** Assemble TableSpecs from the two parsed documents (the same merge
    * the reference's loaders do: identity/columns from tables.yml, write
    * behavior from write_policies.yml, snapshot_replace default).
    */
  def load(tablesYaml: String, policiesYaml: String): Map[String, TableSpec] = {
    val tables = parse(tablesYaml).getOrElse("tables", Map.empty)
      .asInstanceOf[Map[String, Any]]
    val policies = parse(policiesYaml).getOrElse("tables", Map.empty)
      .asInstanceOf[Map[String, Any]]
    tables.map { case (name, spec0) =>
      val spec = spec0.asInstanceOf[Map[String, Any]]
      val pol = policies.get(name).map(_.asInstanceOf[Map[String, Any]]).getOrElse(Map.empty)
      val temporal = (pol.get("valid_from_column"), pol.get("valid_to_column"),
        pol.get("current_column")) match {
        case (Some(f), Some(t), Some(c)) =>
          Some((String.valueOf(f), String.valueOf(t), String.valueOf(c)))
        case _ => None
      }
      val fks = pol.get("foreign_keys").map(_.asInstanceOf[Seq[Any]]).getOrElse(Nil).map { fk =>
        val m = fk.asInstanceOf[Map[String, Any]]
        (strSeq(m.getOrElse("columns", Nil)).headOption.getOrElse(""),
          String.valueOf(m.getOrElse("references", "")),
          strSeq(m.getOrElse("referenced_columns", Nil)).headOption.getOrElse(""))
      }
      name -> TableSpec(
        name = name,
        layer = String.valueOf(spec.getOrElse("layer", TableSpec.inferLayer(name))),
        primaryKey = strSeq(spec.getOrElse("primary_key", Nil)),
        columns = strSeq(spec.getOrElse("columns", Nil)),
        writeStrategy = String.valueOf(pol.getOrElse("write_strategy", "snapshot_replace")),
        businessKey = strSeq(pol.getOrElse("business_key_columns", Nil)),
        temporal = temporal,
        foreignKeys = fks)
    }
  }

  /** Load from the two files under `dir` (tables.yml, write_policies.yml). */
  def loadDir(dir: String): Map[String, TableSpec] = {
    def read(n: String) = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, n)), "UTF-8")
    load(read("tables.yml"), read("write_policies.yml"))
  }

  /** Render the registry back to the two-file YAML shape (used to generate
    * the committed configs/ from the golden Scala constants).
    */
  def write(specs: Map[String, TableSpec]): (String, String) = {
    val ordered = specs.values.toSeq.sortBy(_.name)
    def inlineList(xs: Seq[String]) = xs.mkString("[", ", ", "]")
    val tables = ordered.map { s =>
      s"""  ${s.name}:
         |    layer: ${s.layer}
         |    primary_key: ${inlineList(s.primaryKey)}
         |    columns: ${inlineList(s.columns)}""".stripMargin
    }.mkString(
      "# Generated from graft.core.TableRegistry.specs — the Scala constants\n" +
        "# are the golden copy; edit there and re-run RegistryConfigWriter.\n" +
        "tables:\n", "\n\n", "\n")
    val policies = ordered.map { s =>
      val lines = Seq(s"    write_strategy: ${s.writeStrategy}") ++
        s.temporal.toSeq.flatMap { case (f, t, c) => Seq(
          s"    valid_from_column: $f", s"    valid_to_column: $t",
          s"    current_column: $c") } ++
        (if (s.businessKey.nonEmpty)
          Seq(s"    business_key_columns: ${inlineList(s.businessKey)}") else Nil) ++
        (if (s.foreignKeys.nonEmpty)
          "    foreign_keys:" +: s.foreignKeys.map { case (c, ref, rc) =>
            s"      - {columns: [$c], references: $ref, referenced_columns: [$rc]}" }
        else Nil)
      s"  ${s.name}:\n" + lines.mkString("\n")
    }.mkString("tables:\n", "\n\n", "\n")
    (tables, policies)
  }
}

/** Regenerates configs/tables.yml + configs/write_policies.yml from the
  * golden Scala registry. Run after editing TableRegistry.specs.
  */
object RegistryConfigWriter {
  def main(args: Array[String]): Unit = {
    val dir = java.nio.file.Paths.get(args.headOption.getOrElse("configs"))
    java.nio.file.Files.createDirectories(dir)
    val (tables, policies) = RegistryConfig.write(TableRegistry.specs)
    java.nio.file.Files.write(dir.resolve("tables.yml"), tables.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("write_policies.yml"), policies.getBytes("UTF-8"))
    println(s"wrote ${dir.resolve("tables.yml")} and ${dir.resolve("write_policies.yml")}")
  }
}
