package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{RegistryConfig, TableRegistry, TableSpec}

/** External registry loading: the YAML-subset parser, the two-file merge
  * (tables.yml + write_policies.yml), and full-registry parity — every
  * one of the 31 golden Scala specs survives a write → parse round trip,
  * and the committed configs/ files load back to exactly the constants.
  */
class RegistryConfigSpec extends AnyFunSuite {

  test("parser handles the reference file shapes") {
    val tablesYml =
      """# Unified table registry.
        |tables:
        |  silver_widgets:
        |    layer: silver           # trailing comment
        |    status: confirmed
        |    endpoint: "/widgets"
        |    primary_key: ["widget_uri"]
        |    description: "Widget dimension, with: colon and # not-a-comment inside quotes."
        |    columns: [widget_uri, widget_no, is_current]
        |
        |  gold_widget_stats:
        |    layer: gold
        |    primary_key: [widget_uri, year]
        |    columns: [widget_uri, year, n]
        |""".stripMargin
    val policiesYml =
      """tables:
        |  silver_widgets:
        |    write_strategy: upsert
        |    valid_from_column: date_start
        |    valid_to_column: date_end
        |    current_column: is_current
        |    business_key_columns: [widget_uri, date_start]
        |    foreign_keys:
        |      - {columns: [widget_uri], references: silver_catalog, referenced_columns: [uri]}
        |      - {columns: [widget_no], references: silver_numbers, referenced_columns: [no]}
        |""".stripMargin
    val specs = RegistryConfig.load(tablesYml, policiesYml)
    assert(specs.keySet == Set("silver_widgets", "gold_widget_stats"))
    val w = specs("silver_widgets")
    assert(w.layer == "silver")
    assert(w.primaryKey == Seq("widget_uri"))
    assert(w.columns == Seq("widget_uri", "widget_no", "is_current"))
    assert(w.writeStrategy == "upsert")
    assert(w.businessKey == Seq("widget_uri", "date_start"))
    assert(w.temporal.contains(("date_start", "date_end", "is_current")))
    assert(w.foreignKeys == Seq(
      ("widget_uri", "silver_catalog", "uri"), ("widget_no", "silver_numbers", "no")))
    // missing policy entry -> snapshot_replace default, no temporal/bk/fk
    val g = specs("gold_widget_stats")
    assert(g == TableSpec("gold_widget_stats", "gold", Seq("widget_uri", "year"),
      Seq("widget_uri", "year", "n")))
  }

  test("inline values: quotes, nested brackets, top-level comma splitting") {
    assert(RegistryConfig.parseValue("""[a, "b, c", d]""") == Seq("a", "b, c", "d"))
    assert(RegistryConfig.parseValue("""{k: [a, b], k2: v}""") ==
      Map("k" -> Seq("a", "b"), "k2" -> "v"))
    assert(RegistryConfig.parseValue("""{outer: {inner: [x]}}""") ==
      Map("outer" -> Map("inner" -> Seq("x"))))
  }

  test("all 31 golden specs survive a write -> load round trip") {
    val (tablesYml, policiesYml) = RegistryConfig.write(TableRegistry.specs)
    val loaded = RegistryConfig.load(tablesYml, policiesYml)
    assert(loaded.keySet == TableRegistry.specs.keySet)
    assert(TableRegistry.specs.size == 31)
    TableRegistry.specs.foreach { case (name, golden) =>
      assert(loaded(name) == golden, s"mismatch for $name")
    }
  }

  test("the committed configs/ files load back to the golden constants") {
    val dir = new java.io.File("configs")
    assert(dir.isDirectory, "configs/ missing — run graft.core.RegistryConfigWriter")
    val loaded = RegistryConfig.loadDir(dir.getPath)
    assert(loaded == TableRegistry.specs)
  }
}
