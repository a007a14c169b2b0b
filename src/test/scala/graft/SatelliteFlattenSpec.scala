package graft

import org.apache.spark.sql.functions._

import graft.operators.FlattenOps
import graft.silver.{FlattenSpecs, SourceFileOps}

/** Golden-parity tests for the bill/debate satellite flatten specs: every
  * expected row below was produced by running the reference builders'
  * `_normalise_*_rows` functions (table_bill_stages.py, table_bill_versions
  * .py, table_bill_sponsors.py, table_bill_debates.py, table_bill_events.py,
  * table_bill_related_docs.py, table_debate_records.py,
  * table_debate_sections.py) on the same payloads, including the generated
  * surrogate-id hashes.
  */
class SatelliteFlattenSpec extends SparkSpec {
  import spark.implicits._

  private def row(df: org.apache.spark.sql.DataFrame, order: String*) =
    df.orderBy(order.map(col): _*).collect()

  test("bill_stages golden: event wrapper, dates-min, chamber fallback, generated ids") {
    val payload =
      """{"bill":{"uri":"/bill/7","stages":[
        |{"event":{"showAs":"Second Stage","dates":[{"date":"2024-03-02"},{"date":"2024-02-01"}],
        | "progressStage":"2","stageOutcome":"Completed",
        | "house":{"uri":"/house/33","showAs":"Dáil"}}},
        |{"showAs":"First Stage","date":"2024-01-15","chamber":{"uri":"/house/33c","name":"Dáil C"}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val out = FlattenSpecs.billStagesTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.billStages))
    val rows = row(out, "stage_index")
    assert(rows.length == 2)
    val r0 = rows(0)
    assert(r0.getAs[String]("bill_id") == "/bill/7")
    assert(r0.getAs[String]("stage_name") == "Second Stage")
    assert(r0.getAs[String]("stage_date") == "2024-02-01") // min of the dates array
    assert(r0.getAs[String]("house_uri") == "/house/33")
    assert(r0.getAs[String]("house_name") == "Dáil")
    assert(r0.getAs[String]("order_in_bill") == "2")
    assert(r0.getAs[String]("bill_stage_id") == "generated:bill_stage:7f70f29b74d373c0859a3c43")
    val r1 = rows(1)
    assert(r1.getAs[String]("stage_name") == "First Stage")
    assert(r1.getAs[String]("stage_date") == "2024-01-15") // direct date, no wrapper
    assert(r1.getAs[String]("house_uri") == "/house/33c")  // chamber fallback
    assert(r1.getAs[String]("house_name") == "Dáil C")
    assert(r1.getAs[String]("bill_stage_id") == "generated:bill_stage:c7d30f75491527bfdcaa239c")
  }

  test("bill_versions golden: format locator promotion + source ids + s3 keys") {
    val payload =
      """{"bill":{"uri":"/bill/7","versions":[
        |{"version":{"uri":"/v/1","showAs":"As Initiated","date":"2024-01-20","docType":"bill","lang":"en",
        | "formats":{"pdf":{"url":"https://data.oireachtas.ie/ie/x.pdf"},"xml":{"uri":"/files/x.xml"}}}},
        |{"showAs":"Committee Print","date":"02/03/2024"}
        |]}}""".stripMargin.replaceAll("\n", "")
    val out = FlattenSpecs.billVersionsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.billVersions))
    val rows = row(out, "version_index")
    val r0 = rows(0)
    assert(r0.getAs[String]("bill_version_id") == "/v/1")
    // pdf uri promoted from the absolute url; xml url absolutized
    assert(r0.getAs[String]("format_pdf_uri") == "https://data.oireachtas.ie/ie/x.pdf")
    assert(r0.getAs[String]("format_pdf_url") == "https://data.oireachtas.ie/ie/x.pdf")
    assert(r0.getAs[String]("format_xml_uri") == "/files/x.xml")
    assert(r0.getAs[String]("format_xml_url") == "https://data.oireachtas.ie/files/x.xml")
    assert(r0.getAs[String]("source_file_id_pdf") == "source_file:27ebf1470f9a0ef5f3f3d030")
    assert(r0.getAs[String]("source_file_id_xml") == "source_file:d6dfd3d71b0e551c4bd734f8")
    assert(r0.getAs[String]("s3_pdf_key") ==
      "raw/oireachtas_unified/source_files/legislation/bill-7/source_file-27ebf1470f9a0ef5f3f3d030.pdf")
    assert(r0.getAs[String]("s3_xml_key") ==
      "raw/oireachtas_unified/source_files/legislation/bill-7/source_file-d6dfd3d71b0e551c4bd734f8.xml")
    val r1 = rows(1)
    assert(r1.getAs[String]("version_date") == "2024-03-02") // dd/MM/yyyy lenient parse
    assert(r1.getAs[String]("bill_version_id") == "generated:bill_version:f7ba5599f257f55849c8c2c3")
    assert(r1.getAs[String]("source_file_id_pdf") == null)
    assert(r1.getAs[String]("s3_pdf_key") == null)
  }

  test("bill_sponsors golden: bool text, billId fallback, generated pk") {
    val payload =
      """{"bill":{"billId":"B9","sponsors":[
        |{"sponsor":{"by":{"showAs":"Jane Doe"},"as":{"uri":"/role/1","showAs":"Minister"},"isPrimary":true}},
        |{"by":{"uri":"/m/2","showAs":"John"},"isPrimary":"unsure"}
        |]}}""".stripMargin.replaceAll("\n", "")
    val out = FlattenSpecs.billSponsorsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.billSponsors))
    val rows = row(out, "sponsor_order")
    assert(rows(0).getAs[String]("bill_id") == "B9")
    assert(rows(0).getAs[String]("sponsor_name") == "Jane Doe")
    assert(rows(0).getAs[String]("sponsor_role_name") == "Minister")
    assert(rows(0).getAs[String]("is_primary") == "true")
    assert(rows(0).getAs[String]("bill_sponsor_id") == "bill_sponsor:44ab4a224fbf4e87a75504cc")
    assert(rows(1).getAs[String]("sponsor_uri") == "/m/2")
    assert(rows(1).getAs[String]("is_primary") == "unsure")
    assert(rows(1).getAs[String]("bill_sponsor_id") == "bill_sponsor:c183c1c251b65e033a9f055d")
  }

  test("bill_sponsors golden: bool-text truthy sets, scalar items skipped with index kept") {
    // expected rows produced by the reference _normalise_sponsor_rows on
    // this payload: '1'→true, 'No'→false, blank→None; the scalar array
    // entry emits no row but still consumes its enumerate() index
    val payload =
      """{"bill":{"billId":"B9","sponsors":[
        |{"sponsor":{"by":{"showAs":"Jane Doe"},"isPrimary":"1"}},
        |"garbage-scalar",
        |{"sponsor":{"by":{"showAs":"Sean O"},"isPrimary":"No"}},
        |{"sponsor":{"by":{"showAs":"Blank B"},"isPrimary":"  "}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val rows = row(FlattenSpecs.billSponsorsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.billSponsors)),
      "sponsor_order")
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("sponsor_name")).toSeq == Seq("Jane Doe", "Sean O", "Blank B"))
    assert(rows.map(_.getAs[String]("is_primary")).toSeq == Seq("true", "false", null))
    assert(rows.map(_.getAs[String]("sponsor_order")).toSeq == Seq("1", "3", "4"))
    assert(rows(0).getAs[String]("bill_sponsor_id") == "bill_sponsor:a2d981598de6e699f8edcfcf")
    assert(rows(1).getAs[String]("bill_sponsor_id") == "bill_sponsor:2025c51c68ef42b34250ce88")
    assert(rows(2).getAs[String]("bill_sponsor_id") == "bill_sponsor:a3e493efeba584cfedff859a")
  }

  test("safe slug is Unicode-aware like str.isalnum (reference golden)") {
    val out = Seq("https://bill/Dáil-Éireann/7?x=1", "source_file:abc").toDF("v")
      .select(SourceFileOps.safeSlug(col("v")).as("s")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("bill-Dáil-Éireann-7-x-1", "source_file-abc"))
  }

  test("bill_related_docs golden: downloadUrl/formatUrl fallback chain (shared _format_locator)") {
    val payload =
      """{"bill":{"uri":"/bill/7","relatedDocs":[
        |{"relatedDoc":{"uri":"/rd/9","showAs":"Memo",
        | "formats":{"pdf":{"downloadUrl":"https://cdn.example/m.pdf"},"xml":{"formatUrl":"/files/m.xml"}}}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val r = FlattenSpecs.billRelatedDocsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.billRelatedDocs))
      .collect().head
    assert(r.getAs[String]("related_doc_id") == "/rd/9")
    // downloadUrl promotes into the uri slot (http-absolute); formatUrl
    // stays relative so the xml uri is absent but the url absolutizes
    assert(r.getAs[String]("format_pdf_uri") == "https://cdn.example/m.pdf")
    assert(r.getAs[String]("format_pdf_url") == "https://cdn.example/m.pdf")
    assert(r.getAs[String]("format_xml_uri") == null)
    assert(r.getAs[String]("format_xml_url") == "https://data.oireachtas.ie/files/m.xml")
    assert(r.getAs[String]("source_file_id_pdf") == "source_file:ece0b191af06749a7db70ef3")
    assert(r.getAs[String]("source_file_id_xml") == "source_file:42fc43fc2dc1f24fc4d4694a")
    assert(r.getAs[String]("s3_pdf_key") ==
      "raw/oireachtas_unified/source_files/legislation/bill-7/source_file-ece0b191af06749a7db70ef3.pdf")
    assert(r.getAs[String]("s3_xml_key") ==
      "raw/oireachtas_unified/source_files/legislation/bill-7/source_file-42fc43fc2dc1f24fc4d4694a.xml")
  }

  test("bill_events + bill_debates golden: mixed date entries, generated ids") {
    val events =
      """{"bill":{"uri":"/bill/7","events":[
        |{"event":{"uri":"/e/1","showAs":"Published","dates":[{"date":"2024-05-02"},"2024-04-30"],
        | "chamber":{"uri":"/h/1","showAs":"Dáil"}}},
        |{"showAs":"Lapsed","date":"2024-06-01"}
        |]}}""".stripMargin.replaceAll("\n", "")
    val evRows = row(FlattenSpecs.billEventsTransform(
      FlattenOps.flatten(Seq(events).toDF("json"), "json", FlattenSpecs.billEvents)), "event_order")
    assert(evRows(0).getAs[String]("bill_event_id") == "/e/1")
    assert(evRows(0).getAs[String]("event_date") == "2024-04-30") // min across object+scalar entries
    assert(evRows(1).getAs[String]("event_date") == "2024-06-01")
    assert(evRows(1).getAs[String]("bill_event_id") == "generated:bill_event:b5e7eb03ac16b83d3834bef8")

    val debates =
      """{"bill":{"uri":"/bill/7","debates":[
        |{"uri":"/d/1","date":"2024-02-02","showAs":"Second Stage Debate","debateSectionId":"s7",
        | "chamber":{"uri":"/h/1","showAs":"Dáil"}},
        |{"showAs":"Anon Debate","date":"2024-03-03"}
        |]}}""".stripMargin.replaceAll("\n", "")
    val dbRows = row(FlattenSpecs.billDebatesTransform(
      FlattenOps.flatten(Seq(debates).toDF("json"), "json", FlattenSpecs.billDebates)), "debate_order")
    assert(dbRows(0).getAs[String]("bill_debate_id") == "bill_debate:622fb84faf2b663c86bd704e")
    assert(dbRows(0).getAs[String]("debate_id") == "/d/1")
    assert(dbRows(1).getAs[String]("debate_id") == "generated:debate:675352e7eea20ed58a76eff5")
    assert(dbRows(1).getAs[String]("bill_debate_id") == "bill_debate:44e30276edb452c6abf4f088")
  }

  test("bill_related_docs golden: relative pdf uri absolutized, xml absent") {
    val payload =
      """{"bill":{"uri":"/bill/7","relatedDocs":[
        |{"relatedDoc":{"uri":"/rd/1","showAs":"Memo","date":"2024-01-21","docType":"memo","lang":"en",
        | "formats":{"pdf":{"uri":"/files/m.pdf"}}}}
        |]}}""".stripMargin.replaceAll("\n", "")
    val r = FlattenSpecs.billRelatedDocsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.billRelatedDocs))
      .collect().head
    assert(r.getAs[String]("related_doc_id") == "/rd/1")
    assert(r.getAs[String]("format_pdf_uri") == "/files/m.pdf")
    assert(r.getAs[String]("format_pdf_url") == "https://data.oireachtas.ie/files/m.pdf")
    assert(r.getAs[String]("format_xml_uri") == null)
    assert(r.getAs[String]("source_file_id_pdf") == "source_file:6cd8726dc01533b6dd8692f4")
    assert(r.getAs[String]("source_file_id_xml") == null)
    assert(r.getAs[String]("s3_pdf_key") ==
      "raw/oireachtas_unified/source_files/legislation/bill-7/source_file-6cd8726dc01533b6dd8692f4.pdf")
    assert(r.getAs[String]("s3_xml_key") == null)
  }

  test("debate_records golden: chamber precedence, url promotion, key-hash id, record hash") {
    val full =
      """{"contextDate":"2024-02-07","debateRecord":{"uri":"/debate/9",
        |"house":{"uri":"/h/33","houseNo":"33","houseCode":"dail","showAs":"Dáil Éireann"},
        |"formats":{"xml":{"uri":"https://data.oireachtas.ie/d9.xml"},"pdf":{"url":"/d9.pdf"}}}}"""
        .stripMargin.replaceAll("\n", "")
    val bare = """{"contextDate":"2024-02-08","debateRecord":{"chamber":{"showAs":"Seanad"},"date":"2024-02-08"}}"""
    val out = FlattenSpecs.debateRecordsTransform(
      FlattenOps.flatten(Seq(full, bare).toDF("json"), "json", FlattenSpecs.debateRecords))
    val rows = row(out, "context_date")
    val r0 = rows(0)
    assert(r0.getAs[String]("debate_id") == "/debate/9")
    assert(r0.getAs[String]("debate_date") == "2024-02-07") // contextDate fallback
    assert(r0.getAs[String]("chamber") == "dail")           // houseCode wins
    assert(r0.getAs[String]("show_as") == "dail — 2024-02-07")
    assert(r0.getAs[String]("source_xml_uri") == "https://data.oireachtas.ie/d9.xml")
    assert(r0.getAs[String]("source_xml_url") == "https://data.oireachtas.ie/d9.xml")
    assert(r0.getAs[String]("source_pdf_uri") == "/d9.pdf")
    assert(r0.getAs[String]("source_pdf_url") == "/d9.pdf") // relative uri does not promote
    assert(r0.getAs[String]("source_file_id_xml") == "source_file:3ac9f89bff5fde8469c8830b")
    assert(r0.getAs[String]("source_file_id_pdf") == "source_file:29266d76414821228fd89781")
    assert(r0.getAs[String]("api_result_hash") == "64cae3a04531adcc")
    val r1 = rows(1)
    assert(r1.getAs[String]("debate_id") == "generated:debate:8016c840b932b4bb55b7") // keys-hash quirk
    assert(r1.getAs[String]("chamber") == "Seanad")
    assert(r1.getAs[String]("show_as") == "Seanad — 2024-02-08")
    assert(r1.getAs[String]("house_uri") == null)
    assert(r1.getAs[String]("api_result_hash") == "4043b1f475327599")
  }

  test("debate_sections golden: eid pk fallback, parent mapping vs scalar") {
    val payload =
      """{"uri":"/debate/9","sections":[
        |{"uri":"/sec/1","debateSectionId":"dbsect_2","showAs":"Order of Business",
        | "parentDebateSection":{"debateSectionId":"dbsect_1"}},
        |{"heading":"Heading Only","parentDebateSection":"raw_parent"}
        |]}""".stripMargin.replaceAll("\n", "")
    val rows = row(FlattenSpecs.debateSectionsTransform(
      FlattenOps.flatten(Seq(payload).toDF("json"), "json", FlattenSpecs.debateSections)), "section_order")
    val r0 = rows(0)
    assert(r0.getAs[String]("debate_section_id") == "/sec/1")
    assert(r0.getAs[String]("section_eid") == "dbsect_2")
    assert(r0.getAs[Long]("section_order") == 1L)
    assert(r0.getAs[String]("show_as") == "Order of Business")
    assert(r0.getAs[String]("parent_section_id") == "dbsect_1")
    val r1 = rows(1)
    assert(r1.getAs[String]("debate_section_id") == "generated:debate_section:2505cee809abe0f1503c")
    assert(r1.getAs[String]("heading") == "Heading Only")
    assert(r1.getAs[String]("show_as") == "Heading Only")
    assert(r1.getAs[String]("parent_section_id") == "raw_parent")
  }

  test("source-file inventory: extension inference, content types, fan-out") {
    val df = Seq(
      ("doc/1", "https://cdn.example/a.PDF", null: String),
      ("doc/2", null: String, "/files/b.xml")).toDF("eid", "pdf_url", "xml_uri")
      .withColumn("pdf_uri", lit(null).cast("string"))
      .withColumn("xml_url", lit(null).cast("string"))
    val out = SourceFileOps.inventoryRows(df, "document", "eid",
      Seq(("pdf", "pdf_uri", "pdf_url"), ("xml", "xml_uri", "xml_url")))
    val rows = out.orderBy("source_entity_id").collect()
    assert(rows.length == 2) // null locators produce no row
    assert(rows(0).getAs[String]("format_type") == "pdf")
    assert(rows(0).getAs[String]("content_type") == "application/pdf")
    assert(rows(0).getAs[String]("s3_key").endsWith(".pdf"))
    assert(rows(1).getAs[String]("format_type") == "xml")
    assert(rows(1).getAs[String]("format_url") == "https://data.oireachtas.ie/files/b.xml")
  }

  test("registry covers all 31 reference tables with pk ⊆ columns") {
    import graft.core.TableRegistry
    assert(TableRegistry.specs.size == 31)
    assert(TableRegistry.specs.keys.count(_.startsWith("silver_")) == 23)
    assert(TableRegistry.specs.keys.count(_.startsWith("control_")) == 3)
    assert(TableRegistry.specs.keys.count(_.startsWith("gold_")) == 5)
    TableRegistry.specs.values.foreach { s =>
      assert(s.primaryKey.forall(s.columns.contains),
        s"${s.name}: pk ${s.primaryKey} not in columns")
      assert(s.columns.contains("snapshot_date") || s.layer == "control",
        s"${s.name}: missing snapshot_date")
      // every declared fk parent exists in the registry
      s.foreignKeys.foreach { case (_, parent, parentCol) =>
        assert(TableRegistry.specs.contains(parent), s"${s.name}: fk parent $parent missing")
        assert(TableRegistry.specs(parent).columns.contains(parentCol))
      }
    }
  }
}
