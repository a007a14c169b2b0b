package graft.orchestrate

import java.time.LocalDate

/** Refresh-run input normalization and table ordering (SURVEY §3.3;
  * reference process/oireachtas_refresh_inputs.py:23-118): refresh type →
  * ordered table list with control tables forced last, default date
  * windows (weekly = trailing 35 days, monthly = previous calendar month
  * with a 7-day lead-in, yearly = previous full year), validated modes
  * and bounded page sizes.
  */
object RefreshRun {

  val ControlTail: Seq[String] = Seq(
    "control_pipeline_runs", "control_data_quality_results", "control_table_manifests")

  val DefaultModes: Map[String, String] =
    Map("weekly" -> "incremental", "monthly" -> "incremental", "yearly" -> "full")
  val DefaultPageSizes: Map[String, Int] =
    Map("weekly" -> 100, "monthly" -> 200, "yearly" -> 200)
  val ValidModes: Map[String, Set[String]] = Map(
    "weekly" -> Set("test", "incremental", "full"),
    "monthly" -> Set("test", "incremental", "full"),
    "yearly" -> Set("test", "full", "backfill"))

  final case class RefreshInputs(
      refreshType: String,
      mode: String,
      tables: Seq[String],
      chamber: String,
      houseNo: String,
      dateStart: String,
      dateEnd: String,
      pageSize: Int,
      sampleRows: Int)

  /** Default date window per refresh type (refresh_inputs.py:109-118). */
  def defaultWindow(refreshType: String, asOf: LocalDate): (LocalDate, LocalDate) =
    refreshType match {
      case "weekly" => (asOf.minusDays(35), asOf)
      case "monthly" =>
        val monthStart = asOf.withDayOfMonth(1)
        val prevEnd = monthStart.minusDays(1)
        val prevStart = prevEnd.withDayOfMonth(1)
        (prevStart.minusDays(7), prevEnd)
      case _ =>
        val y = asOf.getYear - 1
        (LocalDate.of(y, 1, 1), LocalDate.of(y, 12, 31))
    }

  /** Control tables forced to the tail in canonical order
    * (refresh_inputs.py:102-106).
    */
  def orderControlTablesLast(requested: Seq[String]): Seq[String] = {
    val controls = ControlTail.toSet
    requested.filterNot(controls) ++ ControlTail.filter(requested.contains)
  }

  /** Validate + normalize (refresh_inputs.py:53-118). `knownTables` plays
    * the registry's role; silver-before-gold ordering is encoded in the
    * requested list as in the reference.
    */
  def normalize(refreshType: String, knownTables: Set[String],
                requestedTables: Seq[String], mode: String = "",
                chamber: String = "dail", houseNo: String = "34",
                dateStart: String = "", dateEnd: String = "",
                pageSize: Int = 0, sampleRows: Int = 10,
                asOf: LocalDate = LocalDate.now(java.time.ZoneOffset.UTC)): RefreshInputs = {
    require(DefaultModes.contains(refreshType), s"unknown refresh_type $refreshType")
    val m = if (mode.trim.nonEmpty) mode.trim else DefaultModes(refreshType)
    require(ValidModes(refreshType)(m), s"mode '$m' is invalid for $refreshType")
    val ch = chamber.trim.toLowerCase
    require(Set("dail", "seanad")(ch), "chamber must be dail or seanad")
    require(houseNo.trim.forall(_.isDigit) && houseNo.trim.nonEmpty && houseNo.trim.toInt > 0,
      "house_no must be a positive integer")

    val (defStart, defEnd) = defaultWindow(refreshType, asOf)
    val ds = if (dateStart.nonEmpty) LocalDate.parse(dateStart).toString else defStart.toString
    val de = if (dateEnd.nonEmpty) LocalDate.parse(dateEnd).toString else defEnd.toString
    require(ds <= de, s"date_start $ds must not be after date_end $de")

    val requested = requestedTables.map(_.trim).filter(_.nonEmpty)
    require(requested.nonEmpty, "at least one table is required")
    val dups = requested.groupBy(identity).collect { case (t, ts) if ts.size > 1 => t }
    require(dups.isEmpty, s"duplicate tables are not allowed: ${dups.toSeq.sorted}")
    val unknown = requested.filterNot(knownTables)
    require(unknown.isEmpty, s"unknown tables: ${unknown.sorted}")

    val ps = if (pageSize > 0) math.min(pageSize, 200) else DefaultPageSizes(refreshType)
    RefreshInputs(refreshType, m, orderControlTablesLast(requested), ch, houseNo.trim,
      ds, de, ps, math.max(1, math.min(sampleRows, 100)))
  }

  /** Sequential build execution in dependency order (the reference runs
    * silver before gold by list order; [[executePar]] is the
    * parallelizing variant for the independent silver builds).
    */
  def execute[T](inputs: RefreshInputs, build: String => T): Seq[(String, T)] =
    inputs.tables.map(t => t -> build(t))

  /** Parallel build execution over a bounded pool, results in the
    * INPUT order (the manifest/control consumers key by table name and
    * the reference's run records are order-stable). The silver builds
    * are mutually independent — each writes its own batch entry key
    * and table objects, and Spark's scheduler interleaves concurrent
    * jobs from one session fine (FIFO within the shared pool) — so the
    * wall-clock of a refresh collapses from Σ(build) toward
    * max(build) + spillover. Control tables MUST NOT be in `inputs`
    * here: they read the builds' results, so the caller runs them
    * after (the normalize ordering makes that split trivial —
    * `tables.filterNot(ControlTail.contains)`).
    *
    * A build failure propagates to the caller (no partial silent
    * success — the sequential Await walk throws at the first failed
    * entry). Failure is FAIL-FAST for work that has not started: the
    * first build to throw flips a shared flag, and every queued task
    * that dequeues afterwards cancels itself instead of running its
    * build — no background writes continue after the exception reaches
    * the caller. Builds already in flight on other pool threads
    * complete gracefully rather than being interrupted mid-write
    * (interrupting a half-written parquet commit trades a clean retry
    * for a torn table).
    */
  def executePar[T](inputs: RefreshInputs, build: String => T,
      parallelism: Int = 4): Seq[(String, T)] = {
    require(inputs.tables.forall(t => !ControlTail.contains(t)),
      "control tables read the build results — run them after the parallel phase")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, inputs.tables.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val failed = new java.util.concurrent.atomic.AtomicBoolean(false)
    try {
      val futures = inputs.tables.map(t =>
        t -> scala.concurrent.Future {
          if (failed.get())
            throw new java.util.concurrent.CancellationException(
              s"build $t not started: an earlier build in this refresh failed")
          try build(t)
          catch { case e: Throwable => failed.set(true); throw e }
        })
      // Settle EVERY future before reporting (queued self-cancellations
      // are instant; in-flight builds finish gracefully), then throw
      // the ORIGINAL failure — never a downstream CancellationException
      // that would mask which build actually broke.
      val settled = futures.map { case (t, f) =>
        t -> scala.util.Try(
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf))
      }
      settled.collectFirst {
        case (_, scala.util.Failure(e))
            if !e.isInstanceOf[java.util.concurrent.CancellationException] => e
      }.foreach(throw _)
      settled.map { case (t, r) => t -> r.get }
    } finally pool.shutdown()
  }
}
