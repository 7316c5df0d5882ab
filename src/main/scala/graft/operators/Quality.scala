package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality constraints (the Deequ-lite tier): a rule
  * set is evaluated into one violations report — the admission gate an
  * ingest pipeline runs BEFORE data reaches training or serving.
  *
  * Scale design: all single-table rules for one table fold into ONE
  * aggregation pass over it (conditional sums — no per-rule scans);
  * uniqueness is one groupBy on the key; referential integrity is one
  * left-anti join, broadcastable when the parent's key set is
  * dimension-sized. Nothing is row-materialized to the driver — the
  * report is rule-count rows. Every metric is an exact integer count,
  * so reports hash-replay in any engine.
  */
object Quality {

  /** One constraint: a name plus an expression that is TRUE where the
    * row VIOLATES the rule (NULL counts as a violation only if the
    * expression says so — callers state NULL semantics explicitly).
    */
  final case class Rule(name: String, violation: Column)

  /** Not-NULL constraint. */
  def notNull(c: String): Rule = Rule(s"not_null($c)", col(c).isNull)

  /** Closed-range constraint (NULL violates — absent measures are not
    * silently in-range).
    */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"in_range($c)", col(c).isNull || col(c) < lo || col(c) > hi)

  /** Accepted-values constraint (NULL violates). */
  def acceptedValues(c: String, values: Seq[String]): Rule =
    Rule(s"accepted_values($c)", col(c).isNull || !col(c).isin(values: _*))

  /** Non-negative measure. */
  def nonNegative(c: String): Rule = Rule(s"non_negative($c)", col(c).isNull || col(c) < 0)

  /** Evaluate row-level rules in ONE pass: a report row per rule with
    * the table's row count and the exact violation count.
    */
  def rowRules(df: DataFrame, table: String, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.violation, 1L).otherwise(0L)).as(s"__v_$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    rules.zipWithIndex
      .map { case (r, i) =>
        one.select(
          lit(table).as("table_name"),
          lit(r.name).as("rule"),
          col("__n").as("n_rows"),
          col(s"__v_$i").as("violations")
        )
      }
      .reduce(_ unionByName _)
  }

  /** Key-uniqueness report row: duplicate-key count (rows beyond the
    * first per key) via one groupBy on the key columns.
    */
  def uniqueKey(df: DataFrame, table: String, keyCols: Seq[String]): DataFrame = {
    val dups = df
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(
        coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
        coalesce(sum(col("__c")), lit(0L)).as("n_rows")
      )
    dups.select(
      lit(table).as("table_name"),
      lit(s"unique(${keyCols.mkString(",")})").as("rule"),
      col("n_rows"),
      col("violations")
    )
  }

  /** Referential-integrity report row: child rows whose key has no
    * parent (one left-anti join; NULL child keys violate — an orphan
    * and an unknown parent are both admission failures).
    */
  def referentialIntegrity(
      child: DataFrame,
      childTable: String,
      childKey: String,
      parent: DataFrame,
      parentKey: String
  ): DataFrame = {
    val orphans = child
      .join(broadcast(parent.select(col(parentKey).as(childKey)).distinct()), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    val n = child.agg(count(lit(1)).as("n_rows"))
    n.crossJoin(orphans)
      .select(
        lit(childTable).as("table_name"),
        lit(s"ref_integrity($childKey)").as("rule"),
        col("n_rows"),
        col("violations")
      )
  }

  /** Tag each row with the names of the rules it violates (empty array
    * = clean). The shared core of the batch and streaming gates.
    */
  def tagViolations(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.withColumn(
      "failed_rules",
      array_compact(array(rules.map(r => when(r.violation, lit(r.name)).otherwise(lit(null))): _*))
    )

  // --------------------------------------------- column-level governance

  /** One masking policy for one column: `expr` is the disclosure-safe
    * replacement, evaluated on the original row. All four rules are
    * deterministic pure column expressions — codegen'd, pushdown-
    * transparent (a filter on an UNmasked column still reaches the
    * scan), and replayable in any engine, which is what makes a masked
    * view auditable: the oracle can recompute every masked cell.
    */
  sealed trait Mask {
    def column: String
    def expr: Column
  }

  /** Irreversible pseudonymization: SHA-256 hex of the value. Equal
    * values mask to equal tokens, so joins/groupBys on the masked
    * column still work — the property plain redaction destroys.
    */
  final case class HashMask(column: String) extends Mask {
    def expr: Column = when(col(column).isNull, lit(null)).otherwise(sha2(col(column).cast("string"), 256))
  }

  /** Partial disclosure: all but the last `keepLast` characters become
    * `fill` (the phone/account-number shape). Strings shorter than
    * `keepLast` pass through unchanged.
    */
  final case class PartialMask(column: String, keepLast: Int, fill: String = "*") extends Mask {
    def expr: Column =
      concat(
        repeat(lit(fill), greatest(length(col(column)) - keepLast, lit(0))),
        col(column).substr(greatest(length(col(column)) - keepLast + 1, lit(1)), lit(keepLast))
      )
  }

  /** Full redaction to a fixed marker. */
  final case class RedactMask(column: String, marker: String = "[REDACTED]") extends Mask {
    def expr: Column = when(col(column).isNull, lit(null)).otherwise(lit(marker))
  }

  /** Numeric generalization: round down to a `width`-sized bucket —
    * k-anonymity-style coarsening that keeps aggregates meaningful.
    */
  final case class BucketMask(column: String, width: Long) extends Mask {
    def expr: Column = (floor(col(column) / width) * width).cast("bigint")
  }

  /** A governed view of `df`: rows failing `rowPolicy` disappear
    * (row-level security), masked columns are replaced in place,
    * `dropColumns` vanish entirely. Pure plan rewriting — no data is
    * copied, the view composes with every downstream operator, and
    * predicates on untouched columns keep pushing down to the scan.
    */
  def maskedView(
      df: DataFrame,
      masks: Seq[Mask],
      rowPolicy: Option[Column] = None,
      dropColumns: Seq[String] = Nil
  ): DataFrame = {
    val filtered = rowPolicy.map(df.filter).getOrElse(df)
    val masked   = masks.foldLeft(filtered)((d, m) => d.withColumn(m.column, m.expr))
    dropColumns.foldLeft(masked)(_ drop _)
  }

  /** Streaming admission gate: every micro-batch is split by the rule
    * set — rows violating ANY rule land in quarantine carrying the
    * failed-rule names, clean rows in the accepted sink (the
    * `json_quarantine` routing generalized from parse errors to
    * declarative constraints). foreachBatch + AvailableNow, the
    * engine's standard incremental-ingest shape; rule evaluation is
    * the same single-pass projection the batch report uses, so the
    * gate adds one narrow map over the ingest stream.
    */
  def streamGate(
      stream: DataFrame,
      rules: Seq[Rule],
      acceptPath: String,
      quarantinePath: String,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val tagged = tagViolations(batch, rules).localCheckpoint(eager = true)
        tagged
          .filter(size(col("failed_rules")) > 0)
          .write
          .mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(quarantinePath)
        tagged
          .filter(size(col("failed_rules")) === 0)
          .drop("failed_rules")
          .write
          .mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(acceptPath)
        ()
      }
      .start()

  /** The star schema's admission report — every rule family over the
    * real tables, one deterministic report (`data_quality_report`).
    * The orders/lineitem rules pass by construction; the deliberately
    * strict document rules (ASCII-range n_chars band, closed language
    * list) report real non-zero violation counts, because a quality
    * gate that can only say "pass" proves nothing.
    */
  def starSchemaReport(spark: SparkSession, dir: String): DataFrame = {
    val orders   = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val docs     = Tables.documents(spark, dir)
    val parts: Seq[DataFrame] = Seq(
      rowRules(
        orders,
        "orders",
        Seq(
          notNull("o_orderkey"),
          nonNegative("o_totalprice"),
          acceptedValues("o_orderstatus", Seq("F", "O", "P"))
        )
      ),
      rowRules(
        lineitem,
        "lineitem",
        Seq(
          notNull("l_orderkey"),
          inRange("l_discount", 0.0, 0.1),
          inRange("l_quantity", 1.0, 50.0)
        )
      ),
      rowRules(
        docs,
        "documents",
        Seq(
          notNull("text"),
          inRange("n_chars", 64.0, 512.0),              // strict band: violations expected
          acceptedValues("lang", Seq("en", "de", "fr")) // es excluded on purpose
        )
      ),
      uniqueKey(orders, "orders", Seq("o_orderkey")),
      uniqueKey(docs, "documents", Seq("doc_id")),
      referentialIntegrity(lineitem, "lineitem", "l_orderkey", orders, "o_orderkey")
    )
    parts.reduce(_ unionByName _).orderBy("table_name", "rule")
  }

  /** Drift-gated ingest — the batch-promotion gate a data platform
    * runs before a new crawl slice joins the corpus: each candidate
    * slice is admitted only if its [[Profile.profileDrift]] report
    * against the reference snapshot raises NO flag on the gated
    * columns (null-rate move > 5pp, or distinct cardinality outside
    * the [½×, 2×] band); a drifting slice lands WHOLE in quarantine —
    * a slice is a unit of data lineage, not a bag of rows, so
    * admitting its clean half would publish an unowned mixture.
    * Admitted slices append to a graft-log table (ACID, versioned);
    * the driver loop is O(slices) with each decision one drift report
    * (two single-Expand profile passes). Gate columns should be
    * slice-stable dimensions (low-cardinality attributes every slice
    * covers) — gating a high-cardinality column on slice-vs-corpus
    * ndv would false-flag by construction, which is a configuration
    * error this ingest cannot detect for you.
    */
  def driftGatedIngest(
      spark: SparkSession,
      reference: DataFrame,
      slices: Seq[DataFrame],
      gateCols: Seq[String],
      tablePath: String,
      quarantinePath: String
  ): (Long, Long) = {
    require(slices.nonEmpty && gateCols.nonEmpty, "need at least one slice and one gated column")
    var admitted    = 0L
    var quarantined = 0L
    slices.foreach { slice =>
      val flagged = Profile
        .profileDrift(reference, slice, gateCols)
        .filter(col("null_drift") || col("ndv_drift"))
        .limit(1)
        .count() > 0
      if (flagged) {
        slice.write.mode("append").parquet(quarantinePath)
        quarantined += 1
      } else {
        if (graft.sources.SnapshotTable.latestVersion(spark, tablePath) == 0L)
          graft.sources.SnapshotTable.create(spark, tablePath, slice)
        else graft.sources.SnapshotTable.append(spark, tablePath, slice)
        admitted += 1
      }
    }
    (admitted, quarantined)
  }

  /** Luhn-validated payment-card detection — the PII scan that a bare
    * digit-run regex cannot be: card-shaped candidates (13–19
    * contiguous digits) are kept only when the ISO/IEC 7812 mod-10
    * checksum holds, which is what separates a card number from an
    * order id and makes the alarm rate actionable. Candidate
    * extraction and checksum validation are BOTH array-local
    * expressions (`regexp_extract_all` + a `filter`/`aggregate` HOF
    * over the digit positions) — one projection pass per document,
    * zero shuffles, codegen-friendly, and the identical arithmetic
    * replays in any engine with list lambdas. Emits one row per
    * document that carries at least one candidate:
    * `(id, n_candidates, n_valid)`.
    */
  /** Contact-PII scan: per-doc counts of email / IPv4 / NANP-style
    * phone matches — the scrub-before-training screen beside
    * [[piiCardScan]]. Patterns restricted to the RE2 ∩ Java-regex
    * dialect (no lookbehind, no backrefs) so the oracle replays them
    * verbatim; counts are exact ints. Single narrow pass, zero
    * shuffles before the output sort.
    */
  def piiContacts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
    val ipv4  = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
    val phone = """\b\d{3}-\d{4}\b"""
    df.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(email), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col(textCol), lit(ipv4), lit(0))).cast("long").as("n_ipv4"),
      size(regexp_extract_all(col(textCol), lit(phone), lit(0))).cast("long").as("n_phones")
    )
  }

  def piiCardScan(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val luhnValid =
      s"""s -> aggregate(sequence(1, length(s)), CAST(0 AS BIGINT), (acc, i) -> acc +
         |  (CASE WHEN (length(s) - i) % 2 = 1
         |        THEN CASE WHEN (ascii(substring(s, i, 1)) - 48) * 2 > 9
         |                  THEN (ascii(substring(s, i, 1)) - 48) * 2 - 9
         |                  ELSE (ascii(substring(s, i, 1)) - 48) * 2 END
         |        ELSE ascii(substring(s, i, 1)) - 48 END)) % 10 = 0""".stripMargin.replace("\n", " ")
    // MAXIMAL digit runs, then a length gate: `[0-9]{13,19}` would
    // greedily match the first 19 digits of a longer run (and
    // lookbehind anchors are not RE2-portable) — run-maximality gives
    // the boundary both engines agree on
    df.select(
      col(idCol),
      expr(s"filter(regexp_extract_all($textCol, '[0-9]+', 0), s -> length(s) BETWEEN 13 AND 19)").as("__cands")
    ).filter(size(col("__cands")) > 0)
      .select(
        col(idCol),
        size(col("__cands")).cast("long").as("n_candidates"),
        expr(s"size(filter(__cands, $luhnValid))").cast("long").as("n_valid")
      )
  }
}
