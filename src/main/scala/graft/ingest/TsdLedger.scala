package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ingest ledger — the reference's `almgm.tsd_info` table
  * (/root/reference/edge_lake/dbms/db_info.py:1738 DDL: file_id SERIAL,
  * dbms_name, table_name, source, file_hash UNIQUE, instructions,
  * file_time, rows, status1/2): one row per ingested file/batch. It is
  * what the HA "committed" watermark and duplicate-file rejection read,
  * and what `get tsd list` renders.
  *
  * Ledger entries are driver-side metadata (one per ingest BATCH, not per
  * row — thousands, not billions), so a plain in-memory vector exposed as
  * a DataFrame is the right scale shape; a fleet deployment swaps the
  * store for a shared Delta/JDBC table behind the same interface. The
  * UNIQUE(file_hash) index becomes an idempotence check: re-ingesting an
  * already-seen payload is refused, exactly the reference's semantics.
  */
object TsdLedger {
  final case class Entry(fileId: Int, dbms: String, table: String,
      source: String, fileHash: String, instructions: String,
      fileTime: Timestamp, rows: Long, status1: String, status2: String)

  /** HA peer-sync DECISION — the relational half of the reference's
    * file-sync protocol (dbms/ha.py:19-35: nodes exchange tsd_info and
    * copy whichever source files the other is missing): given this
    * node's ledger and a peer's, report per-file actions — `pull` rows
    * the peer has that we lack, `push` rows we hold that the peer
    * lacks, keyed by the content hash that makes ingest idempotent.
    * Moving the bytes is transport (REST PUT exists for that); deciding
    * WHAT to move is an anti-join per direction, and stays one at fleet
    * scale (ledgers are per-batch metadata, broadcast-sized). */
  def diff(local: DataFrame, peer: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val cols = Seq("table_name", "source", "file_hash", "rows")
    val l = local.select(cols.map(col): _*)
    val p = peer.select(cols.map(col): _*)
    p.join(l.select("file_hash"), Seq("file_hash"), "left_anti")
      .withColumn("action", lit("pull"))
      .unionByName(
        l.join(p.select("file_hash"), Seq("file_hash"), "left_anti")
          .withColumn("action", lit("push")))
      .select(col("action"), col("table_name"), col("source"),
        col("file_hash"), col("rows"))
  }
}

/** `journal`: an optional NDJSON file the ledger replays on construct
  * and appends every record to — PUT idempotence (the UNIQUE file_hash
  * refusal) and id continuity then survive an engine restart, exactly
  * like the reference's tsd_info DBMS table. None = in-memory only
  * (tests, ephemeral engines); the Engine passes the catalog's
  * metadata root when one exists. Ledger volume is per-BATCH metadata
  * (thousands of lines, not billions) — a driver-side journal file is
  * the right scale shape; a fleet swaps in a shared store behind the
  * same interface. */
final class TsdLedger(journal: Option[java.nio.file.Path] = None) {
  import TsdLedger.Entry

  private var entries = Vector.empty[Entry]
  private var nextId = 1

  journal.foreach { j =>
    if (java.nio.file.Files.exists(j)) {
      java.nio.file.Files.readAllLines(j).forEach { line =>
        if (line.trim.nonEmpty) entries :+= entryFromJson(line)
      }
      nextId = entries.map(_.fileId).maxOption.getOrElse(0) + 1
    }
  }

  private def entryToJson(e: Entry): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\""
    s"""{"file_id": ${e.fileId}, "dbms": ${q(e.dbms)}, """ +
      s""""table": ${q(e.table)}, "source": ${q(e.source)}, """ +
      s""""file_hash": ${q(e.fileHash)}, """ +
      s""""instructions": ${q(e.instructions)}, """ +
      s""""file_time": ${e.fileTime.getTime}, "rows": ${e.rows}}"""
  }

  private def entryFromJson(line: String): Entry = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val p = JsonMethods.parse(line)
    Entry((p \ "file_id").extract[Int], (p \ "dbms").extract[String],
      (p \ "table").extract[String], (p \ "source").extract[String],
      (p \ "file_hash").extract[String],
      (p \ "instructions").extract[String],
      new Timestamp((p \ "file_time").extract[Long]),
      (p \ "rows").extract[Long], "", "")
  }

  private def appendJournal(e: Entry): Unit = journal.foreach { j =>
    Option(j.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(j, entryToJson(e) + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  private def rewriteJournal(): Unit = journal.foreach { j =>
    Option(j.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(j,
      entries.map(entryToJson).mkString("", "\n",
        if (entries.isEmpty) "" else "\n"))
  }

  /** Record an ingest batch; returns the assigned tsd_id, or None when
    * the file_hash was already ingested (the unique hash_index — the
    * caller must skip the duplicate payload). */
  def record(dbms: String, table: String, source: String, fileHash: String,
      instructions: String, rows: Long): Option[Int] = synchronized {
    if (entries.exists(_.fileHash == fileHash)) None
    else {
      val id = nextId
      nextId += 1
      val e = Entry(id, dbms, table, source, fileHash, instructions,
        new Timestamp(System.currentTimeMillis()), rows, "", "")
      entries :+= e
      appendJournal(e)
      Some(id)
    }
  }

  /** Roll back a reservation whose write failed: the hash must become
    * ingestable again or a transient IO error would permanently poison
    * it (record() would keep refusing the retry). */
  def remove(fileHash: String): Unit = synchronized {
    entries = entries.filterNot(_.fileHash == fileHash)
    rewriteJournal()
  }

  /** Raise the id counter so the next assigned id is strictly above
    * `n` — the RESTART seed: a fresh in-memory ledger must never
    * re-issue ids at or below lineage already stamped into storage
    * (a re-used tsd_id would stamp NEW rows below every standing
    * artifact's watermark — sync filters `> wm`, so those rows would
    * silently never fold, and replay by id becomes ambiguous). A
    * shared-store ledger makes this a no-op; the in-memory one reads
    * the table's own max on first touch (Engine.ingest). */
  def ensureAbove(n: Long): Unit = synchronized {
    if (n >= nextId && n < Int.MaxValue) nextId = n.toInt + 1
  }

  /** Highest ledger id recorded for a table (0 when none) — the local
    * input to the cluster's safe-id consensus (dbms/ha.py:225). */
  def maxId(table: String): Int = synchronized {
    entries.filter(_.table == table).map(_.fileId).maxOption.getOrElse(0)
  }

  def list(table: Option[String]): Seq[Entry] = synchronized {
    table.fold(entries)(t => entries.filter(_.table == t))
  }

  /** The ledger as a queryable DataFrame (tsd_info SELECT surface). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    synchronized {
      entries.map(e => (e.fileId, e.dbms, e.table, e.source, e.fileHash,
        e.instructions, e.fileTime, e.rows))
    }.toDF("file_id", "dbms_name", "table_name", "source", "file_hash",
      "instructions", "file_time", "rows")
  }
}
