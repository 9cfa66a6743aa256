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

  /** One JVM-wide monitor per journal path: `FileChannel.lock` throws
    * `OverlappingFileLockException` when the SAME JVM already holds the
    * region (two shared ledgers in one process — the spec scenario and
    * any co-located multi-engine deployment), so in-process contenders
    * serialize on this monitor and only one of them ever holds the OS
    * lock at a time. Cross-process contenders block in the OS. */
  private val lockMonitors =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[ingest] def monitorFor(p: java.nio.file.Path): Object =
    lockMonitors.computeIfAbsent(
      p.toAbsolutePath.normalize.toString, _ => new Object)
}

/** `journal`: an optional NDJSON file the ledger replays on construct
  * and appends every record to — PUT idempotence (the UNIQUE file_hash
  * refusal) and id continuity then survive an engine restart, exactly
  * like the reference's tsd_info DBMS table. None = in-memory only
  * (tests, ephemeral engines); the Engine passes the catalog's
  * metadata root when one exists. Ledger volume is per-BATCH metadata
  * (thousands of lines, not billions) — a driver-side journal file is
  * the right scale shape.
  *
  * `shared = true` makes the journal a CROSS-PROCESS ledger: several
  * engine processes (nodes) point at one journal on a shared
  * filesystem, and every operation runs under an OS file lock
  * (`<journal>.lock`) after replaying lines appended by other nodes
  * since this node last looked — so duplicate-hash refusal and id
  * uniqueness hold across the whole fleet, not per process. The
  * journal is APPEND-ONLY in this mode ([[remove]] appends a tombstone
  * line instead of rewriting), which is what makes the incremental
  * byte-offset replay sound: committed bytes never change. Replay cost
  * per operation is only the bytes other nodes appended since our last
  * read. Requires a filesystem with working advisory locks (local
  * disk, most NFSv4); an object store or lock-less NFS needs the
  * documented swap-in — a shared DBMS table behind this interface,
  * which is exactly what the reference uses (tsd_info IS a DBMS
  * table, dbms/db_info.py:1738). */
final class TsdLedger(journal: Option[java.nio.file.Path] = None,
    shared: Boolean = false,
    /** Initial replay chunk (bytes); production default 64 MB. Exposed
      * so specs can exercise the longer-than-chunk-line growth/skip
      * path without writing multi-GB journals. */
    private[ingest] val replayChunkBytes: Long = 64L << 20,
    /** Growth ceiling for a newline-free chunk. A legitimate ledger
      * line is <1 KB (per-batch metadata), so anything beyond this is
      * corruption — skipped to its terminating newline rather than
      * grown further. Kept WELL below the max array size on purpose:
      * the growth path must actually survive its allocations for the
      * skip branch to be reachable (doubling toward 2 GB would OOM
      * replay out of the constructor first). */
    private[ingest] val replayMaxChunkBytes: Long = 256L << 20) {
  import TsdLedger.Entry

  private var entries = Vector.empty[Entry]
  private var nextId = 1
  /** Journal bytes already replayed (shared mode's incremental cursor). */
  private var journalOffset = 0L

  journal.foreach { j =>
    if (java.nio.file.Files.exists(j)) replayNew(j)
  }

  /** Replay journal lines beyond [[journalOffset]] — entries append,
    * tombstones drop their hash. Append-only discipline (shared mode)
    * keeps committed bytes immutable, so the cursor is always at a line
    * boundary; a SHRUNK file (a non-shared rewrite seen at construct)
    * resets the cursor and replays from scratch. */
  private def replayNew(j: java.nio.file.Path): Unit = {
    val size = java.nio.file.Files.size(j)
    if (size < journalOffset) { entries = Vector.empty; journalOffset = 0L }
    if (size == journalOffset) return
    val ch = java.nio.channels.FileChannel.open(j,
      java.nio.file.StandardOpenOption.READ)
    try {
      // bounded-chunk loop: (size - offset) can exceed Int.MaxValue on
      // a long-lived shared journal — a single allocate of the whole
      // delta would overflow Int (and heap-spike); 64 MB chunks replay
      // the SAME complete-line prefix discipline until caught up
      var progressed = true
      var chunkBytes = replayChunkBytes
      while (progressed && journalOffset < size) {
        progressed = false
        ch.position(journalOffset)
        val want = math.min(size - journalOffset, chunkBytes)
        val buf = java.nio.ByteBuffer.allocate(want.toInt)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        buf.flip()
        // stop at the last complete line: a construct-time read races
        // other nodes' appends lock-free, so the tail may be torn —
        // 0x0A never occurs inside a UTF-8 multibyte sequence, so the
        // byte scan is safe and the partial tail replays next refresh
        var end = buf.limit()
        while (end > 0 && buf.get(end - 1) != '\n'.toByte) end -= 1
        if (end > 0) {
          new String(buf.array(), 0, end,
            java.nio.charset.StandardCharsets.UTF_8)
            .split("\n").foreach { line =>
              if (line.trim.nonEmpty) applyLine(line)
            }
          journalOffset += end
          chunkBytes = replayChunkBytes
          progressed = true
        } else if (want < size - journalOffset) {
          // newline-free FULL chunk with more committed bytes behind
          // it: one journal line is longer than the chunk. Grow and
          // retry (replay must not wedge silently at this offset); a
          // line past the growth ceiling is corruption (real entries
          // are <1 KB) — skip past its terminating newline so every
          // later entry still applies.
          if (chunkBytes < replayMaxChunkBytes) {
            chunkBytes = math.min(chunkBytes * 2, replayMaxChunkBytes)
            progressed = true
          } else {
            var pos = journalOffset + want
            var found = -1L
            val scan = java.nio.ByteBuffer.allocate(1 << 20)
            while (found < 0 && pos < size) {
              scan.clear(); ch.position(pos)
              val n = ch.read(scan)
              if (n <= 0) pos = size
              else {
                var i = 0
                while (found < 0 && i < n) {
                  if (scan.get(i) == '\n'.toByte) found = pos + i + 1
                  i += 1
                }
                pos += n
              }
            }
            if (found >= 0) { // line dropped, replay continues after it
              journalOffset = found; chunkBytes = replayChunkBytes
              progressed = true
            } // else torn giant tail with no newline yet: next refresh
          }
        }
        // else: torn tail at EOF (no newline yet) — next refresh
      }
    } finally ch.close()
  }

  private def applyLine(line: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val p = JsonMethods.parse(line)
    (p \ "tombstone").extractOpt[String] match {
      case Some(h) => entries = entries.filterNot(_.fileHash == h)
      case None =>
        val e = entryFromParsed(p)
        entries :+= e
        if (e.fileId >= nextId) nextId = e.fileId + 1
    }
  }

  /** Run `f` with a consistent ledger view. Non-shared: the instance
    * monitor (existing single-process behavior). Shared: the JVM-wide
    * per-path monitor, then the OS file lock, then replay of other
    * nodes' appends — every mutation anywhere on the fleet happens
    * inside this exclusive section. */
  private def withLedger[T](f: => T): T = journal match {
    case Some(j) if shared =>
      TsdLedger.monitorFor(j).synchronized {
        synchronized {
          Option(j.getParent)
            .foreach(java.nio.file.Files.createDirectories(_))
          val lockPath = j.resolveSibling(j.getFileName.toString + ".lock")
          val ch = java.nio.channels.FileChannel.open(lockPath,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE)
          try {
            val lk = ch.lock()
            try {
              if (java.nio.file.Files.exists(j)) replayNew(j)
              f
            } finally lk.release()
          } finally ch.close()
        }
      }
    case _ => synchronized(f)
  }

  private def entryToJson(e: Entry): String = {
    // FULL escaping (control chars included): a newline in a
    // caller-supplied table/source name would otherwise split this
    // record across journal lines and permanently poison every replay
    def q(s: String) = graft.engine.Render.jsonStr(s)
    s"""{"file_id": ${e.fileId}, "dbms": ${q(e.dbms)}, """ +
      s""""table": ${q(e.table)}, "source": ${q(e.source)}, """ +
      s""""file_hash": ${q(e.fileHash)}, """ +
      s""""instructions": ${q(e.instructions)}, """ +
      s""""file_time": ${e.fileTime.getTime}, "rows": ${e.rows}}"""
  }

  private def entryFromParsed(p: org.json4s.JValue): Entry = {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    Entry((p \ "file_id").extract[Int], (p \ "dbms").extract[String],
      (p \ "table").extract[String], (p \ "source").extract[String],
      (p \ "file_hash").extract[String],
      (p \ "instructions").extract[String],
      new Timestamp((p \ "file_time").extract[Long]),
      (p \ "rows").extract[Long], "", "")
  }

  private def appendLine(json: String): Unit = journal.foreach { j =>
    Option(j.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(j, json + "\n",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    // we hold the exclusive section, so the new size is exactly our write
    journalOffset = java.nio.file.Files.size(j)
  }

  private def rewriteJournal(): Unit = journal.foreach { j =>
    Option(j.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(j,
      entries.map(entryToJson).mkString("", "\n",
        if (entries.isEmpty) "" else "\n"))
    journalOffset = java.nio.file.Files.size(j)
  }

  /** Record an ingest batch; returns the assigned tsd_id, or None when
    * the file_hash was already ingested (the unique hash_index — the
    * caller must skip the duplicate payload). In shared mode the check
    * and the append happen under the fleet-wide file lock, so two nodes
    * PUTting the same payload race to exactly one Some. */
  def record(dbms: String, table: String, source: String, fileHash: String,
      instructions: String, rows: Long): Option[Int] = withLedger {
    if (entries.exists(_.fileHash == fileHash)) None
    else {
      val id = nextId
      nextId += 1
      val e = Entry(id, dbms, table, source, fileHash, instructions,
        new Timestamp(System.currentTimeMillis()), rows, "", "")
      entries :+= e
      appendLine(entryToJson(e))
      Some(id)
    }
  }

  /** Roll back a reservation whose write failed: the hash must become
    * ingestable again or a transient IO error would permanently poison
    * it (record() would keep refusing the retry). Shared mode appends a
    * TOMBSTONE line (committed journal bytes stay immutable — the
    * invariant the cross-node incremental replay rests on); non-shared
    * keeps the compact rewrite. */
  def remove(fileHash: String): Unit = withLedger {
    entries = entries.filterNot(_.fileHash == fileHash)
    if (shared && journal.isDefined) {
      appendLine(
        s"""{"tombstone": ${graft.engine.Render.jsonStr(fileHash)}}""")
    } else rewriteJournal()
  }

  /** Raise the id counter so the next assigned id is strictly above
    * `n` — the RESTART seed: a fresh in-memory ledger must never
    * re-issue ids at or below lineage already stamped into storage
    * (a re-used tsd_id would stamp NEW rows below every standing
    * artifact's watermark — sync filters `> wm`, so those rows would
    * silently never fold, and replay by id becomes ambiguous). A
    * shared-store ledger makes this a no-op; the in-memory one reads
    * the table's own max on first touch (Engine.ingest). */
  def ensureAbove(n: Long): Unit = withLedger {
    if (n >= nextId && n < Int.MaxValue) nextId = n.toInt + 1
  }

  /** Highest ledger id recorded for a table (0 when none) — the local
    * input to the cluster's safe-id consensus (dbms/ha.py:225). */
  def maxId(table: String): Int = withLedger {
    entries.filter(_.table == table).map(_.fileId).maxOption.getOrElse(0)
  }

  def list(table: Option[String]): Seq[Entry] = withLedger {
    table.fold(entries)(t => entries.filter(_.table == t))
  }

  /** The ledger as a queryable DataFrame (tsd_info SELECT surface). */
  def df(spark: SparkSession): DataFrame = {
    import spark.implicits._
    withLedger {
      entries.map(e => (e.fileId, e.dbms, e.table, e.source, e.fileHash,
        e.instructions, e.fileTime, e.rows))
    }.toDF("file_id", "dbms_name", "table_name", "source", "file_hash",
      "instructions", "file_time", "rows")
  }
}
