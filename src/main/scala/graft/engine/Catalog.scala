package graft.engine

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal metadata service standing in for the reference's blockchain/
  * master ledger (policies are plain JSON there too —
  * /root/reference/edge_lake/blockchain/metadata.py:161 `load`): table
  * registrations (name -> storage path + frozen schema), views
  * (rename/subset mappings, cmd/member_cmd.py:21065 `create view`,
  * consumed at dbms/unify_results.py:1049-1061), mapping policies, and
  * standing-artifact attach records (what re-registers the serving
  * fleet after a restart — the reference loads ALL its policies from
  * the shared ledger at startup; this catalog does the same from its
  * metadata root).
  *
  * Persistence is a JSON file per policy under one directory — at fleet
  * scale this becomes a Delta table or an external store; the interface
  * is what matters (resolve table -> DataFrame). A catalog constructed
  * WITH a root RELOADS it: tables re-register (schema re-inferred from
  * storage), views and policies restore verbatim, artifact records wait
  * for the Engine's `attach all`. Reload is per-entry tolerant — a
  * registration whose storage path vanished is skipped and reported by
  * [[reloadErrors]], never a constructor crash (one lost table must not
  * take the whole node down).
  */
object Catalog {
  final case class TableReg(name: String, path: String, schemaJson: String,
      nanoTs: Seq[String])
  /** A table served by a FOREIGN engine over JDBC — the honest modern
    * seam for the reference's PI/OLEDB connector row (SURVEY §2.1:
    * `dbms/oledb_dbms.py:64-76` is a dialect tweak on a remote
    * cursor; the Spark-first equivalent is the built-in JDBC source,
    * which pushes filters and column pruning to the remote and
    * parallelizes the scan via partitionColumn/numPartitions). */
  final case class JdbcReg(name: String, url: String, dbtable: String,
      options: Map[String, String])
  /** View: target table + projected (sourceColumn -> viewColumn) pairs
    * (a rename/subset map, exactly the reference's view shape). */
  final case class ViewDef(name: String, table: String,
      columns: Seq[(String, String)])
}

final class Catalog(spark: SparkSession, root: Option[Path] = None) {
  import Catalog.{JdbcReg, TableReg, ViewDef}

  /** (tsCol, unit, n) for tables written via TimePartitions. */
  @volatile private var partitionMetas = Map.empty[String, (String, String, Int)]
  @volatile private var tables = Map.empty[String, TableReg]
  @volatile private var jdbcTables = Map.empty[String, JdbcReg]
  @volatile private var views = Map.empty[String, ViewDef]
  /** See [[kafkaOffset]]/[[saveKafkaOffset]] — declared BEFORE the
    * constructor's reload() so rehydration isn't wiped by the field
    * initializer. */
  @volatile private var kafkaOffsets = Map.empty[(String, Int), Long]
  @volatile private var policies = Map.empty[String, String] // id -> policy JSON
  /** key -> the exact `<kind> attach ...` command that re-registers
    * the artifact (recorded by each Engine create command). */
  @volatile private var artifacts = Map.empty[String, String]
  @volatile private var reloadErrs = Seq.empty[String]

  reload() // a root-backed catalog starts as the fleet it recorded

  def registerTable(name: String, path: String,
      schema: Option[StructType] = None,
      nanoTs: Seq[String] = Nil): Unit = synchronized {
    require(!jdbcTables.contains(name),
      s"$name is already a registered JDBC table — the JDBC " +
        "registration would shadow this parquet one")
    // the third leg of the no-shadowing invariant: table() resolves
    // views FIRST, so registering a table under an existing view's
    // name would be silently shadowed live and then resolve to the
    // TABLE after a restart (reload loads table_ before view_ and
    // drops the colliding view into reloadErrors) — same name,
    // different data across the restart. Refuse loudly instead.
    require(!views.contains(name),
      s"$name is already a view — the table registration would be " +
        "shadowed by it")
    val sch = schema.getOrElse(Tables.loadPath(spark, path, nanoTs).schema)
    tables += name -> TableReg(name, path, sch.json, nanoTs)
    persist(s"table_$name.json",
      s"""{"table": {"name": ${q(name)}, "path": ${q(path)}, """ +
        s""""nano_ts": [${nanoTs.map(q).mkString(", ")}]}}""")
  }

  /** Register a TimePartitions-written table: scans get directory-level
    * pruning when the Engine injects the time-range partition filter. */
  def registerPartitionedTable(name: String, path: String, tsCol: String,
      unit: String, n: Int, nanoTs: Seq[String] = Nil): Unit = synchronized {
    registerTable(name, path, None, nanoTs)
    partitionMetas += name -> ((tsCol, unit, n))
  }

  def partitionMeta(name: String): Option[(String, String, Int)] =
    partitionMetas.get(name)

  /** Register a JDBC-served table (see [[Catalog.JdbcReg]]). `options`
    * pass through to the Spark JDBC source verbatim — driver, user,
    * password, fetchsize, and the parallel-scan triple
    * partitionColumn/lowerBound/upperBound + numPartitions (without
    * which a JDBC scan is ONE task; at scale always set them).
    *
    * The name must not collide with a registered parquet table or
    * view — a JDBC registration resolving ahead of same-named local
    * data would silently shadow it. A `password` option is kept
    * IN-MEMORY ONLY: the persisted jdbc_<name>.json never carries it
    * (plaintext credentials must not land in the metadata root), so
    * after a restart the connection re-authenticates from the url or
    * an external secret, or `connect dbms` is re-issued. */
  def registerJdbcTable(name: String, url: String, dbtable: String,
      options: Map[String, String] = Map.empty): Unit = synchronized {
    require(!tables.contains(name) && !views.contains(name),
      s"$name is already a registered table/view — a JDBC " +
        "registration would shadow it")
    jdbcTables += name -> JdbcReg(name, url, dbtable, options)
    val persisted = options - "password"
    persist(s"jdbc_$name.json",
      s"""{"jdbc": {"name": ${q(name)}, "url": ${q(url)}, """ +
        s""""dbtable": ${q(dbtable)}, "options": {${persisted.toSeq.sorted
          .map { case (k, v) => s"${q(k)}: ${q(v)}" }
          .mkString(", ")}}}}""")
  }

  def jdbcMeta(name: String): Option[JdbcReg] = jdbcTables.get(name)

  /** Persisted native-Kafka consumer cursor: (topic, partition) ->
    * next offset to fetch. Journaled AFTER each landed batch
    * (`kafkaoff_<topic>.json` beside the other catalog files), so a
    * consumer restart resumes where the last landing stopped instead
    * of re-seeding from the reset policy and re-landing every retained
    * message as duplicate rows. Land-then-journal ordering makes a
    * crash BETWEEN the two re-deliver at most ONE fetch batch
    * (at-least-once floor), never the whole topic; the reference's
    * consumer gets the same guarantee from its group commit
    * (api/al_kafka.py enable.auto.commit). */
  def kafkaOffset(topic: String, partition: Int): Option[Long] =
    kafkaOffsets.get((topic, partition))

  def saveKafkaOffset(topic: String, partition: Int,
      next: Long): Unit = synchronized {
    kafkaOffsets += (topic, partition) -> next
    // one file per topic: the write is proportional to the topic's
    // partition count, not the node's topic count
    val parts = kafkaOffsets.collect {
      case ((t, p), o) if t == topic => (p, o)
    }.toSeq.sortBy(_._1)
    // filename = sanitized name + a topic hash: two topics that
    // differ only in sanitized-away characters ("a/b" vs "a_b") must
    // not share a file (reload reads the topic from the JSON body,
    // so the filename only has to be collision-free)
    val h = {
      val c = new java.util.zip.CRC32
      c.update(topic.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.lang.Long.toHexString(c.getValue)
    }
    persist(s"kafkaoff_${sanitize(topic)}_$h.json",
      s"""{"kafka_offsets": {"topic": ${q(topic)}, "partitions": {""" +
        parts.map { case (p, o) => s"${q(p.toString)}: $o" }
          .mkString(", ") + "}}}")
  }

  def createView(name: String, table: String,
      columns: Seq[(String, String)]): Unit = synchronized {
    // keep the no-shadowing invariant symmetric with registerTable /
    // registerJdbcTable: table() resolves views FIRST, so a view named
    // like an existing table (parquet or JDBC) would silently hide it.
    // Re-defining an existing VIEW stays allowed (idempotent replace).
    require(!jdbcTables.contains(name),
      s"$name is already a registered JDBC table — the view would " +
        "shadow it")
    require(!tables.contains(name),
      s"$name is already a registered table — the view would shadow it")
    views += name -> ViewDef(name, table, columns)
    persist(s"view_$name.json",
      s"""{"view": {"name": ${q(name)}, "table": ${q(table)}, """ +
        s""""columns": [${columns.map { case (s, d) =>
          s"[${q(s)}, ${q(d)}]" }.mkString(", ")}]}}""")
  }

  def addPolicy(id: String, json: String): Unit = synchronized {
    policies += id -> json
    persist(s"policy_$id.json", json)
  }
  def policy(id: String): Option[String] = policies.get(id)
  def policyList: Seq[(String, String)] = policies.toSeq.sortBy(_._1)

  /** Record the attach command that re-registers a standing artifact
    * after a restart (each Engine `... create` calls this; `attach
    * all` replays them). Keyed so re-creating at the same path
    * overwrites rather than duplicates. */
  def recordArtifact(key: String, attachCmd: String): Unit = synchronized {
    artifacts += key -> attachCmd
    persist(artifactFile(key),
      s"""{"artifact": {"key": ${q(key)}, "attach": ${q(attachCmd)}}}""")
    // upgrade: drop a record persisted under the legacy (un-hashed)
    // name so it cannot linger and replay a stale command
    root.foreach { r =>
      val legacy = r.resolve(s"artifact_${sanitize(key)}.json")
      try Files.deleteIfExists(legacy)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
  def artifactList: Seq[(String, String)] = artifacts.toSeq.sortBy(_._1)
  /** The recorded attach command for `key`, if any (the conflict check
    * for idempotent service re-declarations). */
  def artifactRecord(key: String): Option[String] = artifacts.get(key)

  /** Filename = sanitized key + key hash: two keys differing only in
    * sanitized-away characters (topic wildcards `#`/`+`, `,`-joined
    * topic lists) must not share a file — same scheme as the kafka
    * offset journal. */
  private def artifactFile(key: String): String = {
    val c = new java.util.zip.CRC32
    c.update(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s"artifact_${sanitize(key)}_${java.lang.Long.toHexString(c.getValue)}.json"
  }

  /** Drop an attach record (an explicitly exited SERVICE must not be
    * resurrected by the next `attach all` — the operator stopped it). */
  def removeArtifact(key: String): Unit = synchronized {
    artifacts -= key
    root.foreach { r =>
      try {
        Files.deleteIfExists(r.resolve(artifactFile(key)))
        // legacy (pre-hash) name too
        Files.deleteIfExists(r.resolve(s"artifact_${sanitize(key)}.json"))
      } catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Entries the last [[reload]] could not restore (path vanished,
    * unparseable file) — surfaced, never thrown. */
  def reloadErrors: Seq[String] = reloadErrs

  /** Rehydrate every registration persisted at the metadata root (the
    * reference's startup `blockchain load`). Called by the
    * constructor; callable again after external changes. */
  def reload(): Unit = root.foreach { r =>
    if (Files.exists(r)) {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val errs = Seq.newBuilder[String]
      val files = {
        val s = Files.list(r)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.toVector.sortBy(_.getFileName.toString)
        } finally s.close()
      }
      files.foreach { f =>
        val fn = f.getFileName.toString
        def body = Files.readString(f)
        try {
          if (fn.startsWith("table_") && fn.endsWith(".json")) {
            val t = JsonMethods.parse(body) \ "table"
            registerTable((t \ "name").extract[String],
              (t \ "path").extract[String], None,
              (t \ "nano_ts").extractOpt[List[String]].getOrElse(Nil))
          } else if (fn.startsWith("view_") && fn.endsWith(".json")) {
            val v = JsonMethods.parse(body) \ "view"
            createView((v \ "name").extract[String],
              (v \ "table").extract[String],
              (v \ "columns").extract[List[List[String]]].map {
                case List(s, d) => (s, d)
                case other => throw new IllegalArgumentException(
                  s"bad view column pair $other")
              })
          } else if (fn.startsWith("jdbc_") && fn.endsWith(".json")) {
            val j = JsonMethods.parse(body) \ "jdbc"
            registerJdbcTable((j \ "name").extract[String],
              (j \ "url").extract[String],
              (j \ "dbtable").extract[String],
              (j \ "options").extract[Map[String, String]])
          } else if (fn.startsWith("kafkaoff_") && fn.endsWith(".json")) {
            val k = JsonMethods.parse(body) \ "kafka_offsets"
            val topic = (k \ "topic").extract[String]
            (k \ "partitions").extract[Map[String, Long]].foreach {
              case (p, o) => kafkaOffsets += (topic, p.toInt) -> o
            }
          } else if (fn.startsWith("policy_") && fn.endsWith(".json")) {
            policies += fn.stripPrefix("policy_")
              .stripSuffix(".json") -> body
          } else if (fn.startsWith("artifact_") && fn.endsWith(".json")) {
            val a = JsonMethods.parse(body) \ "artifact"
            artifacts += (a \ "key").extract[String] ->
              (a \ "attach").extract[String]
          }
        } catch { case e: Exception =>
          errs += s"$fn: ${e.getMessage}"
        }
      }
      reloadErrs = errs.result()
    }
  }

  /** Resolve a (table or view) name to a DataFrame: views compile to a
    * select-with-alias over their base table — Catalyst folds this into
    * the scan (column pruning sees through it). */
  def table(name: String): DataFrame =
    views.get(name) match {
      case Some(v) =>
        import org.apache.spark.sql.functions.col
        table(v.table).select(v.columns.map { case (src, dst) =>
          col(src).as(dst)
        }: _*)
      case None => jdbcTables.get(name) match {
        case Some(j) =>
          val r = spark.read.format("jdbc")
            .option("url", j.url).option("dbtable", j.dbtable)
          j.options.foreach { case (k, v) => r.option(k, v) }
          r.load()
        case None =>
          val reg = tables.getOrElse(name,
            throw new IllegalArgumentException(s"unknown table $name"))
          Tables.loadPath(spark, reg.path, reg.nanoTs)
      }
    }

  /** Storage path of a registered (non-view) table — the append target
    * for REST PUT ingest. */
  def tablePath(name: String): Option[String] = tables.get(name).map(_.path)

  /** Frozen schema of a registered table (what ingest aligns rows to). */
  def tableSchema(name: String): Option[StructType] =
    tables.get(name).map(r =>
      org.apache.spark.sql.types.DataType.fromJson(r.schemaJson)
        .asInstanceOf[StructType])

  def tableNames: Seq[String] =
    (tables.keys ++ jdbcTables.keys).toSeq.distinct.sorted
  def viewNames: Seq[String] = views.keys.toSeq.sorted

  // full JSON escaping (control chars included) — the shared helper,
  // so a persisted name/path with a newline can't corrupt its record
  private def q(s: String) = Render.jsonStr(s)

  private def sanitize(s: String) =
    s.replaceAll("[^A-Za-z0-9._-]", "_")

  private def persist(file: String, content: String): Unit =
    root.foreach { r =>
      Files.createDirectories(r)
      // write-temp + atomic rename, never truncate-in-place: a crash
      // mid-write must leave the PREVIOUS record intact, not a torn
      // file that reload silently files under reloadErrors (for the
      // kafka offset journal a torn file would mean re-seeding from
      // the reset policy — re-ingesting the whole retained topic)
      val tmp = r.resolve(file + ".tmp")
      Files.writeString(tmp, content)
      try Files.move(tmp, r.resolve(file),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      catch {
        case _: java.nio.file.AtomicMoveNotSupportedException =>
          // exotic filesystems: plain replace keeps the behavior,
          // losing only the atomicity upgrade
          Files.move(tmp, r.resolve(file),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }

  /** The metadata root this catalog persists to (None = in-memory) —
    * the Engine parks the ingest ledger's journal beside the catalog
    * files so PUT idempotence survives a restart too. */
  def metaRoot: Option[Path] = root
}
