package graft.engine

import java.nio.file.{Files, Paths, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal metadata service standing in for the reference's blockchain/
  * master ledger (policies are plain JSON there too —
  * /root/reference/edge_lake/blockchain/metadata.py:161 `load`): table
  * registrations (name -> storage path + frozen schema), views
  * (rename/subset mappings, cmd/member_cmd.py:21065 `create view`,
  * consumed at dbms/unify_results.py:1049-1061), and mapping policies.
  *
  * Persistence is a JSON file per policy under one directory — at fleet
  * scale this becomes a Delta table or an external store; the interface
  * is what matters (resolve table -> DataFrame).
  */
object Catalog {
  final case class TableReg(name: String, path: String, schemaJson: String,
      nanoTs: Seq[String])
  /** View: target table + projected (sourceColumn -> viewColumn) pairs
    * (a rename/subset map, exactly the reference's view shape). */
  final case class ViewDef(name: String, table: String,
      columns: Seq[(String, String)])
}

final class Catalog(spark: SparkSession, root: Option[Path] = None) {
  import Catalog.{TableReg, ViewDef}

  /** (tsCol, unit, n) for tables written via TimePartitions. */
  private var partitionMetas = Map.empty[String, (String, String, Int)]
  private var tables = Map.empty[String, TableReg]
  private var views = Map.empty[String, ViewDef]
  private var policies = Map.empty[String, String] // id -> policy JSON

  def registerTable(name: String, path: String,
      schema: Option[StructType] = None,
      nanoTs: Seq[String] = Nil): Unit = {
    val sch = schema.getOrElse(Tables.loadPath(spark, path, nanoTs).schema)
    tables += name -> TableReg(name, path, sch.json, nanoTs)
    persist(s"table_$name.json",
      s"""{"table": {"name": "${name}", "path": "${path}"}}""")
  }

  /** Register a TimePartitions-written table: scans get directory-level
    * pruning when the Engine injects the time-range partition filter. */
  def registerPartitionedTable(name: String, path: String, tsCol: String,
      unit: String, n: Int, nanoTs: Seq[String] = Nil): Unit = {
    registerTable(name, path, None, nanoTs)
    partitionMetas += name -> ((tsCol, unit, n))
  }

  def partitionMeta(name: String): Option[(String, String, Int)] =
    partitionMetas.get(name)

  def createView(name: String, table: String,
      columns: Seq[(String, String)]): Unit = {
    views += name -> ViewDef(name, table, columns)
  }

  def addPolicy(id: String, json: String): Unit = {
    policies += id -> json
    persist(s"policy_$id.json", json)
  }
  def policy(id: String): Option[String] = policies.get(id)
  def policyList: Seq[(String, String)] = policies.toSeq.sortBy(_._1)

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
      case None =>
        val reg = tables.getOrElse(name,
          throw new IllegalArgumentException(s"unknown table $name"))
        Tables.loadPath(spark, reg.path, reg.nanoTs)
    }

  /** Storage path of a registered (non-view) table — the append target
    * for REST PUT ingest. */
  def tablePath(name: String): Option[String] = tables.get(name).map(_.path)

  /** Frozen schema of a registered table (what ingest aligns rows to). */
  def tableSchema(name: String): Option[StructType] =
    tables.get(name).map(r =>
      org.apache.spark.sql.types.DataType.fromJson(r.schemaJson)
        .asInstanceOf[StructType])

  def tableNames: Seq[String] = tables.keys.toSeq.sorted
  def viewNames: Seq[String] = views.keys.toSeq.sorted

  private def persist(file: String, content: String): Unit =
    root.foreach { r =>
      Files.createDirectories(r)
      Files.writeString(r.resolve(file), content)
    }
}
