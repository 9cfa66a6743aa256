package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.MappingPolicy

/** Topic -> table routing for message-bus ingest: each arriving message
  * carries a topic; the topic selects the mapping policy, which in turn
  * names the target (dbms, table).
  *
  * Reference: `run msg client` registers per-topic mappings
  * (/root/reference/edge_lake/tcpip/mqtt_client.py:495-513 `add_topic`)
  * and resolves the dbms/table per message (:1153-1190, policy-computed
  * names :1252-1259). Here a route = (topic regex, policy); one shared
  * source stream fans out into per-table writers — each output is a
  * plain filtered+mapped frame, so a single Kafka/MQTT-bridge source
  * feeds N tables without re-reading.
  */
object TopicRouter {

  final case class Route(topicPattern: String, policy: MappingPolicy.Policy)

  /** A route pattern matches the WHOLE topic (anchored). rlike alone
    * does a regex FIND, so the plain topic name "sensor/1" would also
    * match "sensor/10" and "xsensor/1y" — double-ingesting into
    * sibling tables and mis-classifying dead letters. The reference's
    * add_topic matches topics exactly (modulo MQTT wildcards). */
  private def topicMatch(topicCol: String, pattern: String) =
    col(topicCol).rlike(
      (if (pattern.startsWith("^")) "" else "^") + pattern +
        (if (pattern.endsWith("$")) "" else "$"))

  /** Split a (topic, payload) frame into per-(dbms, table) mapped
    * frames. Works on batch and streaming frames alike. Several routes
    * may target the SAME (dbms, table) — the reference's normal
    * multi-topic add_topic configuration — so same-target frames are
    * UNIONED, never last-route-wins dropped. */
  def route(df: DataFrame, routes: Seq[Route],
      topicCol: String = "topic", payloadCol: String = "value")
      : Map[(String, String), DataFrame] =
    routes.map { r =>
      val matched = df.filter(topicMatch(topicCol, r.topicPattern))
      (r.policy.dbms, r.policy.table) ->
        MappingPolicy.compile(r.policy, matched, payloadCol)
    }.groupBy(_._1).map { case (key, frames) =>
      key -> frames.map(_._2).reduce(_ unionByName _)
    }

  /** Rows whose topic matches no route (the reference logs and drops
    * them; surfacing them as a frame lets callers dead-letter instead). */
  def unrouted(df: DataFrame, routes: Seq[Route],
      topicCol: String = "topic"): DataFrame = {
    val anyMatch = routes.map(r => topicMatch(topicCol, r.topicPattern))
      .reduceOption(_ || _).getOrElse(lit(false))
    df.filter(!anyMatch)
  }
}
