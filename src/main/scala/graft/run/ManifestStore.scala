package graft.run

import org.json4s._
import org.json4s.jackson.JsonMethods

import scala.collection.immutable.ListMap

/** Persisted per-batch manifest with rerun history — the durable
  * CONTRACT of the reference's manifest plane
  * (handlers/batch_processing.py:160-239) without its polling/merge
  * concurrency machinery (deliberately not ported, SURVEY §7.4.8):
  *
  *  - one JSON artifact per batch at `tools/manifests/<batchId>.json`,
  *    written via [[WarehouseFs.publishAtomic]] (temp file + atomic
  *    replace on the warehouse's own filesystem), so a reader never
  *    observes a torn manifest;
  *  - re-runs never overwrite history: a file whose status CHANGES on a
  *    later save is appended under a `<name>_rerunN` key
  *    (scripts/silver_clean_transform.py:102-115), so the manifest
  *    records every attempt — `prd_info: FAILED, prd_info_rerun1:
  *    COMPLETED` reads as "failed once, healed on the rerun";
  *  - saving an identical terminal status is a no-op (idempotent saves
  *    for idempotent re-runs, the S8 contract applied to metadata).
  *
  * json4s ships with Spark, so this adds no dependency.
  */
object ManifestStore {

  /** One persisted file entry. `key` carries the rerun suffix. */
  final case class Entry(key: String, sourceSystem: String, status: String)

  def manifestPath(warehouse: String, batchId: String): String =
    s"$warehouse/tools/manifests/$batchId.json"

  /** Load the persisted entries in file order (empty if no manifest). */
  def load(warehouse: String, batchId: String): Seq[Entry] = {
    val p = manifestPath(warehouse, batchId)
    if (!WarehouseFs.exists(p)) Seq.empty
    else JsonMethods.parse(WarehouseFs.readString(p)) \ "files" match {
      case JObject(fields) => fields.map { case (k, v) =>
        Entry(k,
          (v \ "source_system").asInstanceOf[JString].s,
          (v \ "status").asInstanceOf[JString].s)
      }
      case _ => Seq.empty
    }
  }

  /** Base logical name of an entry key (strips the rerun suffix). */
  def baseName(key: String): String =
    key.replaceAll("_rerun\\d+$", "")

  /** Merge this run's terminal statuses into the persisted manifest and
    * write it atomically. For each file: first sighting → base key; a
    * changed status → next `_rerunN` key; an unchanged status → no new
    * entry.
    */
  def save(warehouse: String, m: Orchestrator.Manifest): Unit = {
    val existing = load(warehouse, m.batchId)
    var entries: ListMap[String, (String, String)] =
      ListMap(existing.map(e => e.key -> (e.sourceSystem, e.status)): _*)

    m.files.foreach { fe =>
      val history = existing.filter(e => baseName(e.key) == fe.logicalName)
      if (history.isEmpty)
        entries += fe.logicalName -> (fe.sourceSystem, fe.status)
      else if (history.last.status != fe.status)
        entries += s"${fe.logicalName}_rerun${history.size}" ->
          (fe.sourceSystem, fe.status)
    }

    val json = JObject(
      "client_schema" -> JString(m.clientSchema),
      "client_id" -> JInt(m.clientId),
      "batch_id" -> JString(m.batchId),
      "files" -> JObject(entries.toList.map { case (k, (src, st)) =>
        k -> (JObject("source_system" -> JString(src),
          "status" -> JString(st)): JValue)
      }))

    WarehouseFs.publishAtomic(manifestPath(warehouse, m.batchId),
      JsonMethods.pretty(JsonMethods.render(json)))
  }
}
