package graft.schema

import org.apache.spark.sql.types._

/** The two canonical schemas of the reference workload (SURVEY.md §1.4).
  *
  * Input: the superset sysmon schema from
  * /root/reference/rules/sigma/windows-process-creation.sql:1-49 (38
  * event_data string fields, duplicates and the `ParentPrcessName` typo
  * replicated verbatim for fidelity), plus the process-access 9-field
  * subset (…/windows-process-access.sql:12-22) which is a projection of it.
  *
  * Output: the 7-field `event` superset alert schema
  * (…/windows-process-access.sql:38-70); the process-creation variant drops
  * `event.module` (…/windows-process-creation.sql:62-93) — sink adapters
  * can drop the field, the engine always carries the superset.
  */
object Schemas {
  /** event_data fields, in reference DDL order (windows-process-creation.sql:5-45). */
  val eventDataFields: Seq[String] = Seq(
    "CallTrace", "GrantedAccess", "SourceImage", "TargetImage", "Image",
    "ParentImage", "OriginalFileName", "sha1", "EventType", "WMIcommand",
    "EventLog", "Imphash", "DestinationPort", "Initiated", "User",
    "DestinationHostname", "StartModule", "EventID", "TargetProcessAddress",
    "StartFunction", "IntegrityLevel", "Description", "CurrentDirectory",
    "Company", "Product", "ProcessCommandLine", "DestinationIp",
    "DestinationIsIpv6", "SourcePort", "ParentPrcessName", // [sic]
    "processCommandLine", "LogonId", "SubjectLogonId", "FileVersion",
    "ParentUser", "CommandLine", "ParentCommandLine", "UtcTime")

  val eventData: StructType =
    StructType(eventDataFields.map(f => StructField(f, StringType)))

  /** Full sysmon input row (top-level timestamp is the Kafka record
    * timestamp — METADATA column, windows-process-creation.sql:48). */
  val sysmon: StructType = StructType(Seq(
    StructField("computer_name", StringType),
    StructField("event_id", LongType),
    StructField("host", StringType),
    StructField("event_data", eventData),
    StructField("uuid", StringType),
    StructField("timestamp", TimestampType)))

  /** JSON-body schema: everything except `timestamp`, which is Kafka
    * record metadata, not part of the payload (SURVEY §2.1 S3). */
  val sysmonNoTs: StructType =
    StructType(sysmon.fields.filterNot(_.name == "timestamp"))

  val alertEvent: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("module", StringType), // absent in the creation-shape sink
    StructField("origin_ids", ArrayType(StringType)),
    StructField("count", LongType),
    StructField("start", TimestampType),
    StructField("end", TimestampType),
    StructField("time", TimestampType)))

  val alertThreat: StructType = StructType(Seq(
    StructField("tactic", ArrayType(StringType)),
    StructField("technique", ArrayType(StringType)),
    StructField("subtechnique", ArrayType(StringType))))

  val alertRule: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("author", StringType),
    StructField("category", StringType),
    StructField("severity", IntegerType),
    StructField("description", StringType),
    StructField("reference", ArrayType(StringType)),
    StructField("version", StringType),
    StructField("source", StringType)))

  val alert: StructType = StructType(Seq(
    StructField("computer_name", StringType),
    StructField("host", StringType),
    StructField("event", alertEvent),
    StructField("threat", alertThreat),
    StructField("rule", alertRule)))
}
