package graft.rules

import graft.compile.Pred

/** A fully-compiled detection rule — the engine-internal form every rule
  * reaches, whether transcribed from the reference corpus
  * (the SQL files under /root/reference/rules/sigma/) or compiled from Sigma YAML by
  * [[graft.compile.RuleCompiler]].
  *
  * `module` is Some("process_access") for the statement-set-shape rules
  * (windows-process-access.sql:80 passes a module into the event ROW) and
  * None for the union-view-shape rules whose sink omits `event.module`
  * (windows-process-creation.sql:62-72). `enabled=false` marks the six
  * rules commented out at windows-process-creation.sql:124-129 — carried in
  * the corpus for completeness, excluded from the default pipeline exactly
  * like the reference.
  */
case class RuleDef(
    name: String,
    author: String,
    severity: Int,
    description: String,
    references: Seq[String],
    tactic: Seq[String],
    technique: Seq[String],
    subtechnique: Seq[String],
    module: Option[String],
    where: Pred,
    category: String = "sysmon",
    version: String = "1.0",
    source: String = "sysmon",
    enabled: Boolean = true)
