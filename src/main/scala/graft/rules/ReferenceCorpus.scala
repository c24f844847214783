package graft.rules

import graft.compile._
import graft.compile.dsl._

/** The complete reference rule corpus, transcribed predicate-for-predicate.
  *
  * 17 process-access rules (statement-set shape,
  * /root/reference/rules/sigma/windows-process-access.sql:75-598) and
  * 8 active + 6 disabled process-creation rules (union-view shape,
  * …/windows-process-creation.sql:108-129). Pattern strings are the values
  * the reference's SQL literals carry byte-for-byte (standard SQL literal
  * parsing: backslashes are NOT escapes, so doubled backslashes in the file
  * stay doubled here — see e.g. lazagneCallTrace vs the single-backslash
  * patterns of pypykatz; these inconsistencies are the corpus's own,
  * SURVEY.md §2.11 "fidelity decisions"). Trailing spaces inside threat
  * tags (e.g. "attack.execution ") are likewise verbatim
  * (windows-process-creation.sql:112).
  */
object ReferenceCorpus {
  private val CT = "CallTrace"; private val GA = "GrantedAccess"
  private val SI = "SourceImage"; private val TI = "TargetImage"
  private val IM = "Image"; private val PI = "ParentImage"
  private val CL = "CommandLine"; private val PCL = "ParentCommandLine"

  private val pa = Some("process_access")

  /** windows-process-access.sql:75-102 */
  val verclsidShellcode = RuleDef(
    name = "Malware Shellcode in Verclsid Target Process",
    author = "John Lambert (tech), Florian Roth (rule)",
    severity = 7,
    description = "Detects a process access to verclsid.exe that injects shellcode from a Microsoft Office application / VBA macro",
    references = Seq("https://twitter.com/JohnLaTwC/status/837743453039534080"),
    tactic = Seq("attack.defense_evasion", "attack.privilege_escalation"),
    technique = Seq("attack.t1055"), subtechnique = Seq(""),
    module = pa,
    where = eventId(10) and (
      all(TI.like("""%\verclsid.exe"""), GA.eq_("0x1FFFFF"),
        CT.like("""%|UNKNOWN(%""") and CT.like("""%VBE7.DLL%"""))
        or all(SI.like("""%\Microsoft Office\%"""), CT.like("""%|UNKNOWN%"""))))

  /** windows-process-access.sql:105-132. The WHERE's mixed AND/OR relies on
    * SQL precedence: A4 ∨ (B2 ∧ C) ∨ (D ∧ IN ∧ ¬F) — transcribed as such. */
  val inMemoryModuleExec = RuleDef(
    name = "Suspicious In-Memory Module Execution",
    author = "Perez Diego (@darkquassar), oscd.community, Jonhnathan Ribeiro",
    severity = 9,
    description = "Detects the access to processes by other suspicious processes which have reflectively loaded libraries in their memory space. An example is SilentTrinity C2 behaviour. Generally speaking, when Sysmon EventID 10 cannot reference a stack call to a dll loaded from disk (the standard way), it will display \"UNKNOWN\" as the module name. Usually this means the stack call points to a module that was reflectively loaded in memory. Adding to this, it is not common to see such few calls in the stack (ntdll.dll --> kernelbase.dll --> unknown) which essentially means that most of the functions required by the process to execute certain routines are already present in memory, not requiring any calls to external libraries. The latter should also be considered suspicious.",
    references = Seq("https://azure.microsoft.com/en-ca/blog/detecting-in-memory-attacks-with-sysmon-and-azure-security-center/"),
    tactic = Seq("attack.privilege_escalation", "attack.defense_evasion"),
    technique = Seq("t1055", "t1055", "attack.t1055"),
    subtechnique = Seq("attack.t1055.001", "attack.t1055.002"),
    module = pa,
    where = eventId(10) and (
      all(CT.like("""%C:\WINDOWS\SYSTEM32\ntdll.dll+%"""),
        CT.like("""%|C:\WINDOWS\System32\KERNELBASE.dll+%"""),
        CT.like("""%|UNKNOWN(%"""), CT.like("""%)%"""))
        or (all(CT.like("""%UNKNOWN(%"""), CT.like("""%)|UNKNOWN(%""")) and CT.like("""%)"""))
        or all(CT.like("""%UNKNOWN%"""),
          GA.in_("0x1F0FFF", "0x1F1FFF", "0x143A", "0x1410", "0x1010", "0x1F2FFF", "0x1F3FFF", "0x1FFFFF"),
          !SI.like("""%\Windows\System32\sdiagnhost.exe"""))))

  /** windows-process-access.sql:135-162 (doubled backslashes verbatim). */
  val lazagne = RuleDef(
    name = "Credential Dumping by LaZagne",
    author = "Bhabesh Raj, Jonhnathan Ribeiro",
    severity = 9,
    description = "Detects LSASS process access by LaZagne for credential dumping.",
    references = Seq("https://twitter.com/bh4b3sh/status/1303674603819081728"),
    tactic = Seq("attack.credential_access"), technique = Seq("t1003"),
    subtechnique = Seq("attack.t1003.001"),
    module = pa,
    where = eventId(10) and TI.like("""%\lsass.exe""") and
      all(CT.like("""%C:\\Windows\\SYSTEM32\\ntdll.dll+%"""),
        CT.like("""%|C:\\Windows\\System32\\KERNELBASE.dll+%"""),
        CT.like("""%_ctypes.pyd+%"""), CT.like("""%python27.dll+%""")) and
      GA.eq_("0x1FFFFF"))

  /** windows-process-access.sql:165-192 ("Asccess" typo verbatim). */
  val svchostMemAccess = RuleDef(
    name = "Suspect Svchost Memory Asccess",
    author = "Tim Burrell",
    severity = 7,
    description = "Detects suspect access to svchost process memory such as that used by Invoke-Phantom to kill the winRM windows event logging service.",
    references = Seq("https://github.com/hlldz/Invoke-Phant0m", "https://twitter.com/timbmsft/status/900724491076214784"),
    tactic = Seq("attack.defense_evasion"),
    technique = Seq("t1562", "attack.t1089"), subtechnique = Seq("attack.t1562.002"),
    module = pa,
    where = eventId(10) and TI.like("""%\WINDOWS\System32\svchost.exe""") and
      GA.eq_("0x1F3FFF") and CT.like("""%UNKNOWN%"""))

  /** windows-process-access.sql:195-222 */
  val svchostCredDump = RuleDef(
    name = "SVCHOST Credential Dump",
    author = "Florent Labouyrie",
    severity = 9,
    description = "Detects when a process, such as mimikatz, accesses the memory of svchost to dump credentials",
    references = Seq(""),
    tactic = Seq(""), technique = Seq("attack.t1548"), subtechnique = Seq(""),
    module = pa,
    where = eventId(10) and all(
      TI.like("""%\svchost.exe"""), GA.eq_("0x143a"),
      !(SI.like("""%\services.exe""") or SI.like("""%\msiexec.exe"""))))

  /** windows-process-access.sql:225-252. No event_id prefix and
    * untranslated Sigma `*` wildcards in = / IN — can never match;
    * replicated verbatim (SURVEY.md §2.11 quirk list). */
  val winrmShells = RuleDef(
    name = "Suspicious Shells Spawn by WinRM",
    author = "Andreas Hunkeler (@Karneades), Markus Neis",
    severity = 7,
    description = "Detects suspicious shell spawn from WinRM host process",
    references = Seq(""),
    tactic = Seq("attack.initial_access", "attack.persistence", "attack.privilege_escalation"),
    technique = Seq("attack.t1190"), subtechnique = Seq(""),
    module = pa,
    where = PI.eq_("""*\wsmprovhost.exe""") and
      IM.in_("""*\cmd.exe""", """*\sh.exe""", """*\bash.exe""", """*\powershell.exe""",
        """*\schtasks.exe""", """*\certutil.exe""", """*\whoami.exe""", """*\bitsadmin.exe"""))

  /** windows-process-access.sql:255-282 */
  val wow64LoggerUac = RuleDef(
    name = "UAC Bypass Using WOW64 Logger DLL Hijack",
    author = "Christian Burkard",
    severity = 7,
    description = "Detects the pattern of UAC Bypass using a WoW64 logger DLL hijack (UACMe 30)",
    references = Seq("https://github.com/hfiref0x/UACME"),
    tactic = Seq("attack.defense_evasion", "attack.privilege_escalation"),
    technique = Seq("t1548"), subtechnique = Seq("attack.t1548.002"),
    module = pa,
    where = eventId(10) and SI.like("""%:\Windows\SysWOW64\%""") and
      GA.eq_("0x1fffff") and
      CT.like("""UNKNOWN(0000000000000000)|UNKNOWN(0000000000000000)|%"""))

  /** windows-process-access.sql:285-312 */
  val directSyscall = RuleDef(
    name = "Direct Syscall of NtOpenProcess",
    author = "Christian Burkard",
    severity = 9,
    description = "Detects the usage of the direct syscall of NtOpenProcess which might be done from a CobaltStrike BOF.",
    references = Seq("https://medium.com/falconforce/falconfriday-direct-system-calls-and-cobalt-strike-bofs-0xff14-741fa8e1bdd6"),
    tactic = Seq("attack.execution"), technique = Seq("attack.t1106"),
    subtechnique = Seq(""),
    module = pa,
    where = eventId(10) and CT.like("UNKNOWN%"))

  /** windows-process-access.sql:315-342 (quadruple backslashes verbatim:
    * as a regex they match doubled-backslash CallTrace data). */
  val cobaltStrikeBof = RuleDef(
    name = "CobaltStrike BOF Injection Pattern",
    author = "Christian Burkard",
    severity = 7,
    description = "Detects a typical pattern of a CobaltStrike BOF which inject into other processes",
    references = Seq("https://github.com/boku7/injectAmsiBypass", "https://github.com/boku7/spawn"),
    tactic = Seq("attack.execution", "attack.defense_evasion"),
    technique = Seq("attack.t1106", "t1562"), subtechnique = Seq("attack.t1562.001"),
    module = pa,
    where = eventId(10) and
      CT.similarTo("""^C:\\\\Windows\\\\SYSTEM32\\\\ntdll\\.dll\+[a-z0-9]{4,6}\|C:\\\\Windows\\\\System32\\\\KERNELBASE\\.dll\+[a-z0-9]{4,6}\|UNKNOWN\([A-Z0-9]{16}\)$""") and
      GA.in_("0x1028", "0x1fffff"))

  /** windows-process-access.sql:345-372 (`CallTrace IN (...)` where the
    * upstream Sigma rule means *contains* — verbatim quirk). */
  val lsassMemDump = RuleDef(
    name = "LSASS Memory Dump",
    author = "Samir Bousseaden",
    severity = 7,
    description = "Detects process LSASS memory dump using procdump or taskmgr based on the CallTrace pointing to dbghelp.dll or dbgcore.dll for win10",
    references = Seq("https://blog.menasec.net/2019/02/threat-hunting-21-procdump-or-taskmgr.html"),
    tactic = Seq("attack.credential_access"),
    technique = Seq("t1003", "attack.t1003"), subtechnique = Seq("attack.t1003.001"),
    module = pa,
    where = eventId(10) and TI.like("""%\lsass.exe""") and
      GA.eq_("0x1fffff") and CT.in_("dbghelp.dll", "dbgcore.dll"))

  /** windows-process-access.sql:375-402 */
  val comsvcsMiniDump = RuleDef(
    name = "Lsass Memory Dump via Comsvcs DLL",
    author = "Roberto Rodriguez (Cyb3rWard0g), OTR (Open Threat Research)",
    severity = 9,
    description = "Detects adversaries leveraging the MiniDump export function from comsvcs.dll via rundll32 to perform a memory dump from lsass.",
    references = Seq("https://twitter.com/shantanukhande/status/1229348874298388484",
      "https://modexp.wordpress.com/2019/08/30/minidumpwritedump-via-com-services-dll/"),
    tactic = Seq("attack.credential_access"), technique = Seq("t1003"),
    subtechnique = Seq("attack.t1003.001"),
    module = pa,
    where = eventId(10) and TI.like("""%\lsass.exe""") and
      SI.eq_("""C:\Windows\System32\rundll32.exe""") and CT.like("""%comsvcs.dll%"""))

  /** windows-process-access.sql:405-432 */
  val littleCorporal = RuleDef(
    name = "LittleCorporal Generated Maldoc Injection",
    author = "Christian Burkard",
    severity = 7,
    description = "Detects the process injection of a LittleCorporal generated Maldoc.",
    references = Seq("https://github.com/connormcgarr/LittleCorporal"),
    tactic = Seq("attack.execution"), technique = Seq("t1204", "t1055"),
    subtechnique = Seq("attack.t1204.002", "attack.t1055.003"),
    module = pa,
    where = eventId(10) and SI.like("%winword.exe") and
      (CT.like("""%:\Windows\Microsoft.NET\Framework64\v2.%""") and CT.like("""%UNKNOWN%""")))

  /** windows-process-access.sql:435-462 */
  val cmstpExecution = RuleDef(
    name = "CMSTP Execution Process Access",
    author = "Nik Seetharaman",
    severity = 7,
    description = "Detects various indicators of Microsoft Connection Manager Profile Installer execution",
    references = Seq("https://web.archive.org/web/20190720093911/http://www.endurant.io/cmstp/detecting-cmstp-enabled-code-execution-and-uac-bypass-with-sysmon/"),
    tactic = Seq("attack.defense_evasion", "attack.execution"),
    technique = Seq("t1218", "attack.t1191", "t1559", "attack.t1175"),
    subtechnique = Seq("attack.t1218.003", "attack.t1559.001"),
    module = pa,
    where = eventId(10) and CT.like("%cmlua.dll%"))

  /** windows-process-access.sql:465-492 */
  val editionUpgradeCom = RuleDef(
    name = "Load Undocumented Autoelevated COM Interface",
    author = "oscd.community, Dmitry Uchakin",
    severity = 7,
    description = "COM interface (EditionUpgradeManager) that is not used by standard executables.",
    references = Seq("https://www.snip2code.com/Snippet/4397378/UAC-bypass-using-EditionUpgradeManager-C/",
      "https://gist.github.com/hfiref0x/de9c83966623236f5ebf8d9ae2407611"),
    tactic = Seq("attack.defense_evasion", "attack.privilege_escalation"),
    technique = Seq("t1548"), subtechnique = Seq("attack.t1548.002"),
    module = pa,
    where = eventId(10) and CT.like("%editionupgrademanagerobj.dll%"))

  /** windows-process-access.sql:495-538 (15-deep exclusion list, duplicate
    * MsMpEng entry verbatim). */
  val credDumpToolsLsass = RuleDef(
    name = "Credentials Dumping Tools Accessing LSASS Memory",
    author = "Florian Roth, Roberto Rodriguez, Dimitrios Slamaris, Mark Russinovich, Thomas Patzke, Teymur Kheirkhabarov, Sherif Eldeeb, James Dickenson, Aleksey Potapov, oscd.community (update)",
    severity = 7,
    description = "Detects process access LSASS memory which is typical for credentials dumping tools",
    references = Seq(
      "https://onedrive.live.com/view.aspx?resid=D026B4699190F1E6!2843&ithint=file%2cpptx&app=PowerPoint&authkey=!AMvCRTKB_V1J5ow",
      "https://cyberwardog.blogspot.com/2017/03/chronicles-of-threat-hunter-hunting-for_22.html",
      "https://www.slideshare.net/heirhabarov/hunting-for-credentials-dumping-in-windows-environment",
      "http://security-research.dyndns.org/pub/slides/FIRST2017/FIRST-2017_Tom-Ueltschi_Sysmon_FINAL_notes.pdf"),
    tactic = Seq("attack.credential_access"),
    technique = Seq("t1003", "attack.t1003"), subtechnique = Seq("attack.t1003.001"),
    module = pa,
    where = eventId(10) and TI.like("""%\lsass.exe""") and
      GA.in_("0x40", "0x1000", "0x1400", "0x100000", "0x1410", "0x1010", "0x1438",
        "0x143a", "0x1418", "0x1f0fff", "0x1f1fff", "0x1f2fff", "0x1f3fff") and
      !any(
        SI.like("""%\wmiprvse.exe"""), SI.like("""%\taskmgr.exe"""),
        SI.like("""%\procexp64.exe"""), SI.like("""%\procexp.exe"""),
        SI.like("""%\lsm.exe"""), SI.like("""%\MsMpEng.exe"""),
        SI.like("""%\csrss.exe"""), SI.like("""%\MsMpEng.exe"""),
        SI.like("""%\Microsoft.Exchange.Diagnostics.Service.exe"""),
        SI.like("""%\taskhostw.exe"""), SI.like("""%\svchost.exe"""),
        SI.like("""%\MicrosoftEdgeUpdate.exe"""),
        SI.like("""%\Microsoft.Tri.Gateway.Updater.exe"""),
        SI.eq_("""C:\Windows\system32\CompatTelRunner.exe"""),
        SI.like("""%\wininit.exe"""), SI.like("""%\vmtoolsd.exe""")))

  /** windows-process-access.sql:541-568 (glob `*` inside a LIKE pattern
    * — '%python3*.dll+%' — verbatim quirk). */
  val pypykatz = RuleDef(
    name = "Credential Dumping by Pypykatz",
    author = "Bhabesh Raj",
    severity = 9,
    description = "Detects LSASS process access by pypykatz for credential dumping.",
    references = Seq("https://github.com/skelsec/pypykatz"),
    tactic = Seq("attack.credential_access"), technique = Seq("t1003"),
    subtechnique = Seq("attack.t1003.001"),
    module = pa,
    where = eventId(10) and TI.like("""%\lsass.exe""") and
      all(CT.like("""%C:\Windows\SYSTEM32\ntdll.dll+%"""),
        CT.like("""%C:\Windows\System32\KERNELBASE.dll+%"""),
        CT.like("""%libffi-7.dll%"""), CT.like("""%_ctypes.pyd+%"""),
        CT.like("""%python3*.dll+%""")) and
      GA.eq_("0x1FFFFF"))

  /** windows-process-access.sql:571-598 */
  val mimikatzWinrm = RuleDef(
    name = "Mimikatz through Windows Remote Management",
    author = "Patryk Prauze - ING Tech",
    severity = 7,
    description = "Detects usage of mimikatz through WinRM protocol by monitoring access to lsass process by wsmprovhost.exe.",
    references = Seq("https://pentestlab.blog/2018/05/15/lateral-movement-winrm/"),
    tactic = Seq("attack.credential_access", "attack.execution", "attack.lateral_movement"),
    technique = Seq("t1003", "attack.t1003", "t1059", "attack.t1086", "t1021", "attack.t1028"),
    subtechnique = Seq("attack.t1003.001", "attack.t1059.001", "attack.t1021.006"),
    module = pa,
    where = eventId(10) and TI.like("""%\lsass.exe""") and
      SI.eq_("""C:\Windows\system32\wsmprovhost.exe"""))

  val processAccess: Seq[RuleDef] = Seq(
    verclsidShellcode, inMemoryModuleExec, lazagne, svchostMemAccess,
    svchostCredDump, winrmShells, wow64LoggerUac, directSyscall,
    cobaltStrikeBof, lsassMemDump, comsvcsMiniDump, littleCorporal,
    cmstpExecution, editionUpgradeCom, credDumpToolsLsass, pypykatz,
    mimikatzWinrm)

  // ---- union-view shape (windows-process-creation.sql) -------------------
  // module=None: this sink variant has no event.module field. Trailing
  // spaces inside the tag strings are verbatim from the generated SQL.

  private val ymlBase = """C:\Users\hui.zhou\Downloads\sigma-master\rules\windows\"""

  /** windows-process-creation.sql:108-115 */
  val silenttrinityMsbuild = RuleDef(
    name = "Silenttrinity Stager Msbuild Activity",
    author = "Kiran kumar s, oscd.community",
    severity = 7,
    description = "Detects a possible remote connections to Silenttrinity c2",
    references = Seq(ymlBase + """network_connection\silenttrinity_stager_msbuild_activity.yml"""),
    tactic = Seq("attack.execution "), technique = Seq(""), subtechnique = Seq("t1127.001 "),
    module = None,
    where = eventId(3) and (PI.like("""%\msbuild.exe""") and
      ("Initiated".eq_("true") and ("DestinationPort".eq_("80") or "DestinationPort".eq_("443")))))

  /** windows-process-creation.sql:117 */
  val xwizardCustomClass = RuleDef(
    name = "Custom Class Execution via Xwizard",
    author = "Ensar Şamil, @sblmsrsn, @oscd_initiative",
    severity = 5,
    description = "Detects the execution of Xwizard tool with specific arguments which utilized to run custom class properties.",
    references = Seq(ymlBase + """process_creation\win_class_exec_xwizard.yml"""),
    tactic = Seq("attack.defense_evasion "), technique = Seq("t1218 "), subtechnique = Seq(""),
    module = None,
    where = eventId(1) and (IM.like("""%\xwizard.exe""") and
      CL.similarTo("""{[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-[a-fA-F0-9]{12}}""")))

  /** windows-process-creation.sql:118 */
  val clInvocation = RuleDef(
    name = "Execution via CL_Invocation.ps1",
    author = "oscd.community, Natalia Shornikova",
    severity = 7,
    description = "Detects Execution via SyncInvoke in CL_Invocation.ps1 module",
    references = Seq(ymlBase + """process_creation\win_cl_invocation_lolscript.yml"""),
    tactic = Seq("attack.defense_evasion "), technique = Seq("t1216 "), subtechnique = Seq(""),
    module = None,
    where = eventId(1) and (CL.like("%CL_Invocation.ps1%") and CL.like("%SyncInvoke%")))

  /** windows-process-creation.sql:119 */
  val clMutexverifiers = RuleDef(
    name = "Execution via CL_Mutexverifiers.ps1",
    author = "oscd.community, Natalia Shornikova",
    severity = 7,
    description = "Detects Execution via runAfterCancelProcess in CL_Mutexverifiers.ps1 module",
    references = Seq(ymlBase + """process_creation\win_cl_mutexverifiers_lolscript.yml"""),
    tactic = Seq("attack.defense_evasion "), technique = Seq("t1216 "), subtechnique = Seq(""),
    module = None,
    where = eventId(1) and (CL.like("%CL_Mutexverifiers.ps1%") and CL.like("%runAfterCancelProcess%")))

  /** windows-process-creation.sql:120 */
  val cmdkeyRecon = RuleDef(
    name = "Cmdkey Cached Credentials Recon",
    author = "jmallette",
    severity = 5,
    description = "Detects usage of cmdkey to look for cached credentials",
    references = Seq(ymlBase + """process_creation\win_cmdkey_recon.yml"""),
    tactic = Seq("attack.credential_access "), technique = Seq("t1003 "),
    subtechnique = Seq("t1003.005 "),
    module = None,
    where = eventId(1) and (CL.like("% /list%") and IM.like("""%\cmdkey.exe""")))

  /** windows-process-creation.sql:121 */
  val cmstpComUacBypass = RuleDef(
    name = "CMSTP UAC Bypass via COM Object Access",
    author = "Nik Seetharaman, Christian Burkard",
    severity = 7,
    description = "Detects UAC Bypass Attempt Using Microsoft Connection Manager Profile Installer Autoelevate-capable COM Objects (e.g. UACMe ID of 41, 43, 58 or 65)",
    references = Seq(ymlBase + """process_creation\win_cmstp_com_object_access.yml"""),
    tactic = Seq("attack.execution attack.defense_evasion attack.privilege_escalation "),
    technique = Seq("t1088 t1191 "), subtechnique = Seq("t1548.002 t1218.003 "),
    module = None,
    where = eventId(1) and all(
      PI.like("""%\DllHost.exe"""),
      "IntegrityLevel".eq_("High") or "IntegrityLevel".eq_("System"),
      any(
        PCL.like("% /Processid:{3E5FC7F9-9A51-4367-9063-A120244FBEC7}%"),
        PCL.like("% /Processid:{3E000D72-A845-4CD9-BD83-80C07C3B881F}%"),
        PCL.like("% /Processid:{BD54C901-076B-434E-B6C7-17C531F4AB41}%"),
        PCL.like("% /Processid:{D2E7041B-2927-42FB-8E9F-7CE93B6DC937}%"),
        PCL.like("% /Processid:{E9495B87-D950-4AB5-87A5-FF6D70BF3E90}%"))))

  /** windows-process-creation.sql:122 */
  val suspiciousSvchost = RuleDef(
    name = "Suspicious Svchost Process",
    author = "Florian Roth",
    severity = 7,
    description = "Detects a suspicious svchost process start",
    references = Seq(ymlBase + """process_creation\win_susp_svchost.yml"""),
    tactic = Seq("attack.defense_evasion "), technique = Seq("t1036 "),
    subtechnique = Seq("t1036.005 "),
    module = None,
    where = eventId(1) and (IM.like("""%\svchost.exe""") and
      !any(PI.like("""%\services.exe"""), PI.like("""%\MsMpEng.exe"""),
        PI.like("""%\Mrt.exe"""), PI.like("""%\rpcnet.exe"""), PI.like("""%\svchost.exe""")) and
      !PI.eq_("null")))

  /** windows-process-creation.sql:123 */
  val svchostNoCli = RuleDef(
    name = "Suspect Svchost Activity",
    author = "David Burkett",
    severity = 9,
    description = "It is extremely abnormal for svchost.exe to spawn without any CLI arguments and is normally observed when a malicious process spawns the process and injects code into the process memory space.",
    references = Seq(ymlBase + """process_creation\win_susp_svchost_no_cli.yml"""),
    tactic = Seq("attack.defense_evasion attack.privilege_escalation "),
    technique = Seq("t1055 "), subtechnique = Seq(""),
    module = None,
    where = eventId(1) and ((CL.like("%svchost.exe") and IM.like("""%\svchost.exe""")) and
      !((PI.like("""%\rpcnet.exe""") or PI.like("""%\rpcnetp.exe""")) or CL.eq_("null"))))

  // ---- disabled rules (windows-process-creation.sql:124-129) -------------

  /** windows-process-creation.sql:124 */
  val snatchRansomware = RuleDef(
    name = "Snatch Ransomware",
    author = "Florian Roth",
    severity = 9,
    description = "Detects specific process characteristics of Snatch ransomware word document droppers",
    references = Seq(ymlBase + """process_creation\win_crime_snatch_ransomware.yml"""),
    tactic = Seq("attack.execution "), technique = Seq("t1204 "), subtechnique = Seq(""),
    module = None, enabled = false,
    where = eventId(1) and (CL.like("%shutdown /r /f /t 00%") or CL.like("%net stop SuperBackupMan%")))

  /** windows-process-creation.sql:125 */
  val rarCompression = RuleDef(
    name = "Data Compressed - rar.exe",
    author = "Timur Zinniatullin, E.M. Anhaus, oscd.community",
    severity = 3,
    description = "An adversary may compress data (e.g., sensitive documents) that is collected prior to exfiltration in order to make it portable and minimize the amount of data sent over the network.",
    references = Seq(ymlBase + """process_creation\win_data_compressed_with_rar.yml"""),
    tactic = Seq("attack.exfiltration attack.collection "), technique = Seq("t1002 "),
    subtechnique = Seq("t1560.001 "),
    module = None, enabled = false,
    where = eventId(1) and (CL.like("% a %") and IM.like("""%\rar.exe""")))

  /** windows-process-creation.sql:126 */
  val fakeHxtsr = RuleDef(
    name = "Detecting Fake Instances Of Hxtsr.exe",
    author = "Sreeman",
    severity = 5,
    description = "HxTsr.exe is a Microsoft compressed executable file called Microsoft Outlook Communications.HxTsr.exe is part of Outlook apps, because it resides in a hidden \"WindowsApps\" subfolder of \"C:\\Program Files\". Its path includes a version number, e.g., \"C:\\Program Files\\WindowsApps\\microsoft.windowscommunicationsapps_17.7466.41167.0_x64__8wekyb3d8bbwe\\HxTsr.exe\". Any instances of hxtsr.exe not in this folder may be malware camouflaging itself as HxTsr.exe",
    references = Seq(ymlBase + """process_creation\win_detecting_fake_instances_of_hxtsr.yml"""),
    tactic = Seq("attack.defense_evasion "), technique = Seq("t1036 "), subtechnique = Seq(""),
    module = None, enabled = false,
    where = eventId(1) and (IM.eq_("hxtsr.exe") and
      !"CurrentDirectory".similarTo("""(?i)c:\\\\program files\\\\windowsapps\\\\microsoft\.windowscommunicationsapps_.*\\\\hxtsr\.exe""")))

  /** windows-process-creation.sql:127 */
  val xwizardSideload = RuleDef(
    name = "Xwizard DLL Sideloading",
    author = "Christian Burkard",
    severity = 7,
    description = "Detects the execution of Xwizard tool from the non-default directory which can be used to sideload a custom xwizards.dll",
    references = Seq(ymlBase + """process_creation\win_dll_sideload_xwizard.yml"""),
    tactic = Seq("attack.defense_evasion "), technique = Seq(""), subtechnique = Seq("t1574.002 "),
    module = None, enabled = false,
    where = eventId(1) and (IM.like("""%\xwizard.exe""") and
      !IM.like("""C:\Windows\System32\%""")))

  /** windows-process-creation.sql:128 */
  val squiblyTwo = RuleDef(
    name = "SquiblyTwo",
    author = "Markus Neis / Florian Roth",
    severity = 5,
    description = "Detects WMI SquiblyTwo Attack with possible renamed WMI by looking for imphash",
    references = Seq(ymlBase + """process_creation\win_bypass_squiblytwo.yml"""),
    tactic = Seq("attack.defense_evasion attack.execution "),
    technique = Seq("t1047 t1220 t1059 "), subtechnique = Seq("t1059.005 t1059.007 "),
    module = None, enabled = false,
    where = eventId(1) and (
      (all(CL.like("%wmic%"), CL.like("%format%"), CL.like("%http%")) and IM.like("""%\wmic.exe"""))
        or (any("Imphash".eq_("1B1A3F43BF37B5BFE60751F2EE2F326E"),
          "Imphash".eq_("37777A96245A3C74EB217308F3546F4C"),
          "Imphash".eq_("9D87C9D67CE724033C0B40CC4CA1B206")) and
          (CL.like("%format:%") and CL.like("%http%")))))

  /** windows-process-creation.sql:129 */
  val changeFileAssoc = RuleDef(
    name = "Change Default File Association",
    author = "Timur Zinniatullin, oscd.community",
    severity = 3,
    description = "When a file is opened, the default program used to open the file (also called the file association or handler) is checked. File association selections are stored in the Windows Registry and can be edited by users, administrators, or programs that have Registry access or by administrators using the built-in assoc utility. Applications can modify the file association for a given file extension to call an arbitrary program when a file with the given extension is opened.",
    references = Seq(ymlBase + """process_creation\win_change_default_file_association.yml"""),
    tactic = Seq("attack.persistence "), technique = Seq("t1042 "), subtechnique = Seq("t1546.001 "),
    module = None, enabled = false,
    where = eventId(1) and all(CL.like("%cmd%"), CL.like("%/c%"), CL.like("%assoc%")))

  val processCreation: Seq[RuleDef] = Seq(
    silenttrinityMsbuild, xwizardCustomClass, clInvocation, clMutexverifiers,
    cmdkeyRecon, cmstpComUacBypass, suspiciousSvchost, svchostNoCli,
    snatchRansomware, rarCompression, fakeHxtsr, xwizardSideload,
    squiblyTwo, changeFileAssoc)

  /** All 31 rules; `active` filters to the 25 the reference actually runs. */
  val allRules: Seq[RuleDef] = processAccess ++ processCreation
  val active: Seq[RuleDef] = allRules.filter(_.enabled)
}
