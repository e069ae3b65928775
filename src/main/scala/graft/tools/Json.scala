package graft.tools

/** Minimal JSON rendering for the per-round artifacts (CLUSTERCHECK,
  * derived-oracle dumps). One escape implementation — backslash, quote,
  * and ALL control chars below 0x20 (ADVICE r12: a CR or other control
  * character through a naive 4-case escape yields invalid JSON that the
  * driver's json.load chokes on) — shared by every tool that writes
  * JSON by hand, so the hardening cannot drift per call site.
  */
object Json {

  /** Render a JSON string literal (with surrounding quotes). */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Render a double with enough grain for seconds fields. */
  def num(d: Double): String = f"$d%.3f"

  def obj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${str(k)}: $v" }.mkString("{", ", ", "}")

  def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")
}
