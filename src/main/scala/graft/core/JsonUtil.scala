package graft.core

/** Minimal JSON string escaping shared by the Verify dump and the HTTP
  * server: backslash, quote, and ALL control chars (< 0x20) — a tab or CR
  * in an error message or builder-authored SQL would otherwise emit
  * invalid JSON.
  */
object JsonUtil {
  def quote(s: String): String = {
    val body = Option(s).getOrElse("").flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    "\"" + body + "\""
  }
}
