package graft

/** Minimal JSON string escaping shared by the driver mains. Escapes
  * backslash, quote, and ALL control chars (<0x20) — a stray tab, CR,
  * or ANSI ESC in builder-authored SQL or an exception message would
  * otherwise make the driver's json.load fail and silently zero a
  * round's correctness or benchmark. */
object Jsons {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
