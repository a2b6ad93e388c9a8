package graft

/** The ONE JSON string escaper both harness mains emit through (review r9:
  * Bench and Verify each hand-rolled one and had already drifted — a hole
  * fixed in one, like an unescaped interpolation, silently missed the
  * other). Escapes backslash, quote, and ALL control characters, so a
  * builder-authored SQL string or an exotic path can never produce an
  * unparseable artifact line.
  */
private[graft] object JsonText {
  def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** `escape` wrapped in quotes — a complete JSON string literal. */
  def quote(s: String): String = "\"" + escape(s) + "\""
}
