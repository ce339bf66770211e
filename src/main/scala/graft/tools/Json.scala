package graft.tools

/** The ONE hand-rolled JSON string escaper for the harness artifacts
  * (Bench's stdout line + BENCH_FULL.json, Verify's oracle_sql.json +
  * VERIFY_FAILURES.json). Bench and Verify previously carried two subtly
  * different private copies — a character class fixed in one would never
  * reach the other, and every artifact here is parsed by the driver, so
  * one unescaped byte silently zeroes a round's timings or correctness. */
object Json {
  def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + esc(s) + "\""
}
