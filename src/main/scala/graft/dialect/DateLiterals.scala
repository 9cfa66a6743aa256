package graft.dialect

import java.time.LocalDateTime
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** The reference's date-modifier literal language: `now()`,
  * `date('now', 'start of month', '+1 month', '-3 day')`,
  * `timestamp('now', ...)` are evaluated to UTC constants at REWRITE time
  * (before the plan is built), exactly like the reference folds them into
  * the remote query (`dbms/unify_results.py:651-677`, `:876-878`; modifier
  * math `generic/utils_columns.py:1488` `function_to_time`, `:535-705`).
  *
  * Constant-folding here (not in Catalyst) matters operationally: every
  * shard/partition evaluates the SAME instant, and partition pruning sees
  * a literal range.
  */
object DateLiterals {
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val dateFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")

  def utcNow(): LocalDateTime = LocalDateTime.now(ZoneOffset.UTC)

  /** Apply one reference modifier string to a base time. */
  def applyModifier(t: LocalDateTime, modifier: String): LocalDateTime = {
    val m = modifier.trim.toLowerCase
    m match {
      case "now" => t
      case "start of year" => t.withDayOfYear(1).toLocalDate.atStartOfDay
      case "start of month" => t.withDayOfMonth(1).toLocalDate.atStartOfDay
      case "start of day" => t.toLocalDate.atStartOfDay
      case _ =>
        val rx = "^([+-])\\s*(\\d+)\\s*(second|minute|hour|day|week|month|year)s?$".r
        rx.findFirstMatchIn(m) match {
          case Some(g) =>
            val sign = if (g.group(1) == "-") -1L else 1L
            val n = sign * g.group(2).toLong
            g.group(3) match {
              case "second" => t.plusSeconds(n)
              case "minute" => t.plusMinutes(n)
              case "hour" => t.plusHours(n)
              case "day" => t.plusDays(n)
              case "week" => t.plusWeeks(n)
              case "month" => t.plusMonths(n)
              case "year" => t.plusYears(n)
            }
          case None =>
            throw new IllegalArgumentException(s"bad date modifier: $modifier")
        }
    }
  }

  /** Evaluate `now()` / `date(...)` / `timestamp(...)` to a literal
    * string. First argument may be 'now' or an explicit timestamp;
    * remaining arguments are modifiers. */
  def evalFunction(call: String, clock: () => LocalDateTime = utcNow)
      : String = {
    val t = call.trim
    val fn = t.takeWhile(_ != '(').trim.toLowerCase
    val inner = t.substring(t.indexOf('(') + 1, t.lastIndexOf(')')).trim
    val args = if (inner.isEmpty) Nil
      else EdgeSql.splitTopLevel(inner, ',').map(_.trim.stripPrefix("'")
        .stripSuffix("'"))
    val base = args.headOption match {
      case None | Some("now") => clock()
      case Some(ts) if ts.matches("\\d{4}-\\d{2}-\\d{2}") =>
        java.time.LocalDate.parse(ts).atStartOfDay
      case Some(ts) =>
        LocalDateTime.parse(ts.replace(' ', 'T'))
    }
    val out = args.drop(1).foldLeft(base)(applyModifier)
    fn match {
      case "date" => out.format(dateFmt)
      case _ => out.format(fmt)
    }
  }

  /** Period-anchor argument: quoted literal passes through, date function
    * calls are evaluated. */
  def evalToLiteral(arg: String, clock: () => LocalDateTime = utcNow)
      : String = {
    val a = arg.trim
    if (a.startsWith("'")) a.stripPrefix("'").stripSuffix("'")
    else if (a.toLowerCase.startsWith("now(") ||
      a.toLowerCase.startsWith("date(") ||
      a.toLowerCase.startsWith("timestamp(")) evalFunction(a, clock)
    else a
  }

  /** Convert the quoted timestamp/date literals inside a WHERE text from
    * the caller's timezone to UTC — the reference converts WHERE date
    * literals local->UTC at parse time (unify_results.py:722-729), since
    * storage is always UTC. */
  def localizeLiterals(where: String, tz: String): String = {
    val zone = java.time.ZoneId.of(tz)
    val litRx = "'(\\d{4}-\\d{2}-\\d{2}( \\d{2}:\\d{2}:\\d{2})?)'".r
    litRx.replaceAllIn(where, m => {
      val s = m.group(1)
      val local =
        if (s.length == 10) java.time.LocalDate.parse(s).atStartOfDay
        else LocalDateTime.parse(s.replace(' ', 'T'))
      val utc = local.atZone(zone).withZoneSameInstant(ZoneOffset.UTC)
        .toLocalDateTime
      "'" + utc.format(fmt) + "'"
    })
  }

  private val fnPattern =
    "(?i)\\b(now|date|timestamp)\\s*\\(([^()]*)\\)".r

  /** Replace every date-function call inside a WHERE text with its
    * evaluated UTC literal (quoted). */
  def rewrite(where: String, clock: () => LocalDateTime = utcNow): String =
    fnPattern.replaceAllIn(where, m =>
      "'" + java.util.regex.Matcher.quoteReplacement(
        evalFunction(m.group(0), clock)) + "'")
}
