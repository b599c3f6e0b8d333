package graft.run

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import scala.util.matching.Regex

/** PII sanitization for exported telemetry — free text (error messages,
  * prompt previews) must not leak emails/keys/SSNs into a trace backend
  * (reference: ondine/observability/sanitizer.py:15-176 — same pattern
  * family, same default-safe posture: redact unless explicitly opted in).
  *
  * Driver-side strings only; column-level PII scrubbing for data itself
  * is [[graft.functions.CurationFunctions.redactPii]].
  */
object TraceSanitizer {

  /** The reference's pattern families, as JVM regexes. Order matters:
    * api_key before phone/ssn so a digit-bearing token redacts whole. */
  val PiiPatterns: Seq[(String, Regex)] = Seq(
    "api_key" -> "(?i)\\b(?:api[_-]?key|secret|token)[:\\s=]+['\"]?[a-zA-Z0-9_\\-]{16,}['\"]?".r,
    "email" -> "\\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}\\b".r,
    "credit_card" -> "\\b\\d{4}[- ]?\\d{4}[- ]?\\d{4}[- ]?\\d{4}\\b".r,
    "ssn" -> "\\b\\d{3}-\\d{2}-\\d{4}\\b".r,
    "phone_us" -> "\\b\\d{3}[-.]?\\d{3}[-.]?\\d{4}\\b".r,
    "ip_address" -> "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b".r)

  /** Replace every PII match with `replacement`; extra custom patterns
    * append to the built-in family. */
  def sanitizeText(text: String, replacement: String = "[REDACTED]",
      customPatterns: Seq[(String, Regex)] = Nil): String =
    (PiiPatterns ++ customPatterns).foldLeft(text) { case (t, (_, p)) =>
      p.replaceAllIn(t, Regex.quoteReplacement(replacement))
    }

  /** Default-safe prompt/response form for traces: a stable 8-hex SHA-256
    * digest tag — deduplicable without content disclosure. Opt in with
    * includeRaw=true to keep the original (sanitizer.py:63-89). */
  def sanitizePrompt(text: String, includeRaw: Boolean = false): String =
    if (includeRaw) text
    else {
      val d = MessageDigest.getInstance("SHA-256")
        .digest(text.getBytes(StandardCharsets.UTF_8))
      val hex = d.take(4).map(b => f"${b & 0xff}%02x").mkString
      s"<sanitized-$hex>"
    }
}
