package graft

/**
 * Extraction-failure classification (reference error_handler.py:305-325
 * analog): keyword mapping from exception class/message to a stable category
 * string recorded on per-row error columns. The reference maps message
 * keywords to (category, severity, recoverable); here the category string is
 * the per-row signal and severity/recoverability are derivable from it.
 */
object ErrorClass {

  /** Category for a caught extraction exception. */
  def classify(e: Throwable): String = {
    val m = (e.getClass.getSimpleName + " " + Option(e.getMessage).getOrElse("")).toLowerCase
    if (m.contains("unsupportedpdffilter")) "unsupported_filter"
    else if (e.isInstanceOf[OutOfMemoryError] ||
        m.contains("memory") || m.contains("disk") || m.contains("space")) "resource"
    else if (m.contains("dataformat") || m.contains("zip") || m.contains("corrupt")) "corrupt_stream"
    else if (m.contains("indexoutofbounds") || m.contains("numberformat") ||
             m.contains("negativearray") || m.contains("charactercoding")) "parse"
    else "processing"
  }
}
