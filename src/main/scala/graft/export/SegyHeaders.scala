package graft.export

/** SEG-Y export header rules (E2): text-header validation/sanitization and
  * binary-header revision encoding.
  *
  * Reference: text rules `segy/text_header.py:35-92` (exactly 40 rows × 80
  * printable-ASCII chars), revision packing `segy/compat.py:92-121`
  * (`(major << 8) | minor`), header write `segy/creation.py:61-126`.
  */
object SegyHeaders {

  val Rows = 40
  val Cols = 80

  final class TextHeaderError(msg: String) extends IllegalArgumentException(msg)

  /** Validate: exactly 40 rows of exactly 80 printable-ASCII characters. */
  def validateTextHeader(lines: Seq[String]): Unit = {
    if (lines.length != Rows)
      throw new TextHeaderError(s"text header must have $Rows rows, got ${lines.length}")
    lines.zipWithIndex.foreach { case (l, i) =>
      if (l.length != Cols)
        throw new TextHeaderError(s"row $i must have $Cols chars, got ${l.length}")
      if (!l.forall(c => c >= 0x20 && c <= 0x7e))
        throw new TextHeaderError(s"row $i contains non-printable characters")
    }
  }

  /** Sanitize: replace non-printable chars with spaces, right-pad/truncate
    * each row to 80 columns, pad/truncate to 40 rows.
    */
  def sanitizeTextHeader(lines: Seq[String]): Seq[String] = {
    val cleaned = lines.map { l =>
      val printable = l.map(c => if (c >= 0x20 && c <= 0x7e) c else ' ')
      printable.padTo(Cols, ' ').take(Cols).mkString
    }
    (cleaned ++ Seq.fill(Rows)(" " * Cols)).take(Rows)
  }

  /** Pack a SEG-Y revision: major in the high byte, minor in the low byte. */
  def encodeRevision(major: Int, minor: Int): Int = {
    require(major >= 0 && major <= 255 && minor >= 0 && minor <= 255,
      "revision bytes must fit in 0..255")
    (major << 8) | minor
  }

  /** Unpack a SEG-Y revision code. */
  def decodeRevision(code: Int): (Int, Int) = ((code >> 8) & 0xff, code & 0xff)
}
