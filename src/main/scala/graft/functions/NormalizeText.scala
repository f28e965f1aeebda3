package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd text canonicalizer: `graft_normalize(text)` → the cleaned
  * form every downstream dedup/fingerprint operator should key on —
  * Unicode NFD decomposition with combining marks stripped (accent
  * removal), NFC recomposition of what remains, ROOT-locale lowercase,
  * and whitespace-run collapse to single spaces with ends trimmed.
  *
  * Cross-engine contract: output equals the DuckDB pipeline
  * `trim(regexp_replace(lower(strip_accents(nfc_normalize(x))), '\s+', ' ', 'g'))`
  * for Latin-script inputs (the oracle twin of q_text_normalize). The
  * whitespace class is RE2's `\s` = {TAB, LF, FF, CR, SPACE} — NOT Java's
  * `\s` (which adds VT) — so the two engines collapse identical runs.
  *
  * Why an Expression and not composed builtins: Spark has no NFD/NFC or
  * accent-strip builtin, and a Scala UDF would break whole-stage codegen
  * around it. The hot path (ASCII text, the overwhelming case in a
  * pre-normalized corpus) is a single byte walk with no Normalizer call
  * and no String materialization unless a change is needed.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize"

  override def nullSafeEval(s: Any): Any =
    NormalizeText.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NormalizeText.compute($s);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** RE2 `\s` (the oracle's regexp_replace class). Deliberately excludes
    * VT (0x0B), which Java's `\s` would include. */
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** Called from both interpreted eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    // ASCII fast path: one walk, allocate only if something changes.
    var ascii = true
    var dirty = false // any uppercase, ws-run, edge-ws, or non-space ws
    var i = 0
    var prevWs = true // true at start ⇒ leading ws counts as dirty
    while (i < bytes.length && ascii) {
      val b = bytes(i)
      if ((b & 0x80) != 0) ascii = false
      else {
        val c = b.toChar
        val ws = isWs(c)
        if ((c >= 'A' && c <= 'Z') || (ws && (c != ' ' || prevWs))) dirty = true
        prevWs = ws
        i += 1
      }
    }
    if (ascii && prevWs && bytes.length > 0) dirty = true // trailing ws
    if (ascii && !dirty) return s
    if (ascii) return UTF8String.fromString(collapse(lowerAscii(bytes)))
    // Unicode path: NFD → strip combining marks → NFC → lower → collapse.
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val c = nfd.charAt(j)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      j += 1
    }
    val recomposed = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    UTF8String.fromString(
      collapse(recomposed.toLowerCase(java.util.Locale.ROOT)))
  }

  private def lowerAscii(bytes: Array[Byte]): String = {
    val arr = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i).toChar
      arr(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(arr)
  }

  /** Collapse RE2-\s runs to one space; trim both ends. */
  private def collapse(str: String): String = {
    val sb = new java.lang.StringBuilder(str.length)
    var pendingSpace = false
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (isWs(c)) { if (sb.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
