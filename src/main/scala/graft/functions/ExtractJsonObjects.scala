package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Balanced-brace extraction of JSON objects/arrays embedded in noisy text —
  * the "parse whatever the LLM returned" operator of the reference
  * (enclaveid_data_pipeline/utils/recent_history_utils.py:25-65: scans the
  * response for `{...}` or `[...]` blocks, accepting dicts or lists of dicts).
  *
  * Returns `array<string>` of the raw JSON snippets in order of appearance;
  * downstream parsing/validation is `from_json` + filters (so malformed
  * snippets become counted nulls, mirroring the reference's drop counters).
  * Total: never throws on arbitrary input.
  *
  * With `explodeArrays = false` a top-level `[...]` block is emitted as one
  * snippet; with `true` its direct `{...}` elements are emitted individually
  * — the reference accepts both a dict and a list of dicts and validates
  * each dict (utils/recent_history_utils.py:126-152), which is the
  * `explodeArrays = true` behavior.
  */
case class ExtractJsonObjects(child: Expression, explodeArrays: Boolean = false)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "extract_json_objects"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")

  override def nullSafeEval(input: Any): Any = {
    val snippets =
      ExtractJsonObjects.scan(input.asInstanceOf[UTF8String].toString, explodeArrays)
    new GenericArrayData(snippets.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractJsonObjects {

  /** Scan `text` for balanced `{...}` / `[...]` blocks, respecting JSON
    * string literals and escapes. Unbalanced tails are dropped. Pure, total.
    * `explodeArrays`: emit a top-level array's direct `{...}` elements
    * instead of the array itself. */
  def scan(text: String, explodeArrays: Boolean = false): Seq[String] = {
    val out = Seq.newBuilder[String]
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '{' || c == '[') {
        val end = matchBalanced(text, i)
        if (end > i) {
          if (c == '[' && explodeArrays) {
            // re-scan the array body for its direct object elements
            out ++= scan(text.substring(i + 1, end), explodeArrays = false)
              .filter(_.startsWith("{"))
          } else {
            out += text.substring(i, end + 1)
          }
          i = end + 1
        } else {
          i = n // unbalanced from here on — stop (reference stops at parse failure too)
        }
      } else {
        i += 1
      }
    }
    out.result()
  }

  /** Index of the close bracket matching `text(start)`, or -1 if unbalanced. */
  private def matchBalanced(text: String, start: Int): Int = {
    var depth = 0
    var inString = false
    var escaped = false
    var i = start
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      if (inString) {
        if (escaped) escaped = false
        else if (c == '\\') escaped = true
        else if (c == '"') inString = false
      } else c match {
        case '"' => inString = true
        case '{' | '[' => depth += 1
        case '}' | ']' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }
}
