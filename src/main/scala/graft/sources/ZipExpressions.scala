package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.graftbridge.{toColumn, toExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** S4 — zip member extraction as a Catalyst `Generator`
  * (SURVEY §2.1 S4, §2.7: the reference extracts `stops.txt` from each
  * agency's GTFS zip, publish_to_catalog.py:319-320, via a temp file;
  * here the archive stays an in-flight `binary` column and fans out to
  * one row per member — the multimodal-column pattern).
  *
  * `zip_entries(bytes)` → rows of (entry_name string, content binary).
  * Null/empty/corrupt archives produce no rows (the dead-letter
  * classification happens upstream on the fetch, S3).
  */
case class ZipEntries(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("entry_name", StringType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null || bytes.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val content = zin.readAllBytes()
          out += InternalRow(UTF8String.fromString(e.getName), content)
        }
        e = zin.getNextEntry
      }
    } catch {
      // corrupt/truncated archives: keep rows read so far. Truncated
      // deflate streams throw EOFException (an IOException, NOT a
      // ZipException) out of readAllBytes — catch the superclass.
      case _: java.io.IOException =>
    } finally zin.close()
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ZipFunctions {
  def zip_entries(bytes: Column): Column = toColumn(ZipEntries(toExpression(bytes)))
}
