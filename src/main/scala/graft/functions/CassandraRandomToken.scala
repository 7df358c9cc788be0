package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cassandra-compatible RandomPartitioner token — the second partitioner
  * branch of the reference's TokenHelper (TokenHelper.java:38-40,54-57):
  * token = abs(BigInteger(md5(serialized partition key))) ∈ [0, 2^127-1]
  * (Cassandra's `FBUtilities.hashToBigInteger`; the md5 digest is read as
  * a SIGNED big-endian 128-bit value, then abs'd — public, frozen
  * behavior).
  *
  * Representation: Spark's DecimalType caps at precision 38, one digit
  * short of 2^127-1, so the token surfaces as a 39-char zero-padded
  * decimal STRING. Fixed-width decimal strings order lexicographically
  * exactly as the BigIntegers do, which is all the diff spine needs
  * (range splits, min/max watermarks, equality filters); it is also what
  * makes the value reproducible in DuckDB for oracle checks (HUGEINT/
  * UHUGEINT arithmetic over the md5 hex digest).
  *
  * Key serialization matches the Murmur3 path byte-for-byte
  * ([[CassandraMurmur3]]): single components hash their raw type bytes,
  * composites get the [u16 len][bytes][0x00] envelope — the envelope is
  * partitioner-independent in Cassandra.
  */
object CassandraRandomPartitioner {

  val TokenDigits = 39

  private val Md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** RandomPartitioner token of a serialized key, zero-padded to 39
    * decimal digits.
    */
  def token(keyBytes: Array[Byte]): UTF8String = {
    val md = Md5.get()
    md.reset()
    val v = new BigInteger(md.digest(keyBytes)).abs().toString
    val sb = new java.lang.StringBuilder(TokenDigits)
    var i = v.length
    while (i < TokenDigits) { sb.append('0'); i += 1 }
    sb.append(v)
    UTF8String.fromString(sb.toString)
  }

  /** Generated-code entry point: single component = raw bytes, composite
    * = envelope (same as [[CassandraMurmur3.tokenOfParts]]).
    */
  def tokenOfParts(parts: Array[Array[Byte]]): UTF8String =
    if (parts.length == 1) token(parts(0))
    else token(CassandraMurmur3.composite(parts))

  /** Column API: `cassandra_random_token(pk1, pk2, ...)`. */
  def tokenColumn(cols: Seq[Column]): Column =
    GraftColumnBridge.column(
      CassandraRandomTokenExpr(cols.map(GraftColumnBridge.expression)))
}

/** Catalyst expression computing the Cassandra RandomPartitioner token of
  * one or more partition-key components (long / int / string / binary
  * children). Any null component ⇒ null token.
  */
case class CassandraRandomTokenExpr(children: Seq[Expression])
    extends Expression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case LongType | IntegerType | StringType | BinaryType => true
      case _ => false
    }
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("cassandra_random_token needs at least one key component")
    else if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(s"unsupported key component types: ${bad.mkString(",")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val childArray = children.toArray

  override def eval(input: InternalRow): Any = {
    val n = childArray.length
    val parts = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val v = childArray(i).eval(input)
      if (v == null) return null
      parts(i) = serializeOne(childArray(i).dataType, v)
      i += 1
    }
    CassandraRandomPartitioner.tokenOfParts(parts)
  }

  private def serializeOne(t: DataType, v: Any): Array[Byte] = t match {
    case LongType => CassandraMurmur3.serializeLong(v.asInstanceOf[Long])
    case IntegerType => CassandraMurmur3.serializeInt(v.asInstanceOf[Int])
    case StringType => v.asInstanceOf[UTF8String].getBytes
    case BinaryType => v.asInstanceOf[Array[Byte]]
    case other => throw new IllegalStateException(s"unsupported type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val parts = ctx.freshName("parts")
    val n = children.length
    val evals = children.map(_.genCode(ctx))
    val fill = children.zip(evals).zipWithIndex.map { case ((c, e), i) =>
      val ser = c.dataType match {
        case LongType => s"graft.functions.CassandraMurmur3.serializeLong(${e.value})"
        case IntegerType => s"graft.functions.CassandraMurmur3.serializeInt(${e.value})"
        case StringType => s"${e.value}.getBytes()"
        case BinaryType => s"${e.value}"
        case other => throw new IllegalStateException(s"unsupported type $other")
      }
      s"""
         |if (!${ev.isNull}) {
         |  ${e.code}
         |  if (${e.isNull}) { ${ev.isNull} = true; } else { $parts[$i] = $ser; }
         |}
         |""".stripMargin
    }.mkString("\n")
    ev.copy(code = code"""
      |boolean ${ev.isNull} = false;
      |UTF8String ${ev.value} = null;
      |byte[][] $parts = new byte[$n][];
      |$fill
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.CassandraRandomPartitioner.tokenOfParts($parts);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
