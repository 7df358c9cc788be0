package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cassandra-compatible Murmur3 partition token.
  *
  * The reference gets tokens server-side from the cluster partitioner
  * (`token(pk)` in CQL, abstracted by TokenHelper.java:24-68 — Murmur3 ⇒
  * signed 64-bit). To diff real Cassandra snapshots over files with
  * token-range semantics intact (splits, specific-token filters, resume
  * watermarks), the engine computes the same token client-side:
  * Cassandra's Murmur3Partitioner = MurmurHash3 x64_128 over the
  * serialized partition key, first 64 bits, Long.MinValue normalized to
  * MaxValue.
  *
  * Two Cassandra specifics (both public, frozen behavior of its
  * partitioner):
  *  - tail bytes are consumed SIGNED — Cassandra's historical deviation
  *    from the canonical algorithm, kept forever because changing it
  *    would re-shard every cluster;
  *  - key serialization: a single-component key hashes its raw type bytes
  *    (bigint/int big-endian, text UTF-8); composite keys concatenate
  *    [u16 length][bytes][0x00] per component.
  *
  * For inputs whose tail bytes are all < 0x80 (e.g. ASCII keys) the
  * signed and canonical variants agree — the test suite exploits this by
  * cross-checking against an independent canonical implementation.
  */
object CassandraMurmur3 {

  /** MurmurHash3 x64_128 (returning h1), Cassandra flavor: little-endian
    * block reads, SIGNED tail bytes. Public-domain algorithm.
    */
  def hash64(data: Array[Byte]): Long = {
    val length = data.length
    val nblocks = length >> 4
    var h1 = 0L
    var h2 = 0L
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL

    var i = 0
    while (i < nblocks) {
      val base = i * 16
      var k1 = getLongLE(data, base)
      var k2 = getLongLE(data, base + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    var k1 = 0L
    var k2 = 0L
    val tail = nblocks << 4
    val rem = length & 15
    // fall-through tail; bytes are NOT masked with 0xff (signed — the
    // Cassandra deviation)
    if (rem >= 15) k2 ^= data(tail + 14).toLong << 48
    if (rem >= 14) k2 ^= data(tail + 13).toLong << 40
    if (rem >= 13) k2 ^= data(tail + 12).toLong << 32
    if (rem >= 12) k2 ^= data(tail + 11).toLong << 24
    if (rem >= 11) k2 ^= data(tail + 10).toLong << 16
    if (rem >= 10) k2 ^= data(tail + 9).toLong << 8
    if (rem >= 9) {
      k2 ^= data(tail + 8).toLong
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem >= 8) k1 ^= data(tail + 7).toLong << 56
    if (rem >= 7) k1 ^= data(tail + 6).toLong << 48
    if (rem >= 6) k1 ^= data(tail + 5).toLong << 40
    if (rem >= 5) k1 ^= data(tail + 4).toLong << 32
    if (rem >= 4) k1 ^= data(tail + 3).toLong << 24
    if (rem >= 3) k1 ^= data(tail + 2).toLong << 16
    if (rem >= 2) k1 ^= data(tail + 1).toLong << 8
    if (rem >= 1) {
      k1 ^= data(tail).toLong
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
    }

    h1 ^= length; h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2
    h1
  }

  private def getLongLE(data: Array[Byte], offset: Int): Long = {
    var i = 7
    var v = 0L
    while (i >= 0) { v = (v << 8) | (data(offset + i) & 0xffL); i -= 1 }
    v
  }

  private def fmix(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Murmur3Partitioner token: first 64 bits, MinValue normalized. */
  def token(keyBytes: Array[Byte]): Long = {
    val h = hash64(keyBytes)
    if (h == Long.MinValue) Long.MaxValue else h
  }

  /** Token of pre-serialized key components (generated-code entry point):
    * single components hash their raw bytes, composites get the envelope.
    */
  def tokenOfParts(parts: Array[Array[Byte]]): Long =
    if (parts.length == 1) token(parts(0)) else token(composite(parts))

  def serializeLong(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }

  def serializeInt(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = (v >>> (24 - 8 * i)).toByte; i += 1 }
    b
  }

  /** Composite-key envelope: [u16 len][bytes][0x00] per component. */
  def composite(parts: Array[Array[Byte]]): Array[Byte] = {
    var total = 0
    parts.foreach(p => total += p.length + 3)
    val out = new Array[Byte](total)
    var o = 0
    parts.foreach { p =>
      out(o) = ((p.length >> 8) & 0xff).toByte
      out(o + 1) = (p.length & 0xff).toByte
      System.arraycopy(p, 0, out, o + 2, p.length)
      out(o + 2 + p.length) = 0
      o += p.length + 3
    }
    out
  }

  /** Column API: `cassandra_murmur3_token(pk1, pk2, ...)` — usable as the
    * `token` function of DiffEngine for Cassandra-faithful sharding.
    */
  def tokenColumn(cols: Seq[Column]): Column =
    GraftColumnBridge.column(
      CassandraMurmur3TokenExpr(cols.map(GraftColumnBridge.expression)))
}

/** Catalyst expression computing the Cassandra Murmur3 token of one or
  * more partition-key components (long / int / string / binary children).
  * Any null component ⇒ null token.
  */
case class CassandraMurmur3TokenExpr(children: Seq[Expression])
    extends Expression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case LongType | IntegerType | StringType | BinaryType => true
      case _ => false
    }
    if (children.isEmpty)
      TypeCheckResult.TypeCheckFailure("cassandra_murmur3_token needs at least one key component")
    else if (bad.nonEmpty)
      TypeCheckResult.TypeCheckFailure(s"unsupported key component types: ${bad.mkString(",")}")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val childArray = children.toArray

  override def eval(input: InternalRow): Any = {
    val n = childArray.length
    if (n == 1) {
      val v = childArray(0).eval(input)
      if (v == null) return null
      return CassandraMurmur3.token(serializeOne(childArray(0).dataType, v))
    }
    val parts = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val v = childArray(i).eval(input)
      if (v == null) return null
      parts(i) = serializeOne(childArray(i).dataType, v)
      i += 1
    }
    CassandraMurmur3.token(CassandraMurmur3.composite(parts))
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
      |long ${ev.value} = 0L;
      |byte[][] $parts = new byte[$n][];
      |$fill
      |if (!${ev.isNull}) {
      |  ${ev.value} = graft.functions.CassandraMurmur3.tokenOfParts($parts);
      |}
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
