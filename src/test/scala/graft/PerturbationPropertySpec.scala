package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.core.{DiffOptions, TableSpec}
import graft.engine.DiffEngine

/** SURVEY §5 property plan: generate random edit scripts over a synthetic
  * wide table, apply them, and assert the engine's RangeStats equals the
  * stats derived directly from the script. Deterministic ScalaCheck
  * generators (fixed seed) so CI is stable.
  */
class PerturbationPropertySpec extends SparkSpec {
  import spark.implicits._

  sealed trait Op
  case object Keep extends Op
  case object DropPartition extends Op
  case object InsertPartition extends Op // adds pk+10000 copy on target
  case object DropRow extends Op         // removes clustering row 0
  case object MutateCell extends Op      // v2+1 on clustering row 0
  case object NullCell extends Op        // v1 -> null on clustering row 0

  private val opGen: Gen[Op] = Gen.oneOf(
    Keep, Keep, DropPartition, InsertPartition, DropRow, MutateCell, NullCell)

  private val RowsPerPartition = 3
  private val Partitions = 60
  private val spec = TableSpec("prop", Seq("pk"), Seq("c1"), Seq("v1", "v2"),
    uniqueKey = true)

  private def srcRows: Seq[(Long, Int, String, Integer)] =
    for { p <- 0L until Partitions; c <- 0 until RowsPerPartition }
      yield (p, c, s"v$p-$c", Int.box((p * 10 + c).toInt))

  private def applyScript(script: Map[Long, Op]): Seq[(Long, Int, String, Integer)] =
    srcRows.flatMap { case r @ (p, c, v1, v2) =>
      script(p) match {
        case DropPartition => Nil
        case DropRow if c == 0 => Nil
        case MutateCell if c == 0 => Seq((p, c, v1, Int.box(v2 + 1)))
        case NullCell if c == 0 => Seq((p, c, null: String, v2))
        case _ => Seq(r)
      }
    } ++ srcRows.collect {
      case (p, c, v1, v2) if script(p) == InsertPartition => (p + 10000L, c, v1, v2)
    }

  private def expected(script: Map[Long, Op]): Map[String, Long] = {
    val ops = script.values.toSeq
    def n(o: Op) = ops.count(_ == o).toLong
    val r = RowsPerPartition.toLong
    val nReg = 2L
    Map(
      "matched_partitions" -> (n(Keep) + n(InsertPartition)), // insert keeps original matched
      "only_in_source" -> n(DropPartition),
      "only_in_target" -> n(InsertPartition),
      "mismatched_partitions" -> (n(DropRow) + n(MutateCell) + n(NullCell)),
      "matched_rows" -> ((n(Keep) + n(InsertPartition)) * r + // fully matched partitions
        n(DropRow) * (r - 1) +                                // one row gone
        (n(MutateCell) + n(NullCell)) * r),                   // rows still key-matched
      "matched_values" -> ((n(Keep) + n(InsertPartition)) * r * nReg +
        n(DropRow) * (r - 1) * nReg +
        (n(MutateCell) + n(NullCell)) * (r * nReg - 1)),      // one cell differs
      "mismatched_values" -> (n(MutateCell) + n(NullCell)))
  }

  test("random edit scripts: engine stats equal script-derived stats (20 seeds)") {
    val base = Gen.listOfN(Partitions, opGen)
    (0 until 20).foreach { i =>
      val ops = base.apply(Gen.Parameters.default, Seed(42L + i)).get
      val script: Map[Long, Op] =
        (0L until Partitions).zip(ops).toMap
      val src = srcRows.toDF("pk", "c1", "v1", "v2")
      val tgt = applyScript(script).toDF("pk", "c1", "v1", "v2")
      val got = DiffEngine.rangeStats(src, tgt, spec, DiffOptions(),
        DiffEngine.identityToken).collect()(0)
      val want = expected(script)
      want.foreach { case (k, v) =>
        assert(got.getAs[Long](k) === v,
          s"seed ${42 + i}: counter $k (script: ${script.toSeq.sortBy(_._1).take(10)}...)")
      }
    }
  }
}
