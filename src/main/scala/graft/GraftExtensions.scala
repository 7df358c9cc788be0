package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CassandraMurmur3TokenExpr, VectorDotExpr}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get them
  * without touching the Scala API:
  *
  *   spark.sql("SELECT cassandra_murmur3_token(pk) FROM t")
  *   spark.sql("SELECT vector_dot(a.embedding, b.embedding) FROM ...")
  *
  * Activate with:
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cassandra_murmur3_token"),
      new ExpressionInfo(classOf[CassandraMurmur3TokenExpr].getName, "cassandra_murmur3_token"),
      (children: Seq[Expression]) => CassandraMurmur3TokenExpr(children)))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDotExpr].getName, "vector_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vector_dot(a, b) takes two arrays")
        VectorDotExpr(children.head, children(1))
      }))
  }
}
