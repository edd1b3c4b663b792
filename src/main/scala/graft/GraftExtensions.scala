package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.plans.{ArgmaxDotsE12, DotProductE12, PqAdcE12, PqCodesE12, SignBuckets}

/** Session wiring for graft's native expressions.
  *
  * Preferred: build the session with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard SparkSessionExtensions injection point. For sessions built
  * elsewhere (the driver owns ours), [[GraftFunctions.register]]
  * installs the same functions imperatively and idempotently.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RewriteDotProduct)
  }
}

object GraftFunctions {
  private[graft] val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot_e12",
      new ExpressionInfo(classOf[DotProductE12].getName, "graft_dot_e12"),
      (args: Seq[Expression]) => DotProductE12(args(0), args(1))),
    ("graft_sign_buckets",
      new ExpressionInfo(classOf[SignBuckets].getName, "graft_sign_buckets"),
      (args: Seq[Expression]) => SignBuckets(args(0), args(1))),
    ("graft_argmax_dots",
      new ExpressionInfo(classOf[ArgmaxDotsE12].getName, "graft_argmax_dots"),
      (args: Seq[Expression]) => ArgmaxDotsE12(args(0), args(1))),
    ("graft_pq_codes",
      new ExpressionInfo(classOf[PqCodesE12].getName, "graft_pq_codes"),
      (args: Seq[Expression]) => PqCodesE12(args(0), args(1))),
    ("graft_pq_adc",
      new ExpressionInfo(classOf[PqAdcE12].getName, "graft_pq_adc"),
      (args: Seq[Expression]) => PqAdcE12(args(0), args(1), args(2)))) ++
    // the SQL-surface scalar functions: builders that re-emit the
    // library's own Column definitions (functions/SqlFuncs.scala)
    graft.functions.SqlFuncs.injections.map { case (name, builder) =>
      (name, new ExpressionInfo(graft.functions.SqlFuncs.getClass.getName, name), builder)
    }

  /** Idempotently register graft functions on an existing session,
    * plus the delta-DML runtime-filter rule (which must sit in the
    * post-scan-planning user batch, not the extension hook's
    * operator-optimization batch).
    */
  def register(spark: SparkSession): Unit = {
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
    graft.connector.DeltaDmlRuntimeFiltering.install(spark)
  }
}
