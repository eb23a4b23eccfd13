package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point for the engine's Catalyst additions.
  *
  * Production wiring (cluster submit):
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * }}}
  * or `SparkSession.builder().withExtensions(new GraftExtensions())`.
  * For an already-built session,
  * `spark.experimental.extraOptimizations :+= RangeJoinRewrite` registers
  * the same rule ad hoc.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
  import org.apache.spark.sql.types.{IntegerType, LongType}

  private def reg(extensions: SparkSessionExtensions, name: String,
      clazz: Class[_])(build: Seq[Expression] => Expression): Unit =
    extensions.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo(clazz.getName, name),
      build))

  /** A literal-int argument (band / bit-width choices must be plan-time
    * constants — they select the hyperplane pattern, not data). */
  private def litInt(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal INT argument, got $other")
  }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => RangeJoinRewrite)
    extensions.injectPlannerStrategy(_ => BucketedJoinStrategy)
    // FunctionRegistry surface: every native codegen expression the engine
    // ships is SQL-callable, so a spark.sql-only user (via
    // Tables.registerViews) has the full function surface — layout keys,
    // content hashes, LSH keys, and the exact vector dot product:
    //   SELECT poly_hash(text), simhash32(text) FROM documents
    //   SELECT vec_dot(embedding, embedding) FROM embeddings
    //   SELECT lsh_band_key(embedding, 0) FROM embeddings
    //   ... ORDER BY zorder_code(a, b)
    reg(extensions, "zorder_code", classOf[graft.functions.ZOrderCode]) { children =>
      require(children.length == 2, "zorder_code(x, y) takes exactly 2 arguments")
      graft.functions.ZOrderCode(
        Cast(children(0), LongType), Cast(children(1), LongType))
    }
    reg(extensions, "poly_hash", classOf[graft.functions.PolyHash]) { children =>
      require(children.length == 1, "poly_hash(s) takes exactly 1 argument")
      graft.functions.PolyHash(children(0))
    }
    reg(extensions, "simhash32", classOf[graft.functions.Simhash32]) { children =>
      require(children.length == 1, "simhash32(s) takes exactly 1 argument")
      graft.functions.Simhash32(children(0))
    }
    reg(extensions, "vec_dot", classOf[graft.functions.VecDot]) { children =>
      require(children.length == 2, "vec_dot(a, b) takes exactly 2 arguments")
      graft.functions.VecDot(children(0), children(1))
    }
    reg(extensions, "window_fold_hashes", classOf[graft.functions.WindowFoldHashes]) { children =>
      require(children.length == 2, "window_fold_hashes(ws, w) takes exactly 2 arguments")
      graft.functions.WindowFoldHashes(children(0),
        litInt("window_fold_hashes w", children(1)))
    }
    reg(extensions, "jaro_winkler", classOf[graft.functions.JaroWinkler]) { children =>
      require(children.length == 2, "jaro_winkler(a, b) takes exactly 2 arguments")
      graft.functions.JaroWinkler(children(0), children(1))
    }
    reg(extensions, "lsh_band_key", classOf[graft.functions.LshBandKey]) { children =>
      require(children.length == 2 || children.length == 3,
        "lsh_band_key(v, band[, bits]) takes 2 or 3 arguments")
      graft.functions.LshBandKey(children(0),
        litInt("lsh_band_key band", children(1)),
        if (children.length == 3) litInt("lsh_band_key bits", children(2))
        else graft.operators.Similarity.BandBits)
    }
  }
}
