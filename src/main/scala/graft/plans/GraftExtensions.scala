package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Engine extension point (SparkSessionExtensions): registers the native
  * expressions so they are callable from SQL (`graft_cosine(a, b)`) and via
  * `call_function` from the DataFrame API. Installed by GraftSession via
  * builder.withExtensions; third-party sessions can install it with
  * spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private type Expr = org.apache.spark.sql.catalyst.expressions.Expression

  /** One registration shape for every native function: name + info +
    * enforced arity + constructor (the four hand-rolled copies this
    * replaces could drift independently — review r8).
    */
  private def fn(name: String,
                 info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
                 arity: Int)(build: Seq[Expr] => Expr) =
    (FunctionIdentifier(name), info, (children: Seq[Expr]) => {
      require(children.size == arity,
        s"$name takes exactly $arity argument${if (arity == 1) "" else "s"}")
      build(children)
    })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("graft_cosine", CosineSimilarity.info, 2)(
      c => CosineSimilarity(c.head, c(1))))
    ext.injectFunction(fn("graft_tokenize", Tokenize.info, 1)(c => Tokenize(c.head)))
    ext.injectFunction(fn("graft_token_count", TokenCount.info, 1)(c => TokenCount(c.head)))
    ext.injectFunction(fn("graft_adc_distance", AdcDistance.info, 2)(
      c => AdcDistance(c.head, c(1))))
    ext.injectOptimizerRule(_ => SelfCosineRewrite)
    ext.injectOptimizerRule(_ => TokenCountRewrite)
    // SQL INSERT INTO a registered graft-manifest table must commit through
    // the manifest protocol, not write bare unreferenced parquet — runs
    // after the built-in DataSourceAnalysis in the same Once batch, so it
    // sees the InsertIntoHadoopFsRelationCommand that rule produced (r12)
    ext.injectPostHocResolutionRule(_ => graft.sources.ManifestInsertRewrite)
    // SQL DELETE/UPDATE/MERGE on registered graft-manifest tables land as
    // merge-on-read manifest commits (r13) — Spark's own planner refuses
    // row-level DML on v1 tables, so without this rule the statements fail
    // rather than misbehave
    ext.injectPostHocResolutionRule(_ => graft.sources.ManifestDmlRewrite)
    // format/catalog reads of tables with live deletion vectors get the
    // scan-side bitmap filter in the planner (r13) — the extension-less
    // refusal stays for sessions without this rule
    ext.injectPostHocResolutionRule { session =>
      ManifestDvApplyRule.register(session)
      new ManifestDvApplyRule(session)
    }
    // SQL `VERSION AS OF` / `TIMESTAMP AS OF` on registered graft-manifest
    // tables (r13/r14) — must run BEFORE resolution (Spark's
    // ResolveRelations refuses time travel on v1 relations outright),
    // hence the hint batch
    ext.injectHintResolutionRule(session =>
      new graft.sources.ManifestTimeTravelRule(session))
    // SQL maintenance verbs OPTIMIZE / VACUUM (r14) — not ANSI SQL, so a
    // DELEGATING parser recognizes exactly the two verb shapes and hands
    // every other statement to Spark's own parser untouched
    ext.injectParser((session, delegate) =>
      new graft.sources.GraftSqlParser(session, delegate))
    // graft_table_changes('<table-or-path>', from[, to]) — the CDC
    // table-valued function (r14, the Delta table_changes analog): rows
    // changed strictly after `from` (up to `to`, or the head), tagged
    // `_change_type` + `_commit_version`. Arguments must be literals —
    // the TVF binds the change window at resolution time, so one query
    // reads one consistent window.
    ext.injectTableFunction((
      FunctionIdentifier("graft_table_changes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        "graft.sources.ManifestStore", "graft_table_changes"),
      (children: Seq[Expr]) => {
        require(children.size == 2 || children.size == 3,
          "graft_table_changes takes (table-or-path, fromVersion[, toVersion])")
        def evalLit(e: Expr, what: String): Any = {
          require(e.foldable, s"graft_table_changes $what must be a literal — got $e")
          val v = e.eval()
          require(v != null, s"graft_table_changes $what is null")
          v
        }
        val spark = org.apache.spark.sql.SparkSession.active
        val target = evalLit(children.head, "target").toString
        // a path has a separator; anything else is a session-catalog name
        val root =
          if (target.contains('/')) target
          else graft.sources.GraftSqlParser.rootOf(spark,
            Right(target.split('.').toSeq))._1
        val from = evalLit(children(1), "fromVersion") match {
          case n: Number => n.longValue()
          case other => other.toString.toLong
        }
        val df = children.lift(2) match {
          case None =>
            graft.sources.ManifestStore.readChangesSinceVersioned(
              spark, root, from)._2
          case Some(toE) =>
            val to = evalLit(toE, "toVersion") match {
              case n: Number => n.longValue()
              case other => other.toString.toLong
            }
            val snap = graft.sources.ManifestStore.snapshotAt(spark, root, to)
              .getOrElse(throw new java.util.NoSuchElementException(
                s"no intact manifest v$to under $root"))
            graft.sources.ManifestStore.changesBetweenVersioned(
              spark, root, from, snap)
        }
        df.queryExecution.analyzed
      }))
  }
}
