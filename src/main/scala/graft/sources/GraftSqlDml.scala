package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, AttributeSet, EqualTo, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit

import graft.table.{ManifestTable, MergeInto}

/** SQL row-level DML on graft tables: a resolution rule that plans
  * `UPDATE t SET … WHERE …` and `MERGE INTO t USING s ON … WHEN …`
  * statements into the SAME commit machinery the Scala facade uses
  * ([[ManifestTable.update]] / [[MergeInto]]) — a migrating SQL user
  * reaches every row-level operation the engine has, and SQL ≡ facade
  * holds by construction because there is exactly one code path.
  *
  * Why a rule and not `SupportsRowLevelOperations`: Spark's group-based
  * row-level rewrite plans a `ReplaceData`/`WriteDelta` whose execution
  * requires a native DSv2 `BatchWrite`; the graft connector executes
  * through the V1 seam by design (its inner plan IS a pruned parquet
  * scan — GraftTableSource's scaladoc). Rewriting the resolved logical
  * command into the engine's own operation is the pattern Delta Lake
  * itself shipped for years (DeltaAnalysis rewriting MergeIntoTable /
  * UpdateTable into Delta commands) and keeps the touched-files-only
  * pruning, constraint enforcement and optimistic-concurrency behavior
  * identical between SQL text and the Scala API — q_table_sqldml pins
  * the equivalence under one oracle hash.
  *
  * Translation: the statements arrive RESOLVED (attribute references
  * carry expr-ids), so target-vs-source attribution is exact; the rule
  * rewrites attributes back to by-name references in the namespace the
  * engine evaluates each clause in (target columns plainly, source
  * columns via [[MergeInto.src]]'s `__src.<name>` struct for matched
  * clauses, plainly for insert clauses which evaluate on the source).
  * The MERGE condition must be a conjunction of target-column =
  * source-column equalities (the key-equi merge every lakehouse engine
  * supports); anything else fails loudly at analysis, never silently.
  */
class GraftSqlDmlRule(session: SparkSession) extends Rule[LogicalPlan] {

  private object Relation {
    def unapply(plan: LogicalPlan): Option[(GraftTable, Seq[AttributeReference])] =
      plan match {
        case s: SubqueryAlias => unapply(s.child)
        case r: DataSourceV2Relation => r.table match {
          case t: GraftTable =>
            Some((t, r.output.collect { case a: AttributeReference => a }))
          case _ => None
        }
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan resolveOperators {
    case u @ UpdateTable(Relation(table, _), assignments, condition)
        if assignments.forall(_.resolved) && condition.forall(_.resolved) =>
      val plainNs: AttributeReference => UnresolvedAttribute =
        a => UnresolvedAttribute.quoted(a.name)
      val set = assignments.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => sys.error(s"graft UPDATE: unsupported SET target $other")
        }
        name -> toColumn(a.value, plainNs)
      }.toMap
      val cond = condition
        .map(c => toColumn(c, plainNs))
        .getOrElse(lit(true))
      GraftUpdateCommand(table.tableDir, cond, set)

    case m: MergeIntoTable if m.sourceTable.resolved &&
        m.mergeCondition.resolved &&
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).forall(_.resolved) &&
        // WITH SCHEMA EVOLUTION: wait for Spark's own
        // ResolveMergeIntoSchemaEvolution to widen the target (it
        // applies the additive AddColumns through GraftCatalog.
        // alterTable — the engine's metadata commit); once applied,
        // needSchemaEvolution flips false and this rule translates the
        // statement against the widened relation
        !m.needSchemaEvolution =>
      m.targetTable match {
        case Relation(table, targetOut) =>
          // WITH SCHEMA EVOLUTION needs no translation here: the graft
          // table advertises AUTOMATIC_SCHEMA_EVOLUTION, so Spark's own
          // ResolveMergeIntoSchemaEvolution has ALREADY applied the
          // additive AddColumn changes through GraftCatalog.alterTable
          // (the engine's metadata-only commit, tombstone guards and
          // all) and re-resolved this statement against the widened
          // target by the time the actions resolve.
          translateMerge(m, table, targetOut)
        case _ => m
      }
  }

  private def translateMerge(m: MergeIntoTable, table: GraftTable,
      targetOut: Seq[AttributeReference]): LogicalPlan = {
    val targetIds: Set[ExprId] = targetOut.map(_.exprId).toSet
    val sourceAttrs = m.sourceTable.output
      .collect { case a: AttributeReference => a }
    val sourceIds: Set[ExprId] = sourceAttrs.map(_.exprId).toSet

    // ON clause → equi-key pairs (targetName, sourceName). The
    // analyzer wraps implicit type coercions around the attributes
    // (t.k = CAST(s.k AS BIGINT)); the engine's by-name equi-join
    // re-applies the same coercion, so casts strip transparently.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def attrOf(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case c: org.apache.spark.sql.catalyst.expressions.Cast => attrOf(c.child)
      case _ => None
    }
    val keyPairs = conjuncts(m.mergeCondition).map { c =>
      val pair = c match {
        case EqualTo(l, r) => (attrOf(l), attrOf(r)) match {
          case (Some(a), Some(b))
              if targetIds(a.exprId) && sourceIds(b.exprId) =>
            Some((a.name, b.name))
          case (Some(a), Some(b))
              if sourceIds(a.exprId) && targetIds(b.exprId) =>
            Some((b.name, a.name))
          case _ => None
        }
        case _ => None
      }
      pair.getOrElse(sys.error(
        "graft MERGE: the ON clause must be a conjunction of " +
          s"target-column = source-column equalities, got $c"))
    }
    // the engine joins on shared names: source key columns are renamed
    // to their target names, and source-attribute references inside
    // clause expressions follow the rename
    val renames: Map[String, String] = keyPairs
      .collect { case (tk, sk) if tk != sk => sk -> tk }.toMap
    renames.values.toSeq.intersect(
      sourceAttrs.map(_.name).diff(renames.keys.toSeq)).headOption
      .foreach { clash =>
        sys.error(s"graft MERGE: source already has a column named " +
          s"$clash — alias it away in the USING subquery")
      }
    def srcName(a: AttributeReference): String =
      renames.getOrElse(a.name, a.name)

    // matched / by-source clauses evaluate on (target row ⋈ __src):
    // target attrs by name, source attrs via the __src struct
    val matchedNs: AttributeReference => UnresolvedAttribute = a =>
      if (sourceIds(a.exprId)) UnresolvedAttribute(Seq("__src", srcName(a)))
      else UnresolvedAttribute.quoted(a.name)
    // insert clauses evaluate on the source frame: source attrs by
    // (renamed) name
    val insertNs: AttributeReference => UnresolvedAttribute = a =>
      if (sourceIds(a.exprId)) UnresolvedAttribute.quoted(srcName(a))
      else sys.error(s"graft MERGE: INSERT clause references target " +
        s"column ${a.name}")

    def setOf(as: Seq[Assignment],
        ns: AttributeReference => UnresolvedAttribute): Map[String, Column] =
      as.map { a =>
        val name = a.key match {
          case ar: AttributeReference => ar.name
          case other => sys.error(s"graft MERGE: unsupported assignment " +
            s"target $other")
        }
        name -> toColumn(a.value, ns)
      }.toMap
    def condOf(c: Option[Expression],
        ns: AttributeReference => UnresolvedAttribute): Option[Column] =
      c.map(e => toColumn(e, ns))

    val matched = m.matchedActions.map {
      case ua: UpdateAction => MergeInto.WhenMatched(
        MergeInto.Update(setOf(ua.assignments, matchedNs)),
        condOf(ua.condition, matchedNs))
      case da: DeleteAction => MergeInto.WhenMatched(
        MergeInto.Delete, condOf(da.condition, matchedNs))
      case other => unsupportedAction("WHEN MATCHED", other)
    }
    val notMatched = m.notMatchedActions.map {
      case ia: InsertAction => MergeInto.WhenNotMatched(
        MergeInto.Insert(setOf(ia.assignments, insertNs)),
        condOf(ia.condition, insertNs))
      case other => unsupportedAction("WHEN NOT MATCHED", other)
    }
    val bySource = m.notMatchedBySourceActions.map {
      case ua: UpdateAction => MergeInto.WhenNotMatchedBySource(
        MergeInto.Update(setOf(ua.assignments, matchedNs)),
        condOf(ua.condition, matchedNs))
      case da: DeleteAction => MergeInto.WhenNotMatchedBySource(
        MergeInto.Delete, condOf(da.condition, matchedNs))
      case other => unsupportedAction("WHEN NOT MATCHED BY SOURCE", other)
    }
    GraftMergeCommand(table.tableDir, m.sourceTable, keyPairs, renames,
      matched, notMatched, bySource)
  }

  private def unsupportedAction(clause: String, a: MergeAction): Nothing =
    sys.error(s"graft MERGE: unsupported $clause action $a")

  /** Resolved expression → Column in the engine's by-name namespace:
    * attribute references are mapped by `ns` (everything else is
    * already position-independent and re-analyzes on the new frame).
    * `With` common-expression nodes (how the analyzer canonicalizes
    * BETWEEN etc.) are inlined first — their defs carry dataTypes that
    * an unresolved-attribute substitution would invalidate; the target
    * frame's analyzer re-factors duplicates on its own. */
  private def toColumn(e: Expression,
      ns: AttributeReference => UnresolvedAttribute): Column = {
    import org.apache.spark.sql.catalyst.expressions.{CommonExpressionRef, With}
    val inlined = e.transformUp {
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case r: CommonExpressionRef =>
            defs.getOrElse(r.id, sys.error(s"graft DML: dangling $r"))
        }
    }
    org.apache.spark.sql.GraftSqlBridge.column(inlined.transform {
      case a: AttributeReference => ns(a)
    })
  }
}

/** Eagerly-executed `UPDATE t SET … WHERE …` on a graft table — one
  * touched-files-only copy-on-write commit, the exact
  * [[ManifestTable.update]] the Scala facade exposes. */
private[sources] case class GraftUpdateCommand(dir: String,
    condition: Column, set: Map[String, Column])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    ManifestTable.update(session, dir, condition, set)
    Seq.empty
  }
}

/** Eagerly-executed `MERGE INTO` on a graft table — the full
  * [[MergeInto]] WHEN-clause matrix, source plan compiled lazily at
  * run time (so the statement's USING subquery plans normally). */
private[sources] case class GraftMergeCommand(dir: String,
    source: LogicalPlan, keyPairs: Seq[(String, String)],
    renames: Map[String, String],
    matched: Seq[MergeInto.WhenMatched],
    notMatched: Seq[MergeInto.WhenNotMatched],
    bySource: Seq[MergeInto.WhenNotMatchedBySource])
    extends LeafRunnableCommand {
  override def run(session: SparkSession): Seq[Row] = {
    val src0 = org.apache.spark.sql.GraftSqlBridge.ofRows(session, source)
    // SIMULTANEOUS rename in one projection: a crossed ON clause
    // (t.a = s.b AND t.b = s.a) renames b→a and a→b at once — a
    // sequential withColumnRenamed chain would have the second rename
    // clobber the column the first one just produced
    val src =
      if (renames.isEmpty) src0
      else src0.select(src0.columns.toSeq.map(c =>
        org.apache.spark.sql.functions.col(c)
          .as(renames.getOrElse(c, c))): _*)
    MergeInto(session, dir, src, keyPairs.map(_._1),
      matched, notMatched, bySource)
    Seq.empty
  }
}
