package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-facing [[FileIndex]] over one manifest [[ManifestStore.Snapshot]]
  * — the seam that gives IDIOMATIC reads the same data skipping
  * [[ManifestStore.readWhere]]'s library API does (VERDICT r10 #1): the
  * planner hands `listFiles` its partition and data predicates
  * (PruneFileSourcePartitions / FileSourceStrategy), they are translated
  * into the public `sources.Filter` ADT and routed through
  * [[ManifestStore.prunedEntries]], so a selective
  * `spark.read.format("graft-manifest").load(root).where(...)` opens only
  * the files whose manifest stats can match — while the scan itself stays
  * Spark's native vectorized parquet path (FileSourceScanExec: columnar
  * batches, whole-stage codegen, parquet row-group pushdown on top).
  *
  * The same public architecture as Delta's log-backed file index
  * (TahoeFileIndex): file status objects are built FROM MANIFEST ENTRIES
  * (path + size already known), so planning performs ZERO filesystem
  * listing or per-file status RPCs — the "readers never list data
  * directories" contract extends through the planner. Translation is
  * conservative: any untranslatable predicate shape keeps every file
  * (Spark still applies the full residual filter), and under a NOT only
  * exactly-translated children are used (a weakened child would flip from
  * conservative to row-dropping when negated).
  */
private[graft] class ManifestFileIndex(
    spark: SparkSession,
    val root: Path,
    snap: ManifestStore.Snapshot,
    override val partitionSchema: StructType,
    /** True only on relations minted by the FORMAT/catalog read path:
      * [[graft.plans.ManifestDvApplyRule]] wraps exactly these in the
      * deletion-vector scan filter. Library-internal slice scans
      * (snapshotFrame, the change feed's positive dv diff) manage vectors
      * themselves and must stay untouched (r13).
      */
    val applyDvInPlanner: Boolean = false) extends FileIndex {

  /** The pinned snapshot (r13: the dv-apply rule reads its vectors). */
  private[graft] def snapshot: ManifestStore.Snapshot = snap

  import ManifestFileIndex._

  override def rootPaths: Seq[Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // DATA filters prune conservatively (translation gaps only cost files
    // opened — Spark re-applies the full predicate after the scan).
    // PARTITION filters are different in kind: FileSourceStrategy REMOVES
    // partition-only predicates from the post-scan filters, so they must
    // be enforced EXACTLY here — a conservative keep would return rows the
    // query filtered out (review r11). They are evaluated as bound
    // Catalyst predicates against each directory's partition values (the
    // InMemoryFileIndex.prunePartitions discipline), which also makes
    // function-wrapped partition predicates PRUNE, not just stay correct.
    val pushed = dataFilters.flatMap(e => translate(e, insideNot = false))
    // the Bloom sidecar tier (r15) engages only for equality lookups on
    // indexed columns with >1 stats-surviving candidate — a bounded
    // distributed consult during planning, same class as a listing job
    val kept = ManifestStore.prunedEntriesBloom(spark, root.toString, snap, pushed)
    if (partitionSchema.isEmpty)
      Seq(PartitionDirectory(new GenericInternalRow(Array.empty[Any]),
        kept.map(statusOf)))
    else {
      val dirs = kept.groupBy(_.partition.getOrElse(Map.empty)).toSeq
        .sortBy(_._1.toSeq.sortBy(_._1).mkString(","))
        .map { case (pv, es) =>
          // entry partition keys are PHYSICAL names (r14 column mapping)
          val values = partitionSchema.fields.map(f =>
            partCatalyst(pv.get(snap.physOf(f.name)).flatten, f.dataType))
          PartitionDirectory(new GenericInternalRow(values), es.map(statusOf))
        }
      if (partitionFilters.isEmpty) dirs
      else {
        val bound = ce.Predicate.createInterpreted(
          partitionFilters.reduce(ce.And).transform {
            case a: ce.AttributeReference =>
              val i = partitionSchema.fieldIndex(a.name)
              ce.BoundReference(i, partitionSchema(i).dataType, nullable = true)
          })
        dirs.filter(d => bound.eval(d.values))
      }
    }
  }

  private def statusOf(e: ManifestStore.ManifestEntry): FileStatusWithMetadata =
    FileStatusWithMetadata(
      new FileStatus(e.bytes, false, 1, 128L << 20, 0L, new Path(e.path)))

  override def inputFiles: Array[String] = snap.files.map(_.path).toArray

  override def refresh(): Unit = () // snapshot-pinned: manifests are immutable

  override def sizeInBytes: Long = snap.files.map(_.bytes).sum

  override def toString: String =
    s"ManifestFileIndex[v${snap.version}, ${snap.files.size} files, $root]"
}

private[graft] object ManifestFileIndex {

  /** A hive partition-path value in the Catalyst runtime representation of
    * `dt` (only the types [[ManifestStore]] admits as partition columns).
    */
  private def partCatalyst(v: Option[String], dt: DataType): Any = v match {
    case None => null
    case Some(s) => dt match {
      case StringType => UTF8String.fromString(s)
      case IntegerType => s.toInt
      case LongType => s.toLong
      case ShortType => s.toShort
      case ByteType => s.toByte
      case BooleanType => s.toBoolean
      case DateType => java.time.LocalDate.parse(s).toEpochDay.toInt
      case other => sys.error(s"unpartitionable type survived append: $other")
    }
  }

  /** Catalyst predicate → public `sources.Filter`, for PRUNING only (the
    * full predicate always stays in the plan as Spark's own residual
    * filter, so translation gaps cost files opened, never correctness).
    * `insideNot` demands exactness: outside a NOT, an And may degrade to
    * its one translatable side (a weaker filter keeps a superset of files
    * — conservative); negated, that same weakening would DROP files whose
    * rows match, so under a NOT partial translations are refused.
    */
  private[sources] def translate(e: Expression, insideNot: Boolean): Option[Filter] = {
    def attrName(x: Expression): Option[String] = x match {
      case a: Attribute => Some(a.name)
      case g: ce.GetStructField => // nested leaf: dotted-path key (r11)
        attrName(g.child).map(p => s"$p.${g.extractFieldName}")
      case _ => None
    }
    def litValue(x: Expression): Option[Any] = x match {
      case l: Literal => Some(CatalystTypeConverters.convertToScala(l.value, l.dataType))
      case _ => None
    }
    def cmp(a: Expression, b: Expression)(mk: (String, Any) => Filter): Option[Filter] =
      for (n <- attrName(a); v <- litValue(b)) yield mk(n, v)

    e match {
      case ce.EqualTo(a, l) => cmp(a, l)(EqualTo).orElse(cmp(l, a)(EqualTo))
      case ce.EqualNullSafe(a, l) =>
        cmp(a, l)(EqualNullSafe).orElse(cmp(l, a)(EqualNullSafe))
      case ce.GreaterThan(a, l) =>
        cmp(a, l)(GreaterThan).orElse(cmp(l, a)(LessThan))
      case ce.GreaterThanOrEqual(a, l) =>
        cmp(a, l)(GreaterThanOrEqual).orElse(cmp(l, a)(LessThanOrEqual))
      case ce.LessThan(a, l) =>
        cmp(a, l)(LessThan).orElse(cmp(l, a)(GreaterThan))
      case ce.LessThanOrEqual(a, l) =>
        cmp(a, l)(LessThanOrEqual).orElse(cmp(l, a)(GreaterThanOrEqual))
      case ce.In(a, list) if list.forall(_.isInstanceOf[Literal]) =>
        attrName(a).map(n => In(n, list.flatMap(litValue).toArray))
      case ce.InSet(a, hset) =>
        attrName(a).map(n => In(n, hset.map(v =>
          CatalystTypeConverters.convertToScala(v, a.dataType)).toArray))
      case ce.IsNull(a) => attrName(a).map(IsNull)
      case ce.IsNotNull(a) => attrName(a).map(IsNotNull)
      case ce.StartsWith(a, l: Literal) if l.value != null =>
        attrName(a).map(StringStartsWith(_, l.value.toString))
      case ce.And(l, r) =>
        (translate(l, insideNot), translate(r, insideNot)) match {
          case (Some(lf), Some(rf)) => Some(And(lf, rf))
          case (one, other) if !insideNot => one.orElse(other) // weaker, still conservative
          case _ => None
        }
      case ce.Or(l, r) =>
        for (lf <- translate(l, insideNot); rf <- translate(r, insideNot))
          yield Or(lf, rf)
      case ce.Not(x) => translate(x, insideNot = true).map(Not)
      case _ => None
    }
  }
}
