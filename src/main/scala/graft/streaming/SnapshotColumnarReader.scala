package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.ColumnarBatch

/** VECTORIZED parquet decode for the snapshot connector — the
  * columnar half of [[SnapshotReaderFactory]]: instead of assembling
  * one `Group` object per row (which parses EVERY column's pages of a
  * row group regardless of the projection), the footer's schema is
  * projected to exactly the scan's pruned columns BEFORE the row
  * groups are read (`ParquetFileReader.setRequestedSchema`), so an
  * unrequested column's pages are never fetched or decoded — column
  * pruning reaches the I/O layer, not just value materialization. The
  * decoded values land directly in Spark `OnHeapColumnVector`s served
  * as `ColumnarBatch`es, which keeps the downstream plan in the
  * columnar-to-row fast path instead of per-row object churn.
  *
  * Still the PUBLIC parquet-column API (`ColumnReadStoreImpl` +
  * `ColumnReader`, the library's documented low-level read path —
  * dictionary/RLE encodings are handled inside `ColumnReaderImpl`),
  * no Spark-internal parquet classes. Field resolution stays BY NAME
  * against the footer, so schema evolution degrades to null vectors
  * exactly like the row reader; definition levels drive per-value
  * nulls. Flat primitive schemas only (the connector's documented
  * surface) — the repetition level is always 0 and never consulted.
  */
private[streaming] class SnapshotColumnarReader(path: String,
    schema: StructType, conf: Configuration,
    batchSize: Int = 4096,
    bounds: Map[String, (Long, Long)] = Map.empty,
    probes: Map[String, Seq[Long]] = Map.empty,
    aliases: Map[String, Seq[String]] = Map.empty)
    extends org.apache.spark.sql.connector.read.PartitionReader[ColumnarBatch] {

  import org.apache.parquet.column.impl.ColumnReadStoreImpl
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.io.api.{Converter, GroupConverter, PrimitiveConverter}
  import org.apache.parquet.schema.MessageType
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path), conf))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  private val createdBy = reader.getFooter.getFileMetaData.getCreatedBy

  /** The scan columns PRESENT in this file — each resolved to the
    * FILE's field name (its own, or the first hit of the rename alias
    * chain), projected in scan order; absent columns (pre-evolution
    * files) serve null vectors.
    */
  private val resolved: Array[String] = schema.fields.map { f =>
    if (fileSchema.containsField(f.name)) f.name
    else aliases.getOrElse(f.name, Seq.empty)
      .find(fileSchema.containsField).orNull
  }
  private val present: Array[Boolean] = resolved.map(_ != null)
  private val projected = new MessageType(fileSchema.getName,
    resolved.collect {
      case n if n != null =>
        fileSchema.getType(fileSchema.getFieldIndex(n))
    }.toList: _*)
  // THE pruning hook: only the projected columns' chunks are read from
  // the row groups — unrequested pages never leave the file.
  reader.setRequestedSchema(projected)

  /** ColumnReadStoreImpl wants a record converter; value access goes
    * through the typed getters, so a structural no-op suffices. The
    * store WALKS the column's full path through the converter tree
    * (one asGroupConverter per intermediate level — an array column's
    * path is field/list/element, depth 3 — then asPrimitiveConverter
    * at the leaf), so the dummy is SELF-SIMILAR: a group at every
    * level that also serves the leaf primitive.
    */
  private val dummyConverter: GroupConverter = new GroupConverter { self =>
    private val prim = new PrimitiveConverter {}
    override def getConverter(fieldIndex: Int): Converter = self
    override def start(): Unit = ()
    override def end(): Unit = ()
    override def asPrimitiveConverter(): PrimitiveConverter = prim
  }

  private val vectors: Array[OnHeapColumnVector] =
    OnHeapColumnVector.allocateColumns(batchSize, schema)
  private val batch = new ColumnarBatch(vectors.map(v =>
    v: org.apache.spark.sql.vectorized.ColumnVector))

  // Current row group state. `consumed` counts triplets taken from
  // each column reader — array columns consume a VARIABLE number per
  // record, and reading past getTotalValueCount is illegal, so the
  // repetition-level record walk needs the running position (persists
  // across batches within one row group).
  private var readers: Array[org.apache.parquet.column.ColumnReader] = _
  private var consumed: Array[Long] = _
  private var rowsLeftInGroup: Long = 0L

  // ROW-GROUP skipping — the third pruning level under the manifest
  // zone maps (files) and bloom sidecars (files): the scan's pushed
  // bounds/probes test each row group's own footer column statistics
  // before its pages are read, and a group whose recorded [min, max]
  // provably holds no matching row skips without any page I/O
  // (`skipNextRowGroup`). At production file sizes (~1 GB, many row
  // groups per file) this is where a selective range probe stops
  // paying for an admitted file's full decode. SOUND for the same
  // reason file pruning is: only conjuncts are tested (a row failing
  // one fails the AND), null rows fail every pushed comparison anyway,
  // and every filter stays a residual — correctness never rests on the
  // stats. Blocks index-aligns with readNextRowGroup order.
  private val blocks = reader.getFooter.getBlocks
  private var blockIdx = 0

  private def advanceRowGroup(): Boolean = {
    def groupAdmits(b: org.apache.parquet.hadoop.metadata.BlockMetaData) =
      SnapshotColumnarReader.groupAdmits(bounds, probes, b)
    while (blockIdx < blocks.size() && !groupAdmits(blocks.get(blockIdx))) {
      reader.skipNextRowGroup()
      blockIdx += 1
      SnapshotColumnarReader.groupsSkipped.incrementAndGet()
    }
    val pages = reader.readNextRowGroup()
    if (pages == null) return false
    blockIdx += 1
    SnapshotColumnarReader.groupsDecoded.incrementAndGet()
    rowsLeftInGroup = pages.getRowCount
    val store = new ColumnReadStoreImpl(pages, dummyConverter, projected, createdBy)
    val descs = projected.getColumns
    readers = new Array(schema.fields.length)
    consumed = new Array(schema.fields.length)
    var pi = 0
    var i = 0
    while (i < schema.fields.length) {
      if (present(i)) {
        readers(i) = store.getColumnReader(descs.get(pi))
        pi += 1
      }
      i += 1
    }
    // A zero-row row group cannot occur (the writer never emits one),
    // but recursing keeps the contract obvious.
    if (rowsLeftInGroup == 0L) advanceRowGroup() else true
  }

  override def next(): Boolean = {
    if (rowsLeftInGroup == 0L && !advanceRowGroup()) return false
    val n = math.min(batchSize.toLong, rowsLeftInGroup).toInt
    var i = 0
    while (i < schema.fields.length) {
      val vec = vectors(i)
      vec.reset()
      if (!present(i)) vec.putNulls(0, n)
      else schema.fields(i).dataType match {
        case ArrayType(et, _) => fillArray(vec, i, et, n)
        case dt => fill(vec, readers(i), dt, n)
      }
      i += 1
    }
    rowsLeftInGroup -= n
    batch.setNumRows(n)
    true
  }

  private def fill(vec: OnHeapColumnVector,
      cr: org.apache.parquet.column.ColumnReader,
      dt: DataType, n: Int): Unit = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val maxDef = cr.getDescriptor.getMaxDefinitionLevel
    // Spark's own writer stores timestamps as INT96 by default; the
    // file's primitive type decides which decode applies. Decimals'
    // physical form likewise rides the footer (INT32/INT64 unscaled
    // vs FIXED/BINARY big-endian bytes).
    val phys = cr.getDescriptor.getPrimitiveType.getPrimitiveTypeName
    val int96 = phys == PrimitiveTypeName.INT96
    def unscaledLong: Long = phys match {
      case PrimitiveTypeName.INT32 => cr.getInteger.toLong
      case PrimitiveTypeName.INT64 => cr.getLong
      case _ => new java.math.BigInteger(cr.getBinary.getBytes).longValue
    }
    var r = 0
    while (r < n) {
      if (cr.getCurrentDefinitionLevel < maxDef) vec.putNull(r)
      else dt match {
        case TimestampType | TimestampNTZType if int96 =>
          vec.putLong(r, SnapshotSource.int96ToMicros(cr.getBinary.getBytes))
        case LongType | TimestampType | TimestampNTZType =>
          vec.putLong(r, cr.getLong)
        case IntegerType | DateType => vec.putInt(r, cr.getInteger)
        case DoubleType => vec.putDouble(r, cr.getDouble)
        case FloatType => vec.putFloat(r, cr.getFloat)
        case BooleanType => vec.putBoolean(r, cr.getBoolean)
        case StringType | BinaryType =>
          val b = cr.getBinary.getBytes
          vec.putByteArray(r, b, 0, b.length)
        // The vector's backing width follows the SCAN precision (int /
        // long / byte-array — Spark's ColumnVector decimal contract);
        // the value decodes by the file's physical form above.
        case d: DecimalType
            if d.precision <= org.apache.spark.sql.types.Decimal.MAX_INT_DIGITS =>
          vec.putInt(r, unscaledLong.toInt)
        case d: DecimalType
            if d.precision <= org.apache.spark.sql.types.Decimal.MAX_LONG_DIGITS =>
          vec.putLong(r, unscaledLong)
        case _: DecimalType =>
          val b = phys match {
            case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
              java.math.BigInteger.valueOf(unscaledLong).toByteArray
            case _ => cr.getBinary.getBytes
          }
          vec.putByteArray(r, b, 0, b.length)
        case other => throw new UnsupportedOperationException(
          s"snapshot columnar reader supports primitive/decimal columns; got $other")
      }
      cr.consume()
      r += 1
    }
  }

  /** VECTORIZED decode of an ARRAY-of-primitive column — the embedding
    * fast path: repetition levels drive the record walk (a triplet with
    * rep > 0 continues the current row's list; rep 0 starts the next
    * row), definition levels distinguish null array / empty array /
    * null element / value, and elements land in the vector's CHILD
    * array via the append contract (`putArray(row, start, len)` over
    * the child's element index — Spark's own vectorized parquet
    * shape). Handles the standard three-level list from both writers,
    * required (`containsNull = false`) elements, and the legacy
    * two-level `repeated <prim>` form, all through the same
    * definition-level thresholds:
    * value ⟺ def == maxDef; null element ⟺ element-optional ∧
    * def == maxDef−1; empty ⟺ def == emptyDef (the level the path
    * contributes with the field present but no element); null array ⟺
    * def < emptyDef.
    */
  private def fillArray(vec: OnHeapColumnVector, i: Int,
      et: DataType, n: Int): Unit = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    val cr = readers(i)
    val desc = cr.getDescriptor
    val maxDef = desc.getMaxDefinitionLevel
    val elemOpt = desc.getPrimitiveType.getRepetition ==
      org.apache.parquet.schema.Type.Repetition.OPTIONAL
    val emptyDef = maxDef - 1 - (if (elemOpt) 1 else 0)
    val phys = desc.getPrimitiveType.getPrimitiveTypeName
    val total = cr.getTotalValueCount
    val child = vec.getChild(0)
      .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
    def appendValue(): Unit = et match {
      case TimestampType | TimestampNTZType if phys == PrimitiveTypeName.INT96 =>
        child.appendLong(SnapshotSource.int96ToMicros(cr.getBinary.getBytes))
      case LongType | TimestampType | TimestampNTZType =>
        child.appendLong(cr.getLong)
      case IntegerType | DateType => child.appendInt(cr.getInteger)
      case DoubleType => child.appendDouble(cr.getDouble)
      case FloatType => child.appendFloat(cr.getFloat)
      case BooleanType => child.appendBoolean(cr.getBoolean)
      case StringType | BinaryType =>
        val b = cr.getBinary.getBytes
        child.appendByteArray(b, 0, b.length)
      case other => throw new UnsupportedOperationException(
        s"snapshot columnar reader: unsupported array element type $other")
    }
    var done = consumed(i)
    var r = 0
    while (r < n) {
      // Positioned at the first triplet of this record.
      val firstDef = cr.getCurrentDefinitionLevel
      val start = child.getElementsAppended
      var count = 0
      var more = true
      while (more) {
        val d = cr.getCurrentDefinitionLevel
        if (d == maxDef) { appendValue(); count += 1 }
        else if (elemOpt && d == maxDef - 1) { child.appendNull(); count += 1 }
        // d <= emptyDef: the record's null/empty marker triplet — no
        // element contributed.
        cr.consume()
        done += 1
        more = done < total && cr.getCurrentRepetitionLevel > 0
      }
      if (firstDef < emptyDef) vec.putNull(r)
      else vec.putArray(r, start, count)
      r += 1
    }
    consumed(i) = done
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    batch.close()
    reader.close()
  }
}

private[graft] object SnapshotColumnarReader {

  /** Row-group decode/skip counters — SPEC TELEMETRY (exact under
    * `local[*]`, per-executor on a real cluster): the pruning gates
    * read the delta around a scan to prove a range probe decoded
    * 1-of-N groups instead of the whole file.
    */
  val groupsDecoded = new java.util.concurrent.atomic.AtomicLong()
  val groupsSkipped = new java.util.concurrent.atomic.AtomicLong()

  /** Whether a row group's footer column statistics can hold a row
    * satisfying the scan's bounds/probes — THE skip decision, shared
    * by the reader's advance loop and driver-side audits (a registered
    * gate reproduces the decision over the same footer it cannot read
    * through global counters, which concurrent queries pollute). A
    * column absent from the file (pre-evolution), with no recorded
    * stats, or of a non-integer physical type admits conservatively.
    */
  private[graft] def groupAdmits(bounds: Map[String, (Long, Long)],
      probes: Map[String, Seq[Long]],
      b: org.apache.parquet.hadoop.metadata.BlockMetaData): Boolean = {
    if (bounds.isEmpty && probes.isEmpty) return true
    import scala.jdk.CollectionConverters._
    val cols = b.getColumns.asScala
    def statsOf(c: String): Option[(Long, Long)] =
      cols.find(_.getPath.toDotString == c).flatMap { cc =>
        val s = cc.getStatistics
        if (s == null || !s.hasNonNullValue) None
        else (s.genericGetMin, s.genericGetMax) match {
          case (mn: java.lang.Long, mx: java.lang.Long) =>
            Some((mn.longValue, mx.longValue))
          case (mn: java.lang.Integer, mx: java.lang.Integer) =>
            Some((mn.longValue, mx.longValue))
          case _ => None
        }
      }
    bounds.forall { case (c, (lo, hi)) =>
      statsOf(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
    } && probes.forall { case (c, vs) =>
      statsOf(c).forall { case (mn, mx) =>
        vs.exists(v => v >= mn && v <= mx) }
    }
  }

  /** The type set both decoders share — what the factory's
    * `supportColumnarReads` advertises. ARRAY-of-primitive (the
    * embedding shape — exactly one leaf column per field, which the
    * reader's descriptor walk relies on) decodes vectorized via the
    * repetition-level record walk; arrays of decimals/structs/maps and
    * the other nested shapes fall back to the row decoder.
    */
  def supports(schema: StructType): Boolean = schema.fields.forall(_.dataType match {
    case LongType | TimestampType | TimestampNTZType | IntegerType | DateType |
         DoubleType | FloatType | BooleanType | StringType | BinaryType => true
    case _: DecimalType => true
    case ArrayType(et, _) => et match {
      case LongType | TimestampType | TimestampNTZType | IntegerType | DateType |
           DoubleType | FloatType | BooleanType | StringType | BinaryType => true
      case _ => false
    }
    case _ => false
  })
}
