package graft.avro

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.ByteBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Avro Object Container File source/sink — the reference's at-rest format
  * (an Avro-centric pipeline hands you `.avro` container files: embedded
  * writer schema, deflate-compressed sync-marked blocks, splittable).
  *
  * Division of labor: this layer handles ONLY the container framing; every
  * record body is produced/consumed by the engine's Catalyst codec
  * expressions (`AvroFunctions.toAvro`/`fromAvro` — codegen'd, spec-covered
  * including unions and evolution). The sink appends PRE-ENCODED datum
  * bytes (`DataFileWriter.appendEncoded`), so no second serializer exists
  * to drift from the expression codec; the source slices each datum's RAW
  * bytes straight out of the decompressed block (a schema-driven skip walk
  * finds the boundaries — nothing is materialized, nothing re-encoded) and
  * surfaces them as the binary `avro_value` column for `fromAvro`. That is
  * the container contract end-to-end: the writer schema travels in the
  * file header, the reader needs no registry, and exactly ONE decode
  * happens per record — inside the codegen'd expression.
  *
  * Scale shape: each file is split into byte ranges at sync markers
  * ([[DataFileReader.sync]]/`pastSync`, the format's whole point), so a
  * multi-GB container fans out across tasks instead of capping parallelism
  * at one-task-per-file; the sink stages into a hidden sibling directory
  * and atomically renames on success, the same read-committed discipline
  * as the streaming sink (`streaming/Topic.scala` FileTopicSink, mirroring
  * the reference's transactional visibility,
  * `ReplicationApplication.java:66,96-98`).
  */
object AvroOcf {

  /** Minimal serializable carrier for the session Hadoop conf, so executor
    * tasks see the driver's filesystem impls/credentials instead of a bare
    * `new Configuration()` (which only works on local FS). Same shape as
    * Spark's internal SerializableConfiguration, re-stated here because
    * that class is private[spark]. */
  private final class SerializableHadoopConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      value = new Configuration(false)
      value.readFields(in)
    }
  }

  /** Write one `.avro` container file per non-empty partition of `bin`
    * (Avro-binary records, all encoded with `schemaJson`), deflate-block
    * compressed by default (a 100 TB at-rest corpus is never stored raw).
    *
    * Commit discipline: parts land in a dot-prefixed sibling staging dir
    * (each task itself writes a `.tmp` and renames on task success, so a
    * failed/speculative attempt never half-writes a part), and the staging
    * dir is installed as `out` only after every partition succeeded — a
    * mid-job failure leaves `out` untouched, never a mix of old and new
    * containers. Overwrites any previous `out` via [[commitSwap]]'s
    * move-aside/install/sweep sequence, so the old corpus is never
    * destroyed before the new one is in place.
    *
    * `syncInterval` (bytes, 0 = Avro's default ~64 KiB) bounds block size
    * and therefore split granularity for readers. */
  def write(bin: Dataset[Array[Byte]], schemaJson: String, out: String,
            codec: String = "deflate", syncInterval: Int = 0): Unit = {
    val session = bin.sparkSession
    val conf = session.sessionState.newHadoopConf()
    val outPath = new Path(out)
    val fs = outPath.getFileSystem(conf)
    val staging = new Path(outPath.getParent,
      s".${outPath.getName}.inprogress-${java.util.UUID.randomUUID()}")
    fs.mkdirs(staging)
    val stagingStr = staging.toString
    val sconf = new SerializableHadoopConf(conf)
    try {
      bin.foreachPartition { (it: Iterator[Array[Byte]]) =>
        if (it.hasNext) {
          val hc = sconf.value
          val schema = new Schema.Parser().parse(schemaJson)
          val tc = TaskContext.get()
          val part = tc.partitionId()
          val fin = new Path(stagingStr, f"part-$part%05d.avro")
          val tmp = new Path(stagingStr,
            f".part-$part%05d-attempt${tc.taskAttemptId()}.avro.tmp")
          val pfs = tmp.getFileSystem(hc)
          val w = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
            .setCodec(CodecFactory.fromString(codec))
          if (syncInterval > 0) w.setSyncInterval(syncInterval)
          try {
            w.create(schema, pfs.create(tmp, true))
            it.foreach(b => w.appendEncoded(ByteBuffer.wrap(b)))
          } finally w.close()
          // task commit: rename is atomic per attempt; if a sibling attempt
          // already won the race, drop this attempt's output
          if (!pfs.rename(tmp, fin)) { pfs.delete(tmp, false); () }
        }
      }
      commitSwap(fs, staging, outPath)
    } catch {
      case t: Throwable =>
        fs.delete(staging, true)
        throw t
    }
  }

  private def bakSiblings(fs: org.apache.hadoop.fs.FileSystem,
                          out: Path): Seq[Path] = {
    val parent = out.getParent
    if (parent == null || !fs.exists(parent)) Seq.empty
    else fs.listStatus(parent).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(s".${out.getName}.bak-"))
  }

  /** Job commit with no destruction window: the previous corpus moves aside
    * to a hidden `.bak` sibling, the staged corpus renames in, and only then
    * is the `.bak` deleted. Failure behavior at each phase:
    *  - the install rename fails in-process → the `.bak` is restored to
    *    `out` and the error propagates: the old corpus is back, unchanged;
    *  - a hard crash BETWEEN the two renames leaves the old corpus intact
    *    under `.bak`, where [[listAvro]] transparently falls back — so a
    *    reader always sees the old corpus or the new one, never neither
    *    (the pre-round-9 `delete(out); rename(staging, out)` sequence had
    *    exactly that destroyed-but-not-replaced window);
    *  - the next successful commit sweeps any stale `.bak` a crash left.
    * `interpose` is a test seam called between the phases ("old-aside",
    * "installed") so specs can assert the old-or-new invariant mid-swap. */
  private[graft] def commitSwap(fs: org.apache.hadoop.fs.FileSystem,
                                staging: Path, outPath: Path,
                                interpose: String => Unit = _ => ()): Unit = {
    val bak = new Path(outPath.getParent,
      s".${outPath.getName}.bak-${java.util.UUID.randomUUID()}")
    val hadOld = fs.exists(outPath)
    if (hadOld) {
      if (!fs.rename(outPath, bak))
        throw new java.io.IOException(s"commit move-aside failed: $outPath -> $bak")
      interpose("old-aside")
    }
    try {
      if (!fs.rename(staging, outPath))
        throw new java.io.IOException(s"commit rename failed: $staging -> $outPath")
    } catch {
      case t: Throwable =>
        if (hadOld) fs.rename(bak, outPath)
        throw t
    }
    interpose("installed")
    // the moved-aside corpus — and any stale .bak an earlier crashed
    // commit left behind — is now superseded by the installed one
    bakSiblings(fs, outPath).foreach(p => fs.delete(p, true))
  }

  /** The writer schema embedded in the container header of the first file
    * under `path` — the discovery step an OCF reader performs before
    * planning a resolving decode (`fromAvro(reader, writer)`): driver-side,
    * header-only, no record IO. None for an empty directory. NOTE: files
    * under one directory may carry DIFFERENT writer versions;
    * [[readBinary]] resolves per file and this helper is only the "what
    * does this corpus currently look like" probe. */
  def embeddedSchema(s: SparkSession, path: String): Option[String] = {
    val conf = s.sessionState.newHadoopConf()
    listAvro(conf, path).headOption.map { case (p, _) =>
      val reader = DataFileReader.openReader(
        new FsInput(new Path(p), conf), new GenericDatumReader[GenericRecord]())
      try reader.getSchema.toString finally reader.close()
    }
  }

  private def listAvro(conf: Configuration, path: String): Seq[(String, Long)] = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    // crash-window fallback: a writer that died between commitSwap's two
    // renames left the old corpus under a `.bak` sibling — read that, so
    // the reader contract stays old-or-new, never neither (at most one
    // survives a successful commit's sweep; newest name wins if a double
    // crash left several)
    val dir =
      if (fs.exists(root)) Some(root)
      else bakSiblings(fs, root).sortBy(_.getName).lastOption
    dir match {
      case None => Seq.empty
      case Some(d) => fs.listStatus(d).toSeq
        .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
        .map(st => (st.getPath.toString, st.getLen)).sortBy(_._1)
    }
  }

  /** Read every `.avro` file under `path` into a one-column binary
    * DataFrame (`avro_value`), splitting each file into byte ranges at
    * sync markers so multi-block containers fan out across tasks (the
    * standard OCF split contract: a task owns exactly the blocks whose
    * preceding sync marker starts inside its range).
    *
    * Schema handling is per FILE, through each container's OWN embedded
    * writer schema — the file-level analog of the per-record registry
    * resolution the topic path does:
    *  - writer == `readerSchemaJson` (or no reader schema requested and
    *    the directory is homogeneous): datum bytes are SLICED out of the
    *    decompressed block by a schema-driven skip walk — zero decode,
    *    zero re-encode; `fromAvro` downstream performs the only decode.
    *  - writer != `readerSchemaJson`: that file's records are resolved
    *    writer→reader (defaults filled, fields reordered/dropped) and
    *    re-encoded under the reader schema, so every output datum is
    *    uniformly `readerSchemaJson`-shaped regardless of which writer
    *    version produced it.
    *  - no `readerSchemaJson` and MIXED writer schemas: fails loudly —
    *    raw passthrough of heterogeneous bytes would silently mis-decode
    *    (the pre-round-8 hazard).
    *
    * `maxSplitBytes` 0 = `spark.sql.files.maxPartitionBytes`. Tolerates an
    * empty directory (empty corpus round-trip). */
  def readBinary(s: SparkSession, path: String,
                 readerSchemaJson: Option[String] = None,
                 maxSplitBytes: Long = 0L): DataFrame = {
    import s.implicits._
    val conf = s.sessionState.newHadoopConf()
    val files = listAvro(conf, path)
    val splitBytes =
      if (maxSplitBytes > 0) maxSplitBytes
      else s.conf.getOption("spark.sql.files.maxPartitionBytes")
        .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
        .getOrElse(128L * 1024 * 1024)
    val splits = files.flatMap { case (p, len) =>
      val n = math.max(1L, (len + splitBytes - 1) / splitBytes)
      (0L until n).map(i => (p, i * splitBytes, math.min((i + 1) * splitBytes, len)))
    }
    // the schema every output datum must conform to: the requested reader
    // schema, else the corpus's (asserted-homogeneous) embedded schema
    val targetJson = readerSchemaJson.orElse(
      embeddedSchema(s, path)).getOrElse("")
    val strict = readerSchemaJson.isEmpty
    val sconf = new SerializableHadoopConf(conf)
    val parallelism = math.max(1, math.min(splits.size, s.sparkContext.defaultParallelism))
    s.createDataset(splits).repartition(parallelism)
      .mapPartitions { parts =>
        val hc = sconf.value
        val target = if (targetJson.isEmpty) null
                     else new Schema.Parser().parse(targetJson)
        parts.flatMap { case (p, start, end) =>
          readSplit(hc, p, start, end, target, strict)
        }
      }
      .toDF("avro_value")
  }

  /** One split: blocks whose preceding sync marker starts in [start, end).
    * Raw-slice fast path when the file's writer schema equals `target`;
    * resolving decode + re-encode otherwise (per-file schema evolution).
    * The returned iterator is LAZY at block granularity — heap per task is
    * one decompressed block (~the sync interval), never the whole split
    * (`maxSplitBytes` × the codec's expansion ratio, the pre-round-9
    * shape). The reader closes on exhaustion; the task-completion listener
    * covers a consumer that stops early (limit / take). */
  private def readSplit(hc: Configuration, p: String, start: Long, end: Long,
                        target: Schema, strict: Boolean): Iterator[Array[Byte]] = {
    val reader = new DataFileReader[GenericRecord](
      new FsInput(new Path(p), hc), new GenericDatumReader[GenericRecord]())
    Option(TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => reader.close()))
    splitIterator(reader, p, start, end, target, strict)
  }

  /** Lazy datum iterator over `reader`'s blocks in [start, end) — the body
    * of [[readSplit]], split out so a spec can wrap `reader` with a
    * block-counting subclass and prove incremental consumption. Closes
    * `reader` when the last block is exhausted (close is idempotent, so
    * the task-completion close in [[readSplit]] may follow). */
  private[graft] def splitIterator(reader: DataFileReader[GenericRecord],
                                   p: String, start: Long, end: Long,
                                   target: Schema,
                                   strict: Boolean): Iterator[Array[Byte]] = {
    val writer = reader.getSchema
    if (writer != target && strict) {
      reader.close()
      throw new IllegalStateException(
        s"mixed OCF writer schemas under one directory: $p embeds a schema " +
          s"differing from the corpus head's (${target.getFullName}) — " +
          "pass readerSchemaJson to resolve per file")
    }
    reader.sync(start)
    if (writer == target) new SplitIterator(reader, end) {
      // fast path: slice raw datum bytes out of each decompressed block
      private val walker = new DatumWalker(writer)
      private var bytes: Array[Byte] = _
      private var pos = 0
      protected def loadBlock(buf: ByteBuffer): Unit = {
        bytes = buf.array()
        pos = buf.arrayOffset() + buf.position()
      }
      protected def nextDatum(): Array[Byte] = {
        val stop = walker.skip(bytes, pos)
        val datum = java.util.Arrays.copyOfRange(bytes, pos, stop)
        pos = stop
        datum
      }
    } else new SplitIterator(reader, end) {
      // evolution path: resolve writer -> target, re-encode under target
      private val resolving = new GenericDatumReader[GenericRecord](writer, target)
      private val datumWriter = new GenericDatumWriter[GenericRecord](target)
      private var rec: GenericRecord = _
      private var dec: org.apache.avro.io.BinaryDecoder = _
      protected def loadBlock(buf: ByteBuffer): Unit =
        dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(
          buf.array(), buf.arrayOffset() + buf.position(), buf.remaining(), null)
      protected def nextDatum(): Array[Byte] = {
        rec = resolving.read(rec, dec)
        val bos = new java.io.ByteArrayOutputStream(256)
        val enc = EncoderFactory.get().binaryEncoder(bos, null)
        datumWriter.write(rec, enc)
        enc.flush()
        bos.toByteArray
      }
    }
  }

  /** Block-at-a-time split traversal: `hasNext` pulls the NEXT block only
    * when the current one is spent, so `take(1)` on a multi-block split
    * never touches the remaining blocks and per-task heap is one
    * decompressed block. Subclasses supply the per-block cursor. */
  private abstract class SplitIterator(reader: DataFileReader[GenericRecord],
                                       end: Long) extends Iterator[Array[Byte]] {
    private var remaining = 0L
    private var done = false
    protected def loadBlock(buf: ByteBuffer): Unit
    protected def nextDatum(): Array[Byte]
    final def hasNext: Boolean = {
      while (remaining == 0L && !done) {
        if (reader.pastSync(end) || !reader.hasNext) {
          done = true
          reader.close()
        } else {
          val count = reader.getBlockCount
          loadBlock(reader.nextBlock())
          remaining = count
        }
      }
      remaining > 0L
    }
    final def next(): Array[Byte] = {
      if (!hasNext) throw new NoSuchElementException("split exhausted")
      remaining -= 1
      nextDatum()
    }
  }

  /** Schema-driven skip walk over Avro binary: returns the end offset of
    * the datum starting at `pos`, touching only lengths/varints — no
    * object materialization, no string decode. This is what makes the OCF
    * source single-decode: boundaries come from the walk, bytes pass
    * through raw, and the one real decode happens in codegen'd `fromAvro`. */
  private final class DatumWalker(root: Schema) extends Serializable {
    def skip(bytes: Array[Byte], pos: Int): Int = walk(root, bytes, pos)

    private def walk(s: Schema, bytes: Array[Byte], pos0: Int): Int = {
      import Schema.Type._
      var pos = pos0
      def readVarLong(): Long = {
        var b = bytes(pos); pos += 1
        var n: Long = (b & 0x7f).toLong
        var shift = 7
        while ((b & 0x80) != 0) {
          b = bytes(pos); pos += 1
          n |= (b & 0x7f).toLong << shift
          shift += 7
        }
        (n >>> 1) ^ -(n & 1L)
      }
      // NB: a length-prefixed skip must read the varint into a local BEFORE
      // adding — `pos += readVarLong()` captures the pre-varint pos on the
      // LHS and silently drops the varint's own bytes
      def skipLenPrefixed(): Unit = { val len = readVarLong().toInt; pos += len }
      s.getType match {
        case NULL =>
        case BOOLEAN => pos += 1
        case INT | LONG | ENUM => readVarLong()
        case FLOAT => pos += 4
        case DOUBLE => pos += 8
        case STRING | BYTES => skipLenPrefixed()
        case FIXED => pos += s.getFixedSize
        case UNION => pos = walk(s.getTypes.get(readVarLong().toInt), bytes, pos)
        case RECORD =>
          val fields = s.getFields
          var i = 0
          while (i < fields.size()) {
            pos = walk(fields.get(i).schema(), bytes, pos)
            i += 1
          }
        case ARRAY | MAP =>
          var n = readVarLong()
          while (n != 0L) {
            if (n < 0L) {
              // negative count: block byte size follows — skip wholesale
              skipLenPrefixed()
            } else {
              var i = 0L
              while (i < n) {
                if (s.getType == MAP) skipLenPrefixed() // key string
                pos = walk(
                  if (s.getType == MAP) s.getValueType else s.getElementType,
                  bytes, pos)
                i += 1
              }
            }
            n = readVarLong()
          }
      }
      pos
    }
  }
}
