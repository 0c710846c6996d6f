package graft.merge

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.pipeline.HashMode

/** Bucketing spec for a partition-scoped merge target: every row lives in
  * the directory `__graft_bucket=<b>` where `b` derives deterministically
  * from the row's KEY columns. Because the bucket is a pure function of the
  * key, a merge delta only ever touches the buckets its source keys hash
  * to — the apply can prune its read AND its rewrite to those directories
  * and leave the rest of a 100 TB target physically untouched
  * (VERDICT r2 "what's missing" #1).
  *
  * Two bucket functions:
  *
  *   - **hash** (default): uniform spread; prunes well when the delta has
  *     FEWER distinct keys than buckets (point updates, small batches).
  *   - **range** (`rangeShift = Some(s)`): bucket = `(key >> s) % nBuckets`
  *     on a single integral key — contiguous key ranges land in few
  *     buckets, so the common "recent keys" delta prunes hard no matter
  *     how many rows it carries. The shift form (power-of-two range width)
  *     is exact on the full long domain and has a trivial ANSI twin.
  *
  * @param keys       merge key columns, in `@joinColumns` order
  * @param nBuckets   directory fan-out; size so one bucket ≈ a few GB at
  *                   the target's full scale (buckets are the unit of
  *                   rewrite)
  * @param hashMode   [[HashMode.Xxhash64]] for production;
  *                   [[HashMode.Md5Portable]] when a cross-engine oracle
  *                   must recompute the bucket function in ANSI SQL
  * @param rangeShift range-bucket by `(key >> shift) % nBuckets` instead
  *                   of hashing (single integral key only)
  */
final case class PartitionSpec(
    keys: Seq[String],
    nBuckets: Int,
    hashMode: HashMode,
    rangeShift: Option[Int] = None) {
  require(keys.nonEmpty, "at least one key column required")
  require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
  require(rangeShift.forall(s => s >= 0 && s < 64), s"rangeShift must be in [0,64), got $rangeShift")
  require(rangeShift.isEmpty || keys.length == 1, "range bucketing requires exactly one key column")

  /** The bucket of a row given its key columns (callers pass columns
    * resolved against their own frame). Keys canonicalize through a
    * string form — `\u0001` joins, NULL ↦ `\u0000` — so the same key
    * value buckets identically from any engine or column type, and NULL
    * keys (legal merge keys, A7) bucket deterministically.
    *
    * Range mode shifts the (integral) key instead; the final reduction is
    * Spark's `pmod`, which is non-negative for NEGATIVE keys too — the
    * whole long domain buckets deterministically. NULL keys take the
    * sentinel shifted value -1 and land in bucket `nBuckets - 1`, shared
    * with keys whose shifted value ≡ -1 (mod nBuckets) — a permitted
    * collision (buckets are many-to-one by construction; only determinism
    * matters), worth knowing when sizing buckets for NULL-heavy keys.
    *
    * DuckDB twins — hash (Md5Portable, single key k, seed 0):
    * `('0x' || substr(md5('0:' || coalesce(k::VARCHAR, chr(0))), 1, 15))::BIGINT % nBuckets`
    * (md5-prefix values are non-negative, so plain `%` matches pmod);
    * range: `((coalesce(k >> shift, -1) % nBuckets) + nBuckets) % nBuckets`
    * — the double-% form, because DuckDB's `%` is a SIGNED remainder and
    * diverges from pmod for negative shifted keys (ADVICE r3 #3).
    */
  def bucket(keyCols: Seq[Column]): Column = {
    require(keyCols.length == keys.length, s"expected ${keys.length} key columns, got ${keyCols.length}")
    val raw = rangeShift match {
      case Some(sh) =>
        coalesce(shiftright(keyCols.head.cast("long"), sh), lit(-1L))
      case None =>
        val canon = concat_ws("\u0001", keyCols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*)
        hashMode.hash(canon, 0)
    }
    pmod(raw, lit(nBuckets.toLong)).cast("int")
  }
}

/** Write/read/describe a bucket-partitioned parquet target. The spec is
  * persisted in a `_simplemerge_partspec.json` sidecar (underscore-prefixed
  * so Spark's partition discovery ignores it) and validated on every
  * partition-scoped apply — applying with mismatched keys would scatter
  * rows into wrong buckets silently.
  */
object PartitionedTarget {

  /** Partition column name — reserved `__graft_` namespace, never visible
    * through [[read]].
    */
  val BucketCol = "__graft_bucket"

  val SpecFile = "_simplemerge_partspec.json"

  private def modeName(m: HashMode): String = m match {
    case HashMode.Md5Portable => "md5"
    case HashMode.Xxhash64 => "xxhash64"
  }

  private def modeOf(s: String): HashMode = s match {
    case "md5" => HashMode.Md5Portable
    case "xxhash64" => HashMode.Xxhash64
    case other => throw new MergeValidationException(s"Unknown hash mode in partition spec: $other")
  }

  /** Write `df` as a bucket-partitioned target (full initial load /
    * backfill). Every later delta goes through
    * [[MergeApply.applyToPartitioned]] and rewrites touched buckets only.
    */
  def write(df: DataFrame, path: String, spec: PartitionSpec): Unit = {
    val missing = spec.keys.filterNot(k => df.columns.exists(_.equalsIgnoreCase(k)))
    if (missing.nonEmpty)
      throw new MergeValidationException(s"Partition spec keys missing from frame: ${missing.mkString(",")}")
    if (df.columns.exists(_.equalsIgnoreCase(BucketCol)))
      throw new MergeValidationException(s"Column [$BucketCol] uses the reserved __graft_ prefix")
    // Repartition on the bucket before partitionBy: otherwise every task
    // holding rows of bucket b emits its own file into b's directory —
    // tasks × buckets small files (the Layout operator's small-files
    // hazard). One shuffle on the bucket makes it ~one file per bucket.
    df.withColumn(BucketCol, spec.bucket(spec.keys.map(df(_))))
      .repartition(col(BucketCol))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(BucketCol).parquet(path)
    writeSpec(df.sparkSession, path, spec)
  }

  /** The logical table content — bucket column stripped. Filters on key
    * columns do NOT prune buckets (the hash is opaque to Catalyst); use
    * [[MergeApply.applyToPartitioned]] for key-pruned writes.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(BucketCol)

  /** Whether `path` is a partitioned merge target (spec sidecar present).
    * Lets generic writers — [[graft.streaming.StreamingUpsert]] — route to
    * the partition-scoped apply automatically.
    */
  def isPartitioned(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, SpecFile)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Whether the target holds at least one bucket directory. A freshly
    * written EMPTY target (a streaming pipeline bootstrapping into a new
    * table) has only its spec sidecar — parquet schema inference has
    * nothing to read, so callers must branch on this before
    * `spark.read.parquet`.
    */
  def hasBuckets(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
  }

  /** Rewrite bucket directories whose physical layout has degraded, under
    * the same staged-write + intent-marker + per-bucket swap protocol as
    * the apply — an interrupted compaction recovers exactly like an
    * interrupted merge ([[MergeApply.recover]]), and untouched buckets are
    * never opened.
    *
    * Per bucket, the desired file count is `ceil(onDiskBytes /
    * targetFileBytes)` (capped at 256 — needing more means the bucket
    * outgrew its spec and the real fix is a bigger nBuckets). A bucket is
    * rewritten when it is FRAGMENTED — at least `minFiles` data files AND
    * more files than desired (external writers, append-style loaders; the
    * apply itself always swaps in exactly one file per touched bucket) —
    * or OVERSIZED — average file size beyond 2× targetFileBytes (a grown
    * bucket written as one multi-GB file throttles downstream scan
    * parallelism: the [[graft.operators.Layout]] hazard at the bucket
    * level). A bucket already at its desired layout is NOT re-flagged, so
    * repeated compaction (the streaming `compactEvery` hook) converges
    * instead of rewriting split buckets forever.
    *
    * Row content per bucket is preserved exactly (the bucket column is a
    * pure key function, so rows cannot move between buckets); only file
    * layout changes. Single-writer assumed, like the apply.
    *
    * @return the bucket ids rewritten (empty when nothing qualified)
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 2): Seq[Int] = {
    readSpec(spark, path) // validates this IS a partitioned target
    compactDirs(spark, path, BucketCol, targetFileBytes, minFiles)
  }

  /** Per-bucket layout health as DATA — the ops readout behind
    * [[compact]]'s decisions, for dashboards and compaction scheduling
    * (when is the nightly compact actually needed, which buckets
    * outgrew their spec): file count, bytes, the desired file count
    * under `targetFileBytes`, and the same fragmented/oversized
    * verdicts the compactor applies — so `flagged` here IS the set
    * [[compact]] would rewrite (spec-pinned). Driver-side directory
    * listing only (≤ nBuckets rows — metadata, not data); no bucket
    * content is opened.
    *
    * @return (bucket, n_files, bytes, desired_files, fragmented,
    *         oversized, flagged), one row per bucket directory.
    */
  def layoutReport(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L << 20,
      minFiles: Int = 2): DataFrame = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    require(minFiles >= 2, s"minFiles must be >= 2, got $minFiles")
    readSpec(spark, path) // gate: only report on a real partitioned target
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(BucketCol + "="))
      .map { st =>
        val h = dirHealth(fs, st.getPath, targetFileBytes, minFiles)
        (st.getPath.getName.drop(BucketCol.length + 1).toInt,
          h.nFiles, h.bytes, h.desired, h.fragmented, h.oversized,
          h.fragmented || h.oversized)
      }
      .sortBy(_._1)
    import spark.implicits._
    rows.toDF("bucket", "n_files", "bytes", "desired_files",
      "fragmented", "oversized", "flagged")
  }

  /** The one shared layout-health computation — [[layoutReport]]'s
    * verdicts and [[compactDirs]]' flagging cannot drift because they
    * are this function.
    */
  private final case class DirHealth(
      nFiles: Int, bytes: Long, desired: Int, fragmented: Boolean, oversized: Boolean)

  private def dirHealth(
      fs: org.apache.hadoop.fs.FileSystem, dir: Path,
      targetFileBytes: Long, minFiles: Int): DirHealth = {
    val files = fs.listStatus(dir).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    val bytes = files.map(_.getLen).sum
    val desired =
      math.min(256L, math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)).toInt
    DirHealth(
      files.length, bytes, desired,
      fragmented = files.length >= minFiles && files.length > desired,
      oversized = files.nonEmpty && bytes / files.length > 2L * targetFileBytes)
  }

  /** [[compact]]'s engine, generalized over the partition column name so
    * other bucket-partitioned layouts — the persisted IVF index's
    * `bucket=` directories ([[graft.pipeline.Similarity.compactIndex]]) —
    * reuse the same flagging criteria and staged-write + intent-marker +
    * per-bucket swap protocol without carrying a merge partition spec.
    */
  private[graft] def compactDirs(
      spark: SparkSession,
      path: String,
      partCol: String,
      targetFileBytes: Long,
      minFiles: Int): Seq[Int] = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    require(minFiles >= 2, s"minFiles must be >= 2 (1 would rewrite every bucket), got $minFiles")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    // (bucket, desired file count) for every degraded bucket.
    val flagged = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(partCol + "="))
      .flatMap { st =>
        val h = dirHealth(fs, st.getPath, targetFileBytes, minFiles)
        if (h.fragmented || h.oversized)
          Some(st.getPath.getName.drop(partCol.length + 1).toInt -> h.desired)
        else None
      }
    if (flagged.isEmpty) return Nil

    val buckets = flagged.map(_._1).sorted
    val token = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(root.getParent, s".${root.getName}.staging-$token")
    val dirs = buckets.map(b => new Path(root, s"$partCol=$b").toString)
    val df = spark.read.option("basePath", path).parquet(dirs: _*)
    val dataCols = df.columns.filterNot(_ == partCol).map(col)
    // Per-bucket file-count salt (a broadcast lookup of ≤ nBuckets rows):
    // a uniform global modulus sized for the largest bucket would shatter
    // small fragmented buckets into that many tiny files.
    import spark.implicits._
    val nf = "__graft_nf"
    val desiredDf = flagged.toDF(partCol, nf)
    val salt = pmod(xxhash64(dataCols.toIndexedSeq: _*), col(nf))
    // Explicit partition count: an expression-only repartition lets AQE
    // coalesce the (deliberately small) shuffle back into one task per
    // bucket — exactly the layout compact exists to undo.
    val nParts = math.min(flagged.map(_._2.toLong).sum, 4096L).toInt
    try df.join(broadcast(desiredDf), partCol)
      .repartition(nParts, col(partCol), salt)
      .drop(nf)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy(partCol).parquet(staging.toString)
    catch { case e: Throwable => fs.delete(staging, true); throw e }
    PartitionedApply.swapBuckets(spark, fs, root, staging, buckets, token, partCol)
    buckets
  }

  /** Pruned read of the given buckets: lists ONLY their directories
    * (planning metadata I/O ∝ the bucket set, not the target's fan-out),
    * skipping buckets with no directory yet. None when none exist. The
    * bucket column is dropped — callers get logical table content. Shared
    * by the partition-scoped apply and the streaming current-state read.
    */
  private[graft] def readBuckets(spark: SparkSession, path: String, buckets: Seq[Int]): Option[DataFrame] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = buckets.map(b => new Path(root, s"$BucketCol=$b")).filter(fs.exists).map(_.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", path).parquet(dirs: _*).drop(BucketCol))
  }

  private[merge] def writeSpec(spark: SparkSession, path: String, spec: PartitionSpec): Unit = {
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shift = spec.rangeShift.map(sh => s""", "rangeShift": $sh""").getOrElse("")
    val json =
      s"""{"keys": [${spec.keys.map("\"" + _ + "\"").mkString(", ")}], "nBuckets": ${spec.nBuckets}, "hashMode": "${modeName(spec.hashMode)}"$shift}"""
    val out = fs.create(p, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  def readSpec(spark: SparkSession, path: String): PartitionSpec = {
    val p = new Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new MergeValidationException(
        s"$path is not a partitioned merge target (no $SpecFile) — write it with PartitionedTarget.write")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val keys = "\"keys\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(txt)
      .map(_.group(1).split(',').map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new MergeValidationException(s"Malformed $SpecFile at $path"))
    val n = "\"nBuckets\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
      .getOrElse(throw new MergeValidationException(s"Malformed $SpecFile at $path"))
    val hm = "\"hashMode\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt).map(m => modeOf(m.group(1)))
      .getOrElse(throw new MergeValidationException(s"Malformed $SpecFile at $path"))
    val shift = "\"rangeShift\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toInt)
    PartitionSpec(keys, n, hm, shift)
  }
}
