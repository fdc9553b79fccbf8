package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal versioned-table layer (r9-verdict ask #5): ONE
  * implementation of the manifest-commit / retention / watermark
  * discipline that the CDC snapshot chain
  * ([[graft.streaming.Streams]]), the similarity-graph edge artifact
  * ([[graft.dedup.Dedup.edgeTable]]), the ANN index artifact
  * ([[graft.sim.Similarity.buildIvfIndex]]) and copy-on-write DML
  * ([[graft.ops.Scale.deleteWhere]]) all share — previously three
  * parallel copies of the same logic, each with its own torn-dir and
  * replay edge cases.
  *
  * Layout under a table root `dir`:
  * {{{
  *   dir/v=<n>/...            one version (any content layout)
  *   dir/v=<n>/_GRAFT_COMMITTED   commit marker: the version EXISTS
  *                                only once this zero-byte object is
  *                                PUT (atomic on every store)
  *   dir/v=<n>/_GRAFT_MANIFEST    optional FILE MANIFEST: newline-
  *                                separated absolute data-file paths
  *                                this version consists of — files
  *                                may live OUTSIDE v=<n> (untouched
  *                                originals referenced by POINTER,
  *                                the Delta/Iceberg COW shape)
  *   dir/_GRAFT_PRUNED        retention low-watermark (highest id
  *                                ever pruned), fencing out-of-window
  *                                replays
  * }}}
  *
  * Commit protocol ([[publish]]): the writer populates a staging dir
  * (`_stage_v=<n>`), the stage is renamed to `v=<n>`, then the
  * marker is PUT. On HDFS/local the rename is one metadata op; on
  * S3-family stores rename is a non-atomic O(data) copy, which is
  * exactly why VISIBILITY hangs off the marker (a single object PUT,
  * atomic everywhere): a reader listing mid-copy sees an unmarked
  * dir and skips it. A writer that dies at ANY point leaves either a
  * stage dir or an unmarked version dir — both invisible, both
  * reaped by the next [[retain]] (r9 advice: previously torn dirs
  * accumulated forever).
  *
  * Retention ([[retain]]): drops all but the newest `keepLast`
  * committed versions. Versions with manifests make this
  * reference-counted: a data file under a pruned `v=<k>` that a KEPT
  * manifest still points at (a COW DML untouched-file pointer)
  * survives — only unreferenced files go; a version dir is removed
  * outright once nothing in it is referenced. Files outside the
  * table root (e.g. the original source table a COW chain points
  * into) are NEVER touched. */
object VersionStore {

  /** Zero-byte commit marker: a `v=<n>` dir exists for readers only
    * once this object is PUT. */
  val CommitMarker = "_GRAFT_COMMITTED"

  /** Optional per-version file manifest (newline-separated absolute
    * paths; may point outside the version dir). */
  val ManifestFile = "_GRAFT_MANIFEST"

  /** Optional per-version logical schema (StructType JSON) — written
    * by metadata-only DDL ([[graft.ops.Scale.addColumn]]) and carried
    * forward by every later publish; readers align pointer files that
    * physically predate the DDL (missing columns read as NULL). */
  val SchemaFile = "_GRAFT_SCHEMA"

  /** Optional per-version CHECK constraints (one `name\tsql` line
    * each) — enforced by [[graft.ops.Scale]]'s DML on the rows it
    * rewrites/inserts, carried forward by every publish. */
  val ConstraintsFile = "_GRAFT_CONSTRAINTS"

  /** Optional per-version COLUMN-MAPPING note: one `logical\talias1,
    * alias2` line per renamed column — the physical names older data
    * files still carry for it. Readers coalesce the logical name with
    * its aliases (a row's file wrote exactly one of them), so RENAME
    * COLUMN is metadata-only (see [[graft.ops.Scale.renameColumn]]). */
  val RenamesFile = "_GRAFT_RENAMES"

  /** Optional per-version operation note (`op\tdetail`) — what
    * produced this version; [[graft.ops.Scale.history]] reads the
    * chain's notes as the DESCRIBE-HISTORY table. */
  val OpFile = "_GRAFT_OP"

  /** Optional per-version PARTITION-VALUE map: one
    * `path\tcol=value[;col=value]` line per data file whose listed
    * columns are FILE-CONSTANT (every row carries exactly that value
    * — [[graft.ops.Scale.registerPartitions]] verifies before
    * recording). The manifest-level representation of a hive-style
    * partitioned layout: DML hit detection and pruned reads consult
    * it before opening any stats, and a whole-partition DELETE
    * becomes metadata-only. Files without a line (later appends,
    * repacked OPTIMIZE outputs) are simply unprunable-by-partition —
    * sound, never wrong. Values are stored as strings and cast to the
    * column's declared type at use. */
  val PartitionsFile = "_GRAFT_PARTITIONS"

  private val PrunedFile = "_GRAFT_PRUNED"
  private val AppliedFile = "_GRAFT_APPLIED"
  private val WriterToken = "_GRAFT_WRITER"
  private val StagePrefix = "_stage_v="

  def fsOf(spark: SparkSession, dir: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  private def path(s: String) = new org.apache.hadoop.fs.Path(s)

  /** Committed version ids under `dir` — marker-gated, so a torn
    * writer (crash between data and marker, object-store rename
    * caught mid-copy) is invisible, never served. */
  def committed(spark: SparkSession, dir: String): Seq[Long] = {
    val p = path(dir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("v=")
        && fs.exists(new org.apache.hadoop.fs.Path(st.getPath, CommitMarker)))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
  }

  /** Newest committed version id, if any. */
  def head(spark: SparkSession, dir: String): Option[Long] =
    committed(spark, dir).maxOption

  /** Publish version `id`: `write` populates the staging dir it is
    * handed; the stage is renamed to `v=<id>` and the marker PUT —
    * the version becomes visible exactly at the marker write. A
    * pre-existing `v=<id>` (an at-least-once replay overwriting its
    * own torn output) is deleted first, its marker going with it, so
    * the rewrite window is invisible too. Returns the version dir. */
  def publish(spark: SparkSession, dir: String, id: Long)
             (write: String => Unit): String = {
    val fs = fsOf(spark, dir)
    val stage = path(s"$dir/$StagePrefix$id")
    val dest = path(s"$dir/v=$id")
    if (fs.exists(stage)) fs.delete(stage, true)
    write(stage.toString)
    if (fs.exists(dest)) fs.delete(dest, true)
    if (!fs.rename(stage, dest))
      throw new java.io.IOException(s"publish of $dest failed")
    fs.create(new org.apache.hadoop.fs.Path(dest, CommitMarker), true)
      .close()
    dest.toString
  }

  /** Signals an OPTIMISTIC-CONCURRENCY conflict: the version id this
    * writer computed from the head it read was committed by someone
    * else first. The loser re-resolves the head and retries (the
    * Delta/Iceberg commit loop — [[graft.ops.Scale]]'s DML does). */
  final class VersionConflictException(msg: String)
    extends RuntimeException(msg)

  /** Publish version `id` EXCLUSIVELY: unlike [[publish]] (whose
    * overwrite-on-replay semantics a single-writer streaming sink
    * wants), a pre-existing COMMITTED `v=<id>` means another writer
    * won the race for this id — the stage is discarded and
    * [[VersionConflictException]] thrown so the caller can re-read
    * the head and retry. The stage dir carries a unique suffix so
    * racing losers never trample each other's staging either. The
    * conflict check runs before staging (cheap early exit) and again
    * between the rename and the marker PUT; on a store with atomic
    * create-if-absent the marker write itself is the arbiter.
    *
    * CROSS-PROCESS contract (r10 verdict ask #7): the protocol's
    * arbiter is `create(path, overwrite = false)` on the marker — it
    * needs no shared JVM state, so two DRIVERS racing from separate
    * machines resolve exactly like two threads, PROVIDED the
    * filesystem gives (a) atomic create-if-absent and (b) rename that
    * fails rather than merges onto an existing destination. HDFS,
    * local POSIX and ABFS/GCS satisfy both (VersionStoreSpec's
    * two-JVM arm races real processes on the local FS). Bare S3 does
    * NOT (no atomic create-if-absent): there, front this call with an
    * external lock (DynamoDB/ZK lease) exactly as delta-on-S3
    * requires — single-writer-per-table is the documented fallback
    * contract, not a silent assumption. */
  def publishExclusive(spark: SparkSession, dir: String, id: Long)
                      (write: String => Unit): String = {
    val fs = fsOf(spark, dir)
    val dest = path(s"$dir/v=$id")
    def conflict() = throw new VersionConflictException(
      s"version $id under $dir already committed by a concurrent writer")
    def committedNow =
      fs.exists(new org.apache.hadoop.fs.Path(dest, CommitMarker))
    if (committedNow) conflict()
    val token = java.util.UUID.randomUUID().toString
    val stage = path(s"$dir/$StagePrefix$id.${token.take(8)}")
    write(stage.toString)
    // stamp ownership INSIDE the stage before it can become the
    // version dir: after the rename we re-read it to prove the dir we
    // marked is the one WE wrote (a racing writer that clobbered the
    // window between our rename and marker would carry its own token)
    val tokOut = fs.create(
      new org.apache.hadoop.fs.Path(stage, WriterToken), true)
    try tokOut.write(token.getBytes("UTF-8")) finally tokOut.close()
    if (committedNow) { fs.delete(stage, true): Unit; conflict() }
    // an UNMARKED dest is crash debris or a racer past its own rename
    // but short of its marker — invisible to every reader, and
    // renaming ONTO it would NEST our stage inside it (corrupting
    // whichever marker lands). Deciding WHICH it is unsafely was the
    // r11-advice TOCTOU: deleting the dir right as the racer's marker
    // lands erases a committed version. Two defenses close it:
    //  (a) AGE GATE — a dest younger than the debris grace (default
    //      4 s, `spark.graft.commit.debrisGraceMs`; rename→marker
    //      are adjacent metadata ops, so a live racer is milliseconds
    //      wide) is presumed a racer mid-commit: this writer backs
    //      off with a conflict and retries — by then either the
    //      racer's marker has landed (head advances) or the debris
    //      has aged past the gate.
    //  (b) ATOMIC EVICTION — an aged dest is moved ASIDE by a single
    //      rename to a unique stage-named trash dir (retention reaps
    //      it), never recursively deleted in place: if a stalled
    //      racer's marker slipped in after our check, the marker
    //      travels WITH the dir — it can never end up marking OUR
    //      content, and the racer's own post-marker ownership re-check
    //      (below) reports conflict rather than success, so the op
    //      re-applies instead of being lost. Residual anomaly: that
    //      >grace-stalled racer's version is visible committed for
    //      the check-to-rename window, then conflicts — a transient
    //      read-side retry, never a lost update or torn content.
    if (fs.exists(dest)) {
      if (committedNow) { fs.delete(stage, true): Unit; conflict() }
      val grace = spark.conf.getOption("spark.graft.commit.debrisGraceMs")
        .map(_.toLong).getOrElse(4000L)
      val age = scala.util.Try(System.currentTimeMillis() -
        fs.getFileStatus(dest).getModificationTime).getOrElse(Long.MaxValue)
      if (age < grace) { fs.delete(stage, true): Unit; conflict() }
      val trash = path(s"$dir/$StagePrefix$id.trash${token.take(8)}")
      if (fs.exists(dest) && !fs.rename(dest, trash)) {
        // a racer evicted (or committed) it first — re-resolve
        fs.delete(stage, true): Unit
        conflict()
      }
      fs.delete(trash, true): Unit
    }
    if (!fs.rename(stage, dest)) {
      fs.delete(stage, true): Unit
      if (committedNow) conflict()
      throw new java.io.IOException(s"publish of $dest failed")
    }
    // ownership: whose complete staged output does dest hold NOW?
    // Every complete output carries its writer's token (stamped into
    // the stage BEFORE the rename), so: our token → our content;
    // a foreign token → a racer's complete content; NO token → the
    // dir was evicted/recreated mid-race and holds no complete output.
    def tokenNow: Option[String] = scala.util.Try {
      val in = fs.open(new org.apache.hadoop.fs.Path(dest, WriterToken))
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    }.toOption
    // the unified post-marker law (r10 advice + r12 review): a marker
    // only COUNTS over a complete output. Our token under the marker =
    // our publish succeeded (whoever's marker it is — a racer marking
    // the dir our rename won committed OUR output; conflicting would
    // double-apply). A foreign token = the racer's content committed;
    // conflict and retry. NO token = the marker sits over an evicted/
    // partial dir (Hadoop create() makes parents, so a stalled racer's
    // marker can recreate a dest another writer just evicted — the r12
    // review's empty-committed-version trap): UN-commit it by deleting
    // the marker (safe — no writer can claim success without its token
    // present) and conflict; the retry publishes real content.
    def verifyCommit(): Unit = tokenNow match {
      case Some(t) if t == token => ()
      case Some(_) => conflict()
      case None =>
        fs.delete(new org.apache.hadoop.fs.Path(dest, CommitMarker),
          false): Unit
        conflict()
    }
    if (!tokenNow.contains(token)) conflict()
    try fs.create(new org.apache.hadoop.fs.Path(dest, CommitMarker), false)
      .close()
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
    }
    verifyCommit()
    dest.toString
  }

  /** Write a pointer manifest into a (staging or version) dir. */
  def writeManifest(spark: SparkSession, vdir: String,
                    files: Seq[String]): Unit = {
    val out = fsOf(spark, vdir)
      .create(new org.apache.hadoop.fs.Path(vdir, ManifestFile), true)
    try out.write(files.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Write a logical-schema file (StructType JSON) into a (staging or
    * version) dir — the metadata side of a zero-rewrite DDL. */
  def writeSchema(spark: SparkSession, vdir: String,
                  schema: org.apache.spark.sql.types.StructType): Unit = {
    val out = fsOf(spark, vdir)
      .create(new org.apache.hadoop.fs.Path(vdir, SchemaFile), true)
    try out.write(schema.json.getBytes("UTF-8"))
    finally out.close()
  }

  /** The logical schema version `id` declares, if any publish on the
    * chain up to it wrote one (each schema-carrying publish copies
    * the head's schema forward, so only this version dir is read). */
  def schemaOf(spark: SparkSession, dir: String, id: Long)
      : Option[org.apache.spark.sql.types.StructType] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(path(s"$dir/v=$id"), SchemaFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(org.apache.spark.sql.types.DataType.fromJson(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
        .asInstanceOf[org.apache.spark.sql.types.StructType])
      finally in.close()
    }
  }

  /** Write the CHECK-constraint set into a (staging or version) dir. */
  def writeConstraints(spark: SparkSession, vdir: String,
                       cons: Seq[(String, String)]): Unit = {
    val out = fsOf(spark, vdir)
      .create(new org.apache.hadoop.fs.Path(vdir, ConstraintsFile), true)
    try out.write(cons.map { case (n, c) => s"$n\t$c" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The CHECK constraints version `id` declares (empty before any
    * [[graft.ops.Scale.addConstraint]] on the chain). */
  def constraintsOf(spark: SparkSession, dir: String, id: Long)
      : Seq[(String, String)] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(path(s"$dir/v=$id"),
      ConstraintsFile)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val i = l.indexOf('\t')
          (l.substring(0, i), l.substring(i + 1))
        }
      finally in.close()
    }
  }

  /** Write the column-mapping note into a (staging or version) dir. */
  def writeRenames(spark: SparkSession, vdir: String,
                   renames: Map[String, Seq[String]]): Unit = {
    val out = fsOf(spark, vdir)
      .create(new org.apache.hadoop.fs.Path(vdir, RenamesFile), true)
    try out.write(renames.toSeq.sortBy(_._1)
      .map { case (n, as) => s"$n\t${as.mkString(",")}" }
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The column mapping version `id` declares (empty before any
    * rename on the chain). */
  def renamesOf(spark: SparkSession, dir: String, id: Long)
      : Map[String, Seq[String]] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(path(s"$dir/v=$id"),
      RenamesFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val i = l.indexOf('\t')
          l.substring(0, i) ->
            l.substring(i + 1).split(",").toSeq.filter(_.nonEmpty)
        }.toMap
      finally in.close()
    }
  }

  /** Write the partition-value map into a (staging or version) dir.
    * Encoding note: paths may not contain tab/newline (enforced) and
    * values are `;`/`=`-escaped via URL encoding so arbitrary
    * partition values round-trip. */
  def writePartitions(spark: SparkSession, vdir: String,
                      parts: Map[String, Map[String, String]]): Unit = {
    def enc(s: String) =
      java.net.URLEncoder.encode(s, "UTF-8")
    val out = fsOf(spark, vdir)
      .create(new org.apache.hadoop.fs.Path(vdir, PartitionsFile), true)
    try out.write(parts.toSeq.sortBy(_._1).map { case (p, kv) =>
      require(!p.contains('\t') && !p.contains('\n'),
        s"partition-map path may not contain tab/newline: $p")
      s"$p\t" + kv.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString(";")
    }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** The partition-value map version `id` declares (empty before any
    * [[graft.ops.Scale.registerPartitions]] on the chain). */
  def partitionsOf(spark: SparkSession, dir: String, id: Long)
      : Map[String, Map[String, String]] = {
    def dec(s: String) = java.net.URLDecoder.decode(s, "UTF-8")
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(path(s"$dir/v=$id"),
      PartitionsFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map { l =>
          val i = l.indexOf('\t')
          l.substring(0, i) -> l.substring(i + 1).split(";").toSeq
            .filter(_.nonEmpty).map { kv =>
              val j = kv.indexOf('=')
              dec(kv.substring(0, j)) -> dec(kv.substring(j + 1))
            }.toMap
        }.toMap
      finally in.close()
    }
  }

  /** Record what produced a (staging or version) dir, and WHEN (epoch
    * millis — r11 verdict ask #2: the one field that unlocks
    * TIMESTAMP AS OF, a `when` column in DESCRIBE HISTORY and
    * time-based VACUUM). Writers that care about cross-commit
    * monotonicity pass a floored `ts` (see `graft.ops.Scale`'s
    * stamping — `max(now, predecessor + 1)`, the Delta in-commit-
    * timestamp discipline, so two commits inside one clock tick still
    * resolve distinctly by timestamp). */
  def writeOp(spark: SparkSession, vdir: String, op: String,
              detail: String = "",
              ts: Long = System.currentTimeMillis()): Unit = {
    val out = fsOf(spark, vdir)
      .create(new org.apache.hadoop.fs.Path(vdir, OpFile), true)
    try out.write(s"$op\t$detail\t$ts".getBytes("UTF-8"))
    finally out.close()
  }

  /** The operation note of committed version `id`, if recorded. */
  def opOf(spark: SparkSession, dir: String, id: Long)
      : Option[(String, String)] =
    opNoteOf(spark, dir, id).map { case (op, detail, _) => (op, detail) }

  /** Full operation note: (op, detail, commit epoch millis — None for
    * notes written before timestamps existed, or by a publisher that
    * records none). */
  def opNoteOf(spark: SparkSession, dir: String, id: Long)
      : Option[(String, String, Option[Long])] = {
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(path(s"$dir/v=$id"), OpFile)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val l = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        l.split("\t", -1) match {
          case Array(op) => Some((op, "", None))
          case Array(op, detail) => Some((op, detail, None))
          case parts => Some((parts(0), parts(1),
            parts(2).toLongOption))
        }
      } finally in.close()
    }
  }

  /** Commit timestamp of version `id` (epoch millis), inheriting from
    * the nearest stamped predecessor when the version itself carries
    * none (an op-less streaming publish): "as of" resolution then
    * treats the unstamped version as simultaneous with that
    * predecessor — sound, since the pair is indistinguishable by time
    * and the LATER id wins the as-of pick. */
  def commitTsOf(spark: SparkSession, dir: String, id: Long)
      : Option[Long] = {
    val vs = committed(spark, dir).filter(_ <= id).sorted.reverse
    vs.iterator.map(v => opNoteOf(spark, dir, v).flatMap(_._3))
      .collectFirst { case Some(ts) => ts }
  }

  /** The newest committed version whose commit timestamp is at or
    * before `tsMillis` — `TIMESTAMP AS OF` resolution (Delta's rule).
    * Refuses a timestamp BEFORE the chain's first stamped commit (no
    * version existed then) and an entirely unstamped chain. */
  def versionAt(spark: SparkSession, dir: String, tsMillis: Long)
      : Long = {
    val vs = committed(spark, dir).sorted
    require(vs.nonEmpty, s"no committed versions under $dir")
    // carry the last seen stamp forward over unstamped versions
    var lastTs = Option.empty[Long]
    val stamped = vs.map { v =>
      val ts = opNoteOf(spark, dir, v).flatMap(_._3).orElse(lastTs)
      lastTs = ts
      v -> ts
    }
    val known = stamped.collect { case (v, Some(ts)) => (v, ts) }
    require(known.nonEmpty,
      s"chain under $dir carries no commit timestamps")
    require(tsMillis >= known.head._2,
      s"timestamp $tsMillis predates the first commit " +
        s"(${known.head._2}) of $dir")
    known.filter(_._2 <= tsMillis).map(_._1).max
  }

  /** The data files of committed version `id` — the manifest's list
    * when one exists, else every `*.parquet` directly under the
    * version dir. */
  def manifest(spark: SparkSession, dir: String, id: Long)
      : Seq[String] = {
    val fs = fsOf(spark, dir)
    val vdir = path(s"$dir/v=$id")
    require(fs.exists(new org.apache.hadoop.fs.Path(vdir, CommitMarker)),
      s"version $id under $dir is not committed")
    val mf = new org.apache.hadoop.fs.Path(vdir, ManifestFile)
    if (fs.exists(mf)) {
      val in = fs.open(mf)
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      finally in.close()
    } else
      fs.listStatus(vdir).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.toString)
  }

  /** Read committed version `id` (default: head) by resolving its
    * manifest — the reader side of the pointer scheme. */
  def read(spark: SparkSession, dir: String,
           version: Option[Long] = None): DataFrame = {
    val vs = committed(spark, dir)
    require(vs.nonEmpty, s"no committed versions under $dir")
    val v = version.getOrElse(vs.max)
    require(vs.contains(v), s"version $v not committed under $dir")
    spark.read.parquet(manifest(spark, dir, v): _*)
  }

  /** Highest EXTERNAL transaction id applied to this chain (None
    * before any) — the streaming-sink dedupe note: a foreachBatch
    * sink records its batch id here AFTER publishing so a checkpoint-
    * recovery replay of an already-applied batch can skip instead of
    * re-merging (see [[graft.streaming.Streams]]'s COW merge sink). */
  def appliedId(spark: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(spark, dir)
    val p = path(s"$dir/$AppliedFile")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Raise the applied-transaction note to at least `id` (never
    * lowers — replays of stale ids can't rewind it). */
  def recordAppliedId(spark: SparkSession, dir: String,
                      id: Long): Unit = {
    val v = math.max(id,
      appliedId(spark, dir).getOrElse(Long.MinValue))
    val out = fsOf(spark, dir).create(path(s"$dir/$AppliedFile"), true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Retention low-watermark: highest id ever pruned (None before
    * any retention). Persisted beside the chain so replay fencing
    * survives restarts. */
  def prunedWatermark(spark: SparkSession, dir: String): Option[Long] = {
    val fs = fsOf(spark, dir)
    val p = path(s"$dir/$PrunedFile")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Raise the watermark to at least `v` (never lowers). */
  def raiseWatermark(spark: SparkSession, dir: String, v: Long): Unit = {
    val wm = math.max(v,
      prunedWatermark(spark, dir).getOrElse(Long.MinValue))
    val out = fsOf(spark, dir).create(path(s"$dir/$PrunedFile"), true)
    try out.write(wm.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Drop all but the newest `keepLast` committed versions; also reap
    * TORN leftovers — unmarked `v=<n>` dirs and stage dirs with id at
    * or below the committed head are crash debris no reader can ever
    * see (r9 advice: they previously accumulated forever; an id
    * ABOVE the head may be a concurrent writer mid-publish and is
    * left alone). Manifest-aware: a file inside a pruned version dir
    * that a kept manifest still references survives (only the
    * marker, manifest and unreferenced files go; the dir itself goes
    * once empty of referenced files). When `watermark` is set the
    * highest pruned id is persisted for replay fencing. Returns the
    * pruned ids. */
  def retain(spark: SparkSession, dir: String, keepLast: Int,
             watermark: Boolean = false): Seq[Long] = {
    require(keepLast >= 1, "retain must keep at least the head")
    val fs = fsOf(spark, dir)
    val root = path(dir)
    if (!fs.exists(root)) return Seq.empty
    val vs = committed(spark, dir).sorted
    val drop = vs.dropRight(keepLast)
    val keep = vs.takeRight(keepLast)
    // every file a KEPT version still points at must survive pruning;
    // qualify both sides so scheme-less manifest entries ("/t/x")
    // match the scheme-qualified listing ("file:/t/x")
    def qual(s: String): String = fs.makeQualified(path(s)).toString
    val referenced: Set[String] = keep
      .flatMap(v => manifest(spark, dir, v)).map(qual).toSet
    def pruneDir(vdir: org.apache.hadoop.fs.Path): Unit = {
      val inside = fs.listStatus(vdir)
      val (keepF, dropF) = inside.partition(f =>
        f.isFile && referenced.contains(qual(f.getPath.toString)))
      if (keepF.isEmpty) fs.delete(vdir, true): Unit
      else dropF.foreach(f => fs.delete(f.getPath, true): Unit)
    }
    drop.foreach(v => pruneDir(path(s"$dir/v=$v")))
    // torn leftovers: unmarked v-dirs / stage dirs at or below head
    val headV = keep.lastOption.getOrElse(Long.MinValue)
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val torn =
        (n.startsWith("v=") && st.isDirectory
          && !fs.exists(new org.apache.hadoop.fs.Path(st.getPath, CommitMarker))
          && scala.util.Try(n.stripPrefix("v=").toLong).toOption
               .exists(_ <= headV)) ||
        (n.startsWith(StagePrefix)
          && scala.util.Try(n.stripPrefix(StagePrefix)
               .takeWhile(_ != '.').toLong).toOption
               .exists(_ <= headV))
      if (torn) pruneDir(st.getPath)
    }
    if (watermark && drop.nonEmpty) raiseWatermark(spark, dir, drop.max)
    drop
  }
}
