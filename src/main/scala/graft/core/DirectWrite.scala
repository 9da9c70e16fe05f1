package graft.core

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobContext, TaskAttemptContext}
import org.apache.spark.internal.io.{FileCommitProtocol, FileNameSpec}
import org.apache.spark.internal.io.FileCommitProtocol.TaskCommitMessage

/** Commit protocol that writes every task file DIRECTLY at its final
  * location — no `_temporary` tree, no task- or job-level rename. On an
  * object store the default committer's rename is a byte copy, so the
  * standard protocol writes every appended byte twice; this one writes it
  * once (the "magic committer" idea, expressible here without any
  * store-specific integration).
  *
  * Safe ONLY where file visibility is governed by something above the
  * filesystem: graft uses it exclusively for commits to VERSIONED dataset
  * roots, where readers plan scans from the commit log and a data file is
  * invisible until a committed entry references it. Under that contract
  * every failure mode degrades to an invisible orphan, reclaimed by
  * `vacuum` once past its grace horizon:
  *
  *   - task retry — the attempt id is part of every filename, so a
  *     re-attempt writes fresh files; the dead attempt's partials orphan.
  *   - speculative duplicates — both attempts write; only the attempt
  *     whose commit message the driver accepts reaches the committed
  *     list (the other's files orphan). No commit coordination needed:
  *     unreferenced files are inert.
  *   - job abort / crash — nothing was renamed into place because
  *     nothing is ever renamed; the written files are simply never
  *     referenced by a commit entry.
  *
  * The committed file list flows back to the caller in-process: the
  * caller stamps the write with a unique token via a writer option (all
  * writer options are copied into the job's Hadoop `Configuration` by the
  * V1 write path), `commitJob` — driver-side, but on whatever thread AQE
  * runs the result stage on — records the winning attempts' files under
  * that token, and [[DirectWriteCommitProtocol.capture]] collects them
  * after the blocking write returns. No post-write directory listing (the
  * default path's pre/post listing diff is O(dataset); this is
  * O(batch)).
  *
  * Reference analogue: publish_parq.py writes S3 objects directly under
  * their final dataset keys (no staging/rename either) — this protocol
  * recovers that single-PUT-per-byte behavior under Spark's committer
  * abstraction.
  */
class DirectWriteCommitProtocol(jobId: String, path: String,
                                dynamicPartitionOverwrite: Boolean)
    extends FileCommitProtocol with Serializable {
  require(!dynamicPartitionOverwrite,
    "DirectWriteCommitProtocol supports only plain appends (no dynamic partition overwrite)")

  // task-side accumulator; rebuilt per attempt in setupTask
  @transient private var addedFiles: ArrayBuffer[String] = _

  override def setupJob(jobContext: JobContext): Unit = ()

  override def commitJob(jobContext: JobContext,
                         taskCommits: Seq[TaskCommitMessage]): Unit = {
    val files = taskCommits.flatMap(_.obj.asInstanceOf[Seq[String]])
    val token = jobContext.getConfiguration.get(DirectWriteCommitProtocol.TokenKey)
    require(token != null,
      s"direct write to $path carries no ${DirectWriteCommitProtocol.TokenKey} " +
        "writer option — the caller could not receive the committed file list")
    DirectWriteCommitProtocol.committed.put(token, files)
  }

  override def abortJob(jobContext: JobContext): Unit = ()

  override def setupTask(taskContext: TaskAttemptContext): Unit =
    addedFiles = ArrayBuffer.empty[String]

  override def newTaskTempFile(taskContext: TaskAttemptContext,
                               dir: Option[String], ext: String): String =
    newTaskTempFile(taskContext, dir, FileNameSpec("", ext))

  override def newTaskTempFile(taskContext: TaskAttemptContext,
                               dir: Option[String], spec: FileNameSpec): String = {
    val attempt = taskContext.getTaskAttemptID
    val split = attempt.getTaskID.getId
    // attempt id in the name: a retried/speculated attempt must never
    // collide with a prior attempt's partial file. spec.suffix carries the
    // writer's per-task file counter (maxRecordsPerFile splits), spec
    // untouched so multi-file tasks stay unique too.
    val name =
      f"${spec.prefix}part-$split%05d-${attempt.getId}-$jobId${spec.suffix}"
    val file = dir.map(d => new Path(new Path(path, d), name))
      .getOrElse(new Path(path, name))
    addedFiles += file.toString
    file.toString
  }

  override def newTaskTempFileAbsPath(taskContext: TaskAttemptContext,
                                      absoluteDir: String, ext: String): String =
    throw new UnsupportedOperationException(
      "DirectWriteCommitProtocol does not support custom partition locations")

  override def newTaskTempFileAbsPath(taskContext: TaskAttemptContext,
                                      absoluteDir: String, spec: FileNameSpec): String =
    throw new UnsupportedOperationException(
      "DirectWriteCommitProtocol does not support custom partition locations")

  override def commitTask(taskContext: TaskAttemptContext): TaskCommitMessage =
    new TaskCommitMessage(addedFiles.toSeq)

  override def abortTask(taskContext: TaskAttemptContext): Unit = {
    // best-effort cleanup of this attempt's partials; anything missed is
    // an invisible orphan for vacuum
    val conf = taskContext.getConfiguration
    addedFiles.foreach { file =>
      try { val p = new Path(file); p.getFileSystem(conf).delete(p, false); () }
      catch { case _: Exception => () }
    }
  }
}

object DirectWriteCommitProtocol {
  /** SQLConf key the V1 file write path reads the committer class from. */
  val ConfKey = "spark.sql.sources.commitProtocolClass"

  /** Writer-option key carrying the caller's capture token. Writer options
    * land verbatim in the job's Hadoop Configuration
    * (`newHadoopConfWithOptions`), which is exactly what `commitJob`
    * receives — a keyed channel that survives AQE running the job commit
    * on its own result-stage thread (a ThreadLocal would not). Tokens are
    * per-write UUIDs, so two appends racing into the SAME root each
    * collect only their own write's files.
    */
  val TokenKey = "graft.directwrite.token"

  private val committed =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  /** Run `write` — a blocking DataFrameWriter action configured with this
    * protocol AND stamped with `.option(TokenKey, token)` — and return the
    * files its winning task attempts committed.
    */
  def capture(token: String)(write: => Unit): Seq[String] =
    try {
      write
      Option(committed.remove(token)).getOrElse(throw new IllegalStateException(
        "direct write completed without a commitJob for its token — was the " +
          s"write stamped with .option($TokenKey, <token>)?"))
    } finally committed.remove(token)
}
