package graft.format

/** The ONE storage primitive the GraftTable commit protocol needs:
  * an atomic PUT-IF-ABSENT of the snapshot record. Everything else
  * the format writes (data files, manifest dirs, DV dirs) goes to
  * names no reader resolves until a snapshot names them, so plain
  * eventually-visible writes suffice there — but the snapshot create
  * is the linearization point, and its atomicity is what makes two
  * racing writers of version N resolve to exactly one winner.
  *
  * On a POSIX filesystem that primitive is `CREATE_NEW`
  * ([[PosixCommitIO]]). Object stores have no such open flag, but
  * every major one now exposes an equivalent conditional write —
  * S3 `PutObject If-None-Match: *`, GCS `x-goog-if-generation-match:
  * 0`, Azure Blob `If-None-Match: *` — which is exactly this trait's
  * contract: implement it with one HTTP call and the whole format
  * layer (commit, rebase, vacuum, exactly-once streaming ledger)
  * carries over unchanged. The reference's warehouse is S3
  * (aws-glue-etl-sample-hist `document/glue_t0.md:95-117`); this
  * seam is what keeps the protocol portable to it.
  *
  * Contract:
  *  - MUST be atomic: concurrent calls for the same path see exactly
  *    one `true`; no caller ever observes a partially-written file.
  *  - MUST NOT overwrite: an existing object at `path` returns
  *    `false` with the existing content intact.
  *  - A `true` return MUST mean the content is durably visible to
  *    any subsequent reader (read-after-write, which S3/GCS/Azure
  *    all guarantee for new objects).
  */
trait CommitIO {

  /** Atomically create `path` with `content` iff nothing exists
    * there. Returns true when this call created it, false when the
    * path was already present (commit race lost — rebase). */
  def putIfAbsent(path: java.nio.file.Path, content: Array[Byte])
      : Boolean
}

/** Filesystem implementation: `CREATE_NEW` is an atomic exclusive
  * create on POSIX (and on NFSv3+ via O_EXCL). */
object PosixCommitIO extends CommitIO {
  override def putIfAbsent(path: java.nio.file.Path,
      content: Array[Byte]): Boolean =
    try {
      java.nio.file.Files.write(path, content,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
}
