package graft

import org.apache.spark.sql.SparkSession

/** Per-run-unique scratch locations for operators that materialize a
  * side layout (q124/q129 clustered parquet, q142 bucketed tables).
  *
  * A fixed path keyed only on the input dir collides two ways: two
  * concurrent drivers over the same data (Bench and Verify) overwrite
  * each other's files mid-read, and two different dirs can collide via
  * hashCode. Suffixing with the SparkContext applicationId (unique per
  * context) isolates runs; a JVM shutdown hook deletes whatever this
  * process created so /tmp does not accrete layouts.
  */
object Scratch {

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** applicationId sanitized to [A-Za-z0-9_] — safe in file names AND
    * catalog table names. */
  def token(s: SparkSession): String =
    s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")

  /** A scratch dir unique to (tag, this SparkContext), registered for
    * recursive deletion at JVM exit. Stable within a session so a spec
    * can inspect the layout its query just wrote. */
  def dir(s: SparkSession, tag: String): String = {
    val path =
      s"${sys.props("java.io.tmpdir")}/graft_${tag}_${token(s)}"
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        deleteRecursively(new java.io.File(path))))
    path
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }
}
