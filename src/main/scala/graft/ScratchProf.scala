package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false")
      .config("spark.hadoop.fs.file.impl","org.apache.hadoop.fs.RawLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("prof_").toString + "/t"
    graft.format.GraftTable.create(spark, root,
      spark.range(0L, 100000L).selectExpr("id as k", "id % 97 as v"),
      Seq("k"), numFiles = 2000)
    val t = graft.format.GraftTable.forPath(spark, root)
    val files = t.manifest().select("path").collect().map(_.getString(0))
    val schema = StructType(Seq(StructField("v", LongType)))
    val fac = new graft.sources.GraftTableReaderFactory(root, schema)
    def pass(label: String): Unit = {
      var initNs = 0L; var drainNs = 0L; var rows = 0L
      files.foreach { rel =>
        val p = graft.sources.GraftTableFilePartition(s"$root/$rel", sizeBytes = 2048L)
        val a = System.nanoTime
        val r = fac.createColumnarReader(p)
        val b = System.nanoTime
        while (r.next()) rows += r.get().numRows()
        r.close()
        val c = System.nanoTime
        initNs += b - a; drainNs += c - b
      }
      println(f"PROF $label init=${initNs/1e6}%.0fms drain=${drainNs/1e6}%.0fms rows=$rows files=${files.length} perFileInit=${initNs/1e3/files.length}%.0fus perFileDrain=${drainNs/1e3/files.length}%.0fus")
    }
    pass("cold"); pass("warm"); pass("warm2")
  }
}
