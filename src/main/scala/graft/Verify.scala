package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.spark.sql.GraftExtensions) // SQL DDL/MV/MERGE queries
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // optional comma-separated subset for local iteration (driver leaves
    // unset) — same contract as Bench's SPARK_GRAFT_BENCH_ONLY
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY").map(_.split(',').toSet)
    // The driver's pandas comparator sorts rows cell-by-cell and cannot
    // hash/sort nested cells (array/map/struct) — an oracle-visible nested
    // column is an automatic `err` row (r12's q100). Guard violations are
    // collected OUTSIDE the per-query catch (which exists for data/plan
    // failures) and crash the run at the end: the other queries still
    // dump, but a scripted invocation checking the exit code can never
    // read a schema-defect run as success.
    val nestedViolations = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        var guardHit = false
        if (SparkEntry.oracleSql.contains(name)) {
          val nested = df.schema.fields.collect {
            case f if f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
                      f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
                      f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] =>
              s"${f.name}: ${f.dataType.simpleString}"
          }
          if (nested.nonEmpty) {
            val msg = s"oracle-visible schema of $name carries nested column(s) " +
              s"${nested.mkString(", ")} — scalar-encode them " +
              "(array_join / md5) on BOTH the Spark and oracle sides"
            System.err.println(s"[verify] $name SCHEMA GUARD: $msg")
            nestedViolations += msg
            guardHit = true
          }
        }
        if (!guardHit)
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (nestedViolations.nonEmpty) {
      System.err.println(s"[verify] ${nestedViolations.size} schema-guard violation(s); failing")
      sys.exit(1)
    }
  }
}
