package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared catalog plumbing for the SQL-surface specs (CatalogSpec,
  * SqlCompatSpec): stage the read-only single-file corpus tables as
  * directory locations, register them as external catalog tables, and
  * canonicalize results the way the driver's compare does.
  */
object CatalogFixture {

  val db = "graft_cat"

  /** Hive expects a table LOCATION to be a DIRECTORY it can stat (it
    * logs a HiveException per table otherwise — non-fatal, but noise
    * that would mask a real failure). The corpus ships each table as a
    * single read-only parquet FILE, so stage a directory per table
    * holding one symlink to the corpus file: the catalog points at the
    * directory, the bytes stay external and read-only, and Spark reads
    * through the link. The link is re-pointed whenever its target
    * drifted from the current corpus path (a run with a different
    * SPARK_GRAFT_SF would otherwise silently test the old corpus
    * through the stale link — r14 ADVICE). */
  def stagedLocation(sf: String, t: String): String = {
    val dir = new java.io.File(s"target/graft-cat/$t")
    val link = new java.io.File(dir, "part-0000.parquet").toPath
    val want = java.nio.file.Paths.get(s"$sf/$t.parquet")
    if (dir.isDirectory &&
        (!java.nio.file.Files.isSymbolicLink(link) ||
          java.nio.file.Files.readSymbolicLink(link) != want)) {
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.createSymbolicLink(link, want)
    } else if (!dir.isDirectory) {
      dir.mkdirs()
      java.nio.file.Files.createSymbolicLink(link, want)
    }
    dir.getAbsolutePath
  }

  def registerCatalogTables(spark: SparkSession, sf: String): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.names.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
      spark.sql(
        s"CREATE TABLE $db.$t USING parquet LOCATION '${stagedLocation(sf, t)}'")
    }
  }

  /** Driver-style canonical form: columns sorted by name, every value
    * rendered, rows sorted lexicographically. Floating point renders at
    * 12 significant digits (both sides compute money on DECIMAL and
    * cast at the end, so values are expected bit-identical; the
    * rounding only guards IEEE noise in derived ratios). Columns join on
    * the same non-printable \u0001 delimiter tools/check.py uses —
    * an empty separator would let adjacent string columns collide
    * (("ab","c") == ("a","bc")) and misclassify a value-divergent query
    * as identical (r15 ADVICE). */
  def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    proj.collect().map { r =>
      cols.indices.map(i => renderStrict(r.get(i))).mkString("\u0001")
    }.toSeq.sorted
  }

  private def renderStrict(v: Any): String = v match {
    case null => "NULL"
    case d: Double => String.format(java.util.Locale.ROOT, "%.12g", Double.box(d))
    case f: Float => String.format(java.util.Locale.ROOT, "%.12g", Double.box(f.toDouble))
    case d: java.math.BigDecimal => d.stripTrailingZeros.toPlainString
    case s: Seq[_] => s.map(renderStrict).mkString("[", ",", "]")
    case v => v.toString
  }

  /** TYPE-TOLERANT canonical form: every numeric renders through one
    * double path, so a SQL frontend that types a column DECIMAL where
    * the DataFrame types it DOUBLE (or INT vs BIGINT) still compares
    * value-equal. Used ONLY to split "value-equal, type differs" from
    * true value divergence in the compat matrix — the strict form above
    * is the pass bar. */
  def canonLoose(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    proj.collect().map { r =>
      cols.indices.map(i => renderLoose(r.get(i))).mkString("\u0001")
    }.toSeq.sorted
  }

  private def renderLoose(v: Any): String = v match {
    case null => "NULL"
    // one temporal rendering: TIMESTAMP collects as java.sql.Timestamp,
    // TIMESTAMP_NTZ as java.time.LocalDateTime — same wall-clock value,
    // different toString rules (T separator, fraction digit grouping).
    // Route both through LocalDateTime so the fraction formats agree.
    case t: java.sql.Timestamp => t.toLocalDateTime.toString
    case t: java.time.LocalDateTime => t.toString
    case d: Double => String.format(java.util.Locale.ROOT, "%.9g", Double.box(d))
    case f: Float => String.format(java.util.Locale.ROOT, "%.9g", Double.box(f.toDouble))
    case d: java.math.BigDecimal =>
      String.format(java.util.Locale.ROOT, "%.9g", Double.box(d.doubleValue))
    case n: java.lang.Number =>
      String.format(java.util.Locale.ROOT, "%.9g", Double.box(n.doubleValue))
    case s: Seq[_] => s.map(renderLoose).mkString("[", ",", "]")
    case v => v.toString
  }
}
