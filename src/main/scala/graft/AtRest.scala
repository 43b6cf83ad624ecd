package graft

import org.apache.spark.sql.SparkSession

/** Locations for MATERIALIZED INDEX relations ("at rest"): a production
  * pipeline builds its derived indexes — near-dup pair sets, minhash
  * signatures, ANN cell assignments — once, writes them to columnar
  * storage, and lets every consumer scan the index instead of recomputing
  * the derivation (the shape behind q_dedup_pairs_at_rest /
  * q_sim_ivf_at_rest and their incremental refresh twins).
  *
  * The root is session-configurable (`graft.atrest.dir`; default
  * `target/graft-atrest` under the working directory — a disposable build
  * artifact, never the read-only data dir). Each index path embeds a
  * FINGERPRINT of its source table's parquet parts (name/length/mtime),
  * so a regenerated corpus at the same path can never serve a stale
  * index, plus a code version so pipeline changes invalidate cleanly.
  */
object AtRest {
  /** Bump to invalidate every at-rest index after a pipeline change. */
  val Version = 1

  def root(s: SparkSession): String =
    s.conf.getOption("graft.atrest.dir").getOrElse(
      new java.io.File(sys.props.getOrElse("user.dir", "."), "target/graft-atrest")
        .getAbsolutePath)

  /** Index directory for (source dir, index name, source table). */
  def dir(s: SparkSession, d: String, name: String, srcTable: String): java.io.File = {
    val src = new java.io.File(d, s"$srcTable.parquet")
    val parts: Seq[java.io.File] =
      if (src.isDirectory)
        Option(src.listFiles()).map(_.toSeq.sortBy(_.getName)).getOrElse(Nil)
      else Seq(src)
    val sig = parts.map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val md = java.security.MessageDigest.getInstance("MD5")
    val fp = md.digest(s"$d|$sig".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    new java.io.File(root(s), s"${name}_v$Version/$fp")
  }

  /** A parquet write is complete iff Spark's _SUCCESS marker landed. */
  def isBuilt(dir: java.io.File): Boolean = new java.io.File(dir, "_SUCCESS").isFile
}
