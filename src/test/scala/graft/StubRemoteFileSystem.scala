package graft

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, RawLocalFileSystem}

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

/** In-JVM stand-in for a remote object store (`graftfs://` scheme): a
  * RawLocalFileSystem with a non-`file:` URI plus operation counters, so
  * specs can prove the engine's remote-FS code paths actually resolve the
  * scheme through Hadoop configuration (the way s3a/abfs/gs resolve in
  * production) instead of silently falling back to `file:`. The spec
  * disables Hadoop's FS cache for the scheme, so EVERY resolution must
  * carry `fs.graftfs.impl` in the conf it was handed — which is exactly
  * what OtlpDataSource ships to executors via confEntries
  * (`OtlpDataSource.scala` createReaderFactory). */
class StubRemoteFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    StubRemoteFileSystem.initializations.incrementAndGet()
    super.initialize(name, conf)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    StubRemoteFileSystem.opens.incrementAndGet()
    super.open(f, bufferSize)
  }

  override def globStatus(pathPattern: Path): Array[FileStatus] = {
    StubRemoteFileSystem.globs.incrementAndGet()
    super.globStatus(pathPattern)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    StubRemoteFileSystem.renames.incrementAndGet()
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    StubRemoteFileSystem.deletes.incrementAndGet()
    super.delete(p, recursive)
  }
}

object StubRemoteFileSystem {
  val initializations = new AtomicLong(0)
  val opens = new AtomicLong(0)
  val globs = new AtomicLong(0)
  val renames = new AtomicLong(0)
  val deletes = new AtomicLong(0)

  /** Register the scheme on a session's Hadoop conf, cache disabled (every
    * resolution must present the impl key — see class doc). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[StubRemoteFileSystem].getName)
    conf.set("fs.graftfs.impl.disable.cache", "true")
  }
}
