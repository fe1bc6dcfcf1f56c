package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Properties

/** File-backed key→value watermark state (SURVEY §2.11-C2) — the
  * engine's stand-in for the reference's Airflow `Variable` store
  * (`scripts/pyspark/extract_postgres_table.py:28-34,73-76`).
  *
  * Java-properties format, written atomically (temp file + move) so a
  * crashed run never leaves a torn store. This is driver-side state —
  * one tiny file per pipeline, read once per run; at cluster scale the
  * path lives on shared storage (HDFS/object-store mount).
  */
final class WatermarkStore(path: Path) {

  def this(path: String) = this(Paths.get(path))

  private def load(): Properties = {
    val props = new Properties()
    if (Files.exists(path)) {
      val in = Files.newBufferedReader(path, StandardCharsets.UTF_8)
      try props.load(in) finally in.close()
    }
    props
  }

  def get(key: String): Option[String] = Option(load().getProperty(key))

  def getOrElse(key: String, default: String): String =
    get(key).getOrElse(default)

  def set(key: String, value: String): Unit = {
    val props = load()
    props.setProperty(key, value)
    if (path.getParent != null) Files.createDirectories(path.getParent)
    val tmp = Files.createTempFile(
      Option(path.getParent).getOrElse(Paths.get(".")), ".wm", ".tmp")
    val out = Files.newBufferedWriter(tmp, StandardCharsets.UTF_8)
    try props.store(out, null) finally out.close()
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
