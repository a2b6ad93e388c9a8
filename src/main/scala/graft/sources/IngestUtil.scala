package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileOutputStream, InputStream}
import java.net.{HttpURLConnection, URI}
import java.util.zip.GZIPInputStream

/** Driver-side ingest utilities (SURVEY S5/S6 — DataUtilities.downloadFile /
  * extractTarGz, reference chapter2/DataUtilities.java:33-89). These are
  * out-of-engine helpers that stage remote archives onto shared storage
  * before Spark reads them; they are NOT query operators and never run on
  * the hot path. Tar parsing is a minimal ustar reader (header = 512-byte
  * blocks, size octal at offset 124).
  */
object IngestUtil {

  /** HTTP(S) GET to a local file. Returns bytes written. */
  def downloadFile(url: String, dest: File, connectTimeoutMs: Int = 10000,
                   readTimeoutMs: Int = 60000): Long = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val in = new BufferedInputStream(conn.getInputStream)
    try copyTo(in, dest) finally { in.close(); conn.disconnect() }
  }

  /** Extract a .tar.gz archive under destDir. Returns extracted file count.
    * Entry paths are sanitized against zip-slip.
    */
  def extractTarGz(archive: File, destDir: File): Int = {
    val in = new GZIPInputStream(new BufferedInputStream(new java.io.FileInputStream(archive)))
    try extractTar(in, destDir) finally in.close()
  }

  private[graft] def extractTar(in: InputStream, destDir: File): Int = {
    val header = new Array[Byte](512)
    var count = 0
    var done = false
    while (!done) {
      if (!readFully(in, header)) done = true
      else if (header.forall(_ == 0)) done = true
      else {
        val name = cString(header, 0, 100)
        val size = java.lang.Long.parseLong(cString(header, 124, 12).trim, 8)
        val typeFlag = header(156).toChar
        val out = new File(destDir, name).getCanonicalFile
        require(out.getPath.startsWith(destDir.getCanonicalPath + File.separator) ||
          out.getCanonicalPath == destDir.getCanonicalPath, s"unsafe tar entry: $name")
        if (typeFlag == '5' || name.endsWith("/")) out.mkdirs()
        else {
          out.getParentFile.mkdirs()
          writeEntry(in, out, size)
          count += 1
        }
        val pad = (512 - (size % 512)) % 512
        skipFully(in, pad)
      }
    }
    count
  }

  private def writeEntry(in: InputStream, dest: File, size: Long): Unit = {
    val os = new BufferedOutputStream(new FileOutputStream(dest))
    try {
      val buf = new Array[Byte](8192)
      var remaining = size
      while (remaining > 0) {
        val n = in.read(buf, 0, math.min(buf.length, remaining).toInt)
        require(n >= 0, "truncated tar entry")
        os.write(buf, 0, n)
        remaining -= n
      }
    } finally os.close()
  }

  private def copyTo(in: InputStream, dest: File): Long = {
    val os = new BufferedOutputStream(new FileOutputStream(dest))
    try {
      val buf = new Array[Byte](8192)
      var total = 0L
      var n = in.read(buf)
      while (n >= 0) { os.write(buf, 0, n); total += n; n = in.read(buf) }
      total
    } finally os.close()
  }

  private def readFully(in: InputStream, buf: Array[Byte]): Boolean = {
    var off = 0
    while (off < buf.length) {
      val n = in.read(buf, off, buf.length - off)
      if (n < 0) return false
      off += n
    }
    true
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var remaining = n
    while (remaining > 0) {
      val skipped = in.skip(remaining)
      if (skipped <= 0) { if (in.read() < 0) return else remaining -= 1 }
      else remaining -= skipped
    }
  }

  private def cString(buf: Array[Byte], off: Int, len: Int): String = {
    val end = (off until off + len).find(i => buf(i) == 0).getOrElse(off + len)
    new String(buf, off, end - off, "US-ASCII")
  }
}
