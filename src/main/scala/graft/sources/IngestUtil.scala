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

  /** HTTP(S) GET to a local file. Returns bytes written. Non-2xx responses
    * throw: HttpURLConnection does NOT follow protocol-crossing redirects
    * (http -> https, the common dataset-mirror case) and would hand back
    * the 3xx HTML body as a "successful" stream — which would then be
    * saved as the dataset and fail cryptically at extract time.
    */
  def downloadFile(url: String, dest: File, connectTimeoutMs: Int = 10000,
                   readTimeoutMs: Int = 60000): Long = {
    val conn = new URI(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val code = conn.getResponseCode
    if (code < 200 || code >= 300) {
      val loc = Option(conn.getHeaderField("Location")).map(l => s" (Location: $l)").getOrElse("")
      conn.disconnect()
      throw new java.io.IOException(s"downloadFile: HTTP $code for $url$loc")
    }
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
    // GNU 'L' long-name blocks and PAX 'x' `path` records carry the REAL
    // path of the entry that follows (the 100-byte name field then holds a
    // truncated stand-in) — applying the override, not just consuming the
    // block, is what keeps long-pathed files out of wrong truncated
    // locations (review r9). The override still routes through safeDest.
    var pendingName: Option[String] = None
    // PAX 'size' records carry the REAL payload length of entries whose
    // 12-byte octal field cannot (> 8 GiB, where it holds a placeholder) --
    // ignoring it would copy the placeholder byte count and misalign every
    // later header (review r10)
    var pendingSize: Option[Long] = None
    while (!done) {
      if (!readFully(in, header)) done = true
      else if (header.forall(_ == 0)) done = true
      else {
        // ustar prefix (offset 345, 155 bytes) carries the leading path of
        // entries whose full path exceeds the 100-byte name field — core
        // ustar, not an extension: ignoring it flattens long directory
        // chains into destDir
        val prefix = cString(header, 345, 155)
        val tail = cString(header, 0, 100)
        val ustarName = if (prefix.isEmpty) tail else s"$prefix/$tail"
        val size = java.lang.Long.parseLong(cString(header, 124, 12).trim, 8)
        val typeFlag = header(156).toChar
        val name = pendingName.getOrElse(ustarName)
        // effective payload length of a DATA entry; meta blocks below use
        // their own header size (their pax overrides apply to what FOLLOWS)
        val effSize = if ("Lxg".contains(typeFlag)) size
          else pendingSize.getOrElse(size)
        typeFlag match {
          case 'L' => // GNU long name: payload = next entry's full path
            pendingName = Some(readMetaBlock(in, size, "GNU long-name"))
          case 'x' => // PAX per-file records: `path` overrides next name
            val recs = parsePaxRecords(readMetaBlock(in, size, "PAX header"))
            recs.get("path").foreach(p => pendingName = Some(p))
            recs.get("size").foreach(v => pendingSize = Some(v.trim.toLong))
          case 'g' => // PAX global defaults: a global path would silently
            // rename every following entry — refuse rather than misplace
            val g = parsePaxRecords(readMetaBlock(in, size, "PAX global header"))
            require(!g.contains("path") && !g.contains("size"),
              "PAX global 'path'/'size' overrides are unsupported")
          case '5' =>
            safeDest(destDir, name).mkdirs()
            // some tar variants store data in directory entries -- consume
            // it or every later header is misaligned (review r10)
            skipFully(in, effSize)
            pendingName = None; pendingSize = None
          case '0' | '\u0000' if name.endsWith("/") =>
            safeDest(destDir, name).mkdirs()
            skipFully(in, effSize)
            pendingName = None; pendingSize = None
          case '0' | '\u0000' | '7' => // regular (incl. old-tar contiguous)
            val out = safeDest(destDir, name)
            out.getParentFile.mkdirs()
            writeEntry(in, out, effSize)
            count += 1
            pendingName = None; pendingSize = None
          case _ =>
            // GNU 'K' (long link target), symlinks (2), devices, fifos:
            // consume the payload, materialize NOTHING — a symlink written
            // as an empty file is silent content loss, and metadata blocks
            // extracted as junk files corrupt the tree. (Symlinks are also
            // a zip-slip vector; refusing them keeps the sanitizer
            // airtight.)
            skipFully(in, effSize)
            pendingName = None; pendingSize = None
        }
        val padBase = if ("Lxg".contains(typeFlag)) size else effSize
        val pad = (512 - (padBase % 512)) % 512
        skipFully(in, pad)
      }
    }
    count
  }

  /** Read a metadata block ('L'/'x'/'g' payload) fully; these carry paths
    * or keyword records and are tiny — cap at 1 MiB so a forged size field
    * cannot balloon the heap. Trailing NULs stripped ('L' payloads are
    * NUL-terminated).
    */
  private def readMetaBlock(in: InputStream, size: Long, what: String): String = {
    require(size <= (1L << 20), s"$what block implausibly large ($size bytes)")
    val buf = new Array[Byte](size.toInt)
    require(readFully(in, buf), s"truncated $what block")
    var end = buf.length
    while (end > 0 && buf(end - 1) == 0) end -= 1
    new String(buf, 0, end, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse PAX extended-header records: `"%d key=value\n"` with the decimal
    * length counting the whole record including itself and the newline
    * (POSIX pax spec). Malformed records throw — a half-parsed PAX header
    * silently dropping `path` is exactly the misplacement bug this parser
    * exists to prevent.
    */
  private[graft] def parsePaxRecords(payload: String): Map[String, String] = {
    val bytes = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = Map.newBuilder[String, String]
    var off = 0
    while (off < bytes.length) {
      val sp = bytes.indexOf(' '.toByte, off)
      require(sp > off, s"malformed PAX record at byte $off (no length field)")
      val len = new String(bytes, off, sp - off, java.nio.charset.StandardCharsets.US_ASCII).toInt
      require(len > sp - off + 1 && off + len <= bytes.length && bytes(off + len - 1) == '\n',
        s"malformed PAX record at byte $off (bad length $len)")
      val rec = new String(bytes, sp + 1, off + len - 1 - (sp + 1),
        java.nio.charset.StandardCharsets.UTF_8)
      val eq = rec.indexOf('=')
      require(eq > 0, s"malformed PAX record at byte $off (no '=')")
      out += rec.substring(0, eq) -> rec.substring(eq + 1)
      off += len
    }
    out.result()
  }

  /** Resolve an entry path under destDir, refusing zip-slip escapes. */
  private def safeDest(destDir: File, name: String): File = {
    val out = new File(destDir, name).getCanonicalFile
    require(out.getPath.startsWith(destDir.getCanonicalPath + File.separator) ||
      out.getCanonicalPath == destDir.getCanonicalPath, s"unsafe tar entry: $name")
    out
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
