package graft

/** Tables.contentStamp — the edges-cache staleness key (r7 advisory
  * fix): a directory source's stamp must change on an IN-PLACE part
  * rewrite (same file names), which the old dir-length/mtime key
  * missed; file sources keep the size:mtime stamp. Pure-JVM, no Spark. */
class ContentStampSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tmpDir(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("stamp").toFile
    d.deleteOnExit(); d
  }

  test("file stamp is size:mtime") {
    val f = java.io.File.createTempFile("stamp", ".bin")
    java.nio.file.Files.write(f.toPath, Array[Byte](1, 2, 3))
    assert(Tables.contentStamp(f) == s"${f.length}:${f.lastModified}")
  }

  test("directory stamp covers children recursively and changes on an " +
    "in-place same-name rewrite") {
    val d = tmpDir()
    val sub = new java.io.File(d, "sub"); sub.mkdirs()
    val p1 = new java.io.File(d, "part-00000")
    val p2 = new java.io.File(sub, "part-00001")
    java.nio.file.Files.write(p1.toPath, Array[Byte](1, 2))
    java.nio.file.Files.write(p2.toPath, Array[Byte](3))
    val before = Tables.contentStamp(d)
    assert(before.contains("/part-00000") &&
      before.contains("/sub/part-00001"))
    // rewrite p1 in place: same name, same LENGTH, newer mtime — the
    // failure mode the old directory-mtime key served stale
    java.nio.file.Files.write(p1.toPath, Array[Byte](9, 9))
    p1.setLastModified(p1.lastModified() + 5000)
    assert(Tables.contentStamp(d) != before)
  }

  test("directory stamp is order-stable (sorted child names)") {
    val d = tmpDir()
    Seq("b", "a", "c").foreach { n =>
      java.nio.file.Files.write(new java.io.File(d, n).toPath,
        Array[Byte](1))
    }
    val s1 = Tables.contentStamp(d)
    assert(s1.indexOf("/a:") < s1.indexOf("/b:") &&
      s1.indexOf("/b:") < s1.indexOf("/c:"))
  }
}
