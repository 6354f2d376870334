package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.NioCheckpointFileManager

/** The fork-free checkpoint I/O layer under every bounded streaming row
  * (selected session-wide via spark.sql.streaming.checkpointFileManagerClass,
  * so the streaming specs exercise it end-to-end; this spec pins the
  * manager's own atomic-publish contract). */
class NioCheckpointFileManagerSpec extends AnyFunSuite {

  private def mk(): (NioCheckpointFileManager, java.io.File) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_niocfm").toFile
    (new NioCheckpointFileManager(new Path(dir.toURI), new Configuration(false)),
      dir)
  }

  private def readAll(fm: NioCheckpointFileManager, p: Path): String = {
    val in = fm.open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  test("createAtomic publishes on close; nothing visible before") {
    val (fm, dir) = mk()
    val p = new Path(s"${dir.toURI}/offsets/0")
    val out = fm.createAtomic(p, overwriteIfPossible = false)
    out.write("v1".getBytes)
    // not yet published: only the hidden temp exists
    assert(!fm.exists(p))
    out.close()
    assert(fm.exists(p))
    assert(readAll(fm, p) == "v1")
    // temp is gone
    assert(new java.io.File(dir, "offsets").listFiles().length == 1)
  }

  test("second non-overwrite committer loses silently; content intact") {
    val (fm, dir) = mk()
    val p = new Path(s"${dir.toURI}/commits/7")
    val a = fm.createAtomic(p, overwriteIfPossible = false)
    a.write("first".getBytes); a.close()
    val b = fm.createAtomic(p, overwriteIfPossible = false)
    b.write("second".getBytes); b.close() // must NOT throw (Spark contract)
    assert(readAll(fm, p) == "first")
    assert(new java.io.File(dir, "commits").listFiles().length == 1)
  }

  test("overwriteIfPossible replaces; cancel leaves no residue") {
    val (fm, dir) = mk()
    val p = new Path(s"${dir.toURI}/state/1.delta")
    val a = fm.createAtomic(p, overwriteIfPossible = true)
    a.write("one".getBytes); a.close()
    val b = fm.createAtomic(p, overwriteIfPossible = true)
    b.write("two".getBytes); b.close()
    assert(readAll(fm, p) == "two")
    val c = fm.createAtomic(p, overwriteIfPossible = true)
    c.write("never".getBytes); c.cancel()
    assert(readAll(fm, p) == "two")
    assert(new java.io.File(dir, "state").listFiles().length == 1)
  }

  test("list/mkdirs/delete/open mirror the Hadoop manager semantics") {
    val (fm, dir) = mk()
    val sub = new Path(s"${dir.toURI}/d1/d2")
    fm.mkdirs(sub)
    assert(fm.exists(sub))
    for (i <- 1 to 3) {
      val o = fm.createAtomic(new Path(sub, i.toString), false)
      o.write(("x" * i).getBytes); o.close()
    }
    val all = fm.list(sub)
    assert(all.length == 3)
    assert(all.map(_.getLen).sorted.sameElements(Array(1L, 2L, 3L)))
    val filtered = fm.list(sub, p => p.getName != "2")
    assert(filtered.length == 2)
    // a missing dir throws FileNotFoundException, as HDFSMetadataLog expects
    intercept[java.io.FileNotFoundException] {
      fm.list(new Path(s"${dir.toURI}/absent"))
    }
    intercept[java.io.FileNotFoundException] {
      fm.open(new Path(s"${dir.toURI}/absent/f"))
    }
    fm.delete(new Path(s"${dir.toURI}/d1"))
    assert(!fm.exists(sub))
    // deleting a missing path is a no-op, not an error
    fm.delete(new Path(s"${dir.toURI}/d1"))
    assert(fm.isLocal)
  }

  test("open supports seek and positioned reads (state-store replay path)") {
    val (fm, dir) = mk()
    val p = new Path(s"${dir.toURI}/seekable")
    val o = fm.createAtomic(p, false)
    o.write("0123456789".getBytes); o.close()
    val in = fm.open(p)
    try {
      in.seek(4)
      assert(in.getPos == 4)
      val buf = new Array[Byte](3)
      assert(in.read(buf) == 3)
      assert(new String(buf) == "456")
      val pbuf = new Array[Byte](2)
      in.readFully(1L, pbuf) // positioned read must not disturb getPos
      assert(new String(pbuf) == "12")
      assert(in.getPos == 7)
    } finally in.close()
  }
}
