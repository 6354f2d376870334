package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** Pig `fs -<cmd> <args>;` utility statements (reference:
  * common/.../HDFSService.scala + op/cmd/HdfsCmd.scala).
  *
  * Backed by the Hadoop FileSystem API from the session's Hadoop conf,
  * so the same code addresses local paths, HDFS, or any mounted
  * `FileSystem` — the reference shells into a `DistributedFileSystem`
  * only. Commands mirror the reference enum: COPYTOLOCAL, COPYTOREMOTE,
  * RM, RMDIR, MKDIR, LS, CAT, GETMERGE. */
object FsOps {

  /** Run one fs command. `ls`/`cat` return their output lines (and print
    * them, matching the reference's console behavior); other commands
    * return Nil. */
  def process(conf: Configuration, cmd: String,
              params: List[String]): Seq[String] = {
    val fs = FileSystem.get(conf)
    def p(s: String) = new Path(s)
    cmd.toLowerCase match {
      case "mkdir" =>
        fs.mkdirs(p(params.head)); Nil
      case "rm" =>
        if (params.head == "-r") fs.delete(p(params(1)), true)
        else fs.delete(p(params.head), false)
        Nil
      case "rmdir" =>
        fs.delete(p(params.head), false); Nil
      case "copytolocal" =>
        fs.copyToLocalFile(p(params.head), p(params(1))); Nil
      case "copytoremote" =>
        fs.copyFromLocalFile(p(params.head), p(params(1))); Nil
      case "getmerge" =>
        // all inputs concatenated into ONE local file (reference
        // mergeToLocal): params = src... dst. Raw byte copy — line-based
        // IO would re-encode in the platform charset, append a newline to
        // files lacking one, and corrupt non-text files
        val dst = params.last
        val out = new java.io.BufferedOutputStream(
          new java.io.FileOutputStream(dst))
        try params.dropRight(1).foreach { src =>
          val in = fs.open(p(src))
          try {
            val buf = new Array[Byte](64 * 1024)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          } finally in.close()
        } finally out.close()
        Nil
      case "ls" =>
        val dir = if (params.isEmpty) "." else params.head
        val lines = fs.listStatus(p(dir)).toSeq.map { st =>
          val kind = if (st.isDirectory) "d" else "-"
          s"$kind ${st.getLen}\t${st.getPath.getName}"
        }
        lines.foreach(println)
        lines
      case "cat" =>
        val in = new java.io.BufferedReader(
          new java.io.InputStreamReader(fs.open(p(params.head)), "UTF-8"))
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        try {
          var line = in.readLine()
          while (line != null) { buf += line; line = in.readLine() }
        } finally in.close()
        buf.foreach(println)
        buf.toSeq
      case other =>
        throw new IllegalArgumentException(s"No such fs command: -$other")
    }
  }
}
