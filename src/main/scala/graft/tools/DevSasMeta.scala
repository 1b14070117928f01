package graft.tools
object DevSasMeta {
  def main(args: Array[String]): Unit = {
    new java.io.File(args(0)).listFiles().sortBy(_.getName).foreach { f =>
      if (f.getName.endsWith(".sas7bdat")) {
        try {
          val md = graft.core.sas.SasCore.parse(f.getAbsolutePath)
          println(s"${f.getName}: rows=${md.rowCount} rowLen=${md.rowLength} cols=${md.columns.length} comp=${md.compression} pages=${md.pageCount} bit64=${md.bit64} little=${md.little} mixRows=${md.mixDataRows}")
        } catch { case e: Exception => println(s"${f.getName}: FAIL ${e.getMessage}") }
      }
    }
  }
}
