package graft.tools
object DevCat {
  def main(args: Array[String]): Unit = {
    val cat = graft.core.sas.SasCatalog.read(args(0))
    println(s"n_formats=${cat.numeric.size + cat.string.size}")
    Seq("REGIONF", "SEXF", "LEVELF", "YESNO", "ORIENTF").foreach { f =>
      if (cat.numeric.contains(f))
        println(s"$f: " + cat.numeric(f).toSeq.sortBy(_._1).take(6))
    }
    println("string formats: " + cat.string.keys.toSeq.sorted.take(5))
  }
}
