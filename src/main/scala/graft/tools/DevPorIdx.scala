package graft.tools

/** Dev-only: time the POR checkpoint-index skim against a sequential
  * full decode on the bench file, so SCALING.md's amortization claim
  * carries a measured number. Not part of the driver contract.
  */
object DevPorIdx {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0)
      else "/tmp/graft_bench/_root_testdata_sf0_1_big_v1.por"
    require(new java.io.File(path).exists(), s"missing $path — run Bench first")
    def time[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[poridx] $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm page cache
    time("warm read") {
      val in = new java.io.FileInputStream(path)
      val buf = new Array[Byte](1 << 20)
      try { var n = 0; while ({ n = in.read(buf); n > 0 }) () } finally in.close()
    }
    (1 to 3).foreach { i =>
      val idx = time(s"buildIndex run $i")(
        graft.core.por.PorCore.buildIndex(path, 8192L))
      if (i == 1) println(s"[poridx] rows=${idx.rows} checkpoints=${idx.cps.length}")
    }
    (1 to 3).foreach { i =>
      time(s"full sequential decode run $i") {
        val s = new graft.core.por.PorCore.PorStream(path)
        try {
          val md = graft.core.por.PorCore.parseMeta(s)
          var n = 0L
          var more = true
          while (more) {
            var i2 = 0
            var rowOk = true
            while (rowOk && i2 < md.vars.length) {
              if (md.vars(i2).isString) {
                if (s.maybeString().isEmpty) { rowOk = false }
              } else if (s.maybeDouble().isEmpty) { rowOk = false }
              i2 += 1
            }
            if (rowOk) n += 1 else more = false
          }
          n
        } finally s.close()
      }
    }
  }
}
