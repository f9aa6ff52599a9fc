package graft

import java.nio.file.Files
import graft.sources.ClassDim

/** S2 + SURVEY §1.3 quirk: the class-dim loader assigns positional ids and
  * trims CR from CRLF checkouts (the reference's `classes[id] == "person"`
  * gate silently fails on CRLF without the trim). */
class ClassDimSpec extends SparkSpec {

  test("CRLF class file loads trimmed with positional ids") {
    val f = Files.createTempFile("classes", ".names")
    Files.write(f, "person\r\nbicycle\r\ncar\r\nfire\r\n".getBytes("UTF-8"))
    val dim = ClassDim.load(spark, f.toString).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(dim.toSeq == Seq((0, "person"), (1, "bicycle"), (2, "car"), (3, "fire")))
    // the intended reference gate now holds: id 0 IS "person" (main.py:211)
    assert(dim.find(_._2 == "person").map(_._1).contains(0))
  }

  test("LF file behaves identically") {
    val f = Files.createTempFile("classes_lf", ".names")
    Files.write(f, "person\nbicycle\n".getBytes("UTF-8"))
    val dim = ClassDim.load(spark, f.toString).collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(dim.toSeq == Seq((0, "person"), (1, "bicycle")))
  }
}
