package graft.sources

import java.io.{BufferedWriter, File, FileWriter}

/** Deterministic generator for the m33 raw-text fixture (FIXTURES.md §1).
  *
  * The reference ships its data as git-lfs pointers, so tests synthesize
  * the same shape: `<base>/m33/{cp,nocp}/hmix.a<age 6d>z0790`, each file
  * 3 header lines then `<wavelength>␠␠<flam>` rows (two-space delimiter,
  * leading whitespace on some rows — the view parses with
  * `split(trim(row_str), '  ')`; reference:
  * examples/src/hive/create_m33_schem_view.hql:11).
  *
  * Full-scale is wavelength 3000.00..9999.99 step 0.01 (700k rows/file);
  * the generator takes a row count so tests stay small.
  */
object M33Fixture {

  val ages: Seq[Int] = Seq(11, 12)
  val partitions: Seq[String] = Seq("cp", "nocp")

  /** Deterministic flam value (no RNG state; reproducible everywhere). */
  def flam(wavelengthCents: Long, age: Int, peculiar: Boolean): Double = {
    val h = (wavelengthCents * 31L + age * 7L + (if (peculiar) 13 else 0)) % 999983L
    h.toDouble / 10.0
  }

  /** Full reference scale: wavelength 3000.00..9999.99 step 0.01
    * (700,000 rows/file, 2.8M rows over 4 files — SURVEY §1.3). */
  val fullScaleRows: Int = 700000

  /** Generate the fixture under `base` (idempotent: skips if present).
    * Returns the m33 data root. Files are written in parallel. */
  def generate(base: String, rowsPerFile: Int = 2000): String = {
    val root = new File(base, "m33")
    if (root.exists()) return root.getAbsolutePath
    def writeOne(part: String, age: Int): Unit = {
      val dir = new File(root, part)
      dir.mkdirs()
      val f = new File(dir, f"hmix.a$age%06dz0790")
      val w = new BufferedWriter(new FileWriter(f), 1 << 20)
      try {
        w.write("# synthetic m33 spectral fixture\n")
        w.write("# header line two\n")
        w.write("# header line three\n")
        var i = 0
        while (i < rowsPerFile) {
          val cents = 300000L + i // wavelength*100, from 3000.00
          val wl = cents / 100.0
          val fl = flam(cents, age, part == "cp")
          // odd rows get leading whitespace, exercising trim()
          val pad = if (i % 2 == 1) " " else ""
          w.write(f"$pad$wl%.2f  $fl%.1f\n")
          i += 1
        }
      } finally w.close()
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val jobs = for (part <- partitions; age <- ages) yield (part, age)
    Await.result(
      Future.sequence(jobs.map { case (p, a) => Future(writeOne(p, a)) }),
      Duration.Inf)
    root.getAbsolutePath
  }
}
