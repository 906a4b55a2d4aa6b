package graft.cli

import org.apache.spark.sql.DataFrame

/** Beeline-parity table rendering — the reference's de-facto acceptance
  * artifact is a golden log of `+---+`-boxed beeline tables (reference:
  * examples/example-output.log:831-935, 1035-1139), so result display
  * reproduces that format byte-for-byte:
  *
  *   - `table.column` headers when a table prefix is known;
  *   - `+---+` borders sized to max(header, widest value) + padding
  *     (one leading, at least two trailing spaces per cell);
  *   - Hive value rendering: Java toString semantics for doubles
  *     (`3000.00` parses and re-renders as `3000.0` — the float
  *     canonicalization the golden log exhibits), `NULL` for nulls.
  *
  * Driver-side by design: this renders interactive LIMIT-style results
  * (the golden log's queries are all `LIMIT 100`), never a full table.
  */
object Render {

  /** Hive/beeline scalar rendering. */
  def cell(v: Any): String = v match {
    case null => "NULL"
    case d: java.lang.Double => d.toString
    case f: java.lang.Float => f.toString
    case x => x.toString
  }

  /** Render `df` as a beeline-style boxed table. `tablePrefix`, when
    * given, qualifies headers the way beeline's ResultSet metadata does
    * (`m33_schem.age_mil`). Caps at `maxRows` like the CLI's display
    * path — rendering is for humans, not for data movement. */
  def box(df: DataFrame, tablePrefix: Option[String] = None, maxRows: Int = 100): String = {
    val headers = df.columns.map(c => tablePrefix.fold(c)(p => s"$p.$c")).toSeq
    val rows = df.limit(maxRows).collect()
      .map(r => (0 until r.length).map(i => cell(r.get(i))).toSeq).toSeq
    val widths = headers.indices.map { i =>
      (headers(i).length +: rows.map(_(i).length)).max + 3
    }
    val border = widths.map("-" * _).mkString("+", "+", "+")
    def line(cells: Seq[String]) =
      cells.zip(widths).map { case (c, w) => (" " + c).padTo(w, ' ') }
        .mkString("|", "|", "|")
    (Seq(border, line(headers), border) ++ rows.map(line) :+ border)
      .mkString("\n")
  }
}
