package graft

/** Locale-proof number formatting for JSON emission. Scala's `f""`
  * interpolator delegates to the JVM DEFAULT locale, so on a
  * comma-decimal host (e.g. de_DE) `f"$v%.4f"` serializes 6.4 as
  * "6,4000" — invalid JSON in the bench stdout line and every sidecar
  * file. All machine-read output formats through here instead
  * (`Double.toString` is already locale-independent, but fixed-point
  * keeps the records compact and diff-stable).
  */
object Jfmt {
  def num(v: Double, decimals: Int = 4): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
}
