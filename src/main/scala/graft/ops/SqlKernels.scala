package graft.ops

/** Shared DuckDB SQL fragments for the engine-portable hash kernels —
  * single source of truth for the trickiest oracle arithmetic (used by the
  * dedup_simhash and split_assign oracles; mirrors
  * [[graft.functions.SplitMix64.kernel]]). */
object SqlKernels {

  /** The splitmix64 chain as CTE steps `<p>1..<p>6` over an input relation
    * `src` exposing `($carry, z)` with z an unsigned-64 value in HUGEINT;
    * `<p>6` yields the mixed value in column `z` (HUGEINT, unsigned
    * domain). Wrapping 64-bit multiplies are split 32/32 so no
    * intermediate exceeds 128 bits; xors route through UBIGINT casts.
    * Row multiplicity is preserved — `carry` lists the columns to keep. */
  def smixCtes(p: String, src: String, carry: String): String =
    s"""${p}1 AS (SELECT $carry, (z + 11400714819323198485) % 18446744073709551616 AS z FROM $src),
       |${p}2 AS (SELECT $carry, CAST(xor(CAST(z AS UBIGINT), CAST(z // 1073741824 AS UBIGINT)) AS HUGEINT) AS z FROM ${p}1),
       |${p}3 AS (SELECT $carry, ((z % 4294967296) * 13787848793156543929
       |        + ((z // 4294967296) * 13787848793156543929 % 4294967296) * 4294967296)
       |        % 18446744073709551616 AS z FROM ${p}2),
       |${p}4 AS (SELECT $carry, CAST(xor(CAST(z AS UBIGINT), CAST(z // 134217728 AS UBIGINT)) AS HUGEINT) AS z FROM ${p}3),
       |${p}5 AS (SELECT $carry, ((z % 4294967296) * 10723151780598845931
       |        + ((z // 4294967296) * 10723151780598845931 % 4294967296) * 4294967296)
       |        % 18446744073709551616 AS z FROM ${p}4),
       |${p}6 AS (SELECT $carry, CAST(xor(CAST(z AS UBIGINT), CAST(z // 2147483648 AS UBIGINT)) AS HUGEINT) AS z FROM ${p}5)""".stripMargin
}
