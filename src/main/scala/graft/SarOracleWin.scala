package graft

/**
 * Shared low-fragmentation SQL building blocks for the DuckDB oracles.
 *
 * Round-3 postmortem: the driver runs every oracle sequentially in ONE DuckDB
 * process; the window oracles written as `pixels CROSS JOIN offsets LEFT JOIN
 * pixels` fragmented the allocator — q_pol_cloude alone left 62k mmap regions,
 * hitting the kernel's vm.max_map_count cap (65530) and poisoning every query
 * after it alphabetically (the 60 forfeited rows of CORRECTNESS_r03). The fix:
 * neighborhood sums as two separable window-function passes (x then y) over the
 * dense per-burst raster — no joins, streaming sorts, O(rows) memory.
 *
 * Exactness: all windowed addends are dyadic-rational doubles with well under 53
 * significand bits (inputs are snapped to the 2^-12 grid, products/sums stay
 * exact), so every partial sum is exactly representable and the two-pass
 * association is bit-identical to the join-based 2-D sum it replaces.
 */
object SarOracleWin {

  private val Keys = "scene_id, subswath, pol, burst_idx, tile_y, tile_x, gx, gy"

  /**
   * Separable (2m+1)x(2m+1) window sums over a dense raster CTE `src`.
   *
   * `src` must expose the 8 key/coord columns, a BOOLEAN `valid`, and the value
   * columns referenced by `sums`. Emits CTE `out` with the keys, `valid`, a
   * BIGINT `n` (count of valid cells in the window), and one DOUBLE column per
   * (expr, alias) in `sums` — the expr is gated on `valid` (invalid cells add
   * 0.0, exactly as the old `FILTER (n.valid)` join form).
   *
   * `carry` columns are passed through from the center pixel unchanged.
   * `ungated` sums are NOT masked by `valid` (e.g. a co-registered slope raster
   * that is present on every cell regardless of the SLC no-data mask).
   */
  def sepWin(
      src: String,
      out: String,
      m: Int,
      sums: Seq[(String, String)],
      carry: Seq[String] = Nil,
      ungated: Seq[(String, String)] = Nil): String = {
    val carrySel = if (carry.isEmpty) "" else carry.mkString(", ", ", ", "")
    val xGated = sums.map { case (e, a) =>
      s"sum(CASE WHEN valid THEN ($e) ELSE 0.0 END) OVER wx AS x_$a"
    }
    val xUngated = ungated.map { case (e, a) => s"sum($e) OVER wx AS x_$a" }
    val xCols = (xGated ++ xUngated).mkString(",\n    ")
    val yCols = (sums ++ ungated).map { case (_, a) => s"sum(x_$a) OVER wy AS $a" }.mkString(",\n    ")
    s"""${out}_x AS (
       |  SELECT $Keys, valid$carrySel,
       |    sum(CASE WHEN valid THEN 1.0 ELSE 0.0 END) OVER wx AS x_nv,
       |    $xCols
       |  FROM $src
       |  WINDOW wx AS (PARTITION BY scene_id, subswath, pol, burst_idx, gy
       |                ORDER BY gx ROWS BETWEEN $m PRECEDING AND $m FOLLOWING)),
       |$out AS (
       |  SELECT $Keys, valid$carrySel,
       |    CAST(sum(x_nv) OVER wy AS BIGINT) AS n,
       |    $yCols
       |  FROM ${out}_x
       |  WINDOW wy AS (PARTITION BY scene_id, subswath, pol, burst_idx, gx
       |                ORDER BY gy ROWS BETWEEN $m PRECEDING AND $m FOLLOWING))""".stripMargin
  }

  /**
   * Force every CTE stage of an oracle to materialize (`name AS MATERIALIZED
   * (SELECT ...)`) instead of being inlined by DuckDB's optimizer.
   *
   * The long staged pipelines (Cardano eigen → eigenvector → phase-align, the
   * dual-pol percentile stack, …) reference each prior stage's columns several
   * times; inlining substitutes the whole expression tree at each reference, so
   * tree size grows multiplicatively with stage depth — q_pol_cloude planned to
   * 13 GB of allocations and 65k mmap regions at DuckDB's default thread count,
   * poisoning the driver's single-process sequential run (round-3 postmortem).
   * Materializing each stage (all stages are tiny — ≤2M rows of a few doubles)
   * keeps planning linear: 76 s / 65k maps / 13 GB → 0.8 s / 358 maps / 0.6 GB.
   *
   * Values are unchanged — stages compute the exact same IEEE operation
   * sequence; only the substitution of expressions is stopped. The regex only
   * rewrites `name AS (SELECT`, so WINDOW clause definitions (`w AS
   * (PARTITION …)`) and column aliases are untouched.
   *
   * Opt-out: a builder can write `name AS /*pipelined*/ (SELECT …)` for a CTE
   * whose result is huge but streamed once (a wide join feeding a single
   * aggregate) — the comment breaks the regex match, keeping that stage lazy.
   */
  def materializeCtes(sql: String): String =
    sql.replaceAll("""(\b[A-Za-z_][A-Za-z0-9_]*) AS \((\s*)SELECT""", "$1 AS MATERIALIZED ($2SELECT")
}

/** Dump SparkEntry.oracleSql to a JSON file WITHOUT running any Spark query —
 * dev tool for fast oracle-rewrite iteration against DuckDB. */
object DumpOracles {
  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "/tmp/oracle_sql_new.json"
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json)
    println(s"wrote ${SparkEntry.oracleSql.size} oracle SQLs to $out")
  }
}
