package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout operators: multi-dimensional clustering keys for scan
  * pruning. A 100 TB table filtered on BOTH user and time wants its files
  * clustered so each file covers a compact region of (user, time) — a
  * linear sort covers one dimension and shreds the other; the Z-order
  * (Morton) curve interleaves the dimensions' bits so ranges of the key
  * map to compact rectangles, which is what makes min/max file statistics
  * prune on every dimension at once (the Delta/Iceberg OPTIMIZE ZORDER
  * idea, built here from plain codegen'd bit arithmetic).
  */
object Layout {

  /** 20-bit Morton interleave of two 10-bit dims: bit i of x lands at
    * 2i, bit i of y at 2i+1. Statically unrolled into 20 codegen'd
    * shift/mask terms — no UDF, no loop at runtime. */
  private[graft] def morton10(x: Column, y: Column): Column =
    (0 until 10).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }

  // ---------------------------------------------------------------- q98
  /** Z-order layout audit over events on (user bucket, minute bucket):
    * every event gets its Morton key, and the key space is tiled by the
    * top 8 bits (zkey div 4096 — each tile is one 64×64 block of the
    * (x, y) grid). Per tile: row count and the exact (x, y) bounding box.
    * The Morton property under audit: every tile's bbox is ≤ 64×64 —
    * bounded locality on BOTH dimensions simultaneously — so files
    * written tile-aligned carry tight min/max stats for user AND time
    * predicates. A linear (x, then y) sort gives the same file count but
    * y-spreads of the whole domain, pruning only one dimension.
    *
    * Scale shape: the key is a map-side projection (20 shift/mask terms,
    * whole-stage codegen); the audit is ONE partial-aggregated groupBy on
    * the tile id (≤ 256 groups at any scale). The production write is
    * `repartitionByRange(zkey)` + per-file stats — a cluster-wide range
    * sort, no global window anywhere. */
  def q98ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keyed = Tables(s, dir, "events")
      .withColumn("x", pmod($"user_id", lit(1024L)))
      .withColumn("y", pmod(expr("unix_millis(ts) div 60000"), lit(1024L)))
      .withColumn("zkey", morton10($"x", $"y"))
    keyed
      .withColumn("tile", expr("zkey div 4096"))
      .groupBy($"tile")
      .agg(count(lit(1)).as("n_events"),
        min($"x").as("min_x"), max($"x").as("max_x"),
        min($"y").as("min_y"), max($"y").as("max_y"))
      .withColumn("bbox_area",
        ($"max_x" - $"min_x" + 1L) * ($"max_y" - $"min_y" + 1L))
      .select($"tile", $"n_events", $"min_x", $"max_x", $"min_y", $"max_y",
        $"bbox_area")
      .orderBy($"tile")
  }

  /** The same 20-term interleave, unrolled in SQL. Spark's `/` on longs is
    * integer division only via `div`, so the minute index uses `//` on the
    * DuckDB side and `div`-free cast arithmetic is avoided on both. */
  val q98Oracle: String = {
    def mortonSql(x: String, y: String): String =
      (0 until 10).map { i =>
        s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
      }.mkString(" + ")
    s"""WITH keyed AS (
       |  SELECT ${Sql.pmod("user_id", 1024)} AS x,
       |    ${Sql.pmod("epoch_ms(ts) // 60000", 1024)} AS y
       |  FROM events),
       |zk AS (SELECT x, y, ${mortonSql("x", "y")} AS zkey FROM keyed)
       |SELECT zkey // 4096 AS tile, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
       |  (MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS bbox_area
       |FROM zk GROUP BY 1 ORDER BY tile""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q98_zorder_layout" -> q98ZorderLayout _,
  )

  val oracles: Map[String, String] = Map(
    "q98_zorder_layout" -> q98Oracle,
  )
}
