package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Linear-time exponentially weighted moving average over an ordered
  * series — the scale-safe alternative to the triangular self-join
  * spelling (q141), whose cost is O(n²) in the series length and is
  * only acceptable because that query's grain is ~90 days. For
  * multi-year or per-key series the quadratic spelling explodes; this
  * one is O(n · 1) distributed work plus an O(n / segLen) driver fold.
  *
  * Recurrence (pandas `adjust=False` convention):
  *   ewma_1 = x_1;  ewma_i = α·x_i + (1-α)·ewma_{i-1}
  * whose closed form is S_i = Σ_j z_j·q^(i-j) with q = 1-α and
  * z_1 = x_1, z_j = α·x_j (j>1).
  *
  * Decomposition — a segmented, RESCALED prefix sum (PrefixScan's
  * two-level shape, specialized to the geometric-decay kernel):
  *   1. i = row_number per key (the series index), seg = (i-1)/segLen,
  *      pos = (i-1) mod segLen;
  *   2. local_i = q^pos · Σ_{j in seg, j≤i} (z_j · q^(-pos_j)) — ONE
  *      window per (keys, seg), no join. Rescaling by q^(-pos) turns
  *      the decay kernel into a plain cumsum; bounding pos < segLen
  *      bounds the rescale factor at q^(-(segLen-1)) (~5.6e9 at the
  *      default q=0.7, segLen=64), which is what keeps the arithmetic
  *      inside double's exact range — the UNsegmented rescaled cumsum
  *      overflows at i ≈ 2000;
  *   3. carry: E_s (the full prefix value at the END of segment s)
  *      obeys E_s = lastLocal_s + q^len_s · E_{s-1} — a sequential
  *      recurrence over ≤ n/segLen segment totals per key, folded on
  *      the driver and rejoined as a literal-map lookup (PrefixScan's
  *      spelling: a map literal leaves nothing for the planner's
  *      relation dedup to mis-bind, unlike rejoining the frame).
  * Final: ewma_i = local_i + q^(pos+1) · E_{seg-1}.
  *
  * Contract: (keys, orderCol) distinct; null values contribute 0 (the
  * window sum skips them, matching "a missing observation leaves the
  * average decaying"). The input is expected at SERIES grain (e.g.
  * day-grain after a fact-scale pre-aggregation) — the carry map
  * holds |keys|·(n/segLen) entries and fails loudly above the same
  * 4096-entry literal budget PrefixScan enforces. The driver fold
  * itself groups those ≤ 4096 collected rows by coded key and walks
  * each key's segments in order — O(budget · log budget) driver time
  * and O(budget) memory, bounded by the constant, never by |input|.
  */
object Ewma {

  private val maxCarry = 1 << 12

  // length-prefix coded composite key — PrefixScan.scala's coding, so
  // the collect side and the probe side can never disagree and no key
  // CONTENT can collide with a separator ("N" for null; a value
  // component always starts with a digit)
  private def code(cols: Seq[Column]): Column = concat(
    cols.map { k =>
      val s = k.cast("string")
      when(s.isNull, lit("N")).otherwise(concat(length(s), lit(":"), s))
    }: _*)

  private def codeValue(v: Any): String =
    if (v == null) "N" else { val s = v.toString; s"${s.length}:$s" }

  def linear(df: DataFrame, keys: Seq[String], orderCol: String,
             valueCol: String, alpha: Double, out: String,
             segLen: Int = 64): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(segLen >= 2 && segLen <= 512,
      s"segLen must be in [2,512] (bounds the q^(-pos) rescale), got $segLen")
    // alpha = 1 means no memory at all: ewma_i = x_i (0 for a null
    // observation). Short-circuited BEFORE the rescale machinery —
    // q = 0 makes q^(-pos) infinite, so the general path would turn an
    // in-contract parameter into silent NaNs.
    if (alpha == 1.0)
      return df.withColumn(out, coalesce(col(valueCol).cast("double"), lit(0.0)))
    val q = 1.0 - alpha
    // Joint (alpha, segLen) validation: the segment rescale peaks at
    // q^(-(segLen-1)); if that overflows double, every row past a
    // segment's first silently becomes 0·Inf = NaN. Fail loudly with
    // the largest segLen this q admits instead.
    val rescaleMax = math.pow(q, -(segLen - 1).toDouble)
    require(java.lang.Double.isFinite(rescaleMax), {
      val maxSeg = 1 + (math.log(Double.MaxValue) / -math.log(q)).toInt
      s"alpha=$alpha with segLen=$segLen overflows the q^(-(segLen-1)) " +
        s"rescale (q=$q); use segLen <= ${math.min(512, maxSeg)}"
    })
    val keyCols = keys.map(col)
    // keyless series: pin the index window's partition spec to a
    // constant (WindowPins.gpin) — same single group over the
    // grain-collapsed series frame, but the spec stays DEFINED, so
    // WindowExec doesn't warn and plan audits can tell this bounded
    // spine from a corpus-grain funnel. Keyed series partition as-is.
    val wKey =
      if (keyCols.isEmpty)
        Window.partitionBy(graft.functions.WindowPins.gpin(col(orderCol)))
          .orderBy(col(orderCol))
      else Window.partitionBy(keyCols: _*).orderBy(col(orderCol))
    val z = when(col(valueCol).isNull, lit(0.0))
      .otherwise(col(valueCol).cast("double") *
        when(col("__e_i") === 1, lit(1.0)).otherwise(lit(alpha)))
    val base = df
      .withColumn("__e_i", row_number().over(wKey).cast("long"))
      // `div`, not `/`: Spark's `/` is double division even on longs
      .withColumn("__e_seg", expr(s"(__e_i - 1) div $segLen"))
      .withColumn("__e_pos", (col("__e_i") - 1) % segLen)
      .withColumn("__e_z", z)
    val wSeg = Window.partitionBy(keyCols :+ col("__e_seg"): _*)
      .orderBy(col("__e_i")).rowsBetween(Window.unboundedPreceding, 0)
    val local = base
      .withColumn("__e_local",
        pow(lit(q), col("__e_pos")) *
          sum(col("__e_z") * pow(lit(q), -col("__e_pos"))).over(wSeg))

    // per-(keys, seg) totals: the value at the segment's LAST row and
    // the segment length — ≤ n/segLen rows per key, its own action
    val segTotals = local.groupBy(keyCols :+ col("__e_seg"): _*)
      .agg(max_by(col("__e_local"), col("__e_i")).as("__e_last"),
           count(lit(1)).as("__e_len"))
      .select(code(keyCols).as("__e_k"), col("__e_seg"),
              col("__e_last"), col("__e_len"))
    val rows = segTotals.limit(maxCarry + 1).collect()
    require(rows.length <= maxCarry,
      s"Ewma carry exceeds the literal-map budget ($maxCarry segment " +
        "entries): pre-aggregate to series grain or raise segLen")

    // sequential fold per key: E_s = last_s + q^len_s · E_{s-1};
    // carryInto(s) = E_{s-1} (absent for seg 0 → lookup null → 0)
    val entries = rows.groupBy(_.getString(0)).toSeq.flatMap {
      case (k, segs) =>
        var e = 0.0
        segs.sortBy(_.getLong(1)).flatMap { r =>
          val seg = r.getLong(1)
          val into = e
          e = r.getDouble(2) + math.pow(q, r.getLong(3).toDouble) * e
          if (seg == 0L) None
          else Some((k + codeValue(seg), into))
        }
    }.filter(_._2 != 0.0)
    val lookupKey = code(keyCols :+ col("__e_seg"))
    val carry =
      if (entries.isEmpty) lit(0.0)
      else coalesce(try_element_at(
        map(entries.flatMap(e => Seq(lit(e._1), lit(e._2))): _*), lookupKey),
        lit(0.0))
    local
      .withColumn(out,
        col("__e_local") + pow(lit(q), col("__e_pos") + 1) * carry)
      .drop("__e_i", "__e_seg", "__e_pos", "__e_z", "__e_local")
  }
}
