package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy sequence packing — the pre-training batching step that fits
  * documents into fixed token-budget bins (no reference counterpart;
  * the oracle is the sequential walk itself, mirrored as a recursive
  * CTE in SQL).
  *
  * Contract: rows are walked per key in (orderCols) order; each row
  * joins the current bin if its size still fits under `budget`, else
  * it OPENS a new bin (an oversize single row gets a bin of its own —
  * greedy first-fit-in-order, deterministic given a total order).
  * Bin ids are 0-based per key.
  *
  * Scale shape: `repartition(keys)` + `sortWithinPartitions(keys,
  * order)` + one streaming `mapPartitions` walk — the classic
  * secondary-sort pattern. ONE shuffle, O(1) walk state (current key,
  * running size, bin counter), no group ever materialized, so a key
  * with a billion rows streams through a single task's iterator
  * without buffering. Skewed keys degrade to one long-running task —
  * the inherent cost of a strictly sequential per-key walk; pre-split
  * hot keys by a coarse range column first if that bites.
  */
object Pack {

  /** Append a 0-based `bin_index` column assigning each row to its
    * greedy bin.
    *
    * @param df       input frame
    * @param keyCols  independent packing domains (e.g. language);
    *                 empty = one global domain (single partition —
    *                 only for driver-scale data)
    * @param orderCols total order within a key (make it unique for
    *                 engine-independent determinism)
    * @param sizeCol  per-row size column name (e.g. token count);
    *                 null sizes count as 0 (the row joins the current
    *                 bin for free)
    * @param budget   max total size per bin
    */
  /** Value equality for key tuples: array-valued columns (BinaryType
    * reads back as Array[Byte]) compare by CONTENT — Seq's default
    * `==` would be reference equality there, making every row look
    * like a fresh key and silently zeroing all bins. */
  private def keyEquals(a: Seq[Any], b: Seq[Any]): Boolean =
    a.length == b.length && a.indices.forall { i =>
      (a(i), b(i)) match {
        case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
        case (x: Array[_], y: Array[_]) => x.toSeq == y.toSeq
        case (x, y) => x == y
      }
    }

  def greedyPack(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                 sizeCol: String, budget: Long): DataFrame = {
    require(orderCols.nonEmpty, "greedyPack needs a total order")
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.contains("bin_index"),
      "greedyPack appends 'bin_index' — the input already has that column")
    val sortCols: Seq[Column] = (keyCols ++ orderCols).map(col)
    val arranged =
      if (keyCols.nonEmpty)
        df.repartition(keyCols.map(col): _*).sortWithinPartitions(sortCols: _*)
      else df.repartition(1).sortWithinPartitions(sortCols: _*)
    val schema = StructType(arranged.schema.fields :+
      StructField("bin_index", LongType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val keyIdx = keyCols.map(arranged.schema.fieldIndex)
    val sizeIdx = arranged.schema.fieldIndex(sizeCol)
    arranged.mapPartitions { rows =>
      // O(1) walk state; key change (partition holds many keys) resets
      var curKey: Seq[Any] = null
      var cum = 0L
      var bin = -1L
      rows.map { r =>
        val k = keyIdx.map(r.get)
        val size = r.get(sizeIdx) match {
          case null       => 0L
          case n: Number  => n.longValue()
          case other => throw new IllegalArgumentException(
            s"sizeCol '$sizeCol' must be numeric, got $other")
        }
        if (curKey == null || !keyEquals(k, curKey)) { curKey = k; cum = 0L; bin = -1L }
        if (bin < 0 || cum + size > budget) { bin += 1; cum = size }
        else cum += size
        Row.fromSeq(r.toSeq :+ bin)
      }
    }(enc)
  }
}
