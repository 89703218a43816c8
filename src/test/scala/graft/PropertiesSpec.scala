package graft

import graft.core.{sel, CrysFrame}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SC}

/** ScalaCheck property suite (SURVEY §5): algebraic invariants the
  * verbs must hold on arbitrary small frames — the complement of the
  * example-based reference-port specs. Each property runs real Spark
  * jobs, so the per-property case count is kept small. */
class PropertiesSpec extends GraftSpec {

  private def check(name: String, cases: Int = 6)(p: Prop): Unit = {
    val res = SC.check(
      SC.Parameters.default.withMinSuccessfulTests(cases).withWorkers(1), p)
    assert(res.passed, s"$name: $res")
  }

  private val genRows: Gen[List[(Int, Int, String)]] = for {
    n <- Gen.choose(1, 10)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0, 99)
      v <- Gen.choose(-5, 5)
      s <- Gen.oneOf("a", "b", "c")
    } yield (id, v, s))
  } yield rows

  private def frame(rows: List[(Int, Int, String)]): CrysFrame =
    CrysFrame.of(spark, Seq("id", "v", "s"),
      rows.map(r => Seq(r._1, r._2, r._3)))

  test("property: spread∘gather is the identity on wide frames") {
    check("spread.gather") {
      Prop.forAll(genRows) { rows0 =>
        // unique ids — pivot keys must be unique per row
        val rows = rows0.zipWithIndex.map { case ((_, v, s), i) => (i, v, s) }
        val wide = frame(rows)
        val back = wide
          .gather("key", "value", sel.listOf("v"))
          .spread("key", "value")
        val a = wide.out.select(col("id"), col("v").cast("double"), col("s"))
          .collect().map(_.toSeq).toSet
        val b = back.out.select(col("id"), col("v"), col("s"))
          .collect().map(_.toSeq).toSet
        a == b
      }
    }
  }

  test("property: sortBy is stable — ties keep ingest order") {
    check("sort.stable") {
      Prop.forAll(genRows) { rows =>
        val sorted = frame(rows).withRowOrder.sortBy("s").out
          .collect().map(r => (r.getString(2), r.getInt(0), r.getInt(1))).toList
        // within each tie-group the (id, v) pairs appear in ingest order
        val expected = rows.zipWithIndex
          .sortBy { case ((_, _, s), i) => (s, i) }
          .map { case ((id, v, s), _) => (s, id, v) }
        sorted == expected
      }
    }
  }

  test("property: semi and anti joins partition the left side") {
    check("semi.anti.partition") {
      Prop.forAll(genRows, genRows) { (l, r) =>
        val lf = frame(l)
        val rf = frame(r).select("s")
        val semi = lf.semiJoin(rf, by = Seq("s")).numRow
        val anti = lf.antiJoin(rf, by = Seq("s")).numRow
        semi + anti == lf.numRow
      }
    }
  }

  test("property: left join with a key-unique right preserves left cardinality") {
    check("left.join.card") {
      Prop.forAll(genRows, genRows) { (l, r) =>
        val lf = frame(l)
        val rf = frame(r).distinct("s").select("s").addColumn("tag")(c => c.const(1))
        lf.leftJoin(rf, by = Seq("s")).numRow == lf.numRow
      }
    }
  }

  test("property: bindRows cardinality is additive, names are the union") {
    check("bindRows.additive") {
      Prop.forAll(genRows, genRows) { (a, b) =>
        val fa = frame(a)
        val fb = frame(b).rename("v" -> "w")
        val bound = fa.bindRows(fb)
        bound.numRow == fa.numRow + fb.numRow &&
          bound.names.toSet == Set("id", "v", "s", "w")
      }
    }
  }

  test("property: distinct is idempotent and a subset; take bounds cardinality") {
    check("distinct.take") {
      Prop.forAll(genRows) { rows =>
        val f = frame(rows)
        val d1 = f.distinct("s")
        val within = d1.numRow == d1.distinct("s").numRow && d1.numRow <= f.numRow
        val n = 3
        within && f.withRowOrder.take(n).numRow == math.min(n.toLong, f.numRow)
      }
    }
  }

  test("property: MP3 walk recovers frames/duration/bitrate of arbitrary VBR streams") {
    // pure-JVM property (no Spark jobs): serialize random VALID frame
    // sequences from the PUBLIC header tables (ISO/IEC 11172-3 —
    // restated here independently of the implementation) and require
    // the walker to recover the exact frame count, per-frame-summed
    // duration, and mean bitrate. Fixed version/layer/rate per stream
    // (like real files), per-frame bitrate + padding (VBR).
    import graft.multimodal.Mp3
    val brTables = Map( // (mpeg1, layer) -> kbps by header index
      (true, 3)  -> Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448, 0),
      (true, 2)  -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 0),
      (true, 1)  -> Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0),
      (false, 3) -> Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256, 0),
      (false, 2) -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0),
      (false, 1) -> Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0))
    val genStream = for {
      ver <- Gen.oneOf(3, 2, 0)      // MPEG1 / MPEG2 / MPEG2.5
      layer <- Gen.oneOf(3, 2, 1)    // I / II / III
      srIdx <- Gen.choose(0, 2)
      n <- Gen.choose(3, 20)
      brs <- Gen.listOfN(n, Gen.choose(1, 14))
      pads <- Gen.listOfN(n, Gen.choose(0, 1))
      seed <- Gen.choose(1L, Long.MaxValue)
    } yield (ver, layer, srIdx, brs, pads, seed)
    check("mp3.walk", cases = 40) {
      Prop.forAll(genStream) { case (ver, layer, srIdx, brs, pads, seed) =>
        val mpeg1 = ver == 3
        val rate = Array(44100, 48000, 32000)(srIdx) >>
          (if (ver == 3) 0 else if (ver == 2) 1 else 2)
        val out = new java.io.ByteArrayOutputStream()
        var rng = seed
        var expDur = 0.0
        brs.zip(pads).foreach { case (brIdx, pad) =>
          val kbps = brTables((mpeg1, layer))(brIdx)
          val (samples, len) = layer match {
            case 3 => (384, (12 * kbps * 1000 / rate + pad) * 4)
            case 2 => (1152, 144 * kbps * 1000 / rate + pad)
            case _ => if (mpeg1) (1152, 144 * kbps * 1000 / rate + pad)
                      else (576, 72 * kbps * 1000 / rate + pad)
          }
          expDur += samples * 1000.0 / rate
          out.write(0xFF)
          out.write(0xE0 | (ver << 3) | (layer << 1) | 1)
          out.write((brIdx << 4) | (srIdx << 2) | (pad << 1))
          out.write(0x44)
          var j = 4
          while (j < len) {
            rng ^= rng << 13; rng ^= rng >>> 7; rng ^= rng << 17
            out.write((rng & 0xff).toInt)
            j += 1
          }
        }
        val got = Mp3.walk(out.toByteArray)
        got != null &&
          got._1 == brs.length &&
          got._2 == math.round(expDur) &&
          got._3 == brs.map(i => brTables((mpeg1, layer))(i).toLong).sum / brs.length &&
          got._4 == rate
      }
    }
  }
}
