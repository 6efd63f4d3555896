package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd vector primitives for the similarity/dedup operators.
  *
  * The `aggregate(zip_with(...))` higher-order-function form allocates an
  * intermediate array per row pair — measured ~6× slower on the sf0.1
  * brute-force cosine pass. These expressions loop over the unsafe
  * ArrayData in place and stay inside whole-stage codegen.
  *
  * Inputs must be array<double> (resp. array<bigint>) with no null
  * elements — guaranteed by the fixture loaders; behavior on null
  * elements is undefined (skipped null checks keep the inner loop tight).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Count of positions where two bigint arrays hold equal values — the
  * MinHash signature-agreement estimator. */
case class ArrayEqualCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_array_eq_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayEqualCount =
    copy(left = l, right = r)
}

/** Intersection size of two SORTED bigint arrays (distinct elements) via
  * a two-pointer merge — the exact-Jaccard verification kernel: per
  * candidate pair one linear pass over two pre-sorted gram-hash sets,
  * replacing an exploded gram join + groupBy. */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** PQ asymmetric-distance (ADC) score: for a code row `codes[i] ∈
  * [0, k)` (one 4-bit centroid id per subspace) and a per-query lookup
  * table `tab` flattened as tab[i*k + cid] = dot(query sub-vector i,
  * centroid cid of subspace i), the approximate inner product is
  * Σ_i tab[i*k + codes[i]] — M array reads per candidate, no
  * multiplies. The FAISS ADC kernel as a whole-stage-codegen
  * expression; the HOF `aggregate(...)` form interprets per element
  * and allocates, which matters when every probed cell's codes flow
  * through this per query batch. */
case class AdcScore(left: Expression, right: Expression, k: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_score"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val tab = b.asInstanceOf[ArrayData]
    val n = codes.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += tab.getDouble(i * k + codes.getInt(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $b.getDouble($i * $k + $a.getInt($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AdcScore =
    copy(left = l, right = r)
}

/** Whole PQ encode of one vector as ONE codegen'd expression: for each
  * of the `mCount` subspaces, the argmax centroid of `dot(u_m, cv) -
  * dot(cv, cv)/2` over the frozen codebooks (u = v/nrm, u_m its m-th
  * `subDim`-slice) — the full M-element code array per row, no explode,
  * no codebook join, no per-(vec, m) aggregation. The distributed form
  * this replaces (sub-vector explode → broadcast codebook join →
  * `max_by(cid, struct(score, -cid))` groupBy → code-array fold) put
  * TWO corpus-scale exchanges inside every encode pass — the single
  * largest live-shuffle term of the composed-index landing (NOTES
  * round-17 #1); this expression makes encode scan-bound. The write-
  * path posture of the reference's batched flush
  * (kafka-client/src/main/java/dev/responsive/kafka/internal/stores/CommitBuffer.java:336-439)
  * done at the planner level: per-row work against driver-frozen state.
  *
  * BIT-IDENTICAL to the distributed form by construction, including the
  * tie-break (PqEncodeSpec pins every clause):
  *  - u(i) = v(i)/nrm, then product — the same double ops, same order,
  *    as `transform(v, x -> x / nrm)` feeding [[DotProduct]];
  *  - per-slot `half` = dot(cv, cv)/2 precomputed once at construction
  *    with the same ascending accumulation (doubles are deterministic:
  *    one evaluation equals every per-row re-evaluation);
  *  - the argmax replicates Spark's `max_by(cid, struct(score, -cid))`
  *    double ordering (SQLOrderingUtil: NaN greatest, NaN == NaN,
  *    -0.0 == 0.0): ascending-cid scan, replace on STRICTLY greater —
  *    equal scores keep the smaller cid;
  *  - a vector shorter than `mCount·subDim` dots only the elements its
  *    `slice` would carry (the distributed form's min-length loop).
  *
  * Codebook slots are constructor data, not children — broadcast to
  * executors inside the serialized expression (KBs: M·K·subDim
  * doubles), referenced from generated code via `addReferenceObj`.
  * `offsets(m)..offsets(m+1)` spans subspace m's slots in ascending-cid
  * order (lloyd may drop empty clusters, so slots per m can be < K and
  * cids non-contiguous — [[PqEncodeCodes.fromCodebooks]] preserves
  * exactly the rows the codebook join would have matched). */
case class PqEncodeCodes(
    left: Expression, right: Expression,
    cvs: Array[Double], cids: Array[Int], halfs: Array[Double],
    offsets: Array[Int], subDim: Int) extends BinaryExpression {
  private def mCount: Int = offsets.length - 1
  // elements are never null, but the DECLARED type keeps containsNull
  // (matching the collect_list-fold form this replaced): landed code
  // tables and their `ARRAY<INT>` catalog DDL round-trip as
  // containsNull=true, and appendBucketed requires exact dataType
  // equality against the catalog — a false here would reject every
  // maintenance append to a pre-round-17 (or reuse-registered) table
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val nrm = b.asInstanceOf[Double]
    val len = v.numElements()
    val codes = new Array[Int](mCount)
    var m = 0
    while (m < mCount) {
      val base = m * subDim
      var lim = len - base
      if (lim < 0) lim = 0 else if (lim > subDim) lim = subDim
      var bestScore = 0.0
      var bestCid = 0
      var first = true
      var s = offsets(m)
      while (s < offsets(m + 1)) {
        var acc = 0.0
        var i = 0
        while (i < lim) { acc += (v.getDouble(base + i) / nrm) * cvs(s * subDim + i); i += 1 }
        val score = acc - halfs(s)
        val gt =
          if (first) true
          else if (java.lang.Double.isNaN(score)) !java.lang.Double.isNaN(bestScore)
          else !java.lang.Double.isNaN(bestScore) && score > bestScore
        if (gt) { bestScore = score; bestCid = cids(s) }
        first = false
        s += 1
      }
      codes(m) = bestCid
      m += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cvsRef = ctx.addReferenceObj("pqCvs", cvs, "double[]")
      val cidsRef = ctx.addReferenceObj("pqCids", cids, "int[]")
      val halfsRef = ctx.addReferenceObj("pqHalfs", halfs, "double[]")
      val offsRef = ctx.addReferenceObj("pqOffs", offsets, "int[]")
      val len = ctx.freshName("len")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val base = ctx.freshName("base")
      val lim = ctx.freshName("lim")
      val bestScore = ctx.freshName("bestScore")
      val bestCid = ctx.freshName("bestCid")
      val first = ctx.freshName("first")
      val slot = ctx.freshName("slot")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val score = ctx.freshName("score")
      val gt = ctx.freshName("gt")
      s"""
         |int $len = $a.numElements();
         |int[] $codes = new int[${mCount}];
         |for (int $m = 0; $m < ${mCount}; $m++) {
         |  int $base = $m * $subDim;
         |  int $lim = $len - $base;
         |  if ($lim < 0) $lim = 0; else if ($lim > $subDim) $lim = $subDim;
         |  double $bestScore = 0.0;
         |  int $bestCid = 0;
         |  boolean $first = true;
         |  for (int $slot = $offsRef[$m]; $slot < $offsRef[$m + 1]; $slot++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $acc += ($a.getDouble($base + $i) / $b) * $cvsRef[$slot * $subDim + $i];
         |    }
         |    double $score = $acc - $halfsRef[$slot];
         |    boolean $gt;
         |    if ($first) { $gt = true; }
         |    else if (java.lang.Double.isNaN($score)) { $gt = !java.lang.Double.isNaN($bestScore); }
         |    else { $gt = !java.lang.Double.isNaN($bestScore) && $score > $bestScore; }
         |    if ($gt) { $bestScore = $score; $bestCid = $cidsRef[$slot]; }
         |    $first = false;
         |  }
         |  $codes[$m] = $bestCid;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncodeCodes =
    copy(left = l, right = r)
}

object PqEncodeCodes {
  /** Pack `(m, cid, cv)` codebooks into the expression's flat arrays:
    * slots grouped by subspace, ascending cid within each. Every
    * subspace in `[0, mCount)` must hold at least one centroid (a code
    * array with a hole would misalign [[AdcScore]]'s positional read). */
  def fromCodebooks(
      vec: Column, nrm: Column,
      books: Seq[(Int, Int, Array[Double])], mCount: Int, subDim: Int): Column = {
    val byM = books.groupBy(_._1)
    require((0 until mCount).forall(m => byM.get(m).exists(_.nonEmpty)),
      s"pq codebooks must cover all $mCount subspaces")
    val slots = (0 until mCount).map(m => byM(m).sortBy(_._2))
    val offsets = slots.scanLeft(0)(_ + _.length).toArray
    val flat = slots.flatten
    flat.foreach { case (_, _, cv) =>
      require(cv.length == subDim, s"centroid dim ${cv.length} != $subDim")
    }
    val cvs = new Array[Double](flat.length * subDim)
    val cids = new Array[Int](flat.length)
    val halfs = new Array[Double](flat.length)
    flat.zipWithIndex.foreach { case ((_, cid, cv), s) =>
      System.arraycopy(cv, 0, cvs, s * subDim, subDim)
      cids(s) = cid
      // same ascending accumulation as DotProduct(cv, cv), then /2 —
      // the exact double the distributed form recomputes per row
      var acc = 0.0
      var i = 0
      while (i < subDim) { acc += cv(i) * cv(i); i += 1 }
      halfs(s) = acc / 2
    }
    ColumnBridge.column(PqEncodeCodes(
      ColumnBridge.expression(vec), ColumnBridge.expression(nrm),
      cvs, cids, halfs, offsets, subDim))
  }
}

object VectorExprs {
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def eqCount(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayEqualCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedIntersect(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def adcScore(codes: Column, tab: Column, k: Int): Column =
    ColumnBridge.column(AdcScore(ColumnBridge.expression(codes), ColumnBridge.expression(tab), k))
}
