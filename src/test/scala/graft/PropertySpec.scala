package graft

import graft.functions.{RollingHash, SketchAggs, VectorExprs, XorChecksum}
import org.apache.spark.sql.functions._

/** Property-style checks (seeded random inputs) for the custom
  * functions: algebraic laws that must hold for distributed aggregation
  * to be correct (permutation/partitioning invariance of merges) and
  * reference-implementation equality over random inputs.
  */
class PropertySpec extends SparkSpecBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("XorChecksum digest is invariant under permutation and partitioning") {
    for (_ <- 1 to 10) {
      val ids = List.fill(1 + rnd.nextInt(50))(rnd.nextLong())
      val base = ids.toDF("id").coalesce(1)
        .agg(XorChecksum.column(col("id"))).head().getLong(0)
      val shuffled = rnd.shuffle(ids).toDF("id").repartition(5)
        .agg(XorChecksum.column(col("id"))).head().getLong(0)
      assert(base == shuffled)
    }
  }

  test("RollingHash equals the reference fold for arbitrary strings") {
    def ref(s: String): Long = {
      var h = 0L
      s.codePoints().toArray.foreach(cp => h = (h * 31L + cp) % 2147483647L)
      h
    }
    val ss = List.fill(200)(rnd.alphanumeric.take(rnd.nextInt(80)).mkString) :+
      "" :+ "düsseldorf 中文 😀"
    val got = ss.toDF("s").coalesce(1)
      .select(RollingHash.column(col("s"))).collect().map(_.getLong(0))
    assert(got.sameElements(ss.map(ref)))
  }

  test("DotProduct matches scala fold bit-exactly for arbitrary vectors") {
    for (_ <- 1 to 20) {
      val a = Array.fill(16)(rnd.nextDouble() * 2000 - 1000)
      val b = Array.fill(16)(rnd.nextDouble() * 2000 - 1000)
      val got = Seq((a, b)).toDF("a", "b")
        .select(VectorExprs.dot(col("a"), col("b"))).head().getDouble(0)
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
      assert(got == want) // same order of operations -> bit-exact
    }
  }

  test("MinHash signature agreement estimates Jaccard within tolerance") {
    // two overlapping shingle-hash sets with known Jaccard 0.6
    val shared = (1L to 60L).toVector
    val aOnly = (100L to 119L).toVector
    val bOnly = (200L to 219L).toVector
    def sig(xs: Vector[Long]) = xs.toDF("gh")
      .agg(SketchAggs.minhash(col("gh"), 256)).head().getSeq[Long](0)
    val (sa, sb) = (sig(shared ++ aOnly), sig(shared ++ bOnly))
    val est = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    val trueJac = 60.0 / 100.0
    assert(math.abs(est - trueJac) < 0.12, s"est=$est true=$trueJac")
  }

  test("MinHash merge is order-insensitive (partial aggregation safety)") {
    val xs = (1L to 200L).toVector
    val one = xs.toDF("gh").coalesce(1).agg(SketchAggs.minhash(col("gh"), 64)).head().getSeq[Long](0)
    val many = xs.toDF("gh").repartition(7).agg(SketchAggs.minhash(col("gh"), 64)).head().getSeq[Long](0)
    assert(one == many)
  }

  test("sessionize equals the gaps-and-islands reference, including exact boundaries") {
    import graft.streaming.{Event, SessionFlushProcessor}
    val gapMs = 1000L
    val proc = new SessionFlushProcessor(gapMs)
    for (_ <- 1 to 40) {
      // timestamps on a coarse grid so exact-gap boundaries occur often
      val ts = Vector.fill(1 + rnd.nextInt(30))(rnd.nextInt(12) * 500L).sorted
      val evs = ts.zipWithIndex.map { case (t, i) =>
        Event(i.toLong, new java.sql.Timestamp(t), 1L, "view", 1.0, "{}")
      }
      val got = proc.sessionize(evs).map(_.map(_.event_id))
      // reference: break strictly when the gap EXCEEDS gapMs (merge at ==)
      val ref = evs.foldLeft(Vector.empty[Vector[Event]]) { (acc, e) =>
        if (acc.nonEmpty && e.ts.getTime <= acc.last.last.ts.getTime + gapMs)
          acc.init :+ (acc.last :+ e)
        else acc :+ Vector(e)
      }.map(_.map(_.event_id))
      assert(got == ref, s"ts=$ts")
    }
  }

  test("TopKBuf equals sort-take reference for arbitrary inputs, splits, and k") {
    import graft.functions.TopKBuf
    for (_ <- 1 to 50) {
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      // duplicate scores (coarse rounding) force tie-break coverage
      val items = Vector.fill(n)(
        (math.rint(rnd.nextDouble() * 10) / 10, rnd.nextLong() % 100))
      // reference model: sort by (score DESC, id ASC), take k
      val ref = items.sortBy { case (s, id) => (-s, id) }.take(k)
      // single buffer, sequential offers
      val b1 = new TopKBuf(k)
      items.foreach { case (s, id) => b1.offer(s, id) }
      // split into random partial buffers, then absorb (the merge path)
      val parts = items.grouped(math.max(1, 1 + rnd.nextInt(7))).toVector
      val b2 = new TopKBuf(k)
      parts.foreach { p =>
        val pb = new TopKBuf(k)
        p.foreach { case (s, id) => pb.offer(s, id) }
        b2.absorb(pb)
      }
      def out(b: TopKBuf) = (0 until b.size).map(i => (b.scores(i), b.ids(i)))
      assert(out(b1) == ref, s"sequential k=$k items=$items")
      assert(out(b2) == ref, s"merged k=$k items=$items")
    }
  }

  test("q45 chunks tile every document: stride grid, full coverage, bounded length") {
    import graft.operators.TextOps.{ChunkSize, ChunkStride}
    val chunks = SparkEntry.queries("q45_doc_chunking")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    val nTokens = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == nTokens.keySet) // every doc chunked
    for ((doc, cs) <- chunks) {
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._2 == 0 && sorted.head._3 == 0) // starts at token 0
      for (Array(a, b) <- sorted.sliding(2) if sorted.length > 1)
        assert(b._2 == a._2 + 1 && b._3 == a._3 + ChunkStride) // contiguous stride grid
      val last = sorted.last
      assert(last._3 + last._4 == nTokens(doc), s"doc $doc not fully covered") // covers the tail
      assert(cs.forall(c => c._4 >= 1 && c._4 <= ChunkSize)) // bounded chunk length
      assert(sorted.init.forall(_._4 == ChunkSize)) // only the last chunk may be short
    }
  }

  test("q46's count-min sketch never under-counts ANY key (not just the gated top-k)") {
    import graft.operators.Relational.{cmsRows, cmsSketch}
    val ev = Tables.events(spark, sfDir).select(col("user_id"))
    val sketch = cmsSketch(ev, col("user_id"))
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_exact"))
    val under = cmsRows(exact, col("user_id"))
      .join(sketch, Seq("r", "bucket"))
      .groupBy(col("user_id"), col("n_exact")).agg(min(col("c")).as("est"))
      .filter(col("est") < col("n_exact"))
    assert(under.count() == 0)
  }

  test("q48's bloom has zero false negatives over EVERY seen key (not just the gated nations)") {
    import graft.operators.Relational.bloomRows
    val seen = Tables.orders(spark, sfDir).select(col("o_custkey")).distinct()
    val bits = bloomRows(seen, col("o_custkey")).select(col("pos")).distinct()
    // probe the seen set itself: every key must find ALL its positions
    val missed = bloomRows(seen, col("o_custkey"))
      .join(bits.withColumn("hit", lit(1)), Seq("pos"), "left")
      .groupBy(col("o_custkey")).agg(min(coalesce(col("hit"), lit(0))).as("all_set"))
      .filter(col("all_set") === 0)
    assert(missed.count() == 0)
  }

  test("q53's SQL rho equals the JVM numberOfLeadingZeros reference for every event") {
    import graft.operators.Relational.{hllRows, HllP}
    val rows = hllRows(Tables.events(spark, sfDir).select(col("user_id")), col("user_id"))
      .select(xxhash64(col("user_id")).as("h"), col("bucket"), col("rho"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val h = r.getLong(0)
      val x = h >>> HllP
      val expected = if (x == 0) 64 - HllP + 1 else java.lang.Long.numberOfLeadingZeros(x) - HllP + 1
      assert(r.getInt(2) == expected, s"h=$h x=$x")
      assert(r.getLong(1) == java.lang.Math.floorMod(h, 1L << HllP))
    }
  }

  test("q50's bounded posting head equals the first entries of the FULL posting list") {
    val full = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .select(col("term"), col("doc_id")).distinct()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(graft.operators.TextOps.PostingHead)).toMap
    val got = SparkEntry.queries("q50_inverted_index")(spark, sfDir)
      .select(col("term"), col("posting_head")).collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").map(_.toLong).toSeq).toMap
    assert(got == full.map { case (t, ds) => t -> ds.toSeq })
  }

  test("MinHashArray (per-row) equals MinHashAgg (aggregate) for random gram sets") {
    // the streaming dedup pipeline signs documents per-row; its
    // signatures must be bit-identical to the batch index's aggregate
    // form or the banding keys silently diverge
    for (_ <- 1 to 8) {
      val ghs = List.fill(1 + rnd.nextInt(120))(rnd.nextLong())
      val viaAgg = ghs.toDF("gh").coalesce(1)
        .agg(SketchAggs.minhash(col("gh"), 128)).head().getSeq[Long](0)
      val viaRow = Seq(Tuple1(ghs.toArray)).toDF("ghs")
        .select(SketchAggs.minhashArray(col("ghs"), 128)).head().getSeq[Long](0)
      assert(viaAgg == viaRow)
    }
  }

  test("hoppingSliced equals the native hopping plan at every ratio") {
    // the slice decomposition is only worth shipping if it is EXACTLY
    // the same function as window(ts, size, slide) — count/sum must be
    // associative over the slide-grid slices at any window/slide ratio
    val ev = Tables.events(spark, sfDir)
    for ((size, slide) <- Seq((3600L, 900L), (3600L, 300L), (7200L, 600L))) {
      val native = ev
        .groupBy(window(col("ts"), s"$size seconds", s"$slide seconds"), col("user_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(col("window.start").cast("long").as("window_start"),
          col("user_id"), col("n"), col("sum_value"))
      val sliced = graft.operators.WindowedAgg.hoppingSliced(ev, size, slide)
      assert(sliced.exceptAll(native).count() == 0 &&
        native.exceptAll(sliced).count() == 0,
        s"sliced != native at size=$size slide=$slide")
    }
  }

  test("hopping() plan choice adapts to ratio and scan size") {
    import graft.operators.WindowedAgg
    val ev = Tables.events(spark, sfDir)
    def isSliced(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("slice_start")
    // small fixture, low ratio → native fan-out plan
    assert(!isSliced(WindowedAgg.hopping(ev, 3600L, 900L)))
    // high ratio flips to slicing regardless of size
    assert(isSliced(WindowedAgg.hopping(ev, 3600L, 300L)))
    // and a big scan estimate flips it even at the low ratio: union the
    // fixture with itself until the stats estimate crosses the knob
    var big = ev
    while (big.queryExecution.optimizedPlan.stats.sizeInBytes < WindowedAgg.HoppingSliceBytes)
      big = big.union(big)
    assert(isSliced(WindowedAgg.hopping(big, 3600L, 900L)))
  }

  test("dd9 canonical map is a closure: canonical of canonical is itself, keep iff self") {
    val m = SparkEntry.queries("dd9_semantic_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val canon = m.map(t => t._1 -> t._2).toMap
    for ((id, c, keep) <- m) {
      assert(c <= id) // min-label canonical
      assert(canon(c) == c, s"canonical $c of $id is not its own canonical")
      assert((keep == 1) == (id == c))
    }
    // and it actually deduplicates something at this SF
    assert(m.count(_._3 == 0) > 0)
  }
}
