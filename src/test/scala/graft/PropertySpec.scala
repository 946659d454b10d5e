package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** SURVEY §5.2 layer 3 — algebraic invariants over generated inputs,
  * plus corpus-level quality assertions for the sketch-based dedup
  * operators (recall vs exact Jaccard — golden pairs would overfit to
  * hash internals). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val smallInts = Gen.listOfN(30, Gen.choose(0, 15))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), p)
    assert(res.passed, res.status.toString)
  }

  test("connectedComponents equals a union-find reference on random graphs") {
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 19L)))
    check(Prop.forAll(edgeGen) { es =>
      val edges0 = es.filter { case (a, b) => a != b }
      val nodes = (0L to 19L).toDF("id")
      val got =
        if (edges0.isEmpty)
          Graph.connectedComponents(nodes, Seq.empty[(Long, Long)].toDF("src", "dst"))
        else Graph.connectedComponents(nodes, edges0.toDF("src", "dst"))
      // union-find reference
      val parent = Array.tabulate(20)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges0.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until 20).map(i => i.toLong -> find(i).toLong).toMap
      got.as[(Long, Long)].collect().toMap == want
    })
  }

  test("salted join equals the plain join") {
    val a = Skew.joinSkewSalted(spark, sfDir).as[(Long, Double)].head()
    val e = Tables(spark, sfDir, "events")
      .select($"event_id",
        when($"user_id" % 10 < 7, 0L).otherwise($"user_id").as("k"),
        $"value")
    val dim = e.select($"k").distinct()
      .withColumn("w", ($"k" % 97 + 1).cast("int"))
    val plain = e.join(dim, "k")
      .agg(count(lit(1)), Det.dsumDec(Det.dec($"value") * $"w"))
      .as[(Long, Double)].head()
    assert(a === plain)
  }

  test("set-operation algebra matches Scala set semantics") {
    check(Prop.forAll(smallInts, smallInts) { (xs: List[Int], ys: List[Int]) =>
      val a = xs.toDF("v")
      val b = ys.toDF("v")
      val semi = a.join(b, Seq("v"), "left_semi").as[Int].collect().toSet
      val anti = a.join(b, Seq("v"), "left_anti").as[Int].collect().toSet
      a.unionAll(b).count() == xs.size + ys.size &&
        a.intersect(b).as[Int].collect().toSet ==
          xs.toSet.intersect(ys.toSet) &&
        a.except(b).as[Int].collect().toSet == xs.toSet.diff(ys.toSet) &&
        semi.union(anti) == xs.toSet && semi.intersect(anti).isEmpty
    })
  }

  test("row_number within a partition is a permutation of 1..n") {
    check(Prop.forAll(
      Gen.listOfN(40, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 100)))) {
      (rows: List[(Int, Int)]) =>
        rows.isEmpty || {
          val df = rows.toDF("k", "v")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy($"k").orderBy($"v", monotonically_increasing_id())
          val rns = df.withColumn("rn", row_number().over(w))
            .groupBy($"k").agg(collect_list($"rn").as("rns"))
            .as[(Int, Seq[Int])].collect()
          rns.forall { case (_, ns) => ns.sorted == (1 to ns.size).toList }
        }
    })
  }

  test("Det.dsum is exact: equals BigDecimal sum on generated money values") {
    check(Prop.forAll(
      Gen.listOfN(50, Gen.choose(-99999999L, 99999999L).map(_ / 100.0))) {
      (xs: List[Double]) =>
        xs.isEmpty || {
          val got = xs.toDF("v").agg(Det.dsum($"v").as("s"))
            .as[Double].head()
          val want = xs.map(BigDecimal(_)).sum.toDouble
          got == want
        }
    })
  }

  test("Welford aggregator matches var_samp within 1e-9") {
    val rows = Aggregates.udafWelford(spark, sfDir)
      .select($"welford_var", $"builtin_var")
      .as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, b) => assert(math.abs(w - b) < 1e-9, s"$w vs $b") }
  }

  test("as-of join (union+window) equals the naive quadratic formulation") {
    val e = Tables(spark, sfDir, "events")
    val fast = Relational.joinAsof(spark, sfDir)
      .select($"event_id", $"last_click_ts").as[(Long, Option[Timestamp])]
    val p = e.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val c = e.filter($"event_type" === "click")
      .select($"user_id".as("cu"), $"ts".as("cts"))
    val naive = p.join(c, $"user_id" === $"cu" && $"cts" <= $"ts", "left")
      .groupBy($"event_id").agg(max($"cts").as("last_click_ts"))
      .select($"event_id", $"last_click_ts").as[(Long, Option[Timestamp])]
    assert(fast.collect().toMap === naive.collect().toMap)
  }
  type Timestamp = java.sql.Timestamp

  test("MinHash/LSH finds every exact-Jaccard pair at this threshold") {
    // candidates are verified with exact Jaccard, so precision is 1 by
    // construction; recall vs the exhaustive inverted-index pass is the
    // quality property (8 bands × 4 rows ⇒ ~1.0 for j ≥ 0.9).
    val exact = LlmOps.dedupNgramJaccard(spark, sfDir)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    val found = LlmOps.dedupMinhash(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(exact.map(t => (t._1, t._2)).toSet))
    val strong = exact.filter(_._3 >= 0.9).map(t => (t._1, t._2))
    assert(strong.nonEmpty, "corpus should contain strong near-dups")
    val recall = strong.count(found).toDouble / strong.size
    assert(recall >= 0.9, s"recall $recall over ${strong.size} strong pairs")
  }

  test("embedding ANN dedup ⊆ brute force, recall ≥ 0.9, sims exact") {
    // banded sign-hash LSH candidates + exact vec_dot verify at the
    // same threshold + rounding ⇒ the ANN pairs must be a SUBSET of
    // the brute-force baseline with identical sims; recall over the
    // full ≥0.4 pair set is the quality property (measured 0.93–0.97
    // across SFs for 16 bands × 4 bits — see the operator scaladoc).
    val brute = LlmOps.dedupEmbedding(spark, sfDir)
      .select($"vec_a", $"vec_b", $"sim")
      .as[(Long, Long, Double)].collect()
    val ann = LlmOps.dedupEmbeddingAnn(spark, sfDir)
      .select($"vec_a", $"vec_b", $"sim")
      .as[(Long, Long, Double)].collect()
    assert(brute.nonEmpty, "corpus should contain ≥0.4-cos pairs")
    val bruteMap = brute.map(t => (t._1, t._2) -> t._3).toMap
    ann.foreach { case (a, b, s) =>
      assert(bruteMap.get((a, b)).contains(s),
        s"ANN pair ($a,$b,$s) not an exact brute-force hit")
    }
    val found = ann.map(t => (t._1, t._2)).toSet
    val recall = brute.count(t => found((t._1, t._2))).toDouble / brute.size
    assert(recall >= 0.9, s"ANN recall $recall over ${brute.size} pairs")
  }

  test("bucketed ANN top-k ⊆ brute-force ranking, and hits are exact") {
    val brute = LlmOps.simCosineTopk(spark, sfDir)
      .as[(Long, Double)].collect().toMap
    val ann = LlmOps.simAnnBucketed(spark, sfDir)
      .as[(Long, Double)].collect()
    ann.foreach { case (id, sim) =>
      brute.get(id).foreach(b => assert(b === sim)) // same score when ranked
    }
    assert(ann.nonEmpty)
  }

  test("hierarchy resolution: every chain ends at root 0 with digit depth") {
    val rows = DesFiles.hierarchySrclist(spark, sfDir)
      .as[(Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (leaf, root, depth) =>
      assert(root === 0L) // 0 is an existing order key ⇒ global root
      val digits = if (leaf == 0) 0 else leaf.toString.length
      assert(depth === digits, s"leaf $leaf depth $depth")
    }
  }

  test("SimHash finds the strong textual near-dups") {
    val strong = LlmOps.dedupNgramJaccard(spark, sfDir)
      .select($"doc_a", $"doc_b", $"jaccard").as[(Long, Long, Double)]
      .collect().filter(_._3 >= 0.9).map(t => (t._1, t._2)).toSet
    val simhash = LlmOps.dedupSimhash(spark, sfDir)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(strong.nonEmpty)
    val recall = strong.count(simhash).toDouble / strong.size
    assert(recall >= 0.85, s"simhash recall $recall over ${strong.size} pairs")
  }

  test("hash sample is deterministic and near the target rate") {
    val a = LlmOps.sampleHash(spark, sfDir).as[(Long, String, Long)].collect()
    val b = LlmOps.sampleHash(spark, sfDir).as[(Long, String, Long)].collect()
    assert(a.toSeq === b.toSeq) // no rand(): identical across runs
    val total = Tables(spark, sfDir, "documents").count().toDouble
    val rate = a.length / total
    assert(rate > 0.04 && rate < 0.2, s"rate $rate") // ~10% ± sampling noise
  }

  test("funnel fold equals the conditional-MIN reference on random streams") {
    val evGen = Gen.listOfN(40, Gen.zip(
      Gen.choose(0L, 3L),                       // user
      Gen.choose(0L, 20L),                      // second (dense → ties)
      Gen.oneOf("view", "click", "purchase", "error", "signup")))
    check(Prop.forAll(evGen) { es =>
      val rows = es.map { case (u, sec, tp) =>
        (u, new java.sql.Timestamp(sec * 1000), tp)
      }
      val df = rows.toDF("user_id", "ts", "event_type")
      val got = Analytics.funnelStages(df)
        .as[(Long, Int)].collect().toMap
      // reference: tv = min view; tc = min click > tv; tp = min purchase > tc
      val want = rows.groupBy(_._1).map { case (u, evs) =>
        def minAfter(tp: String, after: Option[Long]): Option[Long] = {
          val ts = evs.collect { case (_, t, `tp`) => t.getTime }
          val ok = after.fold(ts)(a => ts.filter(_ > a))
          if (ok.isEmpty) None else Some(ok.min)
        }
        val tv = minAfter("view", None)
        val tc = tv.flatMap(v => minAfter("click", Some(v)))
        val tpu = tc.flatMap(c => minAfter("purchase", Some(c)))
        u -> (if (tpu.isDefined) 3 else if (tc.isDefined) 2
              else if (tv.isDefined) 1 else 0)
      }
      got == want
    })
  }

  test("HLL estimate lands within the sketch's error bound of exact") {
    val rows = Aggregates.aggHll(spark, sfDir)
      .select($"approx_parts", $"exact_parts")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (approx, exact) =>
      // default HLL++ rsd = 5%; allow 4 sigma for the small groups here
      assert(math.abs(approx - exact) <= math.max(4, 0.2 * exact),
        s"approx $approx vs exact $exact")
    }
  }

  test("exact dedup keeps the minimum doc_id per duplicated text") {
    val docs = Seq((10L, "a b c"), (3L, "a b c"), (7L, "x y z"))
      .toDF("doc_id", "text")
    val out = docs.groupBy($"text")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select($"keep_id", $"n_copies").as[(Long, Long)].collect().toSet
    assert(out === Set((3L, 2L), (7L, 1L)))
  }
}
