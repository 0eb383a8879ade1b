package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.UnigramOps

/** Property-style tests for the session's driver-side kernels — seeded
  * random corpora against the invariants that make them safe at any scale
  * (the TransformPropertiesSpec pattern). The Spark-side behaviors (q102/
  * q105 oracles, parity specs) gate the distributed halves; these pin the
  * pure functions under inputs no hand vector would think of.
  */
class PipelinePropertiesSpec extends AnyFunSuite {

  private def rng = new scala.util.Random(1337)

  // random boundary-marked histograms over a small alphabet: forces heavy
  // substring collisions, ties, and single-char-only corpora
  private def randomHist(r: scala.util.Random): Seq[(String, Long)] = {
    val alpha = "abcd".take(1 + r.nextInt(4))
    val nWords = 1 + r.nextInt(8)
    (1 to nWords).map { _ =>
      val len = 1 + r.nextInt(6)
      val w = (1 to len).map(_ => alpha(r.nextInt(alpha.length))).mkString
      (s"${UnigramOps.Boundary}$w", 1L + r.nextInt(20))
    }.distinct
  }

  test("unigram training invariants hold on random histograms") {
    val r = rng
    (1 to 60).foreach { _ =>
      val hist = randomHist(r)
      val chars = hist.flatMap(_._1.toSeq).distinct
      val vocabSize = chars.size + 2 + r.nextInt(12)
      val pieces = UnigramOps.trainPieces(hist, vocabSize,
        maxPieceLen = 1 + r.nextInt(5), seedSize = 1 + r.nextInt(64),
        emIters = 1 + r.nextInt(2))
      // size bound holds (excludes the <unk> slot added at model build)
      assert(pieces.size <= vocabSize - 1, s"size ${pieces.size} > ${vocabSize - 1}")
      // every training character survives pruning
      val strs = pieces.map(_._1).toSet
      assert(chars.forall(c => strs.contains(c.toString)),
        s"pruned a training char: $chars vs $strs")
      // scores are finite log-probs
      assert(pieces.forall(p => p._2 < 0 && !p._2.isNegInfinity), pieces)
    }
  }

  test("unigram segmentation round-trips every random training word with zero unk") {
    val r = rng
    (1 to 40).foreach { _ =>
      val hist = randomHist(r)
      val chars = hist.flatMap(_._1.toSeq).distinct
      val model = UnigramOps.buildModel(UnigramOps.trainPieces(hist,
        chars.size + 2 + r.nextInt(8), maxPieceLen = 1 + r.nextInt(5),
        seedSize = 1 + r.nextInt(64), emIters = 2))
      val id = new java.util.HashMap[String, Int]()
      model.pieces.zipWithIndex.foreach { case ((p, _), i) => if (i > 0) id.put(p, i) }
      hist.foreach { case (marked, _) =>
        val ids = UnigramOps.segmentWord(marked, id, model.pieces, model.maxPieceLen)
        assert(!ids.contains(0), s"unk for training word $marked")
        assert(ids.map(model.pieces(_)._1).mkString == marked,
          s"segmentation of $marked does not concatenate back")
      }
      // unseen characters: exactly one <unk> per unknown char, position-exact
      val alien = s"${UnigramOps.Boundary}${hist.head._1.drop(1)}zq"
      val ids = UnigramOps.segmentWord(alien, id, model.pieces, model.maxPieceLen)
      assert(ids.count(_ == 0) == 2, s"expected 2 unks in $alien: $ids")
    }
  }

  test("training is deterministic under histogram permutation (random corpora)") {
    val r = rng
    (1 to 30).foreach { _ =>
      val hist = randomHist(r)
      val chars = hist.flatMap(_._1.toSeq).distinct
      val vs = chars.size + 2 + r.nextInt(8)
      val maxLen = 1 + r.nextInt(5)
      val seed = 1 + r.nextInt(64)
      val a = UnigramOps.trainPieces(hist, vs, maxLen, seed, 2)
      val b = UnigramOps.trainPieces(r.shuffle(hist), vs, maxLen, seed, 2)
      assert(a == b, "histogram order leaked into the model")
    }
  }

}
