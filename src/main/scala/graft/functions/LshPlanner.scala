package graft.functions

/** Chooses MinHash-LSH banding from a target similarity threshold and
  * recall, instead of magic constants: detection probability for a
  * pair with Jaccard J under (bands b, rows r) is 1 - (1 - J^r)^b.
  *
  * Rounds 1-2 tuned these by hand (q15's 16x4 missed the one pair at
  * J=0.8; 32x2 catches it); this makes the trade explicit: more rows
  * per band = fewer false candidates, more bands = higher recall.
  */
object LshPlanner {

  final case class Plan(bands: Int, rowsPerBand: Int) {
    def signatureLength: Int = bands * rowsPerBand
    def detectProb(j: Double): Double =
      1.0 - math.pow(1.0 - math.pow(j, rowsPerBand), bands)
  }

  /** Smallest signature meeting `targetRecall` at `threshold`, trying
    * rows-per-band from largest (most selective) down: the plan with
    * the fewest false candidates that still hits recall within the
    * signature budget. */
  def plan(threshold: Double, targetRecall: Double = 0.999,
           maxSignature: Int = 256): Plan = {
    require(threshold > 0 && threshold < 1)
    require(targetRecall > 0 && targetRecall < 1)
    val candidates = for {
      r <- (8 to 1 by -1).toSeq
      // bands needed: 1-(1-t^r)^b >= recall  =>  b >= ln(1-recall)/ln(1-t^r)
      pr = math.pow(threshold, r)
      if pr < 1.0
      b = math.ceil(math.log1p(-targetRecall) / math.log1p(-pr)).toInt
      if b >= 1 && b * r <= maxSignature
    } yield Plan(b, r)
    candidates.headOption.getOrElse(Plan(maxSignature, 1))
  }
}
