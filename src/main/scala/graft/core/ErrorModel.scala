package graft.core

/** Char-level spelling error model (reference:
  * crates/web-spell/src/error_model.rs — a counted distribution over
  * single-character edit SEQUENCES harvested from (misspelling,
  * correction) pairs, with +1-smoothed log2 probabilities; the noisy-
  * channel scoring shape follows the public Whitelaw et al. paper the
  * reference's config cites). Pure JVM kernel — the distributed
  * harvesting lives in ops.SpellTrain.
  *
  * The reference's `possible_errors` DP backtrace emits Substitution /
  * Deletion / Insertion ops only (its ErrorType enum declares
  * Transposition but the plain-Levenshtein backtrace never produces
  * one, error_model.rs:42-115); a transposition therefore surfaces as
  * two substitutions. Mirrored here, including the backtrace
  * preference order (diagonal, then deletion, then insertion) and the
  * end-to-start emission order of the ops. */
object ErrorModel {

  sealed trait ErrorOp { def key: String }
  final case class Ins(c: Char) extends ErrorOp { def key = s"I($c)" }
  final case class Del(c: Char) extends ErrorOp { def key = s"D($c)" }
  final case class Sub(from: Char, to: Char) extends ErrorOp {
    def key = s"S($from,$to)"
  }

  /** Stable key for a whole error sequence (count-map key). */
  def seqKey(ops: Seq[ErrorOp]): String = ops.map(_.key).mkString("|")

  /** All edits transforming `a` into `b` along one optimal Levenshtein
    * path — None when a == b. Backtrace prefers the diagonal move, then
    * deletion, then insertion (the reference's order), and emits ops
    * walking from the ends of the strings backward. */
  def possibleErrors(a: String, b: String): Option[Vector[ErrorOp]] = {
    if (a == b) return None
    val al = a.length; val bl = b.length
    val dp = Array.ofDim[Int](al + 1, bl + 1)
    var i = 0
    while (i <= al) { dp(i)(0) = i; i += 1 }
    var j = 0
    while (j <= bl) { dp(0)(j) = j; j += 1 }
    i = 1
    while (i <= al) {
      j = 1
      while (j <= bl) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + cost)
        j += 1
      }
      i += 1
    }
    val ops = Vector.newBuilder[ErrorOp]
    i = al; j = bl
    while (i > 0 && j > 0) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      if (dp(i)(j) == dp(i - 1)(j - 1) + cost) {
        if (cost == 1) ops += Sub(a.charAt(i - 1), b.charAt(j - 1))
        i -= 1; j -= 1
      } else if (dp(i)(j) == dp(i - 1)(j) + 1) {
        ops += Del(a.charAt(i - 1)); i -= 1
      } else {
        ops += Ins(b.charAt(j - 1)); j -= 1
      }
    }
    while (i > 0) { ops += Del(a.charAt(i - 1)); i -= 1 }
    while (j > 0) { ops += Ins(b.charAt(j - 1)); j -= 1 }
    val v = ops.result()
    if (v.isEmpty) None else Some(v)
  }

  /** The reference's length-bucketed edit budget (trainer.rs:106-115,
    * spell_checker.rs:46-59): 1 edit up to 4 chars, 2 up to 12, else 3. */
  def maxEditsFor(term: String): Int =
    if (term.length <= 4) 1 else if (term.length <= 12) 2 else 3
}

/** Counted error-sequence distribution. `logProb` mirrors the
  * reference's smoothing: log2(count) − log2(total+1) for seen
  * sequences, −log2(total+1) for unseen (error_model.rs:212-219). */
final case class ErrorModel(counts: Map[String, Long], total: Long) {

  def logProb(ops: Seq[ErrorModel.ErrorOp]): Double = logProbKey(ErrorModel.seqKey(ops))

  def logProbKey(key: String): Double = {
    val denom = math.log(total.toDouble + 1.0) / math.log(2.0)
    counts.get(key) match {
      case Some(c) => math.log(c.toDouble) / math.log(2.0) - denom
      case None => -denom
    }
  }

  /** 2^logProb — the multiplicative edit factor spellCorrect's
    * probability-ratio scoring consumes (no edit ⇒ 1.0). */
  def editFactor(a: String, b: String): Double =
    ErrorModel.possibleErrors(a, b) match {
      case None => 1.0
      case Some(ops) => math.pow(2.0, logProb(ops))
    }

  /** One line per sequence, `key TAB count`, total in a header — a
    * plain-text analog of the reference's error_model.json. */
  def serialize: String = {
    val sb = new StringBuilder
    sb.append("total=").append(total).append('\n')
    counts.toSeq.sortBy { case (k, c) => (-c, k) }.foreach { case (k, c) =>
      sb.append(k).append('\t').append(c).append('\n')
    }
    sb.toString
  }
}

object ErrorModelIO {
  def parse(text: String): ErrorModel = {
    val lines = text.linesIterator.filter(_.nonEmpty).toSeq
    require(lines.nonEmpty && lines.head.startsWith("total="),
      "error model: missing total header")
    val total = lines.head.substring("total=".length).toLong
    val counts = lines.tail.map { l =>
      val t = l.lastIndexOf('\t')
      require(t > 0, s"error model: bad line '$l'")
      l.substring(0, t) -> l.substring(t + 1).toLong
    }.toMap
    ErrorModel(counts, total)
  }
}
