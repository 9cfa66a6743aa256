package graft

import org.apache.spark.sql.functions._

import graft.ops.StringSim

class StringSimSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic corpus: base words + single/double edits + shared-
    * prefix ID-style strings (the adversarial case for gram blocking) +
    * sub-q(d+1) shorties (exercise the short pool) + duplicate-gram
    * strings (exercise occurrence indexing). */
  private def corpus: Seq[String] = {
    val bases = Seq("gravity", "machine", "spinner", "lantern", "monsoon")
    val edits = bases.flatMap { w =>
      Seq(w.drop(1),                      // deletion
        w.updated(2, 'z'),                // substitution
        w + "s",                          // insertion
        w.updated(1, 'q').updated(4, 'x') // distance 2
      )
    }
    val ids = (1 to 40).map(i => f"Node#$i%05d")
    val shorts = Seq("ab", "ac", "b", "abc", "abd", "xy", "x", "")
    val dupGrams = Seq("aaaaaa", "aaaaba", "abababab", "abababcb")
    (bases ++ edits ++ ids ++ shorts ++ dupGrams).filter(_.nonEmpty)
  }

  private def brute(strs: Seq[String], d: Int): Set[(String, String, Int)] = {
    val n = strs.distinct
    (for {
      a <- n; b <- n if a < b
    } yield (a, b)).flatMap { case (a, b) =>
      val lev = levDp(a, b)
      if (lev <= d) Some((a, b, lev)) else None
    }.toSet
  }

  /** Reference DP Levenshtein, written from the textbook recurrence. */
  private def levDp(a: String, b: String): Int = {
    val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val sub = m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
      m(i)(j) = math.min(sub, math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1))
    }
    m(a.length)(b.length)
  }

  private def run(strs: Seq[String], d: Int, q: Int = 3): Set[(String, String, Int)] =
    StringSim.editJoin(strs.toDF("s"), "s", d, q)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  private def runDel(strs: Seq[String], d: Int): Set[(String, String, Int)] =
    StringSim.deletionJoin(strs.toDF("s"), "s", d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  test("editJoin == all-pairs levenshtein at d=1 (exactness incl. " +
      "short pool, shared prefixes, duplicate grams)") {
    assert(run(corpus, 1) === brute(corpus, 1))
  }

  test("editJoin == all-pairs levenshtein at d=2 (prefix length q*d+1 " +
      "scales with the radius)") {
    assert(run(corpus, 2) === brute(corpus, 2))
  }

  test("editJoin == all-pairs at q=2 (gram width is a free parameter)") {
    assert(run(corpus, 1, q = 2) === brute(corpus, 1))
  }

  test("ID-style corpus: every one-digit-apart pair found, nothing else") {
    val strs = (1 to 30).map(i => f"Item#$i%04d")
    val got = run(strs, 1)
    assert(got === brute(strs, 1))
    // sanity on the shape: Item#0001/Item#0002 differ by one substitution
    assert(got.contains(("Item#0001", "Item#0002", 1)))
  }

  test("deletionJoin == all-pairs levenshtein at d=1 (same corpus, " +
      "including single-char strings whose variants hit empty)") {
    assert(runDel(corpus, 1) === brute(corpus, 1))
  }

  test("deletionJoin == all-pairs levenshtein at d=2 (two deletion " +
      "rounds; shared-variant false positives removed by verify)") {
    assert(runDel(corpus, 2) === brute(corpus, 2))
  }

  test("deletionJoin == editJoin on the ID-style corpus (two geometries, " +
      "one answer)") {
    val strs = (1 to 30).map(i => f"Item#$i%04d")
    assert(runDel(strs, 1) === run(strs, 1))
  }

  test("reported lev values are the exact distances") {
    val got = run(Seq("kitten", "sitten", "sittin", "sitting"), 2)
    assert(got.contains(("kitten", "sitten", 1)))
    assert(got.contains(("sitten", "sitting", 2)))
    assert(got.contains(("kitten", "sittin", 2)))
  }
}
