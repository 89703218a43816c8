package graft

import org.scalatest.funsuite.AnyFunSuite

/** Amplify's per-copy text permutation contract: copy 0 is identity,
  * every other copy (up to MaxTextCopies) is a DISTINCT non-identity
  * alphabet bijection — no copy index silently aliases copy 0 the way
  * a plain Caesar rotation does at k = 26, 52, …
  */
class AmplifySpec extends AnyFunSuite {

  test("affinePerm: 312 distinct bijections, identity only at index 0") {
    val perms = (0 until Amplify.MaxTextCopies).map(Amplify.affinePerm)
    // each is a bijection of [a-z]
    perms.foreach(p => assert(p.sorted == "abcdefghijklmnopqrstuvwxyz", p))
    // all distinct
    assert(perms.distinct.size == Amplify.MaxTextCopies)
    // identity exactly once, at copy 0 (the old Caesar bug: copy 26 = identity)
    assert(perms.head == "abcdefghijklmnopqrstuvwxyz")
    assert(!perms.tail.contains("abcdefghijklmnopqrstuvwxyz"))
    // the exact indices the Caesar version got wrong
    assert(Amplify.affinePerm(26) != Amplify.affinePerm(0))
    assert(Amplify.affinePerm(52) != Amplify.affinePerm(0))
  }
}
