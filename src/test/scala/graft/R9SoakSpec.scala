package graft

/** Round-9 soak harness (temporary, deleted once the campaign log
  * records the result): fresh seed ranges over the 31-op vocabulary —
  * the first ranges to exercise the join/bind extension (ops 22-30).
  * Every 3rd seed runs with quoting-hostile column names. */
class R9SoakSpec extends VerbChainFuzzSpec {
  test("r9 soak: seeds 10001-10350, 31-op vocab, every 3rd hostile") {
    (10001 to 10350).foreach { s =>
      if (s % 3 == 0) runCaseSoakHostile(s) else runCaseSoak(s)
    }
  }
}
