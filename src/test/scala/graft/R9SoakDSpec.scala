package graft

/** Temporary soak D (deleted after the campaign log records it). */
class R9SoakDSpec extends VerbChainFuzzSpec {
  test("r9 re-soak D: seeds 21101-21500, 35-op vocab, every 2nd hostile") {
    (21101 to 21500).foreach { s =>
      if (s % 2 == 0) runCaseSoakHostile(s) else runCaseSoak(s)
    }
  }
}
