package graft
class FuzzSoak extends VerbChainFuzzSpec {
  test("soak") {
    (1 to 600).foreach { s =>
      try runCaseSoak(3000 + s)
      catch { case e: Throwable =>
        info(s"SOAK FAIL seed=${3000 + s}: ${e.getMessage}")
        throw e
      }
    }
  }
}
