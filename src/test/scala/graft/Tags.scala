package graft

/** Tag for long-running fuzz/soak campaigns. The fast dev loop
  * excludes them (`sbt "testOnly * -- -l graft.Soak"`, documented in
  * README §testing); full `sbt test` runs everything. */
object Soak extends org.scalatest.Tag("graft.Soak")
