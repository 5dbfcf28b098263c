package graft

import org.scalatest.funsuite.AnyFunSuite

/** graft.core.Par — the bounded concurrent-build helper the r14
  * optimization round threads through q54/q452/q455/q458/q467/q470:
  * results must keep input order, failures must rethrow their cause,
  * and bounded parallelism must never deadlock on more thunks than
  * threads. */
class ParSpec extends AnyFunSuite {

  test("results keep input order regardless of completion order") {
    val out = graft.core.Par.run[Int](Seq(
      () => { Thread.sleep(80); 1 },
      () => { Thread.sleep(10); 2 },
      () => 3), parallelism = 3)
    assert(out == Seq(1, 2, 3))
  }

  test("more thunks than threads all complete") {
    val out = graft.core.Par.run[Int]((1 to 20).map(i => () => i), parallelism = 3)
    assert(out == (1 to 20))
  }

  test("a failing thunk rethrows its cause, not ExecutionException") {
    val boom = intercept[IllegalStateException] {
      graft.core.Par.run[Int](Seq(
        () => 1,
        () => throw new IllegalStateException("arm failed")), parallelism = 2)
    }
    assert(boom.getMessage == "arm failed")
  }

  test("single thunk runs without a pool") {
    assert(graft.core.Par.run[String](Seq(() => "only")) == Seq("only"))
  }
}
