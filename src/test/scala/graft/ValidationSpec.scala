package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's `illegalQM` laws
  * (/root/reference/server/src/Repository/Model.hs:126-134) as
  * table-driven tests — SURVEY.md §5 item 2.
  */
class ValidationSpec extends AnyFunSuite {
  private def legal(qm: QueryModel) = Validation.validate(qm).isRight
  private def illegal(qm: QueryModel) = Validation.validate(qm).isLeft

  test("groupBy without aggFunc is illegal") {
    assert(illegal(QueryModel(groupBy = Some(GroupBy.Tag))))
    assert(illegal(QueryModel(groupBy = Some(GroupBy.Timestamp))))
  }
  test("groupBy with aggFunc is legal") {
    assert(legal(QueryModel(groupBy = Some(GroupBy.Tag), aggFunc = Some(Agg.Sum))))
  }
  test("gt+ge is illegal; either alone is legal") {
    assert(illegal(QueryModel(gt = Some(1L), ge = Some(2L))))
    assert(legal(QueryModel(gt = Some(1L))))
    assert(legal(QueryModel(ge = Some(1L))))
  }
  test("lt+le is illegal; either alone is legal") {
    assert(illegal(QueryModel(lt = Some(1L), le = Some(2L))))
    assert(legal(QueryModel(lt = Some(1L))))
    assert(legal(QueryModel(le = Some(1L))))
  }
  test("tsEq with any range bound is illegal") {
    assert(illegal(QueryModel(tsEq = Some(1L), gt = Some(0L))))
    assert(illegal(QueryModel(tsEq = Some(1L), ge = Some(0L))))
    assert(illegal(QueryModel(tsEq = Some(1L), lt = Some(2L))))
    assert(illegal(QueryModel(tsEq = Some(1L), le = Some(2L))))
  }
  test("tsEq alone / tsEq+tagEq are legal") {
    assert(legal(QueryModel(tsEq = Some(1L))))
    assert(legal(QueryModel(tsEq = Some(1L), tagEq = Some("x"))))
  }
  test("empty query (collect everything) is legal") {
    assert(legal(QueryModel()))
  }
  test("one lower + one upper bound is legal") {
    assert(legal(QueryModel(ge = Some(1L), lt = Some(5L))))
    assert(legal(QueryModel(gt = Some(1L), le = Some(5L))))
  }
}
