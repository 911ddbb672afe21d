package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.sources._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property soundness of the batch relation's two FILE-PRUNING
  * functions. Unlike the in-plan filter translation (which Spark's
  * re-applied predicates protect), these decide which files are READ
  * at all — an unsound bound silently drops matching rows:
  *
  *  - `convKeys`: if a row satisfies the (AND-combined) filters and a
  *    key set is derived, the row's conv_id must be in the set;
  *  - `tsLowerBoundMicros`: if a row satisfies the filters and a lower
  *    bound is derived, the row's event time must lie strictly above
  *    it (the bound feeds `readTimeTail`, whose window is strict).
  *
  * The reference evaluator below implements SQL three-valued logic
  * (null comparisons are unknown; a filter admits a row only on a
  * definite true) — the same semantics Spark's source filters carry.
  */
class RelationPruningPropertySpec extends SparkSpec {

  /** Deterministic scalacheck run (fixed seed, 3000 cases) — no flaky
    * seeds, mirroring GenPropertySpec's stance. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(3000)
      .withInitialSeed(Seed(20260820L)), p)
    assert(res.passed, res.status.toString)
  }

  private case class R(conv: String, turn: Integer, ts: Timestamp)

  // --- reference evaluator: SQL three-valued logic over R ------------
  private def cmp(f: Filter, r: R): Option[Int] = {
    def of(a: String): Any = a match {
      case "conv_id" => r.conv
      case "turn_idx" => r.turn
      case "ts" => r.ts
      case _ => null
    }
    val (a, v) = f match {
      case EqualTo(x, y) => (of(x), y)
      case GreaterThan(x, y) => (of(x), y)
      case GreaterThanOrEqual(x, y) => (of(x), y)
      case LessThan(x, y) => (of(x), y)
      case LessThanOrEqual(x, y) => (of(x), y)
      case _ => return None
    }
    (a, v) match {
      case (null, _) | (_, null) => None
      case (x: String, y: String) => Some(x.compareTo(y))
      case (x: Integer, y: Int) => Some(x.compareTo(y))
      case (x: Timestamp, y: Timestamp) => Some(x.compareTo(y))
      case _ => None
    }
  }

  private def eval(f: Filter, r: R): Option[Boolean] = f match {
    case EqualTo(_, _) => cmp(f, r).map(_ == 0)
    case EqualNullSafe(a, v) =>
      val x = a match {
        case "conv_id" => r.conv; case "turn_idx" => r.turn
        case "ts" => r.ts; case _ => null
      }
      Some(x == v)
    case GreaterThan(_, _) => cmp(f, r).map(_ > 0)
    case GreaterThanOrEqual(_, _) => cmp(f, r).map(_ >= 0)
    case LessThan(_, _) => cmp(f, r).map(_ < 0)
    case LessThanOrEqual(_, _) => cmp(f, r).map(_ <= 0)
    case In(a, vs) =>
      val x = a match {
        case "conv_id" => r.conv; case "turn_idx" => r.turn
        case _ => null
      }
      if (x == null) None
      else if (vs.contains(x)) Some(true)
      else if (vs.contains(null)) None
      else Some(false)
    case IsNull(a) => Some((a match {
      case "conv_id" => r.conv; case "turn_idx" => r.turn
      case "ts" => r.ts; case _ => null
    }) == null)
    case IsNotNull(a) => eval(IsNull(a), r).map(!_)
    case StringStartsWith(a, p) =>
      Option(if (a == "conv_id") r.conv else null).map(_.startsWith(p))
    case Not(c) => eval(c, r).map(!_)
    case And(x, y) => (eval(x, r), eval(y, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    case Or(x, y) => (eval(x, r), eval(y, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    case _ => None
  }

  // --- generators ----------------------------------------------------
  private val convs = Gen.oneOf("a", "b", "c", "d", null)
  private def ts(day: Int) = Timestamp.valueOf(f"2026-01-$day%02d 12:00:00")
  private val days = Gen.choose(1, 28)

  private val leaf: Gen[Filter] = Gen.oneOf(
    Gen.oneOf("a", "b", "c", "d").map(EqualTo("conv_id", _)),
    Gen.nonEmptyListOf(Gen.oneOf[Any]("a", "b", "c"))
      .map(vs => In("conv_id", vs.toArray)),
    Gen.oneOf("a", "b").map(EqualNullSafe("conv_id", _)),
    Gen.choose(0, 9).map(v => EqualTo("turn_idx", v)),
    Gen.choose(0, 9).map(v => GreaterThan("turn_idx", v)),
    Gen.choose(0, 9).map(v => LessThan("turn_idx", v)),
    days.map(d => GreaterThan("ts", ts(d))),
    days.map(d => GreaterThanOrEqual("ts", ts(d))),
    days.map(d => LessThan("ts", ts(d))),
    days.map(d => EqualTo("ts", ts(d))),
    Gen.oneOf(IsNull("conv_id"), IsNotNull("conv_id"), IsNotNull("ts")),
    Gen.oneOf("a", "b").map(StringStartsWith("conv_id", _)))

  private def tree(depth: Int): Gen[Filter] =
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map(And.tupled),
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1)).map(Or.tupled),
      1 -> tree(depth - 1).map(Not))

  private val filters: Gen[Array[Filter]] =
    Gen.chooseNum(1, 3).flatMap(n => Gen.listOfN(n, tree(3)).map(_.toArray))

  private val rows: Gen[R] = for {
    c <- convs
    t <- Gen.oneOf(Gen.choose(0, 9).map(Int.box), Gen.const(null: Integer))
    d <- Gen.oneOf(days.map(d => ts(d)), Gen.const(null: Timestamp))
  } yield R(c, t, d)

  test("convKeys never excludes a conv_id that satisfies the filters") {
    check(Prop.forAll(filters, rows) { (fs, r) =>
      val matches = fs.forall(f => eval(f, r).contains(true))
      val keys = GraftBatchRelation.convKeys(fs)
      !matches || r.conv == null ||
        keys.forall(_.contains(r.conv))
    })
  }

  test("tsLowerBoundMicros never cuts above a satisfying row's event time") {
    check(Prop.forAll(filters, rows) { (fs, r) =>
      val matches = fs.forall(f => eval(f, r).contains(true))
      val bound = GraftBatchRelation.tsLowerBoundMicros(fs, "ts")
      !matches || bound.forall(b =>
        r.ts != null && LakeTable.microsOf(r.ts.toInstant) > b)
    })
  }
}
