package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, EqualTo, Literal, Multiply, PredicateHelper, Rand}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LocalRelation, LogicalPlan, Project, Range}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** The q211 salt decision promoted into the PHYSICAL layer (VERDICT r18
  * #5): until now the graded audit decided salt-vs-plain and a spec
  * executed the verdict by hand (the q89 pattern — the user salts their
  * own join); here the SAME decision, priced from the SAME maintained
  * artifacts, rewrites the join automatically. One join text, two
  * physical outcomes purely from conf + catalog.
  *
  * The decision is q211's per-task row budget verbatim
  * ([[graft.ops.Planner.q211SkewSaltDecision]], reference
  * partitioner/index.js:17–23 for why no hash function can fix it): a
  * join key whose maintained S31 MCV head carries more rows than
  * `table rows ÷ shuffle partitions` CANNOT be balanced by hash
  * partitioning — that key's mass all lands in one task. When the flag
  * is on and the catalog flags exactly one side's key hot, the join
  *
  *   σ(fact) ⋈_{k = d} dim
  *
  * is rewritten to the classic salted form:
  *
  *   (fact + salt_f := ⌊rand·S⌋) ⋈_{k = d ∧ salt_f = salt_d} (dim × [0, S))
  *
  * — the hot side's rows scatter over S salt slots, the other side
  * replicates S ways (a `Range(0, S)` cross — S rows of metadata), and
  * a top `Project` restores the original output, so results are
  * byte-identical (every fact row meets every dim replica exactly once
  * on its own salt). S is derived from the catalog, not guessed:
  * `clamp(⌈maxHead ÷ budget⌉, 2, partitions)` — just enough slots to
  * bring the hottest key under the per-task budget.
  *
  * Scope guards (an optimizer rule must never make a plan wrong):
  * hint-free, deterministic-condition joins of the SOUND types only —
  * inner (either side hot), left semi / left anti / left outer (left
  * side hot), right outer (right side hot); full outer is never salted
  * (the replicated side's unmatched rows would emit once per salt —
  * see [[saltableType]] for the per-type proof sketch). The hot side
  * must classify to exactly one cataloged table by column-name
  * evidence through a plain Filter/Project access path, AND the join
  * key itself must be one of that table's cataloged columns (ADVICE
  * r19: the mcv map is name-keyed, so a side that merely shares a
  * column name with some cataloged table must not have its hotness
  * read off foreign stats). A join whose condition already references
  * a salt column is SETTLED (the fixpoint guard). The FIRST equi-edge
  * with exactly one hot side decides; edges with BOTH sides hot are
  * skipped, not terminal (ADVICE r19 — a later single-hot edge may
  * still salt; the transform is semantics-preserving for any chosen
  * edge). `rand` lands in a `Project` — nondeterminism never enters
  * the join condition itself, and the replicated-dim completion makes
  * the output independent of which salt each row draws.
  *
  * REPLICATION BOUND (ADVICE r19, medium): the replicated side is
  * cross-joined with `Range(0, S)`, so its S-fold copy becomes real
  * shuffle input — salting a hot key against a 100 TB dim would trade
  * one skewed task for S × 100 TB of shuffle, and AQE cannot undo a
  * committed logical plan. The rewrite therefore requires an UPPER
  * BOUND on the replicated side's rows (cataloged rows for a
  * classified leaf, exact counts for local/range leaves, the product
  * across joins — never an unbounded guess) and fires only when
  * bound × S ≤ [[SkewSaltJoin.ReplCapKey]] (default 50M rows). A side
  * whose size the catalog cannot bound is never replicated. The
  * reorder rule's skew-aware charge (VERDICT r19 #2) is the other half
  * of the same discipline: it steers the hot crossing toward the shape
  * with the cheapest replicated side BEFORE this rule prices the cap.
  *
  * Relation to AQE: `OptimizeSkewedJoin` splits oversized partitions at
  * RUNTIME, after the skewed shuffle has already materialized its map
  * output, and only for sort-merge shapes between shuffle stages. This
  * rule spends ≤ |head| metadata rows BEFORE any 100 TB shuffle
  * commits — the two compose (AQE still re-plans whatever residual
  * skew the salt leaves). Off by default ([[SkewSaltJoin.SaltKey]]);
  * enabled per session next to the reorder rule's catalog conf.
  */
case class SkewSaltJoin(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import CatalogJoinReorder.{Catalog, CatalogKey, TableStats}
  import SkewSaltJoin._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = scala.util.Try(
      conf.getConfString(SaltKey, "false").toBoolean).getOrElse(false)
    val path = conf.getConfString(CatalogKey, "")
    if (!enabled || path.isEmpty) plan
    else CatalogJoinReorder.load(session, path) match {
      case Some(cat) => plan.transformUp {
        // the fixpoint guard is COLUMN-FLOW based, not just
        // condition-based: Spark's own ReorderJoin may restructure a
        // salted cluster mid-fixpoint (the salt conjunct migrates to a
        // different join of the flattened region), exposing an inner
        // join whose own condition carries no salt reference — but any
        // join INSIDE the cluster sees a salt column in a child's
        // output until the outer Project strips it, so "either child
        // outputs a salt column" marks the whole cluster settled
        // (without it the two rules re-salt a reshaped region every
        // iteration and the plan grows to the iteration cap).
        case j @ Join(_, _, jt, Some(cond), JoinHint.NONE)
            if saltableType(jt) && cond.deterministic &&
              !cond.references.exists(_.name.startsWith(SaltPrefix)) &&
              !j.left.output.exists(_.name.startsWith(SaltPrefix)) &&
              !j.right.output.exists(_.name.startsWith(SaltPrefix)) =>
          saltJoin(j, cat).getOrElse(j)
      }
      case None => plan // catalog mid-load on this thread
    }
  }

  /** A plain Filter/Project access path over a bare relation resolving
    * to exactly one cataloged table (the reorder rule's classification
    * contract — an aggregate/subquery leaf must not be priced at
    * base-table stats). */
  private def classify(p: LogicalPlan, cat: Catalog): Option[TableStats] = {
    def plain(q: LogicalPlan): Boolean = q match {
      case Filter(_, ch) => plain(ch)
      case Project(_, ch) => plain(ch)
      case other => other.children.isEmpty
    }
    if (!plain(p)) None
    else {
      val names = p.output.map(_.name).toSet
      cat.tables.filter(t => t.cols.exists(names)) match {
        case Seq(one) => Some(one)
        case _ => None
      }
    }
  }

  /** Join types the salt transform is SOUND for — the proof obligation
    * is that replicating the non-hot side S ways and completing every
    * salt changes no output row (r19 extension past Inner):
    *
    *  - Inner: each (left, right) match pair meets on exactly the left
    *    row's salt — output identical; either side may be hot.
    *  - LeftSemi / LeftAnti: output = LEFT rows filtered by match
    *    existence, and the replicated right side makes "∃ match in my
    *    salt" ≡ "∃ match at all" — but ONLY the left side may be hot
    *    (replicating the left would emit each kept row once per salt).
    *  - LeftOuter: all left rows survive (matched per right match,
    *    unmatched once with nulls — the salt never manufactures or
    *    drops a null row because the right side is never emitted
    *    unmatched); hot side must be LEFT — replicating the LEFT of an
    *    outer join would emit every unmatched left row S times.
    *  - RightOuter: the mirror — hot side must be RIGHT.
    *  - FullOuter is NOT saltable: the replicated side's unmatched rows
    *    would be emitted once per salt.
    *
    * [[sideMaySalt]] encodes the per-type hot-side constraint. */
  private def saltableType(jt: JoinType): Boolean = jt match {
    case Inner | LeftSemi | LeftAnti | LeftOuter | RightOuter => true
    case _ => false
  }

  private def sideMaySalt(jt: JoinType, leftIsHot: Boolean): Boolean =
    jt match {
      case Inner => true
      case LeftSemi | LeftAnti | LeftOuter => leftIsHot
      case RightOuter => !leftIsHot
      case _ => false
    }

  /** An UPPER BOUND on a plan's output rows from the catalog and the
    * plan's own exact-size leaves (ADVICE r19 — the replication gate's
    * input): cataloged rows for a classified access path, exact counts
    * for local/range relations, the product across inner joins (output
    * ≤ |L|·|R|), pass-through for filters/projects (row-reducing or
    * row-preserving). None when any leaf is unboundable — such a side
    * is never replicated. */
  private def dimRowsUB(p: LogicalPlan, cat: Catalog): Option[BigInt] =
    classify(p, cat).map(t => BigInt(t.rows)).orElse(p match {
      case l: LocalRelation => Some(BigInt(l.data.length))
      case r: Range => Some(r.numElements)
      case Filter(_, ch) => dimRowsUB(ch, cat)
      case Project(_, ch) => dimRowsUB(ch, cat)
      case j: Join => for {
        a <- dimRowsUB(j.left, cat)
        b <- dimRowsUB(j.right, cat)
      } yield a * b
      case _ => None
    })

  private def saltJoin(j: Join, cat: Catalog): Option[LogicalPlan] = {
    val parts = math.max(session.sessionState.conf.numShufflePartitions, 1)
    // (max head frequency, per-task budget) when `attr` is this side's
    // join key, belongs to the side's classified table (ADVICE r19 —
    // never read hotness off a foreign table's same-named stats), and
    // the catalog flags it over budget
    def hotness(attr: Attribute, side: LogicalPlan): Option[(Long, Long)] =
      if (!side.outputSet.contains(attr)) None
      else for {
        t <- classify(side, cat)
        if t.cols.contains(attr.name)
        m <- cat.mcv.get(attr.name)
        maxHead <- m.head.values.maxOption
        budget = math.max(t.rows / parts, 1L)
        if maxHead > budget
      } yield (maxHead, budget)
    // the first equi-edge with exactly ONE hot side decides; two-hot
    // edges are skipped (a later single-hot edge may still salt)
    val hit = splitConjunctivePredicates(j.condition.get).iterator
      .collect { case EqualTo(a: Attribute, b: Attribute) => (a, b) }
      .map { case (a, b) =>
        (hotness(a, j.left).orElse(hotness(b, j.left)),
          hotness(a, j.right).orElse(hotness(b, j.right)))
      }
      .collectFirst {
        case (Some((mh, bud)), None)
            if sideMaySalt(j.joinType, leftIsHot = true) => (true, mh, bud)
        case (None, Some((mh, bud)))
            if sideMaySalt(j.joinType, leftIsHot = false) => (false, mh, bud)
      }
    val replCap = scala.util.Try(
      conf.getConfString(ReplCapKey, DefaultReplCap.toString).toLong)
      .getOrElse(DefaultReplCap)
    hit.filter { case (leftIsHot, maxHead, budget) =>
      // the REPLICATION GATE (ADVICE r19): bound × S must stay under
      // the conf'd ceiling, and an unboundable side never replicates
      val nSalt = math.min(
        math.max((maxHead + budget - 1) / budget, 2L), parts.toLong)
      val dim = if (leftIsHot) j.right else j.left
      val ok = dimRowsUB(dim, cat)
        .exists(ub => ub * nSalt <= BigInt(replCap))
      if (!ok) logInfo(s"SkewSaltJoin: hot key over budget but the " +
        s"replicated side is unbounded or over the $replCap-row " +
        "replication cap — left plain")
      ok
    }.map { case (leftIsHot, maxHead, budget) =>
      val nSalt = math.min(
        math.max((maxHead + budget - 1) / budget, 2L), parts.toLong)
      val (hot, dim) = if (leftIsHot) (j.left, j.right) else (j.right, j.left)
      val saltF = Alias(
        Cast(Multiply(Rand(Literal(SaltSeed)), Literal(nSalt.toDouble)),
          LongType), s"${SaltPrefix}f")()
      val hot2 = Project(hot.output :+ saltF, hot)
      val range = Range(0L, nSalt, 1L, None)
      val saltD = Alias(range.output.head, s"${SaltPrefix}d")()
      // the salt alias Project sits ABOVE the cross, not under it
      // (r20 fix, engine-measured): Spark's own ReorderJoin flattens
      // Join-typed children of an inner join, and with the cross as a
      // bare Join child it re-associated the cluster to
      // ((…⋈hot on key)⋈Range on salt) — the key join shuffled WITHOUT
      // the salt conjunct, so the skewed exchange survived and the
      // Range join degenerated into a post-hoc replica filter: the
      // rewrite was silently neutralized exactly when it mattered. An
      // Alias-carrying Project between the salted join and the cross
      // stops ExtractFiltersAndInnerJoins from flattening through
      // (the hot side already survives for the same reason), so the
      // planned exchange hashes on (key, salt) and the hot key's mass
      // genuinely spreads over the S slots.
      val dim2 = Project(dim.output :+ saltD,
        Join(dim, range, Cross, None, JoinHint.NONE))
      val cond2 = And(j.condition.get,
        EqualTo(saltF.toAttribute, saltD.toAttribute))
      val (l2, r2) = if (leftIsHot) (hot2, dim2) else (dim2, hot2)
      logInfo(s"SkewSaltJoin: hot key over budget " +
        s"(max head $maxHead > $budget rows/task) — ${j.joinType} " +
        s"salted $nSalt ways")
      Project(j.output,
        Join(l2, r2, j.joinType, Some(cond2), JoinHint.NONE))
    }
  }
}

object SkewSaltJoin {

  /** Session conf: enable the automatic salt rewrite (default false).
    * Reads the same catalog root as [[CatalogJoinReorder.CatalogKey]]. */
  val SaltKey = "spark.graft.join.salt"

  /** Name prefix of the injected salt columns — a join whose condition
    * already references one is settled (the fixpoint guard). */
  val SaltPrefix = "__graft_salt_"

  /** Fixed rand seed: replay-stable salting (the draw itself is free to
    * vary — the replicated dim side makes results salt-independent). */
  val SaltSeed = 19L

  /** Session conf: ceiling on nSalt × (replicated-side row upper bound)
    * — the replication gate (ADVICE r19). Default [[DefaultReplCap]]. */
  val ReplCapKey = "spark.graft.join.salt.replCap"

  /** 50M replicated rows: generous for a genuine dimension (a 1M-row
    * dim × 32 salts passes) while refusing the fact-sized replications
    * that would out-shuffle the skew they fix (a 100M-row side × 32
    * needs an explicit conf raise and a reason). */
  val DefaultReplCap = 50000000L
}
