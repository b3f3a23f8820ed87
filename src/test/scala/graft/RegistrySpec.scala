package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gate-registration integrity — failures here are silent in Scala's
  * Map semantics (a duplicate key just overwrites), so the contract
  * is pinned explicitly:
  *   - no two operator modules may claim the same gate name (a
  *     collision would silently shadow one module's gate);
  *   - every registered query carries an oracle, except the known
  *     symbolic-replay gate whose SQL is generated from the trained
  *     artifact at Verify time (t14);
  *   - no oracle exists without its query (an orphan oracle means a
  *     gate was renamed on one side only).
  */
class RegistrySpec extends AnyFunSuite {

  private def queryModules: Seq[(String, Set[String])] = Seq(
    "Relational" -> graft.queries.Relational.queries.keySet,
    "EngineQueries" -> graft.queries.EngineQueries.queries.keySet,
    "TextAnalysis" -> graft.operators.TextAnalysis.queries.keySet,
    "Dedup" -> graft.operators.Dedup.queries.keySet,
    "Similarity" -> graft.operators.Similarity.queries.keySet,
    "Multimodal" -> graft.operators.Multimodal.queries.keySet,
    "Pipelines" -> graft.operators.Pipelines.queries.keySet,
    "Sketches" -> graft.operators.Sketches.queries.keySet)

  private def oracleModules: Seq[(String, Set[String])] = Seq(
    "Relational" -> graft.queries.Relational.oracle.keySet,
    "EngineQueries" -> graft.queries.EngineQueries.oracle.keySet,
    "TextAnalysis" -> graft.operators.TextAnalysis.oracle.keySet,
    "Dedup" -> graft.operators.Dedup.oracle.keySet,
    "Similarity" -> graft.operators.Similarity.oracle.keySet,
    "Multimodal" -> graft.operators.Multimodal.oracle.keySet,
    "Pipelines" -> graft.operators.Pipelines.oracle.keySet,
    "Sketches" -> graft.operators.Sketches.oracle.keySet)

  test("no gate name is claimed by two modules") {
    for (mods <- Seq(queryModules, oracleModules)) {
      val all = mods.flatMap { case (m, ks) => ks.map(_ -> m) }
      val dups = all.groupBy(_._1).filter(_._2.size > 1)
      assert(dups.isEmpty,
        s"gate names registered twice: ${dups.view.mapValues(_.map(_._2)).toMap}")
    }
  }

  test("every query has an oracle (t14's is generated at Verify time) and no oracle is orphaned") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o) == Set("t14_bpe_tokens"),
      s"queries missing an oracle: ${(q -- o) - "t14_bpe_tokens"}")
    assert((o -- q).isEmpty, s"orphan oracles: ${o -- q}")
  }

  test("gate names follow the family prefix convention") {
    val pat = "^[a-z][0-9]{2}_[a-z0-9_]+$".r
    val bad = SparkEntry.queries.keySet.filterNot(n =>
      pat.matches(n) || n.startsWith("g0"))
    assert(bad.isEmpty, s"unconventional gate names: $bad")
  }
}
