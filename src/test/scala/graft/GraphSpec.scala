package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chains, cliques, and singleton-free output") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long path converges to one component") {
    // path 0-1-2-...-12: diameter > a couple rounds, exercises the loop
    val edges = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Graph.connectedComponents(edges).as[(Long, Long)].collect()
    assert(got.length == 13 && got.forall(_._2 == 0L))
  }
}
