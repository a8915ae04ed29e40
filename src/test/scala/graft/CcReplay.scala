package graft

/** Independent connected-components ground truth for the semantic-cluster
  * oracle split (SURVEY §5 note 14): the hash-green `sim_semantic_edges*`
  * rows carry the exact CC input through the DuckDB compare, and this
  * union-find replays the closure that was retired from SQL (DuckDB's
  * recursive-CTE reachability is quadratic in cluster size — 117–351 s
  * per variant at sf0.01). Shared by Round13/15/16Spec so the replay
  * logic cannot drift between the three width variants.
  */
object CcReplay {

  /** Min-label component id for every node in `all`, given undirected
    * edges (direction irrelevant); nodes absent from `edges` label
    * themselves — the singleton-fill rule of `clusterStage`.
    */
  def labels(edges: Iterable[(Long, Long)],
      all: Iterable[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    all.map(v => v -> find(v)).toMap
  }

  /** Component sizes keyed by the min-label id. */
  def sizes(lbl: Map[Long, Long]): Map[Long, Long] =
    lbl.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
}
