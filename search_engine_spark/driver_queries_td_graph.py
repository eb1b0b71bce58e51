"""Link-graph pairs: PageRank family, centralities, components, structure.

Split out of driver_queries_td.py (see that module for the shared pair
contract). Constants used only by this domain's pairs are defined here —
the per-module grep surface CLAUDE.md invariant 8 asks for.
"""

from __future__ import annotations
import math
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from .pair_helpers import (
    SQL_FIXED6_LONG,
    SQL_SUM_FIXED6,
    SQL_WS_TOKENS,
    doc_frequencies,
    fixed6_long,
    ntz_epoch_us,
    scalar_count,
    sum_fixed6,
)
from .stopwords import STOPWORDS
from .training_data import dedup as D
from .training_data import similarity as S
from .training_data import textstats as X
from .training_data.multimodal import synthesize_media
from .driver_queries_td_shared import (
    MARKOV_ITERS,
    ND_BANDS,
    ND_PLANES,
    TOKEN_RUN,
    _BASE_GENS,
    _EDGES_CTE,
    _EMB_DIM,
    _MARKOV_CTES,
    _SQL_TD_STOPWORD_LIST,
    _TD_STOPWORDS,
    _edges,
    _edges_cte,
    _markov_chain,
    _read,
    _srp_cte,
)

# the triangle pair adds the two-hop composition of 7x+13 so the graph
# actually closes wedges — the base two-generator graph is triangle-free
_TRI_GENS = _BASE_GENS + ((49, 104),)


# --------------------------------------------------------------------------
# Link reciprocity report (graph health): per source node with at least one
# reciprocated out-edge, the out-degree, reciprocated count, and rate —
# Newman reciprocity resolved to node granularity, over the triangle-
# closing generator graph (the base two-generator graph is near-
# reciprocity-free by construction). The reciprocation test is an
# ids-only self-join on the uniform node key.
# --------------------------------------------------------------------------
def q_link_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, _TRI_GENS)
    rev = edges.select(
        F.col("target_doc_id").alias("source_doc_id"),
        F.col("source_doc_id").alias("target_doc_id"),
    )
    recip = (
        edges.join(rev, ["source_doc_id", "target_doc_id"], "semi")
        .groupBy("source_doc_id")
        .agg(F.count(F.lit(1)).alias("n_reciprocated"))
    )
    outd = edges.groupBy("source_doc_id").agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    return (
        outd.join(recip, "source_doc_id")
        .select(
            F.col("source_doc_id").alias("doc_id"),
            "out_degree",
            "n_reciprocated",
            F.round(
                F.col("n_reciprocated") / F.col("out_degree"), 6
            ).alias("recip_rate"),
        )
    )


SQL_LINK_RECIPROCITY = f"""
WITH {_edges_cte(_TRI_GENS)},
recip AS (
  SELECT a.source_doc_id, CAST(count(*) AS BIGINT) AS n_reciprocated
  FROM edges a
  WHERE EXISTS (
    SELECT 1 FROM edges b
    WHERE b.source_doc_id = a.target_doc_id
      AND b.target_doc_id = a.source_doc_id
  )
  GROUP BY a.source_doc_id
),
outd AS (
  SELECT source_doc_id, CAST(count(*) AS BIGINT) AS out_degree
  FROM edges GROUP BY source_doc_id
)
SELECT o.source_doc_id AS doc_id, out_degree, n_reciprocated,
       round(n_reciprocated / out_degree, 6) AS recip_rate
FROM outd o JOIN recip r USING (source_doc_id)
"""



def q_degree_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    outd = edges.groupBy(F.col("source_doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    ind = edges.groupBy(F.col("target_doc_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("in_links")
    )
    return (
        docs.join(outd, "doc_id", "left")
        .join(ind, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_links", F.lit(0)).alias("in_links"),
        )
    )


SQL_DEGREE_COUNTS = f"""
WITH {_EDGES_CTE},
outd AS (SELECT source_doc_id AS doc_id, count(*) AS out_degree
         FROM edges GROUP BY source_doc_id),
ind AS (SELECT target_doc_id AS doc_id, count(*) AS in_links
        FROM edges GROUP BY target_doc_id)
SELECT d.doc_id,
       COALESCE(o.out_degree, 0) AS out_degree,
       COALESCE(i.in_links, 0) AS in_links
FROM documents d
LEFT JOIN outd o ON o.doc_id = d.doc_id
LEFT JOIN ind i ON i.doc_id = d.doc_id
"""


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-constant PageRank (d=0.85, 20 fixed iterations, dangling
    mass dropped) as the iterative DataFrame job, vs a recursive-CTE oracle.
    """
    from .operators.pagerank import build_document_authority

    docs, edges = _edges(spark, sf_dir)
    auth = build_document_authority(docs, edges)
    return auth.select(
        "doc_id", F.round("pagerank", 9).alias("pagerank"), "inlink_count"
    )


SQL_PAGERANK = f"""
WITH RECURSIVE {_EDGES_CTE},
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents  -- zero-weight self-loop keeps every node in each iteration
),
pr AS (
  SELECT 0 AS iter, doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM documents
  UNION ALL
  SELECT pr.iter + 1, e.dst AS doc_id,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(pr.rank * e.w) AS rank
  FROM pr JOIN edges_w e ON e.src = pr.doc_id
  WHERE pr.iter < 20
  GROUP BY pr.iter + 1, e.dst
),
ind AS (SELECT target_doc_id AS doc_id, count(*)::INT AS inlink_count
        FROM edges GROUP BY target_doc_id)
SELECT pr.doc_id, round(pr.rank, 9) AS pagerank,
       COALESCE(i.inlink_count, 0) AS inlink_count
FROM pr LEFT JOIN ind i ON i.doc_id = pr.doc_id
WHERE pr.iter = 20
"""


def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) over the same synthetic link
    graph as ``pagerank`` — the exact-integer Jacobi formulation
    (``operators/pagerank.hits_scores``): unnormalized BIGINT trajectories
    are order-free and bit-identical across engines (invariant 4 by
    omission); the only floats are two final divides by the max, rounded 6.
    The oracle replays all 20 iterations in one recursive CTE, carrying
    both scores per row — hub and auth messages travel a single unioned
    relation so the recursive term references the CTE once.
    """
    from .operators.pagerank import hits_scores

    docs, edges = _edges(spark, sf_dir)
    return hits_scores(docs, edges)


SQL_HITS_SCORES = f"""
WITH RECURSIVE {_EDGES_CTE},
msgs AS (
  -- is_auth=1: hub(source) contributes to auth(target);
  -- is_auth=0: auth(target) contributes back to hub(source);
  -- is_auth=2: zero-contribution self loop keeps isolated nodes present
  SELECT source_doc_id AS from_node, target_doc_id AS to_node, 1 AS is_auth
  FROM edges
  UNION ALL
  SELECT target_doc_id, source_doc_id, 0 FROM edges
  UNION ALL
  SELECT doc_id, doc_id, 2 FROM documents
),
hits AS (
  SELECT 0 AS iter, doc_id,
         CAST(1 AS BIGINT) AS hub, CAST(1 AS BIGINT) AS auth
  FROM documents
  UNION ALL
  SELECT h.iter + 1, m.to_node AS doc_id,
         CAST(sum(CASE WHEN m.is_auth = 0 THEN h.auth ELSE 0 END)
              AS BIGINT) AS hub,
         CAST(sum(CASE WHEN m.is_auth = 1 THEN h.hub ELSE 0 END)
              AS BIGINT) AS auth
  FROM hits h JOIN msgs m ON m.from_node = h.doc_id
  WHERE h.iter < 20
  GROUP BY h.iter + 1, m.to_node
),
fin AS (SELECT doc_id, hub, auth FROM hits WHERE iter = 20)
SELECT doc_id, hub, auth,
       CASE WHEN max(hub) OVER () > 0
            THEN round(CAST(hub AS DOUBLE) / max(hub) OVER (), 6)
       END AS hub_score,
       CASE WHEN max(auth) OVER () > 0
            THEN round(CAST(auth AS DOUBLE) / max(auth) OVER (), 6)
       END AS auth_score
FROM fin
"""


# --------------------------------------------------------------------------
# Per-node triangle counts + local clustering coefficient over the link
# graph (operators/pagerank.py triangle_counts — degree-ordered
# "compact-forward" orientation, O(m^1.5) wedge work regardless of skew;
# the web-spam density signal of Becchetti et al. KDD'08). The edge set
# adds a third deterministic generator (x -> 49x+104 = the two-hop
# composition of the 7x+13 generator) so the synthetic graph actually
# closes wedges — the base two-generator graph is triangle-free at every
# sf. All counts BIGINT; clustering is the one rounded divide.
# --------------------------------------------------------------------------
_TRI_EDGES_CTE = _edges_cte(_TRI_GENS)


def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.pagerank import triangle_counts

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return triangle_counts(edges)


SQL_TRIANGLE_COUNTS = f"""
WITH {_TRI_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS v FROM und UNION ALL SELECT b FROM und
  ) GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS src,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS dst,
         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN db.d ELSE da.d END AS dd
  FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b
),
tri AS (
  SELECT x.src AS u, x.dst AS v, y.dst AS w
  FROM o x JOIN o y ON y.src = x.src AND ((x.dd, x.dst) < (y.dd, y.dst))
  JOIN o z ON z.src = x.dst AND z.dst = y.dst
),
corners AS (
  SELECT u AS v FROM tri UNION ALL SELECT v FROM tri UNION ALL SELECT w FROM tri
),
tcnt AS (SELECT v, CAST(count(*) AS BIGINT) AS triangles FROM corners GROUP BY v)
SELECT d.v AS doc_id, d.d AS degree,
       CAST(COALESCE(t.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.d >= 2 THEN
         round(CAST(2 * COALESCE(t.triangles, 0) AS DOUBLE) / (d.d * (d.d - 1)), 6)
       ELSE CAST(0 AS DOUBLE) END AS clustering
FROM deg d LEFT JOIN tcnt t ON t.v = d.v
"""


BFS_SEED_MOD = 97
BFS_ITERS = 10


def q_link_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS crawl depth (`operators/pagerank.bfs_distance`):
    min hops from the doc_id%97==0 seed set along the synthetic link
    graph, exactly 10 relaxation rounds (fixed horizon — identical output
    across engines regardless of diameter); unreached docs absent. Pure
    integers. The oracle replays the rounds in one recursive CTE; the
    zero-weight self message keeps each node's current distance in play so
    the recursive term references the CTE once.
    """
    from .operators.pagerank import bfs_distance

    docs, edges = _edges(spark, sf_dir)
    seeds = docs.filter(F.col("doc_id") % BFS_SEED_MOD == 0)
    return bfs_distance(seeds, edges, iterations=BFS_ITERS)


SQL_LINK_DISTANCE = f"""
WITH RECURSIVE {_EDGES_CTE},
msgs AS (
  SELECT source_doc_id AS from_node, target_doc_id AS to_node, 1 AS w
  FROM edges
  UNION ALL
  SELECT doc_id, doc_id, 0 FROM documents
),
bfs AS (
  SELECT 0 AS iter, doc_id, CAST(0 AS BIGINT) AS dist
  FROM documents WHERE doc_id % {BFS_SEED_MOD} = 0
  UNION ALL
  SELECT b.iter + 1, m.to_node AS doc_id,
         CAST(min(b.dist + m.w) AS BIGINT) AS dist
  FROM bfs b JOIN msgs m ON m.from_node = b.doc_id
  WHERE b.iter < {BFS_ITERS}
  GROUP BY 1, 2
)
SELECT doc_id, dist FROM bfs WHERE iter = {BFS_ITERS}
"""


PPR_SEED_MOD = 71


def q_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002) with the teleport uniform
    over the doc_id%71==0 seed set, 20 iterations, dangling mass dropped
    (`operators/pagerank.personalized_pagerank`); same recursive-CTE
    oracle shape as the global `pagerank` pair, rounded 9.
    """
    from .operators.pagerank import personalized_pagerank

    docs, edges = _edges(spark, sf_dir)
    seeds = docs.filter(F.col("doc_id") % PPR_SEED_MOD == 0)
    ppr = personalized_pagerank(docs, edges, seeds)
    return ppr.select("doc_id", F.round("ppr", 9).alias("ppr"))


SQL_PERSONALIZED_PAGERANK = f"""
WITH RECURSIVE {_EDGES_CTE},
ss AS (SELECT count(*) AS k FROM documents WHERE doc_id % {PPR_SEED_MOD} = 0),
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents  -- zero-weight self-loop keeps every node in each iteration
),
pr AS (
  SELECT 0 AS iter, doc_id,
         CASE WHEN doc_id % {PPR_SEED_MOD} = 0
              THEN 1.0 / (SELECT k FROM ss) ELSE 0.0 END AS rank
  FROM documents
  UNION ALL
  SELECT pr.iter + 1, e.dst AS doc_id,
         CASE WHEN e.dst % {PPR_SEED_MOD} = 0
              THEN (1 - 0.85) / (SELECT k FROM ss) ELSE 0.0 END
         + 0.85 * sum(pr.rank * e.w) AS rank
  FROM pr JOIN edges_w e ON e.src = pr.doc_id
  WHERE pr.iter < 20
  GROUP BY pr.iter + 1, e.dst
)
SELECT doc_id, round(rank, 9) AS ppr FROM pr WHERE iter = 20
"""


def q_graph_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row global graph mixing report over the 3-generator graph:
    edge/node counts, reciprocity (fraction of directed edges whose
    reverse exists — Garlaschelli & Loffredo 2004), and undirected degree
    assortativity (Newman 2002's Pearson r over edge-endpoint degrees,
    plain-degree variant, both orientations counted). All moments are
    exact BIGINT sums (invariant 4): the only floats are the reciprocity
    divide and the single assortativity expression — its two variance
    factors are exact sub-2^53 BIGINTs cast to DOUBLE before the product
    (a BIGINT product could overflow; the double product rounds
    identically in both engines) — each rounded 6. Everything is in-plan
    1-row aggregates cross-joined (scalar_count pattern, zero driver
    actions).
    """
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    e = edges.cache()
    rev = e.select(
        F.col("target_doc_id").alias("source_doc_id"),
        F.col("source_doc_id").alias("target_doc_id"),
    )
    ecnt = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    rcnt = e.join(rev, ["source_doc_id", "target_doc_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_recip")
    )
    und = (
        e.select(
            F.least("source_doc_id", "target_doc_id").alias("a"),
            F.greatest("source_doc_id", "target_doc_id").alias("b"),
        )
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("d"))
    ncnt = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    pairs = (
        sym.join(deg.select(F.col("a"), F.col("d").alias("dx")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("d").alias("dy")), "b"
        )
    )
    mom = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("dx").cast("long").alias("sx"),
        F.sum("dy").cast("long").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("long").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("long").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("long").alias("sxy"),
    )
    vx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        ecnt.crossJoin(rcnt)
        .crossJoin(ncnt)
        .crossJoin(mom)
        .select(
            "n_nodes",
            "n_edges",
            F.round(
                F.col("n_recip").cast("double") / F.col("n_edges"), 6
            ).alias("reciprocity"),
            F.when(
                (vx > 0) & (vy > 0),
                F.round(
                    num.cast("double")
                    / F.sqrt(vx.cast("double") * vy.cast("double")),
                    6,
                ),
            ).alias("assortativity"),
        )
    )


SQL_GRAPH_MIXING = f"""
WITH {_TRI_EDGES_CTE},
ecnt AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM edges),
rcnt AS (
  SELECT CAST(count(*) AS BIGINT) AS n_recip
  FROM edges e JOIN edges r
    ON r.source_doc_id = e.target_doc_id
   AND r.target_doc_id = e.source_doc_id
),
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY a),
ncnt AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x.d) AS BIGINT) AS sx, CAST(sum(y.d) AS BIGINT) AS sy,
         CAST(sum(x.d * x.d) AS BIGINT) AS sxx,
         CAST(sum(y.d * y.d) AS BIGINT) AS syy,
         CAST(sum(x.d * y.d) AS BIGINT) AS sxy
  FROM sym s JOIN deg x ON x.a = s.a JOIN deg y ON y.a = s.b
)
SELECT n.n_nodes, e.n_edges,
       round(CAST(r.n_recip AS DOUBLE) / e.n_edges, 6) AS reciprocity,
       CASE WHEN (m.m * m.sxx - m.sx * m.sx) > 0
             AND (m.m * m.syy - m.sy * m.sy) > 0 THEN
         round(CAST(m.m * m.sxy - m.sx * m.sy AS DOUBLE)
               / sqrt(CAST(m.m * m.sxx - m.sx * m.sx AS DOUBLE)
                      * CAST(m.m * m.syy - m.sy * m.sy AS DOUBLE)), 6)
       END AS assortativity
FROM ecnt e, rcnt r, ncnt n, mom m
"""


LPA_ROUNDS = 5


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (Raghavan et al. 2007
    with (count desc, label asc) tie-break instead of RNG) on the
    3-generator undirected graph, exactly 5 rounds
    (`operators/pagerank.label_propagation`). Pure integers; the oracle
    unrolls the rounds as a MATERIALIZED-CTE ladder with a per-node
    QUALIFY argmax (window keyed on the uniform node id).
    """
    from .operators.pagerank import label_propagation

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return label_propagation(edges, rounds=LPA_ROUNDS)


def _lpa_sql(rounds: int) -> str:
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
)""",
        "sym AS MATERIALIZED (SELECT a, b FROM und"
        " UNION ALL SELECT b, a FROM und)",
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS v, a AS label FROM sym)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"l{r} AS MATERIALIZED ("
            f"SELECT s.a AS v, l.label,"
            f" CAST(count(*) AS BIGINT) AS n"
            f" FROM sym s JOIN l{r - 1} l ON l.v = s.b"
            f" GROUP BY 1, 2"
            f" QUALIFY row_number() OVER (PARTITION BY s.a"
            f" ORDER BY count(*) DESC, l.label ASC) = 1)"
        )
    chain = ",\n".join(parts)
    return (
        f"WITH {_TRI_EDGES_CTE.rstrip()},\n{chain}\n"
        f"SELECT v AS doc_id, CAST(label AS BIGINT) AS label FROM l{rounds}"
    )


SQL_LABEL_PROPAGATION = _lpa_sql(LPA_ROUNDS)


def q_degree_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k_nn(k) mean-neighbor-degree curve (Pastor-Satorras, Vázquez &
    Vespignani 2001) over the 3-generator undirected graph — the
    per-degree-class companion to the scalar assortativity in
    `graph_mixing` (a falling curve = hubs attach to leaves). EXACT:
    because every node of degree k has exactly k neighbors, the average
    of per-node neighbor-degree means over class k equals
    Σ_class Σ_neighbors d(u) / (k·n_k) — ONE divide of exact BIGINTs,
    rounded 6 (invariant 4); no nested fractions. Shuffles key on node
    ids and the bounded degree class, map-side partials throughout.
    """
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("a"),
            F.greatest("source_doc_id", "target_doc_id").alias("b"),
        )
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("d"))
    nbr = (
        sym.join(deg.select(F.col("a").alias("b"), F.col("d").alias("db")), "b")
        .groupBy("a")
        .agg(F.sum("db").cast("long").alias("nbr_sum"))
    )
    return (
        deg.join(nbr, "a")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.sum("nbr_sum").cast("long").alias("s"),
        )
        .select(
            F.col("d").alias("degree"),
            "n_nodes",
            F.round(
                F.col("s").cast("double") / (F.col("d") * F.col("n_nodes")), 6
            ).alias("knn"),
        )
    )


SQL_DEGREE_CORRELATION = f"""
WITH {_TRI_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY a),
nbr AS (
  SELECT s.a, CAST(sum(x.d) AS BIGINT) AS nbr_sum
  FROM sym s JOIN deg x ON x.a = s.b
  GROUP BY s.a
)
SELECT g.d AS degree, CAST(count(*) AS BIGINT) AS n_nodes,
       round(CAST(CAST(sum(n.nbr_sum) AS BIGINT) AS DOUBLE)
             / (g.d * count(*)), 6) AS knn
FROM deg g JOIN nbr n USING (a)
GROUP BY g.d
"""


KCORE_K = 5
KCORE_ROUNDS = 8


def q_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (Seidman 1983) over the 3-generator undirected
    graph: exactly 8 synchronous rounds at k=5 (`operators/pagerank.
    k_core`) — a fixed horizon, so both engines emit the identical
    survivor set whether or not peeling has converged. The oracle unrolls
    the rounds as a chained-CTE ladder (the bpe_merges precedent — a
    recursive CTE can't reference itself twice per round, which the
    both-endpoints survivor test needs). Pure-integer degrees.
    """
    from .operators.pagerank import k_core

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return k_core(edges, k=KCORE_K, rounds=KCORE_ROUNDS)


def _kcore_sql(k: int, rounds: int) -> str:
    # every c{r} is referenced TWICE by d{r+1} (both-endpoint survivor
    # test): without MATERIALIZED DuckDB inlines CTEs and the ladder
    # re-evaluates 2^rounds times
    parts = [
        """und AS MATERIALIZED (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
)""",
        "sym AS MATERIALIZED (SELECT a, b FROM und"
        " UNION ALL SELECT b, a FROM und)",
        "c0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM sym)",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT s.a AS v,"
            f" CAST(count(*) AS BIGINT) AS c"
            f" FROM sym s JOIN c{r - 1} x ON x.v = s.a"
            f" JOIN c{r - 1} y ON y.v = s.b"
            f" GROUP BY s.a HAVING count(*) >= {k})"
        )
        parts.append(f"c{r} AS MATERIALIZED (SELECT v FROM d{r})")
    chain = ",\n".join(parts)
    return (
        f"WITH {_TRI_EDGES_CTE.rstrip()},\n{chain}\n"
        f"SELECT v AS doc_id, c AS core_degree FROM d{rounds}"
    )


SQL_K_CORE = _kcore_sql(KCORE_K, KCORE_ROUNDS)


COCIT_MAX_IN_DEGREE = 64


def q_cocitation_coupling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-citation (Small 1973) + bibliographic coupling (Kessler 1963)
    over the 3-generator synthetic link graph — the related-pages signal
    (`operators/pagerank.cocitation_coupling`). Pure-integer counts; the
    coupling self-join stop-lists targets with in-degree > 64 (the hub-
    removal skew mitigation, part of the semantics — applied identically
    in the oracle, though the synthetic in-degrees never reach it).
    """
    from .operators.pagerank import cocitation_coupling

    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    return cocitation_coupling(edges, max_in_degree=COCIT_MAX_IN_DEGREE)


SQL_COCITATION_COUPLING = f"""
WITH {_TRI_EDGES_CTE},
cocit AS (
  SELECT e1.target_doc_id AS a, e2.target_doc_id AS b,
         CAST(count(*) AS BIGINT) AS cocitation
  FROM edges e1 JOIN edges e2 ON e1.source_doc_id = e2.source_doc_id
  WHERE e1.target_doc_id < e2.target_doc_id
  GROUP BY 1, 2
),
indeg AS (
  SELECT target_doc_id AS dst, count(*) AS ind FROM edges GROUP BY 1
),
kept AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst
  FROM edges e JOIN indeg i ON i.dst = e.target_doc_id
  WHERE i.ind <= {COCIT_MAX_IN_DEGREE}
),
coup AS (
  SELECT c1.src AS a, c2.src AS b, CAST(count(*) AS BIGINT) AS coupling
  FROM kept c1 JOIN kept c2 ON c1.dst = c2.dst
  WHERE c1.src < c2.src
  GROUP BY 1, 2
)
SELECT COALESCE(cc.a, cp.a) AS doc_a, COALESCE(cc.b, cp.b) AS doc_b,
       CAST(COALESCE(cc.cocitation, 0) AS BIGINT) AS cocitation,
       CAST(COALESCE(cp.coupling, 0) AS BIGINT) AS coupling
FROM cocit cc FULL OUTER JOIN coup cp ON cp.a = cc.a AND cp.b = cc.b
"""


# --------------------------------------------------------------------------
# Inbound anchor-text aggregation (Brin & Page 1998 §2.2: anchor words
# describe the TARGET page better than its own text — the classic
# web-index signal alongside the reference's title/description field
# weights, search_service.py:31-35). Edges reuse link_resolve's
# deterministic (doc_id*7+13) % N synthetic map; the anchor is the source
# page's first ANCHOR_WORDS tokens (lead words ≈ link text), stopword-
# filtered AFTER slicing so both engines see the identical phrase. A
# source contributes a term to a target at most once (distinct triple),
# then per-target terms rank by (citing-source count desc, term asc),
# keeping the top ANCHOR_TOP — the anchor summary a doc-partitioned index
# stores next to its postings. Scale shape: ≤ANCHOR_WORDS rows explode
# per source, only (ids, term) cross the shuffle, and the ranking window
# partitions by target_doc_id — a permutation-like %N key, no skew.
# --------------------------------------------------------------------------
ANCHOR_WORDS = 6
ANCHOR_TOP = 3


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    n_df = scalar_count(docs.select("doc_id"), as_double=False)
    anchors = (
        docs.crossJoin(F.broadcast(n_df))
        .select(
            F.col("doc_id").alias("source_doc_id"),
            ((F.col("doc_id") * 7 + 13) % F.col("_n")).alias("target_doc_id"),
            F.explode(
                F.slice(
                    F.regexp_extract_all(
                        F.lower("text"), F.lit(TOKEN_RUN), F.lit(0)
                    ),
                    1,
                    ANCHOR_WORDS,
                )
            ).alias("term"),
        )
        .filter(
            (F.col("source_doc_id") != F.col("target_doc_id"))
            & ~F.col("term").isin(_TD_STOPWORDS)
        )
    )
    per = (
        anchors.select("source_doc_id", "target_doc_id", "term")
        .distinct()
        .groupBy("target_doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("anchor_sources"))
    )
    w = Window.partitionBy("target_doc_id").orderBy(
        F.desc("anchor_sources"), F.asc("term")
    )
    return (
        per.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= ANCHOR_TOP)
        .select("target_doc_id", "rk", "term", "anchor_sources")
    )


SQL_ANCHOR_TEXT = f"""
WITH n AS (SELECT count(*) AS n FROM documents),
anchors AS (
  SELECT doc_id AS source_doc_id,
         (doc_id * 7 + 13) % n.n AS target_doc_id,
         unnest(list_slice(regexp_extract_all(lower(text), '{TOKEN_RUN}'),
                           1, {ANCHOR_WORDS})) AS term
  FROM documents, n
),
per AS (
  SELECT target_doc_id, term, CAST(count(*) AS BIGINT) AS anchor_sources
  FROM (
    SELECT DISTINCT source_doc_id, target_doc_id, term
    FROM anchors
    WHERE source_doc_id <> target_doc_id
      AND term NOT IN ({_SQL_TD_STOPWORD_LIST})
  )
  GROUP BY 1, 2
)
SELECT target_doc_id, CAST(rk AS BIGINT) AS rk, term, anchor_sources
FROM (
  SELECT *, row_number() OVER (PARTITION BY target_doc_id
                               ORDER BY anchor_sources DESC, term) AS rk
  FROM per
)
WHERE rk <= {ANCHOR_TOP}
"""


# --------------------------------------------------------------------------
# Link prediction (Liben-Nowell & Kleinberg 2003): common-neighbor count
# and Adamic-Adar score for non-adjacent doc pairs of the undirected
# link graph (the _TRI_GENS variant, whose two-hop generator closes
# wedges). AA = Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg w) with each hub term
# quantized to fixed6 BIGINT immediately (invariant 4: ln may differ by
# an ulp between libms, so round once per hub and sum integers; a wedge
# hub has ≥2 neighbors by construction, so ln(deg) > 0). Shape: wedge
# self-join on the hub carries ids only; existing edges drop via
# anti-join; fan-out is Σ deg(w)², bounded here by the affine generators
# (max degree ~6) — on a power-law web graph you'd cap hub degree first,
# exactly the standard AA practice.
# --------------------------------------------------------------------------
LP_TOP = 30


def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = edges.select(
        F.least("source_doc_id", "target_doc_id").alias("a"),
        F.greatest("source_doc_id", "target_doc_id").alias("b"),
    ).distinct()
    nb = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = nb.groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    x = nb.select(F.col("node").alias("w"), F.col("nbr").alias("u"))
    y = nb.select(F.col("node").alias("w"), F.col("nbr").alias("v"))
    wedges = x.join(y, "w").filter(F.col("u") < F.col("v"))
    cand = wedges.join(
        und,
        (wedges["u"] == und["a"]) & (wedges["v"] == und["b"]),
        "left_anti",
    )
    scored = cand.join(deg.withColumnRenamed("node", "w"), "w").select(
        "u",
        "v",
        F.round(F.lit(1000000.0) / F.log(F.col("d").cast("double")), 0)
        .cast("long")
        .alias("t6"),
    )
    return (
        scored.groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("common_neighbors"),
            F.sum("t6").cast("long").alias("aa6"),
        )
        .select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            "common_neighbors",
            "aa6",
            (F.col("aa6").cast("double") / F.lit(1000000.0)).alias("adamic_adar"),
        )
        .orderBy(F.desc("aa6"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(LP_TOP)
    )


SQL_LINK_PREDICTION = f"""
WITH {_TRI_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
                  greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
nb AS (SELECT a AS node, b AS nbr FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM nb GROUP BY node),
cand AS (
  SELECT x.node AS w, x.nbr AS u, y.nbr AS v
  FROM nb x JOIN nb y ON y.node = x.node AND x.nbr < y.nbr
  WHERE NOT EXISTS (
    SELECT 1 FROM und WHERE und.a = x.nbr AND und.b = y.nbr
  )
),
scored AS (
  SELECT u, v, CAST(round(CAST(1000000 AS DOUBLE) / ln(d)) AS BIGINT) AS t6
  FROM cand JOIN deg ON deg.node = cand.w
)
SELECT u AS doc_a, v AS doc_b,
       CAST(count(*) AS BIGINT) AS common_neighbors,
       CAST(sum(t6) AS BIGINT) AS aa6,
       CAST(sum(t6) AS BIGINT) / CAST(1000000 AS DOUBLE) AS adamic_adar
FROM scored
GROUP BY u, v
ORDER BY aa6 DESC, doc_a, doc_b
LIMIT {LP_TOP}
"""


# --------------------------------------------------------------------------
# Truncated Katz centrality — integer-exact like HITS/BFS: c_k(v) = the
# number of length-k paths ending at v over the synthetic link graph,
# four fixed rounds (fixed horizon keeps both engines on the same
# trajectory); katz_i = Σ_k 8^(4-k)·c_k(v) is the attenuation β=1/8
# series rescaled by 8^4=4096 so every intermediate is BIGINT, with ONE
# exact binary-fraction divide (x/4096 is lossless in doubles) at the
# end. Spark: one join per round (PageRank's 1-join cadence — no
# checkpoint needed), then one union + groupBy for the weighted series
# (a single shuffle, not 4 chained left joins). Path counts stay tiny:
# in-degrees of the affine-generator graph are bounded.
# --------------------------------------------------------------------------
KATZ_ITERS = 4
KATZ_BETA_DEN = 8


def q_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    c = docs.select("doc_id", F.lit(1).cast("long").alias("c"))
    weighted = []
    for k in range(1, KATZ_ITERS + 1):
        c = (
            edges.join(c, edges["source_doc_id"] == c["doc_id"])
            .groupBy(F.col("target_doc_id").alias("doc_id"))
            .agg(F.sum("c").cast("long").alias("c"))
        )
        w = KATZ_BETA_DEN ** (KATZ_ITERS - k)
        weighted.append(
            c.select("doc_id", (F.col("c") * F.lit(w)).cast("long").alias("w"))
        )
    series = weighted[0]
    for part in weighted[1:]:
        series = series.unionByName(part)
    tot = series.groupBy("doc_id").agg(
        F.sum("w").cast("long").alias("katz_i")
    )
    return docs.join(tot, "doc_id", "left").select(
        "doc_id",
        F.coalesce("katz_i", F.lit(0).cast("long")).alias("katz_i"),
        (
            F.coalesce("katz_i", F.lit(0).cast("long")).cast("double")
            / F.lit(float(KATZ_BETA_DEN**KATZ_ITERS))
        ).alias("katz"),
    )


def _katz_sql() -> str:
    rounds = []
    prev = "c0"
    for k in range(1, KATZ_ITERS + 1):
        rounds.append(
            f"c{k} AS MATERIALIZED (\n"
            f"  SELECT target_doc_id AS v, CAST(sum(c) AS BIGINT) AS c\n"
            f"  FROM edges JOIN {prev} ON {prev}.v = edges.source_doc_id\n"
            f"  GROUP BY target_doc_id\n)"
        )
        prev = f"c{k}"
    union = "\n  UNION ALL\n".join(
        f"  SELECT v, c * {KATZ_BETA_DEN ** (KATZ_ITERS - k)} AS w FROM c{k}"
        for k in range(1, KATZ_ITERS + 1)
    )
    return f"""
WITH {_EDGES_CTE},
c0 AS (SELECT doc_id AS v, CAST(1 AS BIGINT) AS c FROM documents),
{",".join(rounds)},
series AS (
{union}
),
tot AS (SELECT v, CAST(sum(w) AS BIGINT) AS katz_i FROM series GROUP BY v)
SELECT d.doc_id, CAST(COALESCE(t.katz_i, 0) AS BIGINT) AS katz_i,
       CAST(COALESCE(t.katz_i, 0) AS BIGINT)
         / CAST({KATZ_BETA_DEN**KATZ_ITERS} AS DOUBLE) AS katz
FROM documents d LEFT JOIN tot t ON t.v = d.doc_id
"""


SQL_KATZ_CENTRALITY = _katz_sql()


# --------------------------------------------------------------------------
# PageRank convergence curve: per-iteration L1/max rank movement plus the
# contraction ratio for the first {PR_CONV_ITERS} iterations of the
# reference-constant recurrence (d=0.85, dangling mass dropped —
# `app/batch/pagerank.py:6-38`). The reference runs a BLIND fixed-20
# loop; this report is the instrumentation that justifies (or indicts)
# that choice — the contraction column exposes the ~d geometric rate, and
# at web scale it is the input for an early-stop tolerance (the optional
# `tol` in operators/pagerank.build_document_authority). Invariant 4:
# per-node |Δrank| quantizes fixed9 into BIGINT L1/max sums (ranks agree
# across engines to far better than 1e-9 — the pagerank pair proves
# round-9 identity); the contraction ratio is one divide of exact
# integers. Iterative like the pagerank pair: each iteration
# localCheckpoints, so the unioned 8-row report reads checkpointed
# snapshots, not an exponentially deep plan.
# --------------------------------------------------------------------------
PR_CONV_ITERS = 8


def q_pagerank_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    n = docs.count()
    base, tel = 1.0 / n, (1.0 - 0.85) / n
    out_degree = edges.groupBy("source_doc_id").agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    edges_deg = edges.join(out_degree, "source_doc_id").localCheckpoint(
        eager=True
    )
    ranks = docs.select("doc_id", F.lit(base).alias("pr"))
    d9 = F.round(
        F.abs(F.col("a.pr") - F.col("b.pr")) * F.lit(1000000000.0), 0
    ).cast("long")
    deltas = []
    for k in range(1, PR_CONV_ITERS + 1):
        contribs = (
            edges_deg.join(ranks, edges_deg.source_doc_id == ranks.doc_id)
            .select(
                F.col("target_doc_id").alias("dst"),
                (F.lit(0.85) * F.col("pr") / F.col("out_degree")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        new_ranks = (
            docs.join(contribs, docs.doc_id == contribs.dst, "left")
            .select(
                "doc_id",
                (F.lit(tel) + F.coalesce("c", F.lit(0.0))).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
        deltas.append(
            new_ranks.alias("a")
            .join(ranks.alias("b"), "doc_id")
            .agg(
                F.sum(d9).cast("long").alias("l1_9"),
                F.max(d9).cast("long").alias("max_9"),
            )
            .select(F.lit(k).cast("long").alias("iter"), "l1_9", "max_9")
        )
        ranks = new_ranks
    res = deltas[0]
    for d in deltas[1:]:
        res = res.unionByName(d)
    w = Window.orderBy("iter")
    return res.select(
        "iter",
        F.round(F.col("l1_9") / F.lit(1000000000.0), 6).alias("l1_delta"),
        F.round(F.col("max_9") / F.lit(1000000000.0), 6).alias("max_delta"),
        F.coalesce(
            F.round(
                F.col("l1_9").cast("double") / F.lag("l1_9").over(w), 6
            ),
            F.lit(0.0),
        ).alias("contraction"),
    )


SQL_PAGERANK_CONVERGENCE = f"""
WITH RECURSIVE {_EDGES_CTE},
outdeg AS (SELECT source_doc_id AS src, count(*)::DOUBLE AS od
           FROM edges GROUP BY source_doc_id),
edges_w AS (
  SELECT e.source_doc_id AS src, e.target_doc_id AS dst, 1.0 / o.od AS w
  FROM edges e JOIN outdeg o ON o.src = e.source_doc_id
  UNION ALL
  SELECT doc_id, doc_id, 0.0 FROM documents
),
pr AS (
  SELECT 0 AS iter, doc_id, 1.0 / (SELECT n FROM nn) AS rank FROM documents
  UNION ALL
  SELECT pr.iter + 1, e.dst AS doc_id,
         (1 - 0.85) / (SELECT n FROM nn) + 0.85 * sum(pr.rank * e.w) AS rank
  FROM pr JOIN edges_w e ON e.src = pr.doc_id
  WHERE pr.iter < {PR_CONV_ITERS}
  GROUP BY pr.iter + 1, e.dst
),
deltas AS (
  SELECT CAST(b.iter AS BIGINT) AS iter,
         CAST(sum(CAST(round(abs(b.rank - a.rank) * 1000000000.0)
                       AS BIGINT)) AS BIGINT) AS l1_9,
         CAST(max(CAST(round(abs(b.rank - a.rank) * 1000000000.0)
                       AS BIGINT)) AS BIGINT) AS max_9
  FROM pr a JOIN pr b ON b.doc_id = a.doc_id AND b.iter = a.iter + 1
  GROUP BY b.iter
)
SELECT iter,
       round(l1_9 / 1000000000.0, 6) AS l1_delta,
       round(max_9 / 1000000000.0, 6) AS max_delta,
       coalesce(round(CAST(l1_9 AS DOUBLE)
                      / lag(l1_9) OVER (ORDER BY iter), 6), 0.0)
         AS contraction
FROM deltas
"""


# --------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004) in the exact-integer
# fixed-point formulation the hits_scores pair established: candidate
# words (length >= 4, the POS-filter proxy) form an undirected
# co-occurrence graph over window-2 adjacency in the FILTERED token
# sequence; ranks then follow the unnormalized TextRank recurrence
# r' = 0.15 + 0.85 * sum(r_u / deg_u) with every quantity held in BIGINT
# micro-units: the per-neighbor message is r_u div deg_u (integer floor)
# and the damping mix is (15*UNIT + 85*sum) div 100 — order-free and
# bit-identical across engines (invariant 4 by omission; the floor drops
# sub-micro mass, documented as the fixed-point variant). The reference
# scores documents, never terms (`app/search/engine.py` weights fields) —
# this is the keyword-side companion an indexer runs at ingest. Graph
# size is VOCABULARY-bounded, not corpus-bounded: at web scale the
# co-occurrence graph contracts a trillion-token stream to |V| nodes in
# one map-side-combined aggregation, and the 10 iterations run on that
# contracted graph alone. Each iteration localCheckpoints (pagerank's
# lineage discipline).
# --------------------------------------------------------------------------
TR_TOKEN = "[a-z0-9]{4,}"
TR_ITERS = 10
TR_UNIT = 1_000_000


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(f"regexp_extract_all(lower(text), '{TR_TOKEN}', 0)")
        ).alias("pos", "w"),
    )
    wnd = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.lag("w").over(wnd).alias("pa"), F.col("w").alias("pb")
    ).filter(F.col("pa").isNotNull() & (F.col("pa") != F.col("pb")))
    edges = (
        pairs.select(
            F.least("pa", "pb").alias("ea"), F.greatest("pa", "pb").alias("eb")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    both = edges.unionByName(
        edges.select(F.col("eb").alias("ea"), F.col("ea").alias("eb"))
    )
    deg = both.groupBy("ea").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    msgs = both.join(deg, "ea").localCheckpoint(eager=True)
    ranks = deg.select(
        F.col("ea").alias("w"), F.lit(TR_UNIT).cast("long").alias("r")
    )
    for _ in range(TR_ITERS):
        ranks = (
            msgs.join(ranks, msgs.ea == ranks.w)
            .select(F.col("eb").alias("w"), F.expr("r div deg").alias("m"))
            .groupBy("w")
            .agg(
                F.expr(f"({15 * TR_UNIT} + 85 * sum(m)) div 100")
                .cast("long")
                .alias("r")
            )
            .localCheckpoint(eager=True)
        )
    return ranks.join(deg, ranks.w == deg.ea).select(
        F.col("w").alias("word"),
        F.col("deg").alias("degree"),
        F.round(F.col("r") / F.lit(1000000.0), 6).alias("textrank"),
    )


SQL_TEXTRANK_KEYWORDS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TR_TOKEN}')) AS w,
         generate_subscripts(regexp_extract_all(lower(text), '{TR_TOKEN}'), 1)
           AS pos
  FROM documents
),
adj AS (
  SELECT lag(w) OVER (PARTITION BY doc_id ORDER BY pos) AS pa, w AS pb
  FROM toks
),
wedges AS (
  SELECT DISTINCT least(pa, pb) AS ea, greatest(pa, pb) AS eb
  FROM adj WHERE pa IS NOT NULL AND pa <> pb
),
bidir AS (SELECT ea, eb FROM wedges UNION ALL SELECT eb, ea FROM wedges),
deg AS (SELECT ea, CAST(count(*) AS BIGINT) AS deg FROM bidir GROUP BY ea),
msgs AS (SELECT b.ea AS frm, b.eb AS dst, d.deg
         FROM bidir b JOIN deg d ON d.ea = b.ea),
tr AS (
  SELECT 0 AS iter, ea AS w, CAST({TR_UNIT} AS BIGINT) AS r FROM deg
  UNION ALL
  SELECT tr.iter + 1, m.dst AS w,
         CAST(({15 * TR_UNIT} + 85 * sum(tr.r // m.deg)) // 100
              AS BIGINT) AS r
  FROM tr JOIN msgs m ON m.frm = tr.w
  WHERE tr.iter < {TR_ITERS}
  GROUP BY tr.iter + 1, m.dst
)
SELECT tr.w AS word, d.deg AS degree,
       round(tr.r / 1000000.0, 6) AS textrank
FROM tr JOIN deg d ON d.ea = tr.w
WHERE tr.iter = {TR_ITERS}
"""


# --------------------------------------------------------------------------
# Host-level authority: contract the synthetic page link graph to the
# source/domain level (edge weight = page-link multiplicity, host
# self-loops dropped) and run the reference-constant recurrence (d=0.85,
# `app/batch/pagerank.py:6-38`) on the CONTRACTED graph in the same
# exact-integer fixed-point form as textrank_keywords — the weighted
# message is (r_u * w_uv) div out_w_u. This is the standard web-scale
# move: host aggregation shrinks a trillion-edge page graph by orders of
# magnitude in ONE map-side-combined aggregation (uniform doc_id join
# keys), after which the 10 iterations touch only |hosts| rows. Outputs
# per host: page count, weighted in/out degree, fixed-point rank — all
# BIGINT except the one final /UNIT divide.
# --------------------------------------------------------------------------
HOST_ITERS = 10


def q_host_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    _, edges = _edges(spark, sf_dir)
    hedges = (
        edges.join(
            docs.select(
                F.col("doc_id").alias("source_doc_id"),
                F.col("source").alias("src_host"),
            ),
            "source_doc_id",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("target_doc_id"),
                F.col("source").alias("dst_host"),
            ),
            "target_doc_id",
        )
        .filter(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    hosts = docs.groupBy(F.col("source").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    )
    outw = hedges.groupBy(F.col("src_host").alias("host")).agg(
        F.sum("w").alias("out_w")
    )
    inw = hedges.groupBy(F.col("dst_host").alias("host")).agg(
        F.sum("w").alias("in_w")
    )
    # zero-weight self message keeps every host present per iteration
    # (out_w=1 is a safe divisor: the numerator is 0 by construction)
    msgs = hedges.join(
        outw, hedges.src_host == outw.host
    ).select("src_host", "dst_host", "w", "out_w").unionByName(
        hosts.select(
            F.col("host").alias("src_host"),
            F.col("host").alias("dst_host"),
            F.lit(0).cast("long").alias("w"),
            F.lit(1).cast("long").alias("out_w"),
        )
    ).localCheckpoint(eager=True)
    ranks = hosts.select(
        "host", F.lit(TR_UNIT).cast("long").alias("r")
    )
    for _ in range(HOST_ITERS):
        ranks = (
            msgs.join(ranks, msgs.src_host == ranks.host)
            .select(
                F.col("dst_host").alias("host"),
                F.expr("(r * w) div out_w").alias("m"),
            )
            .groupBy("host")
            .agg(
                F.expr(f"({15 * TR_UNIT} + 85 * sum(m)) div 100")
                .cast("long")
                .alias("r")
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.join(hosts, "host")
        .join(outw, "host", "left")
        .join(inw, "host", "left")
        .select(
            "host",
            "n_pages",
            F.coalesce("out_w", F.lit(0)).cast("long").alias("out_w"),
            F.coalesce("in_w", F.lit(0)).cast("long").alias("in_w"),
            F.round(F.col("r") / F.lit(1000000.0), 6).alias("authority"),
        )
    )


SQL_HOST_AUTHORITY = f"""
WITH RECURSIVE {_EDGES_CTE},
hedges AS (
  SELECT ds.source AS src_host, dt.source AS dst_host,
         CAST(count(*) AS BIGINT) AS w
  FROM edges e
  JOIN documents ds ON ds.doc_id = e.source_doc_id
  JOIN documents dt ON dt.doc_id = e.target_doc_id
  WHERE ds.source <> dt.source
  GROUP BY ds.source, dt.source
),
hosts AS (SELECT source AS host, CAST(count(*) AS BIGINT) AS n_pages
          FROM documents GROUP BY source),
outw AS (SELECT src_host AS host, CAST(sum(w) AS BIGINT) AS out_w
         FROM hedges GROUP BY src_host),
inw AS (SELECT dst_host AS host, CAST(sum(w) AS BIGINT) AS in_w
        FROM hedges GROUP BY dst_host),
msgs AS (
  SELECT h.src_host, h.dst_host, h.w, o.out_w
  FROM hedges h JOIN outw o ON o.host = h.src_host
  UNION ALL
  SELECT host, host, CAST(0 AS BIGINT), CAST(1 AS BIGINT) FROM hosts
),
hr AS (
  SELECT 0 AS iter, host, CAST({TR_UNIT} AS BIGINT) AS r FROM hosts
  UNION ALL
  SELECT hr.iter + 1, m.dst_host AS host,
         CAST(({15 * TR_UNIT} + 85 * sum((hr.r * m.w) // m.out_w)) // 100
              AS BIGINT) AS r
  FROM hr JOIN msgs m ON m.src_host = hr.host
  WHERE hr.iter < {HOST_ITERS}
  GROUP BY hr.iter + 1, m.dst_host
)
SELECT hr.host, h.n_pages,
       CAST(COALESCE(o.out_w, 0) AS BIGINT) AS out_w,
       CAST(COALESCE(i.in_w, 0) AS BIGINT) AS in_w,
       round(hr.r / 1000000.0, 6) AS authority
FROM hr
JOIN hosts h ON h.host = hr.host
LEFT JOIN outw o ON o.host = hr.host
LEFT JOIN inw i ON i.host = hr.host
WHERE hr.iter = {HOST_ITERS}
"""


# --------------------------------------------------------------------------
# k-truss edge support: per-edge triangle count over the undirected
# _TRI_GENS graph (the edge-level companion to triangle_counts' node
# view and k_core's peeling), reported as the support histogram with the
# descending cumulative edge count — cum_edges_ge(s) is exactly the edge
# set a (s+2)-truss peel would START from, the sizing input for
# community-detection passes. Triangles enumerate once via the same
# degree-ordered orientation as triangle_counts (each triangle
# materializes exactly once; fan-out bounded by oriented out-degree);
# each contributes its three canonical (least,greatest) edges to one
# union + groupBy. All BIGINT; the cumulative window runs over the
# support LEVELS (bounded), not the edges.
# --------------------------------------------------------------------------
def q_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    da = deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
    )
    o = (
        und.join(da, "ua")
        .join(db, "ub")
        .select(
            F.when(lower, F.col("ua")).otherwise(F.col("ub")).alias("src"),
            F.when(lower, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
            F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
        .localCheckpoint(eager=True)
    )
    x, y, z = o.alias("x"), o.alias("y"), o.alias("z")
    tri = (
        x.join(
            y,
            (F.col("y.src") == F.col("x.src"))
            & (
                (F.col("x.dd") < F.col("y.dd"))
                | (
                    (F.col("x.dd") == F.col("y.dd"))
                    & (F.col("x.dst") < F.col("y.dst"))
                )
            ),
        )
        .join(
            z,
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .select(
            F.col("x.src").alias("u"),
            F.col("x.dst").alias("v"),
            F.col("y.dst").alias("w"),
        )
    )
    erefs = (
        tri.select(F.least("u", "v").alias("ea"), F.greatest("u", "v").alias("eb"))
        .unionByName(
            tri.select(
                F.least("u", "w").alias("ea"), F.greatest("u", "w").alias("eb")
            )
        )
        .unionByName(
            tri.select(
                F.least("v", "w").alias("ea"), F.greatest("v", "w").alias("eb")
            )
        )
        .groupBy("ea", "eb")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    per_edge = und.join(
        erefs, (und.ua == erefs.ea) & (und.ub == erefs.eb), "left"
    ).select(F.coalesce("support", F.lit(0)).cast("long").alias("support"))
    hist = per_edge.groupBy("support").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges")
    )
    w = Window.orderBy(F.desc("support")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return hist.select(
        "support",
        "n_edges",
        F.sum("n_edges").over(w).cast("long").alias("cum_edges_ge"),
    )


SQL_EDGE_SUPPORT = f"""
WITH {_edges_cte(_TRI_GENS)},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ua ELSE u.ub END AS src,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ub ELSE u.ua END AS dst,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN db.d ELSE da.d END AS dd
  FROM und u JOIN deg da ON da.v = u.ua JOIN deg db ON db.v = u.ub
),
tri AS (
  SELECT x.src AS u, x.dst AS v, y.dst AS w
  FROM o x JOIN o y ON y.src = x.src AND ((x.dd, x.dst) < (y.dd, y.dst))
  JOIN o z ON z.src = x.dst AND z.dst = y.dst
),
erefs AS (
  SELECT ea, eb, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT least(u, v) AS ea, greatest(u, v) AS eb FROM tri
    UNION ALL SELECT least(u, w), greatest(u, w) FROM tri
    UNION ALL SELECT least(v, w), greatest(v, w) FROM tri
  ) GROUP BY ea, eb
),
per_edge AS (
  SELECT CAST(COALESCE(e.support, 0) AS BIGINT) AS support
  FROM und u LEFT JOIN erefs e ON e.ea = u.ua AND e.eb = u.ub
),
hist AS (
  SELECT support, CAST(count(*) AS BIGINT) AS n_edges
  FROM per_edge GROUP BY support
)
SELECT support, n_edges,
       CAST(sum(n_edges) OVER (ORDER BY support DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum_edges_ge
FROM hist
"""


# --------------------------------------------------------------------------
# Harmonic centrality from a seed sample (Boldi & Vigna 2014's preferred
# closeness variant — handles disconnected graphs without the 1/inf
# convention): H(v) = sum over seeds s of 1/d(s, v), estimated exactly by
# per-seed-tagged BFS from the doc_id%97 sample to a 6-hop horizon.
# Invariant 4 by integer construction: hop distances are BIGINTs and every
# reciprocal is scaled by LCM(1..6)=60, so 60/d is EXACT integer
# arithmetic and the centrality sum is a BIGINT (h60) with ONE display
# division. Scale shape: frontier rows are (seed, node) pairs — the exact
# small-seed-set verifier; the sketch path for all-sources harmonic at
# 10^9 nodes is HyperBall (HLL per node, see hll_distinct for the sketch
# primitive). Each round anti-joins the checkpointed visited set — no
# lineage blowup, bounded rounds.
# --------------------------------------------------------------------------
HARM_SEED_MOD = 97
HARM_ITERS = 6
HARM_LCM = 60  # lcm(1..6): every 60/d below is an exact integer


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)
    visited = (
        docs.filter(F.col("doc_id") % HARM_SEED_MOD == 0)
        .select(
            F.col("doc_id").alias("seed"),
            F.col("doc_id").alias("doc_id"),
            F.lit(0).cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for i in range(1, HARM_ITERS + 1):
        nxt = (
            frontier.join(
                edges, frontier["doc_id"] == edges["source_doc_id"]
            )
            .select(
                "seed",
                F.col("target_doc_id").alias("doc_id"),
                F.lit(i).cast("long").alias("dist"),
            )
            .distinct()
            .join(visited.select("seed", "doc_id"), ["seed", "doc_id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return (
        visited.filter(F.col("dist") > 0)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seeds"),
            F.sum((F.lit(float(HARM_LCM)) / F.col("dist")).cast("long"))
            .cast("long")
            .alias("h60"),
        )
        .select(
            "doc_id",
            "n_seeds",
            "h60",
            F.round(F.col("h60").cast("double") / F.lit(float(HARM_LCM)), 6).alias(
                "harmonic"
            ),
        )
    )


SQL_HARMONIC_CENTRALITY = f"""
WITH RECURSIVE {_EDGES_CTE},
msgs AS (
  SELECT source_doc_id AS from_node, target_doc_id AS to_node, 1 AS w
  FROM edges
  UNION ALL
  SELECT doc_id, doc_id, 0 FROM documents
),
bfs AS (
  SELECT 0 AS iter, doc_id AS seed, doc_id, CAST(0 AS BIGINT) AS dist
  FROM documents WHERE doc_id % {HARM_SEED_MOD} = 0
  UNION ALL
  SELECT b.iter + 1, b.seed, m.to_node AS doc_id,
         CAST(min(b.dist + m.w) AS BIGINT) AS dist
  FROM bfs b JOIN msgs m ON m.from_node = b.doc_id
  WHERE b.iter < {HARM_ITERS}
  GROUP BY 1, 2, 3
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_seeds,
       CAST(sum(CAST({HARM_LCM}.0 / dist AS BIGINT)) AS BIGINT) AS h60,
       round(CAST(sum(CAST({HARM_LCM}.0 / dist AS BIGINT)) AS BIGINT)
             / {HARM_LCM}.0, 6) AS harmonic
FROM bfs WHERE iter = {HARM_ITERS} AND dist > 0
GROUP BY doc_id
"""


def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    _, v = _markov_chain(spark, sf_dir)
    emp = events.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = scalar_count(events, as_double=True)
    return (
        v.join(emp, v["t"] == emp["event_type"])
        .crossJoin(F.broadcast(total))
        .select(
            F.col("t").alias("event_type"),
            F.round("v", 6).alias("stationary"),
            F.round(F.col("cnt").cast("double") / F.col("_n"), 6).alias(
                "empirical"
            ),
        )
        .orderBy("event_type")
    )


SQL_MARKOV_STATIONARY = f"""
WITH RECURSIVE {_MARKOV_CTES},
emp AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM events)
SELECT vt.t AS event_type, round(vt.v, 6) AS stationary,
       round(emp.cnt / tot.n, 6) AS empirical
FROM vt JOIN emp ON emp.event_type = vt.t, tot
WHERE vt.iter = {MARKOV_ITERS}
ORDER BY event_type
"""


# --------------------------------------------------------------------------
# Hub-knockout robustness (Albert, Jeong & Barabasi 2000's targeted-
# attack experiment): component census of the undirected link graph
# before and after deleting the 10 highest-degree nodes — the
# scale-free-network fragility audit. Spark side runs the EXACT
# large-star/small-star connected components (training_data/
# dedup.connected_components — convergence-checked, never truncates);
# the oracle replays min-label propagation for 96 fixed rounds (state
# is n rows per round, not the transitive closure — bounded; 96 >> the
# LCG graph's diameter at any test SF, and a shortfall would surface as
# a red pair, not a silent pass). Hubs picked by (degree desc, id asc)
# top-k — deterministic.
# --------------------------------------------------------------------------
KNOCKOUT_HUBS = 10
KNOCKOUT_LP_ROUNDS = 96


def q_hub_knockout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.dedup import connected_components

    docs, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("id_a"),
            F.greatest("source_doc_id", "target_doc_id").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("id_a").alias("v"))
        .unionByName(und.select(F.col("id_b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hubs = (
        deg.orderBy(F.desc("d"), "v")
        .limit(KNOCKOUT_HUBS)
        .select(F.col("v").alias("hub"))
        .localCheckpoint(eager=True)
    )

    def census(phase, nodes, pairs):
        comp = connected_components(pairs, nodes=nodes, id_col="doc_id")
        sizes = comp.groupBy("component").agg(
            F.count(F.lit(1)).cast("long").alias("sz")
        )
        n_edges = pairs.agg(F.count(F.lit(1)).cast("long").alias("ne"))
        return (
            sizes.agg(
                F.count(F.lit(1)).cast("long").alias("n_components"),
                F.max("sz").cast("long").alias("largest_component"),
                F.sum("sz").cast("long").alias("n_nodes"),
            )
            .crossJoin(F.broadcast(n_edges))
            .select(
                F.lit(phase).alias("phase"),
                "n_nodes",
                F.col("ne").alias("n_edges"),
                "n_components",
                "largest_component",
            )
        )

    full = census("full", docs, und)
    kn_nodes = docs.join(
        F.broadcast(hubs), docs["doc_id"] == hubs["hub"], "left_anti"
    )
    kn_pairs = (
        und.join(F.broadcast(hubs), und["id_a"] == hubs["hub"], "left_anti")
        .join(F.broadcast(hubs), F.col("id_b") == hubs["hub"], "left_anti")
    )
    knocked = census("knocked", kn_nodes, kn_pairs)
    return full.unionByName(knocked).orderBy("phase")


SQL_HUB_KNOCKOUT = f"""
WITH RECURSIVE {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS id_a,
                  greatest(source_doc_id, target_doc_id) AS id_b
  FROM edges
),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT id_a AS v FROM und UNION ALL SELECT id_b FROM und
  ) GROUP BY v
),
hubs AS (SELECT v AS hub FROM deg ORDER BY d DESC, v LIMIT {KNOCKOUT_HUBS}),
kn_und AS (
  SELECT * FROM und
  WHERE id_a NOT IN (SELECT hub FROM hubs)
    AND id_b NOT IN (SELECT hub FROM hubs)
),
msgs_f AS (
  SELECT id_a AS src, id_b AS dst FROM und
  UNION ALL SELECT id_b, id_a FROM und
  UNION ALL SELECT doc_id, doc_id FROM documents
),
lp_f AS (
  SELECT 0 AS iter, doc_id AS node, doc_id AS lbl FROM documents
  UNION ALL
  SELECT lp.iter + 1, m.dst, min(lp.lbl)
  FROM lp_f lp JOIN msgs_f m ON m.src = lp.node
  WHERE lp.iter < {KNOCKOUT_LP_ROUNDS}
  GROUP BY 1, 2
),
comp_f AS (
  SELECT node, lbl AS component FROM lp_f
  WHERE iter = {KNOCKOUT_LP_ROUNDS}
),
kn_nodes AS (
  SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT hub FROM hubs)
),
msgs_k AS (
  SELECT id_a AS src, id_b AS dst FROM kn_und
  UNION ALL SELECT id_b, id_a FROM kn_und
  UNION ALL SELECT doc_id, doc_id FROM kn_nodes
),
lp_k AS (
  SELECT 0 AS iter, doc_id AS node, doc_id AS lbl FROM kn_nodes
  UNION ALL
  SELECT lp.iter + 1, m.dst, min(lp.lbl)
  FROM lp_k lp JOIN msgs_k m ON m.src = lp.node
  WHERE lp.iter < {KNOCKOUT_LP_ROUNDS}
  GROUP BY 1, 2
),
comp_k AS (
  SELECT node, lbl AS component FROM lp_k
  WHERE iter = {KNOCKOUT_LP_ROUNDS}
),
sizes_f AS (
  SELECT component, CAST(count(*) AS BIGINT) AS sz
  FROM comp_f GROUP BY component
),
sizes_k AS (
  SELECT component, CAST(count(*) AS BIGINT) AS sz
  FROM comp_k GROUP BY component
),
cen_f AS (
  SELECT 'full' AS phase,
         CAST(sum(sz) AS BIGINT) AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM und) AS n_edges,
         CAST(count(*) AS BIGINT) AS n_components,
         CAST(max(sz) AS BIGINT) AS largest_component
  FROM sizes_f
),
cen_k AS (
  SELECT 'knocked' AS phase,
         CAST(sum(sz) AS BIGINT) AS n_nodes,
         (SELECT CAST(count(*) AS BIGINT) FROM kn_und) AS n_edges,
         CAST(count(*) AS BIGINT) AS n_components,
         CAST(max(sz) AS BIGINT) AS largest_component
  FROM sizes_k
)
SELECT * FROM cen_f UNION ALL SELECT * FROM cen_k
ORDER BY phase
"""


# --------------------------------------------------------------------------
# Global transitivity (Newman's C = 3*triangles/wedges — the one-number
# global companion to triangle_counts' per-node clustering): triangles
# via the same degree-ordered orientation (each counted once), wedges =
# sum d(d-1)/2 over undirected degrees — ALL integers, one final ratio.
# Over the triangle-closing generator graph (_TRI_GENS, as
# triangle_counts/edge_support).
# --------------------------------------------------------------------------
def q_global_transitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir, gens=_TRI_GENS)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    wedges = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        F.sum(F.expr("(d * (d - 1)) div 2")).cast("long").alias("n_wedges"),
    )
    da = deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))
    lower = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
    )
    o = (
        und.join(da, "ua")
        .join(db, "ub")
        .select(
            F.when(lower, F.col("ua")).otherwise(F.col("ub")).alias("src"),
            F.when(lower, F.col("ub")).otherwise(F.col("ua")).alias("dst"),
            F.when(lower, F.col("db")).otherwise(F.col("da")).alias("dd"),
        )
        .localCheckpoint(eager=True)
    )
    x, y, z = o.alias("x"), o.alias("y"), o.alias("z")
    tri = (
        x.join(
            y,
            (F.col("y.src") == F.col("x.src"))
            & (
                (F.col("x.dd") < F.col("y.dd"))
                | (
                    (F.col("x.dd") == F.col("y.dd"))
                    & (F.col("x.dst") < F.col("y.dst"))
                )
            ),
        )
        .join(
            z,
            (F.col("z.src") == F.col("x.dst"))
            & (F.col("z.dst") == F.col("y.dst")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    ne = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    return (
        wedges.crossJoin(F.broadcast(tri))
        .crossJoin(F.broadcast(ne))
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            "n_wedges",
            F.round(
                F.lit(3.0)
                * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"),
                6,
            ).alias("transitivity"),
        )
    )


SQL_GLOBAL_TRANSITIVITY = f"""
WITH {_edges_cte(_TRI_GENS)},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
),
o AS (
  SELECT CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ua ELSE u.ub END AS src,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN u.ub ELSE u.ua END AS dst,
         CASE WHEN (da.d, u.ua) < (db.d, u.ub) THEN db.d ELSE da.d END AS dd
  FROM und u JOIN deg da ON da.v = u.ua JOIN deg db ON db.v = u.ub
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM o x JOIN o y ON y.src = x.src AND ((x.dd, x.dst) < (y.dd, y.dst))
  JOIN o z ON z.src = x.dst AND z.dst = y.dst
),
w AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und)
SELECT w.n_nodes, ne.n_edges, tri.n_triangles, w.n_wedges,
       round(3.0 * CAST(tri.n_triangles AS DOUBLE)
             / CAST(w.n_wedges AS DOUBLE), 6) AS transitivity
FROM w, tri, ne
"""


# --------------------------------------------------------------------------
# Bow-tie structure census (Broder et al. 2000, "Graph structure in the
# web" — THE web-graph macro-structure analysis): pick the max-in-degree
# hub (id tiebreak), run 8-hop forward BFS (reachable FROM the hub) and
# backward BFS (nodes REACHING the hub), classify every node CORE
# (both), IN (reaches only), OUT (reached only), OTHER. True SCC-based
# bow-tie needs unbounded closure; the 8-hop horizon is the documented
# bounded variant (identical in both engines — a horizon shortfall
# would show as identical class shifts on both sides, never a silent
# divergence). Pure integer BFS, bounded rounds, visited-set anti-joins.
# --------------------------------------------------------------------------
BOWTIE_HOPS = 8


def q_bowtie_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)
    ind = edges.groupBy("target_doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("d")
    )
    hub = (
        ind.orderBy(F.desc("d"), "target_doc_id")
        .limit(1)
        .select(F.col("target_doc_id").alias("doc_id"))
        .localCheckpoint(eager=True)
    )

    def reach(edge_df, src_col, dst_col):
        visited = hub
        frontier = hub
        for _ in range(BOWTIE_HOPS):
            nxt = (
                frontier.join(
                    edge_df, frontier["doc_id"] == edge_df[src_col]
                )
                .select(F.col(dst_col).alias("doc_id"))
                .distinct()
                .join(visited, "doc_id", "left_anti")
                .localCheckpoint(eager=True)
            )
            visited = visited.unionByName(nxt).localCheckpoint(eager=True)
            frontier = nxt
        return visited

    fwd = reach(edges, "source_doc_id", "target_doc_id").select(
        "doc_id", F.lit(1).alias("_f")
    )
    bwd = reach(edges, "target_doc_id", "source_doc_id").select(
        "doc_id", F.lit(1).alias("_b")
    )
    classed = (
        docs.join(fwd, "doc_id", "left")
        .join(bwd, "doc_id", "left")
        .select(
            F.when((F.col("_f") == 1) & (F.col("_b") == 1), F.lit("CORE"))
            .when(F.col("_b") == 1, F.lit("IN"))
            .when(F.col("_f") == 1, F.lit("OUT"))
            .otherwise(F.lit("OTHER"))
            .alias("component")
        )
    )
    return (
        classed.groupBy("component")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .orderBy("component")
    )


SQL_BOWTIE_STRUCTURE = f"""
WITH RECURSIVE {_EDGES_CTE},
ind AS (SELECT target_doc_id AS v, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY target_doc_id),
hub AS (SELECT v AS doc_id FROM ind ORDER BY d DESC, v LIMIT 1),
fmsgs AS (
  SELECT source_doc_id AS src, target_doc_id AS dst FROM edges
  UNION ALL SELECT doc_id, doc_id FROM documents
),
fwd AS (
  SELECT 0 AS iter, doc_id FROM hub
  UNION ALL
  SELECT f.iter + 1, m.dst
  FROM fwd f JOIN fmsgs m ON m.src = f.doc_id
  WHERE f.iter < {BOWTIE_HOPS}
  GROUP BY 1, 2
),
freach AS (SELECT DISTINCT doc_id FROM fwd),
bmsgs AS (
  SELECT target_doc_id AS src, source_doc_id AS dst FROM edges
  UNION ALL SELECT doc_id, doc_id FROM documents
),
bwd AS (
  SELECT 0 AS iter, doc_id FROM hub
  UNION ALL
  SELECT b.iter + 1, m.dst
  FROM bwd b JOIN bmsgs m ON m.src = b.doc_id
  WHERE b.iter < {BOWTIE_HOPS}
  GROUP BY 1, 2
),
breach AS (SELECT DISTINCT doc_id FROM bwd)
SELECT CASE WHEN f.doc_id IS NOT NULL AND b.doc_id IS NOT NULL THEN 'CORE'
            WHEN b.doc_id IS NOT NULL THEN 'IN'
            WHEN f.doc_id IS NOT NULL THEN 'OUT'
            ELSE 'OTHER' END AS component,
       CAST(count(*) AS BIGINT) AS n_nodes
FROM documents d
LEFT JOIN freach f ON f.doc_id = d.doc_id
LEFT JOIN breach b ON b.doc_id = d.doc_id
GROUP BY component
ORDER BY component
"""


# --------------------------------------------------------------------------
# Rich-club coefficient (Zhou & Mondragon 2004; Colizza 2006 made it the
# standard hub-interconnection audit): for each degree threshold k in a
# fixed sweep, phi(k) = 2*E_k / (n_k*(n_k-1)) where n_k = nodes with
# degree > k and E_k = undirected edges with BOTH endpoints above k —
# do hubs link to each other more than chance? One pass: explode the
# k-sweep over the degree-annotated edge list, conditional integer
# counts, one ratio per row. Complements hub_knockout (what happens if
# hubs die) with how tightly the club is wired while alive.
# --------------------------------------------------------------------------
RICH_CLUB_KS = [2, 3, 4, 5, 6, 8]


def q_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("ua"),
            F.greatest("source_doc_id", "target_doc_id").alias("ub"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("ua").alias("v"))
        .unionByName(und.select(F.col("ub").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True)
    )
    ks = F.explode(F.array(*[F.lit(k) for k in RICH_CLUB_KS])).alias("k")
    nk = (
        deg.select("d", ks)
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") > F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_k")
        )
    )
    da = deg.select(F.col("v").alias("ua"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("ub"), F.col("d").alias("db"))
    ek = (
        und.join(da, "ua")
        .join(db, "ub")
        .select("da", "db", ks)
        .groupBy("k")
        .agg(
            F.sum(
                F.when(
                    (F.col("da") > F.col("k")) & (F.col("db") > F.col("k")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("e_k")
        )
    )
    return (
        nk.join(ek, "k")
        .select(
            F.col("k").cast("long").alias("k"),
            "n_k",
            "e_k",
            F.when(
                F.col("n_k") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.col("e_k").cast("double")
                    / (F.col("n_k") * (F.col("n_k") - 1)).cast("double"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("phi"),
        )
        .orderBy("k")
    )


def _rich_club_sql() -> str:
    klist = ", ".join(str(k) for k in RICH_CLUB_KS)
    return f"""
WITH {_EDGES_CTE.replace("nn AS", "nn AS")},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS ua,
                  greatest(source_doc_id, target_doc_id) AS ub
  FROM edges
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT ua AS v FROM und UNION ALL SELECT ub FROM und
  ) GROUP BY v
),
ks AS (SELECT unnest([{klist}]) AS k),
nk AS (
  SELECT ks.k,
         CAST(sum(CASE WHEN deg.d > ks.k THEN 1 ELSE 0 END) AS BIGINT) AS n_k
  FROM deg, ks GROUP BY ks.k
),
ek AS (
  SELECT ks.k,
         CAST(sum(CASE WHEN da.d > ks.k AND db.d > ks.k
                       THEN 1 ELSE 0 END) AS BIGINT) AS e_k
  FROM und u JOIN deg da ON da.v = u.ua JOIN deg db ON db.v = u.ub, ks
  GROUP BY ks.k
)
SELECT CAST(nk.k AS BIGINT) AS k, nk.n_k, ek.e_k,
       CASE WHEN nk.n_k >= 2 THEN
         round(2.0 * CAST(ek.e_k AS DOUBLE)
               / CAST(nk.n_k * (nk.n_k - 1) AS DOUBLE), 6)
       ELSE 0.0 END AS phi
FROM nk JOIN ek ON ek.k = nk.k
ORDER BY k
"""


SQL_RICH_CLUB = _rich_club_sql()


# --------------------------------------------------------------------------
# Label modularity on the similarity graph (Newman 2004's Q for the
# label partition over SRP bucket-collision edges — does the `label`
# column explain the embedding neighborhood structure? The graph-side
# twin of cluster_quality's geometric silhouette): Q = intra/m -
# sum(deg_l^2)/(4m^2), computed from THREE exact BIGINTs (intra-edge
# count, total edges, sum of squared label degrees) — no per-label float
# accumulation at all. Edges are the deterministic 32-plane/4-band SRP
# collisions (same machinery as embedding_near_dup).
# --------------------------------------------------------------------------
def q_label_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", F.col("label").cast("long").alias("label")
    )
    banded = S.srp_banded(
        emb, n_planes=ND_PLANES, bands=ND_BANDS, dim=_EMB_DIM
    )
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    pairs = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    la = emb.select(F.col("vec_id").alias("id_a"), F.col("label").alias("lab_a"))
    lb = emb.select(F.col("vec_id").alias("id_b"), F.col("label").alias("lab_b"))
    lp = pairs.join(F.broadcast(la), "id_a").join(F.broadcast(lb), "id_b")
    scalars = lp.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.when(F.col("lab_a") == F.col("lab_b"), 1).otherwise(0))
        .cast("long")
        .alias("intra"),
    )
    degs = (
        lp.select(F.col("lab_a").alias("lab"))
        .unionByName(lp.select(F.col("lab_b").alias("lab")))
        .groupBy("lab")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .agg(F.sum(F.col("deg") * F.col("deg")).cast("long").alias("degsq"))
    )
    md, intra, degsq = (
        F.col("m").cast("double"),
        F.col("intra").cast("double"),
        F.col("degsq").cast("double"),
    )
    return scalars.crossJoin(F.broadcast(degs)).select(
        "m",
        "intra",
        "degsq",
        F.round(
            intra / md - degsq / (F.lit(4.0) * md * md), 6
        ).alias("modularity"),
    )


SQL_LABEL_MODULARITY = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
  FROM embeddings
),
{_srp_cte("e", ND_PLANES, ND_PLANES // ND_BANDS)},
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a
  JOIN buckets b ON b.band = a.band AND b.bucket = a.bucket
                AND a.vec_id < b.vec_id
),
lp AS (
  SELECT ea.label AS lab_a, eb.label AS lab_b
  FROM pairs p JOIN e ea ON ea.vec_id = p.id_a JOIN e eb ON eb.vec_id = p.id_b
),
scalars AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(CASE WHEN lab_a = lab_b THEN 1 ELSE 0 END) AS BIGINT)
           AS intra
  FROM lp
),
degs AS (
  SELECT CAST(sum(deg * deg) AS BIGINT) AS degsq FROM (
    SELECT lab, CAST(count(*) AS BIGINT) AS deg FROM (
      SELECT lab_a AS lab FROM lp UNION ALL SELECT lab_b FROM lp
    ) GROUP BY lab
  )
)
SELECT m, intra, degsq,
       round(CAST(intra AS DOUBLE) / CAST(m AS DOUBLE)
             - CAST(degsq AS DOUBLE)
               / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)
         AS modularity
FROM scalars, degs
"""


# --------------------------------------------------------------------------
# Degree CCDF table (the raw evidence behind the power-law MLE pair —
# Clauset et al. insist on seeing the complementary cumulative counts,
# not just alpha-hat): nodes with total degree >= k for k in powers of
# two. Degrees from the shared synthetic link graph; every output is an
# exact BIGINT count from one bounded threshold explode.
# --------------------------------------------------------------------------
def q_degree_ccdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, edges = _edges(spark, sf_dir)
    deg = (
        edges.select(F.col("source_doc_id").alias("v"))
        .unionAll(edges.select(F.col("target_doc_id").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True)
    )
    ks = spark.range(0, 9).select(
        F.pow(F.lit(2.0), F.col("id")).cast("long").alias("k")
    )
    tot = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    return (
        deg.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("d") >= F.col("k"), 1).otherwise(0))
            .cast("long")
            .alias("n_ge_k")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_ge_k",
            F.round(
                F.col("n_ge_k").cast("double")
                / F.col("n_nodes").cast("double"),
                6,
            ).alias("ccdf"),
        )
        .orderBy("k")
    )


SQL_DEGREE_CCDF = f"""
WITH {_EDGES_CTE},
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT source_doc_id AS v FROM edges
    UNION ALL SELECT target_doc_id FROM edges
  ) GROUP BY v
),
ks AS (SELECT CAST(power(2, unnest(range(0, 9))) AS BIGINT) AS k),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
SELECT k,
       CAST(sum(CASE WHEN d >= k THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_k,
       round(CAST(sum(CASE WHEN d >= k THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(n_nodes AS DOUBLE), 6) AS ccdf
FROM deg, ks, tot
GROUP BY k, n_nodes
ORDER BY k
"""


# --------------------------------------------------------------------------
# Bond percolation census (the random-FAILURE complement to
# hub_knockout's targeted attack; Callaway et al. 2000): delete each
# undirected edge iff the first hex digit of md5("a_b") is >= '8' — a
# deterministic, engine-portable 50% coin (invariant 2) — and census
# the surviving components. Spark runs the exact star-contraction CC;
# the oracle replays bounded min-label propagation (the hub_knockout
# discipline). The intact-graph census lives in hub_knockout's
# 'before' phase — this pair reports the percolated side.
# --------------------------------------------------------------------------
def q_edge_percolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data.dedup import connected_components

    docs, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("id_a"),
            F.greatest("source_doc_id", "target_doc_id").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    coin = F.substring(
        F.md5(
            F.concat(
                F.col("id_a").cast("string"),
                F.lit("_"),
                F.col("id_b").cast("string"),
            )
        ),
        1,
        1,
    )
    kept = und.filter(coin < F.lit("8")).localCheckpoint(eager=True)
    n_all = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    n_kept = kept.agg(F.count(F.lit(1)).cast("long").alias("kept_edges"))
    comp = connected_components(kept, nodes=docs, id_col="doc_id")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("sz")
    )
    return (
        sizes.agg(
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.max("sz").cast("long").alias("largest_component"),
            F.sum("sz").cast("long").alias("n_nodes"),
        )
        .crossJoin(F.broadcast(n_all))
        .crossJoin(F.broadcast(n_kept))
        .select(
            "n_nodes",
            "n_edges",
            "kept_edges",
            "n_components",
            "largest_component",
            F.round(
                F.col("largest_component").cast("double")
                / F.col("n_nodes").cast("double"),
                6,
            ).alias("giant_fraction"),
        )
    )


SQL_EDGE_PERCOLATION = f"""
WITH RECURSIVE {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS id_a,
                  greatest(source_doc_id, target_doc_id) AS id_b
  FROM edges
),
kept AS (
  SELECT * FROM und
  WHERE substring(md5(CAST(id_a AS VARCHAR) || '_'
                      || CAST(id_b AS VARCHAR)), 1, 1) < '8'
),
na AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
nk AS (SELECT CAST(count(*) AS BIGINT) AS kept_edges FROM kept),
msgs AS (
  SELECT id_a AS src, id_b AS dst FROM kept
  UNION ALL SELECT id_b, id_a FROM kept
  UNION ALL SELECT doc_id, doc_id FROM documents
),
lp AS (
  SELECT 0 AS iter, doc_id AS node, doc_id AS lbl FROM documents
  UNION ALL
  SELECT lp.iter + 1, m.dst, min(lp.lbl)
  FROM lp JOIN msgs m ON m.src = lp.node
  WHERE lp.iter < {KNOCKOUT_LP_ROUNDS}
  GROUP BY 1, 2
),
comp AS (
  SELECT node, lbl AS component FROM lp WHERE iter = {KNOCKOUT_LP_ROUNDS}
),
sizes AS (
  SELECT component, CAST(count(*) AS BIGINT) AS sz
  FROM comp GROUP BY component
),
census AS (
  SELECT CAST(count(*) AS BIGINT) AS n_components,
         CAST(max(sz) AS BIGINT) AS largest_component,
         CAST(sum(sz) AS BIGINT) AS n_nodes
  FROM sizes
)
SELECT n_nodes, n_edges, kept_edges, n_components, largest_component,
       round(CAST(largest_component AS DOUBLE) / CAST(n_nodes AS DOUBLE),
             6) AS giant_fraction
FROM census, na, nk
"""


# --------------------------------------------------------------------------
# SALSA authority/hub scores (Lempel & Moran 2001, "stochastic approach
# for link-structure analysis") over the same synthetic link graph as
# pagerank/hits_scores — via the paper's CLOSED FORM instead of power
# iteration: each chain's stationary probability is
# (|C|/|side|) * (deg(i) / sum_{j in C} deg(j)), where C is the node's
# connected component in the co-hub (resp. co-authority) graph. So the
# whole computation is exact integers: degrees from distinct edges,
# components from the scale-safe star trick (every target links to its
# hub's MIN target — linear edges, identical components to the quadratic
# co-citation graph), one divide at the end. Spark reuses the
# large-star/small-star contraction (training_data.dedup); the oracle
# replays closure over the same star edges recursively.
# --------------------------------------------------------------------------
def q_salsa_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    edges = edges.localCheckpoint(eager=True)

    def side(deg_key: str, star_key: str, label: str) -> DataFrame:
        deg = (
            edges.groupBy(deg_key)
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .withColumnRenamed(deg_key, "doc_id")
        )
        kmin = edges.groupBy(star_key).agg(F.min(deg_key).alias("_m"))
        star = edges.join(kmin, star_key).select(
            F.col(deg_key).alias("id_a"), F.col("_m").alias("id_b")
        )
        comps = D.connected_components(star, nodes=deg.select("doc_id"))
        n_side = scalar_count(deg, as_double=False)
        stat = (
            deg.join(comps, "doc_id")
            .groupBy("component")
            .agg(
                F.count(F.lit(1)).cast("long").alias("comp_size"),
                F.sum("deg").cast("long").alias("cdeg"),
            )
        )
        return (
            deg.join(comps, "doc_id")
            .join(F.broadcast(stat), "component")
            .crossJoin(F.broadcast(n_side))
            .select(
                F.lit(label).alias("side"),
                "doc_id",
                "deg",
                "comp_size",
                F.round(
                    (F.col("comp_size") * F.col("deg")).cast("double")
                    / (F.col("_n") * F.col("cdeg")).cast("double"),
                    6,
                ).alias("salsa"),
            )
        )

    return (
        side("target_doc_id", "source_doc_id", "authority")
        .unionByName(side("source_doc_id", "target_doc_id", "hub"))
        .orderBy("side", F.desc("salsa"), F.asc("doc_id"))
    )


def _salsa_side_sql(deg_key: str, star_key: str, label: str, tag: str) -> str:
    return f"""
deg_{tag} AS (
  SELECT {deg_key} AS doc_id, CAST(count(*) AS BIGINT) AS deg
  FROM edges GROUP BY 1
),
kmin_{tag} AS (
  SELECT {star_key}, min({deg_key}) AS m FROM edges GROUP BY 1
),
star_{tag} AS (
  SELECT DISTINCT e.{deg_key} AS src, k.m AS dst
  FROM edges e JOIN kmin_{tag} k USING ({star_key})
  WHERE e.{deg_key} <> k.m
  UNION
  SELECT DISTINCT k.m, e.{deg_key}
  FROM edges e JOIN kmin_{tag} k USING ({star_key})
  WHERE e.{deg_key} <> k.m
),
reach_{tag} AS (
  SELECT src AS node, dst AS peer FROM star_{tag}
  UNION
  SELECT r.node, e.dst FROM reach_{tag} r JOIN star_{tag} e ON e.src = r.peer
),
comp_{tag} AS (
  SELECT d.doc_id,
         COALESCE(least(d.doc_id, r.mn), d.doc_id) AS component
  FROM deg_{tag} d
  LEFT JOIN (SELECT node, min(peer) AS mn FROM reach_{tag} GROUP BY node) r
    ON r.node = d.doc_id
),
stat_{tag} AS (
  SELECT component, CAST(count(*) AS BIGINT) AS comp_size,
         CAST(sum(deg) AS BIGINT) AS cdeg
  FROM comp_{tag} JOIN deg_{tag} USING (doc_id)
  GROUP BY component
),
n_{tag} AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg_{tag}),
out_{tag} AS (
  SELECT '{label}' AS side, d.doc_id, d.deg, s.comp_size,
         round(CAST(s.comp_size * d.deg AS DOUBLE)
               / CAST(n_{tag}.n * s.cdeg AS DOUBLE), 6) AS salsa
  FROM deg_{tag} d
  JOIN comp_{tag} c USING (doc_id)
  JOIN stat_{tag} s ON s.component = c.component, n_{tag}
)
"""


SQL_SALSA_SCORES = f"""
WITH RECURSIVE {_EDGES_CTE},
{_salsa_side_sql("target_doc_id", "source_doc_id", "authority", "a")},
{_salsa_side_sql("source_doc_id", "target_doc_id", "hub", "h")}
SELECT * FROM out_a
UNION ALL
SELECT * FROM out_h
"""


# --------------------------------------------------------------------------
# Bipartite butterfly census on the user-eventtype graph (butterfly =
# 2x2 biclique, the bipartite analog of the triangle; Sanei-Mehri et
# al. 2018): per type pair, the number of users touching both and the
# C(n,2) butterflies that pair closes, plus each pair's share of the
# global count. The alphabet side is tiny so the pair join is bounded
# at |types|² rows after a distinct-first edge reduction; every count
# is an exact BIGINT (C(n,2) = n*(n-1)/2 stays integral via DIV 2).
# --------------------------------------------------------------------------
def q_butterfly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _read(spark, sf_dir, "events")
    edges = events.groupBy("user_id", "event_type").agg(
        F.lit(1).alias("_o")
    ).select("user_id", "event_type")
    a = edges.select("user_id", F.col("event_type").alias("ta"))
    b = edges.select(
        F.col("user_id").alias("u2"), F.col("event_type").alias("tb")
    )
    co = (
        a.join(
            b,
            (F.col("user_id") == F.col("u2")) & (F.col("ta") < F.col("tb")),
        )
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).cast("long").alias("co_users"))
    )
    bf = F.expr("(co_users * (co_users - 1)) DIV 2")
    pairs = co.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "co_users",
        bf.cast("long").alias("butterflies"),
    )
    tot = pairs.agg(F.sum("butterflies").cast("long").alias("_t"))
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "co_users",
            "butterflies",
            F.round(
                F.col("butterflies").cast("double")
                / F.col("_t").cast("double"),
                6,
            ).alias("share"),
        )
        .orderBy("type_a", "type_b")
    )


SQL_BUTTERFLY_COUNTS = """
WITH edges AS (
  SELECT DISTINCT user_id, event_type FROM events
),
co AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS co_users
  FROM edges a JOIN edges b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
),
pairs AS (
  SELECT type_a, type_b, co_users,
         CAST((co_users * (co_users - 1)) // 2 AS BIGINT) AS butterflies
  FROM co
),
tot AS (SELECT CAST(sum(butterflies) AS BIGINT) AS t FROM pairs)
SELECT type_a, type_b, co_users, butterflies,
       round(CAST(butterflies AS DOUBLE) / CAST(tot.t AS DOUBLE), 6)
         AS share
FROM pairs, tot
ORDER BY type_a, type_b
"""


# --------------------------------------------------------------------------
# Friendship paradox on the link graph (Feld 1991): your neighbors have
# more links than you — mean neighbor degree E[d²]/E[d] vs mean degree
# E[d], ratio n·Σd²/(Σd)², on the undirected version of the synthetic
# web graph. The structural inequality that makes degree-biased crawl
# seeding and acquaintance immunization work; the graph-side twin of
# inspection_paradox (both are length-biased sampling). Degrees and both
# moment sums are exact BIGINTs; two divides, rounded 6.
# --------------------------------------------------------------------------
def q_friendship_paradox(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("a"),
            F.greatest("source_doc_id", "target_doc_id").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    agg = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("d").cast("long").alias("sd"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
    )
    mean_deg = F.col("sd").cast("double") / F.col("n").cast("double")
    mean_nbr = F.col("sdd").cast("double") / F.col("sd").cast("double")
    return agg.select(
        F.col("n").alias("n_nodes"),
        F.col("sd").alias("sum_deg"),
        F.round(mean_deg, 6).alias("mean_degree"),
        F.round(mean_nbr, 6).alias("mean_neighbor_degree"),
        F.round(
            F.col("n").cast("double")
            * F.col("sdd").cast("double")
            / (F.col("sd").cast("double") * F.col("sd").cast("double")),
            6,
        ).alias("paradox_ratio"),
    )


SQL_FRIENDSHIP_PARADOX = f"""
WITH {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
         greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sd,
         CAST(sum(d * d) AS BIGINT) AS sdd
  FROM deg
)
SELECT n AS n_nodes, sd AS sum_deg,
       round(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_degree,
       round(CAST(sdd AS DOUBLE) / CAST(sd AS DOUBLE), 6)
         AS mean_neighbor_degree,
       round(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
             / (CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)), 6)
         AS paradox_ratio
FROM agg
"""


# --------------------------------------------------------------------------
# Degree-vs-age correlation on the link graph (the preferential-
# attachment signature: in a rich-get-richer growth process, earlier
# nodes accumulate higher degree, so corr(node id, degree) runs
# negative when ids encode crawl/creation order): Pearson r from exact
# BIGINT moments over (doc_id, undirected degree). Complements
# powerlaw_fit (the degree distribution's shape) with the GROWTH
# mechanism test.
# --------------------------------------------------------------------------
def q_degree_age_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs, edges = _edges(spark, sf_dir)
    und = (
        edges.select(
            F.least("source_doc_id", "target_doc_id").alias("a"),
            F.greatest("source_doc_id", "target_doc_id").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    full = docs.select(F.col("doc_id").alias("node")).join(
        deg, "node", "left"
    ).select(
        "node", F.coalesce("d", F.lit(0)).cast("long").alias("d")
    )
    agg = full.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("node").cast("long").alias("sx"),
        F.sum(F.col("node") * F.col("node")).cast("long").alias("sxx"),
        F.sum("d").cast("long").alias("sy"),
        F.sum(F.col("d") * F.col("d")).cast("long").alias("syy"),
        F.sum(F.col("node") * F.col("d")).cast("long").alias("sxy"),
    )
    n, sx, sxx, sy, syy, sxy = [
        F.col(c).cast("double")
        for c in ["n", "sx", "sxx", "sy", "syy", "sxy"]
    ]
    r = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return agg.select(
        F.col("n").alias("n_nodes"),
        F.round(sy / n, 6).alias("mean_degree"),
        F.round(r, 6).alias("age_degree_corr"),
    )


SQL_DEGREE_AGE_CORR = f"""
WITH {_EDGES_CTE},
und AS (
  SELECT DISTINCT least(source_doc_id, target_doc_id) AS a,
         greatest(source_doc_id, target_doc_id) AS b
  FROM edges
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
full_nodes AS (
  SELECT doc_id AS node, CAST(COALESCE(deg.d, 0) AS BIGINT) AS d
  FROM documents LEFT JOIN deg ON deg.node = documents.doc_id
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(node) AS BIGINT) AS sx,
         CAST(sum(node * node) AS BIGINT) AS sxx,
         CAST(sum(d) AS BIGINT) AS sy,
         CAST(sum(d * d) AS BIGINT) AS syy,
         CAST(sum(node * d) AS BIGINT) AS sxy
  FROM full_nodes
)
SELECT n AS n_nodes,
       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_degree,
       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS age_degree_corr
FROM agg
"""


QUERIES = {
    "anchor_text": q_anchor_text,
    "bowtie_structure": q_bowtie_structure,
    "butterfly_counts": q_butterfly_counts,
    "cocitation_coupling": q_cocitation_coupling,
    "degree_age_corr": q_degree_age_corr,
    "degree_ccdf": q_degree_ccdf,
    "degree_correlation": q_degree_correlation,
    "degree_counts": q_degree_counts,
    "edge_percolation": q_edge_percolation,
    "edge_support": q_edge_support,
    "friendship_paradox": q_friendship_paradox,
    "global_transitivity": q_global_transitivity,
    "graph_mixing": q_graph_mixing,
    "harmonic_centrality": q_harmonic_centrality,
    "hits_scores": q_hits_scores,
    "host_authority": q_host_authority,
    "hub_knockout": q_hub_knockout,
    "k_core": q_k_core,
    "katz_centrality": q_katz_centrality,
    "label_modularity": q_label_modularity,
    "label_propagation": q_label_propagation,
    "link_distance": q_link_distance,
    "link_prediction": q_link_prediction,
    "link_reciprocity": q_link_reciprocity,
    "markov_stationary": q_markov_stationary,
    "pagerank": q_pagerank,
    "pagerank_convergence": q_pagerank_convergence,
    "personalized_pagerank": q_personalized_pagerank,
    "rich_club": q_rich_club,
    "salsa_scores": q_salsa_scores,
    "textrank_keywords": q_textrank_keywords,
    "triangle_counts": q_triangle_counts,
}

ORACLES = {
    "anchor_text": SQL_ANCHOR_TEXT,
    "bowtie_structure": SQL_BOWTIE_STRUCTURE,
    "butterfly_counts": SQL_BUTTERFLY_COUNTS,
    "cocitation_coupling": SQL_COCITATION_COUPLING,
    "degree_age_corr": SQL_DEGREE_AGE_CORR,
    "degree_ccdf": SQL_DEGREE_CCDF,
    "degree_correlation": SQL_DEGREE_CORRELATION,
    "degree_counts": SQL_DEGREE_COUNTS,
    "edge_percolation": SQL_EDGE_PERCOLATION,
    "edge_support": SQL_EDGE_SUPPORT,
    "friendship_paradox": SQL_FRIENDSHIP_PARADOX,
    "global_transitivity": SQL_GLOBAL_TRANSITIVITY,
    "graph_mixing": SQL_GRAPH_MIXING,
    "harmonic_centrality": SQL_HARMONIC_CENTRALITY,
    "hits_scores": SQL_HITS_SCORES,
    "host_authority": SQL_HOST_AUTHORITY,
    "hub_knockout": SQL_HUB_KNOCKOUT,
    "k_core": SQL_K_CORE,
    "katz_centrality": SQL_KATZ_CENTRALITY,
    "label_modularity": SQL_LABEL_MODULARITY,
    "label_propagation": SQL_LABEL_PROPAGATION,
    "link_distance": SQL_LINK_DISTANCE,
    "link_prediction": SQL_LINK_PREDICTION,
    "link_reciprocity": SQL_LINK_RECIPROCITY,
    "markov_stationary": SQL_MARKOV_STATIONARY,
    "pagerank": SQL_PAGERANK,
    "pagerank_convergence": SQL_PAGERANK_CONVERGENCE,
    "personalized_pagerank": SQL_PERSONALIZED_PAGERANK,
    "rich_club": SQL_RICH_CLUB,
    "salsa_scores": SQL_SALSA_SCORES,
    "textrank_keywords": SQL_TEXTRANK_KEYWORDS,
    "triangle_counts": SQL_TRIANGLE_COUNTS,
}
