package graft.piglatin

/** Pig Latin AST (reference grammar: src/main/scala/dbis/piglet/parser/
  * PigParser.scala — re-derived from the language surface, not the
  * implementation; graft compiles statements to Catalyst plans instead of
  * emitting RDD source code). */
object Ast {

  // ---- expressions ---------------------------------------------------------
  sealed trait Expr
  /** Dotted reference: field, alias::field suffix, or bag.field projection. */
  final case class FieldRef(path: Seq[String]) extends Expr
  /** Positional reference $0, $1, ... */
  final case class PosRef(i: Int) extends Expr
  final case class Lit(v: Any) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class Not(e: Expr) extends Expr
  final case class Neg(e: Expr) extends Expr
  final case class FuncCall(name: String, args: Seq[Expr]) extends Expr
  final case class Flatten(e: Expr) extends Expr
  case object Star extends Expr
  final case class CastExpr(typeName: String, e: Expr) extends Expr
  final case class IsNull(e: Expr, negated: Boolean) extends Expr

  /** GENERATE item: `expr [AS name[:type]]`. The declared type is kept
    * as INTENT only — Pig's GENERATE AS declares without casting (only
    * LOAD's AS coerces; explicit `(type)` operators cast), and the
    * reference's rscript.pig truth confirms (`AS cluster:int` over a
    * double stores 4.0). */
  final case class GenItem(expr: Expr, as: Option[String],
                           asType: Option[String] = None)

  // ---- schema --------------------------------------------------------------
  final case class FieldSchema(name: String, typeName: String)

  // ---- nested FOREACH ------------------------------------------------------
  sealed trait NestedOp
  /** x = bag.field (bag projection) */
  final case class NProj(source: Seq[String]) extends NestedOp
  final case class NDistinct(ref: String) extends NestedOp
  final case class NFilter(ref: String, cond: Expr) extends NestedOp
  final case class NOrder(ref: String, key: Option[String],
                          desc: Boolean) extends NestedOp
  final case class NLimit(ref: String, n: Int) extends NestedOp

  // ---- statements ----------------------------------------------------------
  sealed trait Stmt
  final case class Load(alias: String, path: String,
                        loader: Option[(String, Seq[String])],
                        schema: Option[Seq[FieldSchema]]) extends Stmt
  final case class Store(alias: String, path: String,
                         loader: Option[(String, Seq[String])]) extends Stmt
  /** DUMP a [mute] — mute (ref dumpStmt, parser :425) evaluates the
    * relation without printing rows (the reference's timing-only mode). */
  final case class Dump(alias: String, mute: Boolean = false) extends Stmt
  final case class Describe(alias: String) extends Stmt
  final case class Filter(alias: String, in: String, cond: Expr) extends Stmt
  final case class Foreach(alias: String, in: String,
                           items: Seq[GenItem]) extends Stmt
  final case class ForeachNested(alias: String, in: String,
                                 assigns: Seq[(String, NestedOp)],
                                 items: Seq[GenItem]) extends Stmt
  final case class Group(alias: String, in: String, keys: Seq[Expr],
                         all: Boolean) extends Stmt
  final case class CoGroup(alias: String,
                           ins: Seq[(String, Seq[Expr])]) extends Stmt
  final case class Join(alias: String, ins: Seq[(String, Seq[Expr])],
                        joinType: String) extends Stmt
  final case class Cross(alias: String, ins: Seq[String]) extends Stmt
  /** onSchema: UNION ONSCHEMA aligns by name with null padding; plain
    * Pig UNION is POSITIONAL (same arity, left relation's names). */
  final case class Union(alias: String, ins: Seq[String],
                         onSchema: Boolean) extends Stmt
  final case class DistinctStmt(alias: String, in: String) extends Stmt
  final case class LimitStmt(alias: String, in: String, n: Int) extends Stmt
  final case class OrderBy(alias: String, in: String,
                           keys: Seq[(Expr, Boolean)]) extends Stmt
  final case class SampleStmt(alias: String, in: String,
                              fraction: Double) extends Stmt
  /** branch cond None = OTHERWISE (rows matching no other branch). */
  final case class SplitInto(in: String,
                             branches: Seq[(String, Option[Expr])]) extends Stmt
  final case class RankStmt(alias: String, in: String,
                            keys: Seq[(Expr, Boolean)]) extends Stmt
  final case class Accumulate(alias: String, in: String,
                              items: Seq[GenItem]) extends Stmt
  final case class IntersectStmt(alias: String, l: String, r: String) extends Stmt
  final case class DifferenceStmt(alias: String, l: String, r: String) extends Stmt
  final case class StreamThrough(alias: String, in: String,
                                 opName: String, args: Seq[Expr],
                                 outSchema: Option[Seq[FieldSchema]]) extends Stmt
  final case class RScriptStmt(alias: String, in: String,
                               code: String) extends Stmt
  final case class Materialize(alias: String) extends Stmt
  final case class SetCmd(key: String, value: String) extends Stmt
  final case class FsCmd(cmd: String, params: List[String]) extends Stmt
  final case class Register(path: String) extends Stmt
  final case class DefineAlias(name: String, target: String) extends Stmt

  // ---- reference extensions: CEP / streaming / RDF / spatial ---------------
  sealed trait Pat
  final case class PSimple(name: String) extends Pat
  final case class PSeq(items: Seq[Pat]) extends Pat
  final case class PAnd(items: Seq[Pat]) extends Pat
  final case class POr(items: Seq[Pat]) extends Pat
  final case class PNeg(item: Pat) extends Pat

  /** MATCH_EVENT in [BY key] PATTERN p WITH (A: expr, ...) [MODE m]
    * [WITHIN n unit] [REORDER BY 'delay'] — `key` partitions the scan
    * (default: one global key), `reorder` opts a STREAMING input into
    * the watermark-delayed reorder buffer (out-of-order sources). */
  final case class MatchEvent(alias: String, in: String, pattern: Pat,
                              defs: Seq[(String, Expr)], mode: String,
                              withinSeconds: Long,
                              key: Option[String] = None,
                              reorder: Option[String] = None) extends Stmt

  /** WINDOW in RANGE n unit SLIDE RANGE m unit | ROWS n SLIDE ROWS m */
  final case class WindowStmt(alias: String, in: String,
                              rows: Boolean, size: Long, sizeUnit: String,
                              slide: Long, slideUnit: String) extends Stmt

  /** SOCKET_READ 'h:p' [MODE zmq] [USING ...] [AS schema]
    * [TIMESTAMP(field)] — tsField marks the event-time column (reference
    * zmq production, parser :839). */
  final case class SocketRead(alias: String, address: String, mode: String,
                              loader: Option[(String, Seq[String])],
                              schema: Option[Seq[FieldSchema]],
                              tsField: Option[String] = None) extends Stmt
  final case class SocketWrite(in: String, address: String,
                               mode: String) extends Stmt

  /** grouped: RDFLOAD('f') grouped on subject|predicate|object — the
    * reference's pre-grouped triple layout (col, stmts:{(other, other)}). */
  final case class RdfLoad(alias: String, uri: String,
                           grouped: Option[String] = None) extends Stmt
  final case class TuplifyStmt(alias: String, in: String, on: Expr) extends Stmt
  /** Triple pattern term: Left(varName) for ?v / $n, Right(const). */
  final case class TriplePat(s: Either[String, String],
                             p: Either[String, String],
                             o: Either[String, String])
  final case class BgpFilter(alias: String, in: String,
                             patterns: Seq[TriplePat]) extends Stmt

  /** SPATIAL_FILTER in BY pred(...) — pred ∈ {containedby(pt, box(...)),
    * dwithin(pt, point(x, y), r)}. */
  final case class SpatialFilterStmt(alias: String, in: String,
                                     pred: FuncCall) extends Stmt
  /** SPATIAL_JOIN l, r ON pred(g1, g2[, radius]) —
    * pred ∈ {dwithin, containedby, contains, intersects}. */
  final case class SpatialJoinStmt(alias: String, left: String, right: String,
                                   pred: FuncCall) extends Stmt
  /** c = PARTITION b ON geom USING grid(...) (reference op/Partition). */
  /** PARTITION in ON field [USING grid(...)|bsp(...)] — params are raw
    * `k=v` or positional value strings (reference partitionMethod). */
  final case class PartitionStmt(alias: String, in: String,
                                 geomField: String,
                                 method: String = "grid",
                                 params: Seq[String] = Nil) extends Stmt
  /** b = ZIP a WITH INDEX (reference zipWithIndexStmt). */
  final case class ZipIndexStmt(alias: String, in: String) extends Stmt
  /** b = ZIP a, c, d — positional zip of ≥2 relations (reference
    * zipWithBagsStmt). */
  final case class ZipBagsStmt(alias: String, ins: Seq[String]) extends Stmt
  /** b = CACHE a [storageLevel] (reference cacheStmt / op/Cache.scala). */
  final case class CacheStmt(alias: String, in: String,
                             mode: Option[String]) extends Stmt
  /** b = INDEX a ON field USING rtree(...) (reference indexStmt /
    * op/IndexOp.scala). method = the USING ident, lowercased. */
  final case class IndexStmt(alias: String, in: String, field: String,
                             method: String = "grid") extends Stmt
  /** b = DELAY a BY (wtime, samplePct) — stream-rate simulation
    * (reference op/Delay.scala). */
  final case class DelayStmt(alias: String, in: String, waitMs: Long,
                             samplePct: Int) extends Stmt
  /** b = SKYLINE a BY (f1 [MAX], f2, ...) — Pareto-dominance filter
    * (graft dialect for the reference's skyline.pig eventlib UDO; dims
    * minimize unless flagged MAX). */
  final case class SkylineStmt(alias: String, in: String,
                               dims: Seq[(String, Boolean)]) extends Stmt
  /** VISUALIZE a BY field INTO 'img.png' [WITH POINTSIZE n] [POINTSONLY]
    * AS (w, h) (reference op/Visualize.scala; POINTSONLY keyword at
    * parser/PigParser.scala:973 — uniform dots, no density shading). */
  final case class VisualizeStmt(in: String, field: Expr, path: String,
                                 pointSize: Option[Int], width: Int,
                                 height: Int,
                                 pointsOnly: Boolean = false) extends Stmt

  // ---- graft dialect: LLM-data-curation statements (no reference
  // analog — the headline dedup/quality/tokenize layer, scriptable) ----------
  /** `b = DEDUP a BY id, content USING method(k=v, …)` — returns the
    * input minus all but one representative per duplicate group.
    * Methods: exact | minhash | simhash | jaccard | cosine | semantic
    * (content = text column for the first four, embedding column for
    * cosine/semantic). */
  final case class DedupStmt(alias: String, in: String, idField: String,
                             contentField: String, method: String,
                             params: Map[String, String]) extends Stmt
  /** `b = QUALITY a BY text [USING gopher]` — appends `quality` (score
    * in 0..1) or, USING gopher, the rule-filter `keep` boolean. */
  final case class QualityStmt(alias: String, in: String, field: String,
                               method: String) extends Stmt
  /** `b = TOKENIZE_DOCS a BY text [USING bpe(merges=…, sample=…,
    * seed=…)]` — appends `tokens` (array<string>): whitespace tokens by
    * default, learned-BPE tokens with USING bpe (merges trained on the
    * input's seeded sample, the quantizer regime). */
  final case class TokenizeStmt(alias: String, in: String, field: String,
                                method: String,
                                params: Map[String, String]) extends Stmt
  /** `b = DECONTAMINATE a BY id, text AGAINST bench BY bid, btext
    * [USING clean|report|fuzzy(n=8, minhits=1, threshold=0.5, …)]` —
    * drop (clean/fuzzy) or report corpus docs leaking benchmark
    * content. */
  final case class DecontaminateStmt(alias: String, in: String,
                                     idField: String, textField: String,
                                     bench: String, benchIdField: String,
                                     benchTextField: String, method: String,
                                     params: Map[String, String]) extends Stmt
  /** `b = PACK a ON doc_id BY text INTO 2048` — GPT-style
    * concat-and-chunk layout: BY names a numeric per-doc token count or
    * a string column to whitespace-count; INTO is the sequence length. */
  final case class PackStmt(alias: String, in: String, idField: String,
                            byField: String, seqLen: Long) extends Stmt
  /** `b = SPLIT_HASH a BY doc_id INTO train 80, val 10, test 10` —
    * deterministic md5-bucket split assignment (appends `split`). */
  final case class SplitHashStmt(alias: String, in: String,
                                 keyFields: Seq[String],
                                 splits: Seq[(String, Int)]) extends Stmt
  /** `b = TEMPERATURE a BY lang ALPHA 0.5 KEY doc_id[, …];` — n^α
    * group rebalancing over the shared md5 bucket (smallest group kept
    * whole, kept mass ∝ groupSize^α). */
  final case class TemperatureStmt(alias: String, in: String,
                                   strata: String, alpha: Double,
                                   keyFields: Seq[String]) extends Stmt
  /** `b = TOP_FRAC a BY lang PCT 25 SCORE n_chars KEY doc_id[, …];` —
    * keep the best pct% of every group by score (integer-exact
    * per-group quota, ties by the key fields). */
  final case class TopFracStmt(alias: String, in: String, strata: String,
                               pct: Int, scoreField: String,
                               keyFields: Seq[String]) extends Stmt
  /** `b = OUTLIERS a BY grp ON x [K 3.0];` — robust per-group
    * median/MAD anomaly flag (appends `is_outlier`). */
  final case class OutliersStmt(alias: String, in: String, strata: String,
                                valueField: String, k: Double) extends Stmt
  /** `d = DIFF a, b BY id ON content;` — snapshot diff: (k, status ∈
    * added|removed|changed) between two corpus versions. */
  final case class DiffStmt(alias: String, inA: String, inB: String,
                            keyField: String,
                            contentField: String) extends Stmt
  /** `x = ASOF_JOIN l BY k ON ts, r BY k ON rts [TOLERANCE n]
    * [DIRECTION forward];` — latest right row at-or-before (backward)
    * or earliest at-or-after (forward) each left row per key; right
    * payload columns (all but keys + time) join under their own names. */
  final case class AsofJoinStmt(alias: String, inL: String,
                                keys: Seq[String], tsL: String,
                                inR: String, keysR: Seq[String],
                                tsR: String, tolerance: Option[Long],
                                direction: String) extends Stmt
  /** `x = INTERVAL_JOIN p ON pt, i ON lo, hi WIDTH w [BY k1, …]
    * [INCLUSIVE];` — points into possibly-overlapping ranges via
    * fixed-width bucket replication (equi-join + exact refine). */
  final case class IntervalJoinStmt(alias: String, inP: String,
                                    pCol: String, inI: String,
                                    loCol: String, hiCol: String,
                                    width: Long, keys: Seq[String],
                                    inclusive: Boolean) extends Stmt
  /** `x = SESSIONIZE a BY key ON ts GAP micros;` — per-event 1-based
    * session labels, sessions split at gaps > `GAP` (appends
    * `session_idx`). */
  final case class SessionizeStmt(alias: String, in: String, key: String,
                                  ts: String, gapMicros: Long) extends Stmt
  /** `b = QUOTA_SAMPLE a BY grp TOP k KEY id[, …];` — at most k rows
    * per group in deterministic md5-hash order (map-side bounded
    * heaps). */
  final case class QuotaSampleStmt(alias: String, in: String,
                                   strata: String, k: Int,
                                   keyFields: Seq[String]) extends Stmt
  /** `b = MIXTURE a BY lang TARGET 'en' 0.5, 'de' 0.25, … KEY id[, …];`
    * — sample toward a target composition (strata not named are
    * dropped; rates derived in-plan, shared md5 bucket). */
  final case class MixtureStmt(alias: String, in: String, strata: String,
                               targets: Seq[(String, Double)],
                               keyFields: Seq[String]) extends Stmt
  /** `o = OVERLAP a, b BY k [USING sketch];` — cross-corpus distinct-key
    * overlap accounting (n_a, n_b, n_common, jaccard); `sketch` swaps
    * the exact distinct-join regime for mergeable HLL estimates. */
  final case class OverlapStmt(alias: String, inA: String, inB: String,
                               keyField: String,
                               method: String) extends Stmt
  /** `s = SCHEDULE f BY host ON url DELAY d [DEFAULT 1.0];` — per-host
    * politeness fetch slots at integer-ms crawl-delay offsets (appends
    * `slot`, `fetch_at_ms`). */
  final case class ScheduleStmt(alias: String, in: String, host: String,
                                url: String, delayField: String,
                                defaultDelay: Double) extends Stmt
  /** `b = SCORE a BY id, text [WITH weights] USING classifier(labels=y,
    * buckets=1024)` — margin + prediction per doc under a trained
    * linear model: WITH applies a previously-computed (bucket, w)
    * relation; without it, labels= names a column to train on
    * in-script (classifier = one-pass NB; perceptron = epochs= full-
    * batch perceptron). */
  final case class ScoreStmt(alias: String, in: String, idField: String,
                             textField: String, weights: Option[String],
                             method: String,
                             params: Map[String, String]) extends Stmt
  /** `b = PROFILE a ON c1, c2 [USING exact|sketch(rsd=…, accuracy=…)]`
    * — the per-column corpus audit as a relation (one row per column):
    * exact pays the multi-DISTINCT Expand, sketch is the one-pass
    * HLL++/approx-quantile regime. */
  final case class ProfileStmt(alias: String, in: String,
                               cols: Seq[String], method: String,
                               params: Map[String, String]) extends Stmt
  /** `b = HEAVY_HITTERS a BY col TOP 20 [USING exact|
    * sketch(capacity=4096)]` — top-k frequent values: exact is the
    * oracled group-count + TakeOrdered; sketch is the per-partition
    * Misra–Gries regime emitting [est_min, est_max] bounds. */
  final case class HeavyStmt(alias: String, in: String, field: String,
                             k: Int, method: String,
                             params: Map[String, String]) extends Stmt
  /** `b = CLUSTER a BY vec INTO 8 [USING kmeans(iters=…, seed=…,
    * sample=…)];` — spherical k-means assignment over an embedding
    * column (graft dialect; the topic-clustering step in front of
    * mixture balancing and cluster-scoped curation). */
  final case class ClusterStmt(alias: String, in: String, field: String,
                               k: Int, method: String,
                               params: Map[String, String]) extends Stmt
  /** `c = CONNECTED_COMPONENTS e BY id_a, id_b [MAXITER 10];` — min-label
    * components of a pair graph (graft dialect; the cluster resolution
    * under the near-dup operators, as a relation `(id, label)`). */
  final case class CcStmt(alias: String, in: String, aField: String,
                          bField: String, maxIter: Int) extends Stmt
  /** `r = PAGERANK e BY src, dst [ITER 10];` — integer fixed-point
    * PageRank over an edge relation (graft dialect; the link-graph
    * authority prior of web-corpus curation). */
  final case class PageRankStmt(alias: String, in: String, srcField: String,
                                dstField: String, iters: Int) extends Stmt
}
