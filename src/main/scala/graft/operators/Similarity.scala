package graft.operators

import graft.QueryDef.q
import graft.functions.VectorFns._
import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Embedding similarity search over `embeddings` (ARRAY<FLOAT>, dim 64,
  * unit-normalized → dot == cosine).
  *
  * Three tiers, in increasing 100 TB readiness:
  *  - q44: exact threshold self-join (the correctness baseline; candidate
  *    space bounded by the a<b triangle, only viable at moderate n);
  *  - q45: brute-force top-k for a bounded query set — scales linearly in
  *    corpus size because the query side is broadcast;
  *  - q46: IVF (inverted-file) ANN — assign vectors to coarse centroids
  *    map-side, probe the top few centroids per query, search only those
  *    clusters. This is the scale path: the exact search space per query
  *    drops from n to n/|centroids| * probes.
  */
object Similarity {

  private def T(s: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftExpressions.register(s)
    Tables.load(s, dir, name)
  }

  private val duckDotSql: (String, String) => String = duckDot

  val defs: Seq[QueryDef] = Seq(

    q("q69_embedding_lsh",
      s"""WITH h AS (SELECT vec_id - 100 AS hid, embedding he FROM embeddings
         |           WHERE vec_id BETWEEN 100 AND 115),
         |sig AS (SELECT v.vec_id, CAST(h.hid // 4 AS BIGINT) AS band,
         |    SUM(CASE WHEN ${duckDotSql("v.embedding", "h.he")} >= 0
         |        THEN (1::BIGINT << CAST(h.hid % 4 AS INT)) ELSE 0 END) AS bucket
         |  FROM embeddings v, h GROUP BY v.vec_id, h.hid // 4),
         |cand AS (SELECT DISTINCT a.vec_id ia, b.vec_id ib FROM sig a
         |         JOIN sig b ON a.band = b.band AND a.bucket = b.bucket
         |                   AND a.vec_id < b.vec_id),
         |scored AS (SELECT ia, ib, ${duckDotSql("va.embedding", "vb.embedding")} AS sim
         |           FROM cand JOIN embeddings va ON va.vec_id = cand.ia
         |                     JOIN embeddings vb ON vb.vec_id = cand.ib)
         |SELECT ia AS id_a, ib AS id_b, sim FROM scored
         |WHERE sim >= 0.4 ORDER BY id_a, id_b""") { (s, dir) =>
      import s.implicits._
      // Random-hyperplane LSH, the scale path for embedding near-dup:
      // 16 sign bits from fixed hyperplanes (deterministic: vectors
      // 100..115 act as planes), banded 4x4; only bucket-mates are scored
      // exactly. Candidate generation is an equi-join on (band, bucket) —
      // per-band recall p^4 with p = 1 - theta/pi, union over 4 bands;
      // tune planes/bands to the target threshold. Compare q44: exact but
      // O(n^2); this is the one you run at 100 TB.
      val e = T(s, dir, "embeddings")
      val planes = broadcast(e.filter($"vec_id".between(100, 115))
        .select(($"vec_id" - 100).as("hid"), $"embedding".as("he")))
      val sig = e.select($"vec_id", $"embedding")
        .crossJoin(planes)
        .withColumn("bit",
          when(expr("graft_dot(embedding, he)") >= 0,
            expr("shiftleft(CAST(1 AS BIGINT), CAST(hid % 4 AS INT))"))
            .otherwise(lit(0L)))
        .groupBy($"vec_id", ($"hid" / 4).cast("long").as("band"))
        .agg(sum($"bit").as("bucket"))
      val cand = sig.as("a").join(sig.as("b"),
          $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
            $"a.vec_id" < $"b.vec_id")
        .select($"a.vec_id".as("ia"), $"b.vec_id".as("ib"))
        .distinct()
      cand
        .join(e.select($"vec_id".as("ia"), $"embedding".as("va")), "ia")
        .join(e.select($"vec_id".as("ib"), $"embedding".as("vb")), "ib")
        .withColumn("sim", expr("graft_dot(va, vb)"))
        .filter($"sim" >= 0.4)
        .select($"ia".as("id_a"), $"ib".as("id_b"), $"sim")
        .orderBy($"id_a", $"id_b")
    },

    q("q44_embedding_neardup",
      s"""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${duckDot("a.embedding", "b.embedding")} AS sim
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckDot("a.embedding", "b.embedding")} >= 0.45
         |ORDER BY id_a, id_b""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "embeddings")
      val a = e.select($"vec_id".as("id_a"), $"embedding".as("ea"))
      val b = e.select($"vec_id".as("id_b"), $"embedding".as("eb"))
      a.join(b, $"id_a" < $"id_b")
        .withColumn("sim", expr("graft_dot(ea, eb)"))
        .filter($"sim" >= 0.45)
        .select($"id_a", $"id_b", $"sim")
        .orderBy($"id_a", $"id_b")
    },

    q("q45_sim_topk_brute",
      s"""SELECT q_id, cand_id, CAST(rn AS BIGINT) AS rk, sim FROM (
         |  SELECT q.vec_id q_id, c.vec_id cand_id,
         |    ${duckDot("q.embedding", "c.embedding")} AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${duckDot("q.embedding", "c.embedding")} DESC, c.vec_id) rn
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 20
         |) WHERE rn <= 5 ORDER BY q_id, rk""") { (s, dir) =>
      import s.implicits._
      // Bounded query set × full corpus: broadcast the queries so the scan
      // of the big side is shuffle-free; per-query top-k via window.
      val e = T(s, dir, "embeddings")
      val qs = broadcast(e.filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"embedding".as("qe")))
      val cands = e.select($"vec_id".as("cand_id"), $"embedding".as("ce"))
      val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"cand_id")
      qs.join(cands, $"q_id" =!= $"cand_id")
        .withColumn("sim", expr("graft_dot(qe, ce)"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 5)
        .select($"q_id", $"cand_id", $"rk", $"sim")
        .orderBy($"q_id", $"rk")
    },

    q("q124_hard_negatives",
      s"""SELECT q_id, cand_id, CAST(rn AS BIGINT) AS rk, sim FROM (
         |  SELECT q.vec_id q_id, c.vec_id cand_id,
         |    ${duckDotSql("q.embedding", "c.embedding")} AS sim,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${duckDotSql("q.embedding", "c.embedding")} DESC, c.vec_id) rn
         |  FROM embeddings q JOIN embeddings c ON q.label <> c.label
         |  WHERE q.vec_id < 20
         |) WHERE rn <= 5 ORDER BY q_id, rk""") { (s, dir) =>
      import s.implicits._
      // Hard-negative mining for contrastive training: for each anchor, the
      // most similar vectors with a DIFFERENT label — the negatives that
      // actually teach the model. Same plan shape as q45 (anchors broadcast,
      // corpus scanned shuffle-free, per-anchor top-k window); the label
      // mismatch rides the broadcast join condition so candidates are
      // filtered before scoring.
      val e = T(s, dir, "embeddings")
      val qs = broadcast(e.filter($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"label".as("q_label"), $"embedding".as("qe")))
      val cands = e.select($"vec_id".as("cand_id"), $"label".as("c_label"),
        $"embedding".as("ce"))
      val w = Window.partitionBy($"q_id").orderBy($"sim".desc, $"cand_id")
      qs.join(cands, $"q_label" =!= $"c_label")
        .withColumn("sim", expr("graft_dot(qe, ce)"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= 5)
        .select($"q_id", $"cand_id", $"rk", $"sim")
        .orderBy($"q_id", $"rk")
    },

    q("q46_sim_ann_ivf",
      s"""WITH c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id % 25 = 0),
         |v AS (SELECT vec_id, embedding FROM embeddings),
         |ad AS (SELECT v.vec_id, c.cid, ${duckDot("v.embedding", "c.ce")} AS d FROM v, c),
         |assign AS (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) rn
         |  FROM ad) WHERE rn = 1),
         |probes AS (SELECT vec_id q_id, cid FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) rn
         |  FROM ad WHERE vec_id < 10) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id cand_id FROM probes p
         |         JOIN assign a ON a.cid = p.cid WHERE a.vec_id <> p.q_id),
         |scored AS (SELECT q_id, cand_id, ${duckDot("qv.embedding", "cv.embedding")} AS sim
         |  FROM cand JOIN v qv ON qv.vec_id = cand.q_id
         |            JOIN v cv ON cv.vec_id = cand.cand_id),
         |ranked AS (SELECT q_id, cand_id, sim,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sim DESC, cand_id) rn
         |  FROM scored)
         |SELECT q_id, cand_id, CAST(rn AS BIGINT) AS rk, sim FROM ranked
         |WHERE rn <= 3 ORDER BY q_id, rk""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "embeddings")
      // deterministic coarse centroids (every 25th vector); at scale these
      // would come from k-means — the plumbing below is identical.
      val cents = broadcast(e.filter($"vec_id" % 25 === 0)
        .select($"vec_id".as("cid"), $"embedding".as("ce")))
      val vecs = e.select($"vec_id", $"embedding")
      val ad = vecs.crossJoin(cents)
        .withColumn("d", expr("graft_dot(embedding, ce)"))
        .select($"vec_id", $"cid", $"d")
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d".desc, $"cid")
      val assign = ad.withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id", $"cid")
      val probes = ad.filter($"vec_id" < 10)
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" <= 2)
        .select($"vec_id".as("q_id"), $"cid")
      val cand = probes.join(assign.withColumnRenamed("vec_id", "cand_id"), "cid")
        .filter($"cand_id" =!= $"q_id")
        .select($"q_id", $"cand_id")
      val scored = cand
        .join(vecs.select($"vec_id".as("q_id"), $"embedding".as("qe")), "q_id")
        .join(vecs.select($"vec_id".as("cand_id"), $"embedding".as("cve")), "cand_id")
        .withColumn("sim", expr("graft_dot(qe, cve)"))
      val wRank = Window.partitionBy($"q_id").orderBy($"sim".desc, $"cand_id")
      scored.withColumn("rk", row_number().over(wRank).cast("long"))
        .filter($"rk" <= 3)
        .select($"q_id", $"cand_id", $"rk", $"sim")
        .orderBy($"q_id", $"rk")
    },

    q("q95_ann_recall",
      // ANN EVALUATION as a first-class operator: recall@10 of the IVF
      // index (2 probes) against the exact brute-force ground truth, per
      // query. Both rankings are deterministic (q45/q46 prove each engine
      // computes identical sets), so the recall fraction itself is
      // oracle-checkable — the eval loop a production ANN deployment runs
      // to tune nlist/nprobe before committing to an index layout.
      s"""WITH v AS (SELECT vec_id, embedding FROM embeddings),
         |brute AS (SELECT q_id, cand_id FROM (
         |  SELECT q.vec_id q_id, c.vec_id cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.vec_id
         |      ORDER BY ${duckDotSql("q.embedding", "c.embedding")} DESC, c.vec_id) rn
         |  FROM v q JOIN v c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < 10) WHERE rn <= 10),
         |c AS (SELECT vec_id cid, embedding ce FROM embeddings WHERE vec_id % 25 = 0),
         |ad AS (SELECT v.vec_id, c.cid, ${duckDotSql("v.embedding", "c.ce")} AS d FROM v, c),
         |assign AS (SELECT vec_id, cid FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) rn
         |  FROM ad) WHERE rn = 1),
         |probes AS (SELECT vec_id q_id, cid FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) rn
         |  FROM ad WHERE vec_id < 10) WHERE rn <= 2),
         |cand AS (SELECT p.q_id, a.vec_id cand_id FROM probes p
         |         JOIN assign a ON a.cid = p.cid WHERE a.vec_id <> p.q_id),
         |ivf AS (SELECT q_id, cand_id FROM (
         |  SELECT cand.q_id, cand.cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY cand.q_id
         |      ORDER BY ${duckDotSql("qv.embedding", "cv.embedding")} DESC, cand.cand_id) rn
         |  FROM cand JOIN v qv ON qv.vec_id = cand.q_id
         |            JOIN v cv ON cv.vec_id = cand.cand_id) WHERE rn <= 10),
         |hits AS (SELECT b.q_id, COUNT(*) n_hit FROM brute b
         |         JOIN ivf i ON i.q_id = b.q_id AND i.cand_id = b.cand_id GROUP BY 1)
         |SELECT b.q_id, CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / 10.0 AS recall_at_10
         |FROM (SELECT DISTINCT q_id FROM brute) b LEFT JOIN hits h ON h.q_id = b.q_id
         |ORDER BY b.q_id""") { (s, dir) =>
      import s.implicits._
      val e = T(s, dir, "embeddings")
      val vecs = e.select($"vec_id", $"embedding")
      // ground truth: brute-force top-10 per query (queries broadcast)
      val qs = broadcast(e.filter($"vec_id" < 10)
        .select($"vec_id".as("q_id"), $"embedding".as("qe")))
      val wQ = Window.partitionBy($"q_id").orderBy($"sim".desc, $"cand_id")
      val brute = qs
        .join(vecs.select($"vec_id".as("cand_id"), $"embedding".as("ce")),
          $"q_id" =!= $"cand_id")
        .withColumn("sim", expr("graft_dot(qe, ce)"))
        .withColumn("rn", row_number().over(wQ))
        .filter($"rn" <= 10)
        .select($"q_id", $"cand_id")
      // IVF top-10: same centroids/assignment/probes as q46
      val cents = broadcast(e.filter($"vec_id" % 25 === 0)
        .select($"vec_id".as("cid"), $"embedding".as("ce")))
      val ad = vecs.crossJoin(cents)
        .withColumn("d", expr("graft_dot(embedding, ce)"))
        .select($"vec_id", $"cid", $"d")
      val wAssign = Window.partitionBy($"vec_id").orderBy($"d".desc, $"cid")
      val assign = ad.withColumn("rn", row_number().over(wAssign))
        .filter($"rn" === 1).select($"vec_id", $"cid")
      val probes = ad.filter($"vec_id" < 10)
        .withColumn("rn", row_number().over(wAssign))
        .filter($"rn" <= 2)
        .select($"vec_id".as("q_id"), $"cid")
      val ivf = probes
        .join(assign.withColumnRenamed("vec_id", "cand_id"), "cid")
        .filter($"cand_id" =!= $"q_id")
        .join(vecs.select($"vec_id".as("q_id"), $"embedding".as("qe")), "q_id")
        .join(vecs.select($"vec_id".as("cand_id"), $"embedding".as("cve")), "cand_id")
        .withColumn("sim", expr("graft_dot(qe, cve)"))
        .withColumn("rn", row_number().over(wQ.orderBy($"sim".desc, $"cand_id")))
        .filter($"rn" <= 10)
        .select($"q_id", $"cand_id")
      val hits = brute.as("b")
        .join(ivf.as("i"), $"b.q_id" === $"i.q_id" && $"b.cand_id" === $"i.cand_id")
        .groupBy($"b.q_id".as("q_id"))
        .agg(count(lit(1)).as("n_hit"))
      brute.select($"q_id").distinct()
        .join(hits, Seq("q_id"), "left")
        .select($"q_id",
          (coalesce($"n_hit", lit(0L)).cast("double") / 10.0).as("recall_at_10"))
        .orderBy($"q_id")
    },

    q("q97_embedding_quantize",
      // Symmetric int8 quantization (max-abs scaling) — the standard 4x
      // shrink applied to embedding stores before ANN indexing at scale.
      // floor(x + 0.5) instead of round(): both engines floor identically,
      // while round() half-away vs half-even diverges. The digest pins the
      // whole quantized vector, so any drift in the arithmetic fails the
      // hash check.
      """WITH s AS (SELECT vec_id, embedding,
        |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS maxabs
        |  FROM embeddings),
        |qz AS (SELECT vec_id, maxabs,
        |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS BIGINT)) AS qv
        |  FROM s)
        |SELECT vec_id,
        |  md5(array_to_string(qv, ',')) AS q_digest,
        |  CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max,
        |  CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min
        |FROM qz ORDER BY vec_id""") { (s, dir) =>
      import s.implicits._
      T(s, dir, "embeddings")
        .withColumn("maxabs",
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
        .withColumn("qv",
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / maxabs + 0.5) AS BIGINT))"))
        .select($"vec_id",
          md5(concat_ws(",", expr("transform(qv, x -> CAST(x AS STRING))"))
            .cast("binary")).as("q_digest"),
          expr("array_max(qv)").cast("long").as("q_max"),
          expr("array_min(qv)").cast("long").as("q_min"))
        .orderBy($"vec_id")
    },
  )
}
