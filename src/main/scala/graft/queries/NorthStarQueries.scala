package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession.{table, tableSpread}
import graft.dedup.Dedup
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.model.Document
import graft.operators.Sampling
import graft.similarity.Ann

/** LLM-training-data-pipeline operators over the documents / embeddings
  * fixtures: text analysis, the dedup family, similarity search, and the
  * multimodal (binary column) plumbing. These extend the reference's
  * surface (SURVEY.md §2 "north-star extensions").
  *
  * Oracles exist for everything expressible in DuckDB SQL (token counts,
  * language ID, quality buckets, exact dedup, exact n-gram Jaccard, exact
  * ANN); sketch-based ops (MinHash/SimHash/LSH buckets, winnowing) have no
  * SQL equivalent → rows-only checks, with determinism pinned by fixed
  * seeds and ScalaTest specs instead.
  */
object NorthStarQueries {

  /** doc_id < bound as the query set for ANN (small, broadcastable). */
  private val AnnQueries = 10
  private val AnnK = 5

  val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(

    // ---- text analysis ---------------------------------------------------
    "text_tokens" -> { (s, dir) =>
      tableSpread(s, dir, "documents")
        .select(col("doc_id"), tokenCount(col("text")).as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("""\w+|[^\w\s]"""), lit(0))).as("n_bpe_tokens"))
    },

    "text_langid" -> { (s, dir) =>
      tableSpread(s, dir, "documents")
        .select(col("doc_id"), langId(col("text")).as("pred_lang"))
    },

    "text_quality" -> { (s, dir) =>
      tableSpread(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("len"),
        tokenCount(col("text")).as("n_tokens"),
        punctCount(col("text")).as("n_punct"),
        qualityBucket(col("text")).as("bucket"))
    },

    "text_fingerprint" -> { (s, dir) =>
      // winnowing fingerprints; rows-only check (no xxhash64 in DuckDB),
      // determinism covered by the text spec. Two-phase: hashes, then
      // fingerprints, then stats — each array materialized once.
      tableSpread(s, dir, "documents")
        .withColumn("_hs", ngramHashes(col("text")))
        .withColumn("_fps", winnowFromHashes(col("_hs")))
        .select(col("doc_id"), size(col("_fps")).as("n_fps"),
          array_min(col("_fps")).as("min_fp"), array_max(col("_fps")).as("max_fp"))
    },

    // ---- deduplication ---------------------------------------------------
    "dedup_exact" -> { (s, dir) =>
      // fingerprint-keyed: the oracle groups by text; results agree up to
      // 128-bit hash collisions (none at any realistic corpus size)
      Dedup.exactFingerprint(tableSpread(s, dir, "documents"), on = Seq("text"), id = "doc_id")
        .select(col("keep_id"), col("n_dups"))
    },

    "dedup_minhash" -> { (s, dir) =>
      Dedup.minhash(
        tableSpread(s, dir, "documents").withColumn("_toks", TextFunctions.tokens(col("text"))),
        id = "doc_id", shingles = shinglesOf(col("_toks"), 3), threshold = 0.5)
    },

    "dedup_simhash" -> { (s, dir) =>
      Dedup.simhash(tableSpread(s, dir, "documents"), id = "doc_id",
        tokens = TextFunctions.tokens(col("text")), maxHamming = 3)
    },

    "dedup_ngram" -> { (s, dir) =>
      // hashed shingles: only shingle identity feeds the Jaccard counts,
      // so 8-byte join keys replace 5-word strings (same oracle result up
      // to 64-bit collisions within a doc's shingle set — negligible)
      Dedup.ngramJaccard(
        tableSpread(s, dir, "documents").withColumn("_toks", TextFunctions.tokens(col("text"))),
        id = "doc_id", shingles = shingleHashesOf(col("_toks"), 5), threshold = 0.5)
    },

    "dedup_embedding" -> { (s, dir) =>
      Dedup.embeddingCosine(tableSpread(s, dir, "embeddings"), id = "vec_id",
        vec = col("embedding"), threshold = 0.9, dim = 64)
    },

    /** End-to-end training-data pipeline: quality-filter documents, exact
      * dedup (keep lowest id), language-ID the survivors, aggregate token
      * statistics per language — the composed shape of a real corpus
      * cleaning job, fully oracle-checked.
      */
    "flagship_datapipe" -> { (s, dir) =>
      val docs = tableSpread(s, dir, "documents")
        .withColumn("bucket", qualityBucket(col("text")))
        .filter(col("bucket") === "ok")
      val keep = Dedup.exactFingerprint(docs, on = Seq("text"), id = "doc_id")
        .select(col("keep_id").as("doc_id"))
      docs.join(keep, "doc_id")
        .select(col("doc_id"), langId(col("text")).as("lang2"), tokenCount(col("text")).as("nt"))
        .groupBy(col("lang2"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt").cast("long")).as("total_tokens"),
          max(col("nt")).as("max_tokens"))
    },

    // ---- similarity search ----------------------------------------------
    "ann_bruteforce" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      Ann.bruteForce(
        queries = emb.filter(col("vec_id") < AnnQueries),
        corpus = emb,
        qId = "vec_id", qVec = "embedding", cId = "vec_id", cVec = "embedding",
        k = AnnK)
    },

    "ann_lsh" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      Ann.lshTopK(
        queries = emb.filter(col("vec_id") < AnnQueries),
        corpus = emb,
        qId = "vec_id", qVec = "embedding", cId = "vec_id", cVec = "embedding",
        // fixture embeddings are near-uniform random (nearest cosines ~0.4),
        // the hard case for hyperplane LSH: favor recall (4 planes x 8
        // tables ~ 75% for a 0.4-cosine pair) over bucket tightness
        k = AnnK, nPlanes = 4, nTables = 8, dim = 64)
    },

    "ann_ivf" -> { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      graft.similarity.Ivf.topK(
        queries = emb.filter(col("vec_id") < AnnQueries),
        corpus = emb,
        qId = "vec_id", qVec = "embedding", cId = "vec_id", cVec = "embedding",
        k = AnnK, nCells = 16, nProbe = 6)
    },

    // ---- multimodal binary-column plumbing --------------------------------
    "multimodal_features" -> { (s, dir) =>
      import s.implicits._
      // Real pipelines carry image/audio as opaque binary + typed metadata;
      // decode libs are not in this container, so the decode step is a
      // deterministic STUB (byte histogram + checksum) while the Spark-side
      // plumbing — binary column, metadata struct, per-partition batched
      // feature extraction — is real.
      val blobs = tableSpread(s, dir, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("blob"),
          struct(length(col("text")).as("n_chars"), lit("text/plain").as("mime")).as("meta"))
      blobs.as[(Long, Array[Byte], (Long, String))]
        .mapPartitions { it =>
          it.map { case (id, bytes, (nChars, mime)) =>
            // STUB decode: byte checksum + 4-bucket histogram stand in for
            // pixel/sample features
            var sum = 0L
            val hist = new Array[Long](4)
            var i = 0
            while (i < bytes.length) {
              sum += bytes(i) & 0xff
              hist((bytes(i) & 0xff) >> 6) += 1
              i += 1
            }
            (id, bytes.length.toLong, sum, hist(0), hist(1), hist(2), hist(3), mime)
          }
        }
        .toDF("doc_id", "n_bytes", "checksum", "h0", "h1", "h2", "h3", "mime")
    },

    /** Near-dup pairs collapsed to duplicate clusters (connected
      * components over the n-gram-Jaccard similarity graph): one
      * (doc, component) row per clustered doc, component = min doc_id.
      * A~B and B~C land in one cluster even when A~C was never scored.
      */
    "dedup_clusters" -> { (s, dir) =>
      val pairs = Dedup.ngramJaccard(
        tableSpread(s, dir, "documents").withColumn("_toks", TextFunctions.tokens(col("text"))),
        id = "doc_id", shingles = shingleHashesOf(col("_toks"), 5), threshold = 0.5)
        .select(col("a"), col("b"))
      graft.dedup.Cluster.connectedComponents(pairs, "a", "b")
        .select(col("id").as("doc_id"), col("comp").as("component"))
    },

    /** BM25 top-5 documents for three query terms. The float score stays
      * internal (engine ln/division ulps differ); the output contract is
      * the ranking with a deterministic id tie-break, which the DuckDB
      * oracle reproduces from the same formula.
      */
    "text_bm25" -> { (s, dir) =>
      graft.functions.Bm25.topDocs(table(s, dir, "documents"), id = "doc_id",
        text = col("text"), terms = Seq("spark", "join", "data"), k = 5)
    },

    /** Int8-quantized embeddings: 4x smaller storage for the ANN index;
      * per-vector reconstruction quality reported (rows-only — float
      * rounding at .5 code boundaries is engine-specific; the spec pins
      * the error bound instead).
      */
    "embedding_quantize" -> { (s, dir) =>
      import graft.functions.VectorFunctions
      val emb = VectorFunctions.quantizeInt8Col(
        table(s, dir, "embeddings"), col("embedding"), "q")
        .withColumn("deq", VectorFunctions.dequantizeInt8(col("q")))
      emb.select(col("vec_id"),
        VectorFunctions.cosineFused(col("embedding"), col("deq")).as("fidelity"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("fidelity") >= 0.999, 1L).otherwise(0L)).as("n_high_fidelity"))
    },

    // ---- corpus statistics + sampling -------------------------------------

    /** Vocabulary / inverted-index statistics: per term, the document
      * frequency, total and max term frequency — the corpus-wide pass
      * behind tokenizer training and tf-idf. Two partial-aggregated
      * shuffles ((doc,term) then term); the exchange carries counts, never
      * text.
      */
    "vocab_index" -> { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"),
          max(col("tf")).as("max_tf"))
    },

    /** Deterministic 80/10/10 split via explicit multiplicative hashing —
      * stable across engines and re-runs (the oracle computes the same
      * arithmetic in DuckDB and agrees exactly).
      */
    "train_test_split" -> { (s, dir) =>
      Sampling.deterministicSplit(table(s, dir, "documents"), col("doc_id"),
        weights = Seq("train" -> 80, "valid" -> 10, "test" -> 10))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"))
    },

    /** At most 20 documents per source, selected by deterministic hash
      * order (uniform, reproducible, exact DuckDB oracle).
      */
    "sample_per_group" -> { (s, dir) =>
      Sampling.capPerGroup(table(s, dir, "documents"), keys = Seq("source"),
        k = 20, id = col("doc_id"))
        .select(col("source"), col("doc_id"))
    },

    /** Stratified Bernoulli sample per language (seeded; rows-only check —
      * RNG streams differ by engine; SamplingSpec asserts the per-stratum
      * rates instead).
      */
    "stratified_sample" -> { (s, dir) =>
      Sampling.stratifiedSample(table(s, dir, "documents"), strata = "lang",
        fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1), seed = 7L)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    }
  )

  private val langCase: String = {
    val conds = TextFunctions.stopwords.zipWithIndex.dropRight(1).map { case ((lang, _), i) =>
      val later = TextFunctions.stopwords.drop(i + 1).map(_._1)
      val cond = later.map(l2 => s"s_$lang >= s_$l2").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE ${conds.mkString(" ")} ELSE '${TextFunctions.stopwords.last._1}' END"
  }

  private val langScores: String =
    TextFunctions.stopwords.map { case (lang, words) =>
      val list = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter(toks_lower, t -> list_contains($list, t))) AS s_$lang"
    }.mkString(",\n       ")

  val oracles: Seq[(String, String)] = Seq(
    "text_tokens" ->
      """SELECT doc_id,
        |       len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
        |       len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
        |FROM documents""".stripMargin,
    "text_langid" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         list_filter(string_split(lower(text), ' '), x -> x != '') AS toks_lower
         |  FROM documents
         |), s AS (
         |  SELECT doc_id,
         |       $langScores
         |  FROM t
         |)
         |SELECT doc_id, $langCase AS pred_lang FROM s""".stripMargin,
    "text_quality" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |         length(text) AS len,
         |         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
         |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |         len(list_filter(string_split(lower(text), ' '),
         |             t -> list_contains(${TextFunctions.stopwords.flatMap(_._2).distinct.map(w => s"'$w'").mkString("[", ", ", "]")}, t))) AS n_stop
         |  FROM documents
         |)
         |SELECT doc_id, len, n_tokens, n_punct,
         |       CASE WHEN len < 20 THEN 'too_short'
         |            WHEN n_tokens < 5 THEN 'too_few_tokens'
         |            WHEN n_punct * 20 > len THEN 'too_much_punct'
         |            WHEN n_stop * 50 < n_tokens THEN 'low_stopword'
         |            ELSE 'ok' END AS bucket
         |FROM t""".stripMargin,
    "dedup_exact" ->
      "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_dups FROM documents GROUP BY text",
    "flagship_datapipe" -> {
      val stop = graft.functions.TextFunctions.stopwords.flatMap(_._2).distinct
        .map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH q AS (
         |  SELECT doc_id, text,
         |         length(text) AS len,
         |         len(list_filter(string_split(text, ' '), x -> x != '')) AS n_tokens,
         |         length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
         |         len(list_filter(string_split(lower(text), ' '),
         |             t -> list_contains($stop, t))) AS n_stop
         |  FROM documents
         |), ok AS (
         |  SELECT doc_id, text, n_tokens FROM q
         |  WHERE NOT (len < 20) AND NOT (n_tokens < 5)
         |    AND NOT (n_punct * 20 > len) AND NOT (n_stop * 50 < n_tokens)
         |), keep AS (
         |  SELECT MIN(doc_id) AS doc_id FROM ok GROUP BY text
         |), survivors AS (
         |  SELECT ok.doc_id, ok.text, ok.n_tokens FROM ok JOIN keep USING (doc_id)
         |), t AS (
         |  SELECT doc_id, n_tokens,
         |         list_filter(string_split(lower(text), ' '), x -> x != '') AS toks_lower
         |  FROM survivors
         |), sc AS (
         |  SELECT doc_id, n_tokens,
         |       $langScores
         |  FROM t
         |)
         |SELECT $langCase AS lang2, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |       MAX(n_tokens) AS max_tokens
         |FROM sc GROUP BY 1""".stripMargin
    },
    "dedup_ngram" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(ts) - 3),
        |                       i -> array_to_string(ts[i:i+4], ' '))) AS shs
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
        |        FROM documents)
        |), ex0 AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM sh
        |), keep AS (
        |  -- mirror the engine's df-cut: shingles in > 1000 docs are dropped
        |  -- and per-doc counts are taken over SURVIVING shingles
        |  SELECT sh FROM ex0 GROUP BY sh HAVING COUNT(*) <= 1000
        |), ex AS (
        |  SELECT e.doc_id, e.sh FROM ex0 e JOIN keep USING (sh)
        |), n AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ex GROUP BY 1
        |), p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |)
        |SELECT p.a, p.b, p.common, na.n AS na, nb.n AS nb,
        |       CAST(p.common AS DOUBLE) / (na.n + nb.n - p.common) AS jaccard
        |FROM p JOIN n na ON p.a = na.doc_id JOIN n nb ON p.b = nb.doc_id
        |WHERE CAST(p.common AS DOUBLE) / (na.n + nb.n - p.common) >= 0.5""".stripMargin,
    "ann_bruteforce" ->
      s"""SELECT query_id, neighbor_id, rank FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
         |                      c.vec_id ASC) AS rank
         |  FROM embeddings q, embeddings c
         |  WHERE q.vec_id < $AnnQueries AND c.vec_id <> q.vec_id)
         |WHERE rank <= $AnnK""".stripMargin,
    "text_bm25" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), t AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM toks WHERE term <> '' GROUP BY 1, 2
        |), dl AS (
        |  SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl
        |  FROM toks WHERE term <> '' GROUP BY 1
        |), stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl
        |), dfr AS (
        |  SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM t GROUP BY 1
        |), scored AS (
        |  SELECT t.doc_id, t.term,
        |         ln((stats.n_docs - dfr.df + 0.5) / (dfr.df + 0.5) + 1) *
        |         (t.tf * (1.2 + 1) / (t.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS score
        |  FROM t
        |  JOIN dl USING (doc_id)
        |  CROSS JOIN stats
        |  JOIN dfr USING (term)
        |  WHERE t.term IN ('spark', 'join', 'data')
        |)
        |SELECT term, rank, doc_id FROM (
        |  SELECT term, doc_id,
        |         row_number() OVER (PARTITION BY term
        |             ORDER BY score DESC, doc_id ASC) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,
    "dedup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(ts) - 3),
        |                       i -> array_to_string(ts[i:i+4], ' '))) AS shs
        |  FROM (SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
        |        FROM documents)
        |), ex0 AS (
        |  SELECT doc_id, unnest(shs) AS sh FROM sh
        |), keep AS (
        |  SELECT sh FROM ex0 GROUP BY sh HAVING COUNT(*) <= 1000
        |), ex AS (
        |  SELECT e.doc_id, e.sh FROM ex0 e JOIN keep USING (sh)
        |), n AS (
        |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM ex GROUP BY 1
        |), p AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS common
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT p.a, p.b
        |  FROM p JOIN n na ON p.a = na.doc_id JOIN n nb ON p.b = nb.doc_id
        |  WHERE CAST(p.common AS DOUBLE) / (na.n + nb.n - p.common) >= 0.5
        |), edges AS (
        |  SELECT a AS src, b AS dst FROM pairs
        |  UNION
        |  SELECT b, a FROM pairs
        |), reach AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
        |)
        |SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
        |FROM reach GROUP BY src""".stripMargin,
    "vocab_index" ->
      """WITH tf AS (
        |  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  WHERE term <> ''
        |  GROUP BY 1, 2
        |)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
        |       CAST(SUM(tf) AS BIGINT) AS total_tf,
        |       CAST(MAX(tf) AS BIGINT) AS max_tf
        |FROM tf GROUP BY 1""".stripMargin,
    "train_test_split" ->
      """WITH b AS (
        |  SELECT ((((((doc_id & 4294967295) >> 16) * 2654435761) % 4294967296) * 65536
        |           + (doc_id & 65535) * 2654435761) % 4294967296) % 100 AS bucket,
        |         n_chars
        |  FROM documents
        |)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'valid'
        |            ELSE 'test' END AS split,
        |       CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |FROM b GROUP BY 1""".stripMargin,
    "sample_per_group" ->
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |             ORDER BY ((((((doc_id & 4294967295) >> 16) * 2654435761) % 4294967296) * 65536
        |                       + (doc_id & 65535) * 2654435761) % 4294967296) % 1073741824 ASC,
        |                      doc_id ASC) AS rn
        |  FROM documents)
        |WHERE rn <= 20""".stripMargin
  )
}
