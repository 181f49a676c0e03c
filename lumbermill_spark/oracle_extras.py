"""DuckDB oracle SQL for the training-data extras (documents/embeddings are
the driver's pre-registered views). Thresholds/constants come from the Spark
modules so both sides share one definition."""

from __future__ import annotations

from .extras import dedup as D
from .extras import similarity as SIM
from .extras import textstats as TS

AUG_DOCS = f"""
docs AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {D.EXACT_ID_OFFSET}, text, lang, n_chars
  FROM documents WHERE doc_id % {D.EXACT_COPY_MOD} = 0
  UNION ALL
  SELECT doc_id + {D.NEAR_ID_OFFSET}, text || '{D.NEAR_TAIL}', lang, n_chars + {len(D.NEAR_TAIL)}
  FROM documents WHERE doc_id % {D.NEAR_COPY_MOD} = 0
)
"""

FINGERPRINT = "md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"


def dedup_exact() -> str:
    return f"""
WITH {AUG_DOCS},
fp AS (SELECT doc_id, {FINGERPRINT} AS fingerprint FROM docs)
SELECT doc_id, fingerprint,
  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
  count(*) OVER (PARTITION BY fingerprint) AS group_size,
  (doc_id = min(doc_id) OVER (PARTITION BY fingerprint)) AS is_canonical
FROM fp
"""


def _minhash_cte() -> str:
    """Shared CTE chain: docs → shingles → shingle hashes → 64-perm minhash
    signatures → band keys. Replays extras/dedup.py's md5 + universal-hash
    family verbatim.

    The per-perm min is computed RELATIONALLY (unnest × perms-table join +
    group-by) instead of nested list lambdas: indexing a 64-element literal
    list inside a DuckDB lambda re-constructs the list per evaluation —
    measured 207 s at sf0.01 vs ~2 s for the join form."""
    k, rpb = D.SHINGLE_K, D.MINHASH_PERMS // D.MINHASH_BANDS
    perm_rows = ",".join(
        f"({j},{a},{b})" for j, (a, b) in enumerate(zip(D.PERM_A, D.PERM_B), start=1)
    )
    return f"""
sh AS MATERIALIZED (
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(length(text)-{k - 1}, 1)),
    i -> substring(text, i, {k}))) AS shingles
  FROM docs),
xr AS (
  SELECT doc_id, ('0x'||substring(md5(x.s),1,8))::BIGINT % {D.MINHASH_P} AS x
  FROM sh, unnest(shingles) AS x(s)),
perms(j, a, b) AS (SELECT * FROM (VALUES {perm_rows})),
sgr AS (
  SELECT doc_id, j, min((a * x + b) % {D.MINHASH_P}) AS mh
  FROM xr CROSS JOIN perms GROUP BY doc_id, j),
sg AS MATERIALIZED (
  SELECT s.doc_id, s.shingles, g.sig FROM sh s JOIN (
    SELECT doc_id, list(mh ORDER BY j) AS sig FROM sgr GROUP BY doc_id) g
  ON g.doc_id = s.doc_id),
bd AS MATERIALIZED (
  SELECT doc_id, b AS band_idx,
    md5(array_to_string(sig[b*{rpb}+1 : b*{rpb}+{rpb}], ',')) AS band_key
  FROM sg CROSS JOIN (SELECT unnest(generate_series(0,{D.MINHASH_BANDS - 1})) AS b) bands)
"""


def _minhash_pairs_cte() -> str:
    """band candidates → signature-estimate pre-filter → exact-Jaccard
    verified pairs (`prs`). Requires _minhash_cte() upstream."""
    return f"""
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bd a JOIN bd b USING (band_idx, band_key)
  WHERE a.doc_id < b.doc_id),
est AS (  -- signature-estimate pre-filter, mirrors the Spark stage exactly
  SELECT doc_a, doc_b, x.shingles AS sh_a, y.shingles AS sh_b
  FROM cand JOIN sg x ON x.doc_id = cand.doc_a JOIN sg y ON y.doc_id = cand.doc_b
  WHERE len(list_filter(generate_series(1,{D.MINHASH_PERMS}), i -> x.sig[i] = y.sig[i]))
        / {D.MINHASH_PERMS}.0 >= {D.MINHASH_ESTIMATE_CUTOFF}),
prs AS (
  SELECT doc_a, doc_b, sim FROM (
    SELECT doc_a, doc_b,
      round(len(list_intersect(sh_a, sh_b))::DOUBLE
            / len(list_distinct(list_concat(sh_a, sh_b))), 6) AS sim
    FROM est)
  WHERE sim >= {D.MINHASH_VERIFY_THRESHOLD})
"""


def dedup_clusters() -> str:
    """Connected components over the verified near-dup pair graph via a
    recursive closure (cluster = min reachable doc_id) — iteration-free, so
    it pins Spark's label-propagation fixpoint exactly. Dup components are
    tiny (2-3 docs), so the closure never blows up."""
    return f"""
WITH RECURSIVE {AUG_DOCS},
{_minhash_cte()},
{_minhash_pairs_cte()},
edges AS MATERIALIZED (  -- without MATERIALIZED the recursion re-evaluates
  -- the whole minhash chain on every step and never finishes
  SELECT doc_a AS s, doc_b AS t FROM prs
  UNION
  SELECT doc_b AS s, doc_a AS t FROM prs),
nodes AS MATERIALIZED (SELECT doc_id FROM docs),
reach(s, t) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
)
SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s
"""


def corpus_canonical() -> str:
    """Keep/drop plan replay (extras.dedup.canonical_selection): the CC
    closure from dedup_clusters + the text_quality score over the SAME
    augmented corpus, then one-survivor-per-cluster by (quality DESC,
    doc_id ASC)."""
    length = "greatest(length(text), 1)::DOUBLE"
    ntok = (
        "greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1)::DOUBLE"
    )
    alpha = f"len(regexp_extract_all(text, '{TS.ALPHA_PAT}')) / {length}"
    punct = f"len(regexp_extract_all(text, '{TS.PUNCT_PAT}')) / {length}"
    stop = f"least(len(regexp_extract_all(lower(text), '{TS.stopword_pat('en')}'))::DOUBLE / {ntok}, 1.0)"
    score = (
        f"0.25 * ({alpha}) + 0.25 * (1.0 - least(({punct}) * 4.0, 1.0))"
        f" + 0.25 * ({stop}) + 0.25 * least({ntok} / 100.0, 1.0)"
    )
    return f"""
WITH RECURSIVE {AUG_DOCS},
{_minhash_cte()},
{_minhash_pairs_cte()},
edges AS MATERIALIZED (
  SELECT doc_a AS s, doc_b AS t FROM prs
  UNION
  SELECT doc_b AS s, doc_a AS t FROM prs),
nodes AS MATERIALIZED (SELECT doc_id FROM docs),
reach(s, t) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
),
clusters AS (SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s),
q AS (SELECT doc_id, round({score}, 6) AS quality_score FROM docs),
j AS (SELECT c.doc_id, c.cluster_id, q.quality_score
      FROM clusters c JOIN q USING (doc_id)),
r AS (
  SELECT *,
    row_number() OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id ASC) AS rk,
    first_value(doc_id) OVER (PARTITION BY cluster_id ORDER BY quality_score DESC, doc_id ASC) AS kept_doc_id
  FROM j)
SELECT doc_id, cluster_id, quality_score, rk = 1 AS keep, kept_doc_id FROM r
"""


def dedup_ngram_jaccard() -> str:
    return f"""
WITH {AUG_DOCS},
d AS (SELECT doc_id, lang, length(text) AS n FROM docs),
tg AS (
  SELECT doc_id,
    CASE WHEN length(text) >= 3
      THEN list_distinct([substring(text, i, 3) FOR i IN range(1, length(text) - 1)])
      ELSE [text] END AS grams
  FROM docs),
{_minhash_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bd a JOIN bd b USING (band_idx, band_key)
  JOIN d da ON da.doc_id = a.doc_id
  JOIN d db ON db.doc_id = b.doc_id
  WHERE a.doc_id < b.doc_id AND da.lang = db.lang
    AND abs(da.n - db.n) <= {D.LEN_BAND}),
pairs AS (
  SELECT doc_a, doc_b,
    len(list_intersect(x.grams, y.grams))::DOUBLE
      / len(list_distinct(list_concat(x.grams, y.grams))) AS sim
  FROM cand JOIN tg x ON x.doc_id = cand.doc_a JOIN tg y ON y.doc_id = cand.doc_b)
SELECT doc_a, doc_b, round(sim, 6) AS sim FROM pairs WHERE sim >= {D.NGRAM_THRESHOLD}
"""


def dedup_minhash_lsh() -> str:
    """Independent DuckDB replay of the md5 double-hash minhash (see
    extras/dedup.py §3 for the math): identical signatures → identical band
    keys → identical candidate set → identical verified pairs."""
    return f"""
WITH {AUG_DOCS},
{_minhash_cte()},
{_minhash_pairs_cte()}
SELECT doc_a, doc_b, sim FROM prs
"""


def dedup_simhash() -> str:
    """Independent DuckDB replay of the md5-bit simhash (extras/dedup.py §4):
    token-hash bits via unnest+group-by instead of Spark's fold, same values."""
    return f"""
WITH {AUG_DOCS},
toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \t\n\r]+'),
                                    t -> t <> '')) AS tok
  FROM docs),
th AS (
  SELECT doc_id,
    ('0x'||substring(md5(tok),1,15))::BIGINT AS ha,
    ('0x'||substring(md5(tok),16,4))::BIGINT AS hb
  FROM toks),
bits AS (
  SELECT doc_id, j,
    CASE WHEN j < 60 THEN (ha >> j) & 1 ELSE (hb >> (j-60)) & 1 END AS bit
  FROM th CROSS JOIN (SELECT unnest(generate_series(0,{D.SIMHASH_BITS - 1})) AS j) js),
acc AS (
  SELECT doc_id, j, CASE WHEN sum(2*bit-1) > 0 THEN 1 ELSE 0 END AS sbit
  FROM bits GROUP BY doc_id, j),
sigp AS (
  SELECT doc_id, j // 16 AS band_idx, sum(sbit::BIGINT << (j % 16))::BIGINT AS band_val
  FROM acc GROUP BY doc_id, j // 16),
sig AS (  -- docs with zero tokens have no rows above: all-zero signature
  SELECT d.doc_id, b.band_idx, coalesce(s.band_val, 0)::BIGINT AS band_val
  FROM docs d
  CROSS JOIN (SELECT unnest(generate_series(0,{D.SIMHASH_BANDS - 1})) AS band_idx) b
  LEFT JOIN sigp s ON s.doc_id = d.doc_id AND s.band_idx = b.band_idx),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b USING (band_idx, band_val)
  WHERE a.doc_id < b.doc_id),
sigw AS (SELECT doc_id, list(band_val ORDER BY band_idx) AS bands FROM sig GROUP BY doc_id),
p AS (
  SELECT doc_a, doc_b,
    CAST(bit_count(xor(x.bands[1], y.bands[1])) + bit_count(xor(x.bands[2], y.bands[2]))
       + bit_count(xor(x.bands[3], y.bands[3])) + bit_count(xor(x.bands[4], y.bands[4]))
       AS INT) AS hamming
  FROM cand JOIN sigw x ON x.doc_id = cand.doc_a JOIN sigw y ON y.doc_id = cand.doc_b)
SELECT doc_a, doc_b, hamming FROM p WHERE hamming <= {D.SIMHASH_MAX_HAMMING}
"""


def dedup_embed_cosine() -> str:
    cos_vc = _cos("e.v", "c.cv")
    return f"""
WITH base AS (
  SELECT vec_id, label, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
),
e AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + {D.EMBED_EXACT_OFFSET}, label, v
  FROM base WHERE vec_id % {D.EMBED_EXACT_MOD} = 0
  UNION ALL
  SELECT vec_id + {D.EMBED_NEAR_OFFSET}, label,
    list_concat([v[1] + {D.EMBED_PERTURB}], v[2:])
  FROM base WHERE vec_id % {D.EMBED_NEAR_MOD} = 0
),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {SIM.IVF_CENTROIDS}),
ca AS (  -- IVF cell assignment, nprobe nearest cells per vector
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c) WHERE r <= {D.EMBED_NPROBE}),
cand AS (
  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
  FROM ca x JOIN ca y ON x.cid = y.cid AND x.vec_id < y.vec_id),
p AS (
  SELECT id_a, id_b, {_cos('a.v', 'b.v')} AS cos
  FROM cand JOIN e a ON a.vec_id = cand.id_a JOIN e b ON b.vec_id = cand.id_b)
SELECT id_a, id_b, round(cos, 6) AS cos FROM p WHERE cos >= {D.COSINE_DUP_THRESHOLD}
"""


def _cos(a: str, b: str) -> str:
    return f"""
list_sum([{a}[i] * {b}[i] FOR i IN range(1, len({b}) + 1)])
  / (sqrt(list_sum([{a}[i] * {a}[i] FOR i IN range(1, len({a}) + 1)]))
     * sqrt(list_sum([{b}[i] * {b}[i] FOR i IN range(1, len({b}) + 1)])))
"""


_COS = _cos("q.qv", "e.v")


def mm_embed_topk() -> str:
    """Replay of multimodal.embed_stub → similarity.topk_bruteforce: the
    stub components are pure power-of-two scalings of md5 prefixes, so the
    vectors — and every cosine downstream — are float64-bit-identical."""
    from .extras import multimodal as MM

    return f"""
WITH e AS (
  SELECT doc_id AS vec_id,
    [ (('0x'||substring(md5(text || ':emb' || j),1,8))::BIGINT / 2147483648.0 - 1.0)
      FOR j IN range(0, {MM.MM_EMBED_DIM}) ] AS v
  FROM documents),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {SIM.N_QUERIES}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS} AS cos
  FROM e, q WHERE e.vec_id <> q.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS score
FROM r WHERE rank <= {SIM.TOPK}
"""


def sim_topk_bruteforce() -> str:
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {SIM.N_QUERIES}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS} AS cos
  FROM e, q WHERE e.vec_id <> q.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS score
FROM r WHERE rank <= {SIM.TOPK}
"""


def sim_ivf_topk() -> str:
    cos_vc = _cos("e.v", "c.cv")
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {SIM.IVF_CENTROIDS}),
ca AS (
  SELECT vec_id AS neighbor_id, v AS nv, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c) WHERE r = 1),
qa AS (
  SELECT query_id, qv, cid FROM (
    SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c WHERE e.vec_id < {SIM.N_QUERIES_IVF}) WHERE r <= {SIM.IVF_NPROBE}),
s AS (
  SELECT qa.query_id, ca.neighbor_id,
    {_cos('qa.qv', 'ca.nv')} AS cos
  FROM ca JOIN qa ON ca.cid = qa.cid WHERE ca.neighbor_id <> qa.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS score
FROM r WHERE rank <= {SIM.IVF_TOPK}
"""


def sim_ivf_trained(centroids_path: str) -> str:
    """Same IVF assignment/probe/top-k replay as sim_ivf_topk, but against
    the PERSISTED trained quantizer (similarity.ensure_trained_centroids):
    both sides read the identical parquet artifact, so the value-exact gate
    covers the real trained-quantizer ANN path, not just the deterministic
    first-16 stand-in (round-3 verdict, next #3)."""
    cos_vc = _cos("e.v", "c.cv")
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
c AS (SELECT cid, cv FROM read_parquet('{centroids_path}')),
ca AS (
  SELECT vec_id AS neighbor_id, v AS nv, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c) WHERE r = 1),
qa AS (
  SELECT query_id, qv, cid FROM (
    SELECT e.vec_id AS query_id, e.v AS qv, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c WHERE e.vec_id < {SIM.N_QUERIES_IVF}) WHERE r <= {SIM.IVF_NPROBE}),
s AS (
  SELECT qa.query_id, ca.neighbor_id,
    {_cos('qa.qv', 'ca.nv')} AS cos
  FROM ca JOIN qa ON ca.cid = qa.cid WHERE ca.neighbor_id <> qa.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS score
FROM r WHERE rank <= {SIM.IVF_TOPK}
"""


def sim_ivf_cells(centroids_path: str) -> str:
    """Replay of extras.similarity.ivf_cell_stats against the trained
    quantizer artifact: nearest-1 assignment, occupancy per cell — the skew
    diagnostic (a hot cell is a hot shuffle partition)."""
    cos_vc = _cos("e.v", "c.cv")
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
c AS (SELECT cid, cv FROM read_parquet('{centroids_path}')),
a AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c) WHERE r = 1)
SELECT cid, count(*)::BIGINT AS n FROM a GROUP BY cid
"""


def _bucket_sql(col: str) -> str:
    return " || ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(SIM.SIGN_BITS)
    )


def sim_lsh_topk() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v,
    {_bucket_sql('embedding')} AS bucket
  FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {SIM.N_QUERIES_LSH}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {_COS} AS cos
  FROM e JOIN q ON e.bucket = q.bucket WHERE e.vec_id <> q.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS score
FROM r WHERE rank <= {SIM.LSH_TOPK}
"""


def text_tokens() -> str:
    return f"""
SELECT doc_id,
  CAST(CASE WHEN trim(text) = '' THEN 0
       ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS INT) AS n_ws_tokens,
  CAST(len(regexp_extract_all(text, '{TS.BPE_TOKEN_PAT}')) AS INT) AS n_bpe_tokens
FROM documents
"""


def text_pack_shards() -> str:
    """Replay of extras.textstats.pack_shards: the two-level distributed
    prefix sum collapses to a plain global running sum here — which is the
    point: the bucketed scan must equal the naive scan exactly."""
    from lumbermill_spark.extras import textstats as TSX

    return f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{TS.BPE_TOKEN_PAT}')) AS INT) AS n_tokens
  FROM documents),
c AS (
  SELECT *,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset_tokens
  FROM t)
SELECT doc_id, n_tokens, CAST(offset_tokens AS BIGINT) AS offset_tokens,
  CAST(floor(offset_tokens / {TSX.DEFAULT_SHARD_BUDGET}) AS INT) AS shard_id
FROM c
"""


def text_decontaminate() -> str:
    """Replay of extras.textstats.decontaminate: distinct w-token shingles,
    benchmark split doc_id %% MOD == 0, contaminated when >= threshold
    distinct shingles are shared with the benchmark set."""
    from lumbermill_spark.extras import textstats as TSX

    w = TSX.CONTAM_SHINGLE_W
    return f"""
WITH tok AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM documents),
sh0 AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(ts) >= {w}
      THEN [array_to_string(ts[i:i+{w - 1}], ' ') FOR i IN range(1, len(ts) - {w - 2})]
      ELSE [array_to_string(ts, ' ')] END)) AS s
  FROM tok),
sh AS (SELECT * FROM sh0 WHERE s <> ''),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {TSX.CONTAM_BENCH_MOD} = 0),
hits AS (
  SELECT c.doc_id, count(DISTINCT c.s) AS n_hit_shingles
  FROM sh c JOIN bench USING (s)
  WHERE c.doc_id % {TSX.CONTAM_BENCH_MOD} <> 0
  GROUP BY c.doc_id)
SELECT d.doc_id,
  CAST(coalesce(h.n_hit_shingles, 0) AS INT) AS n_hit_shingles,
  coalesce(h.n_hit_shingles, 0) >= {TSX.CONTAM_THRESHOLD} AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {TSX.CONTAM_BENCH_MOD} <> 0) d
LEFT JOIN hits h USING (doc_id)
"""


def text_quality() -> str:
    length = "greatest(length(text), 1)::DOUBLE"
    ntok = (
        "greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1)::DOUBLE"
    )
    alpha = f"len(regexp_extract_all(text, '{TS.ALPHA_PAT}')) / {length}"
    punct = f"len(regexp_extract_all(text, '{TS.PUNCT_PAT}')) / {length}"
    stop = f"least(len(regexp_extract_all(lower(text), '{TS.stopword_pat('en')}'))::DOUBLE / {ntok}, 1.0)"
    score = (
        f"0.25 * ({alpha}) + 0.25 * (1.0 - least(({punct}) * 4.0, 1.0))"
        f" + 0.25 * ({stop}) + 0.25 * least({ntok} / 100.0, 1.0)"
    )
    return f"""
SELECT doc_id,
  round({alpha}, 6) AS alpha_ratio,
  round({punct}, 6) AS punct_ratio,
  round({stop}, 6) AS stopword_frac,
  round({score}, 6) AS quality_score
FROM documents
"""


def text_langid() -> str:
    scores = {
        lang: f"len(regexp_extract_all(lower(text), '{TS.stopword_pat(lang)}'))"
        for lang in TS.LANG_ORDER
    }
    g = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(f"WHEN {scores[lang]} = {g} THEN '{lang}'" for lang in TS.LANG_ORDER)
    sel = ", ".join(f"CAST({scores[lang]} AS INT) AS score_{lang}" for lang in TS.LANG_ORDER)
    return f"""
SELECT doc_id, {sel},
  CASE WHEN {g} = 0 THEN 'und' {whens} ELSE 'und' END AS pred_lang
FROM documents
"""


def text_fingerprint() -> str:
    return f"SELECT doc_id, {FINGERPRINT} AS fingerprint FROM documents"


def mm_frame_sample() -> str:
    """Replays extras/multimodal.frame_sample: character-slice frames of
    FRAME_BYTES, sampled every FRAME_STRIDE, md5 per sampled frame."""
    from .extras import multimodal as MM

    fb, st = MM.FRAME_BYTES, MM.FRAME_STRIDE
    return f"""
WITH d AS (
  SELECT doc_id, text,
    greatest((length(text) + {fb} - 1) // {fb}, 1) AS n_frames
  FROM documents)
SELECT doc_id,
  CAST(fi AS INT) AS frame_idx,
  CAST(n_frames AS INT) AS n_frames,
  md5(substring(text, fi*{fb} + 1, {fb})) AS frame_md5
FROM d, unnest(generate_series(0, (n_frames - 1)::BIGINT, {st})) AS f(fi)
"""


def mm_decode_stub() -> str:
    return """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  md5(text) AS content_md5,
  CAST(((('0x' || substr(md5(text), 1, 2))::INT % 32 + 1) * 16) AS INT) AS width,
  CAST(((('0x' || substr(md5(text), 3, 2))::INT % 32 + 1) * 16) AS INT) AS height
FROM documents
"""


def text_sample() -> str:
    """Replays extras/textstats.hash_sample + sampled_lang_counts."""
    from .extras import textstats as TS2

    cutoff = int(0.1 * (1 << 32))
    return f"""
SELECT lang, count(*) AS n_sampled, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE ('0x'||substring(md5('{TS2.SAMPLE_SALT}' || ':' || CAST(doc_id AS VARCHAR)),1,8))::BIGINT
      < {cutoff}
GROUP BY lang
"""


def text_repetition() -> str:
    """Replay of extras.textstats.with_repetition: Gopher-style duplicate
    word/n-gram fractions + top-word share over the token-capped word list,
    thresholds shared from the Spark module."""
    words = (
        "CASE WHEN trim(text) = '' THEN [] "
        f"ELSE regexp_split_to_array(trim(text), '\\s+')[1:{TS.MAX_REP_TOKENS}] END"
    )
    dup1 = "CASE WHEN len(words) > 0 THEN round(1 - len(list_distinct(words))::DOUBLE / len(words), 6) ELSE 0.0 END"
    g2 = "CASE WHEN len(words) >= 2 THEN list_transform(range(1, len(words)), i -> words[i] || ' ' || words[i+1]) ELSE [] END"
    g3 = "CASE WHEN len(words) >= 3 THEN list_transform(range(1, len(words) - 1), i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) ELSE [] END"
    dup_g = "CASE WHEN len({g}) > 0 THEN round(1 - len(list_distinct({g}))::DOUBLE / len({g}), 6) ELSE 0.0 END"
    top = (
        "CASE WHEN len(words) > 0 THEN round(list_max(list_transform(list_distinct(words), "
        "w -> len(list_filter(words, x -> x = w))))::DOUBLE / len(words), 6) ELSE 0.0 END"
    )
    return f"""
WITH w AS (SELECT doc_id, {words} AS words FROM documents),
f AS (SELECT doc_id,
  {dup1} AS dup_word_frac,
  {dup_g.format(g=f'({g2})')} AS dup_2gram_frac,
  {dup_g.format(g=f'({g3})')} AS dup_3gram_frac,
  {top} AS top_word_frac
FROM w)
SELECT *,
  (dup_word_frac <= {TS.REP_MAX_DUP_WORD_FRAC}
   AND dup_2gram_frac <= {TS.REP_MAX_DUP_2GRAM_FRAC}
   AND top_word_frac <= {TS.REP_MAX_TOP_WORD_FRAC}) AS rep_keep
FROM f
"""


def text_redact_pii() -> str:
    """Replay of extras.textstats.redact_pii over the deterministically
    PII-augmented documents (augment_pii; same convention as AUG_DOCS):
    counts + redaction with the same replace ORDER (emails, then IPs, then
    phones) and the same RE2-safe patterns."""
    aug = (
        "text"
        f" || CASE WHEN doc_id % {TS.PII_EMAIL_MOD} = 0 THEN ' contact user' || doc_id || '@example' || (doc_id % 7) || '.com' ELSE '' END"
        f" || CASE WHEN doc_id % {TS.PII_IP_MOD} = 0 THEN ' from 10.' || (doc_id % 256) || '.' || (doc_id % 100) || '.' || (doc_id % 50) ELSE '' END"
        f" || CASE WHEN doc_id % {TS.PII_PHONE_MOD} = 0 THEN ' call 555-' || (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000) ELSE '' END"
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS t FROM documents),
r1 AS (SELECT doc_id,
  CAST(len(regexp_extract_all(t, '{TS.EMAIL_RX}')) AS INT) AS n_emails,
  regexp_replace(t, '{TS.EMAIL_RX}', '<EMAIL>', 'g') AS t FROM a),
r2 AS (SELECT doc_id, n_emails,
  CAST(len(regexp_extract_all(t, '{TS.IPV4_RX}')) AS INT) AS n_ips,
  regexp_replace(t, '{TS.IPV4_RX}', '<IP>', 'g') AS t FROM r1)
SELECT doc_id, n_emails, n_ips,
  CAST(len(regexp_extract_all(t, '{TS.PHONE_RX}')) AS INT) AS n_phones,
  regexp_replace(t, '{TS.PHONE_RX}', '<PHONE>', 'g') AS redacted_text
FROM r2
"""


def corpus_mixture() -> str:
    """Replay of extras.textstats.mixture_sample: per-stratum counts, the
    no-upsampling corpus cap T = min(n_s / p_s), per-stratum keep fraction
    (T * p_s) / n_s in the same IEEE op order as the Spark expression, and
    the md5(salt:doc_id) cutoff. Weights/salt shared from the Spark module."""
    case = " ".join(
        f"WHEN '{k}' THEN CAST({v!r} AS DOUBLE)"
        for k, v in sorted(TS.DEFAULT_MIX_WEIGHTS.items())
    )
    return f"""
WITH c AS (SELECT lang, count(*)::BIGINT AS n_s FROM documents GROUP BY lang),
w AS (SELECT lang, n_s, CASE lang {case} ELSE CAST(0.0 AS DOUBLE) END AS p_s FROM c),
t AS (SELECT min(n_s / p_s) AS t_min FROM w WHERE p_s > 0),
f AS (SELECT lang, (t.t_min * w.p_s) / w.n_s AS frac FROM w, t WHERE w.p_s > 0)
SELECT d.doc_id, d.lang
FROM documents d JOIN f ON d.lang = f.lang
WHERE ('0x'||substring(md5('{TS.MIX_SALT}' || ':' || CAST(d.doc_id AS VARCHAR)),1,8))::BIGINT::DOUBLE
      < f.frac * 4294967296.0
"""


def dedup_incremental() -> str:
    """Replay of extras.dedup.incremental_dedup over the driver-gate split
    of the augmented docs: doc_id % INC_INDEX_MOD == 0 is the prior-corpus
    index, the rest is the new batch."""
    return f"""
WITH {AUG_DOCS},
b AS (SELECT doc_id, {FINGERPRINT} AS fingerprint FROM docs
      WHERE doc_id % {D.INC_INDEX_MOD} <> 0),
idx AS (SELECT DISTINCT {FINGERPRINT} AS fingerprint FROM docs
        WHERE doc_id % {D.INC_INDEX_MOD} = 0),
fl AS (SELECT doc_id, fingerprint,
         (doc_id <> min(doc_id) OVER (PARTITION BY fingerprint)) AS dup_in_batch
       FROM b)
SELECT fl.doc_id, fl.fingerprint,
  (idx.fingerprint IS NOT NULL) AS dup_of_index,
  fl.dup_in_batch,
  (NOT fl.dup_in_batch AND idx.fingerprint IS NULL) AS keep
FROM fl LEFT JOIN idx ON fl.fingerprint = idx.fingerprint
"""


def text_line_dedup() -> str:
    """Replay of extras.textstats.remove_frequent_lines over the
    deterministically line-augmented documents (augment_lines; same
    convention as augment_pii): lines recurring in >= LINE_MIN_DOCS distinct
    docs are dropped, documents are rebuilt in original line order."""
    aug = (
        "concat_ws(chr(10), "
        f"CASE WHEN doc_id % {TS.LINE_NAV_MOD} = 0 THEN '{TS.BOILER_NAV}' END, "
        "text, "
        f"CASE WHEN doc_id % {TS.LINE_NEWS_MOD} = 0 THEN '{TS.BOILER_NEWS}' END, "
        f"CASE WHEN doc_id % {TS.LINE_COOKIE_MOD} = 0 THEN '{TS.BOILER_COOKIE}' END, "
        "'ref ' || doc_id)"
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS t FROM documents),
l AS (SELECT doc_id,
        unnest(list_transform(string_split(t, chr(10)),
                              (x, i) -> {{'pos': i, 'line': x}})) AS u
      FROM a),
ln AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM l),
freq AS (SELECT line FROM ln GROUP BY line
         HAVING count(DISTINCT doc_id) >= {TS.LINE_MIN_DOCS}),
kept AS (SELECT * FROM ln WHERE line NOT IN (SELECT line FROM freq)),
reb AS (SELECT doc_id, count(*) AS n_kept,
          string_agg(line, chr(10) ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, count(*) AS n_lines FROM ln GROUP BY doc_id)
SELECT tot.doc_id,
  tot.n_lines::INT AS n_lines,
  (tot.n_lines - coalesce(reb.n_kept, 0))::INT AS n_lines_removed,
  coalesce(reb.clean_text, '') AS clean_text
FROM tot LEFT JOIN reb ON tot.doc_id = reb.doc_id
"""


def text_unigram_logprob(vocab_k: int) -> str:
    """Replay of extras.textstats.unigram_logprob: corpus token counts,
    top-K vocabulary (count desc, token asc), add-one smoothing over
    (N + V + 1) with V counted BEFORE the cap, per-token logp rounded to
    12 dp on both engines before the per-doc mean (kills libm ulp skew)."""
    return f"""
WITH w AS (SELECT doc_id,
    CASE WHEN trim(text) = '' THEN []
         ELSE string_split_regex(lower(trim(text)), '\\s+') END AS ws
  FROM documents),
t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
c AS (SELECT tok, count(*)::BIGINT AS c FROM t GROUP BY tok),
tot AS (SELECT sum(c)::BIGINT AS n_total, count(*)::BIGINT AS v_total FROM c),
v AS (SELECT tok, round(ln((c + 1) / (n_total + v_total + 1)), 12) AS logp
      FROM c, tot ORDER BY c DESC, tok LIMIT {vocab_k}),
o AS (SELECT round(ln(1.0 / (n_total + v_total + 1)), 12) AS oov_logp FROM tot),
s AS (SELECT t.doc_id, count(*) AS n_tokens,
        sum(CASE WHEN v.logp IS NULL THEN 1 ELSE 0 END) AS n_oov,
        avg(coalesce(v.logp, o.oov_logp)) AS alp
      FROM t LEFT JOIN v ON t.tok = v.tok, o GROUP BY t.doc_id)
SELECT d.doc_id,
  coalesce(s.n_tokens, 0)::INT AS n_tokens,
  coalesce(s.n_oov, 0)::INT AS n_oov,
  round(s.alp, 6) AS avg_logprob
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN s ON d.doc_id = s.doc_id
"""


def _split_hash(salt: str) -> str:
    return f"('0x'||substring(md5('{salt}' || ':' || CAST(doc_id AS VARCHAR)),1,8))::BIGINT"


def corpus_split() -> str:
    """Replay of extras.textstats.corpus_split: integer hash cutoffs
    partition [0, 2^32) into train/val/test."""
    w_train, w_val, _ = TS.DEFAULT_SPLIT_WEIGHTS
    cut1 = int(w_train * (1 << 32))
    cut2 = int((w_train + w_val) * (1 << 32))
    return f"""
SELECT doc_id,
  CASE WHEN {_split_hash(TS.SPLIT_SALT)} < {cut1} THEN 'train'
       WHEN {_split_hash(TS.SPLIT_SALT)} < {cut2} THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def corpus_stats() -> str:
    """Replay of extras.textstats.corpus_stats: per-(lang, source) report
    card with exact interpolated percentiles (quantile_cont == Spark's
    `percentile`, the lm_router_rollup precedent)."""
    ws = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    return f"""
SELECT lang, source,
  count(*)::BIGINT AS n_docs,
  sum(length(text))::BIGINT AS total_chars,
  sum({ws})::BIGINT AS total_ws_tokens,
  round(quantile_cont(length(text), 0.5), 6) AS p50_chars,
  round(quantile_cont(length(text), 0.95), 6) AS p95_chars,
  round(avg({ws}), 6) AS avg_ws_tokens
FROM documents GROUP BY lang, source
"""


def text_pack_shuffled() -> str:
    """Replay of extras.textstats.pack_shards_shuffled: the bucketed
    two-level scan must equal the naive global running sum over the
    deterministic shuffle order (md5 hash, doc_id)."""
    from lumbermill_spark.extras import textstats as TSX

    return f"""
WITH t AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(text, '{TS.BPE_TOKEN_PAT}')) AS INT) AS n_tokens,
    {_split_hash(TS.SHUFFLE_SALT)} AS shuffle_key
  FROM documents),
c AS (
  SELECT *,
    coalesce(sum(n_tokens) OVER (ORDER BY shuffle_key, doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset_tokens
  FROM t)
SELECT doc_id, n_tokens, shuffle_key, CAST(offset_tokens AS BIGINT) AS offset_tokens,
  CAST(floor(offset_tokens / {TSX.DEFAULT_SHARD_BUDGET}) AS BIGINT) AS shard_id
FROM c
"""


def text_pack_sequences() -> str:
    """Replay of extras.textstats.pack_sequences: naive global running sum
    → shard assignment → per-shard ordered string_agg. Equality (including
    the concatenated payloads, value-hashed) proves both the bucketed scan
    and the in-shard doc order."""
    from lumbermill_spark.extras import textstats as TSX

    return f"""
WITH t AS (
  SELECT doc_id, text,
    CAST(len(regexp_extract_all(text, '{TS.BPE_TOKEN_PAT}')) AS INT) AS n_tokens
  FROM documents),
c AS (
  SELECT *,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offset_tokens
  FROM t)
SELECT CAST(floor(offset_tokens / {TSX.DEFAULT_SHARD_BUDGET}) AS BIGINT) AS shard_id,
  count(*)::BIGINT AS n_docs,
  sum(n_tokens)::BIGINT AS shard_tokens,
  min(doc_id) AS first_doc_id,
  string_agg(text, '{TSX.EOS_SEP}' ORDER BY doc_id) AS packed_text
FROM c GROUP BY 1
"""


def corpus_take_stratified() -> str:
    """Replay of extras.textstats.take_per_stratum: the cutoff-prefiltered,
    verified-exact stratified take must equal the naive full row_number()
    per stratum."""
    return f"""
SELECT doc_id, lang, source, CAST(rn AS INT) AS rn FROM (
  SELECT doc_id, lang, source,
    row_number() OVER (PARTITION BY lang, source
      ORDER BY {_split_hash(TS.STRAT_SALT)}, doc_id) AS rn
  FROM documents)
WHERE rn <= {TS.STRAT_TAKE_K}
"""


def dedup_normalized() -> str:
    """Replay of extras.dedup.normalized_dedup over augmented_variants: the
    injected UPPERCASED / punctuation-mangled copies must land in their
    source's normalized group."""
    return f"""
WITH vdocs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {D.CASE_ID_OFFSET}, upper(text)
  FROM documents WHERE doc_id % {D.CASE_COPY_MOD} = 0
  UNION ALL
  SELECT doc_id + {D.PUNCT_ID_OFFSET}, replace(text, ' ', ' ,  ') || '!!'
  FROM documents WHERE doc_id % {D.PUNCT_COPY_MOD} = 0),
fp AS (
  SELECT doc_id,
    md5(trim(regexp_replace(lower(text), '{D.NORM_PAT}', ' ', 'g'))) AS norm_fp
  FROM vdocs)
SELECT doc_id, norm_fp,
  min(doc_id) OVER (PARTITION BY norm_fp) AS canonical_id,
  count(*) OVER (PARTITION BY norm_fp) AS group_size,
  (doc_id = min(doc_id) OVER (PARTITION BY norm_fp)) AS is_canonical
FROM fp
"""


def text_chunk_sliding() -> str:
    """Replay of extras.textstats.chunk_sliding: per-doc overlapping token
    windows via generate_series + inclusive 1-based list slicing (DuckDB
    clips at the tail exactly like Spark's slice())."""
    L, S = TS.CHUNK_LEN, TS.CHUNK_STRIDE
    return f"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents),
s AS (
  SELECT doc_id, ts, len(ts) AS n,
    CASE WHEN len(ts) = 0 THEN 0
         WHEN len(ts) <= {L} THEN 1
         ELSE (len(ts) - {L} + {S} - 1) // {S} + 1 END AS nc
  FROM t)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
  CAST(least({L}, n - i * {S}) AS INT) AS n_chunk_tokens,
  array_to_string(ts[i * {S} + 1 : i * {S} + {L}], ' ') AS chunk_text
FROM s, unnest(generate_series(0, nc - 1)) AS u(i)
"""


def text_bigram_logprob(vocab_k: int) -> str:
    """Replay of extras.textstats.bigram_logprob: same top-K tie-break,
    <unk> collapse before counting, add-one smoothing over |vocab|+1, and
    the 12-dp per-bigram rounding before the mean."""
    return f"""
WITH tok AS (
  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ts
  FROM documents),
pairs AS (
  SELECT doc_id,
    CASE WHEN i = 1 THEN '{TS.BOS}' ELSE ts[i - 1] END AS prev_raw,
    ts[i] AS cur_raw
  FROM tok, unnest(generate_series(1, len(ts))) u(i)),
vocab AS (
  SELECT cur_raw AS tok FROM pairs GROUP BY cur_raw
  ORDER BY count(*) DESC, cur_raw LIMIT {vocab_k}),
vm AS (SELECT count(*) + 1 AS v FROM vocab),
m AS (
  SELECT doc_id,
    CASE WHEN prev_raw = '{TS.BOS}' THEN '{TS.BOS}'
         WHEN prev_raw IN (SELECT tok FROM vocab) THEN prev_raw
         ELSE '{TS.UNK}' END AS prev_m,
    CASE WHEN cur_raw IN (SELECT tok FROM vocab) THEN cur_raw
         ELSE '{TS.UNK}' END AS cur_m
  FROM pairs),
bc AS (SELECT prev_m, cur_m, count(*) AS cb FROM m GROUP BY 1, 2),
cc AS (SELECT prev_m, sum(cb) AS ct FROM bc GROUP BY 1),
scored AS (
  SELECT doc_id, count(*) AS nt,
    sum(CASE WHEN cur_m = '{TS.UNK}' THEN 1 ELSE 0 END) AS nu,
    avg(round(ln((cb + 1.0) / (ct + v)), 12)) AS alp
  FROM m JOIN bc USING (prev_m, cur_m) JOIN cc USING (prev_m) CROSS JOIN vm
  GROUP BY doc_id)
SELECT d.doc_id, coalesce(nt, 0)::INT AS n_tokens, coalesce(nu, 0)::INT AS n_unk,
  round(alp, 6) AS avg_logprob
FROM documents d LEFT JOIN scored USING (doc_id)
"""


def text_langid_confusion() -> str:
    """Replay of extras.textstats.langid_confusion: the verified langid
    CASE + (lang, pred) counts + per-true-lang recall share."""
    scores = {
        lang: f"len(regexp_extract_all(lower(text), '{TS.stopword_pat(lang)}'))"
        for lang in TS.LANG_ORDER
    }
    g = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(f"WHEN {scores[lang]} = {g} THEN '{lang}'" for lang in TS.LANG_ORDER)
    return f"""
WITH p AS (
  SELECT lang,
    CASE WHEN {g} = 0 THEN 'und' {whens} ELSE 'und' END AS pred_lang
  FROM documents),
c AS (SELECT lang, pred_lang, count(*)::BIGINT AS n_docs FROM p GROUP BY 1, 2)
SELECT lang, pred_lang, n_docs,
  round(n_docs / sum(n_docs) OVER (PARTITION BY lang), 12) AS recall_share,
  lang = pred_lang AS correct
FROM c
"""


def text_kn_logprob(vocab_k: int) -> str:
    """Replay of extras.textstats.kn_logprob: same <unk>-collapsed bigram
    table, continuation counts, and the exact interpolated-KN float shape
    (discount as ::DOUBLE; 12-dp per-bigram rounding before the mean)."""
    from .extras import textstats as TSX

    d = f"({TSX.KN_DISCOUNT}::DOUBLE)"
    return f"""
WITH tok AS (
  SELECT doc_id, CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
       ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ts
  FROM documents),
pairs AS (
  SELECT doc_id,
    CASE WHEN i = 1 THEN '{TS.BOS}' ELSE ts[i - 1] END AS prev_raw,
    ts[i] AS cur_raw
  FROM tok, unnest(generate_series(1, len(ts))) u(i)),
vocab AS (
  SELECT cur_raw AS tok FROM pairs GROUP BY cur_raw
  ORDER BY count(*) DESC, cur_raw LIMIT {vocab_k}),
m AS (
  SELECT doc_id,
    CASE WHEN prev_raw = '{TS.BOS}' THEN '{TS.BOS}'
         WHEN prev_raw IN (SELECT tok FROM vocab) THEN prev_raw
         ELSE '{TS.UNK}' END AS prev_m,
    CASE WHEN cur_raw IN (SELECT tok FROM vocab) THEN cur_raw
         ELSE '{TS.UNK}' END AS cur_m
  FROM pairs),
bc AS MATERIALIZED (SELECT prev_m, cur_m, count(*) AS cb FROM m GROUP BY 1, 2),
cc AS (SELECT prev_m, sum(cb)::BIGINT AS ct, count(*)::BIGINT AS n1f FROM bc GROUP BY 1),
cont AS (SELECT cur_m, count(*)::BIGINT AS n1b FROM bc GROUP BY 1),
bt AS (SELECT count(*)::DOUBLE AS b FROM bc),
scored AS (
  SELECT doc_id, count(*) AS nt,
    sum(CASE WHEN cur_m = '{TS.UNK}' THEN 1 ELSE 0 END) AS nu,
    avg(round(ln(
      greatest(cb - {d}, 0e0) / ct + (({d} * n1f) / ct) * (n1b / b)
    ), 12)) AS alp
  FROM m JOIN bc USING (prev_m, cur_m) JOIN cc USING (prev_m)
  JOIN cont USING (cur_m) CROSS JOIN bt
  GROUP BY doc_id)
SELECT d.doc_id, coalesce(nt, 0)::INT AS n_tokens, coalesce(nu, 0)::INT AS n_unk,
  round(alp, 6) AS avg_logprob
FROM documents d LEFT JOIN scored USING (doc_id)
"""


def _curate_fragments() -> tuple[str, str, str]:
    """(n_ws expr, reasons expr, keep expr) for the curation rules — shared
    by corpus_curate and corpus_prepare, mirroring TS._curate_checks."""
    n_ws = (
        "CASE WHEN trim(text) = '' THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    checks = [
        ("too_short", f"t.n_ws < {TS.CURATE_MIN_TOKENS}"),
        ("too_long", f"t.n_ws > {TS.CURATE_MAX_TOKENS}"),
        ("low_quality", f"q.quality_score < {TS.CURATE_MIN_QUALITY}"),
        ("repetitive", "NOT r.rep_keep"),
        ("unknown_lang", "l.pred_lang = 'und'"),
    ]
    reasons = " || ".join(f"CASE WHEN {c} THEN '{n},' ELSE '' END" for n, c in checks)
    keep = " AND ".join(f"NOT ({c})" for _, c in checks)
    return n_ws, reasons, keep


def corpus_curate() -> str:
    """Replay of extras.textstats.corpus_curate by composing the three
    existing signal replays as CTE subqueries (each already value-exact on
    its own gate) + the shared threshold constants."""
    n_ws, reasons, keep = _curate_fragments()
    return f"""
WITH q AS ({text_quality()}),
r AS ({text_repetition()}),
l AS ({text_langid()}),
t AS (SELECT doc_id, {n_ws} AS n_ws FROM documents)
SELECT t.doc_id,
  CAST(t.n_ws AS INT) AS n_ws_tokens,
  q.quality_score,
  l.pred_lang,
  ({keep}) AS keep,
  regexp_replace({reasons}, ',$', '') AS reasons
FROM t JOIN q ON q.doc_id = t.doc_id
JOIN r ON r.doc_id = t.doc_id
JOIN l ON l.doc_id = t.doc_id
"""


# ---------------------------------------------------------------------------
# transcript→corpus replays (read the same transcripts parquet the Spark
# side reads, by absolute path — transcripts is not a driver view)
# ---------------------------------------------------------------------------


def conv_render(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.render_conversations: ordered string_agg
    over (conv_id, turn_idx)-unique turns."""
    from .extras import convcorpus as CC

    return f"""
WITH r AS (
  SELECT conv_id, count(*)::INT AS n_turns,
    string_agg(role || ': ' || text, '{CC.TURN_SEP}' ORDER BY turn_idx) AS rendered
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL GROUP BY conv_id)
SELECT conv_id, n_turns, length(rendered)::BIGINT AS n_chars, rendered FROM r
"""


def conv_stats(transcripts_path: str) -> str:
    return f"""
SELECT conv_id, count(*)::INT AS n_turns,
  count(DISTINCT role)::INT AS n_roles,
  count(DISTINCT tool)::INT AS n_tools,
  sum(length(text))::BIGINT AS total_chars,
  (epoch_us(max(ts)) - epoch_us(min(ts)))::BIGINT AS duration_us
FROM read_parquet('{transcripts_path}')
WHERE conv_id IS NOT NULL GROUP BY conv_id
"""


def conv_boilerplate(transcripts_path: str) -> str:
    from .extras import convcorpus as CC

    return f"""
SELECT md5(text) AS turn_fp,
  count(DISTINCT conv_id)::INT AS n_convs,
  count(*)::BIGINT AS n_turns,
  count(DISTINCT conv_id) >= {CC.BOILER_MIN_CONVS} AS boilerplate
FROM read_parquet('{transcripts_path}')
WHERE conv_id IS NOT NULL GROUP BY md5(text)
"""


def conv_curate(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.curate_conversations by SHADOWING the
    `documents` view with a rendered-conversations CTE (DuckDB resolves the
    inner replay's FROM documents to the outer CTE), so the entire
    already-verified corpus_curate replay is reused verbatim."""
    return f"""
WITH documents AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({corpus_curate()})
"""


def conv_pack(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.pack_conversations: the documents view is
    shadowed by the rendered-conversations CTE and the verified
    text_pack_shuffled replay is reused verbatim (string keys order
    identically in both engines — plain byte order on ASCII)."""
    return f"""
WITH documents AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({text_pack_shuffled()})
"""


def conv_loss_mask(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.loss_mask_spans: running char-span sum
    over (conv_id, turn_idx)-ordered 'role: text' line lengths."""
    from .extras import convcorpus as CC

    masked = ", ".join("'%s'" % r for r in CC.MASK_ROLES)
    sep = len(CC.TURN_SEP)
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role,
    length(role || ': ' || text)::BIGINT AS len
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL),
s AS (
  SELECT conv_id, turn_idx, role, len,
    COALESCE(sum(len + {sep}) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS span_start
  FROM t)
SELECT conv_id, turn_idx, role, span_start,
  (span_start + len)::BIGINT AS span_end,
  role NOT IN ({masked}) AS trainable
FROM s
"""


def conv_truncate(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.truncate_to_budget: reverse running
    ws-token sum (suffix keep) + min-turn anchor, folded per conversation."""
    from .extras import convcorpus as CC

    return f"""
WITH t AS (
  SELECT conv_id, turn_idx,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS tok
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL),
s AS (
  SELECT conv_id, tok,
    sum(tok) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) <= {CC.CONV_TOKEN_BUDGET}
      AS keep_sfx,
    turn_idx = min(turn_idx) OVER (PARTITION BY conv_id) AS is_head
  FROM t)
SELECT conv_id, count(*)::INT AS n_turns,
  sum((keep_sfx OR is_head)::INT)::INT AS kept_turns,
  COALESCE(sum(tok) FILTER (keep_sfx OR is_head), 0)::BIGINT AS kept_tokens,
  bool_or(is_head AND NOT keep_sfx) AS head_resurrected
FROM s GROUP BY conv_id
"""


def conv_near_dup(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.near_dup_conversations: rendered
    conversations prefix-capped + deterministic ~dup/~near augmentation,
    then the VERIFIED minhash CTE chain reused verbatim over string keys
    (ASCII conv_ids compare identically in both engines)."""
    from .extras import convcorpus as CC

    return f"""
WITH rend AS (
  SELECT conv_id AS doc_id, substring(rendered, 1, {CC.CONV_DEDUP_PREFIX}) AS text
  FROM ({conv_render(transcripts_path)})),
docs AS (
  SELECT doc_id, text FROM rend
  UNION ALL
  SELECT doc_id || '~dup', text FROM rend
  WHERE ('0x'||substring(md5(doc_id),1,6))::BIGINT % {CC.CONV_DUP_MOD} = 0
  UNION ALL
  SELECT doc_id || '~near',
    substring('{CC.CONV_NEAR_HEADER}' || text, 1, {CC.CONV_DEDUP_PREFIX})
  FROM rend
  WHERE ('0x'||substring(md5(doc_id),1,6))::BIGINT % {CC.CONV_NEAR_MOD} = 0),
{_minhash_cte()},
{_minhash_pairs_cte()}
SELECT doc_a, doc_b, sim FROM prs
"""


def conv_sessions(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.session_split: lag gap → running
    gap-count session index → session-local row_number."""
    from .extras import convcorpus as CC

    return f"""
WITH t AS (
  SELECT conv_id, turn_idx,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL),
s AS (
  SELECT conv_id, turn_idx,
    CAST(sum(CASE WHEN gap > {CC.CONV_SESSION_GAP_US} THEN 1 ELSE 0 END) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_idx
  FROM t)
SELECT conv_id, turn_idx,
  conv_id || '#' || session_idx AS session_id, session_idx,
  CAST(row_number() OVER (PARTITION BY conv_id, session_idx ORDER BY turn_idx) - 1 AS INT)
    AS sess_turn_idx
FROM s
"""


def conv_render_sessions(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.render_sessions: the session window then
    an ordered string_agg per (conv_id, session_idx)."""
    from .extras import convcorpus as CC

    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role || ': ' || text AS line,
    epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS gap
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL),
s AS (
  SELECT conv_id, turn_idx, line,
    CAST(sum(CASE WHEN gap > {CC.CONV_SESSION_GAP_US} THEN 1 ELSE 0 END) OVER (
      PARTITION BY conv_id ORDER BY turn_idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_idx
  FROM t),
r AS (
  SELECT conv_id, session_idx, count(*)::INT AS n_turns,
    string_agg(line, '{CC.TURN_SEP}' ORDER BY turn_idx) AS rendered
  FROM s GROUP BY conv_id, session_idx)
SELECT conv_id || '#' || session_idx AS session_id, conv_id, session_idx,
  n_turns, length(rendered)::BIGINT AS n_chars, rendered
FROM r
"""


def conv_tool_pagerank(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.tool_pagerank: the verified tool_flow
    replay supplies edges (UNROUNDED weights recomputed from counts), then
    PAGERANK_ITERS damped power iterations unrolled as MATERIALIZED CTEs.
    Every float literal is cast to DOUBLE (the DECIMAL-parse trap) and
    every mass fold is ORDERED (by src / by tool) to match Spark's
    array_sort + in-order aggregate bit for bit."""
    from .extras import convcorpus as CC

    d = f"({CC.PAGERANK_D}::DOUBLE)"
    sql = f"""
WITH ed AS MATERIALIZED (
  SELECT prev_tool AS src, tool AS dst,
    n_transitions / sum(n_transitions) OVER (PARTITION BY prev_tool) AS w
  FROM ({conv_tool_flow(transcripts_path)})),
nodes AS MATERIALIZED (
  SELECT DISTINCT tool FROM (
    SELECT src AS tool FROM ed UNION ALL SELECT dst AS tool FROM ed)),
nn AS MATERIALIZED (SELECT count(*)::BIGINT AS cnt FROM nodes),
dangling AS MATERIALIZED (
  SELECT tool FROM nodes WHERE tool NOT IN (SELECT DISTINCT src FROM ed)),
r0 AS MATERIALIZED (
  SELECT tool, (1e0 / cnt) AS pr FROM nodes CROSS JOIN nn)"""
    for i in range(1, CC.PAGERANK_ITERS + 1):
        sql += f""",
dg{i} AS MATERIALIZED (
  SELECT COALESCE(list_sum(list(r.pr ORDER BY r.tool)), 0e0) AS dsum
  FROM r{i - 1} r JOIN dangling dd ON dd.tool = r.tool),
c{i} AS MATERIALIZED (
  SELECT e.dst AS tool, list_sum(list(r.pr * e.w ORDER BY e.src)) AS contrib
  FROM ed e JOIN r{i - 1} r ON r.tool = e.src GROUP BY e.dst),
r{i} AS MATERIALIZED (
  SELECT n.tool,
    (1e0 - {d}) / nn.cnt
    + {d} * (dg.dsum / nn.cnt::DOUBLE + COALESCE(c.contrib, 0e0)) AS pr
  FROM nodes n CROSS JOIN nn CROSS JOIN dg{i} dg LEFT JOIN c{i} c USING (tool))"""
    sql += f"""
SELECT tool, round(pr, 12) AS pr,
  CAST(row_number() OVER (ORDER BY pr DESC, tool) AS INT) AS rank
FROM r{CC.PAGERANK_ITERS}
"""
    return sql


def conv_redact(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.redact_turns over augment_turn_pii:
    same bucket hash, same append grammar, same replace ORDER."""
    from .extras import convcorpus as CC
    from .extras import textstats as TSX

    b = "('0x'||substring(md5(conv_id || '#' || turn_idx),1,6))::BIGINT"
    aug = (
        "text"
        f" || CASE WHEN {b} % {CC.CONV_PII_EMAIL_MOD} = 0"
        " THEN ' contact user' || turn_idx || '@example.com' ELSE '' END"
        f" || CASE WHEN {b} % {CC.CONV_PII_PHONE_MOD} = 0"
        " THEN ' call 555-123-4567' ELSE '' END"
    )
    return f"""
WITH a AS (
  SELECT conv_id, turn_idx, {aug} AS t
  FROM read_parquet('{transcripts_path}') WHERE conv_id IS NOT NULL),
r1 AS (SELECT conv_id, turn_idx,
  CAST(len(regexp_extract_all(t, '{TSX.EMAIL_RX}')) AS INT) AS n_emails,
  regexp_replace(t, '{TSX.EMAIL_RX}', '<EMAIL>', 'g') AS t FROM a),
r2 AS (SELECT conv_id, turn_idx, n_emails,
  CAST(len(regexp_extract_all(t, '{TSX.IPV4_RX}')) AS INT) AS n_ips,
  regexp_replace(t, '{TSX.IPV4_RX}', '<IP>', 'g') AS t FROM r1)
SELECT conv_id, turn_idx, n_emails, n_ips,
  CAST(len(regexp_extract_all(t, '{TSX.PHONE_RX}')) AS INT) AS n_phones,
  regexp_replace(t, '{TSX.PHONE_RX}', '<PHONE>', 'g') AS redacted_text
FROM r2
"""


def conv_pack_sessions(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.pack_sessions: the documents view is
    shadowed by the rendered-SESSIONS CTE and the verified shuffled-pack
    replay is reused verbatim (string session_id keys)."""
    return f"""
WITH documents AS (
  SELECT session_id AS doc_id, rendered AS text
  FROM ({conv_render_sessions(transcripts_path)})
)
SELECT * FROM ({text_pack_shuffled()})
"""


def conv_dup_clusters(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.dup_clusters_conversations: transitive
    closure (recursive CTE) over the conv near-dup pair graph, min VARCHAR
    label per component — the same fixpoint min-label propagation reaches."""
    from .extras import convcorpus as CC

    return f"""
WITH RECURSIVE rend AS (
  SELECT conv_id AS doc_id, substring(rendered, 1, {CC.CONV_DEDUP_PREFIX}) AS text
  FROM ({conv_render(transcripts_path)})),
docs AS (
  SELECT doc_id, text FROM rend
  UNION ALL
  SELECT doc_id || '~dup', text FROM rend
  WHERE ('0x'||substring(md5(doc_id),1,6))::BIGINT % {CC.CONV_DUP_MOD} = 0
  UNION ALL
  SELECT doc_id || '~near',
    substring('{CC.CONV_NEAR_HEADER}' || text, 1, {CC.CONV_DEDUP_PREFIX})
  FROM rend
  WHERE ('0x'||substring(md5(doc_id),1,6))::BIGINT % {CC.CONV_NEAR_MOD} = 0),
{_minhash_cte()},
{_minhash_pairs_cte()},
edges AS MATERIALIZED (
  SELECT doc_a AS s, doc_b AS t FROM prs
  UNION
  SELECT doc_b AS s, doc_a AS t FROM prs),
nodes AS MATERIALIZED (SELECT doc_id FROM docs),
reach(s, t) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
)
SELECT s AS doc_id, min(t) AS cluster_id FROM reach GROUP BY s
"""


def conv_vocab_topk(transcripts_path: str, k: int) -> str:
    """Replay of extras.convcorpus.vocab_conversations via documents-view
    shadowing over the verified vocab replay."""
    return f"""
WITH documents AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({text_vocab_topk(k)})
"""


def conv_chunks(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.chunk_conversations via documents-view
    shadowing over the verified sliding-chunk replay."""
    return f"""
WITH documents AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({text_chunk_sliding()})
"""


def conv_len_histogram(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.length_histogram_conversations: the
    documents view is shadowed by rendered conversations with the verified
    langid CASE supplying `lang`, reusing the histogram replay verbatim."""
    from lumbermill_spark.extras import textstats as TSX

    scores = {
        lang: f"len(regexp_extract_all(lower(rendered), '{TSX.stopword_pat(lang)}'))"
        for lang in TSX.LANG_ORDER
    }
    g = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(f"WHEN {scores[lang]} = {g} THEN '{lang}'" for lang in TSX.LANG_ORDER)
    return f"""
WITH documents AS (
  SELECT CASE WHEN {g} = 0 THEN 'und' {whens} ELSE 'und' END AS lang,
    rendered AS text
  FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({corpus_len_histogram()})
"""


def conv_turn_taking(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.turn_taking: lag window + per-conv fold
    (NULL-skipping sum replays Spark's null-equality-skip on the first
    turn; arg_min replays min(struct) under the unique-turn_idx contract)."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role,
    lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL)
SELECT conv_id, count(*)::INT AS n_turns,
  count(DISTINCT turn_idx)::INT AS n_distinct_idx,
  min(turn_idx)::INT AS first_idx, max(turn_idx)::INT AS last_idx,
  COALESCE(sum((role = prev_role)::INT), 0)::BIGINT AS role_repeats,
  -- struct min replays Spark's min(struct(turn_idx, role)) EXACTLY: on a
  -- duplicated turn_idx (the defect this op detects) arg_min(role,
  -- turn_idx) would tie-break arbitrarily, this stays deterministic
  min(struct_pack(a := turn_idx, b := role)).b AS opener_role,
  (count(DISTINCT turn_idx) = count(*)
   AND max(turn_idx) - min(turn_idx) + 1 = count(*)) AS contiguous
FROM t GROUP BY conv_id
"""


def conv_tool_flow(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.tool_flow: per-conversation lag over
    tool-bearing turns, global (prev_tool, tool) counts, 12-dp share."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, tool,
    lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool
  FROM read_parquet('{transcripts_path}')
  WHERE conv_id IS NOT NULL AND tool IS NOT NULL),
c AS (
  SELECT prev_tool, tool, count(*)::BIGINT AS n_transitions
  FROM t WHERE prev_tool IS NOT NULL GROUP BY prev_tool, tool)
SELECT prev_tool, tool, n_transitions,
  round(n_transitions / sum(n_transitions) OVER (PARTITION BY prev_tool), 12) AS frac
FROM c
"""


def sim_pca_project(model_path: str) -> str:
    """Replay of extras.similarity.project_pca from the SAME persisted
    artifact: center by the j=-1 mean row, in-order product sum per
    component, 6-dp round (the verified list_sum ↔ ordered-fold pattern)."""
    return f"""
WITH mu AS (SELECT w AS m FROM read_parquet('{model_path}') WHERE j = -1),
c AS (SELECT j::INT AS j, w FROM read_parquet('{model_path}') WHERE j >= 0),
e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings)
SELECT e.vec_id, c.j,
  round(list_sum([(e.v[i] - mu.m[i]) * c.w[i] FOR i IN range(1, len(c.w) + 1)]), 6) AS comp
FROM e CROSS JOIN mu CROSS JOIN c
"""


def _datacard_body(weights) -> str:
    """The data-card chain FROM an upstream `docs` CTE (doc_id, lang,
    text): inlined split hash, fingerprint-window dup/leak flags,
    per-(lang, split) rollups. The mean quality replays the e6-integer
    trick so the group sum is exact. Shared by the documents-table and
    rendered-conversations replays."""
    w_train, w_val, _ = weights
    cut1 = int(w_train * (1 << 32))
    cut2 = int((w_train + w_val) * (1 << 32))
    length = "greatest(length(text), 1)::DOUBLE"
    ntok_raw = (
        "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    ntok = f"greatest({ntok_raw}, 1)::DOUBLE"
    alpha = f"len(regexp_extract_all(text, '{TS.ALPHA_PAT}')) / {length}"
    punct = f"len(regexp_extract_all(text, '{TS.PUNCT_PAT}')) / {length}"
    stop = f"least(len(regexp_extract_all(lower(text), '{TS.stopword_pat('en')}'))::DOUBLE / {ntok}, 1.0)"
    score = (
        f"0.25 * ({alpha}) + 0.25 * (1.0 - least(({punct}) * 4.0, 1.0))"
        f" + 0.25 * ({stop}) + 0.25 * least({ntok} / 100.0, 1.0)"
    )
    return f"""
b AS (
  SELECT lang,
    CASE WHEN {_split_hash(TS.SPLIT_SALT)} < {cut1} THEN 'train'
         WHEN {_split_hash(TS.SPLIT_SALT)} < {cut2} THEN 'val'
         ELSE 'test' END AS split,
    {ntok_raw} AS nt,
    length(text) AS len,
    round(round({score}, 6) * 1000000, 0)::BIGINT AS q6,
    {FINGERPRINT} AS fp
  FROM docs),
w AS (
  SELECT lang, split, nt, len, q6,
    count(*) OVER (PARTITION BY fp) > 1 AS dup,
    min(split) OVER (PARTITION BY fp) <> max(split) OVER (PARTITION BY fp) AS leak
  FROM b)
SELECT lang, split,
  count(*)::BIGINT AS n_docs,
  sum(nt)::BIGINT AS total_ws_tokens,
  round(quantile_cont(len, 0.5), 6) AS p50_chars,
  round(quantile_cont(len, 0.95), 6) AS p95_chars,
  round(sum(q6) / count(*) / 1000000.0, 6) AS avg_quality,
  sum(dup::INT)::BIGINT AS dup_docs,
  sum(leak::INT)::BIGINT AS leaked_docs
FROM w GROUP BY lang, split
"""


def corpus_datacard(weights=TS.DEFAULT_SPLIT_WEIGHTS) -> str:
    """Replay of extras.textstats.corpus_datacard over the augmented
    corpus."""
    return f"""
WITH {AUG_DOCS},
{_datacard_body(weights)}
"""


def conv_datacard(transcripts_path: str, weights=TS.DEFAULT_SPLIT_WEIGHTS) -> str:
    """Replay of extras.convcorpus.datacard_conversations: rendered
    conversations with the verified langid predictor supplying `lang`,
    feeding the shared data-card body (string conv_id keys)."""
    from lumbermill_spark.extras import textstats as TSX

    scores = {
        lang: f"len(regexp_extract_all(lower(text), '{TSX.stopword_pat(lang)}'))"
        for lang in TSX.LANG_ORDER
    }
    g = "greatest(" + ", ".join(scores.values()) + ")"
    whens = " ".join(f"WHEN {scores[lang]} = {g} THEN '{lang}'" for lang in TSX.LANG_ORDER)
    return f"""
WITH rend AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})),
docs AS (
  SELECT doc_id,
    CASE WHEN {g} = 0 THEN 'und' {whens} ELSE 'und' END AS lang,
    text
  FROM rend),
{_datacard_body(weights)}
"""


def text_bpe_merges() -> str:
    """Replay of extras.textstats.bpe_merges: the merge ROUNDS are unrolled
    into one SQL chain (each round = pair-count CTE → best-pair CTE →
    greedy-parity merge CTEs), so the whole iterative training run is a
    single data-dependent query — no Python state anywhere. The greedy
    left-to-right non-overlap is the same run-parity construction the Spark
    side uses (run id = pos − row_number-among-candidates)."""
    n = TS.BPE_MERGES
    eow = TS.BPE_EOW
    sql = f"""
WITH w0 AS (
  SELECT w, count(*)::BIGINT AS wc FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents)
  GROUP BY w),
s0 AS MATERIALIZED (
  SELECT w, wc, i - 1 AS pos,
    CASE WHEN i <= length(w) THEN w[i] ELSE '{eow}' END AS sym
  FROM w0, unnest(generate_series(1, length(w) + 1)) AS t(i))"""
    # every round CTE is MATERIALIZED: the chain is referenced repeatedly
    # (p by b and c, b by the final union, s by the next round) and DuckDB
    # would otherwise re-inline and re-evaluate the whole prefix per
    # reference — measured 32 s vs ~1 s at sf0.01.
    for r in range(1, n + 1):
        sql += f""",
p{r} AS MATERIALIZED (SELECT *, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM s{r - 1}),
b{r} AS MATERIALIZED (SELECT sym AS l, nxt AS rr, sum(wc)::BIGINT AS cnt FROM p{r}
  WHERE nxt IS NOT NULL GROUP BY sym, nxt ORDER BY cnt DESC, l, rr LIMIT 1),
c{r} AS (SELECT p.*, (p.sym = b.l AND p.nxt = b.rr) AS cand, b.l AS bl, b.rr AS br
  FROM p{r} p CROSS JOIN b{r} b),
g{r} AS (SELECT *, CASE WHEN cand THEN pos - row_number()
    OVER (PARTITION BY w, cand ORDER BY pos) END AS grp FROM c{r}),
h{r} AS (SELECT *, min(CASE WHEN cand THEN pos END)
    OVER (PARTITION BY w, grp) AS run_start FROM g{r}),
k{r} AS (SELECT *, cand AND ((pos - run_start) % 2 = 0) AS kept FROM h{r}),
q{r} AS (SELECT *, COALESCE(lag(kept) OVER (PARTITION BY w ORDER BY pos), FALSE)
    AS consumed FROM k{r}),
s{r} AS MATERIALIZED (SELECT w, wc, row_number() OVER (PARTITION BY w ORDER BY pos) - 1 AS pos,
    CASE WHEN kept THEN bl || br ELSE sym END AS sym
  FROM q{r} WHERE NOT consumed)"""
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, l AS left_sym, rr AS right_sym, cnt AS pair_count,"
        f" l || rr AS token FROM b{r}"
        for r in range(1, n + 1)
    )
    return sql + "\n" + unions


def _memorization_body(weights) -> str:
    """The memorization chain FROM an upstream `docs` CTE (doc_id, text):
    split hash, distinct w-token shingles (the decontaminate formulation),
    md5 digests, held-out hit counts against the train digest set. Shared
    by the documents-table and rendered-conversations replays."""
    from lumbermill_spark.extras import textstats as TSX

    w = TSX.MEMO_SHINGLE_W
    w_train, w_val, _ = weights or TSX.DEFAULT_SPLIT_WEIGHTS
    cut1 = int(w_train * (1 << 32))
    cut2 = int((w_train + w_val) * (1 << 32))
    return f"""
tok AS (
  SELECT doc_id,
    CASE WHEN {_split_hash(TSX.SPLIT_SALT)} < {cut1} THEN 'train'
         WHEN {_split_hash(TSX.SPLIT_SALT)} < {cut2} THEN 'val'
         ELSE 'test' END AS split,
    regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM docs),
sh0 AS (
  SELECT doc_id, split, unnest(list_distinct(
    CASE WHEN len(ts) >= {w}
      THEN [array_to_string(ts[i:i+{w - 1}], ' ') FOR i IN range(1, len(ts) - {w - 2})]
      ELSE [array_to_string(ts, ' ')] END)) AS s
  FROM tok),
sh AS (SELECT doc_id, split, md5(s) AS dig FROM sh0 WHERE s <> ''),
train_digs AS (SELECT DISTINCT dig FROM sh WHERE split = 'train'),
held AS (SELECT * FROM sh WHERE split <> 'train'),
hits AS (
  SELECT h.doc_id, count(DISTINCT h.dig)::BIGINT AS n_seen
  FROM held h JOIN train_digs USING (dig) GROUP BY h.doc_id),
per_doc AS (
  SELECT doc_id, split, count(DISTINCT dig)::BIGINT AS n_shingles
  FROM held GROUP BY doc_id, split)
SELECT p.doc_id, p.split, p.n_shingles,
  coalesce(h.n_seen, 0)::BIGINT AS n_seen,
  round(coalesce(h.n_seen, 0) / greatest(p.n_shingles, 1), 6) AS seen_frac
FROM per_doc p LEFT JOIN hits h USING (doc_id)
"""


def text_memorization(weights=None) -> str:
    """Replay of extras.textstats.memorization_scan over the AUGMENTED
    corpus (exact/near copies land in other splits, so the hit path
    actually fires under the gate)."""
    return f"""
WITH {AUG_DOCS},
{_memorization_body(weights)}
"""


def conv_memorization(transcripts_path: str, weights=None) -> str:
    """Replay of extras.convcorpus.memorization_conversations: the
    AUGMENTED PREFIX-CAPPED rendered conversations (conv_near_dup's docs
    CTE, string keys) feed the same memorization chain."""
    from .extras import convcorpus as CC

    return f"""
WITH rend AS (
  SELECT conv_id AS doc_id, substring(rendered, 1, {CC.CONV_DEDUP_PREFIX}) AS text
  FROM ({conv_render(transcripts_path)})),
docs AS (
  SELECT doc_id, text FROM rend
  UNION ALL
  SELECT doc_id || '~dup', text FROM rend
  WHERE ('0x'||substring(md5(doc_id),1,6))::BIGINT % {CC.CONV_DUP_MOD} = 0
  UNION ALL
  SELECT doc_id || '~near',
    substring('{CC.CONV_NEAR_HEADER}' || text, 1, {CC.CONV_DEDUP_PREFIX})
  FROM rend
  WHERE ('0x'||substring(md5(doc_id),1,6))::BIGINT % {CC.CONV_NEAR_MOD} = 0),
{_memorization_body(weights)}
"""


def conv_bpe(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.bpe_conversations: the documents view is
    shadowed by the rendered-conversations CTE and the verified unrolled
    BPE chain is reused verbatim."""
    return f"""
WITH documents AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({text_bpe_merges()})
"""


def dedup_bloom_prefilter() -> str:
    """Replay of extras.sketch.bloom_prefilter over the augmented corpus
    with the BLOOM_INDEX_MOD split (mod 3 splits every (orig, copy) pair so
    exact membership fires): salted md5 bit positions, all-bits-set
    membership, exact join alongside, false-positive flag."""
    from .extras import sketch as SK

    pos = (
        f"(('0x'||substring(md5('bloom'||i||':'||fingerprint),1,8))::BIGINT"
        f" % {SK.BLOOM_BITS})::INT"
    )
    g = f"(SELECT unnest(generate_series(0,{SK.BLOOM_HASHES - 1})) AS i) g"
    return f"""
WITH {AUG_DOCS},
fps AS (SELECT doc_id, {FINGERPRINT} AS fingerprint FROM docs),
idx AS (SELECT DISTINCT fingerprint FROM fps WHERE doc_id % {SK.BLOOM_INDEX_MOD} = 0),
batch AS (SELECT * FROM fps WHERE doc_id % {SK.BLOOM_INDEX_MOD} <> 0),
bits AS (SELECT DISTINCT {pos} AS pos FROM idx CROSS JOIN {g}),
probes AS (SELECT doc_id, {pos} AS pos FROM batch CROSS JOIN {g}),
hits AS (SELECT doc_id, count(*)::INT AS nset
  FROM probes JOIN bits USING (pos) GROUP BY doc_id),
m AS (SELECT b.doc_id, b.fingerprint,
    COALESCE(h.nset, 0) = {SK.BLOOM_HASHES} AS bloom_member
  FROM batch b LEFT JOIN hits h USING (doc_id))
SELECT m.doc_id, m.bloom_member,
  (i.fingerprint IS NOT NULL) AS exact_member,
  (m.bloom_member AND i.fingerprint IS NULL) AS false_positive
FROM m LEFT JOIN idx i USING (fingerprint)
"""


def corpus_weighted_sample() -> str:
    """Replay of extras.textstats.weighted_sample: hash-uniform u, key =
    u^(1/quality), top-k per language (1e-6 written as a scientific literal
    so DuckDB parses DOUBLE, not DECIMAL — the trigram lesson)."""
    length = "greatest(length(text), 1)::DOUBLE"
    ntok = (
        "greatest(CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END, 1)::DOUBLE"
    )
    alpha = f"len(regexp_extract_all(text, '{TS.ALPHA_PAT}')) / {length}"
    punct = f"len(regexp_extract_all(text, '{TS.PUNCT_PAT}')) / {length}"
    stop = f"least(len(regexp_extract_all(lower(text), '{TS.stopword_pat('en')}'))::DOUBLE / {ntok}, 1.0)"
    score = (
        f"0.25 * ({alpha}) + 0.25 * (1.0 - least(({punct}) * 4.0, 1.0))"
        f" + 0.25 * ({stop}) + 0.25 * least({ntok} / 100.0, 1.0)"
    )
    return f"""
WITH b AS (
  SELECT doc_id, lang, round({score}, 6) AS quality_score,
    (('0x'||substring(md5('{TS.WSAMPLE_SALT}:'||doc_id),1,8))::BIGINT)::DOUBLE
      / 4294967296.0 AS u
  FROM documents),
kk AS (
  SELECT doc_id, lang, quality_score,
    round(pow(u, 1.0 / greatest(quality_score, 1e-6)), 12) AS sample_key
  FROM b),
r AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY lang ORDER BY sample_key DESC, doc_id) AS INT) AS rank
  FROM kk)
SELECT doc_id, lang, quality_score, sample_key, rank
FROM r WHERE rank <= {TS.WSAMPLE_K}
"""


def text_hll_distinct() -> str:
    """Replay of extras.sketch.hll_distinct: md5 32-bit hashes, low-P-bit
    bucket, leading-zero rank, ordered register fold, the alpha*m^2/hsum
    estimate with linear-counting small-range correction."""
    from .extras import sketch as SK

    m = float(SK.HLL_REGISTERS)
    p = SK.HLL_P
    return f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
hh AS (SELECT ('0x'||substring(md5(token),1,8))::BIGINT AS h FROM tok),
d AS (SELECT (h % {SK.HLL_REGISTERS})::INT AS bucket, h >> {p} AS rest FROM hh),
rk AS (SELECT bucket,
  CASE WHEN rest = 0 THEN {32 - p + 1}
       ELSE {32 - p} - floor(log2(rest)) END AS rank FROM d),
regs AS (SELECT bucket, max(rank)::INT AS reg FROM rk GROUP BY bucket),
fl AS (SELECT count(*) AS n_filled,
  list_sum(list_transform(list(reg ORDER BY bucket), r -> pow(2.0, -r))) AS hsum_filled
  FROM regs),
ex AS (SELECT count(DISTINCT token)::BIGINT AS exact_distinct FROM tok),
calc AS (
  SELECT n_filled, exact_distinct,
    ({m} - n_filled)::DOUBLE AS n_empty,
    hsum_filled + ({m} - n_filled)::DOUBLE AS hsum
  FROM fl CROSS JOIN ex),
est AS (
  SELECT exact_distinct,
    round(CASE WHEN (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} / hsum <= 2.5 * {m}
                AND n_empty > 0
          THEN {m} * ln({m} / n_empty)
          ELSE (0.7213 / (1.0 + 1.079 / {m})) * {m} * {m} / hsum END, 6) AS estimate
  FROM calc)
SELECT {SK.HLL_REGISTERS}::INT AS n_registers, estimate, exact_distinct,
  round(abs(estimate - exact_distinct) / greatest(exact_distinct, 1)::DOUBLE, 6) AS err_frac
FROM est
"""


def corpus_len_histogram() -> str:
    """Replay of extras.textstats.length_histogram: floor(log2) buckets,
    per-language share."""
    return """
WITH b AS (
  SELECT lang,
    CASE WHEN length(text) <= 0 THEN -1
         ELSE floor(log2(length(text)::DOUBLE))::INT END AS bucket
  FROM documents),
c AS (SELECT lang, bucket, count(*)::BIGINT AS n_docs FROM b GROUP BY lang, bucket)
SELECT lang, bucket, n_docs,
  round(n_docs / sum(n_docs) OVER (PARTITION BY lang), 12) AS lang_frac
FROM c
"""


def text_tfidf_topk() -> str:
    """Replay of extras.textstats.tfidf_keywords: per-doc term counts,
    corpus document frequency, tf · ln(N/df), doc-partitioned top-k."""
    from .extras import textstats as TSX

    return f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
tf AS (SELECT doc_id, token, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, token),
dfreq AS (SELECT token, count(DISTINCT doc_id)::BIGINT AS df FROM tf GROUP BY token),
nn AS (SELECT count(DISTINCT doc_id)::BIGINT AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
    round(tf.tf::DOUBLE * ln(nn.n::DOUBLE / dfreq.df::DOUBLE), 6) AS score
  FROM tf JOIN dfreq USING (token) CROSS JOIN nn),
r AS (SELECT *, CAST(row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token) AS INT) AS rank FROM scored)
SELECT doc_id, token, tf, df, score, rank FROM r WHERE rank <= {TSX.TFIDF_TOPK}
"""


def text_pmi_topk() -> str:
    """Replay of extras.textstats.pmi_collocations: bigram + unigram
    counts, marginal joins, ln of the same ratio shape, global top-k."""
    from .extras import textstats as TSX

    return f"""
WITH w AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
  FROM documents WHERE trim(text) <> ''),
tok AS (SELECT unnest(ws) AS tok FROM w),
uni AS (SELECT tok, count(*)::BIGINT AS c1 FROM tok GROUP BY tok),
nt AS (SELECT sum(c1)::BIGINT AS n FROM uni),
g AS (
  SELECT ws[i] AS x, ws[i+1] AS y
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS t(i)
  WHERE len(ws) >= 2),
pairs AS (
  SELECT x, y, count(*)::BIGINT AS pair_n FROM g GROUP BY x, y
  HAVING count(*) >= {TSX.PMI_MIN_PAIR}),
pt AS (SELECT count(*)::BIGINT AS p FROM g),
scored AS (
  SELECT pairs.x, pairs.y, pairs.pair_n,
    round(ln((pair_n::DOUBLE / pt.p::DOUBLE)
             / ((ux.c1::DOUBLE / nt.n::DOUBLE) * (uy.c1::DOUBLE / nt.n::DOUBLE))), 6) AS pmi
  FROM pairs
  JOIN uni ux ON ux.tok = pairs.x
  JOIN uni uy ON uy.tok = pairs.y
  CROSS JOIN nt CROSS JOIN pt),
r AS (SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, x, y) AS INT) AS rank
      FROM scored ORDER BY pmi DESC, x, y LIMIT {TSX.PMI_TOPK})
SELECT x, y, pair_n, pmi, rank FROM r
"""


def corpus_zipf() -> str:
    """Replay of extras.textstats.zipf_fit: top-k ranks, rank-ORDERED sum
    folds, the same closed-form least-squares shapes."""
    from .extras import textstats as TSX

    k = TSX.ZIPF_TOPK
    return f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
counts AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
top AS (SELECT token, c, row_number() OVER (ORDER BY c DESC, token) AS rank
        FROM counts ORDER BY c DESC, token LIMIT {k}),
pts AS (SELECT rank, ln(rank::DOUBLE) AS x, ln(c::DOUBLE) AS y FROM top),
arr AS (SELECT list(struct_pack(r := rank, x := x, y := y) ORDER BY rank) AS ps FROM pts),
s AS (SELECT len(ps)::DOUBLE AS n,
  list_sum(list_transform(ps, p -> p.x)) AS sx,
  list_sum(list_transform(ps, p -> p.y)) AS sy,
  list_sum(list_transform(ps, p -> p.x * p.y)) AS sxy,
  list_sum(list_transform(ps, p -> p.x * p.x)) AS sxx,
  list_sum(list_transform(ps, p -> p.y * p.y)) AS syy
  FROM arr)
SELECT n::INT AS k,
  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


def text_cms_topk() -> str:
    """Replay of extras.sketch.cms_topk: the md5-salted hash family rebuilds
    the sketch CELL FOR CELL; min-over-rows estimates, (est DESC, token)
    rank, top-K with the exact count alongside."""
    from .extras import sketch as SK

    bucket = (
        f"(('0x'||substring(md5('cms'||r||':'||token),1,8))::BIGINT % {SK.CMS_WIDTH})::INT"
    )
    rs = f"(SELECT unnest(generate_series(0,{SK.CMS_DEPTH - 1})) AS r) rs"
    return f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
cells AS (
  SELECT r, bucket, count(*)::BIGINT AS cnt FROM (
    SELECT r, {bucket} AS bucket FROM tok CROSS JOIN {rs})
  GROUP BY r, bucket),
exact AS (SELECT token, count(*)::BIGINT AS exact_cnt FROM tok GROUP BY token),
probes AS (
  SELECT token, exact_cnt, r, {bucket} AS bucket
  FROM exact CROSS JOIN {rs}),
est AS (
  SELECT token, exact_cnt, min(cnt)::BIGINT AS est_cnt
  FROM probes JOIN cells USING (r, bucket) GROUP BY token, exact_cnt),
ranked AS (
  SELECT token, est_cnt, exact_cnt, est_cnt > exact_cnt AS overestimated,
    row_number() OVER (ORDER BY est_cnt DESC, token) AS rk
  FROM est)
SELECT token, est_cnt, exact_cnt, overestimated, CAST(rk AS INT) AS rank
FROM ranked WHERE rk <= {SK.CMS_TOPK}
"""


def text_vocab_topk(k: int) -> str:
    """Replay of extras.textstats.vocab_topk: counts → top-K by (count
    DESC, token) → K-bounded cumulative coverage window."""
    return f"""
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
counts AS (SELECT token, count(*) AS c FROM tok GROUP BY token),
tot AS (SELECT sum(c) AS t FROM counts),
top AS (SELECT token, c FROM counts ORDER BY c DESC, token LIMIT {k})
SELECT
  CAST(row_number() OVER (ORDER BY c DESC, token) AS INT) AS rank,
  token,
  c::BIGINT AS count,
  round(c / t, 6) AS frac,
  round(sum(c) OVER (ORDER BY c DESC, token
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / t, 6) AS cum_frac
FROM top CROSS JOIN tot
"""


def text_trigram_logprob(vocab_k: int) -> str:
    """Replay of extras.textstats.trigram_logprob: TRAIN/HELDOUT hash split,
    <s> <s> padding, <unk> collapse against the TRAIN top-K vocab, stupid
    backoff c3/ctx3 -> a*c2/ctx2 -> a^2*(c1+1)/(N+V) with a cast to DOUBLE
    (DuckDB would otherwise parse 0.4 as DECIMAL and skew the arithmetic),
    12-dp per-token rounding before the mean."""
    a = f"CAST({TS.TRI_ALPHA!r} AS DOUBLE)"
    cut = int(TS.TRI_TRAIN_FRAC * (1 << 32))
    coll = lambda c: (
        f"CASE WHEN {c} = '{TS.BOS}' THEN '{TS.BOS}' "
        f"WHEN {c} IN (SELECT tok FROM vocab) THEN {c} ELSE '{TS.UNK}' END"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, {_split_hash(TS.TRI_SALT)} < {cut} AS is_train,
    CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(lower(text)), '\\s+') END AS ts
  FROM documents),
ev AS (
  SELECT doc_id, is_train,
    CASE WHEN i <= 2 THEN '{TS.BOS}' ELSE ts[i - 2] END AS p2,
    CASE WHEN i <= 1 THEN '{TS.BOS}' ELSE ts[i - 1] END AS p1,
    ts[i] AS cur
  FROM tok, unnest(generate_series(1, len(ts))) u(i)),
vocab AS (
  SELECT cur AS tok FROM ev WHERE is_train GROUP BY cur
  ORDER BY count(*) DESC, cur LIMIT {vocab_k}),
vm AS (SELECT count(*) + 1 AS v FROM vocab),
m AS (
  SELECT doc_id, is_train, {coll('p2')} AS p2, {coll('p1')} AS p1,
    {coll('cur')} AS cur
  FROM ev),
c3 AS (SELECT p2, p1, cur, count(*)::BIGINT AS c3 FROM m WHERE is_train GROUP BY 1, 2, 3),
t3 AS (SELECT p2, p1, sum(c3)::BIGINT AS t3 FROM c3 GROUP BY 1, 2),
c2 AS (SELECT p1, cur, count(*)::BIGINT AS c2 FROM m WHERE is_train GROUP BY 1, 2),
t2 AS (SELECT p1, sum(c2)::BIGINT AS t2 FROM c2 GROUP BY 1),
c1 AS (SELECT cur, count(*)::BIGINT AS c1 FROM m WHERE is_train GROUP BY 1),
nt AS (SELECT count(*)::BIGINT AS n FROM m WHERE is_train),
s AS (
  SELECT h.doc_id, count(*) AS nt_,
    sum(CASE WHEN h.cur = '{TS.UNK}' THEN 1 ELSE 0 END) AS nu,
    sum(CASE WHEN c3.c3 IS NOT NULL THEN 1 ELSE 0 END) AS l3,
    sum(CASE WHEN c3.c3 IS NULL AND c2.c2 IS NOT NULL THEN 1 ELSE 0 END) AS l2,
    sum(CASE WHEN c3.c3 IS NULL AND c2.c2 IS NULL THEN 1 ELSE 0 END) AS l1,
    avg(round(ln(
      CASE WHEN c3.c3 IS NOT NULL THEN c3.c3 / t3.t3
           WHEN c2.c2 IS NOT NULL THEN {a} * c2.c2 / t2.t2
           ELSE {a} * {a} * (coalesce(c1.c1, 0) + 1) / (nt.n + vm.v) END), 12)) AS alp
  FROM m h
  LEFT JOIN c3 ON h.p2 = c3.p2 AND h.p1 = c3.p1 AND h.cur = c3.cur
  LEFT JOIN t3 ON h.p2 = t3.p2 AND h.p1 = t3.p1
  LEFT JOIN c2 ON h.p1 = c2.p1 AND h.cur = c2.cur
  LEFT JOIN t2 ON h.p1 = t2.p1
  LEFT JOIN c1 ON h.cur = c1.cur
  CROSS JOIN nt CROSS JOIN vm
  WHERE NOT h.is_train
  GROUP BY h.doc_id)
SELECT d.doc_id,
  coalesce(nt_, 0)::INT AS n_tokens, coalesce(nu, 0)::INT AS n_unk,
  coalesce(l3, 0)::INT AS n_tri, coalesce(l2, 0)::INT AS n_bi,
  coalesce(l1, 0)::INT AS n_uni, round(alp, 6) AS avg_logprob
FROM (SELECT doc_id FROM tok WHERE NOT is_train) d LEFT JOIN s USING (doc_id)
"""


def dedup_semdedup() -> str:
    """Replay of extras.dedup.semdedup: augmented embeddings, nearest-1 cell
    under the deterministic first-16 quantizer, within-cell order by
    (centroid-sim ASC, vec_id ASC), drop when max cosine to any earlier cell
    member >= threshold (the paper's pseudo-greedy rule)."""
    cos_vc = _cos("e.v", "c.cv")
    return f"""
WITH base AS (
  SELECT vec_id, label, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings
),
e AS (
  SELECT * FROM base
  UNION ALL
  SELECT vec_id + {D.EMBED_EXACT_OFFSET}, label, v
  FROM base WHERE vec_id % {D.EMBED_EXACT_MOD} = 0
  UNION ALL
  SELECT vec_id + {D.EMBED_NEAR_OFFSET}, label,
    list_concat([v[1] + {D.EMBED_PERTURB}], v[2:])
  FROM base WHERE vec_id % {D.EMBED_NEAR_MOD} = 0
),
c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {SIM.IVF_CENTROIDS}),
ca AS (  -- nearest-1 cell + centroid similarity
  SELECT vec_id, v, cid, csim FROM (
    SELECT e.vec_id, e.v, c.cid, {cos_vc} AS csim,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c) WHERE r = 1),
o AS (
  SELECT vec_id, v, cid,
    row_number() OVER (PARTITION BY cid ORDER BY csim ASC, vec_id ASC) AS idx
  FROM ca),
pri AS (
  SELECT x.vec_id, max({_cos('x.v', 'y.v')}) AS mps
  FROM o x JOIN o y ON x.cid = y.cid AND y.idx < x.idx
  GROUP BY x.vec_id)
SELECT o.vec_id, o.cid, CAST(o.idx AS INT) AS cell_rank,
  round(pri.mps, 6) AS max_prior_sim,
  (coalesce(pri.mps, -1.0) < {D.SEMDEDUP_THRESHOLD}) AS keep
FROM o LEFT JOIN pri USING (vec_id)
"""


def text_blocklist() -> str:
    """Replay of extras.textstats.augment_urls + blocklist_filter: same CASE
    url precedence, host extraction, ≤MAX_HOST_DEPTH label-suffix expansion,
    and exact-vs-suffix entry semantics (depth cap from the short end;
    exact = full-host equality)."""
    bl_rows = ",".join(
        [f"('{e}','exact')" for e in sorted(TS.BLOCK_EXACT)]
        + [f"('{s}','suffix')" for s in sorted(TS.BLOCK_SUFFIX)]
    )
    return f"""
WITH u AS (
  SELECT doc_id,
    CASE WHEN doc_id % {TS.URL_SPAM_MOD} = 0
           THEN 'https://spam.example.com/p/' || doc_id
         WHEN doc_id % {TS.URL_TRACKER_MOD} = 0
           THEN 'https://cdn' || (doc_id % 4) || '.tracker.example/x/' || doc_id
         WHEN doc_id % {TS.URL_MALWARE_MOD} = 0
           THEN 'http://malware.example.net/dl/' || doc_id
         ELSE 'https://site' || (doc_id % 50) || '.example.org/p/' || doc_id
    END AS url
  FROM documents),
b AS (
  SELECT doc_id, url, lower(regexp_extract(url, '^[a-z]+://([^/]+)', 1)) AS host
  FROM u),
bl(entry, kind) AS (SELECT * FROM (VALUES {bl_rows})),
cand AS (
  SELECT doc_id, host,
    array_to_string(string_split(host, '.')[i:], '.') AS cand
  FROM b, unnest(generate_series(
    greatest(1, len(string_split(host, '.')) - {TS.MAX_HOST_DEPTH} + 1),
    len(string_split(host, '.')))) u(i)),
hits AS (
  SELECT doc_id, min(entry) AS reason
  FROM cand JOIN bl ON cand.cand = bl.entry
    AND (bl.kind = 'suffix' OR cand.cand = cand.host)
  GROUP BY doc_id)
SELECT b.doc_id, b.url, b.host,
  (reason IS NOT NULL) AS blocked, reason
FROM b LEFT JOIN hits USING (doc_id)
"""


def corpus_temperature() -> str:
    """Replay of extras.textstats.temperature_sample: per-stratum counts,
    frac_s = round((n_min/n_s)^(1-alpha), 12) (the normalizer cancels — see
    the Spark docstring), md5 hash cutoff on doc_id."""
    exp = repr(1.0 - TS.TEMP_ALPHA)
    return f"""
WITH c AS (SELECT lang, count(*)::BIGINT AS n_s FROM documents GROUP BY lang),
mn AS (SELECT min(n_s) AS n_min FROM c),
f AS (SELECT lang, round(pow(n_min / n_s, {exp}), 12) AS frac
      FROM c CROSS JOIN mn)
SELECT d.doc_id, d.lang
FROM documents d JOIN f USING (lang)
WHERE ('0x' || substr(md5('{TS.TEMP_SALT}' || ':' || d.doc_id::VARCHAR), 1, 8))::BIGINT
      < frac * 4294967296.0
"""


def dedup_substring() -> str:
    """Replay of extras.dedup.duplicate_spans over the line-augmented
    documents: K-token shingle digests, cross-doc duplicated digests,
    interval union of hit windows via the same running-max island rule
    (pure integer arithmetic on both engines)."""
    k = D.SPAN_K
    aug = (
        "concat_ws(chr(10), "
        f"CASE WHEN doc_id % {TS.LINE_NAV_MOD} = 0 THEN '{TS.BOILER_NAV}' END, "
        "text, "
        f"CASE WHEN doc_id % {TS.LINE_NEWS_MOD} = 0 THEN '{TS.BOILER_NEWS}' END, "
        f"CASE WHEN doc_id % {TS.LINE_COOKIE_MOD} = 0 THEN '{TS.BOILER_COOKIE}' END, "
        "'ref ' || doc_id)"
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS t FROM documents),
tk AS (
  SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ts
  FROM a WHERE trim(t) <> ''),
sh AS (
  SELECT doc_id, i AS start, i + {k - 1} AS fin,
    md5(array_to_string(ts[i:i+{k - 1}], ' ')) AS dig
  FROM tk, unnest(generate_series(1, len(ts) - {k - 1})) u(i)
  WHERE len(ts) >= {k}),
dup AS (
  SELECT dig FROM sh GROUP BY dig
  HAVING count(DISTINCT doc_id) >= {D.SPAN_MIN_DOCS}),
hits AS (SELECT doc_id, start, fin FROM sh JOIN dup USING (dig)),
pe AS (
  SELECT doc_id, start, fin,
    max(fin) OVER (PARTITION BY doc_id ORDER BY start
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hits),
isl AS (
  SELECT doc_id, start, fin,
    sum(CASE WHEN prev_end IS NULL OR start > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY start) AS island
  FROM pe)
SELECT doc_id,
  min(start)::INT AS span_start, max(fin)::INT AS span_end,
  (max(fin) - min(start) + 1)::INT AS span_tokens
FROM isl GROUP BY doc_id, island
"""


def dedup_substring_removal() -> str:
    """Replay of extras.dedup.remove_duplicate_spans: the dedup_substring
    span chain, spans folded per doc, tokens outside every span rejoined
    single-spaced (list comprehension over 1-based positions)."""
    k = D.SPAN_K
    aug = (
        "concat_ws(chr(10), "
        f"CASE WHEN doc_id % {TS.LINE_NAV_MOD} = 0 THEN '{TS.BOILER_NAV}' END, "
        "text, "
        f"CASE WHEN doc_id % {TS.LINE_NEWS_MOD} = 0 THEN '{TS.BOILER_NEWS}' END, "
        f"CASE WHEN doc_id % {TS.LINE_COOKIE_MOD} = 0 THEN '{TS.BOILER_COOKIE}' END, "
        "'ref ' || doc_id)"
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS t FROM documents),
tk AS (
  SELECT doc_id, regexp_split_to_array(trim(t), '\\s+') AS ts
  FROM a WHERE trim(t) <> ''),
sh AS (
  SELECT doc_id, i AS start, i + {k - 1} AS fin,
    md5(array_to_string(ts[i:i+{k - 1}], ' ')) AS dig
  FROM tk, unnest(generate_series(1, len(ts) - {k - 1})) u(i)
  WHERE len(ts) >= {k}),
dup AS (
  SELECT dig FROM sh GROUP BY dig
  HAVING count(DISTINCT doc_id) >= {D.SPAN_MIN_DOCS}),
hits AS (SELECT doc_id, start, fin FROM sh JOIN dup USING (dig)),
pe AS (
  SELECT doc_id, start, fin,
    max(fin) OVER (PARTITION BY doc_id ORDER BY start
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM hits),
isl AS (
  SELECT doc_id, start, fin,
    sum(CASE WHEN prev_end IS NULL OR start > prev_end + 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY start) AS island
  FROM pe),
sp AS (
  SELECT doc_id, min(start) AS s, max(fin) AS e
  FROM isl GROUP BY doc_id, island),
pd AS (
  SELECT doc_id, list(struct_pack(s := s, e := e)) AS spans,
    sum(e - s + 1) AS nd
  FROM sp GROUP BY doc_id),
full_tk AS (
  SELECT doc_id,
    CASE WHEN trim(t) = '' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(t), '\\s+') END AS ts
  FROM a)
SELECT f.doc_id,
  len(f.ts)::INT AS n_tokens,
  coalesce(pd.nd, 0)::INT AS n_dup_tokens,
  CASE WHEN pd.spans IS NULL THEN array_to_string(f.ts, ' ')
       ELSE array_to_string(
         [f.ts[i] FOR i IN generate_series(1, len(f.ts))
          IF len(list_filter(pd.spans, sp -> i >= sp.s AND i <= sp.e)) = 0],
         ' ')
  END AS clean_text
FROM full_tk f LEFT JOIN pd USING (doc_id)
"""


def corpus_prepare() -> str:
    """Replay of extras.textstats.corpus_prepare: the corpus_curate
    composition + the normalized-fingerprint canonicality window + the
    integer-cutoff split, all per doc."""
    n_ws, reasons, keep = _curate_fragments()
    w_train, w_val, _ = TS.DEFAULT_SPLIT_WEIGHTS
    cut1 = int(w_train * (1 << 32))
    cut2 = int((w_train + w_val) * (1 << 32))
    sh = _split_hash(TS.SPLIT_SALT).replace("doc_id", "t.doc_id")
    return f"""
WITH q AS ({text_quality()}),
r AS ({text_repetition()}),
l AS ({text_langid()}),
t AS (SELECT doc_id, {n_ws} AS n_ws FROM documents),
canon AS (
  SELECT doc_id,
    (doc_id = min(doc_id) OVER (PARTITION BY nfp)) AS is_canonical
  FROM (SELECT doc_id,
          md5(trim(regexp_replace(lower(text), '{D.NORM_PAT}', ' ', 'g'))) AS nfp
        FROM documents))
SELECT t.doc_id,
  CAST(t.n_ws AS INT) AS n_ws_tokens,
  q.quality_score,
  l.pred_lang,
  canon.is_canonical,
  ({keep}) AS curate_keep,
  regexp_replace({reasons}, ',$', '') AS reasons,
  CASE WHEN {sh} < {cut1} THEN 'train'
       WHEN {sh} < {cut2} THEN 'val'
       ELSE 'test' END AS split,
  (canon.is_canonical AND ({keep})) AS keep
FROM t JOIN q ON q.doc_id = t.doc_id
JOIN r ON r.doc_id = t.doc_id
JOIN l ON l.doc_id = t.doc_id
JOIN canon ON canon.doc_id = t.doc_id
"""


def text_gopher() -> str:
    """Replay of extras.textstats.augment_gopher + gopher_rules: same
    augmentation grid, signal definitions, thresholds, fixed-order reason
    string."""
    stops = ", ".join(f"'{s}'" for s in TS.GOPHER_STOPWORDS)
    checks = [
        ("too_few_words", f"n_words < {TS.GOPHER_MIN_WORDS}"),
        ("too_many_words", f"n_words > {TS.GOPHER_MAX_WORDS}"),
        (
            "bad_mean_word_length",
            f"(coalesce(mwl, 0) < {TS.GOPHER_MIN_MEAN_WORD_LEN!r}"
            f" OR coalesce(mwl, 0) > {TS.GOPHER_MAX_MEAN_WORD_LEN!r})",
        ),
        ("too_many_symbols", f"coalesce(sr, 0) > {TS.GOPHER_MAX_SYMBOL_RATIO!r}"),
        ("too_many_bullets", f"bf > {TS.GOPHER_MAX_BULLET_FRAC!r}"),
        ("too_many_ellipses", f"ef > {TS.GOPHER_MAX_ELLIPSIS_FRAC!r}"),
        ("too_few_alpha_words", f"coalesce(af, 0) < {TS.GOPHER_MIN_ALPHA_FRAC!r}"),
        ("too_few_stopwords", f"n_stop < {TS.GOPHER_MIN_STOPWORDS}"),
    ]
    reasons = " || ".join(f"CASE WHEN {c} THEN '{n},' ELSE '' END" for n, c in checks)
    keep = " AND ".join(f"NOT ({c})" for _, c in checks)
    return f"""
WITH a AS (
  SELECT doc_id,
    (CASE WHEN doc_id % {TS.GOPHER_BULLET_MOD} = 0
          THEN '- item one' || chr(10) || '- item two' || chr(10) ELSE '' END)
    || (CASE WHEN doc_id % {TS.GOPHER_STOP_MOD} = 0
             THEN '{TS.GOPHER_STOP_LINE}' || chr(10) ELSE '' END)
    || text
    || (CASE WHEN doc_id % {TS.GOPHER_ELLIPSIS_MOD} = 0
             THEN chr(10) || 'read more...' ELSE '' END)
    || (CASE WHEN doc_id % {TS.GOPHER_SYMBOL_MOD} = 0
             THEN ' ### #### #####' ELSE '' END) AS t
  FROM documents),
w AS (
  SELECT doc_id, t,
    CASE WHEN trim(t) = '' THEN CAST([] AS VARCHAR[])
         ELSE regexp_split_to_array(trim(t), '\\s+') END AS ws,
    string_split(t, chr(10)) AS lines
  FROM a),
m AS (
  SELECT doc_id,
    len(ws) AS n_words,
    CASE WHEN len(ws) > 0
         THEN list_sum(list_transform(ws, x -> length(x))) / len(ws) END AS mwl,
    CASE WHEN len(ws) > 0
         THEN (len(regexp_extract_all(t, '#'))
             + len(regexp_extract_all(t, '\\.\\.\\.'))) / len(ws) END AS sr,
    len(list_filter(lines, l -> l LIKE '- %' OR l LIKE '• %')) / len(lines) AS bf,
    len(list_filter(lines, l -> l LIKE '%...')) / len(lines) AS ef,
    CASE WHEN len(ws) > 0
         THEN len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) / len(ws) END AS af,
    len(list_intersect(list_distinct(list_transform(ws, x -> lower(x))),
                       [{stops}])) AS n_stop
  FROM w)
SELECT doc_id,
  n_words::INT AS n_words,
  round(mwl, 6) AS mean_word_len,
  round(sr, 6) AS symbol_ratio,
  round(bf, 6) AS bullet_frac,
  round(ef, 6) AS ellipsis_frac,
  round(af, 6) AS alpha_frac,
  n_stop::INT AS n_stopwords,
  ({keep}) AS keep,
  regexp_replace({reasons}, ',$', '') AS reasons
FROM m
"""


def conv_prepare(transcripts_path: str) -> str:
    """Replay of extras.convcorpus.prepare_conversations: the documents view
    is shadowed by the rendered-conversations CTE and the verified
    corpus_prepare replay is reused verbatim."""
    return f"""
WITH documents AS (
  SELECT conv_id AS doc_id, rendered AS text FROM ({conv_render(transcripts_path)})
)
SELECT * FROM ({corpus_prepare()})
"""


def text_c4() -> str:
    """Replay of extras.textstats.augment_c4 + c4_clean: same grids, same
    line keep-rule (terminal punctuation, ≥5 words, no javascript), same
    page rules (≥3 kept lines, no lorem ipsum, no brace)."""
    sents = [
        (TS.C4_SENT_MODS[0], "This line has more than five words here."),
        (TS.C4_SENT_MODS[1], "Another proper sentence with enough words too."),
        (TS.C4_SENT_MODS[2], "A third full sentence appears in this document."),
    ]
    aug = "text"
    for mod, line in sents:
        aug += f" || (CASE WHEN doc_id % {mod} = 0 THEN chr(10) || '{line}' ELSE '' END)"
    aug += (
        f" || (CASE WHEN doc_id % {TS.C4_JS_MOD} = 0"
        " THEN chr(10) || 'please enable javascript to view this page.' ELSE '' END)"
        f" || (CASE WHEN doc_id % {TS.C4_LOREM_MOD} = 0"
        " THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END)"
        f" || (CASE WHEN doc_id % {TS.C4_BRACE_MOD} = 0 THEN ' {{' ELSE '' END)"
    )
    line_keep = (
        "l -> trim(l) <> '' AND regexp_matches(trim(l), '[.!?\"]$')"
        f" AND len(regexp_split_to_array(trim(l), '\\s+')) >= {TS.C4_MIN_LINE_WORDS}"
        " AND NOT contains(lower(trim(l)), 'javascript')"
    )
    return f"""
WITH a AS (SELECT doc_id, {aug} AS t FROM documents),
w AS (
  SELECT doc_id, string_split(t, chr(10)) AS lines,
    contains(lower(t), 'lorem ipsum') AS has_lorem,
    contains(t, '{{') AS has_brace
  FROM a),
m AS (
  SELECT doc_id, len(lines) AS n_lines,
    list_filter(lines, {line_keep}) AS kept,
    has_lorem, has_brace
  FROM w)
SELECT doc_id,
  n_lines::INT AS n_lines,
  len(kept)::INT AS n_kept_lines,
  has_lorem, has_brace,
  (len(kept) >= {TS.C4_MIN_KEPT_LINES} AND NOT has_lorem AND NOT has_brace) AS keep,
  coalesce(array_to_string(kept, chr(10)), '') AS clean_text
FROM m
"""


def sim_pq_topk(codebooks_path: str) -> str:
    """Replay of extras.similarity.topk_pq from the same persisted PQ
    codebooks: per-subspace argmin encode (fixed-order squared distances,
    bit-identical), ADC LUT join, 6-dp-rounded grouped fold, top-k."""
    ds = SIM.PQ_DS
    dist_e = (
        f"list_sum([(e.v[cb.m * {ds} + i] - cb.cv[i]) * (e.v[cb.m * {ds} + i] - cb.cv[i]) "
        f"FOR i IN range(1, {ds + 1})])"
    )
    dist_q = (
        f"list_sum([(q.v[cb.m * {ds} + i] - cb.cv[i]) * (q.v[cb.m * {ds} + i] - cb.cv[i]) "
        f"FOR i IN range(1, {ds + 1})])"
    )
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
cb AS (SELECT m, cid, cv FROM read_parquet('{codebooks_path}')),
enc AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT e.vec_id, cb.m, cb.cid,
      row_number() OVER (PARTITION BY e.vec_id, cb.m
        ORDER BY {dist_e} ASC, cb.cid ASC) AS r
    FROM e, cb) WHERE r = 1),
q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < {SIM.N_QUERIES_PQ}),
lut AS (SELECT q.query_id, cb.m, cb.cid AS code, {dist_q} AS d FROM q, cb),
s AS (
  SELECT lut.query_id, enc.vec_id AS neighbor_id, round(sum(lut.d), 6) AS adc_dist
  FROM enc JOIN lut ON enc.m = lut.m AND enc.code = lut.code
  WHERE enc.vec_id <> lut.query_id
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY adc_dist ASC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, adc_dist
FROM r WHERE rank <= {SIM.PQ_TOPK}
"""


def sim_ivfpq_topk(centroids_path: str, codebooks_path: str) -> str:
    """Replay of extras.similarity.topk_ivfpq from the same two persisted
    artifacts: cosine nearest-1 coarse assignment (as sim_ivf_trained),
    residual PQ encode, per-(query, probed-cell) residual LUT, 6-dp-rounded
    ADC fold, top-k."""
    ds = SIM.PQ_DS
    cos_vc = _cos("e.v", "c.cv")
    d_enc = (
        f"list_sum([(ca.rv[cb.m * {ds} + i] - cb.cv[i]) * (ca.rv[cb.m * {ds} + i] - cb.cv[i]) "
        f"FOR i IN range(1, {ds + 1})])"
    )
    d_lut = (
        f"list_sum([(qa.rv[cb.m * {ds} + i] - cb.cv[i]) * (qa.rv[cb.m * {ds} + i] - cb.cv[i]) "
        f"FOR i IN range(1, {ds + 1})])"
    )
    return f"""
WITH e AS (SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
c AS (SELECT cid, cv FROM read_parquet('{centroids_path}')),
cb AS (SELECT m, cid, cv FROM read_parquet('{codebooks_path}')),
ca0 AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c) WHERE r = 1),
ca AS (
  SELECT ca0.vec_id, ca0.cid,
    [ca0.v[i] - c.cv[i] FOR i IN range(1, len(ca0.v) + 1)] AS rv
  FROM ca0 JOIN c ON c.cid = ca0.cid),
enc AS (
  SELECT vec_id, cell, m, code FROM (
    SELECT ca.vec_id, ca.cid AS cell, cb.m, cb.cid AS code,
      row_number() OVER (PARTITION BY ca.vec_id, cb.m
        ORDER BY {d_enc} ASC, cb.cid ASC) AS r
    FROM ca, cb) WHERE r = 1),
qa0 AS (
  SELECT query_id, v, cid FROM (
    SELECT e.vec_id AS query_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id ORDER BY {cos_vc} DESC, c.cid ASC) AS r
    FROM e, c WHERE e.vec_id < {SIM.N_QUERIES_PQ}) WHERE r <= {SIM.IVF_NPROBE}),
qa AS (
  SELECT qa0.query_id, qa0.cid,
    [qa0.v[i] - c.cv[i] FOR i IN range(1, len(qa0.v) + 1)] AS rv
  FROM qa0 JOIN c ON c.cid = qa0.cid),
lut AS (
  SELECT qa.query_id, qa.cid AS cell, cb.m, cb.cid AS code, {d_lut} AS d
  FROM qa, cb),
s AS (
  SELECT lut.query_id, enc.vec_id AS neighbor_id, round(sum(lut.d), 6) AS adc_dist
  FROM enc JOIN lut ON enc.cell = lut.cell AND enc.m = lut.m AND enc.code = lut.code
  WHERE enc.vec_id <> lut.query_id
  GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
        ORDER BY adc_dist ASC, neighbor_id ASC) AS rank FROM s)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, adc_dist
FROM r WHERE rank <= {SIM.PQ_TOPK}
"""
