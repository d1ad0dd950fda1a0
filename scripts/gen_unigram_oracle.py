#!/usr/bin/env python3
"""Generate the unrolled Viterbi-DP oracle SQL for llm_unigram_segment.

The DP over word positions 1..MAXLEN is unrolled as cumulative CTEs
b0..b{MAXLEN} (the mmr unrolled-round convention): b_i carries the best
(score, path) for every position <= i; position i's best joins the edge
set (word, j, i, piece, lp) against b_{i-1} at pos = j with the
tie rule ORDER BY score DESC, j ASC (max score, then the LONGEST last
piece) — matching LlmOps.unigramSegment's array_max over (s, -j).
"""

MAXLEN = 12
VOCAB_TOP = 256
TOPK = 200


def build() -> str:
    head = f"""WITH wrd AS MATERIALIZED (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (SELECT unnest(list_filter(string_split(lower(COALESCE(text,'')),' '), x->len(x)>=1)) AS w FROM documents) GROUP BY 1 HAVING len(w) <= {MAXLEN}), pc AS MATERIALIZED (SELECT substr(w, j, l) AS piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM wrd, unnest(generate_series(1, 4)) s(l), unnest(generate_series(1, len(w) - l + 1)) t(j) WHERE len(w) >= l GROUP BY 1), top AS (SELECT piece, cnt FROM pc ORDER BY cnt DESC, piece LIMIT {VOCAB_TOP}), ch AS (SELECT piece, cnt FROM pc WHERE len(piece) = 1), v0 AS (SELECT piece, MAX(cnt) AS cnt FROM (SELECT * FROM top UNION ALL SELECT * FROM ch) GROUP BY 1), tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM v0), voc AS MATERIALIZED (SELECT piece, CAST(ROUND(LN(CAST(cnt AS DOUBLE) / t) * 1000000) AS BIGINT) AS lp FROM v0, tot), ed0 AS (SELECT w, freq, CAST(j - 1 AS BIGINT) AS j, CAST(j + l - 1 AS BIGINT) AS i, substr(w, j, l) AS piece FROM wrd, unnest(generate_series(1, 4)) s(l), unnest(generate_series(1, len(w) - l + 1)) t(j) WHERE len(w) >= l), ed AS MATERIALIZED (SELECT ed0.w, ed0.freq, ed0.j, ed0.i, ed0.piece, voc.lp FROM ed0 JOIN voc ON voc.piece = ed0.piece), b0 AS MATERIALIZED (SELECT w, freq, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS s, '' AS pth FROM wrd)"""
    parts = [head]
    for i in range(1, MAXLEN + 1):
        parts.append(
            f", b{i} AS MATERIALIZED (SELECT * FROM b{i-1} UNION ALL "
            f"SELECT w, freq, CAST({i} AS BIGINT) AS pos, s, pth FROM ("
            f"SELECT e.w, e.freq, b.s + e.lp AS s, "
            f"CASE WHEN e.j = 0 THEN e.piece ELSE b.pth || ' ' || e.piece END AS pth, "
            f"ROW_NUMBER() OVER (PARTITION BY e.w ORDER BY b.s + e.lp DESC, e.j ASC) AS rn "
            f"FROM ed e JOIN b{i-1} b ON b.w = e.w AND b.pos = e.j "
            f"WHERE e.i = {i}) WHERE rn = 1)"
        )
    parts.append(
        f" SELECT w AS word, freq, pth AS seg, "
        f"CAST(len(string_split(pth, ' ')) AS BIGINT) AS n_pieces, s AS score_u "
        f"FROM b{MAXLEN} WHERE pos = len(w) "
        f"ORDER BY freq DESC, word LIMIT {TOPK}"
    )
    return "".join(parts)


if __name__ == "__main__":
    print(build())
